"""Trainer observability + validation hooks (round 2):

* tensorboard image panels (reference ``MTLSDModel.add_log:39-55``)
* parameter histograms (reference ``FreezableModel.add_log:16-28``)
* training-time validation every ``validate_every`` steps (reference
  ``BaseCompetentLoss.update_status:72-76``)
"""

import jax
import jax.numpy as jnp
import numpy as np

from raygun_tpu.train.loop import Trainer
from raygun_tpu.train.state import TrainState, latest_checkpoint


class FakeWriter:
    def __init__(self):
        self.scalars, self.images, self.hists = [], [], []

    def add_scalar(self, tag, v, step):
        self.scalars.append((tag, v, step))

    def add_image(self, tag, img, global_step=None, **kw):
        self.images.append((tag, np.asarray(img), global_step))

    def add_histogram(self, tag, values, global_step=None):
        self.hists.append((tag, np.asarray(values), global_step))

    def flush(self):
        pass


def make_trainer(tmp_path, **kw):
    tx_like = jnp.zeros(())
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params={"unet": {"kernel": jnp.ones((3, 3, 4)), "norm_scale": jnp.ones((4,))}},
        opt_state=tx_like,
    )

    def step_fn(state, key):
        return state.replace(step=state.step + 1), {"loss": jnp.float32(0.5)}

    def snapshot_fn(state, key):
        # batched 3D volume in [-1, 1] + a channels-last prediction
        return {
            "raw": -jnp.ones((1, 6, 8, 8, 1)) * 0.5,
            "pred_affs": jnp.full((1, 6, 8, 8, 3), 0.25),
        }

    return Trainer(
        step_fn=step_fn,
        state=state,
        num_epochs=4,
        log_every=1,
        save_every=0,
        checkpoint_basename=str(tmp_path / "model"),
        snapshot_fn=snapshot_fn,
        voxel_size=(1, 1, 1),
        **kw,
    )


def test_image_panels(tmp_path):
    tr = make_trainer(tmp_path, image_every=2)
    tr.writer = FakeWriter()
    tr.train(start_iteration=0)
    tags = {t for t, _, _ in tr.writer.images}
    assert tags == {"raw", "pred_affs"}
    steps = sorted({s for _, _, s in tr.writer.images})
    assert steps == [2, 4]
    for _, img, _ in tr.writer.images:
        assert img.ndim == 3 and img.shape[1:] == (8, 8)  # CHW mid-section
        assert img.min() >= 0.0  # [-1,1] rescaled into [0,1]


def test_histograms(tmp_path):
    tr = make_trainer(tmp_path, histogram_every=2)
    tr.writer = FakeWriter()
    tr.train(start_iteration=0)
    tags = {t for t, _, _ in tr.writer.hists}
    assert "params/unet" in tags
    assert "norm_params" in tags


def test_validate_hook_saves_then_runs(tmp_path):
    calls = []
    tr = make_trainer(
        tmp_path, validate_every=2, validate_fn=lambda step: calls.append(step)
    )
    tr.train(start_iteration=0)
    assert calls == [2, 4]
    # a checkpoint exists for the validation to load
    path, it = latest_checkpoint(str(tmp_path / "model"))
    assert path is not None and it == 4


def test_profile_dir_writes_trace(tmp_path):
    """train_kwargs profile_dir produces a jax.profiler trace (SURVEY §5.1)."""
    import glob as _glob

    import jax
    import jax.numpy as jnp

    from raygun_tpu.train.loop import Trainer

    class S:
        pass

    state0 = {"w": jnp.zeros(4)}

    @jax.jit
    def step(state, key):
        return {"w": state["w"] + 1}, {"loss": jnp.sum(state["w"])}

    tr = Trainer(
        step_fn=step, state=state0, num_epochs=6, log_every=2, save_every=0,
        checkpoint_basename=str(tmp_path / "m"),
        profile_dir=str(tmp_path / "trace"), profile_steps=(1, 4),
    )
    tr.train(start_iteration=0)
    files = _glob.glob(str(tmp_path / "trace" / "**" / "*"), recursive=True)
    assert any("trace" in f or f.endswith(".pb") or f.endswith(".json.gz")
               for f in files), files


def test_legacy_conv_param_path_migration(tmp_path):
    """Checkpoints from before the uniform ConvNd param layout (nested
    nn.Conv submodules: ConvNd_0/Conv_0/kernel) still load."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from raygun_tpu.nn import ConvPass
    from raygun_tpu.train.state import load_params_only

    cp = ConvPass(output_nc=4, kernel_sizes=[(3, 3), (3, 3)])
    x = jnp.zeros((1, 10, 10, 2))
    params = cp.init(jax.random.PRNGKey(0), x)["params"]

    # simulate the legacy layout: wrap each ConvNd's params in a Conv_0 level
    legacy = {
        k: ({"Conv_0": v} if k.startswith("ConvNd") else v)
        for k, v in jax.device_get(params).items()
    }
    path = tmp_path / "legacy_checkpoint_100"
    path.write_bytes(serialization.to_bytes({"params": legacy}))

    loaded = load_params_only(str(path), params)
    for k in params:
        np.testing.assert_array_equal(
            np.asarray(loaded[k]["kernel"]), np.asarray(params[k]["kernel"])
        )


def _spc_trainer(tmp_path, tag, spc, n_epochs=23, log_every=3,
                 save_every=10, phases=None):
    """Trainer whose step mixes the PRNG key into the params, so any
    deviation in per-iteration keys or step order changes the state."""
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params={"w": jnp.ones((4,), jnp.float32)},
        opt_state=jnp.zeros(()),
    )

    def step_fn(state, key):
        d = jax.random.normal(key, (4,)) * 0.01
        p = {"w": state.params["w"] + d}
        return (
            state.replace(step=state.step + 1, params=p),
            {"loss": jnp.sum(p["w"])},
        )

    w = FakeWriter()
    tr = Trainer(
        step_fn=step_fn,
        state=state,
        step_fn_phases=phases(step_fn) if phases else None,
        num_epochs=n_epochs,
        log_every=log_every,
        save_every=save_every,
        checkpoint_basename=str(tmp_path / f"model_{tag}"),
        voxel_size=(1, 1, 1),
        steps_per_call=spc,
    )
    tr.writer = w
    return tr, w


def test_steps_per_call_exact_equivalence(tmp_path):
    """steps_per_call=5 must produce bit-identical state, logged scalars,
    and checkpoints vs per-step dispatch (chunks never straddle a
    logging/save boundary; same fold_in(seed, i) keys per iteration)."""
    tr1, w1 = _spc_trainer(tmp_path, "a", 1)
    trk, wk = _spc_trainer(tmp_path, "b", 5)
    tr1.train(start_iteration=0)
    trk.train(start_iteration=0)
    np.testing.assert_array_equal(
        np.asarray(tr1.state.params["w"]), np.asarray(trk.state.params["w"]))
    assert int(tr1.state.step) == int(trk.state.step) == 23
    assert [(t, s) for t, _, s in w1.scalars] == [
        (t, s) for t, _, s in wk.scalars]
    for (_, v1, _), (_, vk, _) in zip(w1.scalars, wk.scalars):
        assert v1 == vk
    p1, i1 = latest_checkpoint(str(tmp_path / "model_a"))
    pk, ik = latest_checkpoint(str(tmp_path / "model_b"))
    assert i1 == ik == 23


def test_steps_per_call_respects_phase_boundary(tmp_path):
    """A step_fn_phases switch mid-run must land on the same iteration."""

    def phases(base):
        def flipped(state, key):
            s, m = base(state, key)
            return s.replace(params={"w": -s.params["w"]}), m
        return {7: flipped}

    tr1, _ = _spc_trainer(tmp_path, "p1", 1, n_epochs=13, log_every=13,
                          save_every=0, phases=phases)
    trk, _ = _spc_trainer(tmp_path, "pk", 4, n_epochs=13, log_every=13,
                          save_every=0, phases=phases)
    tr1.train(start_iteration=0)
    trk.train(start_iteration=0)
    np.testing.assert_array_equal(
        np.asarray(tr1.state.params["w"]), np.asarray(trk.state.params["w"]))


def test_steps_per_call_rejected_in_stream_mode():
    from raygun_tpu.systems.base import BaseSystem

    class S(BaseSystem):
        pass

    s = S.__new__(S)
    s.stream_mode = True
    try:
        s._steps_per_call({"steps_per_call": 4})
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "stream" in str(e)
    s.stream_mode = False
    assert s._steps_per_call({"steps_per_call": 4}) == 4
    assert s._steps_per_call({}) == 1
