"""CycleGAN system smoke tests on synthetic 2D data (CPU) — the driver's
'tiny 2D generator/discriminator smoke train on synthetic data' config
(BASELINE.json configs[0]), which the reference could not run outside its
cluster (SURVEY §4)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raygun_tpu.io import make_cyclegan_dataset
from raygun_tpu.systems import load_system
from raygun_tpu.systems.cyclegan import gan_loss, smooth_l1
from raygun_tpu.train.state import latest_checkpoint


@pytest.fixture(scope="module", params=["link", "split"])
def tiny_config(tmp_path_factory, request):
    loss_type = request.param
    root = tmp_path_factory.mktemp(f"cgan_{loss_type}")
    src = make_cyclegan_dataset(
        str(root / "data.zarr"), shape=(128, 128),
        voxel_size_a=(45, 45), voxel_size_b=(90, 90),
    )  # A resamples 128^2@45nm -> 64^2@90nm (exercises the resample path)
    config = {
        "system": "CycleGAN",
        "sources": {
            "A": {"path": src["path"], "name": src["A"]},
            "B": {"path": src["path"], "name": src["B"]},
        },
        "common_voxel_size": [90, 90],
        "ndims": 2,
        "side_length": 32,
        "batch_size": 2,
        "loss_type": loss_type,
        "gnet_type": "resnet",
        "gnet_kwargs": {
            "input_nc": 1, "output_nc": 1, "ngf": 4, "n_blocks": 1,
            "n_downsampling": 1, "padding_type": "same",
            "final_activation": "tanh",
        },
        "dnet_kwargs": {"input_nc": 1, "ngf": 4, "n_layers": 2, "kw": 3,
                        "downsampling_kw": 2},
        "g_optim_kwargs": {"lr": 1e-4, "betas": [0.5, 0.999]},
        "d_optim_kwargs": {"lr": 1e-4, "betas": [0.5, 0.999]},
        "model_path": str(root / "models") + "/",
        "num_epochs": 4,
        "log_every": 2,
        "save_every": 4,
        "tensorboard_path": str(root / "tensorboard"),
    }
    cfg_path = root / "train_conf.json"
    cfg_path.write_text(json.dumps(config))
    return str(cfg_path), config, loss_type


class TestLossPrimitives:
    def test_lsgan(self):
        pred = jnp.zeros((2, 4, 4, 1))
        assert float(gan_loss(pred, True, "lsgan")) == pytest.approx(1.0)
        assert float(gan_loss(pred, False, "lsgan")) == pytest.approx(0.0)

    def test_wgangp(self):
        pred = jnp.full((2, 4, 4, 1), 3.0)
        assert float(gan_loss(pred, True, "wgangp")) == pytest.approx(-3.0)
        assert float(gan_loss(pred, False, "wgangp")) == pytest.approx(3.0)

    def test_smooth_l1(self):
        a = jnp.zeros((4,))
        b = jnp.asarray([0.5, 0.5, 2.0, 2.0])
        # |d|<1: 0.5 d^2 = 0.125 ; |d|>1: |d|-0.5 = 1.5
        assert float(smooth_l1(a, b)) == pytest.approx((0.125 * 2 + 1.5 * 2) / 4)


def test_build_and_batch(tiny_config):
    cfg_path, config, loss_type = tiny_config
    system = load_system(cfg_path)
    system.build_system()
    assert set(system.params) == {"G1", "G2", "D1", "D2"}
    batch = jax.jit(system.make_batch)(jax.random.PRNGKey(0))
    assert batch["real_A"].shape == (2, 32, 32, 1)
    assert batch["real_B"].shape == (2, 32, 32, 1)
    assert float(jnp.min(batch["real_A"])) >= -1.0
    assert float(jnp.max(batch["real_A"])) <= 1.0


def test_gan_step_updates_and_gradient_flow(tiny_config):
    cfg_path, config, loss_type = tiny_config
    system = load_system(cfg_path)
    system.build_system()
    step_fn = system.trainer.step_fn
    state = jax.tree.map(jnp.copy, system.trainer.state)
    p0 = jax.device_get(state.params)
    state, metrics = step_fn(state, jax.random.PRNGKey(0))
    p1 = jax.device_get(state.params)
    # every network received an update
    for net in ("G1", "G2", "D1", "D2"):
        diff = sum(
            float(np.abs(a - b).sum())
            for a, b in zip(jax.tree.leaves(p0[net]), jax.tree.leaves(p1[net]))
        )
        assert diff > 0, f"{net} params did not update"
    # loss metrics present with reference naming
    assert "Total_Loss/G1" in metrics and "Discriminator_B/real" in metrics
    assert np.isfinite(float(metrics["loss"]))


def test_short_train_and_checkpoint(tiny_config):
    cfg_path, config, loss_type = tiny_config
    system = load_system(cfg_path)
    system.build_system()
    system.trainer.train()
    ckpt, it = latest_checkpoint(system.checkpoint_basename)
    assert it == 4

    # predict from checkpoint with both generators
    fwd, spec = system.predict_setup(checkpoint=4, net_name="netG2")
    x = jnp.zeros((1, 32, 32, 1))
    out = fwd(x)
    assert out["fake"].shape == (1, 32, 32, 1)
    assert 0.0 <= float(jnp.min(out["fake"])) and float(jnp.max(out["fake"])) <= 1.0


def test_link_vs_split_gradient_semantics():
    """link: cycle loss reaches the first generator; split: it does not
    (the reference's detach placement, CycleModel.py:53-57)."""
    import flax.linen as nn
    from raygun_tpu.systems.cyclegan import CycleGAN

    class Dummy(CycleGAN):
        def __init__(self, split):
            # bypass BaseSystem config machinery
            self.split = split
            self.ndims = 2
            g = nn.Dense(1)
            self.netG1 = self.netG2 = _Wrap(g)

    class _Wrap(nn.Module):
        inner: nn.Module

        @nn.compact
        def __call__(self, x, train=True):
            return self.inner(x)

    x = jnp.ones((1, 2, 2, 1))
    g = _Wrap(nn.Dense(1))
    params = g.init(jax.random.PRNGKey(0), x)["params"]

    def cycle_loss(p, split):
        obj = Dummy.__new__(Dummy)
        obj.split = split
        obj.ndims = 2
        obj.netG1 = obj.netG2 = g
        fake_B, fake_A, cycled_A, cycled_B = obj._forward_cycle(
            {"G1": p, "G2": jax.tree.map(jnp.copy, p)}, x, x, split
        )
        return jnp.mean(cycled_B**2)  # loss on cycled only

    # cycled_B = G1(stop(fake_A)) in split; fake_A uses G2 — G1 grad exists
    # in both; but grads w.r.t. G2 (through fake_A) exist only in link mode
    def loss_wrt_g2(p2, split):
        obj = Dummy.__new__(Dummy)
        obj.split = split
        obj.ndims = 2
        obj.netG1 = obj.netG2 = g
        _, _, _, cycled_B = obj._forward_cycle(
            {"G1": params, "G2": p2}, x, x, split
        )
        return jnp.mean(cycled_B**2)

    g_link = jax.grad(loss_wrt_g2)(params, False)
    g_split = jax.grad(loss_wrt_g2)(params, True)
    assert any(float(np.abs(l).sum()) > 0 for l in jax.tree.leaves(g_link))
    assert all(float(np.abs(l).sum()) == 0 for l in jax.tree.leaves(g_split))


def test_batched_applies_match_unbatched(tiny_config):
    """_forward_cycle runs G2's two applies as one 2x-batch apply, and
    _d_losses runs all kinds through one apply per discriminator; both are
    exact per-sample re-expressions of the reference's separate applies
    (CycleModel.py:37-89). Values AND gradients must match the unbatched
    formulation."""
    cfg_path, config, loss_type = tiny_config
    system = load_system(cfg_path)
    system.build_system()
    params = system.params
    g_params = {"G1": params["G1"], "G2": params["G2"]}
    d_params = {"D1": params["D1"], "D2": params["D2"]}
    batch = jax.jit(system.make_batch)(jax.random.PRNGKey(11))
    real_A, real_B = batch["real_A"], batch["real_B"]
    split = system.split

    def unbatched_cycle(gp):
        fake_B = system._g_apply("G1", gp["G1"], real_A, True)
        fake_A = system._g_apply("G2", gp["G2"], real_B, True)
        in_B = jax.lax.stop_gradient(fake_B) if split else fake_B
        in_A = jax.lax.stop_gradient(fake_A) if split else fake_A
        cycled_A = system._g_apply("G2", gp["G2"], in_B, True)
        cycled_B = system._g_apply("G1", gp["G1"], in_A, True)
        return fake_B, fake_A, cycled_A, cycled_B

    got = jax.jit(
        lambda gp: system._forward_cycle(gp, real_A, real_B, split)
    )(g_params)
    want = jax.jit(unbatched_cycle)(g_params)
    for g, w, name in zip(got, want, ("fake_B", "fake_A", "cycled_A",
                                      "cycled_B")):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(w, np.float32),
            rtol=0, atol=1e-5, err_msg=name)

    def scalar_through(fn):
        def s(gp):
            outs = fn(gp)
            return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)
        return s

    grad_got = jax.grad(scalar_through(
        lambda gp: system._forward_cycle(gp, real_A, real_B, split)))(g_params)
    grad_want = jax.grad(scalar_through(unbatched_cycle))(g_params)
    for a, b in zip(jax.tree.leaves(grad_got), jax.tree.leaves(grad_want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=3e-4)

    # D losses: batched kinds == per-kind applies
    fake_B, fake_A, cycled_A, cycled_B = got
    loss_batched, metrics = jax.jit(
        lambda dp: system._d_losses(dp, real_A, real_B, fake_A, fake_B,
                                    cycled_A, cycled_B)
    )(d_params)

    def unbatched_d(dp):
        total = 0.0
        for side, dnet, data in (
            ("B", "D1", {"real": real_B, "fake": fake_B, "cycled": cycled_B}),
            ("A", "D2", {"real": real_A, "fake": fake_A, "cycled": cycled_A}),
        ):
            for kind, lam in system.d_lambda_dict[side].items():
                if lam == 0:
                    continue
                pred = system._d_apply(
                    dnet, dp[dnet], jax.lax.stop_gradient(data[kind]), True)
                total = total + lam * gan_loss(pred, kind == "real",
                                               system.gan_mode)
        return total

    loss_want = jax.jit(unbatched_d)(d_params)
    np.testing.assert_allclose(float(loss_batched), float(loss_want),
                               rtol=0, atol=1e-5)


def test_bfloat16_mixed_precision_step(tmp_path):
    """"dtype": "bfloat16" runs net activations in bf16 while params and
    optimizer state stay fp32 and losses reduce finitely (round 3: the GAN
    step is bandwidth-bound, so bf16 activations are the big step lever)."""
    src = make_cyclegan_dataset(
        str(tmp_path / "data.zarr"), shape=(96, 96),
        voxel_size_a=(90, 90), voxel_size_b=(90, 90),
    )
    config = {
        "system": "CycleGAN",
        "sources": {
            "A": {"path": src["path"], "name": src["A"]},
            "B": {"path": src["path"], "name": src["B"]},
        },
        "common_voxel_size": [90, 90],
        "ndims": 2, "side_length": 32, "batch_size": 2,
        "loss_type": "link", "dtype": "bfloat16",
        "gnet_type": "resnet",
        "gnet_kwargs": {
            "input_nc": 1, "output_nc": 1, "ngf": 4, "n_blocks": 1,
            "n_downsampling": 1, "padding_type": "same",
            "final_activation": "tanh",
        },
        "dnet_kwargs": {"input_nc": 1, "ngf": 4, "n_layers": 2, "kw": 3,
                        "downsampling_kw": 2},
        "g_optim_kwargs": {"lr": 1e-4, "betas": [0.5, 0.999]},
        "d_optim_kwargs": {"lr": 1e-4, "betas": [0.5, 0.999]},
        "model_path": str(tmp_path / "models") + "/",
        "num_epochs": 2, "log_every": 1, "save_every": 2,
        "tensorboard_path": str(tmp_path / "tensorboard"),
    }
    cfg_path = tmp_path / "train_conf.json"
    cfg_path.write_text(json.dumps(config))
    system = load_system(str(cfg_path))
    system.build_system()
    batch = jax.jit(system.make_batch)(jax.random.PRNGKey(0))
    assert batch["real_A"].dtype == jnp.bfloat16
    step = system.make_train_step()
    state, metrics = step(system.state, jax.random.PRNGKey(1))
    # losses finite and fp32; params still fp32
    for name, v in metrics.items():
        assert jnp.isfinite(v).all(), name
    assert all(
        l.dtype == jnp.float32 for l in jax.tree.leaves(state.params)
    )
    # and a second step still finite (optimizer state consistent)
    state, metrics = step(state, jax.random.PRNGKey(2))
    assert jnp.isfinite(metrics["Total_Loss/G1"])


def test_fast_warp_default_and_exact_warp_optout(tmp_path):
    """2D systems default to the gather-free 3-shear warp; "exact_warp":
    true keeps map_coordinates. Both produce finite, in-range batches."""
    from raygun_tpu.systems import load_system

    src = make_cyclegan_dataset(
        str(tmp_path / "data.zarr"), shape=(128, 128),
        voxel_size_a=(90, 90), voxel_size_b=(90, 90),
    )
    base = {
        "system": "CycleGAN",
        "sources": {
            "A": {"path": src["path"], "name": src["A"]},
            "B": {"path": src["path"], "name": src["B"]},
        },
        "common_voxel_size": [90, 90],
        "ndims": 2,
        "side_length": 32,
        "batch_size": 2,
        "gnet_kwargs": {
            "input_nc": 1, "output_nc": 1, "ngf": 4, "n_blocks": 1,
            "n_downsampling": 1, "padding_type": "same",
            "final_activation": "tanh",
        },
        "dnet_kwargs": {"input_nc": 1, "ngf": 4, "n_layers": 2, "kw": 3,
                        "downsampling_kw": 2},
        "model_path": str(tmp_path / "models") + "/",
    }
    cfg_fast = tmp_path / "fast.json"
    cfg_fast.write_text(json.dumps(base))
    sys_fast = load_system(str(cfg_fast))
    sys_fast.setup_datapipes()
    assert not sys_fast.exact_warp

    cfg_exact = tmp_path / "exact.json"
    cfg_exact.write_text(json.dumps({**base, "exact_warp": True}))
    sys_exact = load_system(str(cfg_exact))
    sys_exact.setup_datapipes()

    key = jax.random.PRNGKey(0)
    b_fast = jax.jit(sys_fast.make_batch)(key)
    b_exact = jax.jit(sys_exact.make_batch)(key)
    for b in (b_fast, b_exact):
        a = np.asarray(b["real_A"], np.float32)
        assert np.isfinite(a).all()
        assert a.min() >= -1.001 and a.max() <= 1.001
    assert b_fast["real_A"].shape == b_exact["real_A"].shape
