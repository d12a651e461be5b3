"""Round-2 correctness fixes (VERDICT/ADVICE r1):

* anisotropic MTLSD augments only the isotropic (trailing) axes — the
  reference's ``augment_axes = np.arange(3)[-ndims:]`` semantics
  (``CycleDataPipe.py:134-137``);
* RejectConstant (min coefficient of variation) origin filtering
  (``CycleDataPipe.py:118-131``);
* sampling_bottleneck (``CycleModel.py:24-34``, ``CycleGAN.py:144-156``);
* norm="batch" running statistics threaded through the MTLSD train step;
* config typos raise AttributeError instead of reading as None;
* crash-leftover ``*.tmp`` checkpoints are never resumed from.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raygun_tpu.core import Coordinate, Roi
from raygun_tpu.io import make_segmentation_dataset, prepare_ds
from raygun_tpu.io.sampler import valid_origins
from raygun_tpu.io.synthetic import synthetic_labels, synthetic_raw_from_labels
from raygun_tpu.systems import load_system
from raygun_tpu.train.state import latest_checkpoint


# ---------------------------------------------------------------------------
# anisotropic MTLSD
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def aniso_mtlsd_config(tmp_path_factory):
    root = tmp_path_factory.mktemp("aniso_mtlsd")
    src = make_segmentation_dataset(
        str(root / "train.zarr"), shape=(16, 64, 64), num_cells=10,
        voxel_size=(120, 30, 30),
    )
    k = [[1, 3, 3], [1, 3, 3]]
    config = {
        "system": "MTLSD",
        "sources": [src],
        "ndims": 2,  # isotropic in-plane axes only (default conf pins 3)
        "batch_size": 1,
        "input_shape": [8, 36, 36],
        "output_shape": [8, 20, 20],
        "voxel_size": [120, 30, 30],
        "neighborhood": [[1, 0, 0], [0, 1, 0], [0, 0, 1]],
        "n_diagonals": 0,
        "model_kwargs": {
            "unet_kwargs": {
                "input_nc": 1, "ngf": 4, "fmap_inc_factor": 2,
                "downsample_factors": [[1, 2, 2]],
                "kernel_size_down": [k, k], "kernel_size_up": [k],
                "constant_upsample": True,
            },
            "num_affs": 3,
        },
        "elastic_aug1_kwargs": None,
        # per-isotropic-axis params (len == ndims == 2): the system must pad
        # the LEADING (z) axis, not truncate the trailing ones
        "elastic_aug2_kwargs": {
            "control_point_spacing": [12, 12],
            "jitter_sigma": [1, 1],
            "subsample": 4,
        },
        "lsd_kwargs": None,
        "optim_type": "adam",
        "optim_kwargs": {"learning_rate": 0.0005},
        "model_path": str(root / "models") + "/",
        "train_kwargs": {"num_epochs": 1, "save_every": 10},
    }
    cfg = root / "train_conf.json"
    cfg.write_text(json.dumps(config))
    return str(cfg)


def test_aniso_mtlsd_step(aniso_mtlsd_config):
    """Non-cubic anisotropic crops must trace (the r1 bug transposed the
    (z, y) axes of a (8, 36, 36) crop -> lax.switch shape error)."""
    system = load_system(aniso_mtlsd_config)
    assert system.ndims == 2
    system.build_system()
    # margin must be full-rank: z margin 0 (no jitter, no in-plane rotation)
    assert len(system.margin) == 3 and system.margin[0] == 0
    state, metrics = system.trainer.step_fn(system.state, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_aniso_simple_augment_leaves_z_alone():
    """Mirror/transpose restricted to trailing axes never mixes z with y/x."""
    from raygun_tpu.io import simple_augment

    x = jnp.arange(2 * 5 * 5, dtype=jnp.float32).reshape(2, 5, 5)
    for seed in range(8):
        out = simple_augment(
            {"x": x}, jax.random.PRNGKey(seed), ndims=3,
            mirror_only=[1, 2], transpose_only=[1, 2],
        )["x"]
        # the set of values within each z-section is preserved
        for z in range(2):
            assert set(np.asarray(out[z]).ravel()) == set(np.asarray(x[z]).ravel())


# ---------------------------------------------------------------------------
# RejectConstant
# ---------------------------------------------------------------------------

def test_reject_constant_origins():
    data = np.zeros((8, 8), np.float32)
    data[:, 4:] = np.random.default_rng(0).uniform(0.2, 1.0, (8, 4))
    mask = np.ones((8, 8), bool)
    # 4x4 crops: origins fully inside the constant half must be rejected
    origins = valid_origins(mask, (4, 4), data=data, min_coefvar=0.05)
    assert len(origins) > 0
    assert not any((o[1] == 0) for o in origins)
    # without the constraint, column-0 origins exist
    all_origins = valid_origins(mask, (4, 4))
    assert any((o[1] == 0) for o in all_origins)


def test_reject_constant_unsatisfiable():
    with pytest.raises(ValueError, match="min_coefvar"):
        valid_origins(
            np.ones((6, 6), bool), (4, 4),
            data=np.ones((6, 6), np.float32), min_coefvar=0.1,
        )


# ---------------------------------------------------------------------------
# sampling bottleneck
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def bottleneck_system(tmp_path_factory):
    root = tmp_path_factory.mktemp("bottleneck")
    path = str(root / "data.zarr")
    # A: fine 30nm grid; B: coarse 90nm grid (resampled to common 30nm)
    for name, vx, shape, seed in (
        ("volumes/raw_A", (30, 30), (64, 64), 3),
        ("volumes/raw_B", (90, 90), (24, 24), 11),
    ):
        labels = synthetic_labels(shape, num_cells=6, seed=seed)
        raw = synthetic_raw_from_labels(labels, seed + 1)
        roi = Roi((0, 0), Coordinate(shape) * Coordinate(vx))
        v = prepare_ds(path, name, roi, vx, np.uint8, delete=True)
        v.write(roi, raw)
    config = {
        "system": "CycleGAN",
        "sources": {
            "A": {"path": path, "name": "volumes/raw_A"},
            "B": {"path": path, "name": "volumes/raw_B"},
        },
        "common_voxel_size": [30, 30],
        "ndims": 2,
        "side_length": 16,
        "batch_size": 1,
        "loss_type": "link",
        "sampling_bottleneck": True,
        "gnet_type": "resnet",
        "gnet_kwargs": {"input_nc": 1, "output_nc": 1, "ngf": 4, "n_blocks": 1,
                        "n_downsampling": 1, "padding_type": "same",
                        "final_activation": "tanh"},
        "dnet_kwargs": {"input_nc": 1, "ngf": 4, "n_layers": 1, "kw": 3,
                        "downsampling_kw": 2},
        "model_path": str(root / "models") + "/",
        "num_epochs": 1, "log_every": 1, "save_every": 10,
        "tensorboard_path": str(root / "tb"),
    }
    cfg = root / "train_conf.json"
    cfg.write_text(json.dumps(config))
    system = load_system(str(cfg))
    system.setup_networks()
    system.setup_model()
    return system


def test_bottleneck_scale_factors(bottleneck_system):
    s = bottleneck_system
    # B is coarser than the common grid -> fakes INTO B are band-limited
    assert s.scale_factor_B is not None
    assert all(f < 1 for f in s.scale_factor_B)
    assert s.scale_factor_A is None


def test_bottleneck_band_limits(bottleneck_system):
    s = bottleneck_system
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 1))
    y = s._bottleneck(x, s.scale_factor_B)
    assert y.shape == x.shape
    # high-frequency content is removed...
    assert not np.allclose(np.asarray(y), np.asarray(x), atol=1e-3)
    # ...but a constant image passes through unchanged
    c = jnp.ones((1, 16, 16, 1))
    assert np.allclose(np.asarray(s._bottleneck(c, s.scale_factor_B)), 1.0, atol=1e-5)


def test_bottleneck_in_forward_cycle(bottleneck_system):
    s = bottleneck_system
    g_params = {"G1": s.params["G1"], "G2": s.params["G2"]}
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 1))
    fake_B, fake_A, cycled_A, cycled_B = jax.jit(
        lambda p, a, b: s._forward_cycle(p, a, b, split=False, train=False)
    )(g_params, x, x)
    assert fake_B.shape == fake_A.shape == x.shape


# ---------------------------------------------------------------------------
# batch norm through the MTLSD step
# ---------------------------------------------------------------------------

def test_mtlsd_batch_norm_stats(tmp_path):
    src = make_segmentation_dataset(
        str(tmp_path / "train.zarr"), shape=(48, 48, 48), num_cells=8
    )
    config = {
        "system": "MTLSD",
        "sources": [src],
        "ndims": 3,
        "batch_size": 2,
        "input_shape": [28, 28, 28],
        "output_shape": [12, 12, 12],
        "voxel_size": [30, 30, 30],
        "neighborhood": [[1, 0, 0], [0, 1, 0], [0, 0, 1]],
        "n_diagonals": 0,
        "model_kwargs": {
            "unet_kwargs": {
                "input_nc": 1, "ngf": 4, "fmap_inc_factor": 2,
                "downsample_factors": [[2, 2, 2]],
                "constant_upsample": True,
                "norm": "batch",
            },
            "num_affs": 3,
        },
        "elastic_aug1_kwargs": None, "elastic_aug2_kwargs": None,
        "lsd_kwargs": None,
        "optim_type": "adam", "optim_kwargs": {"learning_rate": 0.0005},
        "model_path": str(tmp_path / "models") + "/",
        "train_kwargs": {"num_epochs": 1, "save_every": 10},
    }
    cfg = tmp_path / "conf.json"
    cfg.write_text(json.dumps(config))
    system = load_system(str(cfg))
    system.build_system()
    assert system.batch_stats, "norm='batch' must create a batch_stats collection"
    state0 = jax.tree.map(jnp.copy, system.state)
    state1, m1 = system.trainer.step_fn(state0, jax.random.PRNGKey(0))
    assert np.isfinite(float(m1["loss"]))
    # running statistics moved
    leaves0 = jax.tree.leaves(system.state.extra["batch_stats"])
    leaves1 = jax.tree.leaves(state1.extra["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves0, leaves1)
    )


def test_cyclegan_rejects_batch_norm():
    from raygun_tpu.systems.cyclegan import CycleGAN

    system = CycleGAN({
        "sources": {"A": {}, "B": {}},
        "common_voxel_size": [30, 30],
        "ndims": 2,
        "side_length": 16,
        "loss_type": "link",
        "gnet_kwargs": {"input_nc": 1},
        "dnet_kwargs": {"input_nc": 1, "norm": "batch"},
    })
    with pytest.raises(NotImplementedError, match="batch"):
        system.setup_networks()


# ---------------------------------------------------------------------------
# config typos + checkpoint hygiene
# ---------------------------------------------------------------------------

def test_config_typo_raises():
    from raygun_tpu.systems.cyclegan import CycleGAN

    system = CycleGAN({
        "sources": {"A": {}, "B": {}}, "common_voxel_size": [30, 30],
        "ndims": 2, "side_length": 16, "loss_type": "link",
    })
    assert system.lsd_kwargs is None  # known key reads as None
    with pytest.raises(AttributeError, match="lsd_kwargs"):
        _ = system.lsd_kwags  # typo'd key raises with a suggestion


def test_unknown_config_key_rejected_at_construction():
    """A typo'd key that is only WRITTEN (never read back) must raise at
    construction — otherwise e.g. 'lsd_sigma' instead of 'lsd_kwargs'
    silently trains with defaults (round-3 verify-drive finding)."""
    from raygun_tpu.systems.cyclegan import CycleGAN

    with pytest.raises(ValueError, match="unknown config key.*lsd_sigma"):
        CycleGAN({
            "sources": {"A": {}, "B": {}}, "common_voxel_size": [30, 30],
            "ndims": 2, "side_length": 16, "loss_type": "link",
            "lsd_sigma": 120,
        })
    # a NEAR-MISS of a real key gets a did-you-mean hint
    with pytest.raises(ValueError, match="did you mean 'loss_kwargs'"):
        CycleGAN({
            "sources": {"A": {}, "B": {}}, "common_voxel_size": [30, 30],
            "ndims": 2, "side_length": 16, "loss_type": "link",
            "loss_kwags": {},
        })


def test_empty_valid_conv_raises_clearly():
    """A net too deep for its input must fail with a shape message, not a
    ZeroDivisionError from inside a conv route."""
    import jax.numpy as jnp

    from raygun_tpu.nn.layers import conv2d_s2d, conv3d_zdecomp

    x3 = jnp.zeros((1, 2, 8, 8, 4))
    k3 = jnp.zeros((3, 3, 3, 4, 4))
    with pytest.raises(ValueError, match="input_shape is too\\s+small"):
        conv3d_zdecomp(x3, k3)
    x2 = jnp.zeros((1, 2, 8, 4))
    k2 = jnp.zeros((3, 3, 4, 4))
    with pytest.raises(ValueError, match="input_shape is too\\s+small"):
        conv2d_s2d(x2, k2)


def test_latest_checkpoint_ignores_tmp(tmp_path):
    base = str(tmp_path / "model")
    for name in ("model_checkpoint_100", "model_checkpoint_200"):
        (tmp_path / name).write_bytes(b"x")
    (tmp_path / "model_checkpoint_300.tmp").write_bytes(b"y")  # crash leftover
    path, it = latest_checkpoint(base)
    assert path.endswith("_checkpoint_200") and it == 200
