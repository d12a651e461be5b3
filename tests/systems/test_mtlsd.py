"""MTLSD end-to-end smoke: config-driven tiny train on synthetic data (CPU).

This is the test the reference never had (its system test requires cluster
paths — reference ``tests/torch/systems/CycleGAN_conf.json:4``; SURVEY §4).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raygun_tpu.io import make_segmentation_dataset
from raygun_tpu.systems import load_system
from raygun_tpu.train.state import latest_checkpoint


@pytest.fixture(scope="module")
def tiny_config(tmp_path_factory):
    """A minimal but structurally-faithful MTLSD config on synthetic data."""
    root = tmp_path_factory.mktemp("mtlsd")
    src = make_segmentation_dataset(
        str(root / "train.zarr"), shape=(48, 64, 64), num_cells=12
    )
    # tiny valid U-Net: one (2,2,2) downsample, 2 convs per level.
    # input 36^3: L0 convs -> 32, pool -> 16, L1 convs -> 12, up -> 24,
    # (crop_to_factor no-op), convs -> 20. output 20^3.
    config = {
        "system": "MTLSD",
        "sources": [src],
        "ndims": 3,
        "batch_size": 2,
        "input_shape": [36, 36, 36],
        "output_shape": [20, 20, 20],
        "voxel_size": [30, 30, 30],
        "neighborhood": [[1, 0, 0], [0, 1, 0], [0, 0, 1]],
        "n_diagonals": 2,
        "model_kwargs": {
            "unet_kwargs": {
                "input_nc": 1,
                "ngf": 4,
                "fmap_inc_factor": 2,
                "downsample_factors": [[2, 2, 2]],
                "constant_upsample": True,
            },
            "num_affs": 5,
        },
        "elastic_aug1_kwargs": None,
        "elastic_aug2_kwargs": {
            "control_point_spacing": [12, 12, 12],
            "jitter_sigma": [1, 1, 1],
            "subsample": 4,
        },
        "intensity_aug_kwargs": {
            "scale_min": 0.9, "scale_max": 1.1, "shift_min": -0.1, "shift_max": 0.1,
        },
        "lsd_kwargs": {"sigma": 120, "downsample": 1},
        "max_labels": 16,
        "random_location_kwargs": {"min_masked": 0.5},
        "optim_type": "adam",
        "optim_kwargs": {"learning_rate": 0.0005},
        "model_path": str(root / "models") + "/",
        "train_kwargs": {
            "log_dir": str(root / "tensorboard"),
            "log_every": 2,
            "num_epochs": 6,
            "save_every": 3,
            "snapshot_every": None,
            "snapshot_dir": str(root / "snapshots"),
        },
    }
    cfg_path = root / "train_conf.json"
    cfg_path.write_text(json.dumps(config))
    return str(cfg_path), config


def test_system_builds_and_shapes(tiny_config):
    cfg_path, config = tiny_config
    system = load_system(cfg_path)
    system.build_system()
    # neighborhood: 3 base + 2 diagonals
    assert system.neighborhood.shape == (5, 3)
    batch = jax.jit(system.make_batch)(jax.random.PRNGKey(0))
    assert batch["raw"].shape == (2, 36, 36, 36, 1)
    assert batch["gt_affs"].shape == (2, 20, 20, 20, 5)
    assert batch["gt_lsds"].shape == (2, 20, 20, 20, 10)
    assert float(jnp.min(batch["raw"])) >= -1.0
    assert float(jnp.max(batch["raw"])) <= 1.0


def test_train_decreases_loss_and_checkpoints(tiny_config):
    cfg_path, config = tiny_config
    system = load_system(cfg_path)
    system.build_system()
    step_fn = system.trainer.step_fn
    # copy: step_fn donates its input state buffers (donate_argnums=0)
    state = jax.tree.map(jnp.copy, system.trainer.state)
    losses = []
    for i in range(8):
        state, metrics = step_fn(state, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # with lr 5e-4 on a tiny model, loss should drop measurably
    assert losses[-1] < losses[0]

    # full trainer run: checkpoints written with reference naming
    metrics = system.trainer.train()
    ckpt, it = latest_checkpoint(system.checkpoint_basename)
    assert ckpt is not None and it == 6
    assert os.path.exists(ckpt)


def test_resume_from_checkpoint(tiny_config):
    cfg_path, config = tiny_config
    system = load_system(cfg_path)
    system.build_system()
    # previous test saved checkpoint at iteration 6
    it = system.trainer.resume()
    assert it == 6
    assert int(system.trainer.state.step) == 6


def test_bfloat16_mixed_precision_step(tiny_config, tmp_path):
    """"dtype": "bfloat16" runs MTLSD activations in bf16 while params stay
    fp32 and the weighted-MSE loss reduces finitely (same contract as the
    CycleGAN test; docs/PERFORMANCE.md mixed-precision section)."""
    cfg_path, config = tiny_config
    cfg = dict(config)
    cfg["dtype"] = "bfloat16"
    cfg["model_path"] = str(tmp_path / "models") + "/"
    cfg["train_kwargs"] = dict(cfg["train_kwargs"],
                               log_dir=str(tmp_path / "tensorboard"))
    p = tmp_path / "train_conf.json"
    p.write_text(json.dumps(cfg))
    system = load_system(str(p))
    system.build_system()
    batch = jax.jit(system.make_batch)(jax.random.PRNGKey(0))
    assert batch["raw"].dtype == jnp.bfloat16
    step = system.make_train_step()
    state, metrics = step(system.state, jax.random.PRNGKey(1))
    assert jnp.isfinite(metrics["loss"])
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(state.params))
    state, metrics = step(state, jax.random.PRNGKey(2))
    assert jnp.isfinite(metrics["loss"])
