"""2D-in-3D anisotropic CycleGAN mode: 2D networks trained on single-section
crops of 3D volumes (the ISBI-2023 use case — reference
``CycleGAN.py:35-38`` ndims inference + ``CycleDataPipe`` z-squeeze)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raygun_tpu.core import Coordinate, Roi
from raygun_tpu.io import prepare_ds
from raygun_tpu.io.synthetic import synthetic_labels, synthetic_raw_from_labels
from raygun_tpu.systems import load_system


@pytest.fixture(scope="module")
def aniso_config(tmp_path_factory):
    root = tmp_path_factory.mktemp("aniso")
    path = str(root / "data.zarr")
    # 3D volumes, anisotropic voxel size (z coarser): ndims -> 2
    shape = (8, 96, 96)
    vx = Coordinate(120, 30, 30)
    roi = Roi((0, 0, 0), Coordinate(shape) * vx)
    for name, seed in (("volumes/raw_A", 3), ("volumes/raw_B", 11)):
        labels = synthetic_labels(shape, num_cells=8, seed=seed)
        raw = synthetic_raw_from_labels(labels, seed + 1)
        v = prepare_ds(path, name, roi, vx, np.uint8, delete=True)
        v.write(roi, raw)
    config = {
        "system": "CycleGAN",
        "sources": {
            "A": {"path": path, "name": "volumes/raw_A"},
            "B": {"path": path, "name": "volumes/raw_B"},
        },
        # ndims inferred from anisotropy: min voxel dims = 2 of 3
        "common_voxel_size": [120, 30, 30],
        "side_length": 32,
        "batch_size": 2,
        "loss_type": "link",
        "gnet_type": "resnet",
        "gnet_kwargs": {"input_nc": 1, "output_nc": 1, "ngf": 4, "n_blocks": 1,
                         "n_downsampling": 1, "padding_type": "same",
                         "final_activation": "tanh"},
        "dnet_kwargs": {"input_nc": 1, "ngf": 4, "n_layers": 2, "kw": 3,
                        "downsampling_kw": 2},
        "model_path": str(root / "models") + "/",
        "num_epochs": 2, "log_every": 1, "save_every": 2,
        "tensorboard_path": str(root / "tb"),
    }
    cfg = root / "train_conf.json"
    cfg.write_text(json.dumps(config))
    return str(cfg)


def test_ndims_inferred_and_2d_batches(aniso_config):
    system = load_system(aniso_config)
    assert system.ndims == 2  # inferred from the anisotropic voxel size
    system.build_system()
    batch = jax.jit(system.make_batch)(jax.random.PRNGKey(0))
    # 2D crops pulled from single z-sections of the 3D volume
    assert batch["real_A"].shape == (2, 32, 32, 1)
    assert batch["real_B"].shape == (2, 32, 32, 1)


def test_2d_gan_step_on_3d_data(aniso_config):
    system = load_system(aniso_config)
    system.build_system()
    state = jax.tree.map(jnp.copy, system.trainer.state)
    state, metrics = system.trainer.step_fn(state, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
