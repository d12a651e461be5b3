"""ACLSD smoke: the system the reference shipped broken (SURVEY §2.4) —
verify it builds, trains a step, and all three outputs flow."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raygun_tpu.io import make_segmentation_dataset
from raygun_tpu.systems import load_system


@pytest.fixture(scope="module")
def aclsd_config(tmp_path_factory):
    root = tmp_path_factory.mktemp("aclsd")
    src = make_segmentation_dataset(str(root / "train.zarr"), shape=(48, 64, 64), num_cells=10)
    config = {
        "system": "ACLSD",
        "sources": [src],
        "ndims": 3,
        "batch_size": 1,
        "input_shape": [36, 36, 36],
        "output_shape": [20, 20, 20],
        "voxel_size": [30, 30, 30],
        "neighborhood": [[1, 0, 0], [0, 1, 0], [0, 0, 1]],
        "n_diagonals": 0,
        "model_kwargs": {
            "mt_unet_kwargs": {
                "input_nc": 1, "ngf": 2, "fmap_inc_factor": 2,
                "downsample_factors": [[2, 2, 2]], "constant_upsample": True,
            },
            "ac_unet_kwargs": {
                "input_nc": 10, "ngf": 2, "fmap_inc_factor": 2,
                "downsample_factors": [[2, 2, 2]], "constant_upsample": True,
                "padding_type": "same",
            },
            "num_affs": 3,
        },
        "elastic_aug1_kwargs": None,
        "elastic_aug2_kwargs": {"control_point_spacing": [12, 12, 12],
                                "jitter_sigma": [1, 1, 1], "subsample": 4},
        "lsd_kwargs": {"sigma": 120, "downsample": 1},
        "max_labels": 16,
        "optim_type": "adam",
        "optim_kwargs": {"learning_rate": 0.0005},
        "model_path": str(root / "models") + "/",
        "train_kwargs": {"log_dir": str(root / "tb"), "log_every": 2,
                         "num_epochs": 2, "save_every": 2},
    }
    cfg_path = root / "train_conf.json"
    cfg_path.write_text(json.dumps(config))
    return str(cfg_path)


def test_aclsd_builds_and_steps(aclsd_config):
    system = load_system(aclsd_config)
    system.build_system()
    # ac unet is same-padded over the (valid) mtlsd output
    assert system.ac_output_shape == (20, 20, 20)
    state = jax.tree.map(jnp.copy, system.trainer.state)
    state, metrics = system.trainer.step_fn(state, jax.random.PRNGKey(0))
    for k in ("Affinities", "LSDs", "AC_Affinities"):
        assert np.isfinite(float(metrics[k])), k


def test_aclsd_spatial_mesh_matches_single_device(aclsd_config, tmp_path):
    """mesh {'space': 8}: ACLSD's chained-U-Net step reproduces the
    single-device result with the crop's z axis SPMD-sharded (same
    contract as tests/distributed/test_mesh_training.py for MTLSD)."""
    results = {}
    for mesh, tag in ((None, "one"), ({"space": 8}, "sp8")):
        conf = json.loads(open(aclsd_config).read())
        conf["mesh"] = mesh
        conf["model_path"] = str(tmp_path / f"models_{tag}") + "/"
        cfg = tmp_path / f"conf_{tag}.json"
        cfg.write_text(json.dumps(conf))
        system = load_system(str(cfg))
        system.build_system()
        state, metrics = system.trainer.step_fn(
            system.state, jax.random.PRNGKey(3)
        )
        results[tag] = (
            float(metrics["loss"]),
            np.asarray(jax.tree.leaves(jax.device_get(state.params))[0]),
        )
    (l1, p1), (l8, p8) = results["one"], results["sp8"]
    assert np.isfinite(l1)
    np.testing.assert_allclose(l1, l8, rtol=1e-4)
    np.testing.assert_allclose(p1, p8, rtol=1e-4, atol=1e-6)


def test_aclsd_grad_slabs_rejected(aclsd_config, tmp_path):
    conf = json.loads(open(aclsd_config).read())
    conf["grad_slabs"] = 2
    conf["model_path"] = str(tmp_path / "models_gs") + "/"
    cfg = tmp_path / "conf_gs.json"
    cfg.write_text(json.dumps(conf))
    system = load_system(str(cfg))
    with pytest.raises(ValueError, match="grad_slabs"):
        system.build_system()
