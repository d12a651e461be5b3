"""Config-surface data-parallel training over a device mesh (VERDICT r1 #3;
SURVEY §2.3: DP maps to pjit batch sharding — a `mesh` config key on the
REAL systems, not a bespoke demo step).

Runs on the 8-device virtual CPU mesh (tests/conftest.py)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raygun_tpu.io import make_segmentation_dataset, prepare_ds
from raygun_tpu.core import Coordinate, Roi
from raygun_tpu.io.synthetic import synthetic_labels, synthetic_raw_from_labels
from raygun_tpu.systems import load_system


def mtlsd_config(root, mesh, batch_size=8, tag=None):
    src = make_segmentation_dataset(
        str(root / "train.zarr"), shape=(48, 48, 48), num_cells=10
    )
    tag = tag if tag is not None else str(mesh)
    config = {
        "system": "MTLSD",
        "sources": [src],
        "ndims": 3,
        "mesh": mesh,
        "batch_size": batch_size,
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
            },
            "num_affs": 3,
        },
        "elastic_aug1_kwargs": None, "elastic_aug2_kwargs": None,
        "lsd_kwargs": None,
        "optim_type": "adam", "optim_kwargs": {"learning_rate": 0.0005},
        "model_path": str(root / f"models_{tag}") + "/",
        "train_kwargs": {"num_epochs": 1, "save_every": 10},
    }
    cfg = root / f"conf_{tag}.json"
    cfg.write_text(json.dumps(config))
    return str(cfg)


def test_mtlsd_mesh_training_matches_single_device(tmp_path):
    """Same seed, same batch_size: the 8-way sharded step must produce the
    same loss and (replicated) params as the single-device step."""
    results = {}
    for mesh in (None, 8):
        system = load_system(mtlsd_config(tmp_path, mesh))
        system.build_system()
        if mesh:
            m = system.get_mesh()
            assert m is not None and m.devices.size == 8
            # params replicated over the mesh
            leaf = jax.tree.leaves(system.state.params)[0]
            assert len(leaf.sharding.device_set) == 8
        state, metrics = system.trainer.step_fn(
            system.state, jax.random.PRNGKey(7)
        )
        results[mesh] = (
            float(metrics["loss"]),
            np.asarray(jax.tree.leaves(jax.device_get(state.params))[0]),
        )
    loss_1, p_1 = results[None]
    loss_8, p_8 = results[8]
    assert np.isfinite(loss_1)
    np.testing.assert_allclose(loss_1, loss_8, rtol=1e-4)
    np.testing.assert_allclose(p_1, p_8, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("mesh,tag", [
    ({"space": 8}, "sp8"),
    ({"data": 2, "space": 4}, "dp2sp4"),
])
def test_mtlsd_spatial_mesh_matches_single_device(tmp_path, mesh, tag):
    """mesh {'space': N}: the crop's z axis is sharded over the mesh and XLA
    SPMD partitions the whole forward+backward (conv halo exchanges); the
    step must reproduce the single-device result (BASELINE north star:
    spatial sharding with halo exchange — here for TRAINING)."""
    results = {}
    for m, t in ((None, "none_" + tag), (mesh, tag)):
        system = load_system(mtlsd_config(tmp_path, m, batch_size=2, tag=t))
        system.build_system()
        if m:
            built = system.get_mesh()
            assert built is not None and built.devices.size == 8
            assert dict(built.shape).get("space") == m["space"]
        state, metrics = system.trainer.step_fn(
            system.state, jax.random.PRNGKey(7)
        )
        results[t] = (
            float(metrics["loss"]),
            np.asarray(jax.tree.leaves(jax.device_get(state.params))[0]),
        )
    (loss_1, p_1), (loss_n, p_n) = results["none_" + tag], results[tag]
    assert np.isfinite(loss_1)
    np.testing.assert_allclose(loss_1, loss_n, rtol=1e-4)
    np.testing.assert_allclose(p_1, p_n, rtol=1e-4, atol=1e-6)


def test_mtlsd_spatial_batch_is_sharded(tmp_path):
    """The built batch actually splits its z axis across devices."""
    system = load_system(
        mtlsd_config(tmp_path, {"space": 8}, batch_size=1, tag="spshard")
    )
    system.build_system()
    batch = jax.jit(system.make_batch)(jax.random.PRNGKey(0))
    raw = batch["raw"]
    assert len(raw.sharding.device_set) == 8
    z_shards = {s.data.shape[1] for s in raw.addressable_shards}
    assert max(z_shards) < raw.shape[1], (
        f"z axis not split: shard z extents {z_shards} vs full {raw.shape[1]}"
    )


def test_spatial_mesh_grad_slabs_conflict(tmp_path):
    cfg = mtlsd_config(tmp_path, {"space": 8}, batch_size=1, tag="spgs")
    conf = json.loads(open(cfg).read())
    conf["grad_slabs"] = 2
    open(cfg, "w").write(json.dumps(conf))
    system = load_system(cfg)
    with pytest.raises(ValueError, match="grad_slabs"):
        system.build_system()


def test_mtlsd_mesh_batch_is_sharded(tmp_path):
    system = load_system(mtlsd_config(tmp_path, "auto"))
    system.build_system()
    batch = jax.jit(system.make_batch)(jax.random.PRNGKey(0))
    raw = batch["raw"]
    assert raw.shape[0] == 8
    # batch axis actually split across the 8 devices
    assert len(raw.sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in raw.addressable_shards}
    assert shard_shapes == {(1,) + raw.shape[1:]}


def test_mesh_batch_divisibility_error(tmp_path):
    cfg = mtlsd_config(tmp_path, 8)
    conf = json.loads(open(cfg).read())
    conf["batch_size"] = 6
    open(cfg, "w").write(json.dumps(conf))
    system = load_system(cfg)
    with pytest.raises(ValueError, match="divisible"):
        system.build_system()


def test_cyclegan_mesh_training(tmp_path):
    path = str(tmp_path / "data.zarr")
    shape = (64, 64)
    vx = Coordinate(30, 30)
    roi = Roi((0, 0), Coordinate(shape) * vx)
    for name, seed in (("volumes/raw_A", 3), ("volumes/raw_B", 11)):
        labels = synthetic_labels(shape, num_cells=6, seed=seed)
        raw = synthetic_raw_from_labels(labels, seed + 1)
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
        "mesh": 8,
        "side_length": 16,
        "batch_size": 8,
        "loss_type": "split",
        "gnet_type": "resnet",
        "gnet_kwargs": {"input_nc": 1, "output_nc": 1, "ngf": 4, "n_blocks": 1,
                        "n_downsampling": 1, "padding_type": "same",
                        "final_activation": "tanh"},
        "dnet_kwargs": {"input_nc": 1, "ngf": 4, "n_layers": 1, "kw": 3,
                        "downsampling_kw": 2},
        "model_path": str(tmp_path / "models") + "/",
        "num_epochs": 1, "log_every": 1, "save_every": 10,
        "tensorboard_path": str(tmp_path / "tb"),
    }
    cfg = tmp_path / "conf.json"
    cfg.write_text(json.dumps(config))
    system = load_system(str(cfg))
    system.build_system()
    state, metrics = system.trainer.step_fn(system.state, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    leaf = jax.tree.leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8

    # spatial sharding is MTLSD/ACLSD-only (CycleGAN routes through resident
    # Pallas megakernels SPMD can't shard) — must reject loudly
    conf = json.loads(cfg.read_text())
    conf["mesh"] = {"space": 8}
    conf["model_path"] = str(tmp_path / "models_sp") + "/"
    cfg_sp = tmp_path / "conf_sp.json"
    cfg_sp.write_text(json.dumps(conf))
    system = load_system(str(cfg_sp))
    with pytest.raises(ValueError, match="space"):
        system.build_system()
