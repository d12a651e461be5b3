"""Budget-monotone VOI on a protocol hard enough to discriminate.

The r5 recipe's hard protocol (gap 0.35 / sigma 0.6, 24 cells @288^3)
still saturates watershed VOI at 0.0022 by checkpoint 500 — the
MTLSD+LSD model shape-completes those gaps almost immediately. This
mini-experiment pushes the protocol until the EARLY-budget model
measurably fails: denser cells (more boundary per voxel), 60% membrane
evidence erased, thinner membranes, more noise — then validates EARLY
checkpoints (50 / 200 / 800) where shape completion is still learning.

Usage: python scripts/quick_hard_voi.py [--out DIR]
Writes validation_hard_metrics.json {step: metrics} + hard_voi_summary.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HARD = {"gap_fraction": 0.6, "membrane_sigma": 0.5, "noise": 0.12}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out", default="/root/repo/experiments_out/production_recipe_r5/05_hard_voi")
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--save-every", type=int, default=50)
    ap.add_argument("--ckpts", default="50,200,800")
    ap.add_argument("--vol", type=int, default=224)
    ap.add_argument("--eval-vol", type=int, default=160)
    args = ap.parse_args()

    from raygun_tpu.eval.validate import validate_affinities
    from raygun_tpu.io import make_segmentation_dataset, open_ds
    from raygun_tpu.io.synthetic import make_skeleton_nml
    from raygun_tpu.systems import load_system

    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)
    gt = make_segmentation_dataset(
        os.path.join(out, "gt.zarr"), shape=(args.vol,) * 3,
        num_cells=64, seed=31, **HARD)
    conf = {
        "system": "MTLSD",
        "sources": [gt],
        "ndims": 3, "batch_size": 1,
        "input_shape": [196] * 3, "output_shape": [104] * 3,
        "voxel_size": [30, 30, 30],
        "n_diagonals": 8,
        "model_kwargs": {"unet_kwargs": {
            "input_nc": 1, "ngf": 12, "fmap_inc_factor": 6,
            "downsample_factors": [[2, 2, 2]] * 3,
            "constant_upsample": True,
        }, "num_affs": 20},
        "elastic_aug1_kwargs": None, "elastic_aug2_kwargs": None,
        "intensity_aug_kwargs": {"scale_min": 0.9, "scale_max": 1.1,
                                 "shift_min": -0.1, "shift_max": 0.1},
        "lsd_kwargs": {"sigma": 300, "downsample": 2},
        "max_labels": 80,
        "optim_type": "adam", "optim_kwargs": {"learning_rate": 5e-4},
        "model_path": os.path.join(out, "models") + "/",
        "train_kwargs": {"log_dir": os.path.join(out, "tb"),
                         "log_every": 100,
                         "num_epochs": args.steps,
                         "save_every": args.save_every},
        "random_seed": 7,
    }
    cp = os.path.join(out, "train_conf.json")
    with open(cp, "w") as f:
        json.dump(conf, f, indent=2)
    cwd = os.getcwd()
    os.chdir(out)
    try:
        t0 = time.time()
        system = load_system(cp)
        system.build_system()
        system.train()
        print(f"trained {args.steps} steps in {time.time() - t0:.0f}s",
              flush=True)
    finally:
        os.chdir(cwd)

    ev = make_segmentation_dataset(
        os.path.join(out, "eval.zarr"), shape=(args.eval_vol,) * 3,
        num_cells=24, seed=77, **HARD)
    labels = open_ds(ev["path"], ev["labels"]).read()
    nml = make_skeleton_nml(labels, os.path.join(out, "skel.nml"),
                            n_trees=20)

    results = {}
    for ckpt in (int(c) for c in args.ckpts.split(",")):
        predict_conf = {
            "config_path": cp,
            "source_path": ev["path"],
            "source_dataset": ev["raw"],
            "checkpoint": ckpt,
            "scaleShift_input": [2, -1],
            "output_ds": ["volumes/pred_affs", "volumes/pred_lsds"],
            "input_shape": [196] * 3, "output_shape": [104] * 3,
            "dest_path": ev["path"],
        }
        val_conf = {
            "checkpoint": ckpt,
            "metric_path": os.path.join(out, "validation_hard_metrics.json"),
            "prediction_config_path": os.path.join(out, "predict_conf.json"),
            "segment_config": {
                "file": ev["path"], "aff_ds": "volumes/pred_affs",
                "thresholds": [0.5], "save": True,
            },
            "skeleton_config": {
                "file": ev["path"], "skeleton_path": nml,
                "dataset": "skeleton_rasterization",
                "shape": [args.eval_vol] * 3, "voxel_size": [30, 30, 30],
            },
        }
        with open(val_conf["prediction_config_path"], "w") as f:
            json.dump(predict_conf, f, indent=2)
        vp = os.path.join(out, "val_conf.json")
        with open(vp, "w") as f:
            json.dump(val_conf, f, indent=2)
        t0 = time.time()
        validate_affinities(vp)
        entry = json.load(open(val_conf["metric_path"]))[str(ckpt)]
        results[ckpt] = round(entry["voi_split"] + entry["voi_merge"], 4)
        print(f"hard VOI @{ckpt}: {results[ckpt]} "
              f"({time.time() - t0:.0f}s)", flush=True)

    ck = sorted(results)
    summary = {
        "protocol": HARD,
        "cells": 64, "volume": args.vol,
        "voi_by_step": {str(c): results[c] for c in ck},
        "voi_learning_direction_ok": results[ck[-1]] < results[ck[0]],
    }
    with open(os.path.join(out, "hard_voi_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2), flush=True)


if __name__ == "__main__":
    main()
