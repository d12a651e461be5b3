"""Validate-only tail of quick_hard_voi.py (checkpoints that exist).

Usage: python scripts/hard_voi_validate.py [--ckpts 50,200,500]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out", default="/root/repo/experiments_out/production_recipe_r5/05_hard_voi")
    ap.add_argument("--ckpts", default="50,200,500")
    ap.add_argument("--eval-vol", type=int, default=160)
    args = ap.parse_args()

    from raygun_tpu.eval.validate import validate_affinities
    from raygun_tpu.io import make_segmentation_dataset, open_ds
    from raygun_tpu.io.synthetic import make_skeleton_nml
    from scripts.quick_hard_voi import HARD

    out = os.path.abspath(args.out)
    cp = os.path.join(out, "train_conf.json")
    ev = make_segmentation_dataset(
        os.path.join(out, "eval.zarr"), shape=(args.eval_vol,) * 3,
        num_cells=24, seed=77, **HARD)
    labels = open_ds(ev["path"], ev["labels"]).read()
    nml = make_skeleton_nml(labels, os.path.join(out, "skel.nml"),
                            n_trees=24)

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
        "cells": 64, "volume": 224,
        "voi_by_step": {str(c): results[c] for c in ck},
        "voi_learning_direction_ok": results[ck[-1]] < results[ck[0]],
    }
    with open(os.path.join(out, "hard_voi_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2), flush=True)


if __name__ == "__main__":
    main()
