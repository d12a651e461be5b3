"""Standalone ACLSD end-to-end leg against the r5 recipe artifacts
(VERDICT r4 #10): train the auto-context system on the recipe's GT
volume, predict the eval volume, segment on the AC affinities, merge the
result into recipe_summary.json.

Usage: python scripts/aclsd_leg_r5.py [--steps 800]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out",
                    default="/root/repo/experiments_out/production_recipe_r5")
    ap.add_argument("--steps", type=int, default=800)
    args = ap.parse_args()

    from raygun_tpu.eval.validate import validate_affinities
    from raygun_tpu.systems import load_system

    out = args.out
    ev_path = os.path.join(out, "eval0.zarr")
    nml = os.path.join(out, "skel.nml")
    src = {"path": os.path.join(out, "mtlsd_gt.zarr"),
           "raw": "volumes/raw", "labels": "volumes/labels",
           "labels_mask": "volumes/labels_mask",
           "cell_mask": "volumes/cell_mask"}
    ac_dir = os.path.join(out, "04_ACLSD")
    os.makedirs(ac_dir, exist_ok=True)

    conf = {
        "system": "ACLSD",
        "sources": [src],
        "ndims": 3, "batch_size": 1,
        "input_shape": [196] * 3, "output_shape": [104] * 3,
        "voxel_size": [30, 30, 30],
        "n_diagonals": 8,
        "model_kwargs": {
            "mt_unet_kwargs": {"input_nc": 1, "ngf": 12,
                               "fmap_inc_factor": 6,
                               "downsample_factors": [[2, 2, 2]] * 3,
                               "constant_upsample": True},
            "ac_unet_kwargs": {"input_nc": 10, "ngf": 12,
                               "fmap_inc_factor": 6,
                               "downsample_factors": [[2, 2, 2]] * 3,
                               "constant_upsample": True,
                               "padding_type": "same"},
            "num_affs": 20},
        "elastic_aug1_kwargs": None, "elastic_aug2_kwargs": None,
        "intensity_aug_kwargs": {"scale_min": 0.9, "scale_max": 1.1,
                                 "shift_min": -0.1, "shift_max": 0.1},
        "lsd_kwargs": {"sigma": 300, "downsample": 2},
        "max_labels": 32,
        "optim_type": "adam", "optim_kwargs": {"learning_rate": 5e-4},
        "model_path": os.path.join(ac_dir, "models") + "/",
        "train_kwargs": {"log_dir": os.path.join(ac_dir, "tb"),
                         "log_every": max(args.steps // 20, 1),
                         "num_epochs": args.steps,
                         "save_every": args.steps},
        "random_seed": 13,
    }
    cp = os.path.join(ac_dir, "train_conf.json")
    with open(cp, "w") as f:
        json.dump(conf, f, indent=2)

    import re
    done = 0
    md = os.path.join(ac_dir, "models")
    if os.path.isdir(md):
        for name in os.listdir(md):
            m = re.search(r"_checkpoint_(\d+)$", name)
            if m:
                done = max(done, int(m.group(1)))
    if done < args.steps:
        cwd = os.getcwd()
        os.chdir(ac_dir)
        try:
            t0 = time.time()
            system = load_system(cp)
            system.build_system()
            system.train()
            print(f"ACLSD: {args.steps} steps in {time.time() - t0:.0f}s",
                  flush=True)
        finally:
            os.chdir(cwd)

    predict_conf = {
        "config_path": cp,
        "source_path": ev_path,
        "source_dataset": "volumes/raw",
        "checkpoint": args.steps,
        "scaleShift_input": [2, -1],
        "output_ds": ["volumes/pred_affs", "volumes/pred_lsds",
                      "volumes/pred_affs_ac"],
        "input_shape": [196] * 3, "output_shape": [104] * 3,
        "dest_path": ev_path,
    }
    val_conf = {
        "checkpoint": args.steps,
        "metric_path": os.path.join(out, "validation_eval0_metrics_aclsd.json"),
        "prediction_config_path": os.path.join(out, "predict_conf_aclsd.json"),
        "segment_config": {
            "file": ev_path, "aff_ds": "volumes/pred_affs_ac",
            "thresholds": [0.5], "save": True,
        },
        "skeleton_config": {
            "file": ev_path, "skeleton_path": nml,
            "dataset": "skeleton_rasterization",
            "shape": [256] * 3, "voxel_size": [30, 30, 30],
        },
    }
    with open(val_conf["prediction_config_path"], "w") as f:
        json.dump(predict_conf, f, indent=2)
    vp = os.path.join(out, "val_conf_aclsd.json")
    with open(vp, "w") as f:
        json.dump(val_conf, f, indent=2)
    t0 = time.time()
    validate_affinities(vp)
    entry = json.load(open(val_conf["metric_path"]))[str(args.steps)]
    print(f"ACLSD validation in {time.time() - t0:.0f}s: "
          f"voi {entry['voi_split'] + entry['voi_merge']:.4f}", flush=True)

    sp = os.path.join(out, "recipe_summary.json")
    s = json.load(open(sp))
    s["aclsd"] = {
        "steps": args.steps,
        "voi_sum": round(entry["voi_split"] + entry["voi_merge"], 4),
        "metrics": entry,
    }
    json.dump(s, open(sp, "w"), indent=2)
    print(json.dumps(s["aclsd"], indent=2), flush=True)


if __name__ == "__main__":
    main()
