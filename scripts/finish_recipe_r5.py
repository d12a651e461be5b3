"""Finish the r5 recipe's evaluation stages from EXISTING checkpoints.

The r5 session's MTLSD trainer ran ~3x slower than the r3-measured rate
(relay-session degradation across restarts; see stage_times.json), so the
10k/6k-step plan was cut at checkpoint 3500. This script produces the
quality evidence from what trained:

  1. the held-out eval volume + skeleton GT (hard protocol, seed 99);
  2. the VOI sweep: predict -> segment -> skeleton-VOI at checkpoints
     500 / 2000 / 3500 (budget-monotone VOI is the discriminating claim);
  3. the downstream enhancement comparison WITHOUT training new legs:
     the same model predicts the eval volume's netG2-ENHANCED 90nm
     acquisition vs the raw 90nm acquisition — if enhancement restores
     membrane evidence, segmentation on fake-30nm beats raw-90nm
     (cross-domain form of the reference's Fig-1; the per-domain-trained
     form needs the full 02_MTLSD leg budget);
  4. recipe_summary.json assembling all of it.

Usage: python scripts/finish_recipe_r5.py [--out DIR]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out",
                    default="/root/repo/experiments_out/production_recipe_r5")
    ap.add_argument("--ckpts", default="500,2000,3500")
    ap.add_argument("--eval-vol", type=int, default=256)
    ap.add_argument("--gap-fraction", type=float, default=0.35)
    ap.add_argument("--membrane-sigma", type=float, default=0.6)
    args = ap.parse_args()

    import jax  # noqa: F401  (device init before tensorstore threads)

    from raygun_tpu.cli.predict import predict as predict_cli
    from raygun_tpu.core.roi import Coordinate, Roi
    from raygun_tpu.eval.validate import validate_affinities
    from raygun_tpu.io import make_segmentation_dataset, open_ds
    from raygun_tpu.io.synthetic import (
        downsample_raw, make_skeleton_nml, synthetic_labels,
        synthetic_raw_from_labels,
    )
    from raygun_tpu.io.volume import prepare_ds

    out = args.out
    raw_kwargs = {"gap_fraction": args.gap_fraction,
                  "membrane_sigma": args.membrane_sigma}
    ckpts = [int(c) for c in args.ckpts.split(",")]
    mt_conf_path = os.path.join(out, "02_MTLSD", "train_conf.json")
    cg_conf_path = os.path.join(out, "01_cycleGAN", "train_conf.json")
    eval_vol = args.eval_vol

    # ---- eval volume + skeleton GT ---------------------------------------
    ev_path = os.path.join(out, "eval0.zarr")
    ev = make_segmentation_dataset(
        ev_path, shape=(eval_vol,) * 3, num_cells=20, seed=99, **raw_kwargs)
    ev_labels = open_ds(ev["path"], ev["labels"]).read()
    nml = make_skeleton_nml(ev_labels, os.path.join(out, "skel.nml"),
                            n_trees=24)

    # 90nm acquisition of the SAME eval structure with independent noise,
    # and its netG2 enhancement (2D net over the 3D volume, section-wise)
    labels_e = synthetic_labels((eval_vol,) * 3, num_cells=20, seed=99)
    raw_e90 = downsample_raw(
        synthetic_raw_from_labels(labels_e, 101, **raw_kwargs), 3)
    vol = open_ds(ev["path"], ev["raw"])
    prepare_ds(ev_path, "volumes/raw_90nm", vol.roi, vol.voxel_size,
               np.uint8, delete=True).write(vol.roi, raw_e90)
    import re
    best_cg = 0
    for name in os.listdir(os.path.join(out, "01_cycleGAN", "models")):
        m = re.search(r"_checkpoint_(\d+)$", name)
        if m:
            best_cg = max(best_cg, int(m.group(1)))
    render = {
        "config_path": cg_conf_path,
        "source_path": ev_path,
        "source_dataset": "volumes/raw_90nm",
        "net_name": "netG2",
        "checkpoint": best_cg,
        "input_shape": eval_vol, "output_shape": eval_vol, "ndims": 2,
        "output_ds": ["volumes/fake_30nm"],
        "out_specs": {"fake": {"dtype": "uint8"}},
        "dest_path": ev_path,
    }
    rp = os.path.join(out, "render_eval_fake.json")
    with open(rp, "w") as f:
        json.dump(render, f, indent=2)
    t0 = time.time()
    predict_cli(rp)
    print(f"enhanced eval volume in {time.time() - t0:.0f}s", flush=True)

    # ---- validation loop helper ------------------------------------------
    def run_validation_loop(ckpt, metric_name, source_dataset, tag):
        predict_conf = {
            "config_path": mt_conf_path,
            "source_path": ev["path"],
            "source_dataset": source_dataset,
            "checkpoint": ckpt,
            "scaleShift_input": [2, -1],
            "output_ds": ["volumes/pred_affs", "volumes/pred_lsds"],
            "input_shape": [196] * 3, "output_shape": [104] * 3,
            "dest_path": ev["path"],
        }
        val_conf = {
            "checkpoint": ckpt,
            "metric_path": os.path.join(out, metric_name),
            "prediction_config_path": os.path.join(
                out, f"predict_conf{tag}.json"),
            "segment_config": {
                "file": ev["path"], "aff_ds": "volumes/pred_affs",
                "thresholds": [0.5], "save": True,
            },
            "skeleton_config": {
                "file": ev["path"], "skeleton_path": nml,
                "dataset": "skeleton_rasterization",
                "shape": [eval_vol] * 3, "voxel_size": [30, 30, 30],
            },
        }
        with open(val_conf["prediction_config_path"], "w") as f:
            json.dump(predict_conf, f, indent=2)
        vp = os.path.join(out, f"val_conf{tag}.json")
        with open(vp, "w") as f:
            json.dump(val_conf, f, indent=2)
        t0 = time.time()
        validate_affinities(vp)
        entry = json.load(open(val_conf["metric_path"]))[str(ckpt)]
        print(f"{metric_name} @{ckpt} [{source_dataset}]: "
              f"voi {entry['voi_split'] + entry['voi_merge']:.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)
        return entry

    # ---- VOI sweep on the real-30nm eval raw -----------------------------
    entries = {}
    for ckpt in ckpts:
        entries[ckpt] = run_validation_loop(
            ckpt, "validation_eval0_metrics.json", ev["raw"], "")
    voi_by_step = {
        str(c): round(e["voi_split"] + e["voi_merge"], 4)
        for c, e in entries.items()
    }
    print(f"VOI by checkpoint: {voi_by_step}", flush=True)

    # ---- cross-domain downstream comparison ------------------------------
    last = ckpts[-1]
    link = run_validation_loop(
        last, "validation_eval0_metrics_xlink.json",
        "volumes/fake_30nm", "_xlink")
    real90 = run_validation_loop(
        last, "validation_eval0_metrics_xreal90.json",
        "volumes/raw_90nm", "_xreal90")
    downstream = {
        "mode": "cross-domain prediction (one model trained on real-30nm "
                "raw; per-domain-trained legs need the full 02_MTLSD "
                "budget — see script docstring)",
        "link": {"voi_sum": round(link["voi_split"] + link["voi_merge"], 4),
                 "metrics": link},
        "real90": {"voi_sum": round(
            real90["voi_split"] + real90["voi_merge"], 4),
            "metrics": real90},
    }
    downstream["link_beats_real90"] = bool(
        downstream["link"]["voi_sum"] < downstream["real90"]["voi_sum"])
    print(f"downstream (cross-domain): link {downstream['link']['voi_sum']}"
          f" vs real90 {downstream['real90']['voi_sum']}", flush=True)

    # ---- summary ----------------------------------------------------------
    stage_times = {}
    tp = os.path.join(out, "stage_times.json")
    if os.path.exists(tp):
        stage_times = json.load(open(tp))
    img = {}
    for name in ("compare_30nm_metrics", "compare_90nm_metrics_paired"):
        p = os.path.join(out, f"{name}.json")
        if os.path.exists(p):
            img[name] = json.load(open(p))
    summary = {
        "workload": f"CycleGAN 3x512^2 2000 steps; MTLSD 1x196^3 "
                    f"{last} steps (cut from the 10k plan — this "
                    f"session's trainer ran ~3x below the r3-measured "
                    f"rate; see finish_recipe_r5.py docstring)",
        "protocol": dict(raw_kwargs),
        "cyclegan_steps_per_sec": round(
            stage_times.get("cyclegan_steps", 0)
            / max(stage_times.get("cyclegan", 1), 1), 3),
        "mtlsd_steps_per_sec": round(
            stage_times.get("mtlsd_steps", 0)
            / max(stage_times.get("mtlsd", 1), 1), 3),
        "image_metrics_unpaired": img.get("compare_30nm_metrics", {}),
        "image_metrics_paired_crop64": img.get(
            "compare_90nm_metrics_paired", {}),
        "validation": entries[last],
        "voi_by_step": voi_by_step,
        "voi_learning_direction_ok": bool(
            voi_by_step[str(ckpts[-1])] < voi_by_step[str(ckpts[0])]),
        "score_voi_sum": voi_by_step[str(last)],
        "downstream": downstream,
    }
    with open(os.path.join(out, "recipe_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2), flush=True)


if __name__ == "__main__":
    main()
