"""Re-run the stage-2b PAIRED enhancement eval against existing recipe
checkpoints with the independent-acquisition-noise protocol (see the
stage-2b comment in run_production_recipe.py: downsampling the target
image itself leaks the target's noise into raw_90nm — correlated errors
that unfairly flatter the blur baseline).

Usage: [JAX_PLATFORMS=cpu] python scripts/paired_eval_r5.py [--out DIR]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out",
                    default="/root/repo/experiments_out/production_recipe_r5")
    ap.add_argument("--gap-fraction", type=float, default=0.35)
    ap.add_argument("--membrane-sigma", type=float, default=0.6)
    ap.add_argument("--vol", type=int, default=1536)
    ap.add_argument("--side", type=int, default=512)
    args = ap.parse_args()

    from raygun_tpu.cli.predict import predict as predict_cli
    from raygun_tpu.core.roi import Coordinate, Roi
    from raygun_tpu.eval.image_metrics import images_compare
    from raygun_tpu.io.synthetic import (
        downsample_raw, synthetic_labels, synthetic_raw_from_labels,
    )
    from raygun_tpu.io.volume import prepare_ds

    raw_kwargs = {"gap_fraction": args.gap_fraction,
                  "membrane_sigma": args.membrane_sigma}
    out = args.out
    data_path = os.path.join(out, "cyclegan_data.zarr")
    cg_dir = os.path.join(out, "01_cycleGAN")

    shape = (args.vol, args.vol)
    labels_p = synthetic_labels(shape, num_cells=max(24, args.vol // 24),
                                seed=23)
    raw_p30 = synthetic_raw_from_labels(labels_p, 24, **raw_kwargs)
    raw_p90 = downsample_raw(
        synthetic_raw_from_labels(labels_p, 25, **raw_kwargs), 3)
    vx = Coordinate(30, 30)
    roi = Roi((0, 0), Coordinate(shape) * vx)
    prepare_ds(data_path, "pair_real_30nm", roi, vx, np.uint8,
               delete=True).write(roi, raw_p30)
    prepare_ds(data_path, "pair_raw_90nm", roi, vx, np.uint8,
               delete=True).write(roi, raw_p90)

    import re
    best = 0
    for name in os.listdir(os.path.join(cg_dir, "models")):
        m = re.search(r"_checkpoint_(\d+)$", name)
        if m:
            best = max(best, int(m.group(1)))
    render = {
        "config_path": os.path.join(cg_dir, "train_conf.json"),
        "source_path": data_path,
        "source_dataset": "pair_raw_90nm",
        "net_name": "netG2",
        "checkpoint": best,
        "input_shape": args.side, "output_shape": args.side,
        "output_ds": ["pair_fake_30nm"],
        "out_specs": {"fake": {"dtype": "uint8"}},
        "dest_path": data_path,
    }
    rp = os.path.join(cg_dir, "render_pair_indep.json")
    with open(rp, "w") as f:
        json.dump(render, f, indent=2)
    predict_cli(rp)

    paired = images_compare({
        "target_source": {"path": data_path, "ds": "pair_real_30nm"},
        "test_sources": {
            "fake_30nm": {"path": data_path, "ds": "pair_fake_30nm"},
            "raw_90nm": {"path": data_path, "ds": "pair_raw_90nm"},
        },
        "crop": 64,
        "metrics_path": os.path.join(out, "compare_90nm_metrics_paired.json"),
    })
    print(json.dumps(paired, indent=2))


if __name__ == "__main__":
    main()
