"""Image-quality comparison figure (reference 03_evaluate/plot_img_compare.py).

Reads the metrics JSONs written by raygun-images-compare and draws grouped
bars of NRMSE / PSNR / SSIM per model. Headless-safe (Agg).

Usage: python plot_img_compare.py metrics1.json [metrics2.json ...] [-o out.png]
"""

import json
import sys

import matplotlib

matplotlib.use("Agg", force=False)
import matplotlib.pyplot as plt
import numpy as np


def plot(metric_files, out_path="img_compare.png"):
    rows = {}
    for path in metric_files:
        with open(path) as f:
            data = json.load(f)
        for model, metrics in data.items():
            rows.setdefault(model, {}).update(
                {k: v for k, v in metrics.items() if isinstance(v, (int, float))}
            )
    metric_names = sorted({k for m in rows.values() for k in m})
    models = sorted(rows)
    fig, axs = plt.subplots(1, len(metric_names),
                            figsize=(4 * len(metric_names), 4))
    if len(metric_names) == 1:
        axs = [axs]
    x = np.arange(len(models))
    for ax, met in zip(axs, metric_names):
        vals = [rows[m].get(met, np.nan) for m in models]
        ax.bar(x, vals, color=plt.get_cmap("tab10")(range(len(models))))
        ax.set_xticks(x)
        ax.set_xticklabels(models, rotation=45, ha="right", fontsize=8)
        ax.set_title(met)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    print("wrote", out_path)
    return out_path


if __name__ == "__main__":
    args = sys.argv[1:]
    out = "img_compare.png"
    if "-o" in args:
        i = args.index("-o")
        out = args[i + 1]
        args = args[:i] + args[i + 2:]
    plot(args, out)
