"""Qualitative panel figures (reference 03_evaluate/qualitative_figs.py).

Draws raw / fake / affinities / segmentation panels from zarr ROIs using
the library figure helpers (raygun_tpu.eval.figures). Headless-safe.

Usage: python qualitative_figs.py fig_conf.json
Config: {"file": ..., "datasets": ["volumes/raw", ...], "z": 10,
         "out": "qualitative.png", "seg_datasets": ["mutex_0.50"]}
"""

import sys

import matplotlib

matplotlib.use("Agg", force=False)
import matplotlib.pyplot as plt
import numpy as np

from raygun_tpu.core.config import read_config
from raygun_tpu.eval.figures import label2rgb
from raygun_tpu.io.volume import open_ds


def make_figure(config):
    file = config["file"]
    datasets = list(config.get("datasets", []))
    segs = list(config.get("seg_datasets", []))
    z = int(config.get("z", 0))
    panels = []
    titles = []
    for ds in datasets:
        arr = np.asarray(open_ds(file, ds).read())
        if arr.ndim == 4:  # channels-first multichannel: show first 3 as rgb
            sec = np.moveaxis(arr[:3, z], 0, -1).astype(np.float32)
            sec = (sec - sec.min()) / max(sec.ptp(), 1e-8)
        else:
            sec = arr[z] if arr.ndim == 3 else arr
        panels.append(sec)
        titles.append(ds)
    for ds in segs:
        arr = np.asarray(open_ds(file, ds).read())
        panels.append(label2rgb(arr[z] if arr.ndim == 3 else arr))
        titles.append(ds)
    n = len(panels)
    fig, axs = plt.subplots(1, n, figsize=(4 * n, 4))
    if n == 1:
        axs = [axs]
    for ax, panel, title in zip(axs, panels, titles):
        ax.imshow(panel, cmap=None if panel.ndim == 3 else "gray")
        ax.set_title(title, fontsize=9)
        ax.axis("off")
    fig.tight_layout()
    out = config.get("out", "qualitative.png")
    fig.savefig(out, dpi=120)
    print("wrote", out)
    return out


if __name__ == "__main__":
    make_figure(read_config(sys.argv[1]))
