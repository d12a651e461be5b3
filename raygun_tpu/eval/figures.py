"""Qualitative figures + batch display.

Capability parity with reference ``src/raygun/evaluation/qualitative_figs.py``
(panel figures from zarr ROIs with label-overlay segmentations, ``:9-70``) and
``CycleGAN.batch_show`` (reference ``systems/CycleGAN.py:40-82`` matplotlib
grid of real/fake/cycled per side).
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Dict, Optional, Sequence

import numpy as np

from ..core.config import read_config
from ..core.roi import Roi
from ..io.volume import open_ds

logger = logging.getLogger(__name__)


def label2rgb(labels: np.ndarray, image: Optional[np.ndarray] = None,
              alpha: float = 0.5, bg_label: int = 0, seed: int = 7) -> np.ndarray:
    """Color labels over a grayscale image (skimage.color.label2rgb
    capability; skimage absent in this environment)."""
    rng = np.random.default_rng(seed)
    ids = np.unique(labels)
    lut = {int(i): rng.random(3) for i in ids if i != bg_label}
    rgb = np.zeros(labels.shape + (3,), np.float32)
    for i, color in lut.items():
        rgb[labels == i] = color
    if image is not None:
        img = image.astype(np.float32)
        img = (img - img.min()) / max(img.max() - img.min(), 1e-9)
        base = np.stack([img] * 3, axis=-1)
        fg = (labels != bg_label)[..., None]
        rgb = np.where(fg, (1 - alpha) * base + alpha * rgb, base)
    return np.clip(rgb, 0, 1)


def _mid_slice(arr: np.ndarray) -> np.ndarray:
    """2D section for display: middle z of 3D, channels dropped/first-3."""
    a = np.asarray(arr)
    while a.ndim > 3:
        a = a[0]
    if a.ndim == 3:
        if a.shape[0] <= 4:  # channels-first volume slice
            a = a[0]
        else:
            a = a[a.shape[0] // 2]
    return a


def batch_show(batch: Dict[str, np.ndarray], save_path: Optional[str] = None,
               i: int = 0):
    """Grid of batch arrays (reference ``CycleGAN.batch_show`` capability):
    one row per side/array, scaled [-1,1]→[0,1] where needed."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    names = list(batch)
    fig, axes = plt.subplots(1, len(names), figsize=(3 * len(names), 3.2))
    if len(names) == 1:
        axes = [axes]
    for ax, name in zip(axes, names):
        arr = np.asarray(batch[name])
        if arr.ndim > 2:
            arr = _mid_slice(arr[i] if arr.shape[0] > i else arr)
        img = arr.astype(np.float32)
        if img.min() < 0 and img.min() >= -1.01 and img.max() <= 1.01:
            img = img * 0.5 + 0.5
        ax.imshow(img, cmap="gray", vmin=0, vmax=1)
        ax.set_title(name, fontsize=9)
        ax.axis("off")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
        return save_path
    return fig


def qualitative_figs(config=None):
    """Panel figures from zarr ROIs with optional seg overlays (reference
    ``qualitative_figs.py:9-70``)."""
    if config is None:
        config = sys.argv[1]
    if isinstance(config, str):
        config = read_config(config)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    panels = config["panels"]  # [{path, ds, seg_ds?, roi?: [offset, shape]}]
    out_path = config.get("out_path", "qualitative.png")
    fig, axes = plt.subplots(1, len(panels), figsize=(4 * len(panels), 4.2))
    if len(panels) == 1:
        axes = [axes]
    for ax, panel in zip(axes, panels):
        vol = open_ds(panel["path"], panel["ds"])
        roi = Roi(*panel["roi"]) if "roi" in panel else vol.roi
        img = _mid_slice(vol.read(roi))
        if "seg_ds" in panel:
            seg = _mid_slice(open_ds(panel["path"], panel["seg_ds"]).read(roi))
            ax.imshow(label2rgb(seg, img))
        else:
            ax.imshow(img, cmap="gray")
        ax.set_title(panel.get("title", panel["ds"]), fontsize=9)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path
