"""Image-quality metrics + dataset comparison.

Capability parity with reference ``src/raygun/evaluation/image_compare.py``
(skimage.metrics backed there; implemented natively here since this
environment has no skimage): normalized_root_mse, peak_signal_noise_ratio,
structural_similarity with skimage-default semantics (euclidean NRMSE
normalization; SSIM with uniform 7^nd window, K1=0.01/K2=0.03, and the
skimage data_range convention).
"""

from __future__ import annotations

import logging
import sys
from typing import Optional, Sequence

import numpy as np
from scipy import ndimage

from ..core.config import read_config, to_json
from ..core.roi import Coordinate
from ..io.volume import open_ds

logger = logging.getLogger(__name__)


def normalized_root_mse(target: np.ndarray, test: np.ndarray,
                        normalization: str = "euclidean") -> float:
    target = target.astype(np.float64)
    test = test.astype(np.float64)
    rmse = np.sqrt(np.mean((target - test) ** 2))
    if normalization == "euclidean":
        denom = np.sqrt(np.mean(target**2))
    elif normalization == "min-max":
        denom = target.max() - target.min()
    elif normalization == "mean":
        denom = target.mean()
    else:
        raise ValueError(normalization)
    return float(rmse / denom)


def _data_range(target: np.ndarray) -> float:
    if np.issubdtype(target.dtype, np.integer):
        info = np.iinfo(target.dtype)
        return float(info.max) - float(info.min)
    return float(target.max() - target.min())


def peak_signal_noise_ratio(target: np.ndarray, test: np.ndarray,
                            data_range: Optional[float] = None) -> float:
    if data_range is None:
        data_range = _data_range(target)
    mse = np.mean((target.astype(np.float64) - test.astype(np.float64)) ** 2)
    if mse == 0.0:
        return float("inf")  # identical images: PSNR is +inf by convention
    return float(10.0 * np.log10(data_range**2 / mse))


def structural_similarity(target: np.ndarray, test: np.ndarray,
                          data_range: Optional[float] = None,
                          win_size: int = 7, K1: float = 0.01,
                          K2: float = 0.03) -> float:
    """Mean SSIM with a uniform window (skimage defaults)."""
    if data_range is None:
        data_range = _data_range(target)
    x = target.astype(np.float64)
    y = test.astype(np.float64)
    nd = x.ndim

    def filt(a):
        return ndimage.uniform_filter(a, size=win_size)

    NP = win_size**nd
    cov_norm = NP / (NP - 1)  # sample covariance (skimage use_sample_covariance)
    ux, uy = filt(x), filt(y)
    uxx, uyy, uxy = filt(x * x), filt(y * y), filt(x * y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    ssim_map = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
        (ux**2 + uy**2 + C1) * (vx + vy + C2)
    )
    pad = (win_size - 1) // 2  # crop the filter's edge effects (skimage)
    sl = tuple(slice(pad, s - pad) for s in ssim_map.shape)
    return float(ssim_map[sl].mean())


_METRICS = {
    "normalized_root_mse": normalized_root_mse,
    "peak_signal_noise_ratio": peak_signal_noise_ratio,
    "structural_similarity": structural_similarity,
}


def _nearest_upsample_to(arr: np.ndarray, shape) -> np.ndarray:
    """Integer nearest-neighbour upsample of ``arr`` to ``shape`` (no-op if
    already at least as fine on every axis)."""
    reps = []
    for s, t in zip(arr.shape, shape):
        if t <= s:
            return arr
        assert t % s == 0, (
            f"cannot compare shapes {arr.shape} vs {tuple(shape)}: "
            "voxel sizes are not integer multiples"
        )
        reps.append(t // s)
    for axis, r in enumerate(reps):
        if r > 1:
            arr = np.repeat(arr, r, axis=axis)
    return arr


def image_compare(test, target, metrics=None, roi=None, crop=None) -> dict:
    """ROI-intersected metrics over two Volumes (parity: reference
    ``image_compare.py:12-35``).

    Beyond the reference: the volumes may live on different voxel grids
    (e.g. a fake-30nm render stored at the 90nm acquisition grid vs the
    real 30nm target). The intersected ROI is snapped inward to both grids
    and the coarser image is nearest-upsampled to the finer one when the
    voxel sizes are integer multiples."""
    metrics = metrics or list(_METRICS)
    if roi is None:
        roi = test.roi.intersect(target.roi)
    if crop is not None:
        shrink = target.voxel_size * crop
        roi = roi.grow(-shrink, -shrink)
    grid = Coordinate(
        int(np.lcm(int(t), int(g)))
        for t, g in zip(test.voxel_size, target.voxel_size)
    )
    roi = roi.snap_to_grid(grid, mode="shrink")
    a = test.read(roi)
    b = target.read(roi)
    if a.shape != b.shape:
        a = _nearest_upsample_to(a, b.shape)
        b = _nearest_upsample_to(b, a.shape)
    results = {}
    for metric in metrics:
        results[metric] = _METRICS[metric](b, a)
        logger.info(f"\t{metric}: {results[metric]}")
    return results


def images_compare(config=None):
    """CLI body (parity: reference ``image_compare.py:38-60``)."""
    if config is None:
        config = sys.argv[1]
    if isinstance(config, str):
        config = read_config(config)
    target = open_ds(config["target_source"]["path"], config["target_source"]["ds"])
    crop = config.get("crop")
    results = {}
    for name, dataset in config["test_sources"].items():
        try:
            logger.info(f"Comparing {name} to target...")
            test = open_ds(dataset["path"], dataset["ds"])
            results[name] = image_compare(test, target, crop=crop)
        except Exception as e:
            logger.info(f"Failed to compare {name} to target: {e}")
    to_json(results, config["metrics_path"])
    return results
