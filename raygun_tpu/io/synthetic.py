"""Synthetic labeled volumes for tests and benchmarks.

The reference has **no** synthetic-data generator — its tests depend on
cluster paths (reference ``tests/torch/systems/CycleGAN_conf.json:4``,
SURVEY §4). This module fills that gap: CREMI-style cell-segmentation cubes
(Voronoi regions with smoothed borders) and paired low/high-resolution
intensity volumes for CycleGAN smoke training.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np
from scipy import ndimage

from ..core.roi import Coordinate, Roi
from .volume import Volume, prepare_ds


def synthetic_labels(
    shape: Tuple[int, ...],
    num_cells: int = 24,
    seed: int = 17,
    smooth: float = 2.0,
) -> np.ndarray:
    """Voronoi-style cell labels (uint64, 1..num_cells) with irregular,
    smooth boundaries — a stand-in for EM neuron segmentation GT."""
    rng = np.random.default_rng(seed)
    nd = len(shape)
    points = rng.uniform(0, 1, size=(num_cells, nd)) * np.array(shape)
    # distance to nearest seed, warped by smooth noise for irregularity
    grids = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    warp = [
        ndimage.gaussian_filter(rng.normal(0, 1, shape), sigma=max(shape) / 8) * smooth * 4
        for _ in range(nd)
    ]
    coords = np.stack([g + w for g, w in zip(grids, warp)], axis=-1)  # (*shape, nd)
    d2 = np.sum(
        (coords[..., None, :] - points[None, ...].reshape((1,) * nd + points.shape)) ** 2,
        axis=-1,
    )
    labels = np.argmin(d2, axis=-1).astype(np.uint64) + 1
    return labels


def synthetic_raw_from_labels(
    labels: np.ndarray,
    seed: int = 3,
    noise: float = 0.1,
    membrane_sigma: float = 1.0,
    gap_fraction: float = 0.0,
) -> np.ndarray:
    """EM-like intensity: dark membranes at label boundaries + texture.

    Harder-protocol knobs (VERDICT r3 #5: the default protocol saturates
    watershed VOI near zero after ~2k training steps, so quality scores
    stop discriminating): ``membrane_sigma`` < 1 thins the membranes and
    ``gap_fraction`` > 0 ERASES that fraction of the membrane signal in
    smooth random patches — the classic boundary-evidence gaps that force
    an affinity model to use shape context and keep VOI moving with
    training budget (a raw-intensity watershed merges through every gap)."""
    rng = np.random.default_rng(seed)
    boundary = np.zeros(labels.shape, bool)
    for ax in range(labels.ndim):
        sl_a = [slice(None)] * labels.ndim
        sl_b = [slice(None)] * labels.ndim
        sl_a[ax] = slice(1, None)
        sl_b[ax] = slice(None, -1)
        edge = labels[tuple(sl_a)] != labels[tuple(sl_b)]
        boundary[tuple(sl_a)] |= edge
        boundary[tuple(sl_b)] |= edge
    membrane = ndimage.gaussian_filter(
        boundary.astype(np.float32), membrane_sigma)
    if gap_fraction > 0.0:
        # smooth random field thresholded at the requested quantile:
        # contiguous membrane patches lose their intensity evidence
        field = ndimage.gaussian_filter(
            rng.normal(0, 1, labels.shape), max(labels.shape) / 16)
        thresh = np.quantile(field, gap_fraction)
        membrane = np.where(field < thresh, 0.0, membrane)
    texture = ndimage.gaussian_filter(rng.normal(0, 1, labels.shape), 1.5)
    img = 0.75 - 0.6 * np.clip(membrane * 2, 0, 1) + 0.12 * texture
    img = img + rng.normal(0, noise, labels.shape)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def downsample_raw(raw: np.ndarray, factor: int = 3) -> np.ndarray:
    """Blur+stride to fake a lower-resolution acquisition (30nm→90nm)."""
    blurred = ndimage.gaussian_filter(raw.astype(np.float32), factor / 2)
    upsampled = ndimage.zoom(blurred[tuple(slice(None, None, factor) for _ in raw.shape)],
                             factor, order=1)
    # pad/crop back to original shape
    out = np.zeros_like(raw, dtype=np.float32)
    sl = tuple(slice(0, min(a, b)) for a, b in zip(raw.shape, upsampled.shape))
    out[sl] = upsampled[sl]
    return np.clip(out, 0, 255).astype(np.uint8)


def make_segmentation_dataset(
    path: str,
    shape: Tuple[int, ...] = (64, 64, 64),
    voxel_size: Tuple[int, ...] = (30, 30, 30),
    num_cells: int = 24,
    seed: int = 17,
    **raw_kwargs,
) -> dict:
    """Write a CREMI-style training zarr: raw / labels / masks.

    Returns {"path", "raw", "labels", "labels_mask", "cell_mask"} in the
    source-dict shape the reference configs use
    (``default_MTLSD_conf.json`` "sources"). ``raw_kwargs`` (noise,
    membrane_sigma, gap_fraction) select the harder protocol — see
    :func:`synthetic_raw_from_labels`."""
    labels = synthetic_labels(shape, num_cells, seed)
    raw = synthetic_raw_from_labels(labels, seed + 1, **raw_kwargs)
    vx = Coordinate(voxel_size)
    total = Roi((0,) * len(shape), Coordinate(shape) * vx)

    v_raw = prepare_ds(path, "volumes/raw", total, vx, np.uint8, delete=True)
    v_raw.write(total, raw)
    v_labels = prepare_ds(path, "volumes/labels", total, vx, np.uint64, delete=True)
    v_labels.write(total, labels)
    ones = np.ones(shape, np.uint8)
    for name in ("volumes/labels_mask", "volumes/cell_mask"):
        v = prepare_ds(path, name, total, vx, np.uint8, delete=True)
        v.write(total, ones)
    return {
        "path": path,
        "raw": "volumes/raw",
        "labels": "volumes/labels",
        "labels_mask": "volumes/labels_mask",
        "cell_mask": "volumes/cell_mask",
    }


def make_cyclegan_dataset(
    path: str,
    shape: Tuple[int, ...] = (64, 64),
    voxel_size_a: Tuple[int, ...] = (30, 30),
    voxel_size_b: Tuple[int, ...] = (90, 90),
    seed: int = 5,
    **raw_kwargs,
) -> dict:
    """Write side-A (high-res) and side-B (low-res) unpaired volumes.
    ``raw_kwargs`` (noise, membrane_sigma, gap_fraction) select the harder
    protocol — see :func:`synthetic_raw_from_labels`."""
    labels = synthetic_labels(shape, num_cells=max(6, int(np.prod(shape)) // 512), seed=seed)
    raw_a = synthetic_raw_from_labels(labels, seed + 1, **raw_kwargs)
    labels_b = synthetic_labels(shape, num_cells=max(6, int(np.prod(shape)) // 512), seed=seed + 7)
    raw_b = downsample_raw(
        synthetic_raw_from_labels(labels_b, seed + 8, **raw_kwargs), 3)

    vx_a, vx_b = Coordinate(voxel_size_a), Coordinate(voxel_size_b)
    roi_a = Roi((0,) * len(shape), Coordinate(shape) * vx_a)
    roi_b = Roi((0,) * len(shape), Coordinate(shape) * vx_b)
    va = prepare_ds(path, "volumes/raw_30nm", roi_a, vx_a, np.uint8, delete=True)
    va.write(roi_a, raw_a)
    vb = prepare_ds(path, "volumes/raw_90nm", roi_b, vx_b, np.uint8, delete=True)
    vb.write(roi_b, raw_b)
    return {
        "path": path,
        "A": "volumes/raw_30nm",
        "B": "volumes/raw_90nm",
    }


def make_skeleton_nml(labels: np.ndarray, path: str, n_trees: int = 6) -> str:
    """Synthetic skeleton GT: one straight in-plane line per label through
    its centroid, written as a webknossos NML file (positions in xyz voxels
    — the convention :func:`raygun_tpu.eval.skeleton.parse_nml` reads and
    the reference's annotation zips use, reference ``skeleton.py:18-40``)."""
    lines = ['<?xml version="1.0"?>', "<things>"]
    ids = [i for i in np.unique(labels) if i != 0][:n_trees]
    for label in ids:
        zz, yy, xx = np.where(labels == label)
        cz, cy = int(np.median(zz)), int(np.median(yy))
        row = labels[cz, cy, :]
        xs = np.where(row == label)[0]
        if len(xs) < 2:
            continue
        lines.append(f'  <thing id="{int(label)}">')
        lines.append("    <nodes>")
        lines.append(f'      <node id="1" x="{int(xs[0])}" y="{cy}" z="{cz}"/>')
        lines.append(f'      <node id="2" x="{int(xs[-1])}" y="{cy}" z="{cz}"/>')
        lines.append("    </nodes>")
        lines.append('    <edges><edge source="1" target="2"/></edges>')
        lines.append("  </thing>")
    lines.append("</things>")
    with open(path, "w") as f:
        f.write("\n".join(lines))
    return path
