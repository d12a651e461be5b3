"""Blockwise watershed + agglomeration vs the whole-volume path."""

import numpy as np
import pytest

from raygun_tpu.native import rand_voi
from raygun_tpu.seg import get_segmentation
from raygun_tpu.seg.blockwise_watershed import watershed_agglomerate_blockwise


def synthetic_nn_affs(n=32, seed=0):
    """Three slabs with nearest-neighbor affinities (high inside, low across)."""
    rng = np.random.default_rng(seed)
    labels = np.ones((n, n, n), np.uint64)
    labels[n // 3:] = 2
    labels[2 * n // 3:] = 3
    affs = np.zeros((3,) + labels.shape, np.float32)
    for c, off in enumerate(((1, 0, 0), (0, 1, 0), (0, 0, 1))):
        src = tuple(slice(0, s - o) for s, o in zip(labels.shape, off))
        dst = tuple(slice(o, None) for o in off)
        same = labels[src] == labels[dst]
        affs[c][src] = np.where(same, 0.9, 0.05)
    affs += rng.uniform(0, 0.04, affs.shape).astype(np.float32)
    return labels, affs


def run_blockwise(affs, thresholds, chunk):
    shape = affs.shape[1:]
    frags = np.zeros(shape, np.uint64)
    segs = [np.zeros(shape, np.uint64) for _ in thresholds]

    def read_affs(lo, hi):
        return affs[(slice(None),) + tuple(slice(l, h) for l, h in zip(lo, hi))]

    def wf(lo, hi, arr):
        frags[tuple(slice(l, h) for l, h in zip(lo, hi))] = arr

    def rf(lo, hi):
        return frags[tuple(slice(l, h) for l, h in zip(lo, hi))]

    def ws(t, lo, hi, arr):
        segs[t][tuple(slice(l, h) for l, h in zip(lo, hi))] = arr

    n = watershed_agglomerate_blockwise(
        read_affs, shape, thresholds, wf, rf, ws, chunk=chunk)
    return segs, n


def test_single_chunk_matches_whole_volume_exactly():
    labels, affs = synthetic_nn_affs(24)
    whole = get_segmentation(affs, [0.5])[0]
    segs, n = run_blockwise(affs, [0.5], chunk=(24, 24, 24))
    d = rand_voi(whole, segs[0])
    assert d["voi_split"] + d["voi_merge"] == 0.0, d
    m = rand_voi(labels, segs[0])
    assert m["voi_split"] + m["voi_merge"] < 0.2, m


def test_multichunk_merges_cut_basins():
    """Fragments are cut at chunk faces; agglomeration merges them back to
    the whole-volume quality."""
    labels, affs = synthetic_nn_affs(32, seed=1)
    whole = get_segmentation(affs, [0.5])[0]
    segs, n = run_blockwise(affs, [0.5], chunk=(12, 13, 32))
    mw = rand_voi(labels, whole)
    mb = rand_voi(labels, segs[0])
    assert (mb["voi_split"] + mb["voi_merge"]
            <= mw["voi_split"] + mw["voi_merge"] + 0.05), (mb, mw)


def test_threshold_sweep_monotone():
    """Higher thresholds merge at least as much (fewer segments)."""
    _, affs = synthetic_nn_affs(24, seed=2)
    segs, _ = run_blockwise(affs, [0.1, 0.9], chunk=(9, 24, 24))
    n_low = len(np.unique(segs[0])) - 1
    n_high = len(np.unique(segs[1])) - 1
    assert n_high <= n_low


def test_matches_whole_volume_quality():
    labels, affs = synthetic_nn_affs(30, seed=3)
    whole = get_segmentation(affs, [0.5])[0]
    segs, _ = run_blockwise(affs, [0.5], chunk=(11, 30, 30))
    mw = rand_voi(labels, whole)
    mb = rand_voi(labels, segs[0])
    assert (mb["voi_split"] + mb["voi_merge"]
            <= mw["voi_split"] + mw["voi_merge"] + 0.05)


def test_segment_config_surface_blockwise(tmp_path):
    from raygun_tpu.core.roi import Roi
    from raygun_tpu.io.volume import open_ds, prepare_ds
    from raygun_tpu.seg.segment import segment

    labels, affs = synthetic_nn_affs(24)
    path = str(tmp_path / "vol.zarr")
    roi = Roi((0, 0, 0), (24, 24, 24))
    ds = prepare_ds(path, "pred_affs", roi, (1, 1, 1), np.float32,
                    num_channels=3)
    ds.write(roi, affs)
    segment({
        "file": path, "aff_ds": "pred_affs", "thresholds": [0.5],
        "blockwise": True, "chunk_shape": [10, 24, 24],
    })
    seg = open_ds(path, "pred_seg_0.50").read()
    m = rand_voi(labels, seg)
    assert m["voi_split"] + m["voi_merge"] < 0.2, m
    assert open_ds(path, "fragments").read().max() > 0
