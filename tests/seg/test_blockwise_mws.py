"""Blockwise (streamed) mutex watershed vs the whole-volume kernel.

Reference defect not reproduced (SURVEY §2.4): reference ``segment.py:186``
loads entire affinity volumes into RAM. The blockwise path must (a) match
the in-RAM kernel exactly when one chunk covers the volume, (b) agree up to
relabeling on multi-chunk synthetic data, and (c) be reachable from the
``mutex_segment`` config surface with ``blockwise: true``.
"""

import numpy as np
import pytest

from raygun_tpu.native import mutex_watershed, rand_voi
from raygun_tpu.seg.blockwise_mws import mutex_watershed_blockwise


OFFSETS = [
    [1, 0, 0], [0, 1, 0], [0, 0, 1],
    [3, 0, 0], [0, 3, 0], [0, 0, 3],
]
SEP = 3


def synthetic_affs(n=24, seed=0):
    """Three labeled slabs with slightly noisy affinities (inverted
    convention: attractive high inside, repulsive high across)."""
    rng = np.random.default_rng(seed)
    labels = np.ones((n, n, n), np.uint64)
    labels[n // 3:] = 2
    labels[2 * n // 3:] = 3
    affs = np.zeros((len(OFFSETS),) + labels.shape, np.float32)
    for c, off in enumerate(OFFSETS):
        sl_src = tuple(slice(max(0, -o), min(s, s - o))
                       for s, o in zip(labels.shape, off))
        sl_dst = tuple(slice(max(0, o), min(s, s + o))
                       for s, o in zip(labels.shape, off))
        same = labels[sl_src] == labels[sl_dst]
        if c < SEP:  # attractive: high inside objects
            affs[c][sl_src] = np.where(same, 0.9, 0.1)
        else:  # repulsive: high across boundaries
            affs[c][sl_src] = np.where(same, 0.1, 0.9)
    affs += rng.uniform(0, 0.05, affs.shape).astype(np.float32)
    return labels, affs


def run_blockwise(affs, chunk, strides=(1, 1, 1), mask_thresh=None,
                  solver="host"):
    shape = affs.shape[1:]
    out = np.zeros(shape, np.uint64)

    def read_affs(lo, hi):
        sl = (slice(None),) + tuple(slice(l, h) for l, h in zip(lo, hi))
        return affs[sl]

    def write_labels(lo, hi, lab):
        out[tuple(slice(l, h) for l, h in zip(lo, hi))] = lab

    def read_labels(lo, hi):
        return out[tuple(slice(l, h) for l, h in zip(lo, hi))]

    n = mutex_watershed_blockwise(
        read_affs, shape, OFFSETS, SEP, write_labels, read_labels,
        chunk=chunk, strides=strides, mask_thresh=mask_thresh, solver=solver,
    )
    return out, n


def canon(seg):
    """Canonical relabeling by first occurrence (labels are arbitrary)."""
    flat = seg.reshape(-1)
    _, first_idx, inv = np.unique(flat, return_index=True, return_inverse=True)
    order = np.argsort(np.argsort(first_idx))
    return order[inv].reshape(seg.shape)


def test_single_chunk_matches_whole_volume_exactly():
    _, affs = synthetic_affs(16)
    whole = mutex_watershed(affs, OFFSETS, SEP)
    block, n = run_blockwise(affs, chunk=(16, 16, 16))
    assert n == len(np.unique(whole))
    np.testing.assert_array_equal(canon(block), canon(whole))


def test_multichunk_matches_ground_truth():
    labels, affs = synthetic_affs(24)
    block, n = run_blockwise(affs, chunk=(9, 24, 24))
    # stitched result segments the three slabs
    m = rand_voi(labels, block)
    assert m["voi_split"] + m["voi_merge"] < 0.01, m


def test_multichunk_all_axes_with_strides_and_mask():
    labels, affs = synthetic_affs(24, seed=1)
    whole = mutex_watershed(
        affs, OFFSETS, SEP, strides=(2, 2, 2),
        mask=np.ones(labels.shape, bool),
    )
    block, _ = run_blockwise(
        affs, chunk=(10, 13, 24), strides=(2, 2, 2), mask_thresh=0.0
    )
    m = rand_voi(whole, block)
    assert m["voi_split"] + m["voi_merge"] < 0.05, m


def test_blockwise_device_solver_matches_host():
    """solver='device' (per-chunk batched TPU union-find, VERDICT r2 #3)
    must reproduce the host solver's blockwise result."""
    _, affs = synthetic_affs(20, seed=4)
    host, n_h = run_blockwise(affs, chunk=(10, 20, 20), strides=(2, 2, 2))
    dev, n_d = run_blockwise(affs, chunk=(10, 20, 20), strides=(2, 2, 2),
                             solver="device")
    assert n_h == n_d
    np.testing.assert_array_equal(canon(dev), canon(host))


def test_mask_thresh_zeroes_background():
    _, affs = synthetic_affs(12)
    affs[:, :3] = 0.0  # dead region: mean pre-inversion affinity high?
    # pre-inversion mean: attractive stay, repulsive are 1-x -> region with
    # all-zero inverted affs has pre mean (0 + 1*3/6)=0.5; use thresh 0.6
    block, _ = run_blockwise(affs, chunk=(6, 12, 12), mask_thresh=0.6)
    assert (block[:2] == 0).all()


def test_mutex_segment_config_surface(tmp_path):
    """blockwise: true via the mutex_segment config path on a real zarr."""
    from raygun_tpu.io.volume import prepare_ds
    from raygun_tpu.core.roi import Roi
    from raygun_tpu.seg.segment import mutex_segment

    labels, affs = synthetic_affs(24)
    # store the PRE-inversion convention the CLI expects (reference
    # segment.py:191-194 inverts): attractive channels as-is, repulsive
    # channels inverted
    pre = affs.copy()
    pre[SEP:] = 1.0 - pre[SEP:]
    path = str(tmp_path / "vol.zarr")
    roi = Roi((0, 0, 0), (24, 24, 24))
    ds = prepare_ds(path, "pred_affs", roi, (1, 1, 1), np.float32,
                    num_channels=len(OFFSETS))
    ds.write(roi, pre)

    out = mutex_segment({
        "file": path, "aff_ds": "pred_affs", "sep": SEP,
        "neighborhood": OFFSETS, "n_diagonals": 0,
        "mask_thresh": 0.0, "blockwise": True, "strides": [1, 1, 1],
        "chunk_shape": (12, 12, 12), "dest_dataset": "seg",
        "return_seg": True,
    })
    seg = np.asarray(out)
    m = rand_voi(labels, seg)
    assert m["voi_split"] + m["voi_merge"] < 0.01, m
