"""Native segmentation kernels: correctness vs hand-built cases and
end-to-end affinity→segmentation quality on synthetic gt (the parity tests
the reference never had for its waterz/affogato deps)."""

import numpy as np
import pytest

from raygun_tpu.native import (
    agglomerate,
    connected_components,
    mutex_watershed,
    rand_voi,
    seeded_watershed,
)
from raygun_tpu.seg import get_segmentation, watershed_from_affinities


def gt_two_blocks(n=12):
    labels = np.ones((n, n, n), np.uint64)
    labels[n // 2:] = 2
    return labels


def perfect_affs(labels, offsets=((1, 0, 0), (0, 1, 0), (0, 0, 1))):
    """GT affinities: 1 within a label, 0 across/outside."""
    C = len(offsets)
    affs = np.zeros((C,) + labels.shape, np.float32)
    for c, (oz, oy, ox) in enumerate(offsets):
        sl_src = tuple(slice(0, s - o) for s, o in zip(labels.shape, (oz, oy, ox)))
        sl_dst = tuple(slice(o, None) for o in (oz, oy, ox))
        same = (labels[sl_src] == labels[sl_dst]) & (labels[sl_src] > 0)
        affs[c][sl_src] = same.astype(np.float32)
    return affs


class TestConnectedComponents:
    def test_two_islands(self):
        mask = np.zeros((6, 6, 6), bool)
        mask[:2] = True
        mask[4:] = True
        cc = connected_components(mask, connectivity=1)
        assert cc.max() == 2
        assert cc[0, 0, 0] != cc[5, 0, 0]
        assert (cc[2:4] == 0).all()


class TestSeededWatershed:
    def test_basin_assignment(self):
        # two seeds at opposite ends; image = distance from center creates a
        # ridge in the middle
        Z = 10
        img = np.zeros((Z, 4, 4), np.float32)
        img[Z // 2] = 10.0  # high barrier in the middle (flood ascends values)
        seeds = np.zeros((Z, 4, 4), np.uint64)
        seeds[0, 0, 0] = 1
        seeds[-1, 0, 0] = 2
        out = seeded_watershed(img, seeds)
        assert (out[: Z // 2] == 1).all()
        assert (out[Z // 2 + 1:] == 2).all()
        assert set(np.unique(out)) == {1, 2}

    def test_mask_respected(self):
        img = np.zeros((4, 4, 4), np.float32)
        seeds = np.zeros((4, 4, 4), np.uint64)
        seeds[0, 0, 0] = 1
        mask = np.ones((4, 4, 4), bool)
        mask[2:] = False
        out = seeded_watershed(img, seeds, mask=mask)
        assert (out[:2] == 1).all()
        assert (out[2:] == 0).all()


class TestMutexWatershed:
    def test_separates_two_blocks(self):
        labels = gt_two_blocks(10)
        offsets = [[1, 0, 0], [0, 1, 0], [0, 0, 1], [3, 0, 0]]
        affs = perfect_affs(labels, offsets)
        # attractive = first 3 channels (affinity), repulsive = long-range
        # channel with weight = 1 - affinity (high where labels differ)
        w = np.concatenate([affs[:3], 1 - affs[3:]], axis=0)
        seg = mutex_watershed(w, offsets, sep=3, strides=(1, 1, 1))
        assert len(np.unique(seg)) == 2
        metrics = rand_voi(labels, seg)
        assert metrics["voi_split"] < 1e-6 and metrics["voi_merge"] < 1e-6

    def test_mask(self):
        labels = gt_two_blocks(8)
        offsets = [[1, 0, 0], [0, 1, 0], [0, 0, 1], [3, 0, 0]]
        affs = perfect_affs(labels, offsets)
        w = np.concatenate([affs[:3], 1 - affs[3:]], axis=0)
        mask = np.ones(labels.shape, bool)
        mask[:, :2] = False
        seg = mutex_watershed(w, offsets, sep=3, mask=mask)
        assert (seg[:, :2] == 0).all()
        assert (seg[:, 2:] > 0).all()


class TestAgglomerate:
    def test_threshold_sweep(self):
        labels = gt_two_blocks(10)
        affs = perfect_affs(labels)
        # fragments: oversegment each block into 2 fragments
        fragments = labels.copy()
        fragments[:, :5] += 10  # 4 fragments total
        segs = agglomerate(affs, fragments, thresholds=[0.1, 0.9])
        low, high = segs
        # low threshold: no merging beyond perfect-affinity boundaries?
        # within-block fragment boundaries have affinity 1 -> score 0 -> merge
        # even at low threshold; across blocks affinity 0 -> score 1 -> split
        assert len(np.unique(low)) == 2
        m = rand_voi(labels, low)
        assert m["voi_split"] < 1e-6 and m["voi_merge"] < 1e-6
        # high threshold 0.9 still < 1.0 so blocks stay separate
        assert len(np.unique(high)) == 2

    def test_full_merge_at_one(self):
        labels = gt_two_blocks(8)
        affs = perfect_affs(labels)
        segs = agglomerate(affs, labels, thresholds=[1.01])
        assert len(np.unique(segs[0])) == 1


class TestRandVoi:
    def test_perfect(self):
        gt = gt_two_blocks(8)
        m = rand_voi(gt, gt)
        assert m["voi_split"] == pytest.approx(0.0, abs=1e-9)
        assert m["voi_merge"] == pytest.approx(0.0, abs=1e-9)
        assert m["rand_split"] == pytest.approx(1.0)
        assert m["rand_merge"] == pytest.approx(1.0)
        assert m["nid"] == pytest.approx(0.0, abs=1e-9)

    def test_split_error(self):
        gt = np.ones((8, 8, 8), np.uint64)
        seg = gt_two_blocks(8)  # splits gt in half
        m = rand_voi(gt, seg)
        # H(seg|gt) = 1 bit; H(gt|seg) = 0
        assert m["voi_split"] == pytest.approx(1.0, abs=1e-9)
        assert m["voi_merge"] == pytest.approx(0.0, abs=1e-9)
        assert m["rand_split"] == pytest.approx(0.5)

    def test_merge_error_symmetric(self):
        gt = gt_two_blocks(8)
        seg = np.ones((8, 8, 8), np.uint64)
        m = rand_voi(gt, seg)
        assert m["voi_merge"] == pytest.approx(1.0, abs=1e-9)
        assert m["voi_split"] == pytest.approx(0.0, abs=1e-9)


class TestEndToEnd:
    def test_affs_to_segmentation(self):
        """synthetic gt -> perfect affinities -> watershed+agglomeration
        recovers the segmentation (low VOI)."""
        import scipy.ndimage as ndi

        from raygun_tpu.io.synthetic import synthetic_labels

        labels = synthetic_labels((24, 24, 24), num_cells=6, seed=4).astype(np.uint64)
        # realistic boundaries: nets are trained on grown (0-valued) label
        # boundaries, so affinities form a thick low-mean shell there
        eroded = labels.copy()
        boundary = np.zeros(labels.shape, bool)
        for ax in range(3):
            boundary |= labels != np.roll(labels, 1, axis=ax)
        boundary |= ndi.binary_dilation(boundary)
        eroded[boundary] = 0
        affs = perfect_affs(eroded)
        segs = get_segmentation(affs, [0.5])
        # evaluate on segmented voxels only (the masked boundary shell is
        # seg==0 and would read as one giant merged "segment")
        fg = segs[0] > 0
        m = rand_voi(labels[fg], segs[0][fg])
        assert m["voi_merge"] < 0.1, m  # no false merges
        assert m["voi_split"] < 0.5, m  # minimal oversegmentation
        assert fg.mean() > 0.5  # most of the volume got segmented
