"""On-device MWS pipeline == the host C++ kernel (BASELINE north star:
device sort + union-find; parity on small cubes)."""

import numpy as np
import pytest

from raygun_tpu.native import mutex_watershed
from raygun_tpu.seg.mws_device import mutex_watershed_device

import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_blockwise_mws import OFFSETS, SEP, canon, synthetic_affs


def test_device_sort_host_uf_matches_native():
    _, affs = synthetic_affs(20)
    ref = mutex_watershed(affs, OFFSETS, SEP)
    got = mutex_watershed_device(affs, OFFSETS, SEP, union_find="host")
    np.testing.assert_array_equal(canon(got), canon(ref))


def test_device_sort_host_uf_with_strides_and_mask():
    _, affs = synthetic_affs(20, seed=3)
    ref = mutex_watershed(
        affs, OFFSETS, SEP, strides=(2, 2, 2),
        mask=np.ones(affs.shape[1:], bool),
    )
    got = mutex_watershed_device(
        affs, OFFSETS, SEP, strides=(2, 2, 2), mask_thresh=0.0,
        union_find="host",
    )
    np.testing.assert_array_equal(canon(got), canon(ref))


def test_fully_on_device_union_find_matches_native():
    _, affs = synthetic_affs(9, seed=1)
    ref = mutex_watershed(affs, OFFSETS, SEP)
    got = mutex_watershed_device(affs, OFFSETS, SEP, union_find="device")
    np.testing.assert_array_equal(canon(got), canon(ref))


def test_on_device_config_surface(tmp_path):
    """mutex_segment with on_device: true routes through the device
    pipeline and produces the same segmentation."""
    from raygun_tpu.core.roi import Roi
    from raygun_tpu.io.volume import prepare_ds
    from raygun_tpu.seg.segment import mutex_segment

    labels, affs = synthetic_affs(18)
    pre = affs.copy()
    pre[SEP:] = 1.0 - pre[SEP:]
    path = str(tmp_path / "vol.zarr")
    roi = Roi((0, 0, 0), (18, 18, 18))
    ds = prepare_ds(path, "pred_affs", roi, (1, 1, 1), np.float32,
                    num_channels=len(OFFSETS))
    ds.write(roi, pre)
    base = {
        "file": path, "aff_ds": "pred_affs", "sep": SEP,
        "neighborhood": OFFSETS, "n_diagonals": 0, "mask_thresh": 0.0,
        "strides": [1, 1, 1], "save": False, "blockwise": False,
    }
    ref = np.asarray(mutex_segment(dict(base)))
    dev = np.asarray(mutex_segment({**base, "on_device": True}))
    np.testing.assert_array_equal(canon(dev), canon(ref))
