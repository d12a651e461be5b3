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
    got = mutex_watershed_device(affs, OFFSETS, SEP, union_find="device_seq")
    np.testing.assert_array_equal(canon(got), canon(ref))


@pytest.mark.parametrize("seed,n", [(1, 9), (2, 12), (5, 14)])
def test_batched_device_union_find_matches_native(seed, n):
    """The production batched-rounds device union-find (VERDICT r2 #3) is
    EXACT: parallel application of first-touch edges is order-equivalent
    to the sequential sorted sweep."""
    _, affs = synthetic_affs(n, seed=seed)
    ref = mutex_watershed(affs, OFFSETS, SEP)
    got = mutex_watershed_device(affs, OFFSETS, SEP, union_find="device")
    np.testing.assert_array_equal(canon(got), canon(ref))


def test_batched_device_union_find_small_chunks():
    """Tiny chunks force many chunk boundaries + carry of state."""
    from raygun_tpu.seg import mws_device as m

    _, affs = synthetic_affs(10, seed=7)
    # strided repulsive sampling as in production (dense strides make the
    # mutex lists pathological — the device path then reports overflow and
    # falls back, which test_..._overflow_reports covers)
    ref = mutex_watershed(affs, OFFSETS, SEP, strides=(2, 2, 2),
                          mask=np.ones(affs.shape[1:], bool))
    import jax.numpy as jnp

    offs = tuple(tuple(int(x) for x in o) for o in OFFSETS)
    u, v, w, at, valid, mask = m.extract_sorted_edges(
        jnp.asarray(affs, jnp.float32), offs, SEP, (2, 2, 2), use_mask=False)
    N = int(np.prod(affs.shape[1:]))
    n_mutex = 2 * int(np.sum(np.asarray(valid) & ~np.asarray(at))) + 2
    roots, ok = m._device_union_find_batched(
        jnp.asarray(u, jnp.int32), jnp.asarray(v, jnp.int32), at, valid,
        N, n_mutex, chunk=64)
    assert bool(ok)
    out = np.asarray(roots)
    _, inv = np.unique(out, return_inverse=True)
    got = (inv + 1).astype(np.uint64).reshape(affs.shape[1:])
    np.testing.assert_array_equal(canon(got), canon(ref))


def test_batched_device_union_find_high_node_ids():
    """Regression: the round's (root, idx) grouping must be exact when
    n_nodes * 2*chunk exceeds int32 range (production-sized chunks). The
    pre-fix composite sort key roots2*(2K)+idx2 overflowed int32 there,
    silently scrambling the first-touch independence set; the two-key
    lax.sort is overflow-free. Checked against the exact sequential
    union-find on the same presorted edges at node ids near 40M."""
    from raygun_tpu.seg import mws_device as m
    import jax.numpy as jnp

    n_nodes = 40_000_000  # 40M * 2*4096 = 3.3e11 >> 2^31
    base = n_nodes - 200
    u_l, v_l, at_l = [], [], []
    for k in range(0, 20, 2):  # attractive pairs (base+k, base+k+1)
        u_l.append(base + k)
        v_l.append(base + k + 1)
        at_l.append(True)
    u_l.append(base + 0)  # mutex between the first two groups...
    v_l.append(base + 2)
    at_l.append(False)
    u_l.append(base + 1)  # ...which must block this later merge
    v_l.append(base + 3)
    at_l.append(True)
    u = jnp.asarray(u_l, jnp.int32)
    v = jnp.asarray(v_l, jnp.int32)
    at = jnp.asarray(at_l)
    valid = jnp.ones((len(u_l),), bool)
    w = jnp.arange(len(u_l), 0, -1).astype(jnp.float32)

    roots_b, ok = m._device_union_find_batched(
        u, v, at, valid, n_nodes, mutex_slots=64)
    assert bool(ok)
    roots_s = m._device_union_find(u, v, w, at, valid, n_nodes, 64)
    got = np.asarray(roots_b)[base:base + 20]
    ref = np.asarray(roots_s)[base:base + 20]
    _, gi = np.unique(got, return_inverse=True)
    _, ri = np.unique(ref, return_inverse=True)
    np.testing.assert_array_equal(gi, ri)
    # and the mutex held: groups {0,1} and {2,3} stayed separate
    assert got[0] == got[1] and got[2] == got[3] and got[0] != got[2]


def test_batched_device_union_find_overflow_reports():
    """Mutex-slot overflow must be REPORTED (ok=False), not mis-segmented."""
    from raygun_tpu.seg import mws_device as m
    import jax.numpy as jnp

    _, affs = synthetic_affs(9, seed=3)
    offs = tuple(tuple(int(x) for x in o) for o in OFFSETS)
    u, v, w, at, valid, mask = m.extract_sorted_edges(
        jnp.asarray(affs, jnp.float32), offs, SEP, (1, 1, 1), use_mask=False)
    N = int(np.prod(affs.shape[1:]))
    roots, ok = m._device_union_find_batched(
        jnp.asarray(u, jnp.int32), jnp.asarray(v, jnp.int32), at, valid,
        N, mutex_slots=4)  # absurdly small pool
    assert not bool(ok)


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
