"""ctypes bindings for the native segmentation/evaluation kernels.

Builds ``libraygun_native.so`` with g++ on first import if missing (no
pybind11 in this environment; plain C ABI + numpy ctypes).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np
from numpy.ctypeslib import ndpointer

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libraygun_native.so")
_SRC = os.path.join(_DIR, "raygun_native.cpp")


def _build():
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", _SO,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    if (not os.path.exists(_SO)) or (
        os.path.getmtime(_SO) < os.path.getmtime(_SRC)
    ):
        _build()
    lib = ctypes.CDLL(_SO)

    f64p = ndpointer(np.float64, flags="C_CONTIGUOUS")
    f32p = ndpointer(np.float32, flags="C_CONTIGUOUS")
    u64p = ndpointer(np.uint64, flags="C_CONTIGUOUS")
    u8p = ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64p = ndpointer(np.int64, flags="C_CONTIGUOUS")
    i64 = ctypes.c_int64
    f64 = ctypes.c_double

    lib.mutex_watershed.argtypes = [
        f32p, i64p, i64, i64, i64, i64, i64, i64p, ctypes.c_void_p,
        ctypes.c_void_p, u64p,
    ]
    lib.seeded_watershed.argtypes = [f32p, u64p, ctypes.c_void_p, i64, i64, i64, u64p]
    lib.agglomerate.argtypes = [f32p, u64p, i64, i64, i64, f32p, i64, f64, u64p]
    lib.rand_voi.argtypes = [u64p, u64p, i64, f64p]
    lib.connected_components.argtypes = [u8p, i64, i64, i64, i64, u64p]
    lib.mws_region_graph.argtypes = [f32p, i64p, i64p, u8p, i64, i64, i64, u64p]
    u32p = ndpointer(np.uint32, flags="C_CONTIGUOUS")
    lib.agglomerate_graph.argtypes = [
        i64p, i64p, u32p, i64, i64, f32p, i64, f64, u64p,
    ]
    for fn in (lib.mutex_watershed, lib.seeded_watershed, lib.agglomerate,
               lib.rand_voi, lib.connected_components, lib.mws_region_graph,
               lib.agglomerate_graph):
        fn.restype = None
    return lib


_lib: Optional[ctypes.CDLL] = None


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = _load()
    return _lib


def _mask_ptr(mask: Optional[np.ndarray]):
    if mask is None:
        return None
    m = np.ascontiguousarray(mask.astype(np.uint8))
    return m, m.ctypes.data_as(ctypes.c_void_p)


def mutex_watershed(
    affs: np.ndarray,
    offsets: Sequence[Sequence[int]],
    sep: int,
    strides: Sequence[int] = (1, 1, 1),
    mask: Optional[np.ndarray] = None,
    stride_phase: Optional[Sequence[int]] = None,
) -> np.ndarray:
    """affogato ``compute_mws_segmentation`` capability: first ``sep``
    channels attractive (high weight merges), rest repulsive (high weight
    separates). ``stride_phase`` is the global origin of this array modulo
    nothing in particular — it keeps repulsive-edge subsampling phase
    consistent across chunks of a larger volume (blockwise MWS)."""
    affs = np.ascontiguousarray(affs, np.float32)
    C, Z, Y, X = affs.shape
    offsets = np.ascontiguousarray(offsets, np.int64)
    if offsets.shape != (C, 3):
        raise ValueError(
            f"affinities have {C} channels but neighborhood has "
            f"{offsets.shape[0]} offsets — they must match"
        )
    strides_arr = np.ascontiguousarray(strides, np.int64)
    out = np.zeros((Z, Y, X), np.uint64)
    keep = _mask_ptr(mask)
    phase = None
    if stride_phase is not None:
        phase = np.ascontiguousarray(stride_phase, np.int64)
    lib().mutex_watershed(
        affs, offsets.reshape(-1), C, sep, Z, Y, X, strides_arr,
        phase.ctypes.data_as(ctypes.c_void_p) if phase is not None else None,
        keep[1] if keep else None, out.reshape(-1),
    )
    return out


def seeded_watershed(
    image: np.ndarray, seeds: np.ndarray, mask: Optional[np.ndarray] = None
) -> np.ndarray:
    """Priority-flood watershed ascending on ``image`` from ``seeds``
    (skimage.segmentation.watershed capability)."""
    image = np.ascontiguousarray(image, np.float32)
    Z, Y, X = image.shape
    seeds = np.ascontiguousarray(seeds, np.uint64)
    out = np.zeros_like(seeds)
    keep = _mask_ptr(mask)
    lib().seeded_watershed(
        image.reshape(-1), seeds.reshape(-1), keep[1] if keep else None,
        Z, Y, X, out.reshape(-1),
    )
    return out


def agglomerate(
    affs: np.ndarray,
    fragments: np.ndarray,
    thresholds: Sequence[float],
    quantile: float = 0.75,
) -> list:
    """waterz-style hierarchical agglomeration: merge region-graph edges in
    ascending (1 - quantile-affinity) order, snapshot at each threshold."""
    affs = np.ascontiguousarray(affs[:3], np.float32)
    _, Z, Y, X = affs.shape
    fragments = np.ascontiguousarray(fragments, np.uint64)
    th = np.ascontiguousarray(thresholds, np.float32)
    out = np.zeros((len(th), Z, Y, X), np.uint64)
    lib().agglomerate(
        affs.reshape(-1), fragments.reshape(-1), Z, Y, X, th, len(th),
        float(quantile), out.reshape(-1),
    )
    return [out[i] for i in range(len(th))]


def rand_voi(gt: np.ndarray, seg: np.ndarray, return_cluster_scores: bool = False) -> dict:
    """funlib.evaluate ``rand_voi`` capability: VOI / Rand / NVI / NID."""
    gt = np.ascontiguousarray(gt, np.uint64).reshape(-1)
    seg = np.ascontiguousarray(seg, np.uint64).reshape(-1)
    assert gt.shape == seg.shape
    res = np.zeros(7, np.float64)
    lib().rand_voi(gt, seg, len(gt), res)
    return {
        "voi_split": res[0],
        "voi_merge": res[1],
        "rand_split": res[2],
        "rand_merge": res[3],
        "nvi_split": res[4],
        "nvi_merge": res[5],
        "nid": res[6],
    }


def mws_region_graph(
    weights: np.ndarray,
    u: np.ndarray,
    v: np.ndarray,
    attractive: np.ndarray,
    n_nodes: int,
    presorted: bool = False,
) -> np.ndarray:
    """Mutex watershed on an explicit edge list (the blockwise-MWS stitch
    phase and the host union-find stage of the on-device MWS pipeline):
    Kruskal-with-mutexes over edges sorted by weight descending.
    ``presorted=True`` trusts the caller's order (e.g. an XLA device sort).
    Returns the union-find root per node (not compacted)."""
    weights = np.ascontiguousarray(weights, np.float32)
    u = np.ascontiguousarray(u, np.int64)
    v = np.ascontiguousarray(v, np.int64)
    attractive = np.ascontiguousarray(attractive, np.uint8)
    assert weights.shape == u.shape == v.shape == attractive.shape
    out = np.zeros(int(n_nodes), np.uint64)
    lib().mws_region_graph(
        weights, u, v, attractive, len(weights), int(n_nodes),
        1 if presorted else 0, out
    )
    return out


def connected_components(mask: np.ndarray, connectivity: int = 3) -> np.ndarray:
    """Label connected regions of a boolean mask (scipy.ndimage.label
    capability; connectivity 1 = faces only, 3 = full 26-neighborhood)."""
    mask = np.ascontiguousarray(mask.astype(np.uint8))
    Z, Y, X = mask.shape
    out = np.zeros((Z, Y, X), np.uint64)
    lib().connected_components(mask.reshape(-1), Z, Y, X, connectivity, out.reshape(-1))
    return out


def agglomerate_graph(
    u: np.ndarray,
    v: np.ndarray,
    hists: np.ndarray,
    n_nodes: int,
    thresholds,
    quantile: float = 0.75,
) -> np.ndarray:
    """waterz-style agglomeration over an explicit region graph (blockwise
    watershed path): nodes are compact fragment ids, ``hists`` (n_edges,
    256) are per-edge boundary-affinity histograms. Returns (n_thresholds,
    n_nodes) uint64 root-per-node LUTs, one per threshold."""
    u = np.ascontiguousarray(u, np.int64)
    v = np.ascontiguousarray(v, np.int64)
    hists = np.ascontiguousarray(hists, np.uint32)
    assert hists.shape == (len(u), 256)
    th = np.ascontiguousarray(thresholds, np.float32)
    out = np.zeros((len(th), int(n_nodes)), np.uint64)
    lib().agglomerate_graph(
        u, v, hists.reshape(-1), len(u), int(n_nodes), th, len(th),
        float(quantile), out.reshape(-1),
    )
    return out
