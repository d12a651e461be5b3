"""Blockwise mutex watershed: larger-than-RAM affinity volumes.

The reference's mutex path loads the whole affinity volume into RAM
(``/root/reference/src/raygun/segment.py:186`` "TODO: MAKE DAISY
COMPATIBLE") — SURVEY §2.4 flags this as a defect not to reproduce. This
module segments in three streaming passes over zarr chunks:

  1. **label** — per chunk: read the chunk's affinities (plus a mask halo),
     run the voxel mutex-watershed kernel on the chunk interior (repulsive
     stride phase kept globally consistent), offset labels globally, write
     to the output dataset, and record every affinity edge that crosses the
     chunk boundary (endpoint positions + weight + attractive flag).
  2. **stitch** — resolve cross-edge endpoint labels from the written label
     chunks, aggregate per segment pair (max weight per polarity — the
     strongest edge dominates, matching MWS's sorted-merge semantics), and
     run mutex watershed on the segment-level region graph
     (``native.mws_region_graph``).
  3. **relabel** — stream label chunks through the stitch map.

This is the standard scalable MWS decomposition (block-local MWS + region
-graph MWS): exact when one chunk covers the volume (tested), and a
high-agreement approximation otherwise (greedy global edge order is only
approximated across chunk boundaries; tested via VOI on synthetic data).
Peak memory is O(chunk + cross-edges), independent of volume size.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..native import mutex_watershed, mws_region_graph

logger = logging.getLogger(__name__)


def _chunk_grid(shape: Sequence[int], chunk: Sequence[int]):
    grids = [range(0, s, c) for s, c in zip(shape, chunk)]
    for z0 in grids[0]:
        for y0 in grids[1]:
            for x0 in grids[2]:
                lo = (z0, y0, x0)
                hi = tuple(min(l + c, s) for l, c, s in zip(lo, chunk, shape))
                yield lo, hi


def _boundary_edges(
    affs: np.ndarray,
    halo_mask: Optional[np.ndarray],
    lo: Tuple[int, int, int],
    hi: Tuple[int, int, int],
    m: Tuple[int, int, int],
    shape: Tuple[int, int, int],
    offsets: np.ndarray,
    sep: int,
    strides: Sequence[int],
):
    """Edges (u in interior, v outside interior but inside the volume).

    ``affs`` covers the interior only; ``halo_mask`` covers the interior
    plus an ``m`` halo (None = no masking). Returns per-edge arrays of
    GLOBAL flat u/v positions, weights and attractive flags.
    """
    dims = tuple(h - l for l, h in zip(lo, hi))
    us, vs, ws, ats = [], [], [], []
    zz, yy, xx = np.meshgrid(
        np.arange(dims[0]), np.arange(dims[1]), np.arange(dims[2]),
        indexing="ij",
    )
    for c, off in enumerate(offsets):
        attractive = c < sep
        # u must be in-interior with v = u+off inside the global volume but
        # OUTSIDE the interior
        vz, vy, vx = zz + off[0], yy + off[1], xx + off[2]
        inside_vol = np.ones(dims, bool)
        outside_int = np.zeros(dims, bool)
        for d, (vv, o) in enumerate(zip((vz, vy, vx), off)):
            gv = vv + lo[d]
            inside_vol &= (gv >= 0) & (gv < shape[d])
            outside_int |= (vv < 0) | (vv >= dims[d])
        sel = inside_vol & outside_int
        if not attractive:
            s = strides
            sel &= ((zz + lo[0]) % s[0] == 0) & ((yy + lo[1]) % s[1] == 0) & (
                (xx + lo[2]) % s[2] == 0)
        if halo_mask is not None:
            sel &= halo_mask[m[0]: m[0] + dims[0],
                             m[1]: m[1] + dims[1],
                             m[2]: m[2] + dims[2]].astype(bool)
            # v mask lookup in halo coords
            sel_idx = np.nonzero(sel)
            mv = halo_mask[
                vz[sel_idx] + m[0], vy[sel_idx] + m[1], vx[sel_idx] + m[2]
            ].astype(bool)
            sel_idx = tuple(ix[mv] for ix in sel_idx)
        else:
            sel_idx = np.nonzero(sel)
        if len(sel_idx[0]) == 0:
            continue
        gu = ((sel_idx[0] + lo[0]) * shape[1] + (sel_idx[1] + lo[1])) * shape[2] + (
            sel_idx[2] + lo[2])
        gvz = vz[sel_idx] + lo[0]
        gvy = vy[sel_idx] + lo[1]
        gvx = vx[sel_idx] + lo[2]
        gv = (gvz * shape[1] + gvy) * shape[2] + gvx
        us.append(gu.astype(np.int64))
        vs.append(gv.astype(np.int64))
        ws.append(affs[c][sel_idx].astype(np.float32))
        ats.append(np.full(len(gu), attractive, np.uint8))
    if not us:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64),
                np.zeros(0, np.float32), np.zeros(0, np.uint8))
    return (np.concatenate(us), np.concatenate(vs),
            np.concatenate(ws), np.concatenate(ats))


def mutex_watershed_blockwise(
    read_affs,
    shape: Sequence[int],
    offsets: Sequence[Sequence[int]],
    sep: int,
    write_labels,
    read_labels,
    chunk: Sequence[int] = (192, 192, 192),
    strides: Sequence[int] = (1, 1, 1),
    mask_thresh: Optional[float] = None,
    max_affinity_value: float = 1.0,
    solver: str = "host",
) -> int:
    """Streamed mutex watershed over a chunked volume.

    ``read_affs(lo, hi) -> (C, *dims) float32`` reads inverted affinities
    (attractive-first convention of :func:`raygun_tpu.native.mutex_watershed`);
    ``write_labels(lo, hi, arr)`` / ``read_labels(lo, hi)`` access the uint64
    output dataset. ``mask_thresh``: voxels with mean affinity (pre-inversion
    convention of reference ``segment.py:189``) below it are masked out —
    pass None to disable. Returns the number of final segments.
    """
    shape = tuple(int(s) for s in shape)
    chunk = tuple(int(c) for c in chunk)
    offsets = np.asarray(offsets, np.int64)
    m = tuple(int(np.abs(offsets[:, d]).max()) for d in range(3))

    label_offset = 0
    pending: List[tuple] = []  # (label_u, v_global, w, attractive) arrays
    chunks = list(_chunk_grid(shape, chunk))

    # ---- pass 1: label chunks, collect cross edges
    for lo, hi in chunks:
        dims = tuple(h - l for l, h in zip(lo, hi))

        halo_mask = None
        mask = None
        if mask_thresh is not None:
            # one storage read covers both the mask halo and (by slicing)
            # the interior affinities
            hlo = tuple(max(0, l - mm) for l, mm in zip(lo, m))
            hhi = tuple(min(s, h + mm) for s, h, mm in zip(shape, hi, m))
            haffs = np.asarray(read_affs(hlo, hhi), np.float32)
            affs = haffs[
                (slice(None),)
                + tuple(slice(l - hl, (l - hl) + d)
                        for l, hl, d in zip(lo, hlo, dims))
            ]
            # the mask criterion is on the PRE-inversion affinities: the
            # caller hands us inverted ones, so invert back for the mean
            # (attractive channels were re-flipped; see seg/segment.py)
            pre = haffs.copy()
            pre[sep:] = 1.0 - pre[sep:]
            hm = np.mean(pre, axis=0) > mask_thresh * max_affinity_value
            # normalize to the full-halo shape (interior at [m, m+dims)),
            # zero-padding sides clipped by the volume boundary
            halo_mask = np.zeros(
                tuple(d + 2 * mm for d, mm in zip(dims, m)), bool
            )
            z0 = tuple(mm - (l - hl) for mm, l, hl in zip(m, lo, hlo))
            halo_mask[z0[0]: z0[0] + hm.shape[0],
                      z0[1]: z0[1] + hm.shape[1],
                      z0[2]: z0[2] + hm.shape[2]] = hm
            mask = halo_mask[m[0]: m[0] + dims[0], m[1]: m[1] + dims[1],
                             m[2]: m[2] + dims[2]]
        else:
            affs = np.asarray(read_affs(lo, hi), np.float32)

        if solver == "device":
            # per-chunk TPU pipeline: device edge extraction + sort +
            # batched union-find (VERDICT r2 #3); falls back to host C++
            # inside on capacity overflow
            from .mws_device import mutex_watershed_device

            labels = np.asarray(mutex_watershed_device(
                affs, offsets, sep, strides=strides, mask_thresh=None,
                union_find="device", stride_phase=lo,
                mask=mask if mask is not None else None,
            ))
        else:
            labels = mutex_watershed(
                affs, offsets, sep, strides=strides, mask=mask, stride_phase=lo
            )
        n_local = int(labels.max())
        labels[labels != 0] += label_offset

        gu, gv, w, at = _boundary_edges(
            affs, halo_mask, lo, hi, m, shape, offsets, sep, strides
        )
        if len(gu):
            # resolve u's label now (u is inside this chunk)
            uz = gu // (shape[1] * shape[2]) - lo[0]
            uy = (gu // shape[2]) % shape[1] - lo[1]
            ux = gu % shape[2] - lo[2]
            lu = labels[uz, uy, ux]
            keep = lu != 0
            pending.append((lu[keep], gv[keep], w[keep], at[keep]))

        write_labels(lo, hi, labels)
        label_offset += n_local

    if label_offset == 0:
        return 0

    # ---- pass 2: resolve v labels, build + solve the segment region graph
    if pending:
        all_lu = np.concatenate([p[0] for p in pending])
        all_gv = np.concatenate([p[1] for p in pending])
        all_w = np.concatenate([p[2] for p in pending])
        all_at = np.concatenate([p[3] for p in pending])
    else:
        all_lu = np.zeros(0, np.uint64)
        all_gv = np.zeros(0, np.int64)
        all_w = np.zeros(0, np.float32)
        all_at = np.zeros(0, np.uint8)

    all_lv = np.zeros(len(all_gv), np.uint64)
    vz_all = all_gv // (shape[1] * shape[2])
    vy_all = (all_gv // shape[2]) % shape[1]
    vx_all = all_gv % shape[2]
    for lo, hi in chunks:
        in_chunk = (
            (vz_all >= lo[0]) & (vz_all < hi[0])
            & (vy_all >= lo[1]) & (vy_all < hi[1])
            & (vx_all >= lo[2]) & (vx_all < hi[2])
        )
        if not in_chunk.any():
            continue
        lab = read_labels(lo, hi)
        idx = np.nonzero(in_chunk)[0]
        all_lv[idx] = lab[
            vz_all[idx] - lo[0], vy_all[idx] - lo[1], vx_all[idx] - lo[2]
        ]

    keep = (all_lv != 0) & (all_lu != 0)
    lu, lv, w, at = all_lu[keep], all_lv[keep], all_w[keep], all_at[keep]

    # aggregate (pair, polarity) -> max weight
    a = np.minimum(lu, lv)
    b = np.maximum(lu, lv)
    order = np.lexsort((-w, at, b, a))
    a_s, b_s, at_s = a[order], b[order], at[order]
    first = np.ones(len(order), bool)
    first[1:] = (
        (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1]) | (at_s[1:] != at_s[:-1])
    )
    sel = order[first]
    eu = a[sel].astype(np.int64) - 1  # node ids 0-based
    ev = b[sel].astype(np.int64) - 1
    ew = w[sel]
    eat = at[sel]

    roots = mws_region_graph(ew, eu, ev, eat, label_offset)
    # compact final labels
    uniq, inv = np.unique(roots, return_inverse=True)
    final = (inv + 1).astype(np.uint64)  # label l (1-based) -> final[l-1]
    n_final = len(uniq)

    # ---- pass 3: relabel chunks
    lut = np.concatenate([[np.uint64(0)], final])
    for lo, hi in chunks:
        lab = read_labels(lo, hi)
        write_labels(lo, hi, lut[lab])
    return n_final
