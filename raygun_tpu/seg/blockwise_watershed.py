"""Blockwise watershed fragments + waterz-style agglomeration.

The second half of the reference's whole-volume RAM defect (SURVEY §2.4;
``segment.py:115-136`` loads full affinity volumes for
watershed+agglomeration). Streamed in three passes, mirroring
:mod:`raygun_tpu.seg.blockwise_mws`:

  1. **fragments** — per chunk: seeded-watershed fragments on the chunk
     interior (ids globally offset; basins are cut at chunk faces — the
     agglomeration merges them back when boundary affinities are high),
     written to the fragments dataset; the intra-chunk region graph
     (per-fragment-pair 256-bin boundary-affinity histograms) accumulates
     in RAM; cross-face voxel edges are recorded with global positions.
  2. **stitch** — cross-face edge endpoints resolve to fragment ids from
     the written chunks; their histograms merge into the graph; the C++
     graph agglomerator (``native.agglomerate_graph``) produces one
     fragment→segment LUT per threshold.
  3. **relabel** — chunks stream through the LUTs into the per-threshold
     output datasets.

Peak memory is O(chunk + region graph); the graph is ~256 B per touching
fragment pair.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..native import agglomerate_graph
from .segment import FragmentPipeline

logger = logging.getLogger(__name__)

_NN_OFFSETS = ((1, 0, 0), (0, 1, 0), (0, 0, 1))


def _chunk_grid(shape, chunk):
    for z0 in range(0, shape[0], chunk[0]):
        for y0 in range(0, shape[1], chunk[1]):
            for x0 in range(0, shape[2], chunk[2]):
                lo = (z0, y0, x0)
                hi = tuple(min(l + c, s) for l, c, s in zip(lo, chunk, shape))
                yield lo, hi


class _RegionGraph:
    """Accumulates per-pair 256-bin affinity histograms."""

    def __init__(self):
        self.hists: Dict[Tuple[int, int], np.ndarray] = {}

    def add_many(self, fa: np.ndarray, fb: np.ndarray, affs: np.ndarray):
        if len(fa) == 0:
            return
        a = np.minimum(fa, fb).astype(np.int64)
        b = np.maximum(fa, fb).astype(np.int64)
        bins = np.clip((affs * 255.0).astype(np.int64), 0, 255)
        # lexicographic (a, b) grouping — NOT a packed (a<<32)|b key, which
        # silently collides pairs once fragment ids exceed 2^32 (reachable
        # at teravoxel scale with small fragments)
        order = np.lexsort((b, a))
        a_s, b_s, bins_s = a[order], b[order], bins[order]
        starts = np.flatnonzero(
            np.r_[True, (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])])
        ends = np.r_[starts[1:], len(a_s)]
        for s, e in zip(starts, ends):
            pair = (int(a_s[s]), int(b_s[s]))
            h = self.hists.get(pair)
            if h is None:
                h = np.zeros(256, np.uint32)
                self.hists[pair] = h
            np.add.at(h, bins_s[s:e], 1)


def watershed_agglomerate_blockwise(
    read_affs,
    shape: Sequence[int],
    thresholds: Sequence[float],
    write_fragments,
    read_fragments,
    write_seg,
    chunk: Sequence[int] = (192, 192, 192),
    max_affinity_value: float = 1.0,
    min_seed_distance: int = 10,
    quantile: float = 0.75,
) -> int:
    """Streamed fragments + threshold-sweep agglomeration.

    ``read_affs(lo, hi) -> (3+, *dims) float32`` (nearest-neighbor channels
    first); ``write_fragments/read_fragments(lo, hi[, arr])`` access the
    uint64 fragments dataset; ``write_seg(t_idx, lo, hi, arr)`` writes the
    per-threshold outputs. Returns the number of fragments.
    """
    shape = tuple(int(s) for s in shape)
    chunk = tuple(int(c) for c in chunk)
    chunks = list(_chunk_grid(shape, chunk))
    graph = _RegionGraph()
    pending: List[tuple] = []  # (frag_u, v_global_flat, aff)
    next_id = 0

    # fragment extraction context: the watershed needs to see whole basins
    # near chunk edges or slivers flood from the wrong seed (same reason
    # daisy fragment blocks read halos); 2x the seed window suffices
    halo = 2 * int(min_seed_distance)

    # ---- pass 1: fragments + intra-chunk graph + cross-face edges
    for lo, hi in chunks:
        dims = tuple(h - l for l, h in zip(lo, hi))
        hlo = tuple(max(0, l - halo) for l in lo)
        hhi = tuple(min(s, h + halo) for s, h in zip(shape, hi))
        haffs = np.asarray(read_affs(hlo, hhi), np.float32)
        pipe = FragmentPipeline(max_affinity_value, min_seed_distance)
        hfrags, _ = pipe.run(np.mean(haffs, axis=0))
        interior = tuple(
            slice(l - hl, (l - hl) + d) for l, hl, d in zip(lo, hlo, dims)
        )
        frags = hfrags[interior].astype(np.uint64)
        affs = haffs[(slice(None),) + interior]
        # compact ids present in the interior, then offset globally
        uniq = np.unique(frags)
        uniq = uniq[uniq != 0]
        remap = np.zeros(int(hfrags.max()) + 1, np.uint64)
        remap[uniq] = np.arange(1, len(uniq) + 1, dtype=np.uint64)
        frags = remap[frags]
        frags[frags != 0] += next_id
        next_id += len(uniq)
        write_fragments(lo, hi, frags)

        for c, off in enumerate(_NN_OFFSETS):
            src = tuple(slice(0, d - o) for d, o in zip(dims, off))
            dst = tuple(slice(o, None) for o in off)
            fu, fv = frags[src], frags[dst]
            touching = (fu != 0) & (fv != 0) & (fu != fv)
            graph.add_many(
                fu[touching], fv[touching], affs[c][src][touching]
            )
            # cross-face edges: u on the hi face, v in the next chunk
            if hi[c] < shape[c]:
                face = tuple(
                    slice(d - 1, d) if ax == c else slice(None)
                    for ax, d in enumerate(dims)
                )
                fu_face = frags[face].ravel()
                w_face = affs[c][face].ravel()
                keep = fu_face != 0
                if keep.any():
                    zz, yy, xx = np.meshgrid(
                        *[np.arange(s.start or 0, s.stop if s.stop else d)
                          for s, d in zip(face, dims)], indexing="ij")
                    gv = (
                        (zz.ravel() + lo[0] + off[0]) * shape[1]
                        + (yy.ravel() + lo[1] + off[1])
                    ) * shape[2] + (xx.ravel() + lo[2] + off[2])
                    pending.append(
                        (fu_face[keep], gv[keep], w_face[keep])
                    )

    if next_id == 0:
        return 0

    # ---- pass 2: resolve cross-face endpoints, agglomerate the graph
    if pending:
        all_fu = np.concatenate([p[0] for p in pending])
        all_gv = np.concatenate([p[1] for p in pending])
        all_w = np.concatenate([p[2] for p in pending])
        vz = all_gv // (shape[1] * shape[2])
        vy = (all_gv // shape[2]) % shape[1]
        vx = all_gv % shape[2]
        all_fv = np.zeros(len(all_gv), np.uint64)
        for lo, hi in chunks:
            sel = ((vz >= lo[0]) & (vz < hi[0]) & (vy >= lo[1]) & (vy < hi[1])
                   & (vx >= lo[2]) & (vx < hi[2]))
            if not sel.any():
                continue
            frag = read_fragments(lo, hi)
            idx = np.nonzero(sel)[0]
            all_fv[idx] = frag[vz[idx] - lo[0], vy[idx] - lo[1], vx[idx] - lo[2]]
        keep = (all_fv != 0) & (all_fu != all_fv)
        graph.add_many(all_fu[keep], all_fv[keep], all_w[keep])

    pairs = np.asarray(sorted(graph.hists), np.int64)
    if len(pairs):
        hists = np.stack([graph.hists[tuple(p)] for p in pairs])
        luts = agglomerate_graph(
            pairs[:, 0] - 1, pairs[:, 1] - 1, hists, next_id,
            list(thresholds), quantile=quantile,
        )
    else:
        luts = np.tile(np.arange(next_id, dtype=np.uint64), (len(thresholds), 1))

    # ---- pass 3: stream chunks through each threshold's LUT
    for t_idx in range(len(thresholds)):
        lut = np.concatenate([[np.uint64(0)], luts[t_idx] + 1])
        for lo, hi in chunks:
            frag = read_fragments(lo, hi)
            write_seg(t_idx, lo, hi, lut[frag])
    return next_id
