"""On-device mutex watershed: XLA edge extraction + sort (+ union-find).

The BASELINE north star names "affinity-to-segmentation via mutex watershed
runs as an on-device sort + union-find kernel". MWS is Kruskal with mutex
constraints over ~20 edges/voxel: the bandwidth-heavy, parallel parts —
masking, affinity inversion, edge enumeration with stride subsampling, and
the O(E log E) sort — run on the TPU as one jitted program; the inherently
sequential union-find then runs either

  * ``union_find="host"`` (production): the sorted edge arrays stream to
    the in-repo C++ kernel (``native.mws_region_graph(presorted=True)``) —
    the host does O(E α(N)) pointer chasing and no sorting; or
  * ``union_find="device"``: an exact lax.fori_loop Kruskal with an
    on-device parent array (path-halving finds) and an explicit mutex pair
    store. Every step re-resolves stored mutex endpoints by pointer
    jumping, so it is O(E·M·log) — exact and fully on-device, intended for
    small blocks / validation, not throughput (the sequential dependence is
    intrinsic to MWS; the scalable route is the blockwise decomposition in
    ``seg.blockwise_mws`` whose per-chunk work can use this pipeline).

Semantics match ``native.mutex_watershed`` (affogato's
``compute_mws_segmentation``): first ``sep`` channels attractive, the rest
repulsive with ``strides`` subsampling; parity-tested on small cubes.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..native import mws_region_graph

Array = jax.Array


@partial(jax.jit, static_argnames=("offsets", "sep", "strides", "use_mask"))
def extract_sorted_edges(
    affs: Array,
    offsets: Tuple[Tuple[int, int, int], ...],
    sep: int,
    strides: Tuple[int, int, int] = (1, 1, 1),
    mask_thresh: float = 0.5,
    use_mask: bool = True,
):
    """Device stage: edges (u, v, w, attractive, valid) sorted by weight
    descending. ``affs`` (C, Z, Y, X) in the INVERTED convention (attractive
    channels keep affinity sign, repulsive channels high = separate)."""
    C, Z, Y, X = affs.shape
    N = Z * Y * X
    if use_mask:
        pre = jnp.concatenate([affs[:sep], 1.0 - affs[sep:]], axis=0)
        mask = jnp.mean(pre, axis=0) > mask_thresh
    else:
        mask = jnp.ones((Z, Y, X), bool)

    zz, yy, xx = jnp.meshgrid(
        jnp.arange(Z), jnp.arange(Y), jnp.arange(X), indexing="ij"
    )
    flat_u = (zz * Y + yy) * X + xx

    us, vs, ws, ats, valids = [], [], [], [], []
    for c, off in enumerate(offsets):
        attractive = c < sep
        vz, vy, vx = zz + off[0], yy + off[1], xx + off[2]
        inb = (
            (vz >= 0) & (vz < Z) & (vy >= 0) & (vy < Y) & (vx >= 0) & (vx < X)
        )
        if not attractive:
            inb = inb & (zz % strides[0] == 0) & (yy % strides[1] == 0) & (
                xx % strides[2] == 0)
        vzc = jnp.clip(vz, 0, Z - 1)
        vyc = jnp.clip(vy, 0, Y - 1)
        vxc = jnp.clip(vx, 0, X - 1)
        flat_v = (vzc * Y + vyc) * X + vxc
        valid = inb & mask & mask[vzc, vyc, vxc]
        us.append(flat_u.reshape(-1))
        vs.append(flat_v.reshape(-1))
        ws.append(affs[c].reshape(-1))
        ats.append(jnp.full((N,), attractive, bool))
        valids.append(valid.reshape(-1))

    u = jnp.concatenate(us)
    v = jnp.concatenate(vs)
    w = jnp.concatenate(ws)
    at = jnp.concatenate(ats)
    valid = jnp.concatenate(valids)

    # invalid edges sink to the end of the descending sort
    key = jnp.where(valid, w, -jnp.inf)
    order = jnp.argsort(-key)  # XLA device sort over all C*N edges
    return (
        u[order], v[order], w[order], at[order], valid[order],
        mask.reshape(-1),
    )


def _device_union_find(u, v, w, at, valid, n_nodes, n_mutex_cap):
    """Exact sequential Kruskal-with-mutexes as one jitted fori_loop."""

    RESOLVE_ITERS = 64  # pointer-jumping bound for stored-pair re-resolution

    def find(parent, x):
        def cond(c):
            p, y = c
            return p[y] != y

        def body(c):
            p, y = c
            p = p.at[y].set(p[p[y]])  # path halving
            return p, p[y]

        p, r = jax.lax.while_loop(cond, body, (parent, x))
        return p, r

    def resolve_many(parent, xs):
        def body(_, ys):
            return parent[ys]

        return jax.lax.fori_loop(0, RESOLVE_ITERS, body, xs)

    def step(i, state):
        parent, ma, mb, mcount = state
        ok = valid[i]
        parent, ru = find(parent, u[i])
        parent, rv = find(parent, v[i])
        distinct = ok & (ru != rv)

        ra = resolve_many(parent, ma)
        rb = resolve_many(parent, mb)
        live = jnp.arange(ma.shape[0]) < mcount
        has_mutex = jnp.any(
            live & (((ra == ru) & (rb == rv)) | ((ra == rv) & (rb == ru)))
        )

        def do_attractive(args):
            parent, ma, mb, mcount = args
            merge = distinct & ~has_mutex
            new_parent = jax.lax.cond(
                merge, lambda p: p.at[rv].set(ru), lambda p: p, parent
            )
            return new_parent, ma, mb, mcount

        def do_repulsive(args):
            parent, ma, mb, mcount = args
            add = distinct
            idx = jnp.minimum(mcount, ma.shape[0] - 1)
            ma2 = jax.lax.cond(add, lambda a: a.at[idx].set(ru), lambda a: a, ma)
            mb2 = jax.lax.cond(add, lambda a: a.at[idx].set(rv), lambda a: a, mb)
            return parent, ma2, mb2, mcount + add.astype(jnp.int32)

        return jax.lax.cond(at[i], do_attractive, do_repulsive,
                            (parent, ma, mb, mcount))

    parent0 = jnp.arange(n_nodes, dtype=jnp.int32)
    ma0 = jnp.zeros(n_mutex_cap, jnp.int32)
    mb0 = jnp.zeros(n_mutex_cap, jnp.int32)
    parent, ma, mb, _ = jax.lax.fori_loop(
        0, u.shape[0], step, (parent0, ma0, mb0, jnp.int32(0))
    )
    # final root resolution by pointer jumping
    roots = jnp.arange(n_nodes, dtype=jnp.int32)

    def body(_, ys):
        return parent[ys]

    return jax.lax.fori_loop(0, 64, body, roots)


def mutex_watershed_device(
    affs: np.ndarray,
    offsets: Sequence[Sequence[int]],
    sep: int,
    strides: Sequence[int] = (1, 1, 1),
    mask_thresh: Optional[float] = None,
    union_find: str = "host",
) -> np.ndarray:
    """MWS with the parallel stages on device (see module docstring).

    ``affs``: (C, Z, Y, X) float32, inverted convention. Returns a (Z, Y, X)
    uint64 segmentation with labels starting at 1 (0 = masked out).
    """
    C, Z, Y, X = affs.shape
    N = Z * Y * X
    offs = tuple(tuple(int(x) for x in o) for o in offsets)
    u, v, w, at, valid, mask = extract_sorted_edges(
        jnp.asarray(affs, jnp.float32), offs, int(sep),
        tuple(int(s) for s in strides),
        mask_thresh=0.5 if mask_thresh is None else float(mask_thresh),
        use_mask=mask_thresh is not None,
    )

    if union_find == "device":
        n_mutex = int(np.sum(np.asarray(valid) & ~np.asarray(at))) + 1
        roots = np.asarray(
            _device_union_find(
                jnp.asarray(u, jnp.int32), jnp.asarray(v, jnp.int32),
                w, at, valid, N, n_mutex,
            )
        ).astype(np.int64)
    else:
        n_valid = int(np.asarray(valid).sum())
        roots = mws_region_graph(
            np.asarray(w)[:n_valid],
            np.asarray(u)[:n_valid],
            np.asarray(v)[:n_valid],
            np.asarray(at)[:n_valid].astype(np.uint8),
            N,
            presorted=True,
        ).astype(np.int64)

    mask_np = np.asarray(mask)
    out = np.zeros(N, np.uint64)
    uniq, inv = np.unique(roots, return_inverse=True)
    out = (inv + 1).astype(np.uint64)
    out[~mask_np] = 0
    return out.reshape(Z, Y, X)
