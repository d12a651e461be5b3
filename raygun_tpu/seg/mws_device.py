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


@partial(jax.jit, static_argnames=(
    "offsets", "sep", "strides", "use_mask", "stride_phase"))
def extract_sorted_edges(
    affs: Array,
    offsets: Tuple[Tuple[int, int, int], ...],
    sep: int,
    strides: Tuple[int, int, int] = (1, 1, 1),
    mask_thresh: float = 0.5,
    use_mask: bool = True,
    stride_phase: Tuple[int, int, int] = (0, 0, 0),
    ext_mask: Optional[Array] = None,
):
    """Device stage: edges (u, v, w, attractive, valid) sorted by weight
    descending. ``affs`` (C, Z, Y, X) in the INVERTED convention (attractive
    channels keep affinity sign, repulsive channels high = separate).
    ``stride_phase``: global offset of this block so repulsive-stride
    subsampling stays globally aligned across blockwise chunks;
    ``ext_mask``: explicit voxel mask (ANDed in when given)."""
    C, Z, Y, X = affs.shape
    N = Z * Y * X
    if use_mask:
        pre = jnp.concatenate([affs[:sep], 1.0 - affs[sep:]], axis=0)
        mask = jnp.mean(pre, axis=0) > mask_thresh
    else:
        mask = jnp.ones((Z, Y, X), bool)
    if ext_mask is not None:
        mask = mask & ext_mask

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
            inb = inb & (
                ((zz + stride_phase[0]) % strides[0] == 0)
                & ((yy + stride_phase[1]) % strides[1] == 0)
                & ((xx + stride_phase[2]) % strides[2] == 0)
            )
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


def _resolve_fixpoint(parent, xs):
    """Resolve xs to their roots by repeated parent gathers until stable."""

    def cond(c):
        ys, changed = c
        return changed

    def body(c):
        ys, _ = c
        zs = parent[ys]
        return zs, jnp.any(zs != ys)

    ys, _ = jax.lax.while_loop(cond, body, (xs, jnp.bool_(True)))
    return ys


def _device_union_find_batched(
    u, v, at, valid, n_nodes: int, mutex_slots: int,
    chunk: int = 4096, walk_cap: int = 256,
):
    """Batched-XLA mutex-watershed union-find (VERDICT r2 #3).

    Replaces the O(E·M) per-edge fori_loop with chunked processing in
    sorted order: each chunk runs vectorized ROUNDS that apply every
    "first-touch" edge in parallel — an edge applies when neither of its
    current roots is touched by an earlier still-pending edge of the
    chunk, so parallel application is order-equivalent to the sequential
    sweep (the earliest pending edge always qualifies ⇒ every round makes
    progress ⇒ ≤ chunk rounds). Mutex constraints live in per-root linked
    lists (O(1) splice on merge via head/tail, capped parallel walks for
    queries); entries store partner roots lazily (re-resolved at query).

    Returns (roots, ok): ``ok=False`` means a capacity cap was hit (mutex
    slots or walk length) and the caller must fall back to the host path —
    a capacity report, never a wrong answer.
    """
    E = u.shape[0]
    n_chunks = -(-E // chunk)
    pad = n_chunks * chunk - E
    if pad:
        u = jnp.pad(u, (0, pad))
        v = jnp.pad(v, (0, pad))
        at = jnp.pad(at, (0, pad))
        valid = jnp.pad(valid, (0, pad))

    # conditional parallel scatters write to DUMMY slots when inactive
    # (never a real index — duplicate-index scatters are order-unspecified,
    # so a "no-op" write to a real slot could clobber a genuine write):
    # node arrays get slot n_nodes, the mutex pool gets slot M.
    M = int(mutex_slots)
    NODE = n_nodes
    SLOT = M
    parent0 = jnp.arange(n_nodes + 1, dtype=jnp.int32)
    head0 = jnp.full((n_nodes + 1,), -1, jnp.int32)
    tail0 = jnp.full((n_nodes + 1,), -1, jnp.int32)
    partner0 = jnp.zeros((M + 1,), jnp.int32)
    nxt0 = jnp.full((M + 1,), -1, jnp.int32)

    def walk_collect(head, nxt, partner, start):
        """Gather up to walk_cap partner entries of each list (vectorized
        over the chunk); returns (K, walk_cap) partners (-1 = none) and an
        overflow flag."""

        def body(w, c):
            cur, out = c
            ok = cur >= 0
            safe = jnp.maximum(cur, 0)
            out = out.at[:, w].set(jnp.where(ok, partner[safe], -1))
            cur = jnp.where(ok, nxt[safe], -1)
            return cur, out

        cur = start
        out = jnp.full((start.shape[0], walk_cap), -1, jnp.int32)
        cur, out = jax.lax.fori_loop(0, walk_cap, body, (cur, out))
        return out, jnp.any(cur >= 0)

    def round_body(state):
        parent, head, tail, partner, nxt, mfree, done, uc, vc, atc, ovf = state
        K = uc.shape[0]
        idx = jnp.arange(K, dtype=jnp.int32)
        ru = _resolve_fixpoint(parent, uc)
        rv = _resolve_fixpoint(parent, vc)
        done = done | (ru == rv)  # merged or self-mutex: no-op either way
        active = ~done

        # first-touch independence: an active edge applies this round iff
        # it is the earliest active edge touching each of its roots
        sentinel = n_nodes + idx  # inactive edges occupy unique fake roots
        k_ru = jnp.where(active, ru, sentinel)
        k_rv = jnp.where(active, rv, sentinel + K)
        roots2 = jnp.concatenate([k_ru, k_rv])
        idx2 = jnp.concatenate([idx, idx])
        # lexicographic (root, idx) sort via a two-key lax.sort: the old
        # int32 composite key roots2*(2K)+idx2 overflows once
        # n_nodes*2K > 2^31 (any production-sized chunk), silently
        # scrambling the root grouping below
        sr, si, order = jax.lax.sort(
            (roots2, idx2, jnp.arange(2 * K, dtype=jnp.int32)), num_keys=2)
        first = jnp.concatenate([jnp.ones((1,), bool), sr[1:] != sr[:-1]])
        start_pos = jax.lax.associative_scan(
            jnp.maximum, jnp.where(first, jnp.arange(2 * K), -1))
        run_min = si[start_pos]
        # scatter run minima back to (edge, side) positions
        minidx = jnp.zeros((2 * K,), jnp.int32).at[order].set(run_min)
        indep = active & (minidx[:K] == idx) & (minidx[K:] == idx)

        # mutex query for independent ATTRACTIVE edges (walk one side —
        # constraints are inserted on both sides and spliced on merge)
        attr_q = indep & atc
        partners_u, ovf_u = walk_collect(
            head, nxt, partner, jnp.where(attr_q, head[ru], -1))
        rp = jnp.where(partners_u >= 0,
                       _resolve_fixpoint(parent, jnp.maximum(partners_u, 0)),
                       -1)
        has_mux = jnp.any(rp == rv[:, None], axis=1) & attr_q
        ovf = ovf | ovf_u

        # ---- apply attractive merges. Applied edges have pairwise-disjoint
        # root sets (first-touch), so every real-slot scatter below hits a
        # distinct index; inactive lanes write the DUMMY slot.
        merge = indep & atc & ~has_mux
        parent = parent.at[jnp.where(merge, rv, NODE)].set(ru)
        # splice rv's mutex list onto ru's
        rv_has = merge & (head[rv] >= 0)
        ru_empty = head[ru] < 0
        # case 1: ru list empty -> adopt rv's head/tail
        adopt = rv_has & ru_empty
        head = head.at[jnp.where(adopt, ru, NODE)].set(head[rv])
        tail = tail.at[jnp.where(adopt, ru, NODE)].set(tail[rv])
        # case 2: both non-empty -> nxt[tail[ru]] = head[rv]; tail[ru] = tail[rv]
        link = rv_has & ~ru_empty
        nxt = nxt.at[jnp.where(link, tail[ru], SLOT)].set(head[rv])
        tail = tail.at[jnp.where(link, ru, NODE)].set(tail[rv])

        # ---- apply repulsive constraints (two slots per edge, prepend)
        rep = indep & ~atc
        n_rep = jnp.sum(rep.astype(jnp.int32))
        rank = jnp.cumsum(rep.astype(jnp.int32)) - 1
        base = mfree + 2 * rank
        ovf = ovf | (mfree + 2 * n_rep > M)
        slot0 = jnp.where(rep, jnp.minimum(base, M - 1), SLOT)
        slot1 = jnp.where(rep, jnp.minimum(base + 1, M - 1), SLOT)
        # side u: store partner rv, prepend to ru's list
        partner = partner.at[slot0].set(rv)
        nxt = nxt.at[slot0].set(head[ru])
        tail = tail.at[jnp.where(rep & (tail[ru] < 0), ru, NODE)].set(slot0)
        head = head.at[jnp.where(rep, ru, NODE)].set(slot0)
        # side v
        partner = partner.at[slot1].set(ru)
        nxt = nxt.at[slot1].set(head[rv])
        tail = tail.at[jnp.where(rep & (tail[rv] < 0), rv, NODE)].set(slot1)
        head = head.at[jnp.where(rep, rv, NODE)].set(slot1)
        mfree = mfree + 2 * n_rep

        done = done | indep
        return parent, head, tail, partner, nxt, mfree, done, uc, vc, atc, ovf

    def chunk_body(c, carry):
        parent, head, tail, partner, nxt, mfree, ovf = carry
        o = c * chunk
        uc = jax.lax.dynamic_slice(u, (o,), (chunk,))
        vc = jax.lax.dynamic_slice(v, (o,), (chunk,))
        atc = jax.lax.dynamic_slice(at, (o,), (chunk,))
        okc = jax.lax.dynamic_slice(valid, (o,), (chunk,))
        done = ~okc

        state = (parent, head, tail, partner, nxt, mfree, done,
                 uc, vc, atc, ovf)
        state = jax.lax.while_loop(
            lambda s: jnp.any(~s[6]) & ~s[10], round_body, state)
        parent, head, tail, partner, nxt, mfree = state[:6]
        ovf = state[10]
        parent = parent[parent]  # per-chunk path halving keeps trees shallow
        return parent, head, tail, partner, nxt, mfree, ovf

    carry = (parent0, head0, tail0, partner0, nxt0, jnp.int32(0),
             jnp.bool_(False))
    carry = jax.lax.fori_loop(0, n_chunks, chunk_body, carry)
    parent, ovf = carry[0], carry[6]
    roots = _resolve_fixpoint(parent, jnp.arange(n_nodes, dtype=jnp.int32))
    return roots, ~ovf


def mutex_watershed_device(
    affs: np.ndarray,
    offsets: Sequence[Sequence[int]],
    sep: int,
    strides: Sequence[int] = (1, 1, 1),
    mask_thresh: Optional[float] = None,
    union_find: str = "host",
    stride_phase: Sequence[int] = (0, 0, 0),
    mask: Optional[np.ndarray] = None,
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
        stride_phase=tuple(int(p) for p in stride_phase),
        ext_mask=None if mask is None else jnp.asarray(mask, bool),
    )

    roots = None
    if union_find == "device":
        # batched rounds (production device path); capacity overflow falls
        # back to the host C++ solver rather than returning a wrong answer
        n_mutex = 2 * int(np.sum(np.asarray(valid) & ~np.asarray(at))) + 2
        roots_dev, ok = _device_union_find_batched(
            jnp.asarray(u, jnp.int32), jnp.asarray(v, jnp.int32),
            at, valid, N, n_mutex,
        )
        if bool(ok):
            roots = np.asarray(roots_dev).astype(np.int64)
    elif union_find == "device_seq":
        # the exact sequential fori_loop (validation-grade reference)
        n_mutex = int(np.sum(np.asarray(valid) & ~np.asarray(at))) + 1
        roots = np.asarray(
            _device_union_find(
                jnp.asarray(u, jnp.int32), jnp.asarray(v, jnp.int32),
                w, at, valid, N, n_mutex,
            )
        ).astype(np.int64)
    if roots is None:
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
