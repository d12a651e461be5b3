"""Pallas TPU kernels: the fused resblock's WHOLE backward in two calls.

The per-block backward (``resblock._rb_bwd``) runs as ~8 pallas calls per
block: IN2-bwd (2 passes), conv2 dinp + wgrad, relu∘IN1-bwd (2 passes),
conv1 dinp + wgrad. That split exists because the combined working set
exceeded the DEFAULT 16 MB scoped-VMEM limit (``resblock._conv_bwd``
docstring) — but Mosaic accepts a per-kernel ``vmem_limit_bytes`` far
above that (the chain-kernel experiment compiled ~90 MB working sets on
v5e, whose physical VMEM is 128 MB). With the whole image resident, the
backward needs TWO kernels:

  A ("conv2 segment"): IN2-bwd stats -> dy2 (scratch) -> conv2ᵀ -> dh1
    (scratch, never leaves VMEM) -> relu∘IN1-bwd stats -> dy1 (output),
    plus conv2 wgrad/bias-grad against h1 recomputed from the resident y1.
  B ("conv1 segment"): conv1ᵀ(dy1) + reflect-fold + skip-gradient (dout)
    -> dx, plus conv1 wgrad/bias-grad against the resident x.

vs the 8-call route this removes the dy2/dh1/dy1 HBM round-trips and the
duplicate reads of dout/y1/y2/x across passes (~2.3x less bwd traffic),
and the IN-bwd elementwise passes — pure-bandwidth kernels that cannot
hide behind compute — disappear into the conv kernels' slab loops.

Exactness: the same formulas and bf16 rounding points as the split route
(dy2, dh1, dy1 round to bf16 exactly where the split route materializes
them; all stats/accumulation fp32). Only fp32 summation ORDER differs
(row-slab association). Parity-tested (values+grads) against the split
route and the unfused module in tests/nn/test_resblock_pallas.py.

Reference: the torch block this backward serves is ``ResNet.py:127-223``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .resblock import _conv9, _interpret, _stack_taps

Array = jax.Array

_VMEM_CAP = 110 * 1024 * 1024


def _bwd_slab(H: int, W: int, C: int) -> int:
    # stats association matches instance_norm._TILE_S=2048 rows when
    # SH*W == 2048; correctness holds for any divisor of H
    for sh in (16, 8):
        if H % sh == 0:
            return sh
    return 0


def _abwd_vmem_bytes(B, H, W, C, SH, itemsize):
    img = H * W * C * itemsize
    w_blk = 3 * 3 * C * C * itemsize
    taps = (SH + 4) * (W + 2) * 3 * C * itemsize
    acc = (SH + 2) * (W + 2) * C * 4
    # A: 3 inputs + w (x2 buffers) + dy1 out (x2) + dw out + 2 scratch + taps
    return 2 * (3 * img + w_blk) + 2 * img + 3 * w_blk * 2 + 2 * img \
        + 2 * taps + 2 * acc


def rb_bwd_fused_ok(x: Array) -> bool:
    if os.environ.get("RAYGUN_DISABLE_PALLAS_RBBWD"):
        return False
    if x.ndim != 4 or x.dtype != jnp.bfloat16:
        return False
    B, H, W, C = x.shape
    if C % 128 or W < 8 or H < 16:
        return False
    SH = _bwd_slab(H, W, C)
    if not SH:
        return False
    if _abwd_vmem_bytes(B, H, W, C, SH, 2) > _VMEM_CAP:
        return False
    if H * W * C * B < (1 << 20):
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


# ---------------------------------------------------------------------------
# shared slab helpers (resident-ref variants of resblock's blockspec ones)
# ---------------------------------------------------------------------------

def _asm_reflect(get_rows, s, SH, H):
    """Reflect-by-1 padded rows [s*SH-1, s*SH+SH+1) x cols: (SH+2, W+2, C).
    Same convention as resblock._assemble_reflect."""
    start = s * SH
    main = get_rows(start, SH)
    ti = jnp.where(s == 0, 1, start - 1)
    bi = jnp.where(start + SH >= H, H - 2, start + SH)
    rows = jnp.concatenate([get_rows(ti, 1), main, get_rows(bi, 1)], axis=0)
    return jnp.concatenate([rows[:, 1:2], rows, rows[:, -2:-1]], axis=1)


def _asm_zero(get_rows, s, SH, H, W, C, dtype):
    """Zero-padded rows [s*SH-2, s*SH+SH+2) x cols +-2: (SH+4, W+4, C).
    Same convention as resblock._conv_bwd_dinp_kernel's assembly."""
    start = s * SH
    n_slabs = H // SH
    main = get_rows(start, SH)
    top = get_rows(jnp.maximum(start - 2, 0), 2)
    bot = get_rows(jnp.minimum(start + SH, H - 2), 2)
    zero = jnp.zeros((), dtype)
    top = jnp.where(s > 0, top, zero)
    bot = jnp.where(s < n_slabs - 1, bot, zero)
    rows = jnp.concatenate([top, main, bot], axis=0)
    zc = jnp.zeros((SH + 4, 2, C), dtype)
    return jnp.concatenate([zc, rows, zc], axis=1)


def _convT_slab(get_rows, s, w_ref, dz3, SH, H, W, C):
    """One slab of the transpose conv: dinp_pad rows [s*SH-1, s*SH+SH+1)
    as (SH+2, W+2, C) fp32 (pre reflect-fold)."""
    dyz = _asm_zero(get_rows, s, SH, H, W, C, dz3.dtype)
    d3 = _stack_taps(dyz, dz3, W + 2, C)
    acc = jnp.zeros(((SH + 2) * (W + 2), C), jnp.float32)
    for uy in range(3):
        a = d3[uy:uy + SH + 2].reshape((SH + 2) * (W + 2), -1)
        acc = acc + jax.lax.dot_general(
            a, w_ref[uy], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return acc.reshape(SH + 2, W + 2, C)


def _fold_reflect(accp, s, SH, W, n_slabs, extra=None):
    """Reflect-pad VJP fold (rows then cols) of one dinp_pad slab; returns
    the (SH, W, C) fp32 dinp slab. Matches resblock._conv_bwd_dinp_kernel."""
    rows = accp[1:SH + 1]
    ridx = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 0)
    rows = rows + jnp.where((ridx == 1) & (s == 0), accp[0][None], 0.0)
    rows = rows + jnp.where(
        (ridx == SH - 2) & (s == n_slabs - 1), accp[SH + 1][None], 0.0)
    cols = rows[:, 1:W + 1]
    cidx = jax.lax.broadcasted_iota(jnp.int32, cols.shape, 1)
    cols = cols + jnp.where(cidx == 1, rows[:, 0:1], 0.0)
    cols = cols + jnp.where(cidx == W - 2, rows[:, W + 1:W + 2], 0.0)
    if extra is not None:
        cols = cols + extra
    return cols


def _wgrad_slab(ap, dy_slab, ap3, dw_ref, first, SH, W, C):
    """dw += ap3(ap)ᵀ @ dy_slab for one slab (fp32 accumulation), matching
    resblock._conv_bwd_w_kernel's per-ty GEMMs."""
    a3 = _stack_taps(ap, ap3, W, C)
    dym = dy_slab.reshape(SH * W, C)
    for ty in range(3):
        a = a3[ty:ty + SH].reshape(SH * W, -1)
        dw = jax.lax.dot_general(
            a, dym, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(first)
        def _(ty=ty, dw=dw):
            dw_ref[ty] = dw

        @pl.when(jnp.logical_not(first))
        def _(ty=ty, dw=dw):
            dw_ref[ty] += dw


# ---------------------------------------------------------------------------
# kernel A: IN2-bwd -> conv2ᵀ/wgrad -> relu∘IN1-bwd, dy1 out
# ---------------------------------------------------------------------------

def _bwd_a_kernel(SH, H, W, C, dout_ref, y2_ref, y1_ref, wflip_ref,
                  m1_ref, r1_ref, m2_ref, r2_ref,
                  dy1_ref, dw2_ref, db2_ref,
                  dy2_scr, dh1_scr, dz3, ap3):
    b = pl.program_id(0)
    n_slabs = H // SH
    n = jnp.float32(H * W)
    m1 = m1_ref[0, 0, :][None, None, :]
    r1 = r1_ref[0, 0, :][None, None, :]
    m2 = m2_ref[0, 0, :][None, None, :]
    r2 = r2_ref[0, 0, :][None, None, :]

    def rows_of(ref):
        return lambda r0, k: ref[0, pl.ds(r0, k)]

    def rows_of_scr(scr):
        return lambda r0, k: scr[pl.ds(r0, k)]

    # ---- IN2-bwd stats over (dout, y2) ----
    def s2(s, carry):
        sg, sgy = carry
        sl = pl.ds(s * SH, SH)
        g = dout_ref[0, sl].astype(jnp.float32)
        yh = (y2_ref[0, sl].astype(jnp.float32) - m2) * r2
        return (sg + jnp.sum(g.reshape(SH * W, C), axis=0, keepdims=True),
                sgy + jnp.sum((g * yh).reshape(SH * W, C), axis=0,
                              keepdims=True))

    zero = jnp.zeros((1, C), jnp.float32)
    sg2, sgy2 = jax.lax.fori_loop(0, n_slabs, s2, (zero, zero))
    mg2, mgy2 = (sg2 / n)[None], (sgy2 / n)[None]  # (1, 1, C)

    # ---- dy2 = r2*(dout - mg2 - yhat2*mgy2), bf16 (split route's rounding)
    def p2(s, _):
        sl = pl.ds(s * SH, SH)
        g = dout_ref[0, sl].astype(jnp.float32)
        yh = (y2_ref[0, sl].astype(jnp.float32) - m2) * r2
        dy2_scr[sl] = (r2 * (g - mg2 - yh * mgy2)).astype(dy2_scr.dtype)
        return 0

    jax.lax.fori_loop(0, n_slabs, p2, 0)

    # ---- conv2ᵀ(dy2) -> dh1 (bf16 scratch; fold, no skip term) ----
    def p3(s, _):
        accp = _convT_slab(rows_of_scr(dy2_scr), s, wflip_ref, dz3,
                           SH, H, W, C)
        dh1_scr[pl.ds(s * SH, SH)] = _fold_reflect(
            accp, s, SH, W, n_slabs).astype(dh1_scr.dtype)
        return 0

    jax.lax.fori_loop(0, n_slabs, p3, 0)

    # ---- conv2 wgrad/bias-grad against h1 = relu(IN(y1)) ----
    def p4(s, carry):
        ap = _asm_reflect(rows_of(y1_ref), s, SH, H)
        h1 = jnp.maximum((ap.astype(jnp.float32) - m1) * r1, 0.0)
        dy_slab = dy2_scr[pl.ds(s * SH, SH)]
        first = (b == 0) & (s == 0)
        _wgrad_slab(h1.astype(dy_slab.dtype), dy_slab, ap3, dw2_ref,
                    first, SH, W, C)
        dsum = jnp.sum(dy_slab.astype(jnp.float32).reshape(SH * W, C),
                       axis=0, keepdims=True)

        @pl.when(first)
        def _():
            db2_ref[0, :] = dsum[0]

        @pl.when(jnp.logical_not(first))
        def _():
            db2_ref[0, :] += dsum[0]

        return carry

    jax.lax.fori_loop(0, n_slabs, p4, 0)

    # ---- relu∘IN1-bwd stats over (dh1, y1) ----
    def s1(s, carry):
        sg, sgy = carry
        sl = pl.ds(s * SH, SH)
        yh = (y1_ref[0, sl].astype(jnp.float32) - m1) * r1
        g = dh1_scr[sl].astype(jnp.float32)
        g = jnp.where(yh > 0, g, 0.0)
        return (sg + jnp.sum(g.reshape(SH * W, C), axis=0, keepdims=True),
                sgy + jnp.sum((g * yh).reshape(SH * W, C), axis=0,
                              keepdims=True))

    sg1, sgy1 = jax.lax.fori_loop(0, n_slabs, s1, (zero, zero))
    mg1, mgy1 = (sg1 / n)[None], (sgy1 / n)[None]

    # ---- dy1 = r1*(g' - mg1 - yhat1*mgy1), bf16 output ----
    def p5(s, _):
        sl = pl.ds(s * SH, SH)
        yh = (y1_ref[0, sl].astype(jnp.float32) - m1) * r1
        g = dh1_scr[sl].astype(jnp.float32)
        g = jnp.where(yh > 0, g, 0.0)
        dy1_ref[0, sl] = (r1 * (g - mg1 - yh * mgy1)).astype(dy1_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_slabs, p5, 0)


# ---------------------------------------------------------------------------
# kernel B: conv1ᵀ(dy1) + fold + skip -> dx, conv1 wgrad vs x
# ---------------------------------------------------------------------------

def _bwd_b_kernel(SH, H, W, C, dy1_ref, x_ref, dout_ref, wflip_ref,
                  dx_ref, dw1_ref, db1_ref, dz3, ap3):
    b = pl.program_id(0)
    n_slabs = H // SH

    def rows_of(ref):
        return lambda r0, k: ref[0, pl.ds(r0, k)]

    def p1(s, _):
        sl = pl.ds(s * SH, SH)
        accp = _convT_slab(rows_of(dy1_ref), s, wflip_ref, dz3, SH, H, W, C)
        skip = dout_ref[0, sl].astype(jnp.float32)
        dx_ref[0, sl] = _fold_reflect(
            accp, s, SH, W, n_slabs, extra=skip).astype(dx_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_slabs, p1, 0)

    def p2(s, _):
        ap = _asm_reflect(rows_of(x_ref), s, SH, H)
        dy_slab = dy1_ref[0, pl.ds(s * SH, SH)]
        first = (b == 0) & (s == 0)
        _wgrad_slab(ap, dy_slab, ap3, dw1_ref, first, SH, W, C)
        dsum = jnp.sum(dy_slab.astype(jnp.float32).reshape(SH * W, C),
                       axis=0, keepdims=True)

        @pl.when(first)
        def _():
            db1_ref[0, :] = dsum[0]

        @pl.when(jnp.logical_not(first))
        def _():
            db1_ref[0, :] += dsum[0]

        return 0

    jax.lax.fori_loop(0, n_slabs, p2, 0)


# ---------------------------------------------------------------------------
# wrapper
# ---------------------------------------------------------------------------

def _flip_pack(w, C):
    # wb3[uy] = (ux*C + c_out, c_in): w[2-uy, 2-ux, ci, co] flip-transposed
    # (the packing resblock._conv_bwd feeds _conv_bwd_dinp_kernel)
    return jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2).reshape(3, 3 * C, C)


def rb_bwd_fused(x, w1, w2, y1, y2, m1, r1, m2, r2, dout):
    """(dx, dw1, db1, dw2, db2) of the fused resblock, two resident kernels.

    Same math/rounding as the split route in resblock._rb_bwd; see module
    docstring."""
    B, H, W, C = x.shape
    SH = _bwd_slab(H, W, C)
    img = pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    chan = pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((3, 3 * C, C), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    wgrad_specs = [
        pl.BlockSpec((3, 3 * C, C), lambda b: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
    ]
    wgrad_shapes = [
        jax.ShapeDtypeStruct((3, 3 * C, C), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
    ]
    taps = pltpu.VMEM((SH + 4, W + 2, 3 * C), x.dtype)
    ap3 = pltpu.VMEM((SH + 2, W, 3 * C), x.dtype)
    vmem = min(_abwd_vmem_bytes(B, H, W, C, SH, x.dtype.itemsize)
               + 8 * 1024 * 1024, _VMEM_CAP)
    params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",), vmem_limit_bytes=vmem)

    dy1, dw2, db2 = pl.pallas_call(
        functools.partial(_bwd_a_kernel, SH, H, W, C),
        grid=(B,),
        in_specs=[img, img, img, wspec, chan, chan, chan, chan],
        out_specs=[img] + wgrad_specs,
        out_shape=[jax.ShapeDtypeStruct((B, H, W, C), x.dtype)]
        + wgrad_shapes,
        scratch_shapes=[pltpu.VMEM((H, W, C), x.dtype),
                        pltpu.VMEM((H, W, C), x.dtype), taps, ap3],
        compiler_params=params,
        interpret=_interpret(),
    )(dout, y2, y1, _flip_pack(w2, C),
      m1[:, None, :], r1[:, None, :], m2[:, None, :], r2[:, None, :])

    dx, dw1, db1 = pl.pallas_call(
        functools.partial(_bwd_b_kernel, SH, H, W, C),
        grid=(B,),
        in_specs=[img, img, img, wspec],
        out_specs=[img] + wgrad_specs,
        out_shape=[jax.ShapeDtypeStruct((B, H, W, C), x.dtype)]
        + wgrad_shapes,
        scratch_shapes=[taps, ap3],
        compiler_params=params,
        interpret=_interpret(),
    )(dy1, x, dout, _flip_pack(w1, C))

    return (dx, dw1.reshape(3, 3, C, C), db1[0],
            dw2.reshape(3, 3, C, C), db2[0])
