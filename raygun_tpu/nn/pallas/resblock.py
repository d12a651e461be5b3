"""Pallas TPU kernel: fused CycleGAN resnet block with custom VJP.

The Johnson-resnet generator's 6 residual blocks are 86% of its FLOPs
(reference ``ResNet.py:127-223``; block = conv3x3 → instance norm → relu →
conv3x3 → instance norm → +skip, reflect padding). Under XLA each block
forward measures ~2.1 ms at (3, 128², 256) bf16 — 28% MFU — because every
conv/norm boundary materializes full activations to HBM and the norm adds
stats passes (scripts/perf_g_fwd_prefix.py). This kernel family runs the
whole block at its traffic floor:

  forward   K1: conv1 (9 shifted MXU matmuls over row slabs, reflect halos
                assembled in VMEM) + bias + fp32 sum/sumsq accumulation
            K2: normalize1+relu (recomputed per slab from resident stats) +
                conv2 + bias + stats — y1 never leaves VMEM un-normalized
            tail: normalize2 + skip add (reuses instance_norm kernels)
  backward  IN2 bwd (reused) → conv2ᵀ/dW2/db2 kernel (h1 recomputed
            in-slab from y1) → relu∘IN1 bwd (reused) → conv1ᵀ/dW1/db1
            kernel fused with the skip-gradient add.

Exactness: the same math as the XLA route (MXU fp32 accumulation, stats
from the bf16-rounded conv outputs in fp32, biased variance, reflect-pad
VJP fold) with only reassociated summation — parity-tested against the
unfused module in tests/nn/test_resblock_pallas.py, gradient included.

Layout: channels-last (B, H, W, C); C must be a multiple of 128 and H a
multiple of the slab height (8/16/32 — picked per shape); callers fall
back to the unfused route otherwise (nn/resnet.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .instance_norm import _bwd_dx, _normalize

Array = jax.Array


def _interpret() -> bool:
    try:
        return jax.devices()[0].platform not in ("tpu", "axon")
    except Exception:
        return True


def _pick_slab(H: int, W: int, C: int,
               budget: int = 6 * 1024 * 1024) -> Optional[int]:
    """Largest slab height (rows per grid step) that divides H and keeps
    the fp32 accumulator + assembled input comfortably inside VMEM."""
    for sh in (32, 16, 8):
        if H % sh == 0 and H >= sh:
            # acc fp32 + assembled input bf16 + matmul operand copies
            approx = sh * W * C * 4 + (sh + 4) * (W + 4) * C * 2 * 2
            if approx <= budget:
                return sh
    return None


# the backward kernel's working set adds the resident (3,3,C,C) fp32
# weight-grad accumulator and the padded-domain dinp accumulator — it
# needs a smaller slab to stay inside the 16 MB scoped-VMEM limit
_BWD_BUDGET = 3 * 1024 * 1024


def resblock_fused_ok(x: Array) -> bool:
    import os

    if os.environ.get("RAYGUN_DISABLE_PALLAS_RESBLOCK"):
        return False
    if x.ndim != 4:
        return False
    if x.dtype != jnp.bfloat16:
        # the slab VMEM budget below is calibrated for 2-byte activations;
        # a (1,128,128,256) fp32 input measured a 27.5 MB scoped-VMEM
        # working set (> the 16 MB limit) — fp32 runs the unfused path
        return False
    B, H, W, C = x.shape
    if C % 128 or W < 8 or H < 8 or _pick_slab(H, W, C) is None:
        return False
    if os.environ.get("RAYGUN_FORCE_PALLAS_RESBLOCK"):
        # skip the platform + min-size heuristics (NOT the structural
        # constraints above): CPU interpret-mode tests exercise the
        # production route, e.g. under a DP mesh
        return True
    if H * W * C * B < (1 << 20):
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


# ---------------------------------------------------------------------------
# slab assembly helpers (shared by fwd and bwd kernels)
# ---------------------------------------------------------------------------

def _assemble_reflect(main, above, below, s, n_slabs):
    """Rows [s*SH-1, s*SH+SH+1) of the reflect-padded-by-1 input, plus
    reflect column padding: (SH+2, W+2, C) from main (SH, W, C) and 2-row
    halo blocks. Edge slabs take the reflect rows from ``main`` itself."""
    SH = main.shape[0]
    top = jnp.where(s == 0, main[1], above[1])
    bot = jnp.where(s == n_slabs - 1, main[SH - 2], below[0])
    rows = jnp.concatenate([top[None], main, bot[None]], axis=0)
    return jnp.concatenate(
        [rows[:, 1:2], rows, rows[:, -2:-1]], axis=1)


def _stack_taps(ap, ap3_ref, W, C):
    """Write (R, W+2, C) → scratch (R, W, 3C): x-taps stacked into
    channels, via VMEM stores (lane-aligned destinations; Mosaic rejects
    lane concats of sublane-offset vectors, and the naive per-tap strided
    reshapes spent most of their time in VPU relayouts). Row (ty) slices
    of the result are contiguous, so the matmuls need no copies."""
    for tx in range(3):
        ap3_ref[:, :, tx * C:(tx + 1) * C] = ap[:, tx:tx + W, :]
    return ap3_ref[...]


def _conv9(ap, ap3_ref, w3_ref, SH, W, C):
    """Σ_ty ap3[ty:ty+SH] @ w3[ty] with ap3 = x-tap-stacked ap and
    w3[ty] = (3C, C) (tx, c_in) stacked — fp32 accumulation, 3 MXU calls."""
    ap3 = _stack_taps(ap, ap3_ref, W, C)
    acc = jnp.zeros((SH * W, C), jnp.float32)
    for ty in range(3):
        a = ap3[ty:ty + SH].reshape(SH * W, -1)
        acc = acc + jax.lax.dot_general(
            a, w3_ref[ty],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return acc


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------

def _conv_stats_kernel(SH, W, C, n_slabs, normalize_in,
                       *refs):
    if normalize_in:
        (main_ref, above_ref, below_ref, mean_ref, rstd_ref, w_ref, b_ref,
         y_ref, sums_ref, ap3_ref) = refs
    else:
        (main_ref, above_ref, below_ref, w_ref, b_ref,
         y_ref, sums_ref, ap3_ref) = refs
    s = pl.program_id(1)
    ap = _assemble_reflect(main_ref[0], above_ref[0], below_ref[0],
                           s, n_slabs)
    if normalize_in:
        m = mean_ref[0, 0, :][None, None, :]
        r = rstd_ref[0, 0, :][None, None, :]
        ap = jnp.maximum((ap.astype(jnp.float32) - m) * r, 0.0)
    ap = ap.astype(w_ref.dtype)
    acc = _conv9(ap, ap3_ref, w_ref, SH, W, C)
    acc = acc + b_ref[0, :][None, :].astype(jnp.float32)
    yb = acc.astype(y_ref.dtype)
    y_ref[0] = yb.reshape(SH, W, C)
    # stats from the rounded outputs (matches the unfused route, which
    # computes IN stats from the bf16 conv output in fp32)
    yf = yb.astype(jnp.float32)
    ssum = jnp.sum(yf, axis=0)
    ssq = jnp.sum(yf * yf, axis=0)

    @pl.when(s == 0)
    def _():
        sums_ref[0, 0, :] = ssum
        sums_ref[0, 1, :] = ssq

    @pl.when(s > 0)
    def _():
        sums_ref[0, 0, :] += ssum
        sums_ref[0, 1, :] += ssq


def _fwd_specs(B, H, W, C, SH, normalize_in, dtype):
    n_slabs = H // SH
    half = SH // 2

    main = pl.BlockSpec((1, SH, W, C), lambda b, s: (b, s, 0, 0),
                        memory_space=pltpu.VMEM)
    above = pl.BlockSpec(
        (1, 2, W, C),
        lambda b, s: (b, jnp.maximum(s * half - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    below = pl.BlockSpec(
        (1, 2, W, C),
        lambda b, s: (b, jnp.minimum(s * half + half, H // 2 - 1), 0, 0),
        memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((3, 3 * C, C), lambda b, s: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, C), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM)
    chan = pl.BlockSpec((1, 1, C), lambda b, s: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [main, above, below]
    if normalize_in:
        in_specs += [chan, chan]
    in_specs += [wspec, bspec]
    out_specs = [
        pl.BlockSpec((1, SH, W, C), lambda b, s: (b, s, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, C), lambda b, s: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, H, W, C), dtype),
        jax.ShapeDtypeStruct((B, 2, C), jnp.float32),
    ]
    return n_slabs, in_specs, out_specs, out_shape


def _conv_stats(x, w, b, stats=None):
    """conv3x3(reflect_pad(maybe_norm_relu(x))) + bias, plus (sum, sumsq)
    of the output. ``stats``: (mean, rstd) to normalize+relu the input."""
    B, H, W, C = x.shape
    SH = _pick_slab(H, W, C)
    normalize_in = stats is not None
    n_slabs, in_specs, out_specs, out_shape = _fwd_specs(
        B, H, W, C, SH, normalize_in, x.dtype)
    args = [x, x, x]
    if normalize_in:
        mean, rstd = stats
        args += [mean[:, None, :], rstd[:, None, :]]
    # (3, 3, C_in, C_out) → (3, 3*C, C): tx and c_in stacked (row-major)
    args += [w.reshape(3, 3 * C, C), b.reshape(1, -1)]
    y, sums = pl.pallas_call(
        functools.partial(_conv_stats_kernel, SH, W, C, n_slabs,
                          normalize_in),
        grid=(B, n_slabs),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((SH + 2, W, 3 * C), x.dtype)],
        interpret=_interpret(),
    )(*args)
    return y, sums


def _sums_to_moments(sums, n, eps):
    mean = sums[:, 0, :] / n
    var = sums[:, 1, :] / n - mean * mean
    rstd = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    return mean, rstd


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------

def _conv_bwd_dinp_kernel(SH, W, C, n_slabs, add_dout, *refs):
    i = 0
    dy_main = refs[i]; i += 1
    dy_above = refs[i]; i += 1
    dy_below = refs[i]; i += 1
    if add_dout:
        dout_ref = refs[i]; i += 1
    w_ref = refs[i]; i += 1
    dinp_ref = refs[i]; i += 1
    dz3_ref = refs[i]

    s = pl.program_id(1)

    # ---- assemble zero-padded dy rows [s*SH-2, s*SH+SH+2), cols +-2 ----
    zero = jnp.zeros((), dy_main.dtype)
    above = jnp.where(s > 0, dy_above[0], zero)
    below = jnp.where(s < n_slabs - 1, dy_below[0], zero)
    dyz = jnp.concatenate([above, dy_main[0], below], axis=0)
    zc = jnp.zeros((SH + 4, 2, C), dy_main.dtype)
    dyz = jnp.concatenate([zc, dyz, zc], axis=1)  # (SH+4, W+4, C)

    # ---- dinp_pad rows [s*SH, s*SH+SH+2): Σ_uy dz3[i+uy] @ wb3[uy] ----
    # wb3[uy] = (ux*C + c_out, c_in) stacked flip-transposed weights,
    # prepared by the wrapper — see _conv_bwd.
    dz3 = _stack_taps(dyz, dz3_ref, W + 2, C)  # (SH+4, W+2, 3C)
    acc = jnp.zeros(((SH + 2) * (W + 2), C), jnp.float32)
    for uy in range(3):
        a = dz3[uy:uy + SH + 2].reshape((SH + 2) * (W + 2), -1)
        acc = acc + jax.lax.dot_general(
            a, w_ref[uy],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    accp = acc.reshape(SH + 2, W + 2, C)

    # ---- reflect-pad VJP fold (rows then cols) ----
    rows = accp[1:SH + 1]  # dinp rows [s*SH, s*SH+SH)
    ridx = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 0)
    rows = rows + jnp.where((ridx == 1) & (s == 0), accp[0][None], 0.0)
    rows = rows + jnp.where(
        (ridx == SH - 2) & (s == n_slabs - 1), accp[SH + 1][None], 0.0)
    cols = rows[:, 1:W + 1]
    cidx = jax.lax.broadcasted_iota(jnp.int32, cols.shape, 1)
    cols = cols + jnp.where(cidx == 1, rows[:, 0:1], 0.0)
    cols = cols + jnp.where(cidx == W - 2, rows[:, W + 1:W + 2], 0.0)
    if add_dout:
        cols = cols + dout_ref[0].astype(jnp.float32)
    dinp_ref[0] = cols.astype(dinp_ref.dtype)


def _conv_bwd_w_kernel(SH, W, C, n_slabs, normalize_in, *refs):
    i = 0
    dy_main = refs[i]; i += 1
    in_main = refs[i]; i += 1
    in_above = refs[i]; i += 1
    in_below = refs[i]; i += 1
    if normalize_in:
        mean_ref = refs[i]; i += 1
        rstd_ref = refs[i]; i += 1
    dw_ref, db_ref = refs[i], refs[i + 1]
    ap3_ref = refs[i + 2]

    b = pl.program_id(0)
    s = pl.program_id(1)

    # wgrad/bias against the forward's assembled (maybe normalized) input
    ap = _assemble_reflect(in_main[0], in_above[0], in_below[0], s, n_slabs)
    if normalize_in:
        m = mean_ref[0, 0, :][None, None, :]
        r = rstd_ref[0, 0, :][None, None, :]
        ap = jnp.maximum((ap.astype(jnp.float32) - m) * r, 0.0)
    ap = ap.astype(dy_main.dtype)
    ap3 = _stack_taps(ap, ap3_ref, W, C)  # (SH+2, W, 3C)
    dym = dy_main[0].reshape(SH * W, C)
    first = (b == 0) & (s == 0)

    dsum = jnp.sum(dym.astype(jnp.float32), axis=0)

    @pl.when(first)
    def _():
        db_ref[0, :] = dsum

    @pl.when(jnp.logical_not(first))
    def _():
        db_ref[0, :] += dsum

    for ty in range(3):
        a = ap3[ty:ty + SH].reshape(SH * W, -1)
        dw = jax.lax.dot_general(
            a, dym, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(first)
        def _(ty=ty, dw=dw):
            dw_ref[ty] = dw

        @pl.when(jnp.logical_not(first))
        def _(ty=ty, dw=dw):
            dw_ref[ty] += dw


def _conv_bwd(dy, inp, w, stats=None, dout=None):
    """(dinp [+ dout], dW, db) of y = conv3x3(reflect_pad(f(inp))) where
    f = relu∘IN(stats) when given, identity otherwise.

    Two pallas calls (transpose-conv and wgrad): the combined kernel's
    working set exceeded the 16 MB scoped-VMEM limit once embedded in the
    full train step; the split re-reads dy from HBM (~0.5 MB/slab) instead.
    """
    B, H, W, C = inp.shape
    SH = _pick_slab(H, W, C, budget=_BWD_BUDGET) or _pick_slab(H, W, C)
    n_slabs = H // SH
    half = SH // 2
    normalize_in = stats is not None

    main = pl.BlockSpec((1, SH, W, C), lambda b, s: (b, s, 0, 0),
                        memory_space=pltpu.VMEM)
    above = pl.BlockSpec(
        (1, 2, W, C),
        lambda b, s: (b, jnp.maximum(s * half - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    below = pl.BlockSpec(
        (1, 2, W, C),
        lambda b, s: (b, jnp.minimum(s * half + half, H // 2 - 1), 0, 0),
        memory_space=pltpu.VMEM)
    chan = pl.BlockSpec((1, 1, C), lambda b, s: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((3, 3 * C, C), lambda b, s: (0, 0, 0),
                         memory_space=pltpu.VMEM)

    # ---- pass 1: dinp (transpose conv + reflect fold [+ dout]) ----
    in_specs = [main, above, below]
    args = [dy, dy, dy]
    if dout is not None:
        in_specs += [main]
        args += [dout]
    in_specs += [wspec]
    # wb3[uy] = (ux*C + c_out, c_in): w[2-uy, 2-ux, ci, co] flip-transposed
    args += [jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2).reshape(3, 3 * C, C)]
    dinp = pl.pallas_call(
        functools.partial(_conv_bwd_dinp_kernel, SH, W, C, n_slabs,
                          dout is not None),
        grid=(B, n_slabs),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, SH, W, C), lambda b, s: (b, s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), dy.dtype),
        scratch_shapes=[pltpu.VMEM((SH + 4, W + 2, 3 * C), dy.dtype)],
        interpret=_interpret(),
    )(*args)

    # ---- pass 2: dW, db ----
    in_specs = [main, main, above, below]
    args = [dy, inp, inp, inp]
    if normalize_in:
        mean, rstd = stats
        in_specs += [chan, chan]
        args += [mean[:, None, :], rstd[:, None, :]]
    out_specs = [
        pl.BlockSpec((3, 3 * C, C), lambda b, s: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), lambda b, s: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((3, 3 * C, C), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
    ]
    dw3, db = pl.pallas_call(
        functools.partial(_conv_bwd_w_kernel, SH, W, C, n_slabs,
                          normalize_in),
        grid=(B, n_slabs),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((SH + 2, W, 3 * C), inp.dtype)],
        interpret=_interpret(),
    )(*args)
    return dinp, dw3.reshape(3, 3, C, C), db[0]


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

def _rb_forward(x, w1, b1, w2, b2, eps):
    B, H, W, C = x.shape
    n = H * W
    y1, sums1 = _conv_stats(x, w1, b1)
    mean1, rstd1 = _sums_to_moments(sums1, n, eps)
    y2, sums2 = _conv_stats(y1, w2, b2, stats=(mean1, rstd1))
    mean2, rstd2 = _sums_to_moments(sums2, n, eps)
    x3 = x.reshape(B, n, C)
    out = _normalize(y2.reshape(B, n, C), mean2, rstd2,
                     residual=x3).reshape(x.shape)
    return out, (y1, y2, mean1, rstd1, mean2, rstd2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def resblock_fused(x: Array, w1: Array, b1: Array, w2: Array, b2: Array,
                   eps: float = 1e-5) -> Array:
    """x + IN(conv2(relu(IN(conv1(x))))) with reflect padding, fused.

    Exact re-expression of ResnetBlock's reflect/'same' route (see module
    docstring); parity- and gradient-parity-tested vs the unfused module.
    """
    out, _ = _rb_forward(x, w1, b1, w2, b2, eps)
    return out


def _rb_fwd(x, w1, b1, w2, b2, eps):
    out, (y1, y2, mean1, rstd1, mean2, rstd2) = _rb_forward(
        x, w1, b1, w2, b2, eps)
    return out, (x, w1, b1, w2, b2, y1, y2, mean1, rstd1, mean2, rstd2)


def _rb_bwd(eps, res, dout):
    x, w1, b1, w2, b2, y1, y2, mean1, rstd1, mean2, rstd2 = res
    from .resblock_bwd import rb_bwd_fused, rb_bwd_fused_ok

    if rb_bwd_fused_ok(x):
        # whole-block backward in TWO resident kernels (vs ~8 split
        # passes) — same formulas/rounding points; see resblock_bwd.py
        dx, dw1, db1, dw2, db2 = rb_bwd_fused(
            x, w1, w2, y1, y2, mean1, rstd1, mean2, rstd2, dout)
        return (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
                dw2.astype(w2.dtype), db2.astype(b2.dtype))
    B, H, W, C = x.shape
    n = H * W
    d3 = dout.reshape(B, n, C)
    # IN2 (+skip): dx gets dout directly; dy2 via the IN backward
    dy2 = _bwd_dx(eps, None, y2.reshape(B, n, C), mean2, rstd2,
                  d3).reshape(x.shape)
    dh1, dw2, db2 = _conv_bwd(dy2, y1, w2, stats=(mean1, rstd1))
    dy1 = _bwd_dx(eps, 0.0, y1.reshape(B, n, C), mean1, rstd1,
                  dh1.reshape(B, n, C)).reshape(x.shape)
    dx, dw1, db1 = _conv_bwd(dy1, x, w1, dout=dout)
    return (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype))


resblock_fused.defvjp(_rb_fwd, _rb_bwd)
