"""Pallas TPU kernels: the WHOLE production PatchGAN discriminator as two
resident kernels per direction.

The production discriminator (reference ``NLayerDiscriminator.py:30-77``
at ds_kw=2, kw=3, n_layers=3, instance norm) measured 5.6 ms fwd+bwd at
batch 6 x 512^2 on v5e against a ~1.5 ms hardware floor
(``scripts/perf_d_layers.py``): under XLA every conv/norm boundary
materializes full activations to HBM, and the packed-GEMM re-expression
(``nn/packed_shell.py`` disc section) still runs ~10 kernel boundaries
per direction. The whole net's per-image working set (~20 MB) fits VMEM,
so — like the fused resblock backward (``resblock_bwd.py``) — the right
shape is whole-subnet resident kernels:

  stage A (granularity-4 grid, fully flattened — conv_0/conv_1 are 1x1
    GEMMs over pre-packed pair tensors, the virtual-padding phase mask is
    an iota predicate): stem GEMM -> lrelu -> mask -> conv_1 GEMM ->
    IN1 stats -> normalize+lrelu. One pallas call; y1 never leaves VMEM
    un-normalized.
  stage B (granularity-8 grid, width padded to a sublane multiple with
    data cols [0, Wv)): conv_2 GEMM -> IN2+lrelu -> conv_3 as 3 stacked-
    tap GEMMs (zero padding assembled in VMEM) -> IN3+lrelu -> conv_out
    (co=1) as 9 broadcast-MAC taps + one lane reduction. One pallas call.

  backward: the exact reverse chains, one resident kernel per stage,
  emitting dx AND all weight/bias grads (the wgrad GEMMs are ~12 GF —
  noise next to the boundary costs they remove).

Between stages only the tiny repack relayout (pad + space_to_depth,
XLA-autodiffed glue) touches HBM.

Exactness: same formulas and rounding points as the packed XLA route —
bf16 GEMMs with fp32 accumulation, IN stats in fp32 from the bf16-rounded
conv outputs (biased variance, ``rsqrt(max(var,0)+eps)``), lrelu slope
0.2 applied post-norm, phase mask applied post-activation
(``packed_shell.disc_mask_pad_phase``). Only fp32 summation order
differs. Parity-tested (values + input/param grads) against the generic
module route in tests/nn/test_disc_fused.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .resblock import _interpret

Array = jax.Array

_EPS = 1e-5
_SLOPE = 0.2
_VMEM_CAP = 110 * 1024 * 1024


def _ceil16(n: int) -> int:
    return -(-n // 16) * 16


def disc_fused_structural_ok(ndims, n_layers, kw, ds_kw, norm_is_instance,
                             H, W) -> bool:
    """Shape/architecture requirements of the two-stage fused kernels."""
    return (ndims == 2 and n_layers == 3 and kw == 3 and ds_kw == 2
            and norm_is_instance and H % 8 == 0 and W % 8 == 0
            and H >= 16 and W >= 16)


def _vmem_bytes(ngf: int, Hp: int, Wt: int, SA: int) -> int:
    C1, C2, C3 = 2 * ngf, 4 * ngf, 8 * ngf
    # stage B bwd dominates: ins (y2, y3, p2) + out dp2 (x2 buffers), two
    # tap scratches, fp32 accumulators and the dw3 accumulator
    img2, img3, imgp = Hp * Wt * C2 * 2, Hp * Wt * C3 * 2, Hp * Wt * 4 * C1 * 2
    taps = (Hp + 2) * Wt * 3 * (C2 + C3) * 2
    accs = Hp * Wt * (C2 + C3) * 4
    dw3 = 3 * 3 * C2 * C3 * 4
    b_bwd = 2 * (img2 + img3 + imgp) + 2 * imgp + taps + 2 * accs + 2 * dw3
    # stage A: x4 + y1 + a1 + da1 (x2 buffers) + fp32 intermediates
    a_bwd = 2 * (SA * 128 * 2 + 3 * SA * C1 * 2) + 2 * SA * (C2 + C1) * 4
    return max(b_bwd, a_bwd)


def disc_fused_ok(x: Array, ngf: int) -> bool:
    """Perf gate on top of the structural one (caller checks that)."""
    if os.environ.get("RAYGUN_DISABLE_DISC_FUSED"):
        return False
    if x.ndim != 4:
        return False
    B, H, W = x.shape[0], x.shape[1], x.shape[2]
    if os.environ.get("RAYGUN_FORCE_DISC_FUSED"):
        return True
    if x.dtype != jnp.bfloat16:
        return False
    if (4 * ngf) % 128:
        return False
    if B * H * W * ngf < (1 << 21):
        return False
    Hp, Wq = H // 8 + 1, W // 8 + 1
    if _vmem_bytes(ngf, Hp, _ceil16(Wq), (H // 4 + 1) * (W // 4 + 1)) \
            > _VMEM_CAP:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


# ---------------------------------------------------------------------------
# shared in-kernel helpers
# ---------------------------------------------------------------------------

def _lrelu_dt(v32, dt):
    """Round to the activation dtype FIRST, then lrelu at that dtype's
    rounding points — the generic route's exact arithmetic
    (``jax.nn.leaky_relu`` runs on the already-cast norm/conv output, so
    in bf16 the slope is bf16(0.2) = 0.19921875, not 0.2). Computed in
    fp32 on the dt-rounded values (Mosaic lacks bf16 vector compares; a
    bf16 x bf16 product is exact in fp32, so round(f32 product) == the
    bf16 multiply)."""
    v = v32.astype(dt).astype(jnp.float32)
    slf = jnp.asarray(_SLOPE, dt).astype(jnp.float32)
    return jnp.where(v >= 0, v, slf * v).astype(dt)


def _dlrelu_dt(v32, g, dt):
    """Cotangent of :func:`_lrelu_dt`: gate the dtype-rounded incoming
    cotangent by the sign of the dtype-rounded pre-activation (the
    generic route's bf16 chain), then lift to fp32 for the IN backward."""
    v = v32.astype(dt).astype(jnp.float32)
    gd = g.astype(dt).astype(jnp.float32)
    slf = jnp.asarray(_SLOPE, dt).astype(jnp.float32)
    neg = (slf * gd).astype(dt).astype(jnp.float32)
    return jnp.where(v >= 0, gd, neg)


def _moments(v32, n):
    """fp32 (S, C) -> per-channel mean, rstd over ``n`` valid rows.
    ``v32`` must already be zero outside the valid rows."""
    s = jnp.sum(v32, axis=0)
    sq = jnp.sum(v32 * v32, axis=0)
    mean = s / n
    var = sq / n - mean * mean
    return mean, jax.lax.rsqrt(jnp.maximum(var, 0.0) + _EPS)


def _asm2(x, dtype):
    """(Hp, Wt, C) -> (Hp+2, Wt+2, C): one zero row/col on EVERY side —
    the zero-padding domain the k3 convs and their transposes read.
    Tap (ty, tx) of output position (r, j) is ``asm[r+ty, j+tx]``."""
    Hp, Wt, C = x.shape
    zr = jnp.zeros((1, Wt, C), dtype)
    rows = jnp.concatenate([zr, x.astype(dtype), zr], axis=0)
    zc = jnp.zeros((Hp + 2, 1, C), dtype)
    return jnp.concatenate([zc, rows, zc], axis=1)


def _stack_x_taps(asm, ap3_ref, Wt, C):
    """x-tap-stack the assembled domain into the scratch: ap3[r, j, tx*C+c]
    = asm[r, j+tx, c] (``resblock._stack_taps`` convention)."""
    for tx in range(3):
        ap3_ref[:, :, tx * C:(tx + 1) * C] = asm[:, tx:tx + Wt, :]
    return ap3_ref[...]


def _tap_gemm9(asm, ap3_ref, w3_ref, Hp, Wt, C):
    """Sum_ty (x-tap-stacked asm)[ty:ty+Hp] @ w3[ty] — the stacked-tap k3
    conv (``resblock._conv9``) on the zero-assembled domain, fp32 acc."""
    ap3 = _stack_x_taps(asm, ap3_ref, Wt, C)
    acc = jnp.zeros((Hp * Wt, w3_ref.shape[-1]), jnp.float32)
    for ty in range(3):
        a = ap3[ty:ty + Hp].reshape(Hp * Wt, -1)
        acc = acc + jax.lax.dot_general(
            a, w3_ref[ty], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return acc


def _acc_out(ref, val, first):
    @pl.when(first)
    def _():
        ref[...] = val

    @pl.when(jnp.logical_not(first))
    def _():
        ref[...] += val


# ---------------------------------------------------------------------------
# stage A: stem -> lrelu -> phase mask -> conv_1 -> IN1 -> lrelu   (flat)
# ---------------------------------------------------------------------------

def _phase_keep(SA, Wc, CP, ngf, dtype):
    """(SA, CP) 1/0 mask: 0 on the virtual position -1 entries of the
    packed pair grid (``packed_shell.disc_mask_pad_phase`` as a flat-iota
    predicate). Computed in the XLA glue — it is jit-constant and XLA
    folds it; Mosaic lacks the int div/mod lowering at this shape."""
    idx = jnp.arange(SA, dtype=jnp.int32)[:, None]
    lane = jnp.arange(CP, dtype=jnp.int32)[None, :]
    row0, col0 = idx < Wc, idx % Wc == 0
    uy = lane // (2 * ngf)
    ux = (lane // ngf) % 2
    junk = (row0 & (uy == 0)) | (col0 & (ux == 0))
    return jnp.logical_not(junk).astype(dtype)


def _stage_a_kernel(SA, Wc, ngf, x4_ref, keep_ref, wp_ref, b0_ref, w1_ref,
                    b1_ref, y1_ref, m1_ref, r1_ref, a1_ref):
    hp = jax.lax.dot_general(
        x4_ref[0], wp_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b0_ref[0, :][None, :]
    dt = x4_ref.dtype
    a0 = _lrelu_dt(hp, dt) * keep_ref[...]
    y1 = jax.lax.dot_general(
        a0, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[0, :][None, :]
    y1b = y1.astype(y1_ref.dtype)
    y1_ref[0] = y1b
    # IN stats from the rounded conv output, fp32 (the unfused route's
    # convention — see resblock._conv_stats_kernel)
    yf = y1b.astype(jnp.float32)
    mean, rstd = _moments(yf, jnp.float32(SA))
    m1_ref[0, 0, :] = mean
    r1_ref[0, 0, :] = rstd
    yhat = (yf - mean[None, :]) * rstd[None, :]
    a1_ref[0] = _lrelu_dt(yhat, a1_ref.dtype)


def _stage_a_bwd_kernel(SA, Wc, ngf, da1_ref, y1_ref, m1_ref, r1_ref,
                        x4_ref, keep_ref, wp_ref, b0_ref, w1t_ref, wpt_ref,
                        dx4_ref, dw1_ref, db1_ref, dwp_ref, db0_ref):
    b = pl.program_id(0)
    first = b == 0
    n = jnp.float32(SA)
    m1 = m1_ref[0, 0, :][None, :]
    r1 = r1_ref[0, 0, :][None, :]
    # lrelu∘IN1 backward (instance_norm._bwd_* formulas, whole image)
    dt = x4_ref.dtype
    yhat = (y1_ref[0].astype(jnp.float32) - m1) * r1
    g = _dlrelu_dt(yhat, da1_ref[0], dt)
    mg = (jnp.sum(g, axis=0) / n)[None, :]
    mgy = (jnp.sum(g * yhat, axis=0) / n)[None, :]
    dy1 = (r1 * (g - mg - yhat * mgy)).astype(dt)
    _acc_out(db1_ref, jnp.sum(dy1.astype(jnp.float32), axis=0)[None, :],
             first)
    # recompute a0 (and its pre-activation sign) from x4
    hp = jax.lax.dot_general(
        x4_ref[0], wp_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b0_ref[0, :][None, :]
    keep = keep_ref[...]
    a0 = _lrelu_dt(hp, dt) * keep
    _acc_out(dw1_ref, jax.lax.dot_general(
        a0, dy1, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32), first)
    da0 = jax.lax.dot_general(
        dy1, w1t_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dstem = _dlrelu_dt(hp, da0, dt).astype(dt) * keep
    _acc_out(dwp_ref, jax.lax.dot_general(
        x4_ref[0], dstem, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32), first)
    _acc_out(db0_ref, jnp.sum(dstem.astype(jnp.float32), axis=0)[None, :],
             first)
    dx4_ref[0] = jax.lax.dot_general(
        dstem, wpt_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dx4_ref.dtype)


# ---------------------------------------------------------------------------
# stage B: conv_2 -> IN2+lrelu -> conv_3 -> IN3+lrelu -> conv_out
# ---------------------------------------------------------------------------

def _colmask(Hp, Wt, Wv):
    """(Hp*Wt, 1) fp32 1/0: the data columns [0, Wv) of the width-padded
    layout. Built from a 3D iota (no int div/mod — Mosaic lacks that
    lowering at these shapes); zeroing is multiplication (all values are
    computed, finite — no NaN-poisoning OOB reads to guard)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wt, 1), 1)
    return (col < Wv).astype(jnp.float32).reshape(Hp * Wt, 1)


def _stage_b_kernel(Hp, Wt, Wv, C1, C2, C3, p2_ref, w2_ref, b2_ref, w3_ref,
                    b3_ref, wo_ref, y2_ref, m2_ref, r2_ref, y3_ref, m3_ref,
                    r3_ref, pred_ref, ap3_ref):
    n = jnp.float32(Hp * Wv)
    dt = p2_ref.dtype
    mf = _colmask(Hp, Wt, Wv)
    mdt = mf.astype(dt)
    y2 = jax.lax.dot_general(
        p2_ref[0].reshape(Hp * Wt, 4 * C1), w2_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32) \
        + b2_ref[0, :][None, :]
    y2b = (y2 * mf).astype(dt)
    y2_ref[0] = y2b.reshape(Hp, Wt, C2)
    yf = y2b.astype(jnp.float32)
    m2, r2 = _moments(yf, n)
    m2_ref[0, 0, :] = m2
    r2_ref[0, 0, :] = r2
    yhat = (yf - m2[None, :]) * r2[None, :]
    a2 = _lrelu_dt(yhat, dt)
    a2 = (a2 * mdt).reshape(Hp, Wt, C2)

    y3 = _tap_gemm9(_asm2(a2, dt), ap3_ref, w3_ref, Hp, Wt, C2) \
        + b3_ref[0, :][None, :]
    y3b = (y3 * mf).astype(dt)
    y3_ref[0] = y3b.reshape(Hp, Wt, C3)
    yf3 = y3b.astype(jnp.float32)
    m3, r3 = _moments(yf3, n)
    m3_ref[0, 0, :] = m3
    r3_ref[0, 0, :] = r3
    yhat3 = (yf3 - m3[None, :]) * r3[None, :]
    a3 = _lrelu_dt(yhat3, dt)
    a3 = (a3 * mdt).reshape(Hp, Wt, C3)

    # conv_out (co=1): 9 broadcast-MAC taps + one lane reduction — the
    # 1-lane GEMM would idle 127/128 MXU lanes (packed_shell rationale)
    a3A = _asm2(a3, dt)
    acc = jnp.zeros((Hp, Wt, C3), jnp.float32)
    for t in range(9):
        ty, tx = t // 3, t % 3
        w = wo_ref[t, :][None, None, :].astype(jnp.float32)
        acc = acc + a3A[ty:ty + Hp, tx:tx + Wt, :].astype(jnp.float32) * w
    pred_ref[0] = jnp.sum(acc, axis=-1)


def _stage_b_bwd1_kernel(Hp, Wt, Wv, C3, dpred_ref, y3_ref, m3_ref, r3_ref,
                         wo_ref, dy3_ref, db3_ref, dwo_ref):
    """conv_out + lrelu∘IN3 backward: dpred -> dy3 (+ db3, dwo). Split
    from the tail half (``_stage_b_bwd2_kernel``) so neither kernel's
    fp32 live set spills registers (the monolith spilled ~72 MB)."""
    b = pl.program_id(0)
    first = b == 0
    n = jnp.float32(Hp * Wv)
    dt = y3_ref.dtype
    mf = _colmask(Hp, Wt, Wv)
    mdt = mf.astype(dt)

    m3 = m3_ref[0, 0, :][None, :]
    r3 = r3_ref[0, 0, :][None, :]
    yhat3 = (y3_ref[0].reshape(Hp * Wt, C3).astype(jnp.float32) - m3) * r3
    a3 = (_lrelu_dt(yhat3, dt) * mdt).reshape(Hp, Wt, C3)

    # conv_out backward: da3 via 9 flipped broadcast taps; dwo per tap.
    # dp is (Hp, Wt) f32, zero outside the valid cols; its transpose-conv
    # reads the SAME both-side zero-assembled domain as the forward taps.
    dp = dpred_ref[0]
    zr = jnp.zeros((1, Wt), jnp.float32)
    dpR = jnp.concatenate([zr, dp, zr], axis=0)
    zc = jnp.zeros((Hp + 2, 1), jnp.float32)
    dpA = jnp.concatenate([zc, dpR, zc], axis=1)  # (Hp+2, Wt+2)
    a3A = _asm2(a3, dt)
    da3 = jnp.zeros((Hp, Wt, C3), jnp.float32)
    dwo = []
    for t in range(9):
        ty, tx = t // 3, t % 3
        wf = wo_ref[8 - t, :][None, None, :].astype(jnp.float32)
        # lax.slice, not dpA[ty:.., tx:.., None] — the mixed slice+newaxis
        # indexer lowers to a gather Mosaic can't handle
        dpt = jax.lax.slice(dpA, (ty, tx), (ty + Hp, tx + Wt))
        da3 = da3 + dpt[:, :, None] * wf
        dwo.append(jnp.sum(
            a3A[ty:ty + Hp, tx:tx + Wt, :].astype(jnp.float32)
            * dp[:, :, None], axis=(0, 1)))
    _acc_out(dwo_ref, jnp.stack(dwo, axis=0), first)

    # lrelu∘IN3 backward
    g3 = _dlrelu_dt(yhat3, da3.reshape(Hp * Wt, C3), dt)
    g3 = g3 * mf
    mg3 = (jnp.sum(g3, axis=0) / n)[None, :]
    mgy3 = (jnp.sum(g3 * yhat3, axis=0) / n)[None, :]
    dy3 = r3 * (g3 - mg3 - yhat3 * mgy3)
    dy3 = (dy3 * mf).astype(dt)
    _acc_out(db3_ref, jnp.sum(dy3.astype(jnp.float32), axis=0)[None, :],
             first)
    dy3_ref[0] = dy3.reshape(Hp, Wt, C3)


def _stage_b_bwd2_kernel(Hp, Wt, Wv, C1, C2, C3, dy3_ref, p2_ref, y2_ref,
                         m2_ref, r2_ref, w2t_ref, w3f_ref,
                         dp2_ref, dw2_ref, db2_ref, dw3_ref,
                         ap3a_ref, ap3b_ref):
    """conv_3 + lrelu∘IN2 + conv_2 backward: dy3 -> dp2 (+ dw3, dw2, db2)."""
    b = pl.program_id(0)
    first = b == 0
    n = jnp.float32(Hp * Wv)
    dt = p2_ref.dtype
    mf = _colmask(Hp, Wt, Wv)
    mdt = mf.astype(dt)

    m2 = m2_ref[0, 0, :][None, :]
    r2 = r2_ref[0, 0, :][None, :]
    yhat2 = (y2_ref[0].reshape(Hp * Wt, C2).astype(jnp.float32) - m2) * r2
    a2 = (_lrelu_dt(yhat2, dt) * mdt).reshape(Hp, Wt, C2)

    dy3sq = dy3_ref[0]
    dy3 = dy3sq.reshape(Hp * Wt, C3)

    # conv_3 backward: dinp via flipped stacked taps; dw3 via a2-tap GEMMs
    da2 = _tap_gemm9(_asm2(dy3sq, dt), ap3b_ref, w3f_ref, Hp, Wt, C3)
    ap3a = _stack_x_taps(_asm2(a2, dt), ap3a_ref, Wt, C2)
    dw3 = []
    for ty in range(3):
        a = ap3a[ty:ty + Hp].reshape(Hp * Wt, 3 * C2)
        dw3.append(jax.lax.dot_general(
            a, dy3, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    _acc_out(dw3_ref, jnp.stack(dw3, axis=0), first)

    # lrelu∘IN2 backward
    g2 = _dlrelu_dt(yhat2, da2, dt)
    g2 = g2 * mf
    mg2 = (jnp.sum(g2, axis=0) / n)[None, :]
    mgy2 = (jnp.sum(g2 * yhat2, axis=0) / n)[None, :]
    dy2 = r2 * (g2 - mg2 - yhat2 * mgy2)
    dy2 = (dy2 * mf).astype(dt)
    _acc_out(db2_ref, jnp.sum(dy2.astype(jnp.float32), axis=0)[None, :],
             first)

    # conv_2 (1x1 GEMM) backward
    p2f = p2_ref[0].reshape(Hp * Wt, 4 * C1)
    _acc_out(dw2_ref, jax.lax.dot_general(
        p2f, dy2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32), first)
    dp2_ref[0] = jax.lax.dot_general(
        dy2, w2t_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt).reshape(
            Hp, Wt, 4 * C1)


# ---------------------------------------------------------------------------
# custom-VJP stage wrappers
# ---------------------------------------------------------------------------

def _img_spec(*shape):
    return pl.BlockSpec((1,) + shape, lambda b: (b,) + (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _full_spec(*shape):
    return pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _chan_spec(C):
    return pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def _params(nbytes):
    return pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=min(nbytes + 16 * 1024 * 1024, _VMEM_CAP))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _stage_a(x4f, wp, b0t, w1r, b1, Wc):
    return _stage_a_fwd(x4f, wp, b0t, w1r, b1, Wc)[0]


def _stage_a_fwd(x4f, wp, b0t, w1r, b1, Wc):
    B, SA, K0 = x4f.shape
    CP, C1 = wp.shape[1], w1r.shape[1]
    keep = _phase_keep(SA, Wc, CP, CP // 4, x4f.dtype)
    y1, m1, r1, a1 = pl.pallas_call(
        functools.partial(_stage_a_kernel, SA, Wc, CP // 4),
        grid=(B,),
        in_specs=[_img_spec(SA, K0), _full_spec(SA, CP),
                  _full_spec(K0, CP), _full_spec(1, CP),
                  _full_spec(CP, C1), _full_spec(1, C1)],
        out_specs=[_img_spec(SA, C1), _chan_spec(C1), _chan_spec(C1),
                   _img_spec(SA, C1)],
        out_shape=[jax.ShapeDtypeStruct((B, SA, C1), x4f.dtype),
                   jax.ShapeDtypeStruct((B, 1, C1), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, C1), jnp.float32),
                   jax.ShapeDtypeStruct((B, SA, C1), x4f.dtype)],
        compiler_params=_params(2 * SA * (K0 + 3 * C1) * 2
                                + 2 * SA * (CP + C1) * 4),
        interpret=_interpret(),
    )(x4f, keep, wp, b0t[None, :], w1r, b1[None, :])
    return a1, (x4f, wp, b0t, w1r, y1, m1, r1)


def _stage_a_bwd(Wc, res, da1):
    x4f, wp, b0t, w1r, y1, m1, r1 = res
    B, SA, K0 = x4f.shape
    CP, C1 = wp.shape[1], w1r.shape[1]
    keep = _phase_keep(SA, Wc, CP, CP // 4, x4f.dtype)
    dx4, dw1, db1, dwp, db0 = pl.pallas_call(
        functools.partial(_stage_a_bwd_kernel, SA, Wc, CP // 4),
        grid=(B,),
        in_specs=[_img_spec(SA, C1), _img_spec(SA, C1), _chan_spec(C1),
                  _chan_spec(C1), _img_spec(SA, K0), _full_spec(SA, CP),
                  _full_spec(K0, CP),
                  _full_spec(1, CP), _full_spec(C1, CP), _full_spec(CP, K0)],
        out_specs=[_img_spec(SA, K0), _full_spec(CP, C1), _full_spec(1, C1),
                   _full_spec(K0, CP), _full_spec(1, CP)],
        out_shape=[jax.ShapeDtypeStruct((B, SA, K0), x4f.dtype),
                   jax.ShapeDtypeStruct((CP, C1), jnp.float32),
                   jax.ShapeDtypeStruct((1, C1), jnp.float32),
                   jax.ShapeDtypeStruct((K0, CP), jnp.float32),
                   jax.ShapeDtypeStruct((1, CP), jnp.float32)],
        compiler_params=_params(2 * SA * (2 * K0 + 3 * C1) * 2
                                + 2 * SA * (CP + C1) * 4),
        interpret=_interpret(),
    )(da1, y1, m1, r1, x4f, keep, wp, b0t[None, :], w1r.T, wp.T)
    return (dx4, dwp.astype(wp.dtype), db0[0].astype(b0t.dtype),
            dw1.astype(w1r.dtype), db1[0].astype(w1r.dtype))


_stage_a.defvjp(_stage_a_fwd, _stage_a_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _stage_b(p2P, w2r, b2, w3, b3, wo9, Wv):
    return _stage_b_fwd(p2P, w2r, b2, w3, b3, wo9, Wv)[0]


def _stage_b_fwd(p2P, w2r, b2, w3, b3, wo9, Wv):
    B, Hp, Wt, CPP = p2P.shape
    C1 = CPP // 4
    C2, C3 = w2r.shape[1], w3.shape[-1]
    nb = _vmem_bytes(C1 // 2, Hp, Wt, 0)
    y2, m2, r2, y3, m3, r3, pred = pl.pallas_call(
        functools.partial(_stage_b_kernel, Hp, Wt, Wv, C1, C2, C3),
        grid=(B,),
        in_specs=[_img_spec(Hp, Wt, CPP), _full_spec(CPP, C2),
                  _full_spec(1, C2), _full_spec(3, 3 * C2, C3),
                  _full_spec(1, C3), _full_spec(9, C3)],
        out_specs=[_img_spec(Hp, Wt, C2), _chan_spec(C2), _chan_spec(C2),
                   _img_spec(Hp, Wt, C3), _chan_spec(C3), _chan_spec(C3),
                   _img_spec(Hp, Wt)],
        out_shape=[jax.ShapeDtypeStruct((B, Hp, Wt, C2), p2P.dtype),
                   jax.ShapeDtypeStruct((B, 1, C2), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, C2), jnp.float32),
                   jax.ShapeDtypeStruct((B, Hp, Wt, C3), p2P.dtype),
                   jax.ShapeDtypeStruct((B, 1, C3), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, C3), jnp.float32),
                   jax.ShapeDtypeStruct((B, Hp, Wt), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((Hp + 2, Wt, 3 * C2), p2P.dtype)],
        compiler_params=_params(nb),
        interpret=_interpret(),
    )(p2P, w2r, b2[None, :], w3.reshape(3, 3 * C2, C3), b3[None, :], wo9)
    return pred, (p2P, w2r, w3, wo9, y2, m2, r2, y3, m3, r3)


def _stage_b_bwd(Wv, res, dpred):
    p2P, w2r, w3, wo9, y2, m2, r2, y3, m3, r3 = res
    B, Hp, Wt, CPP = p2P.shape
    C1 = CPP // 4
    C2, C3 = w2r.shape[1], w3.shape[-1]
    w3f = jnp.flip(w3, (0, 1)).transpose(0, 1, 3, 2).reshape(3, 3 * C3, C2)
    dy3, db3, dwo = pl.pallas_call(
        functools.partial(_stage_b_bwd1_kernel, Hp, Wt, Wv, C3),
        grid=(B,),
        in_specs=[_img_spec(Hp, Wt), _img_spec(Hp, Wt, C3),
                  _chan_spec(C3), _chan_spec(C3), _full_spec(9, C3)],
        out_specs=[_img_spec(Hp, Wt, C3), _full_spec(1, C3),
                   _full_spec(9, C3)],
        out_shape=[jax.ShapeDtypeStruct((B, Hp, Wt, C3), p2P.dtype),
                   jax.ShapeDtypeStruct((1, C3), jnp.float32),
                   jax.ShapeDtypeStruct((9, C3), jnp.float32)],
        compiler_params=_params(8 * Hp * Wt * C3 * 4),
        interpret=_interpret(),
    )(dpred, y3, m3, r3, wo9)
    dp2, dw2, db2, dw3 = pl.pallas_call(
        functools.partial(_stage_b_bwd2_kernel, Hp, Wt, Wv, C1, C2, C3),
        grid=(B,),
        in_specs=[_img_spec(Hp, Wt, C3), _img_spec(Hp, Wt, CPP),
                  _img_spec(Hp, Wt, C2), _chan_spec(C2), _chan_spec(C2),
                  _full_spec(C2, CPP), _full_spec(3, 3 * C3, C2)],
        out_specs=[_img_spec(Hp, Wt, CPP), _full_spec(CPP, C2),
                   _full_spec(1, C2), _full_spec(3, 3 * C2, C3)],
        out_shape=[jax.ShapeDtypeStruct((B, Hp, Wt, CPP), p2P.dtype),
                   jax.ShapeDtypeStruct((CPP, C2), jnp.float32),
                   jax.ShapeDtypeStruct((1, C2), jnp.float32),
                   jax.ShapeDtypeStruct((3, 3 * C2, C3), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((Hp + 2, Wt, 3 * C2), p2P.dtype),
                        pltpu.VMEM((Hp + 2, Wt, 3 * C3), p2P.dtype)],
        compiler_params=_params(_vmem_bytes(C1 // 2, Hp, Wt, 0)),
        interpret=_interpret(),
    )(dy3, p2P, y2, m2, r2, w2r.T, w3f)
    return (dp2, dw2.astype(w2r.dtype), db2[0].astype(w2r.dtype),
            dw3.reshape(3, 3, C2, C3).astype(w3.dtype),
            db3[0].astype(w3.dtype), dwo.astype(wo9.dtype))


_stage_b.defvjp(_stage_b_fwd, _stage_b_bwd)


# ---------------------------------------------------------------------------
# public entry: the whole discriminator apply
# ---------------------------------------------------------------------------

def disc_fused_apply(x, w0, b0, w1, b1, w2, b2, w3, b3, wo, bo):
    """PatchGAN forward at ds_kw=2/kw=3/n_layers=3/instance-norm, as two
    resident Pallas kernels per direction (module docstring). The glue
    (input s2d packing, the inter-stage repack, output slice) is plain
    jnp, autodiffed by XLA; each stage carries its own custom VJP.
    Reference: ``NLayerDiscriminator.py:30-77``."""
    import numpy as np

    from ..layers import space_to_depth
    from ..packed_shell import repack_pairs

    dt = x.dtype
    B = x.shape[0]
    ci = x.shape[-1]
    ngf = w0.shape[-1]
    # stem packing (packed_shell.disc_stem_packed's Wp, flattened)
    xp = jnp.pad(x, [(0, 0), (3, 1), (3, 1), (0, 0)])
    x4 = space_to_depth(xp, (4, 4))
    Hc, Wc = x4.shape[1], x4.shape[2]
    M = np.zeros((4, 2, 2), np.float32)
    for u in range(2):
        for k in range(2):
            M[2 * u + k, u, k] = 1.0
    Mj = jnp.asarray(M)
    Wp = jnp.einsum("puk,qvl,klio->pqiuvo", Mj, Mj, w0.astype(jnp.float32))
    Wp = Wp.reshape(16 * ci, 4 * ngf).astype(dt)
    b0t = jnp.tile(b0, 4).astype(dt)

    a1 = _stage_a(x4.reshape(B, Hc * Wc, 16 * ci), Wp, b0t,
                  w1.reshape(4 * ngf, 2 * ngf).astype(dt), b1.astype(dt), Wc)
    p2 = repack_pairs(a1.reshape(B, Hc, Wc, 2 * ngf))
    Wq = p2.shape[2]
    Wt = _ceil16(Wq)
    p2P = jnp.pad(p2, [(0, 0), (0, 0), (0, Wt - Wq), (0, 0)])

    C2 = w2.shape[-1]
    pred = _stage_b(p2P, w2.reshape(8 * ngf, C2).astype(dt), b2.astype(dt),
                    w3.astype(dt), b3.astype(dt),
                    wo.reshape(9, wo.shape[2]).astype(dt), Wq)
    return pred[:, :, :Wq, None].astype(dt) + bo.astype(dt)
