"""Pallas TPU megakernels: the packed ResNet-generator shell's hot
boundaries as resident kernels (nn/packed_shell.py, reference
``ResNet.py:51-117``).

Measured at the production 3x512^2 bf16 workload the packed shell pays
8.2 ms (down path) + 9.8 ms (up path + head) per apply fwd+bwd against a
~2 ms compute+traffic floor (scripts/perf_shell_now.py) — the cost is
the ~10 kernel boundaries per direction, not the math (the diagnosis the
resident resblock backward and the fused discriminator confirmed:
step-level wins come from REMOVING boundaries, docs/PERFORMANCE.md).

Three stages run as one resident kernel each (grid = one step per
image), with instance-norm stats computed in-kernel by slab fori loops:

  D1  stem GEMM (im2col'd packed input) -> IN (phase-fold 4) -> relu ->
      down_0 2x2-tap conv (pad lo)                 -> y1 (fine Hc grid)
  D2  IN -> relu -> s2d (in-kernel phase extract) ->
      down_1 2x2-tap conv (pad lo) -> IN -> relu   -> a2 (blocks input)
  U1  up_0 subpixel 2x2-tap conv (pad hi) -> IN (phase-fold 4) -> relu
      -> d2s (in-kernel interleave)                -> a3 (fine Hc grid)

(up_1 + its output IN stay on the fconv/instance_norm route — that
stage's in+out images alone exceed the VMEM budget below.)

VMEM discipline (v5e ~96 MB scoped ceiling through the relay): Mosaic
DOUBLE-BUFFERS every grid-varying in/out block, so per-image budgets
count blocks twice; big intermediates therefore live in single-buffered
scratch or are RECOMPUTED in the backward (stem/taps are a few GF —
noise next to the boundary costs they remove). Custom-VJP residuals are
only the stage inputs (already in HBM) plus the fp32 stats.

s2d/d2s inside kernels use reshape + phase indexing and stack+reshape
interleaves (strided ``lax.slice`` does not lower in Mosaic; both
verified on v5e).

Exactness: same formulas and rounding points as the packed XLA route —
bf16 tap GEMMs with fp32 accumulation, biases added in the activation
dtype AFTER conv rounding (the module convention) except where the
fconv stage they replace adds fp32, IN stats in fp32 from the
bf16-rounded conv outputs (biased variance, ``rsqrt(max(var,0)+eps)``),
relu on fp32 normalized values (``yhat > 0`` backward gating —
instance_norm._bwd_* convention), phase-major group folding. Only fp32
summation order differs. Parity- and gradient-parity-tested against the
packed composition in tests/nn/test_shell_fused.py.

Reference: ``ResNet.py:51-117`` (stem/down/up shell).
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
# scoped-VMEM plan: 2x every grid-varying block + scratches + slab fp32
# temporaries must stay under the chip's ~96 MB ceiling
_VMEM_PLAN = 92 * 1024 * 1024


def _pick_slab(H: int) -> int:
    for sh in (16, 8, 4):
        if H % sh == 0:
            return sh
    return H


def shell_fused_ok(x: Array, ngf: int) -> bool:
    """Gate for the megakernel shell stages. ``x``: the FINE model input
    (B, H, W, ci). Production family: H, W divisible by 8, per-kernel
    2x-block+scratch plans inside VMEM, bf16 on TPU
    (RAYGUN_FORCE_SHELL_FUSED=1 for interpret-mode tests)."""
    if os.environ.get("RAYGUN_DISABLE_SHELL_FUSED"):
        return False
    if x.ndim != 4:
        return False
    B, H, W, ci = x.shape
    if H % 8 or W % 8 or H < 32 or W < 32:
        return False
    if ci > 2:  # stem im2col K0 = 64*ci; keep K lane-bounded
        return False
    Hc, Wc = H // 2, W // 2
    Hq, Wq = Hc // 2, Wc // 2
    C0, C1, C2 = 4 * ngf, 2 * ngf, 4 * ngf
    K0 = 16 * 4 * ci
    # the heaviest plans (bytes): blocks x2 + scratch
    d1f = 2 * Hc * Wc * (K0 + C1) * 2
    d2f = 2 * (Hc * Wc * C1 + Hq * Wq * C2) * 2 \
        + (Hc + 2) * (Wc + 2) * C1 * 2 + Hq * Wq * C2 * 2
    d1b = 2 * Hc * Wc * (C1 + 2 * K0) * 2
    d2b1 = 2 * (Hc * Wc * C1 + 2 * Hq * Wq * C2) * 2 \
        + (Hc + 2) * (Wc + 2) * C1 * 2
    d2b2 = 2 * (Hq * Wq * C2 + (Hc + 2) * (Wc + 2) * C1) * 2
    u1f = 2 * (Hq * Wq * C2 + Hc * Wc * C1) * 2 + Hq * Wq * 4 * C1 * 2
    u1b = 2 * (Hc * Wc * C1 + 2 * Hq * Wq * C2) * 2 + Hq * Wq * 4 * C1 * 2
    if max(d1f, d2f, d1b, d2b1, d2b2, u1f, u1b) \
            + 10 * 1024 * 1024 > _VMEM_PLAN:
        return False
    if os.environ.get("RAYGUN_FORCE_SHELL_FUSED"):
        return True
    if x.dtype != jnp.bfloat16:
        return False
    if ngf % 64:  # C1 = 2*ngf must be lane-aligned for the tap stacks
        return False
    if B * H * W * ngf < (1 << 21):
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def stem_im2col(x: Array) -> Array:
    """Differentiable XLA glue: reflect-pad(3) + s2d(2x2) + 4x4-tap
    im2col of the packed stem input — (B, H, W, ci) ->
    (B, H/2, W/2, 16*4*ci), channel order (ty, tx, c_packed) row-major
    matching ``pack_conv_kernel_io(w, (2,2), (2,2), (1,1), (0,0))``
    reshaped to (16*4*ci, 4*ngf). The stem GEMM inside d1_fused then
    reads one flat K dim (the disc stage-A pattern)."""
    from ..layers import pad_spatial, space_to_depth

    Hc, Wc = x.shape[1] // 2, x.shape[2] // 2
    xpad = pad_spatial(x, [(3, 3)] * 2, "reflect")
    xp = space_to_depth(xpad, (2, 2))
    cols = [xp[:, ty:ty + Hc, tx:tx + Wc, :]
            for ty in range(4) for tx in range(4)]
    return jnp.concatenate(cols, axis=-1)


# ---------------------------------------------------------------------------
# in-kernel helpers (stats scratch rows: 0 mean, 1 rstd, 2 mg, 3 mgy —
# always TILED to the full packed channel count)
# ---------------------------------------------------------------------------

def _fold_rows(st_ref, row, vec, C, f):
    """Fold a phase-major (f*C,) fp32 vector across its f groups, store
    TILED back to st_ref[row]. Lane slices + static stores (Mosaic
    rejects 1D lane reshapes)."""
    fs = jnp.zeros((C,), jnp.float32)
    for u in range(f):
        fs = fs + jax.lax.slice(vec, (u * C,), ((u + 1) * C,))
    for u in range(f):
        st_ref[row, u * C:(u + 1) * C] = fs


def _stats_from_sums(st_ref, ssum, ssq, n, C, f):
    _fold_rows(st_ref, 0, ssum, C, f)
    _fold_rows(st_ref, 1, ssq, C, f)
    mean = st_ref[0, :] / n
    var = st_ref[1, :] / n - mean * mean
    rstd = jax.lax.rsqrt(jnp.maximum(var, 0.0) + _EPS)
    st_ref[0, :] = mean
    st_ref[1, :] = rstd


def _norm_relu(blk32, st_ref, dt):
    yhat = (blk32 - st_ref[0, :][None, None, :]) * \
        st_ref[1, :][None, None, :]
    return jnp.maximum(yhat, 0.0).astype(dt)


def _in_bwd_slab(yb32, gb32, st_ref, dt):
    """dx slab of relu∘IN: r*(gated(g) - mg - yhat*mgy)."""
    mean = st_ref[0, :][None, None, :]
    rstd = st_ref[1, :][None, None, :]
    mg = st_ref[2, :][None, None, :]
    mgy = st_ref[3, :][None, None, :]
    yhat = (yb32 - mean) * rstd
    g = jnp.where(yhat > 0, gb32, 0.0)
    return (rstd * (g - mg - yhat * mgy)).astype(dt)


def _rows_lo(read, i, SH):
    """Rows [i*SH-1, i*SH+SH): aligned main + 1-row lo edge (clamped;
    junk marked virtual at i == 0 — the fconv halo pattern)."""
    main = read(i * SH, SH)
    edge = read(jnp.maximum(i * SH - 1, 0), 1)
    rows = jnp.concatenate([edge, main], axis=0)
    virt = (jax.lax.broadcasted_iota(jnp.int32, rows.shape, 0) == 0) & (
        i == 0)
    return rows, virt


def _rows_hi(read, i, SH, H):
    """Rows [i*SH, i*SH+SH]: aligned main + 1-row hi edge (clamped;
    junk virtual at the final slab)."""
    n_slabs = H // SH
    main = read(i * SH, SH)
    edge = read(jnp.minimum(i * SH + SH, H - 1), 1)
    rows = jnp.concatenate([main, edge], axis=0)
    virt = (jax.lax.broadcasted_iota(jnp.int32, rows.shape, 0) == SH) & (
        i == n_slabs - 1)
    return rows, virt


def _rows_both(read, i, SH, H):
    """Rows [i*SH-1, i*SH+SH]: aligned main + lo and hi edges (junk
    edges virtual at the first/last slab). Returns (rows, virt)."""
    n_slabs = H // SH
    main = read(i * SH, SH)
    lo = read(jnp.maximum(i * SH - 1, 0), 1)
    hi = read(jnp.minimum(i * SH + SH, H - 1), 1)
    rows = jnp.concatenate([lo, main, hi], axis=0)
    ri = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 0)
    virt = ((ri == 0) & (i == 0)) | ((ri == SH + 1) & (i == n_slabs - 1))
    return rows, virt


def _ref_rows(ref):
    return lambda s, n: ref[0, pl.ds(s, n)]


def _scr_rows(ref):
    return lambda s, n: ref[pl.ds(s, n)]


def _zero_virt(rows, virt, dt):
    return jnp.where(virt, jnp.zeros((), dt), rows)


def _pad_col(rows, side, dt):
    R, W, C = rows.shape
    zc = jnp.zeros((R, 1, C), dt)
    if side == "lo":
        return jnp.concatenate([zc, rows], axis=1)
    if side == "hi":
        return jnp.concatenate([rows, zc], axis=1)
    return jnp.concatenate([zc, rows, zc], axis=1)  # both


def _tap_conv2(ap, apk_ref, w_ref, SH, W, Cin):
    """2x2-tap conv on an assembled (SH+1, W+1, Cin) window: x-taps
    stacked into scratch lanes [0, 2*Cin), 2 ty-GEMMs, fp32 acc.
    ``w_ref``: (2, 2*Cin, Cout)."""
    for tx in range(2):
        apk_ref[:, 0:W, tx * Cin:(tx + 1) * Cin] = ap[:, tx:tx + W, :]
    apk = apk_ref[...]
    acc = jnp.zeros((SH * W, w_ref.shape[-1]), jnp.float32)
    for ty in range(2):
        a = apk[ty:ty + SH, 0:W, 0:2 * Cin].reshape(SH * W, 2 * Cin)
        acc = acc + jax.lax.dot_general(
            a, w_ref[ty], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return acc


def _interleave(p00, p01, p10, p11, R, Wq, C):
    """Phase planes (R, Wq, C) -> fine (2R, 2Wq, C) (stack+reshape)."""
    r0 = jnp.stack([p00, p01], axis=2).reshape(R, 2 * Wq, C)
    r1 = jnp.stack([p10, p11], axis=2).reshape(R, 2 * Wq, C)
    return jnp.stack([r0, r1], axis=1).reshape(2 * R, 2 * Wq, C)


def _img_spec(*shape):
    return pl.BlockSpec((1,) + shape, lambda b: (b,) + (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _full_spec(*shape):
    return pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _st_spec(C):
    return pl.BlockSpec((1, 2, C), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def _params():
    return pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=96 * 1024 * 1024)


def _acc(ref, val, first):
    @pl.when(first)
    def _():
        ref[...] = val

    @pl.when(jnp.logical_not(first))
    def _():
        ref[...] += val


def _flipT(w2s, Cin, Cout):
    """(2, 2*Cin, Cout) tap-stacked -> transpose-conv taps
    (2, 2*Cout, Cin): wt[ty][tx*Cout + co, ci] = w[1-ty, 1-tx, ci, co]."""
    w22 = w2s.reshape(2, 2, Cin, Cout)
    return jnp.flip(w22, (0, 1)).transpose(0, 1, 3, 2).reshape(
        2, 2 * Cout, Cin)


# ---------------------------------------------------------------------------
# D1: stem GEMM -> IN(fold 4) -> relu -> down_0 2x2-tap conv (pad lo)
# ---------------------------------------------------------------------------

def _stem_slab(xcol_read, ws_ref, bs_ref, n_rows, Wc, K0, dt):
    """Recompute a y0 row window from xcol: one flat-K GEMM + rounded
    bias add (the module convention)."""
    xb = xcol_read.reshape(n_rows * Wc, K0)
    acc = jax.lax.dot_general(
        xb, ws_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return acc.astype(dt) + bs_ref[0, :][None, :]


def _d1_kernel(Hc, Wc, K0, C0, C1, SH, xcol_ref, ws_ref, bs_ref, wd0_ref,
               bd0_ref, y1_ref, st_out_ref, st_ref, apk_ref):
    dt = xcol_ref.dtype
    n_slabs = Hc // SH

    def stem_body(i, carry):
        s, sq = carry
        yb = _stem_slab(xcol_ref[0, pl.ds(i * SH, SH)], ws_ref, bs_ref,
                        SH, Wc, K0, dt)
        yf = yb.astype(jnp.float32)
        return (s + jnp.sum(yf, axis=0), sq + jnp.sum(yf * yf, axis=0))

    z = jnp.zeros((C0,), jnp.float32)
    s, sq = jax.lax.fori_loop(0, n_slabs, stem_body, (z, z))
    _stats_from_sums(st_ref, s, sq, jnp.float32(Hc * Wc * 4), C0 // 4, 4)
    st_out_ref[0, 0, :] = st_ref[0, :]
    st_out_ref[0, 1, :] = st_ref[1, :]

    def y0_rows(s_, nr):
        return _stem_slab(xcol_ref[0, pl.ds(s_, nr)], ws_ref, bs_ref,
                          nr, Wc, K0, dt).reshape(nr, Wc, C0)

    def down_body(i, _):
        rows, virt = _rows_lo(y0_rows, i, SH)
        a = _norm_relu(rows.astype(jnp.float32), st_ref, dt)
        a = _zero_virt(a, virt, dt)
        ap = _pad_col(a, "lo", dt)
        acc = _tap_conv2(ap, apk_ref, wd0_ref, SH, Wc, C0)
        yb = acc.astype(dt) + bd0_ref[0, :][None, :]
        y1_ref[0, pl.ds(i * SH, SH)] = yb.reshape(SH, Wc, C1)
        return 0

    jax.lax.fori_loop(0, n_slabs, down_body, 0)


@jax.custom_vjp
def d1_fused(xcol, ws, bs_t, wd0s, bd0):
    """y1 = down_0(pad_lo(relu(IN_fold4(stem(xcol))))). ``xcol``:
    im2col'd packed stem input (B, Hc, Wc, 16*4*ci); ``ws``:
    (16*4*ci, 4*ngf) flattened packed stem weights; ``wd0s``:
    (2, 2*4ngf, 2ngf) tap-stacked packed down_0."""
    return _d1_fwd(xcol, ws, bs_t, wd0s, bd0)[0]


def _d1_fwd(xcol, ws, bs_t, wd0s, bd0):
    B, Hc, Wc, K0 = xcol.shape
    C0 = ws.shape[1]
    C1 = wd0s.shape[-1]
    SH = _pick_slab(Hc)
    y1, st0 = pl.pallas_call(
        functools.partial(_d1_kernel, Hc, Wc, K0, C0, C1, SH),
        grid=(B,),
        in_specs=[_img_spec(Hc, Wc, K0), _full_spec(K0, C0),
                  _full_spec(1, C0), _full_spec(2, 2 * C0, C1),
                  _full_spec(1, C1)],
        out_specs=[_img_spec(Hc, Wc, C1), _st_spec(C0)],
        out_shape=[jax.ShapeDtypeStruct((B, Hc, Wc, C1), xcol.dtype),
                   jax.ShapeDtypeStruct((B, 2, C0), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((4, C0), jnp.float32),
                        pltpu.VMEM((SH + 1, Wc, 2 * C0), xcol.dtype)],
        compiler_params=_params(),
        interpret=_interpret(),
    )(xcol, ws, bs_t[None, :], wd0s, bd0[None, :])
    return y1, (xcol, ws, bs_t, wd0s, st0)


def _d1_bwd(res, dy1):
    """Composition backward: the resident variant's (dy1 + xcol + dxcol)
    blocks double-buffer past the VMEM ceiling (module docstring), so the
    backward reuses the PROVEN fconv/instance-norm kernels — transpose
    conv (_k2 with flipped taps), wgrad (_k2_wgrad with the IN prologue),
    grouped IN backward (_bwd_dx), and XLA GEMMs for the cheap stem."""
    from .fconv import _k2, _k2_wgrad
    from .instance_norm import _as3d, _bwd_dx

    xcol, ws, bs_t, wd0s, st0 = res
    B, Hc, Wc, K0 = xcol.shape
    C0 = ws.shape[1]
    C1 = wd0s.shape[-1]
    dt = xcol.dtype
    ngf = C0 // 4
    # da0: transpose of the pad-lo 2x2 conv = pad-hi with flipped taps
    wt = _flipT(wd0s, C0, C1)
    da0 = _k2(dy1, wt, None, "hi", out_dtype=dt)
    # y0 recomputed (one XLA GEMM + rounded bias add, ~0.5 GF/image)
    y0 = jnp.einsum("bhwk,kc->bhwc", xcol, ws,
                    preferred_element_type=jnp.float32).astype(dt) \
        + bs_t.astype(dt)
    mt = st0[:, 0, :]
    rt = st0[:, 1, :]
    dw0, db0 = _k2_wgrad(dy1, y0, (mt, rt), "lo", 0.0)
    mean = st0[:, 0, 0:ngf]
    rstd = st0[:, 1, 0:ngf]
    dy0 = _bwd_dx(_EPS, 0.0, _as3d(y0), mean, rstd, _as3d(da0),
                  group=4).reshape(y0.shape)
    dxcol = jnp.einsum("bhwc,kc->bhwk", dy0, ws,
                       preferred_element_type=jnp.float32).astype(dt)
    dws = jnp.einsum("bhwk,bhwc->kc", xcol, dy0,
                     preferred_element_type=jnp.float32)
    dbs = jnp.sum(dy0.astype(jnp.float32), axis=(0, 1, 2))
    return (dxcol, dws.astype(ws.dtype), dbs.astype(ws.dtype),
            dw0.astype(wd0s.dtype), db0.astype(wd0s.dtype))


d1_fused.defvjp(lambda *a: _d1_fwd(*a), _d1_bwd)


# ---------------------------------------------------------------------------
# D2: IN -> relu -> s2d -> down_1 2x2-tap conv (pad lo) -> IN -> relu
# ---------------------------------------------------------------------------

def _build_a1pad(y1_ref, apad_ref, Hc, Wc, C1, SH, st_ref, dt):
    """apad <- zero-bordered relu(IN(y1)) (down_1's padding domain)."""
    zrow = jnp.zeros((1, Wc + 2, C1), dt)
    apad_ref[0:1] = zrow
    apad_ref[Hc + 1:Hc + 2] = zrow

    def body(i, _):
        blk = y1_ref[0, pl.ds(i * SH, SH)].astype(jnp.float32)
        a = _norm_relu(blk, st_ref, dt)
        zc = jnp.zeros((SH, 1, C1), dt)
        apad_ref[pl.ds(1 + i * SH, SH)] = jnp.concatenate(
            [zc, a, zc], axis=1)
        return 0

    jax.lax.fori_loop(0, Hc // SH, body, 0)


def _xq_window(apad_ref, i, SHq, Wq1, C1, apk_ref):
    """x-tap-stack xq rows [i*SHq, i*SHq+SHq+1) into apk lanes
    [0, 8*C1), where xq = phase-extracted apad (in-kernel s2d): xq[r, j,
    (u,v)c] = apad[2r+u, 2j+v, c]."""
    rows = apad_ref[pl.ds(2 * i * SHq, 2 * (SHq + 1))]
    rs = rows.reshape(SHq + 1, 2, Wq1, 2, C1)
    for tx in range(2):
        for u in range(2):
            for v in range(2):
                apk_ref[:, 0:Wq1 - 1,
                        tx * 4 * C1 + (2 * u + v) * C1:
                        tx * 4 * C1 + (2 * u + v + 1) * C1] = \
                    rs[:, u, tx:tx + Wq1 - 1, v, :]


def _d2_conv_slab(apad_ref, i, SHq, Wq, C1, C2, wd1_ref, bd1_ref, apk_ref,
                  dt):
    """y2 rows [i*SHq, i*SHq+SHq): down_1 tap GEMMs from the apad
    domain, rounded + dtype bias add."""
    _xq_window(apad_ref, i, SHq, Wq + 1, C1, apk_ref)
    apk = apk_ref[...]
    acc = jnp.zeros((SHq * Wq, C2), jnp.float32)
    for ty in range(2):
        a = apk[ty:ty + SHq, 0:Wq, 0:8 * C1].reshape(SHq * Wq, 8 * C1)
        acc = acc + jax.lax.dot_general(
            a, wd1_ref[ty], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return acc.astype(dt) + bd1_ref[0, :][None, :]


def _d2_kernel(Hc, Wc, C1, C2, SH, SHq, y1_ref, wd1_ref, bd1_ref, a2_ref,
               st1_out_ref, st2_out_ref, st1_ref, st2_ref, apad_ref,
               apk_ref):
    dt = y1_ref.dtype
    Hq, Wq = Hc // 2, Wc // 2
    nq = Hq // SHq

    def s_body(i, carry):
        s, sq = carry
        blk = y1_ref[0, pl.ds(i * SH, SH)].astype(jnp.float32)
        return (s + jnp.sum(blk, axis=(0, 1)),
                sq + jnp.sum(blk * blk, axis=(0, 1)))

    z1 = jnp.zeros((C1,), jnp.float32)
    s, sq = jax.lax.fori_loop(0, Hc // SH, s_body, (z1, z1))
    _stats_from_sums(st1_ref, s, sq, jnp.float32(Hc * Wc), C1, 1)
    st1_out_ref[0, 0, :] = st1_ref[0, :]
    st1_out_ref[0, 1, :] = st1_ref[1, :]

    _build_a1pad(y1_ref, apad_ref, Hc, Wc, C1, SH, st1_ref, dt)

    def conv_body(i, carry):
        s, sq_ = carry
        yb = _d2_conv_slab(apad_ref, i, SHq, Wq, C1, C2, wd1_ref,
                           bd1_ref, apk_ref, dt)
        yf = yb.astype(jnp.float32)
        return (s + jnp.sum(yf, axis=0), sq_ + jnp.sum(yf * yf, axis=0))

    z2 = jnp.zeros((C2,), jnp.float32)
    s2, sq2 = jax.lax.fori_loop(0, nq, conv_body, (z2, z2))
    _stats_from_sums(st2_ref, s2, sq2, jnp.float32(Hq * Wq), C2, 1)
    st2_out_ref[0, 0, :] = st2_ref[0, :]
    st2_out_ref[0, 1, :] = st2_ref[1, :]

    def out_body(i, _):
        # y2 recomputed (one extra tap-GEMM pass, ~10 GF/image) — an
        # 8.4 MB resident would tip the 2x-block VMEM plan at 512^2
        blk = _d2_conv_slab(apad_ref, i, SHq, Wq, C1, C2, wd1_ref,
                            bd1_ref, apk_ref, dt).astype(
                                jnp.float32).reshape(SHq, Wq, C2)
        a2_ref[0, pl.ds(i * SHq, SHq)] = _norm_relu(blk, st2_ref, dt)
        return 0

    jax.lax.fori_loop(0, nq, out_body, 0)


@jax.custom_vjp
def d2_fused(y1, wd1s, bd1):
    """a2 = relu(IN(down_1(pad_lo(s2d(relu(IN(y1))))))). ``wd1s``:
    (2, 2*4*C1, C2) tap-stacked packed down_1 weights (fine origin -1:
    pack starts (0, 0))."""
    return _d2_fwd(y1, wd1s, bd1)[0]


def _d2_fwd(y1, wd1s, bd1):
    B, Hc, Wc, C1 = y1.shape
    C2 = wd1s.shape[-1]
    Hq, Wq = Hc // 2, Wc // 2
    SH = _pick_slab(Hc)
    SHq = min(_pick_slab(Hq), 8)
    a2, st1, st2 = pl.pallas_call(
        functools.partial(_d2_kernel, Hc, Wc, C1, C2, SH, SHq),
        grid=(B,),
        in_specs=[_img_spec(Hc, Wc, C1), _full_spec(2, 8 * C1, C2),
                  _full_spec(1, C2)],
        out_specs=[_img_spec(Hq, Wq, C2), _st_spec(C1), _st_spec(C2)],
        out_shape=[jax.ShapeDtypeStruct((B, Hq, Wq, C2), y1.dtype),
                   jax.ShapeDtypeStruct((B, 2, C1), jnp.float32),
                   jax.ShapeDtypeStruct((B, 2, C2), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((4, C1), jnp.float32),
            pltpu.VMEM((4, C2), jnp.float32),
            pltpu.VMEM((Hc + 2, Wc + 2, C1), y1.dtype),
            pltpu.VMEM((SHq + 1, Wq + 1, 8 * C1), y1.dtype),
        ],
        compiler_params=_params(),
        interpret=_interpret(),
    )(y1, wd1s, bd1[None, :])
    return a2, (y1, wd1s, bd1, st1, st2)


def _d2_bwd(res, da2):
    """Composition backward (see _d1_bwd): the resident two-kernel
    variant fit in isolation but Mosaic's in-scan block buffering pushed
    it 14+ MB past the VMEM ceiling inside the scanned train step (git
    history has the kernels). XLA convs + the grouped instance-norm
    backward reproduce the same math."""
    from ..layers import depth_to_space, space_to_depth
    from .instance_norm import _as3d, _bwd_dx

    y1, wd1s, bd1, st1, st2 = res
    B, Hc, Wc, C1 = y1.shape
    C2 = wd1s.shape[-1]
    Hq, Wq = Hc // 2, Wc // 2
    dt = y1.dtype
    w22 = wd1s.reshape(2, 2, 4 * C1, C2)

    mean1 = st1[:, 0, :][:, None, None, :]
    rstd1 = st1[:, 1, :][:, None, None, :]
    a1 = jnp.maximum(
        (y1.astype(jnp.float32) - mean1) * rstd1, 0.0).astype(dt)
    a1pad = jnp.pad(a1, [(0, 0), (1, 1), (1, 1), (0, 0)])
    xq = space_to_depth(a1pad, (2, 2))  # (B, Hq+1, Wq+1, 4C1)

    from ..packed_shell import _conv

    y2 = _conv(xq, w22.astype(dt), (1, 1)) + bd1.astype(dt)
    dy2 = _bwd_dx(_EPS, 0.0, _as3d(y2), st2[:, 0, :], st2[:, 1, :],
                  _as3d(da2)).reshape(y2.shape)

    dw1 = jnp.stack([
        jnp.concatenate([
            jnp.einsum("bhwk,bhwc->kc",
                       xq[:, ty:ty + Hq, tx:tx + Wq, :], dy2,
                       preferred_element_type=jnp.float32)
            for tx in range(2)], axis=0)
        for ty in range(2)], axis=0)
    db1 = jnp.sum(dy2.astype(jnp.float32), axis=(0, 1, 2))

    wflip = jnp.flip(w22, (0, 1)).transpose(0, 1, 3, 2)
    dxq = _conv(jnp.pad(dy2, [(0, 0), (1, 1), (1, 1), (0, 0)]),
                wflip.astype(dt), (1, 1))
    da1pad = depth_to_space(dxq, (2, 2))
    da1 = da1pad[:, 1:Hc + 1, 1:Wc + 1, :]
    dy1 = _bwd_dx(_EPS, 0.0, _as3d(y1), st1[:, 0, :], st1[:, 1, :],
                  _as3d(da1)).reshape(y1.shape)
    return (dy1, dw1.astype(wd1s.dtype), db1.astype(wd1s.dtype))


d2_fused.defvjp(lambda *a: _d2_fwd(*a), _d2_bwd)


# ---------------------------------------------------------------------------
# U1: up_0 subpixel 2x2-tap conv (pad hi) -> IN(fold 4) -> relu -> d2s
# ---------------------------------------------------------------------------

def _u1_conv_window(h_read, i, SH, Hq, Wq, C2, wu0_ref, bu0_ref, apk_ref,
                    dt, lo_halo=False):
    """y3p rows: the subpixel up_0 tap GEMMs over a pad-hi window of h.
    ``lo_halo=True`` computes rows [i*SH-1, i*SH+SH) instead (for the
    transpose passes); returns (rows, n_rows)."""
    if lo_halo:
        # rows [i*SH-1, i*SH+SH): window needs h rows [i*SH-1, i*SH+SH]
        rows, virt = _rows_both(h_read, i, SH, Hq)
    else:
        rows, virt = _rows_hi(h_read, i, SH, Hq)
    rows = _zero_virt(rows, virt, dt)
    ap = _pad_col(rows, "hi", dt)
    R = rows.shape[0] - 1
    for tx in range(2):
        apk_ref[0:R + 1, 0:Wq, tx * C2:(tx + 1) * C2] = \
            ap[0:R + 1, tx:tx + Wq, :]
    apk = apk_ref[...]
    acc = jnp.zeros((R * Wq, wu0_ref.shape[-1]), jnp.float32)
    for ty in range(2):
        a = apk[ty:ty + R, 0:Wq, 0:2 * C2].reshape(R * Wq, 2 * C2)
        acc = acc + jax.lax.dot_general(
            a, wu0_ref[ty], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    yb = acc.astype(dt) + bu0_ref[0, :][None, :]
    return yb.reshape(R, Wq, wu0_ref.shape[-1])


def _u1_kernel(Hq, Wq, C2, C1, SH, h_ref, wu0_ref, bu0_ref, a3_ref,
               st_out_ref, y3p_scr, st_ref, apk_ref):
    dt = h_ref.dtype
    C4 = 4 * C1
    n_slabs = Hq // SH

    def conv_body(i, carry):
        s, sq = carry
        yb = _u1_conv_window(_ref_rows(h_ref), i, SH, Hq, Wq, C2,
                             wu0_ref, bu0_ref, apk_ref, dt)
        y3p_scr[pl.ds(i * SH, SH)] = yb
        yf = yb.astype(jnp.float32)
        return (s + jnp.sum(yf, axis=(0, 1)),
                sq + jnp.sum(yf * yf, axis=(0, 1)))

    z = jnp.zeros((C4,), jnp.float32)
    s, sq = jax.lax.fori_loop(0, n_slabs, conv_body, (z, z))
    _stats_from_sums(st_ref, s, sq, jnp.float32(Hq * Wq * 4), C1, 4)
    st_out_ref[0, 0, :] = st_ref[0, :]
    st_out_ref[0, 1, :] = st_ref[1, :]

    def out_body(i, _):
        blk = y3p_scr[pl.ds(i * SH, SH)].astype(jnp.float32)
        a = _norm_relu(blk, st_ref, dt)
        fine = _interleave(
            a[:, :, 0 * C1:1 * C1], a[:, :, 1 * C1:2 * C1],
            a[:, :, 2 * C1:3 * C1], a[:, :, 3 * C1:4 * C1], SH, Wq, C1)
        a3_ref[0, pl.ds(2 * i * SH, 2 * SH)] = fine
        return 0

    jax.lax.fori_loop(0, n_slabs, out_body, 0)


def _gq_slab(da3_ref, s, n_rows, Wq, C1):
    """Phases of the fine cotangent rows [2*s, 2*(s+n_rows)) — the s2d
    of da3 rows for packed rows [s, s+n_rows)."""
    fine = da3_ref[0, pl.ds(2 * s, 2 * n_rows)]
    rs = fine.reshape(n_rows, 2, Wq, 2, C1)
    parts = []
    for u in range(2):
        for v in range(2):
            parts.append(rs[:, u, :, v, :])
    return jnp.concatenate(parts, axis=-1)


@jax.custom_vjp
def u1_fused(h, wu0s, bu0_t):
    """a3 = d2s(relu(IN_fold4(up_0_subpixel(h)))). ``wu0s``:
    (2, 2*C2, 4*C1) tap-stacked subpixel up_0 weights
    (packed_shell.up1_packed_kernel layout); ``bu0_t``: tile(b, 4)."""
    return _u1_fwd(h, wu0s, bu0_t)[0]


def _u1_fwd(h, wu0s, bu0_t):
    B, Hq, Wq, C2 = h.shape
    C4 = wu0s.shape[-1]
    C1 = C4 // 4
    SH = _pick_slab(Hq)
    scr_lanes = max(2 * C2, C4)
    a3, st3 = pl.pallas_call(
        functools.partial(_u1_kernel, Hq, Wq, C2, C1, SH),
        grid=(B,),
        in_specs=[_img_spec(Hq, Wq, C2), _full_spec(2, 2 * C2, C4),
                  _full_spec(1, C4)],
        out_specs=[_img_spec(2 * Hq, 2 * Wq, C1), _st_spec(C4)],
        out_shape=[jax.ShapeDtypeStruct((B, 2 * Hq, 2 * Wq, C1), h.dtype),
                   jax.ShapeDtypeStruct((B, 2, C4), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((Hq, Wq, C4), h.dtype),
                        pltpu.VMEM((4, C4), jnp.float32),
                        pltpu.VMEM((SH + 2, Wq, scr_lanes), h.dtype)],
        compiler_params=_params(),
        interpret=_interpret(),
    )(h, wu0s, bu0_t[None, :])
    return a3, (h, wu0s, bu0_t, st3)


def _u1_bwd(res, da3):
    """Composition backward (see _d1_bwd): s2d of the fine cotangent via
    XLA, grouped IN backward, then the proven fconv transpose/wgrad
    kernels for the subpixel up_0."""
    from ..layers import space_to_depth
    from .fconv import _k2, _k2_wgrad
    from .instance_norm import _as3d, _bwd_dx

    h, wu0s, bu0_t, st3 = res
    B, Hq, Wq, C2 = h.shape
    C4 = wu0s.shape[-1]
    C1 = C4 // 4
    dt = h.dtype
    gq = space_to_depth(da3, (2, 2))  # phase-major: y3p's layout
    # y3p recomputed with the forward's exact rounding points (rounded
    # conv output, then the activation-dtype bias add)
    y3p = _k2(h, wu0s, None, "hi", out_dtype=dt) + bu0_t.astype(dt)
    mean = st3[:, 0, 0:C1]
    rstd = st3[:, 1, 0:C1]
    dy3p = _bwd_dx(_EPS, 0.0, _as3d(y3p), mean, rstd, _as3d(gq),
                   group=4).reshape(y3p.shape)
    wt = _flipT(wu0s, C2, C4)
    dh = _k2(dy3p, wt, None, "lo", out_dtype=dt)
    dw, db = _k2_wgrad(dy3p, h, None, "hi", 0.0)
    return (dh, dw.astype(wu0s.dtype), db.astype(wu0s.dtype))


u1_fused.defvjp(lambda *a: _u1_fwd(*a), _u1_bwd)


# ---------------------------------------------------------------------------
# H1: prologue relu∘IN(fold 4) -> fine reflect-pad(3) -> packed 7x7 head
# conv (reference ``ResNet.py:115-117``), the whole boundary in ONE
# resident kernel per image. The packed head is an 8x8-tap stride-4 conv
# on the pad(2)-extended coarse grid (packed_shell.head_from_packed); the
# s2d-by-4 phase regroup turns it into a 2x2-tap STRIDE-1 conv over
# (py, px, c)-stacked cells — the same _tap_conv2 GEMM shape as every
# other stage here, with K = 2*16*C4 lanes. The XLA composition pays ~5.3
# ms/apply at production 3x512^2 (scripts/perf_s3_parts.py: IN 1.34 +
# reflect-pad 1.78 + head 5.56 in isolation, 6.20 composed) because hp is
# written, read for stats, read+written by normalize, read+written by the
# pad copy and read again by the conv; here it is read ONCE from HBM.
#
# Exactness: stats in fp32 from the bf16-rounded producer (fold 4), relu
# on fp32 normalized values, conv fp32 accumulation rounded once at the
# output — the packed route's exact rounding points; only fp32 summation
# order differs (2 ty-GEMMs vs XLA's tap loop). The reflect pad
# phase-mixes ROWS per channel-phase group while instance norm scales per
# TRUE channel (identical for all 4 phases after the fold), so
# pad∘normalize == normalize∘pad exactly.
#
# Backward = the proven composition: recompute the normalized image
# (pallas normalize kernel), rebuild the padded input, then
# packed_shell._ccs_bwd (phase-regrouped dx conv + one full-lane wgrad
# GEMM), packed_reflect_pad3_T (explicit strip adds — XLA's autodiff of
# the pad scheduled a ~1.3 ms scatter chain), and the instance-norm
# backward kernels.
# ---------------------------------------------------------------------------

def h1_ok(hp: Array, w2: Array) -> bool:
    """Gate: production head family — 8x8 taps (f_out 8, co folded), 4 |
    packed extents, C4 % 128 == 0, and the resident plan inside VMEM."""
    if os.environ.get("RAYGUN_DISABLE_H1_FUSED"):
        return False
    if hp.ndim != 4 or w2.ndim != 4:
        return False
    B, Hc, Wc, C4 = hp.shape
    if w2.shape[0] != 8 or w2.shape[1] != 8 or w2.shape[2] != C4:
        return False
    if C4 % 128 or Hc % 4 or Wc % 4 or _h1_stats_slab(Hc) is None:
        return False
    Hq4 = Hc // 4
    SH = _h1_slab(Hq4)
    if SH is None:
        return False
    N = w2.shape[-1]
    plan = (
        2 * Hc * Wc * C4 * 2                    # hp block (double-buffered)
        + (4 * SH + 4) * (Wc + 4) * C4 * 2      # pb scratch
        + (SH + 1) * (Wc // 4) * 2 * 16 * C4 * 2  # apk scratch
        + 2 * 16 * C4 * N * 2                   # regrouped weights
        + SH * (Wc // 4) * N * 4                # fp32 acc
    )
    if plan + 8 * 1024 * 1024 > _VMEM_PLAN:
        return False
    if os.environ.get("RAYGUN_FORCE_SHELL_FUSED"):
        return True
    if hp.dtype != jnp.bfloat16:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _h1_slab(Hq4: int):
    # SH=8 measured a 102.2M scoped-VMEM stack inside the scanned train
    # step (6.2M over the 96M ceiling — Mosaic's in-scan block buffering
    # on top of the plan); SH=4 fits
    for sh in (4, 2):
        if Hq4 % sh == 0:
            return sh
    return None


def _h1_stats_slab(Hc: int):
    for sh in (16, 8, 4):
        if Hc % sh == 0:
            return sh
    return None


def _h1_kernel(Hc, Wc, C4, N, SH, hp_ref, w2r_ref, y_ref, st_out_ref,
               st_ref, pb_scr, apk_ref):
    dt = hp_ref.dtype
    C = C4 // 4
    Wp = Wc + 4
    Wq4 = Wc // 4  # output cols (= (Wp - 8)/4 + 1)
    Hq4 = Hc // 4
    n_bands = Hq4 // SH
    R_pad = 4 * SH + 4

    # ---- stats over the raw image (fold 4 phases) ------------------------
    SST = _h1_stats_slab(Hc)

    def stats_body(i, carry):
        s, sq = carry
        blk = hp_ref[0, pl.ds(i * SST, SST)].astype(jnp.float32)
        return (s + jnp.sum(blk, axis=(0, 1)),
                sq + jnp.sum(blk * blk, axis=(0, 1)))

    z = jnp.zeros((C4,), jnp.float32)
    s, sq = jax.lax.fori_loop(0, Hc // SST, stats_body, (z, z))
    _stats_from_sums(st_ref, s, sq, jnp.float32(Hc * Wc * 4), C, 4)
    st_out_ref[0, 0, :] = st_ref[0, :]
    st_out_ref[0, 1, :] = st_ref[1, :]

    ch = jax.lax.broadcasted_iota(jnp.int32, (1, 1, C4), 2)
    mv = ch < C4 // 2            # vy = 0 phase lanes
    mh = (ch // C) % 2 == 0      # vx = 0 phase lanes
    zero = jnp.zeros((), jnp.float32)

    def nrow(idx):
        """Normalized+relu'd hp row idx (dynamic), fp32 (1, Wc, C4)."""
        raw = hp_ref[0, pl.ds(idx, 1)].astype(jnp.float32)
        yhat = (raw - st_ref[0, :][None, None, :]) * \
            st_ref[1, :][None, None, :]
        return jnp.maximum(yhat, 0.0)

    def band_body(i, _):
        start = 4 * i * SH  # first padded row of the band
        r0, r1 = nrow(0), nrow(1)
        rn2, rn1 = nrow(Hc - 2), nrow(Hc - 1)
        m2 = jnp.where(mv, zero, r1)
        m1 = jnp.where(mv, r1, r0)
        q0 = jnp.where(mv, rn1, rn2)
        q1 = jnp.where(mv, rn2, zero)

        def row_body(r, _):
            p = start + r
            pm = jnp.clip(p - 2, 0, Hc - 1)
            row = nrow(pm)
            row = jnp.where(p == 0, m2, row)
            row = jnp.where(p == 1, m1, row)
            row = jnp.where(p == Hc + 2, q0, row)
            row = jnp.where(p == Hc + 3, q1, row)
            # width pad: two mixed cols each side (phase-swapped strips)
            c2 = jnp.where(mh, zero, row[:, 1:2, :])
            c1 = jnp.where(mh, row[:, 1:2, :], row[:, 0:1, :])
            d0 = jnp.where(mh, row[:, Wc - 1:Wc, :],
                           row[:, Wc - 2:Wc - 1, :])
            d1 = jnp.where(mh, row[:, Wc - 2:Wc - 1, :], zero)
            full = jnp.concatenate([c2, c1, row, d0, d1], axis=1)
            pb_scr[pl.ds(r, 1)] = full.astype(dt)
            return 0

        jax.lax.fori_loop(0, R_pad, row_body, 0)
        # s2d-by-4 regroup: apk[q, j, tx*16*C4 + (py*4+px)*C4 + c]
        #   = pb[4q + py, 4*(j + tx) + px, c]
        pb = pb_scr[...]
        cells = pb.reshape(SH + 1, 4, Wp // 4, 4, C4)
        for tx in range(2):
            for py in range(4):
                for px in range(4):
                    lane = tx * 16 * C4 + (py * 4 + px) * C4
                    apk_ref[:, 0:Wq4, lane:lane + C4] = \
                        cells[:, py, tx:tx + Wq4, px, :]
        apk = apk_ref[...]
        K = 2 * 16 * C4
        acc = jnp.zeros((SH * Wq4, N), jnp.float32)
        for ty in range(2):
            a = apk[ty:ty + SH, 0:Wq4, 0:K].reshape(SH * Wq4, K)
            acc = acc + jax.lax.dot_general(
                a, w2r_ref[ty], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        y_ref[0, pl.ds(i * SH, SH)] = acc.astype(dt).reshape(SH, Wq4, N)
        return 0

    jax.lax.fori_loop(0, n_bands, band_body, 0)


def _h1_regroup_w(w2: Array) -> Array:
    """(8, 8, C4, N) taps -> (2, 2*16*C4, N): tap (4*ty+py, 4*tx+px, c)
    lands at lane tx*16*C4 + (py*4+px)*C4 + c of ty-group ty (the apk
    stacking order in _h1_kernel)."""
    C4, N = w2.shape[2], w2.shape[3]
    w = w2.reshape(2, 4, 2, 4, C4, N)          # (ty, py, tx, px, c, n)
    w = w.transpose(0, 2, 1, 3, 4, 5)          # (ty, tx, py, px, c, n)
    return w.reshape(2, 2 * 16 * C4, N)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def h1_fused(hp: Array, w2: Array, channels: int) -> Array:
    """y_packed = head_conv(pad3(relu(IN_fold4(hp)))) on the f=8-packed
    output grid — bias and the final depth_to_space stay outside (tiny,
    XLA autodiff handles db). ``w2``: packed head taps (8, 8, C4, N) from
    ``pack_conv_kernel_io(w, (2,2), (8,8), (1,1), (1,1))``."""
    return _h1_fwd(hp, w2, channels)[0]


def _h1_fwd(hp, w2, channels):
    B, Hc, Wc, C4 = hp.shape
    N = w2.shape[-1]
    SH = _h1_slab(Hc // 4)
    w2r = _h1_regroup_w(w2.astype(hp.dtype))
    y, st = pl.pallas_call(
        functools.partial(_h1_kernel, Hc, Wc, C4, N, SH),
        grid=(B,),
        in_specs=[_img_spec(Hc, Wc, C4),
                  _full_spec(2, 2 * 16 * C4, N)],
        out_specs=[_img_spec(Hc // 4, Wc // 4, N), _st_spec(C4)],
        out_shape=[jax.ShapeDtypeStruct((B, Hc // 4, Wc // 4, N), hp.dtype),
                   jax.ShapeDtypeStruct((B, 2, C4), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((4, C4), jnp.float32),
            pltpu.VMEM((4 * SH + 4, Wc + 4, C4), hp.dtype),
            pltpu.VMEM((SH + 1, Wc // 4, 2 * 16 * C4), hp.dtype),
        ],
        compiler_params=_params(),
        interpret=_interpret(),
    )(hp, w2r)
    return y, (hp, w2, st)


def _h1_bwd(channels, res, dy):
    """Composition backward with the forward's exact rounding points:
    normalize recomputed by the pallas kernel from the saved fp32 stats,
    padded input rebuilt for the wgrad GEMM, then the proven pieces —
    packed_shell._ccs_bwd, packed_reflect_pad3_T, instance-norm bwd."""
    from ..packed_shell import (
        _ccs_bwd,
        packed_reflect_pad3,
        packed_reflect_pad3_T,
    )
    from .instance_norm import _as3d, _bwd_dx, _normalize

    hp, w2, st = res
    B, Hc, Wc, C4 = hp.shape
    C = C4 // 4
    mean = st[:, 0, 0:C]
    rstd = st[:, 1, 0:C]
    hp3 = _as3d(hp)
    hnorm = _normalize(hp3, mean, rstd, slope=0.0, group=4).reshape(hp.shape)
    xq = packed_reflect_pad3(hnorm)
    dxq, dw2 = _ccs_bwd(4, (xq, w2), dy)
    dh = packed_reflect_pad3_T(dxq)
    dhp = _bwd_dx(_EPS, 0.0, hp3, mean, rstd, _as3d(dh),
                  group=4).reshape(hp.shape)
    return dhp, dw2.astype(w2.dtype)


h1_fused.defvjp(lambda *a: _h1_fwd(*a), _h1_bwd)
