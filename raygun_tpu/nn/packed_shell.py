"""Space-to-depth packed execution of the CycleGAN/ResNet generator SHELL.

The generator's full-resolution layers (reference ``ResNet.py:51-117``:
7-wide stem 1->ngf, stride-2 down conv ngf->2ngf, transposed up conv
2ngf->ngf, 7-wide head ngf->1) all carry C < 128 channels at the largest
spatial extent. Measured on v5e at the production 3x512^2 workload
(scripts/perf_shell_ops.py, perf_in_boundary.py), that is catastrophic
under XLA:

  * any materialized C=64 bf16 tensor is lane-padded 2x AND the conv
    emitter switches to ``OutputBatchInSublanes`` layout {3,0,2,1}; every
    consumer that needs the standard layout (the instance-norm stats
    reduction, Pallas or XLA alike) inserts a ~2 ms relayout copy;
  * C_out=1 convs (head fwd, stem dx) idle 127/128 MXU lanes: 4.5 ms for
    4.9 GFLOP.

This module re-expresses the whole shell on 2x2 space-to-depth packed
tensors — stem output, up_1 output and head input live as
``(B, H/2, W/2, 4*ngf)`` (>=128 full lanes, standard layouts, zero
relayouts between ops) — using exact kernel re-indexings
(:func:`raygun_tpu.nn.layers.pack_conv_kernel_io`):

  stem   fine reflect-pad + 7x7 valid  -> packed 4x4-tap conv, f2 -> f2
  down_0 fine zero-pad-1 3x3 stride-2  -> packed 2x2-tap conv, f2 -> strided
  up_1   3x3 convT s2 (subpixel form)  -> the subpixel conv IS the packed
                                          layout; just skip depth_to_space
  head   fine reflect-pad + 7x7 valid  -> packed 8x8-tap stride-4 conv
                                          with an 8x8-PACKED output grid
                                          (N = 64*co keeps the MXU busy
                                          where co=1 would idle it)
  IN+act on packed tensors             -> per-channel stats fold across
                                          the 4 phase groups in the Pallas
                                          kernels (instance_norm_act_packed)

Every function is an exact re-expression of the same math (parity- and
gradient-parity-tested, tests/nn/test_packed_shell.py); parameters are
created through the SAME flax modules, so checkpoints swap freely between
routes (the ResnetBlock fused-route pattern, nn/resnet.py:52-80).
"""

from __future__ import annotations

import os

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .layers import (
    Array,
    conv_dimension_numbers_nd,
    depth_to_space,
    pack_conv_kernel_io,
    pad_spatial,
    space_to_depth,
)


def _conv(xp: Array, w2: Array, strides) -> Array:
    return jax.lax.conv_general_dilated(
        xp, w2, tuple(strides), "VALID",
        dimension_numbers=conv_dimension_numbers_nd(2),
    )


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv_coarse_strided(xq: Array, w2: Array, s: int) -> Array:
    """Valid 2D conv with stride ``s`` on the coarse grid, with a custom
    VJP. XLA:TPU's autodiff backward of a strided conv runs an
    lhs-dilated transpose conv for dx and a strided wgrad for dw — for
    the production packed head (stride 4, 8x8 taps at 3x512^2) that
    backward measured 11.96 ms against a ~2 ms re-expression
    (scripts/perf_head_bwd.py). The re-expression is exact index algebra:

      dx: the transpose of a stride-s conv, split by output phase, is a
          STRIDE-1 conv of the (t-1)-padded cotangent with the
          phase-regrouped tap-reversed kernel producing all s^2 phases as
          channel groups — one depth_to_space away from dx.
      dw: dw2[s*q+py, s*r+px] = sum_ij xqs[i+q, j+r, (py,px,c)] * g[i,j,n]
          over the s2d-by-s regrouped input: t^2 shifted GEMMs with fp32
          accumulation (the same summation order per (c, n) as XLA's
          wgrad; only the tap loop is unrolled).

    Requires s | K and s | spatial extents (callers fall back to the
    default conv otherwise).
    """
    return _conv(xq, w2, (s, s))


def _ccs_fwd(xq, w2, s):
    return _conv(xq, w2, (s, s)), (xq, w2)


def _ccs_bwd(s, res, g):
    xq, w2 = res
    K, _, C, N = w2.shape
    t = K // s
    h, w_ = g.shape[1], g.shape[2]
    # dx: kd[a', b', n, (py, px, c)] = w2[py + s*(t-1-a'), px + s*(t-1-b'), c, n]
    kd = jnp.flip(w2.reshape(t, s, t, s, C, N), axis=(0, 2))
    kd = kd.transpose(0, 2, 5, 1, 3, 4).reshape(t, t, N, s * s * C)
    gp = jnp.pad(g, [(0, 0), (t - 1, t - 1), (t - 1, t - 1), (0, 0)])
    dxq = depth_to_space(_conv(gp, kd, (1, 1)), (s, s))
    # dw: dw2[s*q+py, s*r+px, c, n] = sum_ij xqs[i+q, j+r, (py,px,c)] g[i,j,n]
    # — t^2 shifted GEMMs. Shift the TINY cotangent (zero-pad g to the full
    # xqs extent per (q, r)) and stack the shifts on the N axis so ONE
    # full-lane GEMM (N = t^2*n) reads the 100-MB xqs exactly once; the
    # round-3 four-slice version re-read (and re-copied, 65->64 unaligned)
    # xqs per tap and ran N=64 half-lane GEMMs (3.74 -> ~1 ms measured,
    # scripts/perf_head_bwd.py).
    xqs = space_to_depth(xq, (s, s))  # (B, Hq, Wq, s^2*C), ch=(py,px,c)
    Hq, Wq = xqs.shape[1], xqs.shape[2]
    g4 = jnp.concatenate(
        [
            jnp.pad(g, [(0, 0), (q, Hq - h - q), (r, Wq - w_ - r), (0, 0)])
            for q in range(t)
            for r in range(t)
        ],
        axis=-1,
    )  # (B, Hq, Wq, t^2*N), ch = (q, r, n)
    dw_all = jnp.einsum(
        "bijM,bijN->MN", xqs, g4, preferred_element_type=jnp.float32
    )  # (s^2*C, t^2*N)
    dw2 = dw_all.reshape(s, s, C, t, t, N)
    dw2 = dw2.transpose(3, 0, 4, 1, 2, 5).reshape(K, K, C, N)
    return dxq, dw2.astype(w2.dtype)


_conv_coarse_strided.defvjp(_ccs_fwd, _ccs_bwd)


def _conv_maybe_custom(xq: Array, w2: Array, cstr) -> Array:
    """Route strided coarse convs through the custom-VJP re-expression
    when the index algebra applies (s | K, s | extents); default conv
    otherwise. Forward is IDENTICAL either way."""
    s = int(cstr[0])
    K = w2.shape[0]
    if (
        s > 1
        and int(cstr[1]) == s
        and w2.shape[1] == K
        and K % s == 0
        and xq.shape[1] % s == 0
        and xq.shape[2] % s == 0
    ):
        return _conv_coarse_strided(xq, w2, s)
    return _conv(xq, w2, cstr)


def packed_shell_ok(x: Array, ngf: int) -> bool:
    """Gate for the packed-shell route: 2D channels-last batch input with
    fine extents divisible by 8 (head's 8x8 output packing), on TPU, large
    enough that lane-padding/relayout costs dominate (the same 2^21
    threshold as the Pallas instance norm). RAYGUN_FORCE_PACKED_SHELL=1
    forces it on CPU (parity tests); RAYGUN_DISABLE_PACKED_SHELL=1 wins
    over everything (A/B measurement)."""
    import os

    if os.environ.get("RAYGUN_DISABLE_PACKED_SHELL"):
        return False
    if x.ndim != 4:
        return False
    H, W = x.shape[1], x.shape[2]
    if H % 8 or W % 8 or H < 16 or W < 16:
        return False
    if os.environ.get("RAYGUN_FORCE_PACKED_SHELL"):
        return True
    from .pallas.instance_norm import tpu_available

    if not tpu_available():
        return False
    return x.shape[0] * H * W * ngf >= (1 << 21)


def stem_packed(x: Array, w: Array, b: Array) -> Array:
    """Reflect-pad(3) + 7x7 valid conv (reference ``ResNet.py:51-63``),
    producing the f=2-packed stem activation directly.
    x: (B, H, W, ci) with H, W even -> (B, H/2, W/2, 4*co).

    Two exact forms of the same sum (parity-tested, values + grads):

    COARSE (default): s2d-pack the padded input and run the 4x4-tap
    stride-1 coarse conv. The r5 device trace attributes ~3 ms/apply at
    3x512^2 to building the lane-padded (H/2+3, W/2+3, 4*ci) s2d
    intermediate — but every attempt to avoid it has measured WORSE.

    FINE (RAYGUN_STEM_FINE=1, measured and REJECTED r5): one 8x8-tap
    stride-2 conv on the padded fine input — tap (2ty+qy, 2tx+qx) of
    output phase (qy, qx) is w[ty, tx]. Removes the s2d intermediate
    entirely, but a C_in=1 stride-2 conv on the fine grid is exactly the
    idle-MXU lowering this module exists to avoid: full production step
    218.1 ms vs 146.0/145.6 ms coarse (same session, FULL_ONLY
    perf_round3_map) — a 72 ms LOSS."""
    xpad = pad_spatial(x, [(3, 3)] * 2, "reflect")
    if os.environ.get("RAYGUN_STEM_FINE"):
        w8 = jnp.concatenate(
            [jnp.pad(w, [(qy, 1 - qy), (qx, 1 - qx), (0, 0), (0, 0)])
             for qy in range(2) for qx in range(2)],
            axis=-1,
        ).astype(x.dtype)  # (8, 8, ci, 4*co), phase-major (qy, qx, co)
        y = _conv_maybe_custom(xpad, w8, (2, 2))
    else:
        xp = space_to_depth(xpad, (2, 2))
        w2, _, cstr = pack_conv_kernel_io(w, (2, 2), (2, 2), (1, 1), (0, 0))
        y = _conv(xp, w2.astype(x.dtype), cstr)
    if b is not None:
        y = y + jnp.tile(b, 4).astype(y.dtype)
    return y


def down0_from_packed(xp: Array, w: Array, b: Array) -> Array:
    """Zero-pad-1 3x3 stride-2 conv (reference ``ResNet.py:70-79``) read
    DIRECTLY from the packed stem activation; the stride-2 output grid is
    the coarse grid itself, so the result is a plain unpacked tensor.
    xp: (B, Hc, Wc, 4*ci) -> (B, Hc, Wc, co)."""
    # fine window start = -1 (the zero pad): one zero coarse cell on the
    # low side only (the high-side fine pad is never read: last window
    # starts at fine 2*(Hc-1)-1), start-within-cell o = 1
    xq = jnp.pad(xp, [(0, 0), (1, 0), (1, 0), (0, 0)])
    w2, _, cstr = pack_conv_kernel_io(w, (2, 2), (1, 1), (2, 2), (1, 1))
    y = _conv(xq, w2.astype(xp.dtype), cstr)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def up1_packed_kernel(w: Array) -> Array:
    """Subpixel re-expression of the 3x3 stride-2 pad-1 outpad-1
    transposed-conv kernel: (k, k, ci, co) -> (2, 2, ci, 4*co) taps whose
    stride-1 valid conv over the (0,1)-zero-padded input produces the
    s2d-packed output directly (phase-major order). Pure linear map —
    autodiff flows gradients straight back to the module kernel."""
    from .layers import _pack_conv_transpose_matrix
    import itertools as it
    import numpy as np

    ci, co = w.shape[-2], w.shape[-1]
    k = w.shape[0]
    M1 = _pack_conv_transpose_matrix(k)
    Mfull = np.zeros((k * k, 4, 4), np.float32)
    for t in it.product(range(k), repeat=2):
        for u in it.product(range(2), repeat=2):
            for r in it.product(range(2), repeat=2):
                v = M1[t[0], u[0], r[0]] * M1[t[1], u[1], r[1]]
                if v:
                    Mfull[t[0] * k + t[1], u[0] * 2 + u[1], r[0] * 2 + r[1]] = v
    wt = w.reshape((k * k, ci, co))
    w2 = jnp.einsum("tur,tcd->ucrd", jnp.asarray(Mfull, w.dtype), wt)
    return w2.reshape((2, 2, ci, 4 * co))


def up1_to_packed(x: Array, w: Array, b: Array) -> Array:
    """3x3 stride-2 pad-1 outpad-1 transposed conv (reference
    ``ResNet.py:105-114``) via the subpixel decomposition, KEEPING the
    per-phase channel layout instead of depth_to_space'ing it — the
    subpixel output IS the s2d-packed tensor (phase-major order matches).
    x: (B, Hc, Wc, ci) -> (B, Hc, Wc, 4*co) representing (2Hc, 2Wc, co)."""
    w2 = up1_packed_kernel(w).astype(x.dtype)
    xq = jnp.pad(x, [(0, 0), (0, 1), (0, 1), (0, 0)])
    y = _conv(xq, w2, (1, 1))
    if b is not None:
        y = y + jnp.tile(b, 4).astype(y.dtype)
    return y


def _packed_reflect_pad3_impl(xp: Array) -> Array:
    """Fine reflect-pad of width 3 expressed on the f=2 packed tensor: two
    synthetic coarse cells per side built from phase-swapped edge strips
    (fine row -1 = row 1 lives at coarse 0 phase 1, etc.); the outermost
    fine row of each side (fine -4 / N+3) is zero-filled — the packed
    kernel's scatter matrix carries zero weight there by construction.
    (B, Hc, Wc, 4C) -> (B, Hc+4, Wc+4, 4C) with fine origin at -4."""
    C4 = xp.shape[-1]
    Cq = C4 // 4
    ch = jax.lax.broadcasted_iota(jnp.int32, (C4,), 0)
    # channel = (vy, vx, c): vy is the top half bit, vx the quarter parity.
    # Pad rows are built as MASK SELECTS over full rows — never as concats
    # of channel slices from two different rows: XLA:TPU miscompiles that
    # fusion under jit (verified 2026-08: jit-vs-eager max|d| 5.4 in the
    # pad strips from `concat([rowA[..., :C/2], rowB[..., C/2:]], -1)`;
    # a select between full rows is bit-exact).
    mask = {1: ch < C4 // 2, 2: (ch // Cq) % 2 == 0}

    def pad_axis(t, axis):
        n = t.shape[axis]
        m = mask[axis]

        def row(i):
            sl = [slice(None)] * t.ndim
            sl[axis] = slice(i, i + 1)
            return t[tuple(sl)]

        def mix(lo_phase_row, hi_phase_row):
            # phase-0 channels from the first row, phase-1 from the second
            a = lo_phase_row if lo_phase_row is not None else 0.0
            b = hi_phase_row if hi_phase_row is not None else 0.0
            return jnp.where(m, a, b).astype(t.dtype)

        r0, r1, rn1, rn2 = row(0), row(1), row(n - 1), row(n - 2)
        m2 = mix(None, r1)   # fine (-4: junk,  -3 = fine 3)
        m1 = mix(r1, r0)     # fine (-2 = 2,    -1 = 1)
        p0 = mix(rn1, rn2)   # fine (N = N-2,   N+1 = N-3)
        p1 = mix(rn2, None)  # fine (N+2 = N-4, N+3: junk)
        return jnp.concatenate([m2, m1, t, p0, p1], axis=axis)

    return pad_axis(pad_axis(xp, 1), 2)


def _pad3_fwd_route(xp: Array) -> Array:
    """Forward route: the one-pass Pallas band kernel when it applies
    (nn/pallas/pad_packed.py — the XLA concat/select composition
    re-materializes the padded tensor several times; r5 device trace),
    else the XLA impl. Bit-identical (pure selects/copies, asserted in
    tests/nn/test_packed_shell.py)."""
    from .pallas.pad_packed import pad3_pallas_ok, packed_reflect_pad3_pallas

    if pad3_pallas_ok(xp):
        return packed_reflect_pad3_pallas(xp)
    return _packed_reflect_pad3_impl(xp)


@jax.custom_vjp
def _packed_reflect_pad3_vjp(xp: Array) -> Array:
    return _pad3_fwd_route(xp)


_packed_reflect_pad3_vjp.defvjp(
    lambda xp: (_pad3_fwd_route(xp), None),
    lambda _, g: (packed_reflect_pad3_T(g),),
)


def packed_reflect_pad3(xp: Array) -> Array:
    """See :func:`_packed_reflect_pad3_impl`. Default route carries a
    custom VJP: XLA's autodiff of the where/concat pad composition
    schedules a slow select/scatter chain at production shape; the
    explicit strip-add transpose (:func:`packed_reflect_pad3_T`) is exact
    — verified against ``jax.vjp`` in tests/nn/test_packed_shell.py — and
    cheap. RAYGUN_DISABLE_PAD_VJP=1 restores the autodiff backward (A/B
    measurement)."""
    import os

    if os.environ.get("RAYGUN_DISABLE_PAD_VJP"):
        return _packed_reflect_pad3_impl(xp)
    return _packed_reflect_pad3_vjp(xp)


def packed_reflect_pad3_T(g: Array) -> Array:
    """Exact transpose of :func:`packed_reflect_pad3`: interior slice plus
    masked strip adds back into rows/cols 0, 1, n-2, n-1 (the adjoint of
    the phase-swapped edge mixes). XLA's autodiff of the pad's
    where/concat composition schedules these as a slow scatter chain at
    production shape (measured ~1.3 ms of the head backward,
    scripts/perf_s3_parts.py); the explicit strip adds are cheap slices.
    Verified equal to ``jax.vjp(packed_reflect_pad3, x)`` in
    tests/nn/test_packed_shell.py. Routes to the one-pass Pallas band
    kernel where it applies (r5, nn/pallas/pad_packed.py — bit-exact)."""
    from .pallas.pad_packed import pad3T_pallas_ok, packed_reflect_pad3_T_pallas

    if pad3T_pallas_ok(g):
        return packed_reflect_pad3_T_pallas(g)
    C4 = g.shape[-1]
    Cq = C4 // 4
    ch = jax.lax.broadcasted_iota(jnp.int32, (C4,), 0)
    mask = {1: ch < C4 // 2, 2: (ch // Cq) % 2 == 0}

    def unpad_axis(t, axis):
        n = t.shape[axis] - 4
        m = mask[axis]

        def strip(i):
            sl = [slice(None)] * t.ndim
            sl[axis] = slice(i, i + 1)
            return t[tuple(sl)]

        core_sl = [slice(None)] * t.ndim
        core_sl[axis] = slice(2, n + 2)
        core = t[tuple(core_sl)]
        g_m2, g_m1 = strip(0), strip(1)
        g_p0, g_p1 = strip(n + 2), strip(n + 3)
        # forward: m2 = where(m, 0, r1); m1 = where(m, r1, r0);
        #          p0 = where(m, rn1, rn2); p1 = where(m, rn2, 0)
        zero = jnp.zeros((), core.dtype)
        add0 = jnp.where(m, zero, g_m1)                      # -> row 0
        add1 = jnp.where(m, g_m1, zero) + jnp.where(m, zero, g_m2)
        addn2 = jnp.where(m, zero, g_p0) + jnp.where(m, g_p1, zero)
        addn1 = jnp.where(m, g_p0, zero)                     # -> row n-1

        def at(i):
            sl = [slice(None)] * core.ndim
            sl[axis] = slice(i, i + 1)
            return tuple(sl)

        core = core.at[at(0)].add(add0)
        core = core.at[at(1)].add(add1)
        core = core.at[at(n - 2)].add(addn2)
        core = core.at[at(n - 1)].add(addn1)
        return core

    return unpad_axis(unpad_axis(g, 2), 1)


def head_f_out(co: int) -> int:
    """Output packing factor for the 7x7 head: widen N = f^2*co toward the
    MXU's 128 lanes for narrow heads, but no further — every doubling of f
    also grows the packed K (tap window), so over-packing a WIDE head
    multiplies real FLOPs (measured: co=64 at f=8 is N=4096, 1.65 TF/apply
    — the source of a 62 ms/step regression before this policy)."""
    import os

    forced = os.environ.get("RAYGUN_PACKED_HEAD_FOUT")
    if forced:
        return int(forced)
    if co <= 2:
        return 8
    if co <= 8:
        return 4
    return 2


def head_from_packed(xp: Array, w: Array, b: Array) -> Array:
    """Reflect-pad(3) + 7x7 valid conv to co outputs (reference
    ``ResNet.py:116-117``), read from the packed tensor and produced on an
    f x f-PACKED output grid (f from :func:`head_f_out`): N = f^2*co
    instead of co, so the MXU runs full lanes where the fine formulation
    (co=1) idles 127/128 of them (measured 4.5 ms -> see
    docs/PERFORMANCE.md). One tiny depth_to_space (f^2*4x fewer elements
    than the input) unpacks the result.
    xp: (B, Hc, Wc, 4*ci) -> (B, 2Hc, 2Wc, co); requires 2Hc % f == 0."""
    co = w.shape[-1]
    f = head_f_out(co)
    while (2 * xp.shape[1]) % f or (2 * xp.shape[2]) % f:
        f //= 2
    xq = packed_reflect_pad3(xp)
    # fine origin -4, head window starts at fine -3 -> start-in-cell o = 1
    w2, _, cstr = pack_conv_kernel_io(w, (2, 2), (f, f), (1, 1), (1, 1))
    y = _conv_maybe_custom(xq, w2.astype(xp.dtype), cstr)
    if b is not None:
        y = y + jnp.tile(b, f * f).astype(y.dtype)
    return depth_to_space(y, (f, f))


# ---------------------------------------------------------------------------
# Packed PatchGAN discriminator (reference NLayerDiscriminator.py:30-77)
# ---------------------------------------------------------------------------
#
# The production discriminator (ds_kw=2, n_layers=3 at 3x512^2) spends most
# of its time in conv_0/conv_1: the fine C=64 tensor at 257^2 triggers the
# same batch-in-sublanes conv layout + relayout copies as the generator
# shell, and conv_out's C_out=1 idles 127/128 MXU lanes (measured,
# scripts/perf_d_layers.py). The reference's k=2 stride-2 padding-1 conv
# has a special structure: output position o reads EXACTLY the input pair
# (2o-1, 2o) — disjoint windows — so the whole downsampling stack
# re-expresses exactly as 1x1 GEMMs over space-to-depth'd pair tensors:
#
#   conv_0  x (pad 3,1) s2d by 4 -> one 1x1 GEMM producing the PACKED
#           pair tensor (cells = zero-padded (2i-1, 2i) of the fine
#           activation); the virtual position -1 entries are zeroed
#           post-activation (disc_mask_pad_phase) — they are conv_1's
#           zero padding, which the reference applies after the lrelu.
#   conv_n  1x1 GEMM (K = 4*C_in, full lanes) from the packed pairs to
#           the FINE output grid (norms/activations see the exact fine
#           tensor); repack_pairs (pad(1,0) + s2d) feeds the next layer.
#   conv_out (k x k stride-1 pad-1, co=1): one GEMM with N = k^2*co
#           per-tap partial products + k^2 shifted adds of the tiny
#           product map instead of a 127/128-idle conv.
#
# All exact re-expressions; params come from the same ConvNd modules
# (tests/nn/test_packed_disc.py asserts value+gradient parity and
# identical param trees).


def packed_disc_ok(x: Array, ngf: int) -> bool:
    """Gate for the packed discriminator route: 2D channels-last input
    with extents divisible by 4, on TPU (or forced), large enough that
    layout costs dominate. RAYGUN_FORCE_PACKED_DISC=1 forces it on CPU
    (parity tests); RAYGUN_DISABLE_PACKED_DISC=1 wins over everything."""
    import os

    if os.environ.get("RAYGUN_DISABLE_PACKED_DISC"):
        return False
    if x.ndim != 4:
        return False
    H, W = x.shape[1], x.shape[2]
    if H % 4 or W % 4 or H < 16 or W < 16:
        return False
    if os.environ.get("RAYGUN_FORCE_PACKED_DISC"):
        return True
    from .pallas.instance_norm import tpu_available

    if not tpu_available():
        return False
    return x.shape[0] * H * W * ngf >= (1 << 21)


def disc_stem_packed(x: Array, w: Array, b) -> Array:
    """k=2 stride-2 padding-1 conv_0, producing the PACKED pair tensor
    directly: cell i holds fine outputs (2i-1, 2i) per axis (channel order
    (uy, ux, co)); position -1 entries are junk until
    :func:`disc_mask_pad_phase` zeroes them (post-activation).
    x: (B, H, W, ci) with H, W % 4 == 0 -> (B, H/4+1, W/4+1, 4*co)."""
    import numpy as np

    ci, co = w.shape[-2], w.shape[-1]
    xp = jnp.pad(x, [(0, 0), (3, 1), (3, 1), (0, 0)])
    x4 = space_to_depth(xp, (4, 4))  # channel = (py, px, ci)
    # fine output 2i-1+u reads x rows 2*(2i-1+u) - 1 + k = 4i + (2u+k) - 3:
    # phase py = 2u + k within the granularity-4 cell starting at 4i-3.
    M = np.zeros((4, 2, 2), np.float32)
    for u in range(2):
        for k in range(2):
            M[2 * u + k, u, k] = 1.0
    Mj = jnp.asarray(M)
    Wp = jnp.einsum("puk,qvl,klio->pqiuvo", Mj, Mj, w.astype(jnp.float32))
    Wp = Wp.reshape(1, 1, 16 * ci, 4 * co).astype(x.dtype)
    y = _conv(x4, Wp, (1, 1))
    if b is not None:
        y = y + jnp.tile(b, 4).astype(y.dtype)
    return y


def disc_mask_pad_phase(hp: Array, co: int) -> Array:
    """Zero the virtual position -1 entries of the packed pair tensor
    (cell 0 / phase 0 per axis): they are the NEXT conv's zero padding,
    applied by the reference AFTER the activation."""
    C4 = hp.shape[-1]
    ch = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, C4), 3)
    uy = ch // (2 * co)
    ux = (ch // co) % 2
    row = jax.lax.broadcasted_iota(jnp.int32, (1, hp.shape[1], 1, 1), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, hp.shape[2], 1), 2)
    junk = ((row == 0) & (uy == 0)) | ((col == 0) & (ux == 0))
    return jnp.where(junk, jnp.zeros((), hp.dtype), hp)


def disc_down_from_packed(hp: Array, w: Array, b) -> Array:
    """k=2 stride-2 padding-1 conv read from the packed pair tensor: one
    1x1 GEMM (K = 4*ci full lanes) straight to the FINE output grid —
    output position o reads exactly cell o.
    hp: (B, m+1, m+1, 4*ci) -> (B, m+1, m+1, co)."""
    ci, co = w.shape[-2], w.shape[-1]
    W2 = w.reshape(1, 1, 4 * ci, co).astype(hp.dtype)  # (ky,kx,ci) = s2d order
    y = _conv(hp, W2, (1, 1))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def repack_pairs(h: Array) -> Array:
    """Fine (B, 2m+1, 2m+1, C) -> packed zero-padded pairs (2i-1, 2i):
    the input layout every stride-2 k2p1 layer consumes."""
    return space_to_depth(jnp.pad(h, [(0, 0), (1, 0), (1, 0), (0, 0)]), (2, 2))


def disc_head_tapsum(h: Array, w: Array, b) -> Array:
    """k x k stride-1 padding-1 conv to co outputs (conv_out, co=1) as one
    GEMM with N = k^2*co per-tap partial products + k^2 shifted adds of
    the (tiny) product map — the direct conv idles (128-co)/128 MXU lanes.
    h: (B, H, W, ci) -> (B, H+3-k, W+3-k, co)."""
    k1, k2, ci, co = w.shape
    hp = jnp.pad(h, [(0, 0), (1, 1), (1, 1), (0, 0)])
    Wt = w.transpose(2, 0, 1, 3).reshape(1, 1, ci, k1 * k2 * co)
    Y = _conv(hp, Wt.astype(h.dtype), (1, 1))
    Ho, Wo = h.shape[1] + 3 - k1, h.shape[2] + 3 - k2
    out = None
    for ty in range(k1):
        for tx in range(k2):
            t = ty * k2 + tx
            sl = Y[:, ty:ty + Ho, tx:tx + Wo, t * co:(t + 1) * co]
            out = sl if out is None else out + sl
    if b is not None:
        out = out + b.astype(out.dtype)
    return out
