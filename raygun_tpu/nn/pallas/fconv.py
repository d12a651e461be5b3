"""Pallas TPU kernels: fused prologue-IN/relu + pad-1 + 2x2-tap conv.

The packed CycleGAN generator shell (nn/packed_shell.py) re-expresses its
full-resolution stride-2 boundary convs as 2x2-tap stride-1 convs on
space-to-depth packed tensors (reference ``ResNet.py:70-79`` down_0 and
``:105-114`` up_1). Measured at the production 3x512^2 bf16 workload the
XLA composition still pays ~2.4/3.4 ms per stage fwd+bwd
(scripts/perf_packed_stages.py) because every conv/norm boundary
materializes full activations to HBM: the stage input is written by the
producer, read for IN stats, read+written by normalize, and read again by
the conv — ~4 full-resolution passes where one suffices.

This op runs each stage at its traffic floor, owning its INPUT's instance
norm (the shell chain is linear, so each pre-norm boundary tensor has
exactly one consumer):

  forward   stats pass over the raw input (reuses the instance-norm stats
            kernel, phase-group folding for packed tensors), then ONE
            kernel: prologue normalize+relu recomputed in-VMEM per row
            slab -> virtual zero pad -> 2x2-tap conv (4 shifted MXU
            matmuls, fp32 accumulation) + bias.
  backward  dinp kernel (the same conv kernel with flip-transposed
            weights and the mirrored pad, no prologue) -> wgrad/bias
            kernel (prologue recomputed in-slab) -> fused IN/relu
            backward (the instance-norm grad-stats/apply kernels).

Exactness: identical math to the unfused route (MXU fp32 accumulation,
fp32 stats of the rounded producer output, biased variance); only
summation order differs. Parity- and gradient-parity-tested against the
unfused composition in tests/nn/test_fused_shell.py.

Layout: channels-last (B, H, W, C); C_in a multiple of 128 (lane-aligned
tap stacking), H a multiple of the slab height; callers fall back to the
unfused route otherwise.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .instance_norm import _as3d, _bwd_dx, _moments

Array = jax.Array


def _interpret() -> bool:
    try:
        return jax.devices()[0].platform not in ("tpu", "axon")
    except Exception:
        return True


def _pick_slab(H: int, W: int, Cin: int, Cout: int,
               budget: int = 7 * 1024 * 1024) -> Optional[int]:
    """Largest slab height that divides H and keeps the assembled
    tap-stacked input + fp32 accumulator inside VMEM."""
    for sh in (32, 16, 8):
        if H % sh == 0 and H >= sh and sh % 2 == 0:
            approx = (
                (sh + 1) * W * 2 * Cin * 2      # apk scratch (bf16)
                + sh * W * Cin * 2              # main block
                + sh * W * Cout * (4 + 2)       # acc + out
                + 4 * Cin * Cout * 2            # weights
            )
            if approx <= budget:
                return sh
    return None


def fconv2_ok(x: Array, w2: Array) -> bool:
    """Gate for the fused stage: 2D channels-last bf16, C_in % 128 == 0
    (lane-aligned tap stacks), even H with a dividing slab height.
    RAYGUN_FORCE_PALLAS_FCONV=1 skips the platform/dtype checks (CPU
    interpret-mode parity tests); RAYGUN_DISABLE_PALLAS_FCONV=1 wins."""
    import os

    if os.environ.get("RAYGUN_DISABLE_PALLAS_FCONV"):
        return False
    if x.ndim != 4:
        return False
    B, H, W, Cin = x.shape
    Cout = w2.shape[-1]
    if Cin % 128 or H % 2 or W < 8 or H < 8:
        return False
    if _pick_slab(H, W, Cin, Cout) is None:
        return False
    if os.environ.get("RAYGUN_FORCE_PALLAS_FCONV"):
        return True
    if x.dtype != jnp.bfloat16:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _assemble(main, halo, s, n_slabs, pad, prologue, slope, mean_ref,
              rstd_ref):
    """(SH+1, W+1, Cin) prologue'd, virtually-padded input rows for the
    2-tap window. pad='lo': rows [s*SH-1, s*SH+SH), zero row/col at the
    low edge; pad='hi': rows [s*SH, s*SH+SH+1), zero at the high edge."""
    SH, W, Cin = main.shape
    if pad == "lo":
        edge = halo[1]          # row s*SH-1 (junk when s == 0)
        rows = jnp.concatenate([edge[None], main], axis=0)
        virt = (jax.lax.broadcasted_iota(jnp.int32, rows.shape, 0) == 0) & (
            s == 0)
    else:
        edge = halo[0]          # row s*SH+SH (junk when s == n-1)
        rows = jnp.concatenate([main, edge[None]], axis=0)
        virt = (jax.lax.broadcasted_iota(jnp.int32, rows.shape, 0) == SH) & (
            s == n_slabs - 1)
    if prologue:
        m = mean_ref[0, 0, :][None, None, :]
        r = rstd_ref[0, 0, :][None, None, :]
        rows = (rows.astype(jnp.float32) - m) * r
        rows = jnp.where(rows > 0, rows, slope * rows)
        rows = rows.astype(main.dtype)
    rows = jnp.where(virt, jnp.zeros((), main.dtype), rows)
    zc = jnp.zeros((SH + 1, 1, Cin), main.dtype)
    if pad == "lo":
        return jnp.concatenate([zc, rows], axis=1)
    return jnp.concatenate([rows, zc], axis=1)


def _stack2(ap, apk_ref, W, Cin):
    """(R, W+1, Cin) -> scratch (R, W, 2*Cin): x-taps stacked into
    channels via lane-aligned VMEM stores (the resblock _stack_taps
    pattern — Mosaic rejects lane concats of sublane-offset vectors)."""
    for tx in range(2):
        apk_ref[:, :, tx * Cin:(tx + 1) * Cin] = ap[:, tx:tx + W, :]
    return apk_ref[...]


def _k2_kernel(SH, W, Cin, Cout, n_slabs, pad, prologue, slope, has_bias,
               *refs):
    i = 0
    main_ref = refs[i]; i += 1
    halo_ref = refs[i]; i += 1
    if prologue:
        mean_ref = refs[i]; i += 1
        rstd_ref = refs[i]; i += 1
    else:
        mean_ref = rstd_ref = None
    w_ref = refs[i]; i += 1
    if has_bias:
        b_ref = refs[i]; i += 1
    y_ref = refs[i]; i += 1
    apk_ref = refs[i]

    s = pl.program_id(1)
    ap = _assemble(main_ref[0], halo_ref[0], s, n_slabs, pad, prologue,
                   slope, mean_ref, rstd_ref)
    apk = _stack2(ap, apk_ref, W, Cin)
    acc = jnp.zeros((SH * W, Cout), jnp.float32)
    for ty in range(2):
        a = apk[ty:ty + SH].reshape(SH * W, -1)
        acc = acc + jax.lax.dot_general(
            a, w_ref[ty], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if has_bias:
        acc = acc + b_ref[0, :][None, :].astype(jnp.float32)
    y_ref[0] = acc.astype(y_ref.dtype).reshape(SH, W, Cout)


def _k2_wgrad_kernel(SH, W, Cin, Cout, n_slabs, pad, prologue, slope,
                     *refs):
    i = 0
    dy_ref = refs[i]; i += 1
    main_ref = refs[i]; i += 1
    halo_ref = refs[i]; i += 1
    if prologue:
        mean_ref = refs[i]; i += 1
        rstd_ref = refs[i]; i += 1
    else:
        mean_ref = rstd_ref = None
    dw_ref, db_ref = refs[i], refs[i + 1]
    apk_ref = refs[i + 2]

    b = pl.program_id(0)
    s = pl.program_id(1)
    ap = _assemble(main_ref[0], halo_ref[0], s, n_slabs, pad, prologue,
                   slope, mean_ref, rstd_ref)
    apk = _stack2(ap, apk_ref, W, Cin)
    dym = dy_ref[0].reshape(SH * W, Cout)
    first = (b == 0) & (s == 0)

    dsum = jnp.sum(dym.astype(jnp.float32), axis=0)

    @pl.when(first)
    def _():
        db_ref[0, :] = dsum

    @pl.when(jnp.logical_not(first))
    def _():
        db_ref[0, :] += dsum

    for ty in range(2):
        a = apk[ty:ty + SH].reshape(SH * W, -1)
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


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _specs(B, H, W, Cin, SH, pad):
    half = SH // 2
    main = pl.BlockSpec((1, SH, W, Cin), lambda b, s: (b, s, 0, 0),
                        memory_space=pltpu.VMEM)
    if pad == "lo":
        halo = pl.BlockSpec(
            (1, 2, W, Cin),
            lambda b, s: (b, jnp.maximum(s * half - 1, 0), 0, 0),
            memory_space=pltpu.VMEM)
    else:
        halo = pl.BlockSpec(
            (1, 2, W, Cin),
            lambda b, s: (b, jnp.minimum(s * half + half, H // 2 - 1), 0, 0),
            memory_space=pltpu.VMEM)
    chan = pl.BlockSpec((1, 1, Cin), lambda b, s: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    return main, halo, chan


def _k2(x, w2s, b, pad, stats=None, slope=0.0, out_dtype=None):
    """conv2x2(pad1_{pad}(maybe_norm_relu(x))) + bias via the fused kernel.
    ``w2s``: (2, 2*Cin, Cout) tap-stacked weights; ``stats``: broadcast
    per-channel (mean, rstd) each (B, Cin)."""
    B, H, W, Cin = x.shape
    Cout = w2s.shape[-1]
    SH = _pick_slab(H, W, Cin, Cout)
    n_slabs = H // SH
    prologue = stats is not None
    main, halo, chan = _specs(B, H, W, Cin, SH, pad)
    in_specs = [main, halo]
    args = [x, x]
    if prologue:
        mean, rstd = stats
        in_specs += [chan, chan]
        args += [mean[:, None, :], rstd[:, None, :]]
    in_specs += [pl.BlockSpec((2, 2 * Cin, Cout), lambda b_, s: (0, 0, 0),
                              memory_space=pltpu.VMEM)]
    args += [w2s]
    if b is not None:
        in_specs += [pl.BlockSpec((1, Cout), lambda b_, s: (0, 0),
                                  memory_space=pltpu.VMEM)]
        args += [b.reshape(1, -1)]
    y = pl.pallas_call(
        functools.partial(_k2_kernel, SH, W, Cin, Cout, n_slabs, pad,
                          prologue, slope, b is not None),
        grid=(B, n_slabs),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, SH, W, Cout), lambda b_, s: (b_, s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout),
                                       out_dtype or x.dtype),
        scratch_shapes=[pltpu.VMEM((SH + 1, W, 2 * Cin), x.dtype)],
        interpret=_interpret(),
    )(*args)
    return y


def _k2_wgrad(dy, x, stats, pad, slope):
    """(dW (2, 2*Cin, Cout) fp32, db (Cout,) fp32) of the fused stage."""
    B, H, W, Cin = x.shape
    Cout = dy.shape[-1]
    SH = _pick_slab(H, W, Cin, Cout)
    n_slabs = H // SH
    prologue = stats is not None
    main, halo, chan = _specs(B, H, W, Cin, SH, pad)
    dymain = pl.BlockSpec((1, SH, W, Cout), lambda b, s: (b, s, 0, 0),
                          memory_space=pltpu.VMEM)
    in_specs = [dymain, main, halo]
    args = [dy, x, x]
    if prologue:
        mean, rstd = stats
        in_specs += [chan, chan]
        args += [mean[:, None, :], rstd[:, None, :]]
    out_specs = [
        pl.BlockSpec((2, 2 * Cin, Cout), lambda b, s: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Cout), lambda b, s: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((2, 2 * Cin, Cout), jnp.float32),
        jax.ShapeDtypeStruct((1, Cout), jnp.float32),
    ]
    dw, db = pl.pallas_call(
        functools.partial(_k2_wgrad_kernel, SH, W, Cin, Cout, n_slabs, pad,
                          prologue, slope),
        grid=(B, n_slabs),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((SH + 1, W, 2 * Cin), x.dtype)],
        interpret=_interpret(),
    )(*args)
    return dw, db[0]


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

def _stage_stats(y_prev, group, eps):
    """Per-channel instance-norm stats of the raw stage input, with
    phase-group folding for packed tensors. Returns the true-channel
    (mean, rstd) plus the Cin-broadcast versions the kernels consume."""
    x3 = _as3d(y_prev)
    if group > 1:
        mean, rstd = _moments(x3, eps, group=group)
        return mean, rstd, jnp.tile(mean, (1, group)), jnp.tile(
            rstd, (1, group))
    mean, rstd = _moments(x3, eps)
    return mean, rstd, mean, rstd


def _fwd_impl(y_prev, w2s, b2, group, pad, eps, slope):
    mean, rstd, mt, rt = _stage_stats(y_prev, group, eps)
    y = _k2(y_prev, w2s, b2, pad, stats=(mt, rt), slope=slope)
    return y, (mean, rstd, mt, rt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_pro_conv2(y_prev: Array, w2s: Array, b2: Array, group: int,
                    pad: str, eps: float = 1e-5,
                    slope: float = 0.0) -> Array:
    """conv2x2(pad1_{pad}(act(IN(y_prev)))) + b2, fused.

    ``y_prev``: the RAW producer output (pre-norm), (B, H, W, Cin).
    ``w2s``: tap-stacked packed weights (2, 2*Cin, Cout) — row-major
    (ty, tx, c_in) stacking of the (2, 2, Cin, Cout) kernel.
    ``group``: IN stats fold factor (4 for 2x2 s2d-packed inputs, 1 for
    fine tensors). ``pad``: 'lo' (down_0's zero pad at -1) or 'hi'
    (up_1's subpixel pad at H). ``slope``: leaky-relu slope (0.0 = relu).

    Exact re-expression of the unfused composition; the custom VJP runs
    the transpose conv, wgrad, and IN/relu backward at the traffic floor.
    """
    y, _ = _fwd_impl(y_prev, w2s, b2, group, pad, eps, slope)
    return y


def _fpc_fwd(y_prev, w2s, b2, group, pad, eps, slope):
    y, (mean, rstd, mt, rt) = _fwd_impl(y_prev, w2s, b2, group, pad, eps,
                                        slope)
    return y, (y_prev, w2s, mean, rstd, mt, rt)


def _fpc_bwd(group, pad, eps, slope, res, dy):
    y_prev, w2s, mean, rstd, mt, rt = res
    Cin = y_prev.shape[-1]
    Cout = w2s.shape[-1]
    # dinp wrt the prologue output h: the transpose of a pad-lo (pad-hi)
    # 2x2 valid conv is a pad-hi (pad-lo) 2x2 valid conv with
    # flip-transposed weights.
    w22 = w2s.reshape(2, 2, Cin, Cout)
    wT = jnp.flip(w22, (0, 1)).transpose(0, 1, 3, 2).reshape(
        2, 2 * Cout, Cin)
    dh = _k2(dy, wT, None, "hi" if pad == "lo" else "lo",
             out_dtype=y_prev.dtype)
    dw, db = _k2_wgrad(dy, y_prev, (mt, rt), pad, slope)
    g = group if group > 1 else None
    dyp = _bwd_dx(eps, slope, _as3d(y_prev), mean, rstd, _as3d(dh),
                  group=g)
    return (dyp.reshape(y_prev.shape), dw.astype(w2s.dtype),
            db.astype(w2s.dtype))


fused_pro_conv2.defvjp(_fpc_fwd, _fpc_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv2_plain(x: Array, w2s: Array, b2: Array, pad: str) -> Array:
    """conv2x2(pad1_{pad}(x)) + b2 — the fused stage WITHOUT the
    prologue IN (for callers that already normalized, e.g. the
    megakernel up path, nn/pallas/shell_fused.py). Same kernels as
    :func:`fused_pro_conv2`; the VJP is just the transpose conv + wgrad
    (no IN backward)."""
    return _k2(x, w2s, b2, pad)


def _c2p_fwd(x, w2s, b2, pad):
    return _k2(x, w2s, b2, pad), (x, w2s)


def _c2p_bwd(pad, res, dy):
    x, w2s = res
    Cin = x.shape[-1]
    Cout = w2s.shape[-1]
    w22 = w2s.reshape(2, 2, Cin, Cout)
    wT = jnp.flip(w22, (0, 1)).transpose(0, 1, 3, 2).reshape(
        2, 2 * Cout, Cin)
    dx = _k2(dy, wT, None, "hi" if pad == "lo" else "lo", out_dtype=x.dtype)
    dw, db = _k2_wgrad(dy, x, None, pad, 0.0)
    return (dx, dw.astype(w2s.dtype), db.astype(w2s.dtype))


conv2_plain.defvjp(_c2p_fwd, _c2p_bwd)


def stack_taps2(w22: Array) -> Array:
    """(2, 2, Cin, Cout) -> (2, 2*Cin, Cout) row-major (tx, c_in) stack,
    the layout :func:`fused_pro_conv2` consumes. Pure reshape — autodiff
    maps gradients straight back to the packed kernel."""
    k0, k1, Cin, Cout = w22.shape
    assert k0 == 2 and k1 == 2
    return w22.reshape(2, 2 * Cin, Cout)
