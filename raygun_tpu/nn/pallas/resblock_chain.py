"""Pallas TPU kernel: the generator's whole resnet-block CHAIN, one call.

The CycleGAN generator's 6 residual blocks (reference ``ResNet.py:127-223``)
already run as per-block fused kernels (``resblock.py``), but each block
instance still costs ~17 kernel launches per fwd+bwd apply and re-reads its
input/intermediates from HBM at every kernel boundary. The measured
production-step plateau (docs/PERFORMANCE.md "scheduling plateau") is bound
by XLA:TPU's scheduling of those ~40 opaque custom-call boundaries, not by
any single op — so this kernel collapses the entire N-block forward chain
into ONE ``pallas_call``:

  grid = (B, N), sequential; the running activation lives in VMEM scratch
  across all N blocks of an image. Per (image, block) step the kernel runs
  conv1 (+stats), IN+relu+conv2 (+stats), and the normalize+skip tail over
  row slabs of the resident activation — the only HBM traffic is the
  initial image read, the per-block residual writes the backward needs
  (y1, y2, block output), and the once-per-block weight fetch.

Exactness: identical math and summation ORDER to the per-block route
(``resblock._conv_stats`` slab order == this kernel's fori_loop order; the
tail matches ``instance_norm._normalize_add_kernel``), so the chain is a
drop-in re-expression. The backward REUSES the per-block custom-VJP
pipeline (``resblock._conv_bwd`` / ``instance_norm._bwd_dx``) on the saved
residuals — gradients are the same kernels in the same order as the
per-block route. Parity-tested values+grads in
tests/nn/test_resblock_pallas.py (interpret mode).

Layout: channels-last (B, H, W, C), C % 128 == 0, H % 8 == 0 (row slabs).
Callers gate on :func:`resblock_chain_ok` and fall back to per-block
kernels otherwise (nn/resnet.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .resblock import (
    _BWD_BUDGET,
    _bwd_dx,
    _conv9,
    _conv_bwd,
    _interpret,
    _pick_slab,
    _sums_to_moments,
)

Array = jax.Array

# leave headroom under the 128 MB physical VMEM for Mosaic's own
# allocations; the gate below rejects shapes whose buffers exceed this
_VMEM_CAP = 110 * 1024 * 1024


def _chain_vmem_bytes(B: int, H: int, W: int, C: int, SH: int,
                      itemsize: int) -> int:
    """Upper estimate of the kernel's VMEM working set: double-buffered
    in/out blocks + resident scratch + the conv slab temporaries."""
    img = H * W * C * itemsize
    w_blk = 2 * 3 * 3 * C * C * itemsize
    slab = (SH + 2) * W * 3 * C * itemsize  # tap-stack scratch
    acc = SH * W * C * 4                    # fp32 conv accumulator
    # x + w (double-buffered) + 3 big outputs (double-buffered) + cur
    return 2 * (img + w_blk) + 2 * 3 * img + img + slab + 2 * acc


def _chain_slab(H: int, W: int, C: int):
    """THE slab pick for the chain kernels — gate and dispatchers must
    agree (a gate that falls back to a slab the kernel doesn't pick lets
    shapes through that crash at trace time)."""
    env = int(os.environ.get("RAYGUN_CHAIN_SH", "0"))
    if env:
        return env
    return _pick_slab(H, W, C, budget=_BWD_BUDGET) or _pick_slab(H, W, C)


def resblock_chain_ok(x: Array, n_blocks: int) -> bool:
    if os.environ.get("RAYGUN_DISABLE_PALLAS_RESBLOCK_CHAIN"):
        return False
    if n_blocks < 2 or x.ndim != 4:
        return False
    if x.dtype != jnp.bfloat16:
        return False
    B, H, W, C = x.shape
    if C % 128 or W < 8 or H % 8 or H < 8:
        return False
    if H * W * C * B < (1 << 20):
        return False
    SH = _chain_slab(H, W, C)
    if not SH or H % SH:
        return False
    if _chain_vmem_bytes(B, H, W, C, SH, 2) > _VMEM_CAP:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


# ---------------------------------------------------------------------------
# the forward chain kernel
# ---------------------------------------------------------------------------

def _chain_kernel(SH, H, W, C, eps, save_res, n_blocks, *refs):
    """The N-block forward chain. ``save_res``: write the backward's
    residuals (outs/y1/y2/sums) as outputs (training); False keeps y1/y2
    in scratch and writes ONLY the final activation (inference — the
    per-block residual writes are the forward's main HBM traffic)."""
    if save_res:
        (x_ref, w_ref, b_ref, outs_ref, y1_ref, y2_ref, sums_ref,
         cur, ap3) = refs
    else:
        (x_ref, w_ref, b_ref, out_ref, cur, y1_scr, y2_scr, ap3) = refs
    i = pl.program_id(1)
    n_slabs = H // SH
    n = jnp.float32(H * W)

    @pl.when(i == 0)
    def _():
        cur[...] = x_ref[0]

    def asm(get_rows, s):
        """Reflect-padded rows [s*SH-1, s*SH+SH+1) x cols: (SH+2, W+2, C).
        Same row/col reflect convention as resblock._assemble_reflect."""
        start = s * SH
        main = get_rows(start, SH)
        ti = jnp.where(s == 0, 1, start - 1)
        bi = jnp.where(start + SH >= H, H - 2, start + SH)
        rows = jnp.concatenate(
            [get_rows(ti, 1), main, get_rows(bi, 1)], axis=0)
        return jnp.concatenate(
            [rows[:, 1:2], rows, rows[:, -2:-1]], axis=1)

    if save_res:
        def write_y1(sl, v):
            y1_ref[0, 0, sl] = v

        def read_y1(r0, k):
            return y1_ref[0, 0, pl.ds(r0, k)]

        def write_y2(sl, v):
            y2_ref[0, 0, sl] = v

        def read_y2(sl):
            return y2_ref[0, 0, sl]
    else:
        def write_y1(sl, v):
            y1_scr[sl] = v

        def read_y1(r0, k):
            return y1_scr[pl.ds(r0, k)]

        def write_y2(sl, v):
            y2_scr[sl] = v

        def read_y2(sl):
            return y2_scr[sl]

    def conv_pass(get_rows, w_idx, write, stats=None):
        """conv3x3(reflect(maybe IN+relu(rows))) + bias over all slabs,
        writing via ``write`` and returning fp32 (sum, sumsq) of the
        rounded output — slab order identical to resblock._conv_stats."""
        bias = b_ref[0, w_idx][None, :].astype(jnp.float32)

        def body(s, carry):
            ssum, ssq = carry
            ap = asm(get_rows, s)
            if stats is not None:
                m, r = stats
                ap = jnp.maximum(
                    (ap.astype(jnp.float32) - m[None]) * r[None], 0.0)
            ap = ap.astype(cur.dtype)
            acc = _conv9(ap, ap3, w_ref.at[0, w_idx], SH, W, C) + bias
            yb = acc.astype(cur.dtype)
            write(pl.ds(s * SH, SH), yb.reshape(SH, W, C))
            yf = yb.astype(jnp.float32)
            return (ssum + jnp.sum(yf, axis=0, keepdims=True),
                    ssq + jnp.sum(yf * yf, axis=0, keepdims=True))

        zero = jnp.zeros((1, C), jnp.float32)
        return jax.lax.fori_loop(0, n_slabs, body, (zero, zero))

    def moments(ssum, ssq):
        mean = ssum / n
        var = ssq / n - mean * mean
        return mean, jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)

    # conv1 from the resident activation
    ssum1, ssq1 = conv_pass(
        lambda r0, k: cur[pl.ds(r0, k)], 0, write_y1)
    if save_res:
        sums_ref[0, 0, 0, 0] = ssum1[0]
        sums_ref[0, 0, 0, 1] = ssq1[0]
    m1, r1 = moments(ssum1, ssq1)

    # IN+relu(y1) -> conv2, prologue-normalized per slab
    ssum2, ssq2 = conv_pass(read_y1, 1, write_y2, stats=(m1, r1))
    if save_res:
        sums_ref[0, 0, 1, 0] = ssum2[0]
        sums_ref[0, 0, 1, 1] = ssq2[0]
    m2, r2 = moments(ssum2, ssq2)

    # tail: out = skip + IN(y2) (matches instance_norm._normalize_add_kernel)
    def tail(s, _):
        sl = pl.ds(s * SH, SH)
        y2f = read_y2(sl).astype(jnp.float32)
        xn = (y2f - m2[None]) * r2[None]
        o = (cur[sl].astype(jnp.float32) + xn).astype(cur.dtype)
        if save_res:
            outs_ref[0, 0, sl] = o
        else:
            @pl.when(i == n_blocks - 1)
            def _():
                out_ref[0, sl] = o

        cur[sl] = o
        return 0

    jax.lax.fori_loop(0, n_slabs, tail, 0)


def _chain_dispatch(x, w1s, b1s, w2s, b2s):
    """Shared dispatch scaffolding for both forward variants: slab pick
    (the gate's _chain_slab — MUST stay shared, see its docstring),
    weight/bias packing ((N, 2, 3, 3C, C): conv index then ty, with
    (tx, c_in) stacked — the packing _conv9 consumes), VMEM limit."""
    N = w1s.shape[0]
    B, H, W, C = x.shape
    SH = _chain_slab(H, W, C)
    if not SH or H % SH:
        raise ValueError(
            f"no chain slab divides H={H} at (W={W}, C={C}) — gate with "
            "resblock_chain_ok before calling the chain kernels")
    w3 = jnp.stack(
        [w1s.reshape(N, 3, 3 * C, C), w2s.reshape(N, 3, 3 * C, C)], axis=1)
    bs = jnp.stack([b1s, b2s], axis=1)  # (N, 2, C)
    vmem = min(
        _chain_vmem_bytes(B, H, W, C, SH, x.dtype.itemsize)
        + 8 * 1024 * 1024,
        _VMEM_CAP)
    return N, B, H, W, C, SH, w3, bs, vmem


def _chain_forward(x, w1s, b1s, w2s, b2s, eps):
    N, B, H, W, C, SH, w3, bs, vmem = _chain_dispatch(x, w1s, b1s, w2s, b2s)

    img = pl.BlockSpec((1, 1, H, W, C), lambda b, i: (i, b, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    outs, y1s, y2s, sums = pl.pallas_call(
        functools.partial(_chain_kernel, SH, H, W, C, eps, True, N),
        grid=(B, N),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 3, 3 * C, C), lambda b, i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, C), lambda b, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            img, img, img,
            pl.BlockSpec((1, 1, 2, 2, C), lambda b, i: (i, b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, B, H, W, C), x.dtype),
            jax.ShapeDtypeStruct((N, B, H, W, C), x.dtype),
            jax.ShapeDtypeStruct((N, B, H, W, C), x.dtype),
            jax.ShapeDtypeStruct((N, B, 2, 2, C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((H, W, C), x.dtype),
            pltpu.VMEM((SH + 2, W, 3 * C), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem,
        ),
        interpret=_interpret(),
    )(x, w3, bs)
    return outs, y1s, y2s, sums


def _chain_forward_infer(x, w1s, b1s, w2s, b2s, eps):
    """The chain forward WITHOUT residual outputs: y1/y2 live in scratch
    and only the final activation leaves VMEM — the per-block residual
    writes (3 images per block) are the inference forward's dominant HBM
    traffic. Identical math/slab order to the residual-saving kernel."""
    N, B, H, W, C, SH, w3, bs, vmem = _chain_dispatch(x, w1s, b1s, w2s, b2s)

    return pl.pallas_call(
        functools.partial(_chain_kernel, SH, H, W, C, eps, False, N),
        grid=(B, N),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 3, 3 * C, C), lambda b, i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, C), lambda b, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda b, i: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((H, W, C), x.dtype),
            pltpu.VMEM((H, W, C), x.dtype),
            pltpu.VMEM((H, W, C), x.dtype),
            pltpu.VMEM((SH + 2, W, 3 * C), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem,
        ),
        interpret=_interpret(),
    )(x, w3, bs)


# ---------------------------------------------------------------------------
# public op: custom VJP over the stacked block parameters
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def resblock_chain_fused(x: Array, w1s: Array, b1s: Array, w2s: Array,
                         b2s: Array, eps: float = 1e-5) -> Array:
    """N chained resnet blocks (reflect/'same', instance norm, relu) in one
    forward kernel. ``w1s``: (N, 3, 3, C, C); ``b1s``: (N, C); etc.

    Exact re-expression of applying :func:`resblock.resblock_fused` N
    times; backward runs the SAME per-block VJP kernels on the residuals
    this forward saves."""
    outs, _, _, _ = _chain_forward(x, w1s, b1s, w2s, b2s, eps)
    return outs[-1]


def _chain_fwd(x, w1s, b1s, w2s, b2s, eps):
    outs, y1s, y2s, sums = _chain_forward(x, w1s, b1s, w2s, b2s, eps)
    return outs[-1], (x, outs, y1s, y2s, sums, w1s, b1s, w2s, b2s)


def _chain_bwd(eps, res, dout):
    x, outs, y1s, y2s, sums, w1s, b1s, w2s, b2s = res
    N = w1s.shape[0]
    B, H, W, C = x.shape
    n = H * W
    dw1, db1, dw2, db2 = [], [], [], []
    d = dout
    for i in range(N - 1, -1, -1):
        # identical to resblock._rb_bwd, on this block's saved residuals
        m1, r1 = _sums_to_moments(sums[i, :, 0], n, eps)
        m2, r2 = _sums_to_moments(sums[i, :, 1], n, eps)
        xi = x if i == 0 else outs[i - 1]
        dy2 = _bwd_dx(eps, None, y2s[i].reshape(B, n, C), m2, r2,
                      d.reshape(B, n, C)).reshape(x.shape)
        dh1, dW2, dB2 = _conv_bwd(dy2, y1s[i], w2s[i], stats=(m1, r1))
        dy1 = _bwd_dx(eps, 0.0, y1s[i].reshape(B, n, C), m1, r1,
                      dh1.reshape(B, n, C)).reshape(x.shape)
        d, dW1, dB1 = _conv_bwd(dy1, xi, w1s[i], dout=d)
        dw1.append(dW1); db1.append(dB1); dw2.append(dW2); db2.append(dB2)
    stack = lambda ts, like: jnp.stack(ts[::-1]).astype(like.dtype)
    return (d, stack(dw1, w1s), stack(db1, b1s),
            stack(dw2, w2s), stack(db2, b2s))


resblock_chain_fused.defvjp(_chain_fwd, _chain_bwd)
