"""Pallas TPU kernel: the resblock CHAIN's whole backward in ONE call.

With the per-block resident backward (``resblock_bwd.py``: two kernels per
block), the only inter-block HBM traffic left in the generator chain's
backward is the flow-through cotangent: block k's ``dx`` is written to HBM
and read back twice by block k-1 (kernel A's ``dout`` and kernel B's skip
term). Unlike the forward chain (whose per-block outputs must hit HBM
anyway as backward residuals — measured neutral, ``resblock_chain.py``),
the backward cotangent is needed by NOTHING but the next block, so
chaining removes real traffic: per 6-block chain, 5 boundaries x
(1 write + 2 reads) x one image, plus the per-block dy1 round-trip the
A/B split re-reads — ~280 MB at (3, 128², 256) bf16, ~25% of the chain
backward's scheduled bytes.

Design: grid = (N, B) sequential (block-step outer, image minor — weight
gradients for block i accumulate over consecutive image steps, the only
order Pallas output revisiting allows). The cotangent for every image
lives in a (B, H, W, C) VMEM scratch across all N block-steps. The big
per-block tensors (y1, y2, block inputs, the incoming cotangent) stay in
HBM (``pl.ANY``) and are staged image-at-a-time through ONE shared VMEM
scratch by async DMA, in dependency order y2 -> y1 -> x (each overlaps
the previous compute phase). Per (block, image) step the kernel runs the
exact per-block sequence of ``resblock_bwd``:

  IN2-bwd stats -> dy2 (scratch A) -> conv2ᵀ -> dh1 (scratch B) ->
  conv2 wgrad vs h1(y1) -> relu∘IN1-bwd -> dy1 (overwrites A) ->
  conv1ᵀ + reflect-fold + skip -> dout (in place) -> conv1 wgrad vs x

writing dx to HBM only once per image, at the last block-step.

Exactness: identical formulas, slab association, and bf16 rounding
points as chaining ``resblock_bwd.rb_bwd_fused`` per block (dy2/dh1/dy1
and the inter-block cotangent round to bf16 exactly where that route
materializes them; stats and all accumulation fp32) — the chain is
bit-exact against the per-block composition; parity-tested (values and
grads, vs both the per-block kernels and the unfused module) in
tests/nn/test_resblock_chain_bwd.py.

Reference: the torch blocks this backward serves are ``ResNet.py:127-223``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .resblock import _interpret, _rb_forward
from .resblock_bwd import (
    _asm_reflect,
    _bwd_slab,
    _convT_slab,
    _flip_pack,
    _fold_reflect,
    _wgrad_slab,
)

Array = jax.Array

_VMEM_CAP = 100 * 1024 * 1024


def _chain_bwd_vmem_bytes(B, H, W, C, SH, itemsize):
    img = H * W * C * itemsize
    w_blk = 3 * 3 * C * C * itemsize
    taps = (SH + 4) * (W + 2) * 3 * C * itemsize
    ap3 = (SH + 2) * W * 3 * C * itemsize
    dw = 3 * 3 * C * C * 4
    # img + A + B staging/scratch, per-image dout carry, double-buffered
    # weight packs and stats, double-buffered dw/db outs, slab temporaries
    return 3 * img + B * img + 2 * 2 * w_blk + 2 * 2 * dw \
        + taps + ap3 + 4 * 1024 * 1024


def _batch_chunk(B, H, W, C, SH, itemsize) -> int:
    """Largest per-call batch whose working set fits: batches beyond it
    dispatch as multiple kernel calls (dx concat is exact; the dw chunk
    partials add once per chunk — the same fp32 reassociation class as
    batching sibling applies, systems/cyclegan.py)."""
    for bc in range(B, 0, -1):
        if _chain_bwd_vmem_bytes(bc, H, W, C, SH, itemsize) <= _VMEM_CAP:
            return bc
    return 0


def rb_chain_bwd_ok(x: Array, n_blocks: int) -> bool:
    if os.environ.get("RAYGUN_DISABLE_PALLAS_RBCHAINBWD"):
        return False
    if n_blocks < 2 or x.ndim != 4 or x.dtype != jnp.bfloat16:
        return False
    B, H, W, C = x.shape
    if C % 128 or W < 8 or H < 16:
        return False
    SH = _bwd_slab(H, W, C)
    if not SH:
        return False
    if not _batch_chunk(B, H, W, C, SH, 2):
        return False
    if H * W * C * B < (1 << 20):
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


# ---------------------------------------------------------------------------
# the chain backward kernel
# ---------------------------------------------------------------------------

def _chain_bwd_kernel(SH, H, W, C, N, B,
                      # ANY (HBM) inputs
                      x_hbm, outs_hbm, y1_hbm, y2_hbm, dout0_hbm,
                      # VMEM blocked inputs
                      w1f_ref, w2f_ref, m1_ref, r1_ref, m2_ref, r2_ref,
                      # outputs: dx in HBM; wgrads blocked VMEM
                      dx_hbm, dw1_ref, db1_ref, dw2_ref, db2_ref,
                      # scratch
                      img, A, Bs, dout_scr, dz3, ap3,
                      sem_img, sem_dout, sem_dx):
    t = pl.program_id(0)
    b = pl.program_id(1)
    i_blk = N - 1 - t
    n_slabs = H // SH
    n = jnp.float32(H * W)
    m1 = m1_ref[0, 0, 0, :][None, None, :]
    r1 = r1_ref[0, 0, 0, :][None, None, :]
    m2 = m2_ref[0, 0, 0, :][None, None, :]
    r2 = r2_ref[0, 0, 0, :][None, None, :]

    def rows_of_scr(scr):
        return lambda r0, k: scr[pl.ds(r0, k)]

    # ---- stage y2_i (shared img scratch) + the incoming cotangent ----
    cp_y2 = pltpu.make_async_copy(y2_hbm.at[i_blk, b], img, sem_img)
    cp_y2.start()

    @pl.when(t == 0)
    def _():
        cp = pltpu.make_async_copy(dout0_hbm.at[b], dout_scr.at[b],
                                   sem_dout)
        cp.start()
        cp.wait()

    cp_y2.wait()

    # ---- IN2-bwd stats over (dout, y2) ----
    def s2(s, carry):
        sg, sgy = carry
        sl = pl.ds(s * SH, SH)
        g = dout_scr[b, sl].astype(jnp.float32)
        yh = (img[sl].astype(jnp.float32) - m2) * r2
        return (sg + jnp.sum(g.reshape(SH * W, C), axis=0, keepdims=True),
                sgy + jnp.sum((g * yh).reshape(SH * W, C), axis=0,
                              keepdims=True))

    zero = jnp.zeros((1, C), jnp.float32)
    sg2, sgy2 = jax.lax.fori_loop(0, n_slabs, s2, (zero, zero))
    mg2, mgy2 = (sg2 / n)[None], (sgy2 / n)[None]

    # ---- A = dy2 = r2*(dout - mg2 - yhat2*mgy2), bf16 ----
    def p2(s, _):
        sl = pl.ds(s * SH, SH)
        g = dout_scr[b, sl].astype(jnp.float32)
        yh = (img[sl].astype(jnp.float32) - m2) * r2
        A[sl] = (r2 * (g - mg2 - yh * mgy2)).astype(A.dtype)
        return 0

    jax.lax.fori_loop(0, n_slabs, p2, 0)

    # ---- stage y1_i over img; conv2ᵀ needs only A meanwhile ----
    cp_y1 = pltpu.make_async_copy(y1_hbm.at[i_blk, b], img, sem_img)
    cp_y1.start()

    # ---- Bs = dh1 = conv2ᵀ(A), reflect-fold, bf16 ----
    def p3(s, _):
        accp = _convT_slab(rows_of_scr(A), s, w2f_ref.at[0], dz3,
                           SH, H, W, C)
        Bs[pl.ds(s * SH, SH)] = _fold_reflect(
            accp, s, SH, W, n_slabs).astype(Bs.dtype)
        return 0

    jax.lax.fori_loop(0, n_slabs, p3, 0)
    cp_y1.wait()

    # ---- conv2 wgrad/bias-grad against h1 = relu(IN(y1)) ----
    def p4(s, _):
        ap = _asm_reflect(rows_of_scr(img), s, SH, H)
        h1 = jnp.maximum((ap.astype(jnp.float32) - m1) * r1, 0.0)
        dy_slab = A[pl.ds(s * SH, SH)]
        first = (b == 0) & (s == 0)
        _wgrad_slab(h1.astype(dy_slab.dtype), dy_slab, ap3,
                    dw2_ref.at[0], first, SH, W, C)
        dsum = jnp.sum(dy_slab.astype(jnp.float32).reshape(SH * W, C),
                       axis=0, keepdims=True)

        @pl.when(first)
        def _():
            db2_ref[0, 0, :] = dsum[0]

        @pl.when(jnp.logical_not(first))
        def _():
            db2_ref[0, 0, :] += dsum[0]

        return 0

    jax.lax.fori_loop(0, n_slabs, p4, 0)

    # ---- relu∘IN1-bwd stats over (Bs, y1) ----
    def s1(s, carry):
        sg, sgy = carry
        sl = pl.ds(s * SH, SH)
        yh = (img[sl].astype(jnp.float32) - m1) * r1
        g = Bs[sl].astype(jnp.float32)
        g = jnp.where(yh > 0, g, 0.0)
        return (sg + jnp.sum(g.reshape(SH * W, C), axis=0, keepdims=True),
                sgy + jnp.sum((g * yh).reshape(SH * W, C), axis=0,
                              keepdims=True))

    sg1, sgy1 = jax.lax.fori_loop(0, n_slabs, s1, (zero, zero))
    mg1, mgy1 = (sg1 / n)[None], (sgy1 / n)[None]

    # ---- A = dy1 (overwrites dy2 — both its consumers are done) ----
    def p5(s, _):
        sl = pl.ds(s * SH, SH)
        yh = (img[sl].astype(jnp.float32) - m1) * r1
        g = Bs[sl].astype(jnp.float32)
        g = jnp.where(yh > 0, g, 0.0)
        A[sl] = (r1 * (g - mg1 - yh * mgy1)).astype(A.dtype)
        return 0

    jax.lax.fori_loop(0, n_slabs, p5, 0)

    # ---- stage the block input x_i = outs[i-1] (or x) over img ----
    @pl.when(i_blk == 0)
    def _():
        pltpu.make_async_copy(x_hbm.at[b], img, sem_img).start()

    @pl.when(i_blk > 0)
    def _():
        pltpu.make_async_copy(
            outs_hbm.at[jnp.maximum(i_blk - 1, 0), b], img,
            sem_img).start()

    # ---- dout <- conv1ᵀ(A) + reflect-fold + dout (in place, bf16) ----
    def p1(s, _):
        sl = pl.ds(s * SH, SH)
        accp = _convT_slab(rows_of_scr(A), s, w1f_ref.at[0], dz3,
                           SH, H, W, C)
        skip = dout_scr[b, sl].astype(jnp.float32)
        dout_scr[b, sl] = _fold_reflect(
            accp, s, SH, W, n_slabs, extra=skip).astype(dout_scr.dtype)
        return 0

    jax.lax.fori_loop(0, n_slabs, p1, 0)

    @pl.when(i_blk == 0)
    def _():
        pltpu.make_async_copy(x_hbm.at[b], img, sem_img).wait()

    @pl.when(i_blk > 0)
    def _():
        pltpu.make_async_copy(
            outs_hbm.at[jnp.maximum(i_blk - 1, 0), b], img,
            sem_img).wait()

    # ---- conv1 wgrad/bias-grad against x_i ----
    def p6(s, _):
        ap = _asm_reflect(rows_of_scr(img), s, SH, H)
        dy_slab = A[pl.ds(s * SH, SH)]
        first = (b == 0) & (s == 0)
        _wgrad_slab(ap, dy_slab, ap3, dw1_ref.at[0], first, SH, W, C)
        dsum = jnp.sum(dy_slab.astype(jnp.float32).reshape(SH * W, C),
                       axis=0, keepdims=True)

        @pl.when(first)
        def _():
            db1_ref[0, 0, :] = dsum[0]

        @pl.when(jnp.logical_not(first))
        def _():
            db1_ref[0, 0, :] += dsum[0]

        return 0

    jax.lax.fori_loop(0, n_slabs, p6, 0)

    # ---- the chain's dx leaves VMEM once, at the last block-step ----
    @pl.when(t == N - 1)
    def _():
        cp = pltpu.make_async_copy(dout_scr.at[b], dx_hbm.at[b], sem_dx)
        cp.start()
        cp.wait()


def rb_chain_bwd(x, outs, y1s, y2s, m1s, r1s, m2s, r2s, w1s, w2s, dout):
    """(dx, dw1s, db1s, dw2s, db2s) of N chained fused resblocks, one
    resident kernel (per batch chunk — see :func:`_batch_chunk`). Stacked
    residuals: ``outs``/``y1s``/``y2s`` are (N, B, H, W, C); stats
    (N, B, C); weights (N, 3, 3, C, C)."""
    N, B, H, W, C = y1s.shape
    SH = _bwd_slab(H, W, C)
    bc = _batch_chunk(B, H, W, C, SH, x.dtype.itemsize)
    if not bc:
        raise ValueError(
            f"chain-backward working set exceeds VMEM even at batch 1 for "
            f"(H={H}, W={W}, C={C}) — gate with rb_chain_bwd_ok")
    if bc < B:
        # images are independent in the backward: run the kernel per
        # batch chunk; dx concatenates exactly, dw/db partials add once
        # per chunk (fp32 reassociation only). Balance the chunks so all
        # calls share one compiled shape (bc=5 on B=8 would compile 5 AND
        # 3; ceil-balanced 4+4 compiles once).
        n_chunks = -(-B // bc)
        bc = -(-B // n_chunks)
        parts = [
            rb_chain_bwd(
                x[s:s + bc], outs[:, s:s + bc], y1s[:, s:s + bc],
                y2s[:, s:s + bc], m1s[:, s:s + bc], r1s[:, s:s + bc],
                m2s[:, s:s + bc], r2s[:, s:s + bc], w1s, w2s,
                dout[s:s + bc])
            for s in range(0, B, bc)
        ]
        dx = jnp.concatenate([p[0] for p in parts], axis=0)
        grads = [sum(p[i] for p in parts) for i in range(1, 5)]
        return (dx, *grads)
    rev = lambda t: N - 1 - t  # noqa: E731 — block order is reversed

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    wspec = pl.BlockSpec((1, 3, 3 * C, C), lambda t, b: (rev(t), 0, 0, 0),
                         memory_space=pltpu.VMEM)
    chan = pl.BlockSpec((1, 1, 1, C), lambda t, b: (rev(t), b, 0, 0),
                        memory_space=pltpu.VMEM)
    wgrad_specs = [
        pl.BlockSpec((1, 3, 3 * C, C), lambda t, b: (rev(t), 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, C), lambda t, b: (rev(t), 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    wgrad_shapes = [
        jax.ShapeDtypeStruct((N, 3, 3 * C, C), jnp.float32),
        jax.ShapeDtypeStruct((N, 1, C), jnp.float32),
    ]
    w1f = jax.vmap(lambda w: _flip_pack(w, C))(w1s)
    w2f = jax.vmap(lambda w: _flip_pack(w, C))(w2s)

    vmem = min(_chain_bwd_vmem_bytes(B, H, W, C, SH, x.dtype.itemsize)
               + 8 * 1024 * 1024, _VMEM_CAP + 10 * 1024 * 1024)
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_chain_bwd_kernel, SH, H, W, C, N, B),
        grid=(N, B),
        in_specs=[any_spec] * 5 + [wspec, wspec, chan, chan, chan, chan],
        out_specs=[any_spec] + wgrad_specs + wgrad_specs,
        out_shape=[jax.ShapeDtypeStruct((B, H, W, C), x.dtype)]
        + wgrad_shapes + wgrad_shapes,
        scratch_shapes=[
            pltpu.VMEM((H, W, C), x.dtype),      # img: y2 -> y1 -> x
            pltpu.VMEM((H, W, C), x.dtype),      # A: dy2 -> dy1
            pltpu.VMEM((H, W, C), x.dtype),      # Bs: dh1
            pltpu.VMEM((B, H, W, C), x.dtype),   # dout carry, all images
            pltpu.VMEM((SH + 4, W + 2, 3 * C), x.dtype),
            pltpu.VMEM((SH + 2, W, 3 * C), x.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem),
        interpret=_interpret(),
    )(x, outs, y1s, y2s, dout,
      w1f, w2f,
      m1s[:, :, None, :], r1s[:, :, None, :],
      m2s[:, :, None, :], r2s[:, :, None, :])
    return (dx, dw1.reshape(N, 3, 3, C, C), db1[:, 0],
            dw2.reshape(N, 3, 3, C, C), db2[:, 0])


# ---------------------------------------------------------------------------
# public op: the N-block chain with the per-block forward kernels and the
# chain-resident backward
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def resblock_chain_bwdfused(x: Array, w1s: Array, b1s: Array, w2s: Array,
                            b2s: Array, eps: float = 1e-5) -> Array:
    """N chained resnet blocks (reflect/'same', instance norm, relu):
    backward = ONE resident chain kernel (module docstring); when
    differentiated, the forward is the production per-block fused kernels
    (``resblock.py`` — custom_vjp runs ``_chain_fwd`` instead of this
    primal). The UNdifferentiated primal (inference/rendering) runs the
    no-residual resident chain (``resblock_chain._chain_forward_infer``):
    only the final activation leaves VMEM. Bit-exact against applying
    :func:`resblock.resblock_fused` N times either way."""
    from .resblock_chain import _chain_forward_infer, resblock_chain_ok

    if resblock_chain_ok(x, w1s.shape[0]):
        return _chain_forward_infer(x, w1s, b1s, w2s, b2s, eps)
    h = x
    for i in range(w1s.shape[0]):
        h, _ = _rb_forward(h, w1s[i], b1s[i], w2s[i], b2s[i], eps)
    return h


def _chain_fwd(x, w1s, b1s, w2s, b2s, eps):
    h = x
    outs, y1s, y2s, m1s, r1s, m2s, r2s = [], [], [], [], [], [], []
    for i in range(w1s.shape[0]):
        h, (y1, y2, m1, r1, m2, r2) = _rb_forward(
            h, w1s[i], b1s[i], w2s[i], b2s[i], eps)
        outs.append(h); y1s.append(y1); y2s.append(y2)
        m1s.append(m1); r1s.append(r1); m2s.append(m2); r2s.append(r2)
    res = (x, jnp.stack(outs), jnp.stack(y1s), jnp.stack(y2s),
           jnp.stack(m1s), jnp.stack(r1s), jnp.stack(m2s), jnp.stack(r2s),
           w1s, b1s, w2s, b2s)
    return h, res


def _chain_bwd(eps, res, dout):
    (x, outs, y1s, y2s, m1s, r1s, m2s, r2s, w1s, b1s, w2s, b2s) = res
    N = w1s.shape[0]
    if rb_chain_bwd_ok(x, N):
        dx, dw1, db1, dw2, db2 = rb_chain_bwd(
            x, outs, y1s, y2s, m1s, r1s, m2s, r2s, w1s, w2s, dout)
        return (dx, dw1.astype(w1s.dtype), db1.astype(b1s.dtype),
                dw2.astype(w2s.dtype), db2.astype(b2s.dtype))
    # fallback: the per-block backward composition (identical math)
    from .resblock import _rb_bwd

    dw1, db1, dw2, db2 = [], [], [], []
    d = dout
    for i in range(N - 1, -1, -1):
        xi = x if i == 0 else outs[i - 1]
        res_i = (xi, w1s[i], b1s[i], w2s[i], b2s[i], y1s[i], y2s[i],
                 m1s[i], r1s[i], m2s[i], r2s[i])
        d, dW1, dB1, dW2, dB2 = _rb_bwd(eps, res_i, d)
        dw1.append(dW1); db1.append(dB1); dw2.append(dW2); db2.append(dB2)
    stack = lambda ts, like: jnp.stack(ts[::-1]).astype(like.dtype)  # noqa
    return (d, stack(dw1, w1s), stack(db1, b1s),
            stack(dw2, w2s), stack(db2, b2s))


resblock_chain_bwdfused.defvjp(_chain_fwd, _chain_bwd)
