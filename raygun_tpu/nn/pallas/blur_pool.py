"""Pallas TPU kernel: anti-aliased blur-pool downsampling.

Capability parity with reference ``src/raygun/torch/utils/antialias.py``
(Adobe antialiased-CNNs ``Downsample``: binomial low-pass filter + stride).
The 2D path is a hand-written Pallas kernel (separable binomial filter fused
with the strided subsample in VMEM — one HBM round-trip instead of the
pad→conv→conv→slice chain); N-D and CPU fall back to an XLA separable conv
with identical numerics (tested against each other).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..layers import Array, pad_spatial


def binomial_kernel(filt_size: int) -> np.ndarray:
    """Rows of Pascal's triangle, normalized (reference antialias.py filters)."""
    a = np.array([1.0])
    for _ in range(filt_size - 1):
        a = np.convolve(a, [1.0, 1.0])
    return (a / a.sum()).astype(np.float32)


# ---------------------------------------------------------------------------
# XLA reference path (N-D)
# ---------------------------------------------------------------------------

def blur_pool_xla(x: Array, stride: int = 2, filt_size: int = 3,
                  pad_mode: str = "reflect") -> Array:
    """(*spatial, C) -> blurred + strided, any ndims."""
    nd = x.ndim - 1
    k = jnp.asarray(binomial_kernel(filt_size))
    pad_lo = (filt_size - 1) // 2
    pad_hi = filt_size - 1 - pad_lo
    x = pad_spatial(x[None], [(pad_lo, pad_hi)] * nd, pad_mode)[0]
    y = x
    for ax in range(nd):
        kshape = [1] * (nd + 2)
        kshape[ax] = filt_size
        kernel = k.reshape(kshape[:nd] + [1, 1])
        sp = "".join(chr(ord("0") + i) for i in range(nd))
        dn = jax.lax.conv_dimension_numbers(
            (1,) * (nd + 2), (1,) * (nd + 2), ("N" + sp + "C", sp + "IO", "N" + sp + "C")
        )
        strides = [stride if a == ax else 1 for a in range(nd)]
        c = y.shape[-1]
        y = jax.lax.conv_general_dilated(
            y[None], jnp.broadcast_to(kernel, kernel.shape[:-1] + (c,)),
            window_strides=strides, padding="VALID", dimension_numbers=dn,
            feature_group_count=c,
        )[0]
    return y


# ---------------------------------------------------------------------------
# Pallas kernel (2D)
# ---------------------------------------------------------------------------

def _blur_pool2d_kernel(x_hbm, s_ref, o_ref, scratch, sem, *, stride: int,
                        k: tuple, tile_rows: int):
    """One row-tile: DMA the overlapping input slab HBM→VMEM, vertical
    binomial filter via row slices (sublane-free axis), then the horizontal
    filter + subsample folded into ONE MXU matmul with a precomputed
    selection matrix S (Wp × W_out): out[..., j] = Σ_w v[..., w]·S[w, j].

    Layout: (rows, C, Wp) — W on lanes (padded to 128-multiples), C on
    sublanes. Overlapping tiles can't be expressed with BlockSpec
    (index_map is block-granular), so the input stays in ANY/HBM and each
    program DMAs its ``tile_rows*stride + K - 1`` row slab explicitly.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    in_rows = tile_rows * stride + len(k) - 1
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * tile_rows * stride, in_rows)], scratch, sem
    )
    dma.start()
    dma.wait()

    x = scratch[:]
    K = len(k)
    # vertical filter along dim 0 (not a tiled dim: offsets are free)
    acc = None
    for a in range(K):
        part = k[a] * jax.lax.slice_in_dim(x, a, a + x.shape[0] - (K - 1), axis=0)
        acc = part if acc is None else acc + part
    rows, c, wp = acc.shape
    v = acc.reshape(rows // stride, stride, c, wp)[:, 0]  # leading-dim subsample
    # horizontal filter + subsample: one MXU matmul against S
    w_out = o_ref.shape[-1]
    flat = v.reshape(v.shape[0] * c, wp)
    out = jnp.dot(flat, s_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = out.reshape(v.shape[0], c, w_out).astype(o_ref.dtype)


def blur_pool_2d_pallas(x: Array, stride: int = 2, filt_size: int = 3,
                        pad_mode: str = "reflect", tile_rows: int = 8) -> Array:
    """(H, W, C) anti-aliased downsample as a Pallas kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W, C = x.shape
    K = filt_size
    pad_lo = (K - 1) // 2
    pad_hi = K - 1 - pad_lo
    H_out = (H + stride - 1) // stride
    W_out = (W + stride - 1) // stride
    kk = binomial_kernel(K)

    # layout (H, C, W): W on lanes, padded to a 128 multiple
    xt = jnp.moveaxis(x, -1, 1)
    xp = jnp.pad(xt, ((pad_lo, pad_hi), (0, 0), (0, 0)),
                 mode={"reflect": "reflect", "replicate": "edge", "zeros": "constant"}[pad_mode])
    Wp = -(-(W + K - 1) // 128) * 128
    # horizontal pad: K//2 reflect + zero-fill to Wp
    left = jnp.flip(xp[:, :, 1:1 + pad_lo], axis=2) if pad_mode == "reflect" else (
        jnp.repeat(xp[:, :, :1], pad_lo, 2) if pad_mode == "replicate"
        else jnp.zeros(xp.shape[:2] + (pad_lo,), xp.dtype))
    right_src = jnp.flip(xp[:, :, W - pad_hi - 1:W - 1], axis=2) if pad_mode == "reflect" else (
        jnp.repeat(xp[:, :, W - 1:W], pad_hi, 2) if pad_mode == "replicate"
        else jnp.zeros(xp.shape[:2] + (pad_hi,), xp.dtype))
    xp = jnp.concatenate(
        [left, xp, right_src,
         jnp.zeros(xp.shape[:2] + (Wp - W - K + 1,), xp.dtype)], axis=2)

    # selection matrix folding horizontal filter + stride: S[w, j] = k[w - j*stride]
    S = np.zeros((Wp, W_out), np.float32)
    for j in range(W_out):
        for a in range(K):
            S[j * stride + a, j] = kk[a]
    S = jnp.asarray(S)

    # pad rows so the grid is exact
    TH = tile_rows
    n_tiles = -(-H_out // TH)
    extra_rows = n_tiles * TH * stride + K - 1 - xp.shape[0]
    if extra_rows > 0:
        xp = jnp.pad(xp, ((0, extra_rows), (0, 0), (0, 0)), mode="edge")

    in_rows = TH * stride + K - 1
    k = tuple(float(v) for v in kk)

    out = pl.pallas_call(
        partial(_blur_pool2d_kernel, stride=stride, k=k, tile_rows=TH),
        out_shape=jax.ShapeDtypeStruct((n_tiles * TH, C, W_out), x.dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TH, C, W_out), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((in_rows, C, Wp), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp, S)
    return jnp.moveaxis(out[:H_out], 1, -1)


class Downsample(nn.Module):
    """Anti-aliased downsampling module (reference ``antialias.py:18-151``
    capability): binomial blur then stride. Uses the Pallas kernel for 2D
    channels-last inputs on TPU; XLA separable convs elsewhere."""

    stride: int = 2
    filt_size: int = 3
    pad_mode: str = "reflect"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        nd = x.ndim - 2  # (B, *spatial, C)
        use_pallas = (
            nd == 2
            and jax.default_backend() in ("tpu",)
            and x.shape[0] == 1
        )
        if use_pallas:
            return blur_pool_2d_pallas(x[0], self.stride, self.filt_size,
                                       self.pad_mode)[None]
        return jax.vmap(
            lambda v: blur_pool_xla(v, self.stride, self.filt_size, self.pad_mode)
        )(x)
