"""Pallas TPU kernels: fused instance normalization with custom VJP.

Why this exists (measured on v5e, ``scripts/perf_cyclegan_512.py``): the
CycleGAN generators interleave every conv with an affine-free instance
norm (reference ``ResNet.py`` norm_layer default). Under XLA the norm's
stats/normalize/backward reductions schedule as *many* separate full-
resolution HBM passes: at batch 3, a 3x3 256-channel conv at 128^2 costs
0.97 ms fwd+bwd while adding its instance norm costs +1.81 ms — ~7x the
norm's minimum achievable traffic. These kernels run the norm at its
traffic floor:

  forward   = 2 reads + 1 write   (stats pass fused over row tiles, then
                                   a normalize pass)
  backward  = 4 reads + 1 write   (grad-stats pass over (g, x), then the
                                   dx pass)

with all accumulation in fp32 (more accurate than XLA's bf16-accumulated
``jnp.mean``). Semantics match :func:`raygun_tpu.nn.layers.instance_norm`
(torch ``InstanceNormNd`` affine=False: per-(batch, channel) mean/var over
spatial dims, biased variance, ``rsqrt(var + eps)``).

The kernels view the tensor as ``(B, S, C)`` with S = prod(spatial) — the
layout is channels-last throughout the framework, so the reshape is free.
CPU/debug runs route through the XLA implementation automatically (module
``InstanceNorm(impl='auto')``); the Pallas path is parity-tested against
it in interpret mode (tests/nn/test_instance_norm_pallas.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# row-tile length for the (B, S, C) view. 2048 rows x 256ch x 2B = 1 MB
# blocks — big enough to saturate HBM streams, small enough to double-
# buffer in 16 MB VMEM at every channel count the generators use.
_TILE_S = 2048


def _grid_tiles(S: int) -> int:
    return -(-S // _TILE_S)


def _row_mask(t, S: int, shape) -> Array:
    """Valid-row mask for the (possibly partial) tail tile."""
    rows_left = S - t * _TILE_S
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0) < rows_left


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _stats_kernel(S, x_ref, out_ref):
    t = pl.program_id(1)
    xb = x_ref[0].astype(jnp.float32)  # (TILE_S, C)
    xb = jnp.where(_row_mask(t, S, xb.shape), xb, 0.0)
    s = jnp.sum(xb, axis=0)
    s2 = jnp.sum(xb * xb, axis=0)

    @pl.when(t == 0)
    def _():
        out_ref[0, 0, :] = s
        out_ref[0, 1, :] = s2

    @pl.when(t > 0)
    def _():
        out_ref[0, 0, :] += s
        out_ref[0, 1, :] += s2


def _normalize_kernel(x_ref, mean_ref, rstd_ref, y_ref):
    xb = x_ref[0].astype(jnp.float32)
    m = mean_ref[0, 0, :]
    r = rstd_ref[0, 0, :]
    y_ref[0] = ((xb - m[None, :]) * r[None, :]).astype(y_ref.dtype)


def _moments(x3: Array, eps: float) -> Tuple[Array, Array]:
    """Per-(b, c) mean and rsqrt(var + eps), fp32, via the stats kernel."""
    B, S, C = x3.shape
    sums = pl.pallas_call(
        functools.partial(_stats_kernel, S),
        grid=(B, _grid_tiles(S)),
        in_specs=[
            pl.BlockSpec((1, _TILE_S, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, C), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, C), jnp.float32),
    )(x3)
    mean = sums[:, 0, :] / S
    var = sums[:, 1, :] / S - mean * mean
    rstd = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    return mean, rstd


def _normalize(x3: Array, mean: Array, rstd: Array) -> Array:
    B, S, C = x3.shape
    return pl.pallas_call(
        _normalize_kernel,
        grid=(B, _grid_tiles(S)),
        in_specs=[
            pl.BlockSpec((1, _TILE_S, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TILE_S, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, C), x3.dtype),
    )(x3, mean[:, None, :], rstd[:, None, :])


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_stats_kernel(S, g_ref, x_ref, mean_ref, rstd_ref, out_ref):
    t = pl.program_id(1)
    gb = g_ref[0].astype(jnp.float32)
    xb = x_ref[0].astype(jnp.float32)
    mask = _row_mask(t, S, gb.shape)
    gb = jnp.where(mask, gb, 0.0)
    # mask x as well: tail-tile OOB reads can be NaN and 0*NaN = NaN
    xb = jnp.where(mask, xb, 0.0)
    yhat = (xb - mean_ref[0, 0, :][None, :]) * rstd_ref[0, 0, :][None, :]
    sg = jnp.sum(gb, axis=0)
    sgy = jnp.sum(gb * yhat, axis=0)

    @pl.when(t == 0)
    def _():
        out_ref[0, 0, :] = sg
        out_ref[0, 1, :] = sgy

    @pl.when(t > 0)
    def _():
        out_ref[0, 0, :] += sg
        out_ref[0, 1, :] += sgy


def _bwd_apply_kernel(g_ref, x_ref, mean_ref, rstd_ref, mg_ref, mgy_ref, dx_ref):
    gb = g_ref[0].astype(jnp.float32)
    xb = x_ref[0].astype(jnp.float32)
    m = mean_ref[0, 0, :][None, :]
    r = rstd_ref[0, 0, :][None, :]
    yhat = (xb - m) * r
    dx = r * (gb - mg_ref[0, 0, :][None, :] - yhat * mgy_ref[0, 0, :][None, :])
    dx_ref[0] = dx.astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def instance_norm_fused(x: Array, eps: float = 1e-5) -> Array:
    """Instance norm (affine=False) with fused Pallas stats/normalize and a
    traffic-floor custom VJP. ``x``: channels-last ``(B, *spatial, C)``."""
    y, _ = _fwd(x, eps)
    return y


def _fwd(x: Array, eps: float):
    B, C = x.shape[0], x.shape[-1]
    S = 1
    for s in x.shape[1:-1]:
        S *= s
    x3 = x.reshape(B, S, C)
    mean, rstd = _moments(x3, eps)
    y = _normalize(x3, mean, rstd).reshape(x.shape)
    return y, (x3, mean, rstd, x.shape)


def _fwd_rule(x: Array, eps: float):
    y, res = _fwd(x, eps)
    return y, res


def _bwd_rule(eps: float, res, g: Array):
    x3, mean, rstd, orig_shape = res
    B, S, C = x3.shape
    g3 = g.reshape(B, S, C)
    sums = pl.pallas_call(
        functools.partial(_bwd_stats_kernel, S),
        grid=(B, _grid_tiles(S)),
        in_specs=[
            pl.BlockSpec((1, _TILE_S, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE_S, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, C), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, C), jnp.float32),
    )(g3, x3, mean[:, None, :], rstd[:, None, :])
    mg = sums[:, 0, :] / S
    mgy = sums[:, 1, :] / S
    dx = pl.pallas_call(
        _bwd_apply_kernel,
        grid=(B, _grid_tiles(S)),
        in_specs=[
            pl.BlockSpec((1, _TILE_S, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE_S, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TILE_S, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, C), g3.dtype),
    )(g3, x3, mean[:, None, :], rstd[:, None, :], mg[:, None, :],
      mgy[:, None, :])
    return (dx.reshape(orig_shape),)


instance_norm_fused.defvjp(_fwd_rule, _bwd_rule)


def tpu_available() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
