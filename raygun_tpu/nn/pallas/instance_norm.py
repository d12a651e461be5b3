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


def _interpret() -> bool:
    """Plain interpret mode off-TPU (CPU tests, incl. under shard_map
    meshes — the force_tpu_interpret_mode emulation stalls under
    shard_map, measured; plain interpret composes fine)."""
    try:
        return jax.devices()[0].platform not in ("tpu", "axon")
    except Exception:
        return True


# row-tile length for the (B, S, C) view. 2048 rows x 256ch x 2B = 1 MB
# blocks — big enough to saturate HBM streams, small enough to double-
# buffer in 16 MB VMEM. Beyond C=256 the kernels' fp32 temporaries
# (~4 buffers x rows x C x 4B in the bwd-apply kernel) overflow the
# 16 MB scoped-VMEM stack, so the row count scales down with C
# (C=512 at 2048 rows measured 17.98M scoped alloc -> compile OOM).
_TILE_S = 2048


def _tile_rows(C: int) -> int:
    if C <= 256:
        return _TILE_S
    return max(256, _TILE_S * 256 // C)


def _grid_tiles(S: int, ts: int = _TILE_S) -> int:
    return -(-S // ts)


def _row_mask(t, S: int, shape, ts: int = _TILE_S) -> Array:
    """Valid-row mask for the (possibly partial) tail tile."""
    rows_left = S - t * ts
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0) < rows_left


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _stats_kernel(S, ts, x_ref, out_ref):
    t = pl.program_id(1)
    xb = x_ref[0].astype(jnp.float32)  # (ts, C)
    xb = jnp.where(_row_mask(t, S, xb.shape, ts), xb, 0.0)
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


def _normalize_act_kernel(slope, x_ref, mean_ref, rstd_ref, y_ref):
    xb = x_ref[0].astype(jnp.float32)
    m = mean_ref[0, 0, :]
    r = rstd_ref[0, 0, :]
    yhat = (xb - m[None, :]) * r[None, :]
    y_ref[0] = jnp.where(yhat > 0, yhat, slope * yhat).astype(y_ref.dtype)


def _normalize_add_kernel(x_ref, res_ref, mean_ref, rstd_ref, y_ref):
    xb = x_ref[0].astype(jnp.float32)
    rb = res_ref[0].astype(jnp.float32)
    m = mean_ref[0, 0, :]
    r = rstd_ref[0, 0, :]
    y_ref[0] = ((xb - m[None, :]) * r[None, :] + rb).astype(y_ref.dtype)


def _moments(x3: Array, eps: float, group: int = None) -> Tuple[Array, Array]:
    """Per-(b, c) mean and rsqrt(var + eps), fp32, via the stats kernel.

    ``group=f``: ``x3`` is ALREADY phase-major folded (s2d-packed layout,
    channel = phase*C + c) — stats fold across the f phase groups without
    any reshape of the data (exact: IN doesn't care where fine voxels sit)."""
    B, S, C = x3.shape
    if group is None:
        f = _fold_factor(S, C)
        xf = _fold(x3, f)
    else:
        f = group
        C = C // f
        xf = x3
    Sf, Cf = xf.shape[1], xf.shape[2]
    ts = _tile_rows(Cf)
    sums = pl.pallas_call(
        functools.partial(_stats_kernel, Sf, ts),
        grid=(B, _grid_tiles(Sf, ts)),
        in_specs=[
            pl.BlockSpec((1, ts, Cf), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, Cf), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, Cf), jnp.float32),
        interpret=_interpret(),
    )(xf)
    if f > 1:
        sums = sums.reshape(B, 2, f, C).sum(axis=2)
    n = Sf * f  # fine elements per (b, c); == S on the unfolded path
    mean = sums[:, 0, :] / n
    var = sums[:, 1, :] / n - mean * mean
    rstd = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    return mean, rstd


def _tile_spec(C, ts: int = _TILE_S):
    return pl.BlockSpec((1, ts, C), lambda b, t: (b, t, 0),
                        memory_space=pltpu.VMEM)


def _chan_spec(C):
    return pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def _normalize(x3: Array, mean: Array, rstd: Array, slope=None,
               residual: Array = None, group: int = None) -> Array:
    B, S, C = x3.shape
    if group is None:
        f = _fold_factor(S, C)
        xf = _fold(x3, f)
    else:
        f = group
        C = C // f
        xf = x3
    Sf, Cf = xf.shape[1], xf.shape[2]
    if f > 1:
        mean = jnp.tile(mean, (1, f))
        rstd = jnp.tile(rstd, (1, f))
    ts = _tile_rows(Cf)
    if residual is not None:
        resf = residual if group is not None else _fold(residual, f)
        y = pl.pallas_call(
            _normalize_add_kernel,
            grid=(B, _grid_tiles(Sf, ts)),
            in_specs=[_tile_spec(Cf, ts), _tile_spec(Cf, ts),
                      _chan_spec(Cf), _chan_spec(Cf)],
            out_specs=_tile_spec(Cf, ts),
            out_shape=jax.ShapeDtypeStruct((B, Sf, Cf), x3.dtype),
            interpret=_interpret(),
        )(xf, resf, mean[:, None, :], rstd[:, None, :])
        return y if group is not None else _unfold(y, f, C)
    kernel = (_normalize_kernel if slope is None
              else functools.partial(_normalize_act_kernel, slope))
    y = pl.pallas_call(
        kernel,
        grid=(B, _grid_tiles(Sf, ts)),
        in_specs=[_tile_spec(Cf, ts), _chan_spec(Cf), _chan_spec(Cf)],
        out_specs=_tile_spec(Cf, ts),
        out_shape=jax.ShapeDtypeStruct((B, Sf, Cf), x3.dtype),
        interpret=_interpret(),
    )(xf, mean[:, None, :], rstd[:, None, :])
    return y if group is not None else _unfold(y, f, C)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_stats_kernel(S, ts, slope, g_ref, x_ref, mean_ref, rstd_ref,
                      out_ref):
    t = pl.program_id(1)
    gb = g_ref[0].astype(jnp.float32)
    xb = x_ref[0].astype(jnp.float32)
    mask = _row_mask(t, S, gb.shape, ts)
    gb = jnp.where(mask, gb, 0.0)
    # mask x as well: tail-tile OOB reads can be NaN and 0*NaN = NaN
    xb = jnp.where(mask, xb, 0.0)
    m = mean_ref[0, 0, :][None, :]
    yhat = (xb - m) * rstd_ref[0, 0, :][None, :]
    if slope is not None:
        # d act(yhat): scale the incoming grad where yhat <= 0
        gb = jnp.where(yhat > 0, gb, slope * gb)
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


def _bwd_apply_kernel(slope, g_ref, x_ref, mean_ref, rstd_ref, mg_ref, mgy_ref,
                      dx_ref):
    gb = g_ref[0].astype(jnp.float32)
    xb = x_ref[0].astype(jnp.float32)
    m = mean_ref[0, 0, :][None, :]
    r = rstd_ref[0, 0, :][None, :]
    yhat = (xb - m) * r
    if slope is not None:
        gb = jnp.where(yhat > 0, gb, slope * gb)
    dx = r * (gb - mg_ref[0, 0, :][None, :] - yhat * mgy_ref[0, 0, :][None, :])
    dx_ref[0] = dx.astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

def _as3d(x: Array):
    B, C = x.shape[0], x.shape[-1]
    S = 1
    for s in x.shape[1:-1]:
        S *= s
    return x.reshape(B, S, C)


def _fold_factor(S: int, C: int) -> int:
    """Lane folding for C < 128: view (B, S, C) as (B, S/f, f*C) so VPU
    lanes stay full (a C=64 bf16 tensor wastes half of every 128-lane
    vector op; measured 8x slowdown on the standalone C=64 kernels).
    Row-major reshape maps element (q*f + r, c) -> (q, r*C + c), so
    folded-lane stats fold back with a (f, C) sum and per-channel stats
    broadcast with jnp.tile."""
    if C >= 128 or C < 1:
        return 1
    f = 128 // C
    while f > 1 and S % f:
        f //= 2
    return max(f, 1)


def _fold(x3: Array, f: int) -> Array:
    if f == 1:
        return x3
    B, S, C = x3.shape
    return x3.reshape(B, S // f, f * C)


def _unfold(y3: Array, f: int, C: int) -> Array:
    if f == 1:
        return y3
    B, Sf, _ = y3.shape
    return y3.reshape(B, Sf * f, C)


def _bwd_dx(eps: float, slope, x3, mean, rstd, g3, group: int = None) -> Array:
    """dx of (act∘)instance_norm at the traffic floor: one grad-stats pass
    over (g, x), one apply pass. ``slope``: None = no activation,
    0.0 = relu, else leaky-relu negative slope. ``group``: see _moments."""
    B, S, C = x3.shape
    if group is None:
        f = _fold_factor(S, C)
        xf, gf = _fold(x3, f), _fold(g3, f)
    else:
        f = group
        C = C // f
        xf, gf = x3, g3
    Sf, Cf = xf.shape[1], xf.shape[2]
    ts = _tile_rows(Cf)
    mean_f = jnp.tile(mean, (1, f)) if f > 1 else mean
    rstd_f = jnp.tile(rstd, (1, f)) if f > 1 else rstd
    sums = pl.pallas_call(
        functools.partial(_bwd_stats_kernel, Sf, ts, slope),
        grid=(B, _grid_tiles(Sf, ts)),
        in_specs=[_tile_spec(Cf, ts), _tile_spec(Cf, ts), _chan_spec(Cf),
                  _chan_spec(Cf)],
        out_specs=pl.BlockSpec((1, 2, Cf), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, Cf), jnp.float32),
        interpret=_interpret(),
    )(gf, xf, mean_f[:, None, :], rstd_f[:, None, :])
    if f > 1:
        sums = sums.reshape(B, 2, f, C).sum(axis=2)
    n = Sf * f
    mg = sums[:, 0, :] / n
    mgy = sums[:, 1, :] / n
    if f > 1:
        mg = jnp.tile(mg, (1, f))
        mgy = jnp.tile(mgy, (1, f))
    dx = pl.pallas_call(
        functools.partial(_bwd_apply_kernel, slope),
        grid=(B, _grid_tiles(Sf, ts)),
        in_specs=[_tile_spec(Cf, ts), _tile_spec(Cf, ts), _chan_spec(Cf),
                  _chan_spec(Cf), _chan_spec(Cf), _chan_spec(Cf)],
        out_specs=_tile_spec(Cf, ts),
        out_shape=jax.ShapeDtypeStruct((B, Sf, Cf), g3.dtype),
        interpret=_interpret(),
    )(gf, xf, mean_f[:, None, :], rstd_f[:, None, :], mg[:, None, :],
      mgy[:, None, :])
    return dx if group is not None else _unfold(dx, f, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def instance_norm_fused(x: Array, eps: float = 1e-5) -> Array:
    """Instance norm (affine=False) with fused Pallas stats/normalize and a
    traffic-floor custom VJP. ``x``: channels-last ``(B, *spatial, C)``."""
    x3 = _as3d(x)
    mean, rstd = _moments(x3, eps)
    return _normalize(x3, mean, rstd).reshape(x.shape)


def _in_fwd(x, eps):
    x3 = _as3d(x)
    mean, rstd = _moments(x3, eps)
    y = _normalize(x3, mean, rstd).reshape(x.shape)
    return y, (x3, mean, rstd, x.shape)


def _in_bwd(eps, res, g):
    x3, mean, rstd, shape = res
    dx = _bwd_dx(eps, None, x3, mean, rstd, _as3d(g))
    return (dx.reshape(shape),)


instance_norm_fused.defvjp(_in_fwd, _in_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def instance_norm_act_fused(x: Array, eps: float = 1e-5,
                            slope: float = 0.0) -> Array:
    """act(instance_norm(x)) in one fused normalize pass — relu
    (slope=0.0, the generators' conv→IN→relu) or leaky-relu (slope=0.2,
    the PatchGAN discriminators) — saving the separate activation
    round-trip XLA schedules after an opaque norm kernel."""
    x3 = _as3d(x)
    mean, rstd = _moments(x3, eps)
    return _normalize(x3, mean, rstd, slope=slope).reshape(x.shape)


def instance_norm_relu_fused(x: Array, eps: float = 1e-5) -> Array:
    return instance_norm_act_fused(x, eps, 0.0)


def _inact_fwd(x, eps, slope):
    x3 = _as3d(x)
    mean, rstd = _moments(x3, eps)
    y = _normalize(x3, mean, rstd, slope=slope).reshape(x.shape)
    return y, (x3, mean, rstd, x.shape)


def _inact_bwd(eps, slope, res, g):
    x3, mean, rstd, shape = res
    dx = _bwd_dx(eps, slope, x3, mean, rstd, _as3d(g))
    return (dx.reshape(shape),)


instance_norm_act_fused.defvjp(_inact_fwd, _inact_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def instance_norm_add_fused(x: Array, residual: Array, eps: float = 1e-5) -> Array:
    """residual + instance_norm(x) in one fused pass (the resnet-block
    tail: ``out = skip + IN(conv2(h))``, reference ``ResNet.py`` block)."""
    x3 = _as3d(x)
    mean, rstd = _moments(x3, eps)
    return _normalize(x3, mean, rstd, residual=_as3d(residual)).reshape(x.shape)


def _inadd_fwd(x, residual, eps):
    x3 = _as3d(x)
    mean, rstd = _moments(x3, eps)
    y = _normalize(x3, mean, rstd, residual=_as3d(residual)).reshape(x.shape)
    return y, (x3, mean, rstd, x.shape)


def _inadd_bwd(eps, res, g):
    x3, mean, rstd, shape = res
    dx = _bwd_dx(eps, None, x3, mean, rstd, _as3d(g))
    # d/d residual is the identity: pass g through
    return dx.reshape(shape), g


instance_norm_add_fused.defvjp(_inadd_fwd, _inadd_bwd)


def tpu_available() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


# ---------------------------------------------------------------------------
# packed (s2d) instance norm: stats fold across phase groups
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def instance_norm_act_packed_pallas(xp: Array, channels: int,
                                    eps: float = 1e-5,
                                    slope: float = 0.0) -> Array:
    """act(instance_norm(x)) computed DIRECTLY on a space-to-depth packed
    tensor ``xp`` (B, *Sc, F*channels), channel order phase-major (the
    :func:`raygun_tpu.nn.layers.space_to_depth` convention). Per-true-
    channel stats fold across the F phase groups; exact = unpack -> IN ->
    act -> repack, with zero data movement (IN is position-agnostic).
    This is what lets the CycleGAN generator shell stay packed end-to-end
    (C>=128 lanes; avoids XLA's batch-in-sublanes conv layouts + relayout
    copies at C=64, measured ~4 ms per boundary at 3x512^2 —
    scripts/perf_in_boundary.py)."""
    x3 = _as3d(xp)
    f = x3.shape[-1] // channels
    mean, rstd = _moments(x3, eps, group=f)
    return _normalize(x3, mean, rstd, slope=slope, group=f).reshape(xp.shape)


def _inpk_fwd(xp, channels, eps, slope):
    x3 = _as3d(xp)
    f = x3.shape[-1] // channels
    mean, rstd = _moments(x3, eps, group=f)
    y = _normalize(x3, mean, rstd, slope=slope, group=f).reshape(xp.shape)
    return y, (x3, mean, rstd, xp.shape)


def _inpk_bwd(channels, eps, slope, res, g):
    x3, mean, rstd, shape = res
    f = x3.shape[-1] // channels
    dx = _bwd_dx(eps, slope, x3, mean, rstd, _as3d(g), group=f)
    return (dx.reshape(shape),)


instance_norm_act_packed_pallas.defvjp(_inpk_fwd, _inpk_bwd)


def instance_norm_act_packed(xp: Array, channels: int, eps: float = 1e-5,
                             slope: float = 0.0) -> Array:
    """Platform-routing wrapper: Pallas on TPU, exact XLA math elsewhere
    (CPU tests / debug). Semantics identical to
    ``act(instance_norm(depth_to_space(xp)))`` re-packed."""
    import os

    forced = bool(os.environ.get("RAYGUN_FORCE_PALLAS_IN"))
    if (tpu_available() or forced) and not os.environ.get(
            "RAYGUN_DISABLE_PALLAS_IN"):
        return instance_norm_act_packed_pallas(xp, channels, eps, slope)
    f = xp.shape[-1] // channels
    xf = xp.astype(jnp.float32)
    v = xf.reshape(xp.shape[:-1] + (f, channels))
    axes = tuple(range(1, v.ndim - 1))  # spatial dims + the phase group
    mean = jnp.mean(v, axis=axes, keepdims=True)
    var = jnp.var(v, axis=axes, keepdims=True)
    y = (v - mean) * jax.lax.rsqrt(var + eps)
    y = jnp.where(y > 0, y, slope * y)
    return y.reshape(xp.shape).astype(xp.dtype)
