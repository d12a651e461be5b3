"""On-device, jit-fused data augmentation.

TPU-native replacement for the gunpowder augmentation nodes the reference
pipelines stack on (multiprocess CPU workers; reference
``io/CycleDataPipe.py:135-150``, ``io/MTLSDDataPipe.py:57-97``,
``train/BaseTrain.py:94-97``): here every augment is a pure function of a
PRNG key that fuses into the jitted train step, so the steady-state input
pipeline costs zero host CPU.

Implemented capabilities and their reference counterparts:
  * :func:`normalize` / :func:`intensity_scale_shift` — gp.Normalize,
    gp.IntensityScaleShift.
  * :func:`intensity_augment` — gp.IntensityAugment (scale/shift jitter).
  * :func:`simple_augment` — gp.SimpleAugment (random mirror + axis
    transpositions, restricted to isotropic axes).
  * :func:`elastic_augment` — gp.ElasticAugment (control-point displacement
    field + in-plane rotation, subsampled grid upsampled on device —
    parameters as in the reference configs: control_point_spacing,
    jitter_sigma, rotation_interval (0, π/2), subsample).

All functions take/return channels-last arrays ``(*spatial[, C])``. Label
arrays are resampled with nearest neighbor; intensity arrays trilinearly.
"""

from __future__ import annotations

import itertools
import math
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------------------
# intensity ops
# ---------------------------------------------------------------------------

def normalize(x: Array, factor: Optional[float] = None, dtype=jnp.float32) -> Array:
    """Scale integer data into [0, 1] by dtype range (gp.Normalize parity)."""
    if factor is None:
        if jnp.issubdtype(x.dtype, jnp.integer):
            info = jnp.iinfo(x.dtype)
            factor = 1.0 / (float(info.max) - float(info.min))
            return (x.astype(dtype) - float(info.min)) * factor
        factor = 1.0
    return x.astype(dtype) * factor


def intensity_scale_shift(x: Array, scale: float, shift: float) -> Array:
    return x * scale + shift


def intensity_augment(
    x: Array,
    key: jax.Array,
    scale_min: float = 0.9,
    scale_max: float = 1.1,
    shift_min: float = -0.1,
    shift_max: float = 0.1,
    clip: bool = True,
) -> Array:
    k1, k2 = jax.random.split(key)
    scale = jax.random.uniform(k1, (), minval=scale_min, maxval=scale_max)
    shift = jax.random.uniform(k2, (), minval=shift_min, maxval=shift_max)
    y = x * scale + shift
    if clip:
        y = jnp.clip(y, 0.0, 1.0)
    return y


def noise_augment(x: Array, key: jax.Array, sigma: float = 0.05, clip: bool = True) -> Array:
    """Additive gaussian noise (gp.NoiseAugment capability)."""
    y = x + sigma * jax.random.normal(key, x.shape, x.dtype)
    if clip:
        y = jnp.clip(y, 0.0, 1.0)
    return y


# ---------------------------------------------------------------------------
# simple augment: mirror + transpose
# ---------------------------------------------------------------------------

def simple_augment(
    arrays: Dict[str, Array],
    key: jax.Array,
    ndims: int,
    mirror_only: Optional[Sequence[int]] = None,
    transpose_only: Optional[Sequence[int]] = None,
) -> Dict[str, Array]:
    """Random mirrors and axis transpositions applied consistently to every
    array (gp.SimpleAugment parity). Spatial axes are the leading ``ndims``
    axes of each array; trailing axes (channels) are untouched.

    Transpositions only permute ``transpose_only`` axes (all spatial by
    default), which must have equal sizes — guaranteed by cubic/square crops.
    """
    mirror_axes = list(mirror_only) if mirror_only is not None else list(range(ndims))
    transpose_axes = (
        list(transpose_only) if transpose_only is not None else list(range(ndims))
    )
    km, kt = jax.random.split(key)
    flips = jax.random.bernoulli(km, 0.5, (len(mirror_axes),))

    perms = list(itertools.permutations(transpose_axes))
    perm_idx = jax.random.randint(kt, (), 0, len(perms))

    def apply_one(x: Array) -> Array:
        for i, ax in enumerate(mirror_axes):
            x = jnp.where(flips[i], jnp.flip(x, axis=ax), x)

        if len(perms) > 1:
            def make_branch(perm):
                full = list(range(x.ndim))
                for src, dst in zip(transpose_axes, perm):
                    full[src] = dst
                return lambda v: jnp.transpose(v, full)

            x = jax.lax.switch(perm_idx, [make_branch(p) for p in perms], x)
        return x

    return {name: apply_one(a) for name, a in arrays.items()}


# ---------------------------------------------------------------------------
# elastic augment: displacement field + rotation
# ---------------------------------------------------------------------------

def elastic_margin(
    target_shape: Sequence[int],
    jitter_sigma: Sequence[float],
    rotation: bool = True,
) -> Tuple[int, ...]:
    """Per-axis source margin (voxels each side) a crop needs so the warped
    sample never reads out of bounds. Rotation happens in the plane of the
    last two axes (anisotropy-aware, like the reference's in-plane
    rotations)."""
    nd = len(target_shape)
    margin = [int(math.ceil(3.0 * s)) + 1 if s > 0 else 0 for s in jitter_sigma]
    if rotation and nd >= 2:
        a, b = target_shape[-2], target_shape[-1]
        # worst-case in-plane rotation by π/4: half-diagonal minus half-side
        need = int(math.ceil((math.hypot(a, b) - min(a, b)) / 2)) + 1
        margin[-2] += need
        margin[-1] += need
    return tuple(margin)


def _displacement_field(
    key: jax.Array,
    target_shape: Sequence[int],
    control_point_spacing: Sequence[int],
    jitter_sigma: Sequence[float],
    subsample: int = 1,
) -> Array:
    """Smooth random displacement field, (nd, *target_shape), in voxels.
    Control-point jitter is upsampled with cubic interpolation on device —
    the jit-able equivalent of gunpowder's spline control-point warp."""
    nd = len(target_shape)
    n_ctrl = [max(2, s // max(1, c) + 1) for s, c in zip(target_shape, control_point_spacing)]
    ctrl = jax.random.normal(key, (nd, *n_ctrl), jnp.float32)
    sig = jnp.asarray(jitter_sigma, jnp.float32).reshape((nd,) + (1,) * nd)
    ctrl = ctrl * sig
    if subsample > 1:
        coarse = [max(2, s // subsample) for s in target_shape]
        field = jax.image.resize(ctrl, (nd, *coarse), method="cubic")
        field = jax.image.resize(field, (nd, *target_shape), method="linear")
    else:
        field = jax.image.resize(ctrl, (nd, *target_shape), method="cubic")
    return field


def elastic_coordinates(
    key: jax.Array,
    source_shape: Sequence[int],
    target_shape: Sequence[int],
    control_point_spacing: Sequence[int],
    jitter_sigma: Sequence[float],
    rotation_interval: Tuple[float, float] = (0.0, math.pi / 2),
    subsample: int = 4,
    num_rotation_draws: int = 1,
) -> Array:
    """Sampling coordinates (nd, *target_shape) into a source crop centered
    on the target: rotation (last-two-axes plane) ∘ displacement.

    ``num_rotation_draws > 1`` sums that many uniform draws — the
    distributional equivalent of the reference stacking several
    ElasticAugments each with its own rotation (reference
    ``MTLSDDataPipe.py:62-90`` applies two)."""
    nd = len(target_shape)
    k_rot, k_disp = jax.random.split(key)
    # identity grid centered in the source crop
    centers = [(s - 1) / 2.0 for s in source_shape]
    tgt_centers = [(t - 1) / 2.0 for t in target_shape]
    grids = jnp.meshgrid(*[jnp.arange(t, dtype=jnp.float32) for t in target_shape], indexing="ij")
    coords = [g - tc for g, tc in zip(grids, tgt_centers)]  # centered target coords

    # rotation in the plane of the last two axes
    lo, hi = rotation_interval
    theta = jnp.sum(
        jax.random.uniform(k_rot, (num_rotation_draws,), minval=lo, maxval=hi)
    )
    c, s = jnp.cos(theta), jnp.sin(theta)
    y, x = coords[-2], coords[-1]
    coords[-2] = c * y - s * x
    coords[-1] = s * y + c * x

    disp = _displacement_field(k_disp, target_shape, control_point_spacing, jitter_sigma, subsample)
    out = jnp.stack([coords[d] + disp[d] + centers[d] for d in range(nd)])
    return out


def warp(x: Array, coords: Array, order: int = 1) -> Array:
    """Sample ``x`` at ``coords`` (nd, *target). order 1 = trilinear
    (intensity), order 0 = nearest (labels). Channels-last supported."""
    nd = coords.shape[0]
    if x.ndim == nd:
        return jax.scipy.ndimage.map_coordinates(x, list(coords), order=order, mode="nearest")
    assert x.ndim == nd + 1
    mapped = [
        jax.scipy.ndimage.map_coordinates(x[..., c], list(coords), order=order, mode="nearest")
        for c in range(x.shape[-1])
    ]
    return jnp.stack(mapped, axis=-1)


# ---------------------------------------------------------------------------
# gather-free elastic warp: 3-shear rotation + windowed jitter
# ---------------------------------------------------------------------------
#
# jax.scipy.ndimage.map_coordinates is an arbitrary-index gather — the
# classic XLA:TPU slow path (no hardware gather: 6 per-crop 512² bilinear
# warps measure ~81 ms, scripts/perf_warp2.py). The same transform has a
# structured, gather-free form:
#
#   R(θ) = H_p · V_s · H_p      (p = -tan(θ/2), s = sin θ)
#
# (Catmull & Smith 1980 / Paeth 1986 three-shear rotation). Each shear is a
# 1-D resample whose source offset is per-line constant (the affine part) +
# a small smooth per-pixel residual (the elastic jitter, |d| ≤ 3σ+1):
#   * the per-line integer part is applied with log2(K) static roll+select
#     passes (pure VPU, no gather);
#   * the residual (≤ window W) is a (2W+3)-term sum of statically rolled
#     images weighted by the bilinear hat max(0, 1-|r-d|) — XLA fuses it.
#
# θ is first folded into [-π/4, π/4] by an exact rot90 so the shear
# envelopes stay inside the rotation margin (`elastic_margin`): every
# intermediate position a cropped output pixel traces through the shears is
# bounded by the half-diagonal, the same bound the margin already buys.
# Wrapped (rolled-around) voxels therefore never reach the crop.
#
# NOT bit-identical to map_coordinates: three successive linear interps
# differ from one bilinear sample by O(h²·curvature), and the jitter
# residual fields are evaluated at each pass's own grid position. The
# result is an elastic warp drawn from the same distribution (equal at
# θ ∈ {0, ±π/2} with zero jitter — tested exactly), which is what
# augmentation parity with the reference requires (gp.ElasticAugment is
# itself a scipy resample of a random field; reference
# ``io/CycleDataPipe.py:139-150``).


def warp_shears(
    x: Array,
    theta: Array,
    disp: Array,
    target_shape: Sequence[int],
    max_disp: float,
) -> Array:
    """Gather-free elastic warp of a square 2D canvas.

    ``x``: (S, S) source canvas. ``theta``: scalar rotation (radians, any
    value; folded by quadrant). ``disp``: (2, S, S) smooth displacement
    field in voxels, clamped to ±``max_disp`` (callers pass the
    ``elastic_margin`` jitter budget ceil(3σ)+1). Returns the centered
    ``target_shape`` crop of x sampled at R(θ)·(v-c) + disp(v) + c.
    """
    S = x.shape[0]
    assert x.ndim == 2 and x.shape[1] == S, "warp_shears needs a square 2D canvas"
    c = (S - 1) / 2.0
    x = x.astype(jnp.float32)

    # fold θ into [-π/4, π/4] with exact quadrant rotations: θ = q·π/2 + φ
    q = jnp.round(theta / (math.pi / 2)).astype(jnp.int32)
    phi = theta - q.astype(jnp.float32) * (math.pi / 2)
    qm = jnp.mod(q, 4)
    # I'(w+c) = I(R(q·π/2)w + c): rot90(x, -q) on [y, x] arrays
    folded = jax.lax.switch(
        qm,
        [lambda a: a,
         lambda a: jnp.rot90(a, -1),
         lambda a: jnp.rot90(a, 2),
         lambda a: jnp.rot90(a, 1)],
        x,
    )
    # e = R(-q·π/2)·d (rotate the displacement into the folded frame)
    dy, dx = disp[0], disp[1]
    ey, ex = jax.lax.switch(
        qm,
        [lambda a, b: (a, b),
         lambda a, b: (b, -a),
         lambda a, b: (-a, -b),
         lambda a, b: (-b, a)],
        dy, dx,
    )
    ey = jnp.clip(ey, -max_disp, max_disp)
    ex = jnp.clip(ex, -max_disp, max_disp)

    p = -jnp.tan(phi / 2.0)  # |p| ≤ tan(π/8)
    s = jnp.sin(phi)         # |s| ≤ sin(π/4)
    pmax, smax = math.tan(math.pi / 8) + 1e-6, math.sin(math.pi / 4) + 1e-6

    line = jnp.arange(S, dtype=jnp.float32) - c  # centered line coordinate

    # pass 1 (y-shear feeding the chain): σ1(v) = p·x̃ + (e_y - p·e_x)
    # pass 2 (x-shear):                   σ2(v) = s·ỹ + e_x
    # pass 3 (y-shear):                   σ3(v) = p·x̃
    # Composition (H_p·V_s·H_p with the injected fields) reproduces
    # R(φ)·ṽ + e exactly at the field positions (2×2 solve, det = 1).
    eta1 = ey - p * ex
    w1 = int(math.ceil(0.5 + (1.0 + pmax) * max_disp)) + 1
    w2 = int(math.ceil(0.5 + max_disp)) + 1

    out = _shear_pass(folded, p * line, eta1, axis=0,
                      kmax=int(math.ceil(pmax * c)) + 1, window=w1)
    out = _shear_pass(out, s * line, ex, axis=1,
                      kmax=int(math.ceil(smax * c)) + 1, window=w2)
    out = _shear_pass(out, p * line, None, axis=0,
                      kmax=int(math.ceil(pmax * c)) + 1, window=1)

    off = [(S - t) // 2 for t in target_shape]
    return jax.lax.dynamic_slice(out, off, list(target_shape))


def _shear_pass(
    img: Array,
    line_shift: Array,
    residual_field: Optional[Array],
    axis: int,
    kmax: int,
    window: int,
) -> Array:
    """out(v) = img(v + σ(v)·ê_axis), σ = line_shift[other axis] + residual.

    ``line_shift``: (S,) float shift per perpendicular line. Its rounded
    integer part is applied with log2 roll+select passes; the fractional
    remainder plus ``residual_field`` (|·| ≤ window-0.5, clamped upstream)
    is a (2·window+3)-term hat-weighted sum of static rolls.
    """
    S = img.shape[axis]
    k = jnp.round(line_shift).astype(jnp.int32)
    k = jnp.clip(k, -kmax, kmax)
    u = k + kmax  # [0, 2·kmax]
    nbits = max(1, int(math.ceil(math.log2(2 * kmax + 1))))

    # reshape per-line quantities to broadcast along `axis`
    exp = (lambda a: a[:, None]) if axis == 1 else (lambda a: a[None, :])

    rolled = jnp.roll(img, kmax, axis=axis)
    for b in range(nbits):
        r = jnp.roll(rolled, -(1 << b), axis=axis)
        bit = ((u >> b) & 1) > 0
        rolled = jnp.where(exp(bit), r, rolled)

    res = exp(line_shift - k.astype(jnp.float32))
    if residual_field is not None:
        res = res + residual_field
    res = jnp.clip(res, -(window - 1e-4), window - 1e-4)
    out = jnp.zeros_like(rolled)
    for d in range(-window, window + 2):
        w = jnp.maximum(0.0, 1.0 - jnp.abs(res - d))
        out = out + w * jnp.roll(rolled, -d, axis=axis)
    return out


def elastic_params(
    key: jax.Array,
    canvas_shape: Sequence[int],
    control_point_spacing: Sequence[int],
    jitter_sigma: Sequence[float],
    rotation_interval: Tuple[float, float] = (0.0, math.pi / 2),
    subsample: int = 4,
    num_rotation_draws: int = 1,
) -> Tuple[Array, Array]:
    """(theta, displacement field on the CANVAS grid) for :func:`warp_shears`.

    Same draws as :func:`elastic_coordinates` (rotation key, then field key)
    but the field is generated at canvas resolution because the shear
    passes evaluate it at their own grid positions.
    """
    k_rot, k_disp = jax.random.split(key)
    lo, hi = rotation_interval
    theta = jnp.sum(
        jax.random.uniform(k_rot, (num_rotation_draws,), minval=lo, maxval=hi)
    )
    disp = _displacement_field(
        k_disp, canvas_shape, control_point_spacing, jitter_sigma, subsample
    )
    return theta, disp


def elastic_augment(
    arrays: Dict[str, Array],
    key: jax.Array,
    target_shape: Sequence[int],
    control_point_spacing: Sequence[int],
    jitter_sigma: Sequence[float],
    rotation_interval: Tuple[float, float] = (0.0, math.pi / 2),
    subsample: int = 4,
    label_arrays: Sequence[str] = ("labels", "labels_mask", "cell_mask"),
    num_rotation_draws: int = 1,
) -> Dict[str, Array]:
    """Warp all arrays with one shared random deformation (gp.ElasticAugment
    parity). Source arrays must be larger than ``target_shape`` by
    :func:`elastic_margin`."""
    src_shape = None
    for a in arrays.values():
        src_shape = a.shape[: len(target_shape)]
        break
    coords = elastic_coordinates(
        key, src_shape, target_shape, control_point_spacing, jitter_sigma,
        rotation_interval, subsample, num_rotation_draws,
    )
    out = {}
    for name, a in arrays.items():
        order = 0 if name in label_arrays else 1
        out[name] = warp(a, coords, order=order)
    return out
