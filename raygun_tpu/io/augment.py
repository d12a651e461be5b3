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
