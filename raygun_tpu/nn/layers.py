"""Shared N-D building blocks for the network zoo.

Layout convention: **channels-last** ``(batch, *spatial, channels)`` — the
layout XLA:TPU prefers for convolutions (feeds the MXU without transposes).
The reference uses torch channels-first (e.g. ``UNet.py``,
``NLayerDiscriminator.py``); shape parity tests transpose accordingly.

All padding semantics mirror the reference's torch conventions so that valid
receptive-field math (and therefore blockwise stitching) is identical:
  * ``"valid"``  — no padding.
  * ``"same"``   — symmetric ``(k-1)//2`` pad with a fill mode
    (reflect/replicate/zeros), stride-1 only.
  * integer ``p`` — explicit p-per-side padding (PatchGAN uses p=1 with k=4).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array

_PAD_MODES = {"reflect": "reflect", "replicate": "edge", "zeros": "constant", "wrap": "wrap"}


def get_activation(activation: Union[str, Callable, None]) -> Callable[[Array], Array]:
    """Resolve an activation by torch-style name or callable (parity with
    reference ``UNet.py:41-47`` string lookup)."""
    if activation is None:
        return lambda x: x
    if callable(activation):
        return activation
    name = activation.lower()
    table = {
        "relu": nn.relu,
        "leakyrelu": lambda x: nn.leaky_relu(x, negative_slope=0.2),
        "sigmoid": nn.sigmoid,
        "tanh": nn.tanh,
        "gelu": nn.gelu,
        "elu": nn.elu,
        "silu": nn.silu,
        "swish": nn.silu,
        "identity": lambda x: x,
        "softplus": nn.softplus,
    }
    if name in table:
        return table[name]
    raise ValueError(f"unknown activation {activation!r}")


def _pallas_instance_norm_ok(x: Array) -> bool:
    """Route instance norm through the fused Pallas kernels on TPU: XLA
    schedules the stats/normalize/backward reductions as ~7x the norm's
    minimum HBM traffic (measured — see nn/pallas/instance_norm.py).
    CPU (tests, virtual meshes) keeps the XLA reference implementation."""
    import os

    if os.environ.get("RAYGUN_DISABLE_PALLAS_IN"):
        return False
    if x.ndim < 3:
        return False
    if os.environ.get("RAYGUN_FORCE_PALLAS_IN"):
        # CPU interpret-mode testing of the production route (e.g. under
        # a DP mesh): skip the platform + min-size heuristics only
        return True
    # below ~2M elements the pallas call overhead (5 kernels per fwd+bwd)
    # exceeds what the fused passes save — XLA's fused elementwise wins
    # (measured: 3x256^2 CycleGAN step regressed 12.1 -> 10.8 steps/s with
    # pallas IN on its 64^2x256 block tensors)
    n = 1
    for s in x.shape:
        n *= s
    if n < (1 << 21):
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def instance_norm(x: Array, epsilon: float = 1e-5, impl: str = "auto") -> Array:
    """Per-sample, per-channel normalization over spatial dims.

    Matches torch ``InstanceNormNd`` defaults (affine=False,
    track_running_stats=False) used throughout the reference generators
    (``ResNet.py`` norm_layer default). ``impl``: 'auto' (Pallas fused
    kernels on TPU, XLA elsewhere) | 'xla' | 'pallas'."""
    if impl == "pallas" or (impl == "auto" and _pallas_instance_norm_ok(x)):
        from .pallas.instance_norm import instance_norm_fused

        return instance_norm_fused(x, epsilon)
    axes = tuple(range(1, x.ndim - 1))
    # stats in fp32: bf16 activations (mixed-precision training) would
    # otherwise accumulate mean/var at 8-bit mantissa over ~10^5 voxels
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.var(xf, axis=axes, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + epsilon)).astype(x.dtype)


class InstanceNorm(nn.Module):
    """Module wrapper so norm layers are uniform; optionally affine."""

    affine: bool = False
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        y = instance_norm(x, self.epsilon)
        if self.affine:
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            y = y * scale + bias
        return y


class BatchNorm(nn.Module):
    """BatchNorm with running stats (torch affine=True parity: scale+bias).

    ``train=True`` uses batch statistics and updates the ``batch_stats``
    collection; ``train=False`` uses the running averages — mirroring the
    train/eval norm-mode switching the reference does in
    ``networks/utils.py:set_norm_mode`` (incl. the ``fix_norms`` freeze)."""

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        norm = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis_name=None,
        )
        return norm(x)


def make_norm(norm: Union[str, None, Callable]) -> Optional[Callable[[], nn.Module]]:
    """Factory: 'instance' | 'batch' | 'group' | None → norm module ctor."""
    if norm is None:
        return None
    if callable(norm) and not isinstance(norm, str):
        return norm
    name = norm.lower()
    if name in ("instance", "instancenorm", "instancenorm2d", "instancenorm3d"):
        return InstanceNorm
    if name in ("batch", "batchnorm", "batchnorm2d", "batchnorm3d"):
        return BatchNorm
    if name in ("group", "groupnorm"):
        return lambda: nn.GroupNorm(num_groups=8)
    if name in ("none", "identity"):
        return None
    raise ValueError(f"unknown norm {norm!r}")


def _norm_tuple(v, ndims: int) -> Tuple[int, ...]:
    if isinstance(v, int):
        return (v,) * ndims
    t = tuple(int(x) for x in v)
    assert len(t) == ndims
    return t


def pad_spatial(x: Array, pad: Sequence[Tuple[int, int]], mode: str = "reflect") -> Array:
    """Pad only the spatial dims of a channels-last tensor."""
    if all(lo == 0 and hi == 0 for lo, hi in pad):
        return x
    full = [(0, 0)] + list(pad) + [(0, 0)]
    return jnp.pad(x, full, mode=_PAD_MODES[mode])


# tap-sum GEMM routing thresholds. Isolated measurement on TPU v5e: ~93 vs
# ~61 TFLOP/s for the MTLSD bottleneck 2592->2592 3^3 conv — but embedded in
# the full U-Net the per-tap shifted copies break XLA's surrounding fusion
# and the net effect is NEGATIVE (140 vs 123 ms/block). Opt-in only
# (ConvNd(use_tap_sum=True)); revisit with a Pallas fused-tap kernel that
# streams taps from VMEM without materializing copies.
TAP_SUM_MIN_CHANNELS = 256
TAP_SUM_MAX_SPATIAL = 32768  # output voxels (~32^3)

# z-decomposition routing: XLA:TPU lowers 3D convs worse than 2D convs at
# EVERY channel count measured on v5e (scripts/perf_folded_conv*.py):
# 12->12 @290^3 3.3 -> 9.9 TF/s, 72->72 @186^3 43 -> 65, 432->432 @90^3
# 104 -> 131, folded 2592->3456 k2 @41^3 136 -> 167, and never loses at the
# bottleneck (2592->2592 @43^3: 145.4 -> 146.9). Decomposing into a sum of
# 2D convs over z-taps (z folded into batch) is therefore the default for
# every valid stride-1 3D conv; it also LOWERS peak memory (the native 3D
# path at 388^3 blocks does not even compile in 16 GB HBM).
ZDECOMP_MAX_MIN_CHANNELS = 16  # retained for the legacy threshold route


def conv_dimension_numbers_nd(nd: int) -> jax.lax.ConvDimensionNumbers:
    """Channels-last ConvDimensionNumbers for any spatial rank (incl. 4D —
    reference funlib ``Conv4d`` capability)."""
    return jax.lax.ConvDimensionNumbers(
        lhs_spec=(0, nd + 1) + tuple(range(1, nd + 1)),
        rhs_spec=(nd + 1, nd) + tuple(range(nd)),
        out_spec=(0, nd + 1) + tuple(range(1, nd + 1)),
    )


def conv_nd(x: Array, kernel: Array, strides=None, padding="VALID",
            feature_group_count: int = 1, precision=None) -> Array:
    """Channels-last N-D conv with an explicit kernel array
    ``(*k, cin/groups, cout)``."""
    nd = kernel.ndim - 2
    if strides is None:
        strides = (1,) * nd
    return jax.lax.conv_general_dilated(
        x, kernel, tuple(strides), padding,
        dimension_numbers=conv_dimension_numbers_nd(nd),
        feature_group_count=feature_group_count,
        precision=precision,
    )


def conv2d_s2d(x: Array, kernel: Array, precision=None) -> Array:
    """VALID stride-1 2D conv via space-to-depth packing: small-channel 2D
    tensors pay the same TPU lane-padding tax as 3D ones (a 1-channel bf16
    tensor tiles to 128 lanes); packing 2x2 fine pixels into channels turns
    a k^2 conv over C channels into an ntap^2 conv over 4C channels (exact,
    kernel re-indexed by :func:`pack_conv_kernel_s2d`). Used for the
    CycleGAN generator stem/final convs (1<->64 channels at full res)."""
    Ny, Nx = x.shape[1], x.shape[2]
    ky, kx = kernel.shape[0], kernel.shape[1]
    out_y, out_x = Ny - ky + 1, Nx - kx + 1
    if out_y <= 0 or out_x <= 0:
        raise ValueError(
            f"valid conv of kernel {(ky, kx)} over spatial extent "
            f"{(Ny, Nx)} is empty — the network's input_shape is too "
            "small for its depth/kernels"
        )
    # even extents required; pad high side (outputs beyond are sliced off)
    pad = [(0, Ny % 2), (0, Nx % 2)]
    if any(p != (0, 0) for p in pad):
        x = jnp.pad(x, [(0, 0)] + pad + [(0, 0)])
    xp = space_to_depth(x, (2, 2))
    w2 = pack_conv_kernel_s2d(kernel, (2, 2)).astype(x.dtype)
    nt = w2.shape[:2]
    xp = jnp.pad(xp, [(0, 0), (0, nt[0] - 1), (0, nt[1] - 1), (0, 0)])
    y = jax.lax.conv_general_dilated(
        xp, w2, (1, 1), "VALID", dimension_numbers=conv_dimension_numbers_nd(2),
        precision=precision,
    )
    y = depth_to_space(y, (2, 2))
    return y[:, :out_y, :out_x, :]


def conv3d_zdecomp(x: Array, kernel: Array, precision=None) -> Array:
    """VALID stride-1 3D conv as a sum of 2D convs over z-taps, z folded
    into the batch dim — the fast path for small-channel 3D convs on TPU
    (see ZDECOMP_MAX_MIN_CHANNELS note)."""
    b = x.shape[0]
    Z, Y, X = x.shape[1:4]
    kz = kernel.shape[0]
    Zo = Z - kz + 1
    if Zo <= 0 or Y - kernel.shape[1] + 1 <= 0 or X - kernel.shape[2] + 1 <= 0:
        raise ValueError(
            f"valid conv of kernel {tuple(kernel.shape[:3])} over spatial "
            f"extent {(Z, Y, X)} is empty — the network's input_shape is "
            "too small for its depth/kernels"
        )
    dn2 = conv_dimension_numbers_nd(2)
    acc = None
    for tz in range(kz):
        xs = x[:, tz:tz + Zo].reshape((b * Zo, Y, X, x.shape[-1]))
        term = jax.lax.conv_general_dilated(
            xs, kernel[tz], (1, 1), "VALID", dimension_numbers=dn2,
            precision=precision)
        acc = term if acc is None else acc + term
    return acc.reshape((b, Zo) + acc.shape[1:])


def space_to_depth(x: Array, factors: Sequence[int]) -> Array:
    """(b, *S, c) -> (b, *S/f, prod(f)*c); channel index = (*offsets, c)."""
    nd = len(factors)
    b, c = x.shape[0], x.shape[-1]
    shape = [b]
    perm_src = []
    for d, f in enumerate(factors):
        shape += [x.shape[1 + d] // f, f]
    x = x.reshape(shape + [c])
    # (b, S0, f0, S1, f1, ..., c) -> (b, S0, S1, ..., f0, f1, ..., c)
    perm = [0] + [1 + 2 * d for d in range(nd)] + [2 + 2 * d for d in range(nd)] + [1 + 2 * nd]
    x = x.transpose(perm)
    out_spatial = tuple(x.shape[1:1 + nd])
    return x.reshape((b,) + out_spatial + (int(np.prod(factors)) * c,))


def depth_to_space(y: Array, factors: Sequence[int]) -> Array:
    """Inverse of :func:`space_to_depth`: (b, *S, prod(f)*c) -> (b, *S*f, c)."""
    nd = len(factors)
    b = y.shape[0]
    F = int(np.prod(factors))
    c = y.shape[-1] // F
    spatial = y.shape[1:1 + nd]
    y = y.reshape((b,) + spatial + tuple(factors) + (c,))
    # (b, S0..Sn-1, f0..fn-1, c) -> (b, S0, f0, S1, f1, ..., c)
    perm = [0]
    for d in range(nd):
        perm += [1 + d, 1 + nd + d]
    perm += [1 + 2 * nd]
    y = y.transpose(perm)
    out = tuple(s * f for s, f in zip(spatial, factors))
    return y.reshape((b,) + out + (c,))


def _fold_matrix(kernel_size: Sequence[int], factors: Sequence[int]) -> np.ndarray:
    """0/1 matrix M[t_flat, u_flat, r_flat]: tap t of a conv over a
    factor-upsampled input contributes to folded tap u for phase r iff
    (r+t)//f == u per dim."""
    import itertools as it

    ks, fs = tuple(kernel_size), tuple(factors)
    ntaps = tuple((f - 1 + k - 1) // f + 1 for f, k in zip(fs, ks))
    M = np.zeros((int(np.prod(ks)), int(np.prod(ntaps)), int(np.prod(fs))), np.float32)

    def flat(idx, dims):
        out = 0
        for i, d in zip(idx, dims):
            out = out * d + i
        return out

    for t in it.product(*[range(k) for k in ks]):
        for r in it.product(*[range(f) for f in fs]):
            u = tuple((rr + tt) // f for rr, tt, f in zip(r, t, fs))
            M[flat(t, ks), flat(u, ntaps), flat(r, fs)] = 1.0
    return M


def _pack_matrix(kernel_size, factors, offsets) -> Tuple[np.ndarray, Tuple[int, ...]]:
    """0/1 matrix M[t_flat, u_flat, v_flat, r_flat] for s2d-packed convs:
    tap t contributes to coarse tap u, input phase v, output phase r iff
    t == f*u + v - r - o per dim (o = per-dim sub-factor offset of the
    source window)."""
    import itertools as it

    ks, fs, os_ = tuple(kernel_size), tuple(factors), tuple(offsets)
    ntaps = tuple((k - 1 + f - 1 + o) // f + 1 for k, f, o in zip(ks, fs, os_))
    M = np.zeros(
        (int(np.prod(ks)), int(np.prod(ntaps)), int(np.prod(fs)), int(np.prod(fs))),
        np.float32,
    )

    def flat(idx, dims):
        out = 0
        for i, d in zip(idx, dims):
            out = out * d + i
        return out

    for u in it.product(*[range(n) for n in ntaps]):
        for v in it.product(*[range(f) for f in fs]):
            for r in it.product(*[range(f) for f in fs]):
                t = tuple(
                    f * uu + vv - rr - oo
                    for f, uu, vv, rr, oo in zip(fs, u, v, r, os_)
                )
                if all(0 <= tt < k for tt, k in zip(t, ks)):
                    M[flat(t, ks), flat(u, ntaps), flat(v, fs), flat(r, fs)] = 1.0
    return M, ntaps


def pack_conv_kernel_s2d(
    kernel: Array, factors: Sequence[int], offsets: Optional[Sequence[int]] = None
) -> Array:
    """Pack a conv kernel for space-to-depth execution:
    ``conv(x, W)`` at fine resolution equals ``conv(s2d(x), pack(W))`` at
    coarse resolution with prod(f)x channels on both sides, up to
    depth_to_space of the output — the layout that avoids the TPU's 10.8x
    lane-padding tax on small-channel tensors (a bf16 12-channel tensor is
    tiled T(8,128): 128/12 lanes wasted in HBM and on every read).

    ``offsets``: per-dim sub-factor start of the source window inside the
    packed grid (o = src_start % f; the caller slices the coarse grid at
    src_start // f) — used when the source is center-cropped at an odd
    offset (decoder skip branches).

    Output kernel: ``(*ntap, prod(f)*cin, prod(f)*cout)``.
    """
    nd = len(factors)
    ks = tuple(kernel.shape[:nd])
    ci, co = kernel.shape[-2], kernel.shape[-1]
    if offsets is None:
        offsets = (0,) * nd
    M, ntaps = _pack_matrix(ks, factors, offsets)
    F = int(np.prod(factors))
    Mj = jnp.asarray(M, kernel.dtype)
    Wt = kernel.reshape((int(np.prod(ks)), ci, co))
    W2 = jnp.einsum("tuvr,tcd->uvcrd", Mj, Wt)
    return W2.reshape(ntaps + (F * ci, F * co))


def _pack_matrix_io(kernel_size, f_in, f_out, fine_stride, starts):
    """0/1 scatter M[t_flat, u_flat, v_flat, R_flat] for mixed-granularity
    s2d-packed convs: with the input packed by ``f_in`` (cell q, phase v =
    fine ``fine0 + f_in*q + v``) and the output packed by ``f_out`` (cell P,
    phase R = fine output ``f_out*P + R``), the fine conv
    ``y[j] = sum_t x_fine[start + fine_stride*j + t] * w[t]`` becomes a
    coarse VALID conv of stride ``fine_stride*f_out // f_in`` whose kernel
    tap (u, v -> R) carries w[t] iff ``f_in*u + v == start + fine_stride*R
    + t`` per dim (unique t => pure scatter, exact in any dtype).
    ``starts`` must satisfy ``0 <= start < f_in`` (fold the excess into the
    caller's coarse slice/pad)."""
    import itertools as it

    ks = tuple(kernel_size)
    fi, fo, sf, os_ = tuple(f_in), tuple(f_out), tuple(fine_stride), tuple(starts)
    for o, f in zip(os_, fi):
        if not 0 <= o < f:
            raise ValueError(f"start {o} outside [0, f_in={f})")
    for s, f_o, f_i in zip(sf, fo, fi):
        if (s * f_o) % f_i:
            raise ValueError("fine_stride*f_out must be divisible by f_in")
    ntaps = tuple(
        (o + s * (f_o - 1) + k - 1) // f_i + 1
        for o, s, f_o, k, f_i in zip(os_, sf, fo, ks, fi)
    )
    M = np.zeros(
        (int(np.prod(ks)), int(np.prod(ntaps)), int(np.prod(fi)), int(np.prod(fo))),
        np.float32,
    )

    def flat(idx, dims):
        out = 0
        for i, d in zip(idx, dims):
            out = out * d + i
        return out

    for u in it.product(*[range(n) for n in ntaps]):
        for v in it.product(*[range(f) for f in fi]):
            for R in it.product(*[range(f) for f in fo]):
                t = tuple(
                    f_i * uu + vv - s * rr - oo
                    for f_i, uu, vv, s, rr, oo in zip(fi, u, v, sf, R, os_)
                )
                if all(0 <= tt < k for tt, k in zip(t, ks)):
                    M[flat(t, ks), flat(u, ntaps), flat(v, fi), flat(R, fo)] = 1.0
    return M, ntaps


def pack_conv_kernel_io(
    kernel: Array,
    f_in: Sequence[int],
    f_out: Sequence[int],
    fine_stride: Sequence[int],
    starts: Sequence[int],
) -> Tuple[Array, Tuple[int, ...], Tuple[int, ...]]:
    """Pack ``kernel`` (*k, ci, co) for a conv whose input is s2d-packed by
    ``f_in`` and whose output is produced s2d-packed by ``f_out`` (phase-
    major channel order on both sides, matching :func:`space_to_depth`).
    Generalizes :func:`pack_conv_kernel_s2d` (that is f_in == f_out,
    fine_stride 1) and covers strided convs (f_out=1, fine_stride=s: output
    lands directly on the strided grid) and phase-aggregated small-co convs
    (f_out=8: N = 64*co keeps the MXU busy where co=1 would idle 127/128
    lanes — the CycleGAN head). Returns ``(w2, ntaps, coarse_strides)``;
    run ``lax.conv(xp_padded, w2, coarse_strides, 'VALID')``."""
    nd = kernel.ndim - 2
    ks = tuple(kernel.shape[:nd])
    ci, co = kernel.shape[-2], kernel.shape[-1]
    M, ntaps = _pack_matrix_io(ks, f_in, f_out, fine_stride, starts)
    Fi, Fo = int(np.prod(f_in)), int(np.prod(f_out))
    Mj = jnp.asarray(M, kernel.dtype)
    Wt = kernel.reshape((int(np.prod(ks)), ci, co))
    W2 = jnp.einsum("tuvr,tcd->uvcrd", Mj, Wt)
    cstr = tuple(s * f_o // f_i for s, f_o, f_i in zip(fine_stride, f_out, f_in))
    return W2.reshape(ntaps + (Fi * ci, Fo * co)), ntaps, cstr


def phase_max_pool(xp: Array, factors: Sequence[int], channels: int) -> Array:
    """Max-pool with window=stride=factors, expressed on an s2d-packed
    tensor: a pure channel-group max (no spatial reduce) — the packed
    equivalent of :func:`max_pool_nd` on the unpacked tensor, exact."""
    F = int(np.prod(factors))
    shape = xp.shape[:-1] + (F, channels)
    return jnp.max(xp.reshape(shape), axis=-2)


def conv_stride2_s2d(x: Array, kernel: Array, precision=None) -> Array:
    """Stride-2 valid conv via s2d packing: the stride-2 outputs are the
    even-phase outputs of the packed stride-1 conv, i.e. the r=0 channel
    group of :func:`pack_conv_kernel_s2d`'s kernel — one coarse conv with
    4x/8x input channels and NO depth_to_space (output is naturally at the
    strided resolution). Exact; K/N dims are MXU-friendly where the native
    strided lowering is not (CycleGAN down convs)."""
    nd = x.ndim - 2
    co = kernel.shape[-1]
    fine = x.shape[1:-1]
    out = tuple((s - k) // 2 + 1 for s, k in zip(fine, kernel.shape[:nd]))
    pad = [(0, s % 2) for s in fine]
    if any(p != (0, 0) for p in pad):
        x = jnp.pad(x, [(0, 0)] + pad + [(0, 0)])
    xp = space_to_depth(x, (2,) * nd)
    w2 = pack_conv_kernel_s2d(kernel, (2,) * nd)[..., :co].astype(x.dtype)
    nt = w2.shape[:nd]
    xp = jnp.pad(xp, [(0, 0)] + [(0, n - 1) for n in nt] + [(0, 0)])
    y = jax.lax.conv_general_dilated(
        xp, w2, (1,) * nd, "VALID",
        dimension_numbers=conv_dimension_numbers_nd(nd), precision=precision,
    )
    return y[(slice(None),) + tuple(slice(0, o) for o in out) + (slice(None),)]


def _pack_conv_transpose_matrix(k: int) -> np.ndarray:
    """Per-dim 0/1 matrix M[t, u, r] for the stride-2, pad-1, outpad-1
    transposed conv subpixel decomposition (flax ConvTranspose orientation,
    unflipped kernel): output phase r at coarse tap u uses kernel tap t iff
    t == 2u + 1 - r (in range)."""
    M = np.zeros((k, 2, 2), np.float32)
    for r in range(2):
        for u in range(2):
            t = 2 * u + 1 - r
            if 0 <= t < k:
                M[t, u, r] = 1.0
    return M


def conv_transpose_s2_subpixel(x: Array, kernel: Array, precision=None) -> Array:
    """Transposed conv (kernel 3, stride 2, padding 1, output_padding 1 —
    the CycleGAN/ResNet upsampler) as per-phase coarse convs + depth_to_
    space, instead of XLA's zero-dilated lowering (which wastes 1-1/2^nd of
    the MACs on inserted zeros). ``kernel``: flax ConvTranspose layout
    (*k, cin, cout). Output extent = 2x input per spatial dim. Exact
    (parity-tested against the nn.ConvTranspose + crop path)."""
    import itertools as it

    nd = x.ndim - 2
    ci, co = kernel.shape[-2], kernel.shape[-1]
    k = kernel.shape[0]
    assert all(kk == k for kk in kernel.shape[:nd]) and k == 3
    M1 = _pack_conv_transpose_matrix(k)
    Mfull = np.zeros((k**nd, 2**nd, 2**nd), np.float32)

    def flat(idx, base):
        out = 0
        for i in idx:
            out = out * base + i
        return out

    for t in it.product(range(k), repeat=nd):
        for u in it.product(range(2), repeat=nd):
            for r in it.product(range(2), repeat=nd):
                v = 1.0
                for d in range(nd):
                    v *= M1[t[d], u[d], r[d]]
                if v:
                    Mfull[flat(t, k), flat(u, 2), flat(r, 2)] = v
    wt = kernel.reshape((k**nd, ci, co))
    w2 = jnp.einsum(
        "tur,tcd->ucrd", jnp.asarray(Mfull, kernel.dtype), wt
    )
    w2 = w2.reshape((2,) * nd + (ci, (2**nd) * co)).astype(x.dtype)
    xq = jnp.pad(x, [(0, 0)] + [(0, 1)] * nd + [(0, 0)])
    y = jax.lax.conv_general_dilated(
        xq, w2, (1,) * nd, "VALID",
        dimension_numbers=conv_dimension_numbers_nd(nd), precision=precision,
    )
    return depth_to_space(y, (2,) * nd)


@jax.custom_vjp
def conv_s2_p1_k3(x: Array, kernel: Array) -> Array:
    """2D conv, kernel 3x3, stride 2, zero-pad 1 (the CycleGAN down convs)
    with an EXACT custom VJP: XLA's autodiff backward for strided convs is
    a zero-dilated conv (75% wasted MACs on inserted zeros + a poor
    emitter); here dx runs the subpixel transposed-conv route and dw the
    packed formulation's own adjoint — both exact re-expressions of the
    same math (parity-tested values and grads, tests/nn/test_conv_vjp.py).
    Measured fwd+bwd at 3x512^2 64->128: see docs/PERFORMANCE.md (native
    fwd 1.76 ms beats the packed-s2d fwd 3.74 ms at this shape — the
    packing transposes cost more than the lane padding they save)."""
    return jax.lax.conv_general_dilated(
        x, kernel, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=conv_dimension_numbers_nd(2),
    )


def _conv_s2_fwd(x, kernel):
    return conv_s2_p1_k3(x, kernel), (x, kernel)


def _conv_s2_bwd(res, g):
    x, kernel = res
    wt = jnp.flip(kernel, (0, 1)).swapaxes(-1, -2)
    dx = conv_transpose_s2_subpixel(g, wt)
    if dx.shape[1:3] != x.shape[1:3]:
        dx = dx[:, : x.shape[1], : x.shape[2], :]
    _, vjp_w = jax.vjp(
        lambda w_: jax.lax.conv_general_dilated(
            x, w_, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=conv_dimension_numbers_nd(2)), kernel)
    (dw,) = vjp_w(g)
    return dx, dw


conv_s2_p1_k3.defvjp(_conv_s2_fwd, _conv_s2_bwd)


@jax.custom_vjp
def conv_t_s2_subpixel_vjp(x: Array, kernel: Array) -> Array:
    """2D transposed conv (kernel 3, stride 2, padding 1, output_padding 1
    — the CycleGAN/ResNet upsampler) via the subpixel route, with an EXACT
    custom VJP whose dx is the packed stride-2 conv of the upstream grad
    (the two routes are each other's adjoints)."""
    return conv_transpose_s2_subpixel(x, kernel)


def _conv_t_fwd(x, kernel):
    return conv_transpose_s2_subpixel(x, kernel), (x, kernel)


def _conv_t_bwd(res, g):
    x, kernel = res
    wt = jnp.flip(kernel, (0, 1)).swapaxes(-1, -2)
    gp = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dx = conv_stride2_s2d(gp, wt)
    if dx.shape[1:3] != x.shape[1:3]:
        dx = dx[:, : x.shape[1], : x.shape[2], :]
    _, vjp_w = jax.vjp(lambda w_: conv_transpose_s2_subpixel(x, w_), kernel)
    (dw,) = vjp_w(g)
    return dx, dw


conv_t_s2_subpixel_vjp.defvjp(_conv_t_fwd, _conv_t_bwd)


def fold_upsample_kernel(kernel: Array, factors: Sequence[int]) -> Array:
    """Fold a conv kernel across a nearest-neighbor upsample:
    ``conv(nearest_up(g, f), W) == depth_to_space(conv(g, fold(W, f)), f)``
    (up to the edge positions documented in :class:`FusedUpConvPass`).

    Output kernel: ``(*ntap, cin, prod(f)*cout)`` with out channel =
    (phase r, cout). Cuts the upsampled-branch FLOPs by prod(f)*prod(ntap)
    / (prod(f)^... ) — for f=2, k=3: 64/(8*27) ≈ 0.30x — because upsampled
    duplicates share multiplies."""
    nd = len(factors)
    ks = tuple(kernel.shape[:nd])
    ci, co = kernel.shape[-2], kernel.shape[-1]
    ntaps = tuple((f - 1 + k - 1) // f + 1 for f, k in zip(factors, ks))
    M = jnp.asarray(_fold_matrix(ks, factors), kernel.dtype)
    Wt = kernel.reshape((int(np.prod(ks)), ci, co))
    W2 = jnp.einsum("tur,tcd->ucrd", M, Wt)
    return W2.reshape(ntaps + (ci, int(np.prod(factors)) * co))


def tap_sum_conv(x: Array, kernel: Array, use_tap_sum: bool = True) -> Array:
    """VALID stride-1 conv as a sum of per-tap GEMMs:
    ``y = Σ_t shift_t(x) @ W[t]`` — each tap is one MXU matmul over
    (spatial_positions, Cin) x (Cin, Cout)."""
    import itertools as it

    nd = kernel.ndim - 2
    ksize = kernel.shape[:nd]
    cin, cout = kernel.shape[-2], kernel.shape[-1]
    batch = x.shape[0]
    out_spatial = tuple(x.shape[1 + d] - ksize[d] + 1 for d in range(nd))
    m = batch * int(np.prod(out_spatial))
    acc = None
    for tap in it.product(*[range(k) for k in ksize]):
        sl = (slice(None),) + tuple(
            slice(t, t + s) for t, s in zip(tap, out_spatial)
        ) + (slice(None),)
        patch = x[sl].reshape(m, cin)
        term = jnp.dot(patch, kernel[tap], preferred_element_type=jnp.float32)
        acc = term if acc is None else acc + term
    return acc.reshape((batch,) + out_spatial + (cout,)).astype(x.dtype)


class ConvNd(nn.Module):
    """N-D convolution with torch-parity padding semantics (see module doc).

    One uniform param layout (``kernel``/``bias`` directly on this module)
    with TPU-aware routing underneath:
      * ``zdecomp`` — 3D valid stride-1 small-channel convs run as a sum of
        2D convs over z-taps (see ZDECOMP_MAX_MIN_CHANNELS note);
      * ``tap_sum`` — opt-in per-tap GEMM path (see TAP_SUM_* note);
      * ``native`` — ``lax.conv_general_dilated`` otherwise.
    ``impl`` pins a route ('auto'|'native'|'zdecomp'|'tap_sum')."""

    features: int
    kernel_size: Sequence[int]
    strides: Union[int, Sequence[int]] = 1
    padding: Union[str, int] = "valid"  # 'valid' | 'same' | int
    padding_mode: str = "zeros"
    use_bias: bool = True
    feature_group_count: int = 1
    kernel_init: Callable = nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform")
    dtype: Any = None
    use_tap_sum: bool = False  # opt-in; see TAP_SUM_* note above
    impl: str = "auto"

    @nn.compact
    def __call__(self, x: Array, params_only: bool = False):
        nd = len(self.kernel_size)
        strides = _norm_tuple(self.strides, nd)
        pads = [(0, 0)] * nd
        if isinstance(self.padding, int):
            if self.padding > 0:
                pads = [(self.padding, self.padding)] * nd
        elif self.padding.lower() == "same":
            pads = [((k - 1) // 2, k - 1 - (k - 1) // 2) for k in self.kernel_size]
        elif self.padding.lower() != "valid":
            raise ValueError(f"unknown padding {self.padding!r}")
        has_pad = any(lo or hi for lo, hi in pads)
        if has_pad and self.padding_mode != "zeros":
            x = pad_spatial(x, pads, self.padding_mode)
            pads = [(0, 0)] * nd
            has_pad = False

        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            self.kernel_init,
            tuple(self.kernel_size)
            + (cin // self.feature_group_count, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        if params_only:
            # probe call: create/return the params with the exact same
            # tree (fused multi-layer routes, e.g. nn/pallas/resblock,
            # consume them directly while checkpoints stay interchangeable)
            return kernel, bias
        compute_dtype = self.dtype or x.dtype
        k = kernel.astype(compute_dtype)
        x = x.astype(compute_dtype)

        out_dims = [
            x.shape[1 + d] + pads[d][0] + pads[d][1] - self.kernel_size[d] + 1
            for d in range(nd)
        ]
        out_spatial = int(np.prod(out_dims))
        if min(out_dims) < 0:
            raise ValueError(
                f"valid conv of kernel {tuple(self.kernel_size)} over padded "
                f"spatial extent {tuple(x.shape[1:1 + nd])} is empty — the "
                "network's input_shape is too small for its depth/kernels"
            )
        route = self.impl
        if min(out_dims) == 0:
            # zero-sized output is legal XLA (param-count probes init at
            # tiny shapes, reference nlayerdiscriminator_test.py:62-66);
            # only the native route can express it
            route = "native"
        if route == "auto":
            if (
                self.use_tap_sum
                and not has_pad
                and all(s == 1 for s in strides)
                and self.feature_group_count == 1
                and min(cin, self.features) >= TAP_SUM_MIN_CHANNELS
                and out_spatial <= TAP_SUM_MAX_SPATIAL
                and all(kk > 1 for kk in self.kernel_size)
            ):
                route = "tap_sum"
            elif (
                nd == 3
                and all(s == 1 for s in strides)
                and self.feature_group_count == 1
                and all(kk > 1 for kk in self.kernel_size)
            ):
                route = "zdecomp"
            elif (
                nd == 2
                and all(s == 1 for s in strides)
                and self.feature_group_count == 1
                # OUTPUT channels small (e.g. the CycleGAN head 64->1):
                # packing beats native 3.1x measured. When only the INPUT
                # is small (stem 1->64) the d2s transposes in the backward
                # cost more than the lane padding they save — native wins
                # 3.5x there (scripts/perf_cyclegan_stages.py, fwd+bwd
                # 3x512^2: head 7.2 vs 22.4 ms, stem 8.2 vs 2.3 ms)
                and self.features <= ZDECOMP_MAX_MIN_CHANNELS
                and all(kk > 1 for kk in self.kernel_size)
            ):
                route = "s2d2d"
            elif (
                nd == 2
                and all(s == 2 for s in strides)
                and self.feature_group_count == 1
                and all(kk > 1 for kk in self.kernel_size)
            ):
                route = "stride2"
            else:
                route = "native"

        if route == "tap_sum":
            if has_pad:
                x = pad_spatial(x, pads, "zeros")
            y = tap_sum_conv(x, k)
        elif route == "zdecomp":
            if has_pad:
                x = pad_spatial(x, pads, "zeros")
            y = conv3d_zdecomp(x, k)
        elif route == "s2d2d":
            if has_pad:
                x = pad_spatial(x, pads, "zeros")
            y = conv2d_s2d(x, k)
        elif route == "stride2":
            if (
                nd == 2
                and tuple(self.kernel_size) == (3, 3)
                and pads == [(1, 1), (1, 1)]
                # the subpixel dx needs MXU-viable channel counts on both
                # sides (the PatchGAN stem 1->64 regressed under it)
                and min(cin, self.features) >= 32
            ):
                # the CycleGAN down conv: exact custom-VJP route (subpixel
                # dx instead of XLA's zero-dilated backward)
                y = conv_s2_p1_k3(x, k)
            else:
                if has_pad:
                    x = pad_spatial(x, pads, "zeros")
                y = conv_stride2_s2d(x, k)
        else:
            y = conv_nd(
                x, k, strides,
                "VALID" if not has_pad else [tuple(p) for p in pads],
                feature_group_count=self.feature_group_count,
            )
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class ConvTransposeNd(nn.Module):
    """N-D transposed convolution with torch output-shape semantics:
    ``out = (in-1)*stride - 2*padding + kernel + output_padding``.

    Uniform ``kernel``/``bias`` param layout. The ResNet upsampler case
    (kernel 3, stride 2, padding 1, output_padding 1) routes through the
    subpixel decomposition (:func:`conv_transpose_s2_subpixel`) — per-phase
    coarse convs instead of XLA's zero-dilated lowering; other configs run
    ``lax.conv_transpose`` VALID followed by static crops."""

    features: int
    kernel_size: Sequence[int]
    strides: Union[int, Sequence[int]] = 1
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform")
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, params_only: bool = False):
        nd = len(self.kernel_size)
        strides = _norm_tuple(self.strides, nd)
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init,
            tuple(self.kernel_size) + (cin, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias else None
        )
        if params_only:
            # probe call: see ConvNd.params_only (fused routes consume the
            # params directly; checkpoints stay interchangeable)
            return kernel, bias
        compute_dtype = self.dtype or x.dtype
        k = kernel.astype(compute_dtype)
        x = x.astype(compute_dtype)
        p, op = self.padding, self.output_padding

        if (
            tuple(self.kernel_size) == (3,) * nd
            and strides == (2,) * nd
            and p == 1 and op == 1
        ):
            if nd == 2:
                # exact custom-VJP: dx via the packed stride-2 route
                y = conv_t_s2_subpixel_vjp(x, k)
            else:
                y = conv_transpose_s2_subpixel(x, k)
        else:
            y = jax.lax.conv_transpose(
                x, k, strides, "VALID",
                dimension_numbers=_conv_transpose_dn(nd),
            )
            if p > 0 or op > 0:
                lo, hi = p, p - op
                assert hi >= 0, "output_padding must be <= padding in this implementation"
                sl = (slice(None),) + tuple(
                    slice(lo, y.shape[1 + d] - hi) for d in range(nd)
                ) + (slice(None),)
                y = y[sl]
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


def _conv_transpose_dn(nd: int):
    """Channels-last dimension-number strings for lax.conv_transpose."""
    spatial = "DHW"[-nd:] if nd <= 3 else None
    if spatial is None:
        # 4D+: build ConvDimensionNumbers-compatible spec via letters
        letters = "".join(chr(ord("A") + i) for i in range(nd))
        return ("N" + letters + "C", letters + "IO", "N" + letters + "C")
    return ("N" + spatial + "C", spatial + "IO", "N" + spatial + "C")


def center_crop(x: Array, target_spatial: Sequence[int]) -> Array:
    """Center-crop spatial dims of a channels-last tensor (parity with
    reference ``UNet.py`` ``crop``)."""
    nd = len(target_spatial)
    spatial = x.shape[-nd - 1:-1]
    offsets = [(s - t) // 2 for s, t in zip(spatial, target_spatial)]
    sl = (
        (slice(None),) * (x.ndim - nd - 1)
        + tuple(slice(o, o + t) for o, t in zip(offsets, target_spatial))
        + (slice(None),)
    )
    return x[sl]


def crop_to_factor_target(
    spatial: Sequence[int], factor: Sequence[int],
    kernel_sizes: Sequence[Sequence[int]],
) -> Tuple[int, ...]:
    """Shape-only crop_to_factor: target spatial extent such that after the
    following convolutions the result is a multiple of the total upsampling
    factor."""
    nd = len(factor)
    conv_crop = tuple(sum(ks[d] - 1 for ks in kernel_sizes) for d in range(nd))
    ns = [int(math.floor(float(s - c) / f)) for s, c, f in zip(spatial, conv_crop, factor)]
    return tuple(n * f + c for n, c, f in zip(ns, conv_crop, factor))


def crop_to_factor(
    x: Array, factor: Sequence[int], kernel_sizes: Sequence[Sequence[int]]
) -> Array:
    """Crop feature maps so that after the following convolutions the result
    shape is a multiple of the total upsampling factor — the translation-
    equivariance guarantee valid U-Nets need for seam-free blockwise
    stitching (contract from reference ``UNet.py:275-325``)."""
    nd = len(factor)
    spatial = x.shape[-nd - 1:-1]
    conv_crop = tuple(sum(ks[d] - 1 for ks in kernel_sizes) for d in range(nd))
    target = crop_to_factor_target(spatial, factor, kernel_sizes)
    if target != tuple(spatial):
        assert all(t > c for t, c in zip(target, conv_crop)), (
            f"feature map {spatial} too small for factor {factor} and convs {kernel_sizes}"
        )
        return center_crop(x, target)
    return x


class NoiseBlock(nn.Module):
    """Append one channel of unit gaussian noise (parity with reference
    ``networks/utils.py:84-94``); PRNG comes from the 'noise' rng stream."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        shape = x.shape[:-1] + (1,)
        noise = jax.random.normal(self.make_rng("noise"), shape, dtype=x.dtype)
        return jnp.concatenate([x, noise], axis=-1)


class ParameterizedNoiseBlock(nn.Module):
    """Append gaussian noise with mean/σ given by the first two channels
    (parity with reference ``networks/utils.py:97-105``)."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        mean = x[..., 0:1]
        std = nn.relu(x[..., 1:2])
        noise = mean + std * jax.random.normal(
            self.make_rng("noise"), mean.shape, dtype=x.dtype
        )
        return jnp.concatenate([x, noise], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _cell_max(xc: Array, F: int) -> Array:
    return jnp.max(xc, axis=-2)


def _cell_max_fwd(xc, F):
    # residual: the argmax cell index (int8 — F <= 127 always here), NOT
    # the input: the backward then never re-reads the full-res tensor
    return jnp.max(xc, axis=-2), jnp.argmax(xc, axis=-2).astype(jnp.int8)


def _cell_max_bwd(F, idx, g):
    iota = jax.lax.broadcasted_iota(
        jnp.int8, g.shape[:-1] + (F,) + g.shape[-1:], g.ndim - 1)
    mask = iota == idx[..., None, :]
    return (jnp.where(mask, g[..., None, :], jnp.zeros((), g.dtype)),)


_cell_max.defvjp(_cell_max_fwd, _cell_max_bwd)


def max_pool_nd(x: Array, factor: Sequence[int]) -> Array:
    """MaxPool with window=stride=factor, VALID (floors remainders — matches
    torch MaxPoolNd default used by reference ``MaxDownsample``).

    Window == stride, so the pool is a pure CELL max: reshape the windows
    onto one axis and reduce it, with a custom VJP that scatters the
    cotangent to the argmax cell (pick-FIRST in row-major window order —
    identical tie-breaking to XLA's ``select_and_scatter``, asserted with
    ties in tests/nn/test_layers_maxpool.py). Why: XLA lowers
    ``reduce_window``'s backward to ``select-and-scatter``, measured at
    11 ms/step of the 260³ MTLSD train step on v5e (r5 device trace) vs
    ~1 ms for the mask form.

    Routing: ``RAYGUN_CELL_MAXPOOL=1`` selects the cell-max form —
    measured and REJECTED at step level (r5 same-session A/B, 260³/196³
    MTLSD train step: 506.7/507.0 vs 498.2 ms and 197.3 vs 195.5 ms):
    the reshape/transpose cell materialization plus the int8 argmax
    residual cost more in context than the 11 ms select-and-scatter they
    remove. Kept opt-in with its bit-exactness tests as the
    measured-and-rejected record; default runs reduce_window."""
    nd = len(factor)
    cell_ok = (
        os.environ.get("RAYGUN_CELL_MAXPOOL")
        and not os.environ.get("RAYGUN_SAS_MAXPOOL")
        and x.ndim == nd + 2
    )
    if not cell_ok:
        window = (1,) + tuple(factor) + (1,) * (x.ndim - 1 - nd)
        return jax.lax.reduce_window(
            x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
            else jnp.iinfo(x.dtype).min,
            jax.lax.max, window, window, "VALID",
        )
    spatial = x.shape[1:1 + nd]
    crop = tuple(s - s % f for s, f in zip(spatial, factor))
    if crop != tuple(spatial):
        sl = (slice(None),) + tuple(slice(0, c) for c in crop) + (
            slice(None),)
        x = x[sl]
    b, c = x.shape[0], x.shape[-1]
    shape = [b]
    for s, f in zip(crop, factor):
        shape += [s // f, f]
    xc = x.reshape(shape + [c])
    # (b, S0, f0, S1, f1, ..., c) -> (b, S0, S1, ..., f0f1..., c)
    perm = ([0] + [1 + 2 * d for d in range(nd)]
            + [2 + 2 * d for d in range(nd)] + [1 + 2 * nd])
    xc = xc.transpose(perm)
    F = int(np.prod(factor))
    out_sp = tuple(s // f for s, f in zip(crop, factor))
    xc = xc.reshape((b,) + out_sp + (F, c))
    return _cell_max(xc, F)


def interpolate(x: Array, scale_factor=None, size=None, method: str = "linear") -> Array:
    """Spatial resize of a channels-last tensor; 'linear' matches torch
    bilinear/trilinear align_corners=False closely enough for the sampling
    bottleneck (reference ``CycleModel.py:27-34``). Use method='nearest' for
    constant upsampling."""
    nd = x.ndim - 2
    spatial = x.shape[1:-1]
    if size is None:
        assert scale_factor is not None
        if isinstance(scale_factor, (int, float)):
            sf = (float(scale_factor),) * nd
        else:
            sf = tuple(float(f) for f in scale_factor)  # fractions allowed
            assert len(sf) == nd
        size = tuple(max(1, int(round(s * f))) for s, f in zip(spatial, sf))
    new_shape = (x.shape[0],) + tuple(size) + (x.shape[-1],)
    jax_method = {"linear": "linear", "bilinear": "linear", "trilinear": "linear", "nearest": "nearest", "cubic": "cubic"}[method]
    return jax.image.resize(x, new_shape, method=jax_method)


def nearest_upsample(x: Array, factor: Sequence[int]) -> Array:
    """Exact nearest-neighbor upsampling by integer factors (repeat)."""
    for d, f in enumerate(factor):
        if f != 1:
            x = jnp.repeat(x, f, axis=1 + d)
    return x
