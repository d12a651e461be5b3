"""N-D U-Net family (UNet, ResidualUNet) — flax, channels-last.

Capability parity with reference ``src/raygun/torch/networks/UNet.py`` and
``ResidualUNet.py`` (funlib-style valid-padding U-Net): same receptive-field
algebra, crop-to-factor translation equivariance, multi-head decoders,
max/strided-conv downsampling, nearest/transposed-conv upsampling, optional
per-ConvPass residuals and noise injection. Shapes are computed statically at
trace time so XLA sees only static shapes.

Differences from the reference by design (TPU-first):
  * channels-last layout (MXU-friendly), batch dim required;
  * norms are constructor-factories resolved via :func:`make_norm`;
  * noise uses an explicit 'noise' PRNG stream instead of global RNG state.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import (
    Array,
    ConvNd,
    ConvTransposeNd,
    NoiseBlock,
    ParameterizedNoiseBlock,
    center_crop,
    conv3d_zdecomp,
    conv_nd,
    crop_to_factor,
    crop_to_factor_target,
    depth_to_space,
    fold_upsample_kernel,
    get_activation,
    make_norm,
    max_pool_nd,
    nearest_upsample,
    pack_conv_kernel_s2d,
    phase_max_pool,
    space_to_depth,
)


class ConvPass(nn.Module):
    """A stack of convolutions (+ optional norm/activation/residual).

    Parity contract (reference ``UNet.py:12-117``): one conv per kernel size;
    'valid' shaves (k-1) per conv; residual mode adds a grouped 1x..x1
    projection of the input, cropped to match, with the final activation
    applied after the sum and omitted from the last conv; ``final`` omits the
    last activation entirely (ResidualUNet variant, ``ResidualUNet.py:23``).
    """

    output_nc: int
    kernel_sizes: Sequence[Sequence[int]]
    activation: Union[str, Callable, None] = "relu"
    padding: str = "valid"
    residual: bool = False
    padding_mode: str = "reflect"
    norm: Union[str, None, Callable] = None
    final: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        act = get_activation(self.activation)
        norm_ctor = make_norm(self.norm)
        nd = len(self.kernel_sizes[0])
        x_in = x
        n = len(self.kernel_sizes)
        for i, ks in enumerate(self.kernel_sizes):
            x = ConvNd(
                features=self.output_nc,
                kernel_size=tuple(ks),
                padding=self.padding,
                padding_mode=self.padding_mode,
            )(x)
            if norm_ctor is not None:
                x = _apply_norm(norm_ctor, x, train)
            is_last = i == n - 1
            if not (self.residual and is_last) and not (self.final and is_last):
                x = act(x)
        if self.residual:
            in_c, out_c = x_in.shape[-1], self.output_nc
            groups = in_c if in_c < out_c else out_c
            init_map = ConvNd(
                features=out_c,
                kernel_size=(1,) * nd,
                padding=self.padding,
                padding_mode=self.padding_mode,
                use_bias=False,
                feature_group_count=groups,
            )(x_in)
            if self.padding.lower() == "valid":
                init_map = center_crop(init_map, x.shape[-nd - 1:-1])
            x = init_map + x
            if not self.final:
                x = act(x)
        return x


def _apply_norm(norm_ctor, x, train):
    mod = norm_ctor()
    try:
        return mod(x, train=train)
    except TypeError:
        return mod(x)


def _apply_norm_act(norm_ctor, x, train, activation):
    """norm followed by activation, fusing the ubiquitous
    instance-norm→(leaky)relu pattern into one Pallas normalize pass on TPU
    (see nn/pallas/instance_norm.py); exact fallback elsewhere."""
    from .layers import InstanceNorm, _pallas_instance_norm_ok, get_activation

    slope = None
    if isinstance(activation, str):
        slope = {"relu": 0.0, "leakyrelu": 0.2}.get(activation.lower())
    if (slope is not None and norm_ctor is InstanceNorm
            and _pallas_instance_norm_ok(x)):
        from .pallas.instance_norm import instance_norm_act_fused

        return instance_norm_act_fused(x, 1e-5, slope)
    return get_activation(activation)(_apply_norm(norm_ctor, x, train))


class ConvDownsample(nn.Module):
    """Strided-conv downsampling (reference ``UNet.py:120-188``): always
    VALID conv with stride=downsample_factor."""

    output_nc: int
    kernel_sizes: Sequence[int]
    downsample_factor: Union[int, Sequence[int]]
    activation: Union[str, Callable, None] = "relu"
    padding_mode: str = "reflect"
    norm: Union[str, None, Callable] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        act = get_activation(self.activation)
        x = ConvNd(
            features=self.output_nc,
            kernel_size=tuple(self.kernel_sizes),
            strides=self.downsample_factor,
            padding="valid",
            padding_mode=self.padding_mode,
        )(x)
        norm_ctor = make_norm(self.norm)
        if norm_ctor is not None:
            x = _apply_norm(norm_ctor, x, train)
        return act(x)


class MaxDownsample(nn.Module):
    """MaxPool downsampling; ``flexible=False`` raises on non-divisible
    shapes (reference ``UNet.py:191-238`` contract)."""

    downsample_factor: Sequence[int]
    flexible: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        factor = tuple(self.downsample_factor)
        nd = len(factor)
        if not self.flexible:
            for d in range(nd):
                if x.shape[1 + d] % factor[d] != 0:
                    raise RuntimeError(
                        f"cannot downsample shape {x.shape} with factor {factor}: "
                        f"mismatch in spatial dimension {d}"
                    )
        return max_pool_nd(x, factor)


class Upsample(nn.Module):
    """Upsample + crop-to-factor + skip-concat (reference ``UNet.py:241-351``).

    ``mode='nearest'`` is the constant upsample; ``mode='transposed_conv'``
    uses kernel=stride=factor."""

    scale_factor: Sequence[int]
    mode: str = "nearest"
    output_nc: Optional[int] = None
    crop_factor: Optional[Sequence[int]] = None
    next_conv_kernel_sizes: Optional[Sequence[Sequence[int]]] = None

    @nn.compact
    def __call__(self, f_left: Array, g_out: Array) -> Array:
        factor = tuple(self.scale_factor)
        nd = len(factor)
        if self.mode == "transposed_conv":
            g_up = ConvTransposeNd(
                features=self.output_nc,
                kernel_size=factor,
                strides=factor,
            )(g_out)
        elif self.mode == "nearest":
            g_up = nearest_upsample(g_out, factor)
        else:
            raise ValueError(f"unknown upsample mode {self.mode!r}")
        if self.crop_factor is not None:
            assert self.next_conv_kernel_sizes is not None
            g_up = crop_to_factor(g_up, self.crop_factor, self.next_conv_kernel_sizes)
        f_cropped = center_crop(f_left, g_up.shape[-nd - 1:-1])
        return jnp.concatenate([f_cropped, g_up], axis=-1)


class _ConvParams(nn.Module):
    """Bare kernel/bias param holder. Named ``ConvNd_i`` inside
    :class:`FusedUpConvPass` so its param paths are identical to the ConvNd
    modules the unfused ``Upsample``+``ConvPass`` pair would create —
    checkpoints are interchangeable between the two decoder paths."""

    shape: Sequence[int]
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform")

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", self.kernel_init, tuple(self.shape))
        bias = (
            self.param("bias", nn.initializers.zeros, (self.shape[-1],))
            if self.use_bias
            else None
        )
        return kernel, bias


def _packed_valid_conv(xp: Array, kernel: Array, bias, factors=(2, 2, 2),
                       offsets=(0, 0, 0), coarse_starts=(0, 0, 0)):
    """One valid fine-grid conv computed on an s2d-packed tensor.

    ``xp``: packed source (coarse grid, prod(f)*cin channels) whose fine
    extent is even per dim. ``kernel``: the UNPACKED (*k, cin, cout) param.
    ``offsets``/``coarse_starts``: fine source window start = f*coarse_start
    + offset per dim (decoder skips crop at arbitrary offsets). Returns the
    packed output on the fine result's own phase grid; the caller slices
    the coarse extent.
    """
    w2 = pack_conv_kernel_s2d(kernel, factors, offsets).astype(xp.dtype)
    ntaps = w2.shape[:3]
    sl = (slice(None),) + tuple(slice(s, None) for s in coarse_starts) + (slice(None),)
    xq = xp[sl]
    xq = jnp.pad(xq, [(0, 0)] + [(0, n - 1) for n in ntaps] + [(0, 0)])
    y = conv3d_zdecomp(xq, w2)
    if bias is not None:
        F = int(np.prod(factors))
        y = y + jnp.tile(bias, F).astype(y.dtype)
    return y


class PackedConvPass(nn.Module):
    """ConvPass computed entirely in s2d-packed (f=2) layout.

    Small-channel full-resolution tensors pay a ~10.8x lane-padding tax on
    TPU (a bf16 12-channel tensor tiles to T(8,128): see the perf note in
    ``nn/layers.py``); packing 2x2x2 fine voxels into channels makes level-0
    tensors 96-channel at 1/8 the voxels — compact in HBM and MXU-friendly.
    Exact same math as ConvPass (kernels re-indexed per
    :func:`pack_conv_kernel_s2d`); params are identical (``ConvNd_i``), so
    checkpoints swap freely between packed/unpacked execution.

    Takes and returns PACKED tensors; requires even fine extents, 3D,
    stride 1, valid padding, no norm/residual.
    """

    output_nc: int
    kernel_sizes: Sequence[Sequence[int]]
    activation: Union[str, Callable, None] = "relu"
    final: bool = False

    @nn.compact
    def __call__(self, xp: Array, cin: int, train: bool = True) -> Array:
        act = get_activation(self.activation)
        n = len(self.kernel_sizes)
        c = cin
        for i, ks in enumerate(self.kernel_sizes):
            assert tuple(ks) == (3, 3, 3), "packed path expects 3^3 kernels"
            kernel, bias = _ConvParams(
                tuple(ks) + (c, self.output_nc), name=f"ConvNd_{i}"
            )()
            coarse_in = xp.shape[1:4]
            xp = _packed_valid_conv(xp, kernel, bias)
            # valid fine extent = 2*coarse_in - (k-1) with k odd ->
            # 2*(coarse_in - 1) fully-covered coarse positions
            xp = xp[:, : coarse_in[0] - 1, : coarse_in[1] - 1,
                    : coarse_in[2] - 1, :]
            if not (self.final and i == n - 1):
                xp = act(xp)
            c = self.output_nc
        return xp


class FusedUpConvPass(nn.Module):
    """Nearest-upsample + crop_to_factor + skip-concat + ConvPass, with the
    upsampled branch's first conv computed at COARSE resolution.

    A k-kernel conv over a factor-f nearest-upsampled input duplicates
    multiplies across each f-block; folding the kernel
    (:func:`fold_upsample_kernel`) computes the identical result as an
    ntap-kernel conv over the coarse grid with prod(f)x packed output
    channels + depth_to_space — for f=2, k=3 that is 0.30x the FLOPs and a
    much MXU-friendlier output-channel count. Measured on TPU v5e (MTLSD
    decoder, bf16): 3.5x / 4.5x / 7.4x per decoder level vs the materialized
    ``jnp.repeat`` path. Numerics match the unfused path exactly (same
    multiplies, re-associated sums; exact in fp32-highest, ~bf16-ulp else).

    Replaces reference ``UNet.py:241-351`` Upsample + first ConvPass conv;
    the skip (f_left) branch stays a plain valid conv on its kernel slice.
    """

    output_nc: int
    kernel_sizes: Sequence[Sequence[int]]
    scale_factor: Sequence[int]
    activation: Union[str, Callable, None] = "relu"
    norm: Union[str, None, Callable] = None
    final: bool = False
    crop_factor: Optional[Sequence[int]] = None
    # f_left arrives s2d-packed and the output stays packed (see
    # PackedConvPass) — avoids ever materializing 12-channel full-res
    # tensors in the decoder tail
    packed_skip: bool = False

    @nn.compact
    def __call__(self, f_left: Array, g: Array, train: bool = True) -> Array:
        if self.packed_skip:
            return self._packed_call(f_left, g, train)
        act = get_activation(self.activation)
        norm_ctor = make_norm(self.norm)
        nd = len(self.scale_factor)
        factors = tuple(self.scale_factor)
        k1 = tuple(self.kernel_sizes[0])
        cf, cg = f_left.shape[-1], g.shape[-1]

        kernel, bias = _ConvParams(
            k1 + (cf + cg, self.output_nc), name="ConvNd_0"
        )()
        kernel = kernel.astype(g.dtype)

        g_spatial = g.shape[1:-1]
        full_up = tuple(s * f for s, f in zip(g_spatial, factors))
        if self.crop_factor is not None:
            target = crop_to_factor_target(full_up, self.crop_factor, self.kernel_sizes)
        else:
            target = full_up
        d_lo = tuple((fu - t) // 2 for fu, t in zip(full_up, target))
        out_sp = tuple(t - (k - 1) for t, k in zip(target, k1))
        assert all(o > 0 for o in out_sp), (
            f"feature map {full_up} too small for crop factor "
            f"{self.crop_factor} and convs {self.kernel_sizes}"
        )

        # upsampled branch: folded coarse conv. Pad g by (ntap-1) zeros at
        # the high end so the conv covers every needed phase; positions whose
        # folded weight is nonzero never read the padding (proof: a nonzero
        # W2[u,r] needs f*u <= r+k-1, while touching the pad needs
        # f*u >= k+r for some in-range output position — contradiction).
        w_g = fold_upsample_kernel(kernel[..., cf:, :], factors)
        ntaps = w_g.shape[:nd]
        g_pad = jnp.pad(
            g, [(0, 0)] + [(0, n - 1) for n in ntaps] + [(0, 0)]
        )
        if nd == 3:
            y_coarse = conv3d_zdecomp(g_pad, w_g)
        else:
            y_coarse = conv_nd(g_pad, w_g)
        t2 = depth_to_space(y_coarse, factors)
        t2 = t2[
            (slice(None),)
            + tuple(slice(d, d + o) for d, o in zip(d_lo, out_sp))
            + (slice(None),)
        ]

        # skip branch: crop f_left to the concat window, valid conv on the
        # f-part of the same kernel (small channels route through zdecomp).
        f_c = center_crop(f_left, target)
        w_f = kernel[..., :cf, :]
        if nd == 3:
            t1 = conv3d_zdecomp(f_c, w_f)
        else:
            t1 = conv_nd(f_c, w_f)

        x = t1 + t2
        if bias is not None:
            x = x + bias.astype(x.dtype)

        n = len(self.kernel_sizes)
        if norm_ctor is not None:
            x = _apply_norm(norm_ctor, x, train)
        if not (self.final and n == 1):
            x = act(x)

        for i, ks in enumerate(self.kernel_sizes[1:], start=1):
            x = ConvNd(
                features=self.output_nc,
                kernel_size=tuple(ks),
                padding="valid",
                name=f"ConvNd_{i}",
            )(x)
            if norm_ctor is not None:
                x = _apply_norm(norm_ctor, x, train)
            if not (self.final and i == n - 1):
                x = act(x)
        return x

    def _packed_call(self, f_leftp: Array, g: Array, train: bool) -> Array:
        """Decoder pass with a PACKED skip and PACKED output.

        Same math as the unpacked path; the skip conv runs directly on the
        packed f_left (crop offsets folded into the kernel via
        ``pack_conv_kernel_s2d``'s offsets), the folded coarse conv's
        output is phase-regrouped from the upsample grid onto the conv1
        output's own phase grid (a pure slice + channel permute in coarse
        space), and the remaining convs stay packed.
        """
        act = get_activation(self.activation)
        factors = tuple(self.scale_factor)
        k1 = tuple(self.kernel_sizes[0])
        assert factors == (2, 2, 2) and k1 == (3, 3, 3), "packed path"
        assert make_norm(self.norm) is None, "packed path has no norm"
        cf = f_leftp.shape[-1] // 8
        cg = g.shape[-1]
        co = self.output_nc

        kernel, bias = _ConvParams(
            k1 + (cf + cg, co), name="ConvNd_0"
        )()
        kernel = kernel.astype(g.dtype)

        f0_fine = tuple(2 * s for s in f_leftp.shape[1:4])
        full_up = tuple(2 * s for s in g.shape[1:4])
        if self.crop_factor is not None:
            target = crop_to_factor_target(full_up, self.crop_factor, self.kernel_sizes)
        else:
            target = full_up
        assert all(t % 2 == 0 for t in target), "packed path needs even extents"
        d_lo = tuple((fu - t) // 2 for fu, t in zip(full_up, target))
        out1 = tuple(t - 2 for t in target)
        lq = tuple(o // 2 for o in out1)
        cf_off = tuple((ff - t) // 2 for ff, t in zip(f0_fine, target))

        # skip branch on the packed f_left
        t1p = _packed_valid_conv(
            f_leftp, kernel[..., :cf, :], None,
            offsets=tuple(o % 2 for o in cf_off),
            coarse_starts=tuple(o // 2 for o in cf_off),
        )
        t1p = t1p[:, : lq[0], : lq[1], : lq[2], :]

        # upsampled branch: folded coarse conv (output packed on the
        # upsample grid), then regroup onto conv1's phase grid
        w_g = fold_upsample_kernel(kernel[..., cf:, :], factors)
        ntaps = w_g.shape[:3]
        g_pad = jnp.pad(g, [(0, 0)] + [(0, n - 1) for n in ntaps] + [(0, 0)])
        y2 = conv3d_zdecomp(g_pad, w_g)
        groups = []
        import itertools as _it

        for r in _it.product((0, 1), repeat=3):
            starts = tuple((d + rr) // 2 for d, rr in zip(d_lo, r))
            ph = tuple((d + rr) % 2 for d, rr in zip(d_lo, r))
            phflat = (ph[0] * 2 + ph[1]) * 2 + ph[2]
            groups.append(
                y2[:, starts[0]: starts[0] + lq[0],
                   starts[1]: starts[1] + lq[1],
                   starts[2]: starts[2] + lq[2],
                   phflat * co: (phflat + 1) * co]
            )
        t2p = jnp.concatenate(groups, axis=-1)

        x = t1p + t2p
        if bias is not None:
            x = x + jnp.tile(bias, 8).astype(x.dtype)
        n = len(self.kernel_sizes)
        if not (self.final and n == 1):
            x = act(x)

        c = co
        for i, ks in enumerate(self.kernel_sizes[1:], start=1):
            assert tuple(ks) == (3, 3, 3), "packed path expects 3^3 kernels"
            kernel_i, bias_i = _ConvParams(
                tuple(ks) + (c, co), name=f"ConvNd_{i}"
            )()
            coarse_in = x.shape[1:4]
            x = _packed_valid_conv(x, kernel_i.astype(x.dtype), bias_i)
            x = x[:, : coarse_in[0] - 1, : coarse_in[1] - 1,
                  : coarse_in[2] - 1, :]
            if not (self.final and i == n - 1):
                x = act(x)
        return x


def _unet_defaults(ndims, num_levels, kernel_size_down, kernel_size_up):
    if kernel_size_down is None:
        kernel_size_down = [[(3,) * ndims, (3,) * ndims]] * num_levels
    if kernel_size_up is None:
        kernel_size_up = [[(3,) * ndims, (3,) * ndims]] * (num_levels - 1)
    return (
        [[tuple(k) for k in level] for level in kernel_size_down],
        [[tuple(k) for k in level] for level in kernel_size_up],
    )


def packed_level0_active(unet_kwargs: dict, spatial_shape: Sequence[int]) -> bool:
    """Whether the UNet will run its level-0 stages in s2d-packed layout
    for this config + input shape. MTLSDModel uses the same predicate to
    keep its 1x1x1 heads packed (one depth_to_space at the very end)."""
    dsf = [tuple(f) for f in unet_kwargs["downsample_factors"]]
    ndims = len(dsf[0])
    if ndims != 3 or len(spatial_shape) != 3:
        return False
    if not unet_kwargs.get("constant_upsample", False):
        return False
    if unet_kwargs.get("padding_type", "valid").lower() != "valid":
        return False
    if unet_kwargs.get("residual", False):
        return False
    if not unet_kwargs.get("fuse_upsample", True):
        return False
    if not unet_kwargs.get("pack_level0", True):
        return False
    if make_norm(unet_kwargs.get("norm")) is not None:
        return False
    if dsf[0] != (2, 2, 2):
        return False
    ks_down, ks_up = _unet_defaults(
        3, len(dsf) + 1,
        unet_kwargs.get("kernel_size_down"), unet_kwargs.get("kernel_size_up"),
    )
    if any(tuple(k) != (3, 3, 3) for k in ks_down[0]):
        return False
    if any(tuple(k) != (3, 3, 3) for k in ks_up[0]):
        return False
    if any(int(s) % 2 for s in spatial_shape):
        return False
    return True


class PackedHead(nn.Module):
    """1x1x1 conv head applied in s2d-packed layout (+ activation +
    depth_to_space). Param-identical to ``ConvPass(kernel_sizes=[(1,1,1)])``
    (``ConvNd_0/kernel`` of shape (1,1,1,cin,cout))."""

    output_nc: int
    cin: int
    activation: Union[str, Callable, None] = "sigmoid"

    @nn.compact
    def __call__(self, zp: Array, train: bool = True) -> Array:
        kernel, bias = _ConvParams(
            (1, 1, 1, self.cin, self.output_nc), name="ConvNd_0"
        )()
        act = get_activation(self.activation)
        b = zp.shape[0]
        sp = zp.shape[1:4]
        z = zp.reshape((b,) + sp + (8, self.cin))
        y = jnp.einsum(
            "...rc,cd->...rd", z, kernel[0, 0, 0].astype(zp.dtype)
        )
        if bias is not None:
            y = y + bias.astype(y.dtype)
        y = act(y)
        y = y.reshape((b,) + sp + (8 * self.output_nc,))
        return depth_to_space(y, (2, 2, 2))


def _crop_factors(downsample_factors, padding_type):
    """Cumulative products of downsample factors, bottom-up (reference
    ``UNet.py`` crop-factor bookkeeping); None per level for 'same'."""
    crop_factors = []
    prod = None
    for factor in list(downsample_factors)[::-1]:
        if padding_type.lower() == "valid":
            prod = list(factor) if prod is None else [f * p for f, p in zip(factor, prod)]
        elif padding_type.lower() == "same":
            prod = None
        else:
            raise ValueError(f"invalid padding_type {padding_type!r}")
        crop_factors.append(prod)
    return crop_factors[::-1]


class UNet(nn.Module):
    """Funlib-style N-D U-Net (parity: reference ``UNet.py:354-666``).

    Returns one tensor (num_heads=1) or a list of head outputs.
    """

    input_nc: int  # kept for config parity; inferred from input at call time
    ngf: int
    fmap_inc_factor: int
    downsample_factors: Sequence[Sequence[int]]
    kernel_size_down: Optional[Sequence[Sequence[Sequence[int]]]] = None
    kernel_size_up: Optional[Sequence[Sequence[Sequence[int]]]] = None
    activation: Union[str, Callable, None] = "relu"
    output_nc: Optional[int] = None
    num_heads: int = 1
    constant_upsample: bool = False
    downsample_method: str = "max"
    padding_type: str = "valid"
    residual: bool = False
    norm: Union[str, None, Callable] = None
    add_noise: Union[bool, str] = False
    fuse_upsample: bool = True  # fold constant-upsample into the next conv
    pack_level0: bool = True  # run level-0 stages in s2d-packed layout
    return_packed_level0: bool = False  # skip the final depth_to_space
    # rematerialize each level's conv pass in the backward (jax.checkpoint
    # at level boundaries): trades ~one extra forward for O(level inputs)
    # activation memory — the lever for larger training crops (VERDICT r2
    # #4). Param tree is unchanged (nn.remat is transparent to params).
    remat_levels: bool = False

    @property
    def ndims(self) -> int:
        return len(self.downsample_factors[0])

    @property
    def num_levels(self) -> int:
        return len(self.downsample_factors) + 1

    def _kwargs_dict(self):
        return dict(
            downsample_factors=self.downsample_factors,
            kernel_size_down=self.kernel_size_down,
            kernel_size_up=self.kernel_size_up,
            constant_upsample=self.constant_upsample,
            padding_type=self.padding_type,
            residual=self.residual,
            norm=self.norm,
            fuse_upsample=self.fuse_upsample,
            pack_level0=self.pack_level0,
        )

    @nn.compact
    def __call__(self, x: Array, train: bool = True):
        ndims = self.ndims
        num_levels = self.num_levels
        ks_down, ks_up = _unet_defaults(
            ndims, num_levels, self.kernel_size_down, self.kernel_size_up
        )
        crop_factors = _crop_factors(self.downsample_factors, self.padding_type)
        is_max = self.downsample_method.lower() == "max"
        if self.remat_levels:
            # checkpoint at level boundaries; static args = the trailing
            # non-array call args (train flag / cin), self is argnum 0
            CP = nn.remat(ConvPass, static_argnums=(2,))
            PCP = nn.remat(PackedConvPass, static_argnums=(2, 3))
            FUCP = nn.remat(FusedUpConvPass, static_argnums=(3,))
            CD = nn.remat(ConvDownsample, static_argnums=(2,))
        else:
            CP, PCP, FUCP, CD = (ConvPass, PackedConvPass, FusedUpConvPass,
                                 ConvDownsample)
        use_packed0 = (
            is_max
            and (num_levels > 1 or not self.add_noise)
            and packed_level0_active(self._kwargs_dict(), x.shape[1:-1])
        )

        def level_fmaps(level):
            return self.ngf * self.fmap_inc_factor**level

        # encoder
        f_lefts = []
        h = x
        for i, level in enumerate(range(num_levels - 1, -1, -1)):
            # i indexes the module arrays (top-down); level counts down to 0
            depth = num_levels - 1 - level  # 0 at top
            if depth == 0 and use_packed0:
                # level-0 stem + pool in s2d-packed layout (see
                # PackedConvPass): the pooled p0 never materializes the
                # lane-padded 12-channel full-res tensor
                h = space_to_depth(h, (2, 2, 2))
                h = PCP(
                    output_nc=level_fmaps(0),
                    kernel_sizes=ks_down[0],
                    activation=self.activation,
                    name="l_conv_0",
                )(h, x.shape[-1], train)
                if level > 0:
                    f_lefts.append(h)  # PACKED skip
                    h = phase_max_pool(h, (2, 2, 2), level_fmaps(0))
                continue
            h = CP(
                output_nc=level_fmaps(depth),
                kernel_sizes=ks_down[depth],
                activation=self.activation,
                padding=self.padding_type,
                residual=self.residual,
                norm=self.norm,
                name=f"l_conv_{depth}",
            )(h, train)
            if level > 0:
                f_lefts.append(h)
                if is_max:
                    h = MaxDownsample(self.downsample_factors[depth], name=f"l_down_{depth}")(h)
                else:
                    h = CD(
                        output_nc=level_fmaps(depth + 1),
                        kernel_sizes=ks_down[depth][0],
                        downsample_factor=self.downsample_factors[depth],
                        activation=self.activation,
                        norm=self.norm,
                        name=f"l_down_{depth}",
                    )(h, train)

        # bottleneck noise injection
        if self.add_noise == "param":
            h = ParameterizedNoiseBlock()(h)
        elif self.add_noise:
            h = NoiseBlock()(h)

        # decoder(s)
        use_fused = (
            self.fuse_upsample
            and self.constant_upsample
            and self.padding_type.lower() == "valid"
            and not self.residual
        )
        heads = [h] * self.num_heads
        for depth in range(num_levels - 2, -1, -1):
            f_left = f_lefts[depth]
            out_nc = (
                self.output_nc
                if (self.output_nc is not None and depth == 0)
                else level_fmaps(depth)
            )
            new_heads = []
            for head in range(self.num_heads):
                if use_fused:
                    g = FUCP(
                        output_nc=out_nc,
                        kernel_sizes=ks_up[depth],
                        scale_factor=self.downsample_factors[depth],
                        activation=self.activation,
                        norm=self.norm,
                        crop_factor=crop_factors[depth],
                        packed_skip=(depth == 0 and use_packed0),
                        name=f"r_conv_{head}_{depth}",
                    )(f_left, heads[head], train)
                else:
                    g = Upsample(
                        scale_factor=self.downsample_factors[depth],
                        mode="nearest" if self.constant_upsample else "transposed_conv",
                        output_nc=level_fmaps(depth + 1),
                        crop_factor=crop_factors[depth],
                        next_conv_kernel_sizes=ks_up[depth],
                        name=f"r_up_{head}_{depth}",
                    )(f_left, heads[head])
                    g = CP(
                        output_nc=out_nc,
                        kernel_sizes=ks_up[depth],
                        activation=self.activation,
                        padding=self.padding_type,
                        residual=self.residual,
                        norm=self.norm,
                        name=f"r_conv_{head}_{depth}",
                    )(g, train)
                new_heads.append(g)
            heads = new_heads

        if use_packed0 and not self.return_packed_level0:
            heads = [depth_to_space(hh, (2, 2, 2)) for hh in heads]
        if self.num_heads == 1:
            return heads[0]
        return heads


class ResidualUNet(nn.Module):
    """UNet with a global input→output residual per head (parity: reference
    ``ResidualUNet.py:689-701``): ``out = act(crop(x) + decoder_out)``, the
    final ConvPass omitting its last activation (``final=True``)."""

    input_nc: int
    ngf: int
    fmap_inc_factor: int
    downsample_factors: Sequence[Sequence[int]]
    kernel_size_down: Optional[Sequence[Sequence[Sequence[int]]]] = None
    kernel_size_up: Optional[Sequence[Sequence[Sequence[int]]]] = None
    activation: Union[str, Callable, None] = "relu"
    output_nc: Optional[int] = None
    num_heads: int = 1
    constant_upsample: bool = False
    downsample_method: str = "max"
    padding_type: str = "valid"
    residual: bool = False
    norm: Union[str, None, Callable] = None
    add_noise: Union[bool, str] = False
    fuse_upsample: bool = True
    remat_levels: bool = False  # see UNet.remat_levels

    @property
    def ndims(self) -> int:
        return len(self.downsample_factors[0])

    @nn.compact
    def __call__(self, x: Array, train: bool = True):
        ndims = self.ndims
        num_levels = len(self.downsample_factors) + 1
        ks_down, ks_up = _unet_defaults(
            ndims, num_levels, self.kernel_size_down, self.kernel_size_up
        )
        crop_factors = _crop_factors(self.downsample_factors, self.padding_type)
        is_max = self.downsample_method.lower() == "max"
        act = get_activation(self.activation)
        if self.remat_levels:
            CP = nn.remat(ConvPass, static_argnums=(2,))
            CD = nn.remat(ConvDownsample, static_argnums=(2,))
        else:
            CP, CD = ConvPass, ConvDownsample

        def level_fmaps(level):
            return self.ngf * self.fmap_inc_factor**level

        f_lefts = []
        h = x
        for depth in range(num_levels):
            h = CP(
                output_nc=level_fmaps(depth),
                kernel_sizes=ks_down[depth],
                activation=self.activation,
                padding=self.padding_type,
                residual=self.residual,
                norm=self.norm,
                name=f"l_conv_{depth}",
            )(h, train)
            if depth < num_levels - 1:
                f_lefts.append(h)
                if is_max:
                    h = MaxDownsample(self.downsample_factors[depth], name=f"l_down_{depth}")(h)
                else:
                    h = CD(
                        output_nc=level_fmaps(depth + 1),
                        kernel_sizes=ks_down[depth][0],
                        downsample_factor=self.downsample_factors[depth],
                        activation=self.activation,
                        norm=self.norm,
                        name=f"l_down_{depth}",
                    )(h, train)

        if self.add_noise == "param":
            h = ParameterizedNoiseBlock()(h)
        elif self.add_noise:
            h = NoiseBlock()(h)

        use_fused = (
            self.fuse_upsample
            and self.constant_upsample
            and self.padding_type.lower() == "valid"
            and not self.residual
        )
        heads = [h] * self.num_heads
        for depth in range(num_levels - 2, -1, -1):
            f_left = f_lefts[depth]
            out_nc = (
                self.output_nc
                if (self.output_nc is not None and depth == 0)
                else level_fmaps(depth)
            )
            new_heads = []
            for head in range(self.num_heads):
                if use_fused:
                    g = FusedUpConvPass(
                        output_nc=out_nc,
                        kernel_sizes=ks_up[depth],
                        scale_factor=self.downsample_factors[depth],
                        activation=self.activation,
                        norm=self.norm,
                        final=(depth == 0),
                        crop_factor=crop_factors[depth],
                        name=f"r_conv_{head}_{depth}",
                    )(f_left, heads[head], train=train)
                else:
                    g = Upsample(
                        scale_factor=self.downsample_factors[depth],
                        mode="nearest" if self.constant_upsample else "transposed_conv",
                        output_nc=level_fmaps(depth + 1),
                        crop_factor=crop_factors[depth],
                        next_conv_kernel_sizes=ks_up[depth],
                        name=f"r_up_{head}_{depth}",
                    )(f_left, heads[head])
                    g = ConvPass(
                        output_nc=out_nc,
                        kernel_sizes=ks_up[depth],
                        activation=self.activation,
                        padding=self.padding_type,
                        residual=self.residual,
                        norm=self.norm,
                        final=(depth == 0),
                        name=f"r_conv_{head}_{depth}",
                    )(g, train=train)
                new_heads.append(g)
            heads = new_heads

        # global residual: out = act(crop(x) + y) per head
        outs = []
        for y in heads:
            x_c = x
            if self.padding_type.lower() == "valid":
                x_c = center_crop(x, y.shape[-ndims - 1:-1])
            if x_c.shape[-1] != y.shape[-1]:
                # broadcast single-channel input residual across output channels
                assert x_c.shape[-1] == 1, (
                    f"residual channel mismatch: {x_c.shape[-1]} vs {y.shape[-1]}"
                )
            outs.append(act(x_c + y))
        if self.num_heads == 1:
            return outs[0]
        return outs
