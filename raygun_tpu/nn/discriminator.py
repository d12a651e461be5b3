"""PatchGAN discriminators (2D/3D/N-D) — flax, channels-last.

Capability parity with reference
``src/raygun/torch/networks/NLayerDiscriminator.py``: k=4 stride-2 conv
stack with explicit padding 1, channel doubling capped at 8×ngf, two stride-1
tail convs, 1-channel prediction map; bias rules follow the norm choice
(bias only with instance norm — batch norm carries its own affine bias).
The default 3D configuration reproduces the reference's exact parameter
count (11,048,769; reference ``nlayerdiscriminator_test.py:62-66``).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from .layers import Array, ConvNd, get_activation, make_norm
from .unet import _apply_norm, _apply_norm_act


class NLayerDiscriminator(nn.Module):
    """N-D PatchGAN. ``ndims`` ∈ {2, 3} (parity with the reference
    dispatcher, ValueError otherwise)."""

    ndims: int
    input_nc: int = 1
    ngf: int = 64
    n_layers: int = 3
    norm: Union[str, None, Callable] = "batch"
    kw: int = 4
    downsampling_kw: Optional[int] = None

    def __post_init__(self):
        if self.ndims not in (2, 3):
            raise ValueError(
                self.ndims, "Only 2D or 3D currently implemented. Feel free to contribute more!"
            )
        super().__post_init__()

    @property
    def fov(self) -> int:
        """Receptive field of one output neuron (parity with reference
        ``NLayerDiscriminator.py:79-97``)."""
        ds_kw = self.downsampling_kw or self.kw
        k = [ds_kw] + [ds_kw] * (self.n_layers - 1) + [self.kw, self.kw]
        s = [2] + [2] * (self.n_layers - 1) + [1, 1]
        r = 1
        for l in range(len(k) - 1, 0, -1):
            r = s[l] * r + (k[l] - s[l])
        return r

    def uses_packed(self, x: Array) -> bool:
        """True iff __call__(x) will take the packed pair-tensor route
        (static at trace time): 2D, ds_kw=2 downsampling (the pair-window
        structure the 1x1-GEMM re-expression needs), extents % 4."""
        from .packed_shell import packed_disc_ok

        ds_kw = self.downsampling_kw or self.kw
        return self.ndims == 2 and ds_kw == 2 and packed_disc_ok(x, self.ngf)

    def uses_fused(self, x: Array) -> bool:
        """True iff __call__(x) will run as the two-stage resident Pallas
        megakernels (static at trace time): the exact production
        architecture (ds_kw=2, kw=3, n_layers=3, non-affine instance
        norm) at VMEM-resident per-image working sets
        (nn/pallas/disc_fused.py)."""
        from .layers import InstanceNorm
        from .pallas.disc_fused import disc_fused_ok, disc_fused_structural_ok

        if x.ndim != 4:
            return False
        ds_kw = self.downsampling_kw or self.kw
        return disc_fused_structural_ok(
            self.ndims, self.n_layers, self.kw, ds_kw,
            make_norm(self.norm) is InstanceNorm,
            x.shape[1], x.shape[2]) and disc_fused_ok(x, self.ngf)

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        nd = self.ndims
        norm_ctor = make_norm(self.norm)
        norm_name = self.norm if isinstance(self.norm, str) else "none"
        use_bias = self.norm is None or norm_name.startswith("instance") or norm_name == "none"
        lrelu = get_activation("leakyrelu")
        ds_kw = self.downsampling_kw or self.kw

        # fused route (TPU, production architecture): the whole net as two
        # resident Pallas kernels per direction — conv/norm boundaries
        # never touch HBM (nn/pallas/disc_fused.py). Exact re-expression;
        # params come through the SAME ConvNd modules (checkpoints swap
        # freely across all three routes).
        if self.uses_fused(x):
            from .pallas.disc_fused import disc_fused_apply

            ws = []
            w0, b0 = ConvNd(
                features=self.ngf, kernel_size=(2,) * nd, strides=2,
                padding=1, name="conv_0",
            )(x, params_only=True)
            ws += [w0, b0]
            nf_mult = 1
            for n in range(1, self.n_layers):
                nf_prev, nf_mult = nf_mult, min(2**n, 8)
                wn, bn = ConvNd(
                    features=self.ngf * nf_mult, kernel_size=(2,) * nd,
                    strides=2, padding=1, use_bias=use_bias,
                    name=f"conv_{n}",
                )(jnp.zeros((1, 1, 1, self.ngf * nf_prev), x.dtype),
                  params_only=True)
                ws += [wn, bn]
            nf_mult = min(2**self.n_layers, 8)
            w3, b3 = ConvNd(
                features=self.ngf * nf_mult, kernel_size=(self.kw,) * nd,
                strides=1, padding=1, use_bias=use_bias,
                name=f"conv_{self.n_layers}",
            )(jnp.zeros((1, 1, 1, self.ngf * nf_mult // 2), x.dtype),
              params_only=True)
            wo, bo = ConvNd(
                features=1, kernel_size=(self.kw,) * nd, strides=1,
                padding=1, name="conv_out",
            )(jnp.zeros((1, 1, 1, self.ngf * nf_mult), x.dtype),
              params_only=True)
            return disc_fused_apply(x, *ws, w3, b3, wo, bo)

        # packed route (TPU): the k2-s2-p1 downsampling stack runs as 1x1
        # GEMMs over space-to-depth'd pair tensors and conv_out as a
        # tap-sum GEMM — avoids the C=64 fine-tensor relayout pathology
        # and the C_out=1 idle-lane conv (see nn/packed_shell.py, measured
        # in scripts/perf_d_layers.py). Exact re-expression; params
        # through the SAME modules (checkpoints swap freely). Norms and
        # activations (except conv_0's lrelu, elementwise either way) see
        # the exact fine tensors, so any norm mode composes unchanged.
        if self.uses_packed(x):
            from .packed_shell import (
                disc_down_from_packed,
                disc_head_tapsum,
                disc_mask_pad_phase,
                disc_stem_packed,
                repack_pairs,
            )
            from .layers import depth_to_space

            dt = x.dtype
            w0, b0 = ConvNd(
                features=self.ngf, kernel_size=(2,) * nd, strides=2,
                padding=1, name="conv_0",
            )(x, params_only=True)
            hp = disc_stem_packed(
                x, w0.astype(dt), None if b0 is None else b0.astype(dt))
            hp = disc_mask_pad_phase(lrelu(hp), self.ngf)

            h = hp
            nf_mult = 1
            for n in range(1, self.n_layers):
                nf_prev, nf_mult = nf_mult, min(2**n, 8)
                wn, bn = ConvNd(
                    features=self.ngf * nf_mult, kernel_size=(2,) * nd,
                    strides=2, padding=1, use_bias=use_bias,
                    name=f"conv_{n}",
                )(jnp.zeros((1, 1, 1, self.ngf * nf_prev), dt),
                  params_only=True)
                h = disc_down_from_packed(
                    h, wn.astype(dt), None if bn is None else bn.astype(dt))
                if norm_ctor is not None:
                    h = _apply_norm_act(norm_ctor, h, train, "leakyrelu")
                else:
                    h = lrelu(h)
                if n < self.n_layers - 1:
                    h = repack_pairs(h)
            if self.n_layers == 1:
                # no stride-2 follower consumed the pairs: unpack, drop pad
                h = depth_to_space(h, (2, 2))[:, 1:, 1:, :]

            nf_mult = min(2**self.n_layers, 8)
            h = ConvNd(
                features=self.ngf * nf_mult, kernel_size=(self.kw,) * nd,
                strides=1, padding=1, use_bias=use_bias,
                name=f"conv_{self.n_layers}",
            )(h)
            if norm_ctor is not None:
                h = _apply_norm_act(norm_ctor, h, train, "leakyrelu")
            else:
                h = lrelu(h)
            wo, bo = ConvNd(
                features=1, kernel_size=(self.kw,) * nd, strides=1,
                padding=1, name="conv_out",
            )(jnp.zeros((1, 1, 1, self.ngf * nf_mult), dt),
              params_only=True)
            return disc_head_tapsum(
                h, wo.astype(dt), None if bo is None else bo.astype(dt))

        h = ConvNd(
            features=self.ngf, kernel_size=(ds_kw,) * nd, strides=2, padding=1,
            name="conv_0",
        )(x)
        h = lrelu(h)

        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2**n, 8)
            h = ConvNd(
                features=self.ngf * nf_mult,
                kernel_size=(ds_kw,) * nd,
                strides=2,
                padding=1,
                use_bias=use_bias,
                name=f"conv_{n}",
            )(h)
            if norm_ctor is not None:
                h = _apply_norm_act(norm_ctor, h, train, "leakyrelu")
            else:
                h = lrelu(h)

        nf_mult = min(2**self.n_layers, 8)
        h = ConvNd(
            features=self.ngf * nf_mult,
            kernel_size=(self.kw,) * nd,
            strides=1,
            padding=1,
            use_bias=use_bias,
            name=f"conv_{self.n_layers}",
        )(h)
        if norm_ctor is not None:
            h = _apply_norm_act(norm_ctor, h, train, "leakyrelu")
        else:
            h = lrelu(h)

        h = ConvNd(
            features=1, kernel_size=(self.kw,) * nd, strides=1, padding=1,
            name="conv_out",
        )(h)
        return h


class NLayerDiscriminator2D(NLayerDiscriminator):
    ndims: int = 2


class NLayerDiscriminator3D(NLayerDiscriminator):
    ndims: int = 3
