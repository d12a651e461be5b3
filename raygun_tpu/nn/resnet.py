"""Johnson-style ResNet generators (2D/3D/N-D) — flax, channels-last.

Capability parity with reference ``src/raygun/torch/networks/ResNet.py``:
7-wide stem with reflect/replicate/zeros/valid padding, strided-conv
downsampling, residual blocks (with valid-crop skip), optional noise
injection before upsampling, transposed-conv upsampling, 7-wide head.
Valid-padding FOV math matches the reference exactly (128³→17³ with the
default n_blocks=6 / n_downsampling=2 — reference ``resnet_test.py:80-96``).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    Array,
    ConvNd,
    ConvTransposeNd,
    NoiseBlock,
    ParameterizedNoiseBlock,
    center_crop,
    get_activation,
    make_norm,
    pad_spatial,
)
from .layers import InstanceNorm, _pallas_instance_norm_ok
from .unet import _apply_norm, _apply_norm_act


class ResnetBlock(nn.Module):
    """Two 3^nd convs with skip connection; 'valid' crops the skip to match
    (reference ``ResNet.py:127-223`` / ``:347-443``)."""

    dim: int
    ndims: int
    padding_type: str = "reflect"
    norm: Union[str, None, Callable] = "instance"
    use_dropout: bool = False
    use_bias: bool = True
    activation: Union[str, Callable, None] = "relu"

    @nn.compact
    def __call__(self, x: Array, train: bool = True,
                 params_only: bool = False) -> Array:
        act = get_activation(self.activation)
        norm_ctor = make_norm(self.norm)
        pt = self.padding_type.lower()
        nd = self.ndims

        if params_only:
            # chain route (_apply_resnet_blocks): hand back this block's
            # conv params, created through the SAME ConvNd modules every
            # other route uses — checkpoints swap freely
            w1, b1 = ConvNd(
                features=self.dim, kernel_size=(3,) * nd,
                padding="valid", use_bias=self.use_bias, name="conv1",
            )(x, params_only=True)
            w2, b2 = ConvNd(
                features=self.dim, kernel_size=(3,) * nd,
                padding="valid", use_bias=self.use_bias, name="conv2",
            )(x, params_only=True)
            return w1, b1, w2, b2

        # whole-block fused Pallas route (TPU): conv+IN+relu+conv+IN+skip
        # in slab-resident VMEM — 2.0 -> 0.69 ms fwd / 5.1 -> 2.8 ms
        # fwd+bwd at (3, 128^2, 256) bf16 (scripts/perf_resblock.py).
        # Exact re-expression; params created through the SAME ConvNd
        # modules (probe calls) so checkpoints swap freely.
        if (
            nd == 2
            and pt in ("reflect", "same")
            and norm_ctor is InstanceNorm
            and isinstance(self.activation, str)
            and self.activation.lower() == "relu"
            and not self.use_dropout
            and self.use_bias
            and x.shape[-1] == self.dim
        ):
            from .pallas.resblock import resblock_fused, resblock_fused_ok

            if resblock_fused_ok(x):
                w1, b1 = ConvNd(
                    features=self.dim, kernel_size=(3,) * nd,
                    padding="valid", use_bias=True, name="conv1",
                )(x, params_only=True)
                w2, b2 = ConvNd(
                    features=self.dim, kernel_size=(3,) * nd,
                    padding="valid", use_bias=True, name="conv2",
                )(x, params_only=True)
                return resblock_fused(
                    x, w1.astype(x.dtype), b1.astype(x.dtype),
                    w2.astype(x.dtype), b2.astype(x.dtype))

        def block_conv(h, name):
            if pt in ("reflect", "same"):
                h = pad_spatial(h, [(1, 1)] * nd, "reflect")
                pad = "valid"
            elif pt == "replicate":
                h = pad_spatial(h, [(1, 1)] * nd, "replicate")
                pad = "valid"
            elif pt == "zeros":
                pad = 1
            elif pt == "valid":
                pad = "valid"
            else:
                raise NotImplementedError(f"padding [{pt}] is not implemented")
            return ConvNd(
                features=self.dim,
                kernel_size=(3,) * nd,
                padding=pad,
                use_bias=self.use_bias,
                name=name,
            )(h)

        h = block_conv(x, "conv1")
        if norm_ctor is not None:
            h = _apply_norm_act(norm_ctor, h, train, self.activation)
        else:
            h = act(h)
        if self.use_dropout:
            h = nn.Dropout(rate=0.2, deterministic=not train)(h)
        h = block_conv(h, "conv2")

        if pt == "valid":
            x = center_crop(x, h.shape[-nd - 1:-1])
        if norm_ctor is InstanceNorm and _pallas_instance_norm_ok(h):
            # fused skip + IN(conv2) tail: one normalize+add pass
            from .pallas.instance_norm import instance_norm_add_fused

            return instance_norm_add_fused(h, x)
        if norm_ctor is not None:
            h = _apply_norm(norm_ctor, h, train)
        return x + h


def _apply_resnet_blocks(h, blocks, train, nd, pt, norm_ctor, activation,
                         use_dropout, use_bias, dim):
    """Apply the generator's resnet blocks, chaining their BACKWARD into
    one resident Pallas kernel when the family and shapes allow
    (nn/pallas/resblock_chain_bwd.py: removes the 5 inter-block cotangent
    HBM round-trips of the per-block route — bit-exact, same param tree).
    Opt-in via RAYGUN_RBCHAIN=1 until the step-level A/B lands."""
    import os

    if (
        os.environ.get("RAYGUN_RBCHAIN") == "1"
        and len(blocks) >= 2
        and nd == 2
        and pt in ("reflect", "same")
        and norm_ctor is InstanceNorm
        and isinstance(activation, str)
        and activation.lower() == "relu"
        and not use_dropout
        and use_bias
        and h.shape[-1] == dim
    ):
        from .pallas.resblock import resblock_fused_ok
        from .pallas.resblock_chain_bwd import (
            rb_chain_bwd_ok,
            resblock_chain_bwdfused,
        )

        if resblock_fused_ok(h) and rb_chain_bwd_ok(h, len(blocks)):
            dt = h.dtype
            pars = [blk(h, params_only=True) for blk in blocks]
            w1s = jnp.stack([p[0] for p in pars]).astype(dt)
            b1s = jnp.stack([p[1] for p in pars]).astype(dt)
            w2s = jnp.stack([p[2] for p in pars]).astype(dt)
            b2s = jnp.stack([p[3] for p in pars]).astype(dt)
            return resblock_chain_bwdfused(h, w1s, b1s, w2s, b2s)
    for blk in blocks:
        h = blk(h, train=train)
    return h


class ResNet(nn.Module):
    """Resnet generator; ``ndims`` selects 2D/3D (ValueError otherwise, parity
    with the reference dispatcher ``ResNet.py:446-473``)."""

    ndims: int
    input_nc: int = 1
    output_nc: Optional[int] = None
    ngf: int = 64
    norm: Union[str, None, Callable] = "instance"
    use_dropout: bool = False
    n_blocks: int = 6
    padding_type: str = "reflect"
    activation: Union[str, Callable, None] = "relu"
    add_noise: Union[bool, str] = False
    n_downsampling: int = 2

    def __post_init__(self):
        if self.ndims not in (2, 3):
            raise ValueError(
                self.ndims, "Only 2D or 3D currently implemented. Feel free to contribute more!"
            )
        super().__post_init__()

    def uses_packed_shell(self, x: Array) -> bool:
        """True iff __call__(x) will take the packed-shell route (static at
        trace time; callers like the generator head wrapper use this to
        fold their 1x1 conv into the packed head — systems/base.py)."""
        from .packed_shell import packed_shell_ok

        norm_ctor = make_norm(self.norm)
        norm_name = self.norm if isinstance(self.norm, str) else (
            "instance" if self.norm else "none")
        use_bias = (norm_name.startswith("instance")
                    or norm_name in ("none",) or self.norm is None)
        return (
            self.ndims == 2
            and self.padding_type.lower() in ("reflect", "same")
            and norm_ctor is InstanceNorm
            and isinstance(self.activation, str)
            and self.activation.lower() == "relu"
            and self.n_downsampling == 2
            and use_bias
            and packed_shell_ok(x, self.ngf)
        )

    @nn.compact
    def __call__(self, x: Array, train: bool = True,
                 head_fold=None) -> Array:
        assert self.n_blocks >= 0
        nd = self.ndims
        act = get_activation(self.activation)
        norm_ctor = make_norm(self.norm)
        # torch parity: bias only when norm is instance-norm (batchnorm has affine bias)
        norm_name = self.norm if isinstance(self.norm, str) else ("instance" if self.norm else "none")
        use_bias = norm_name.startswith("instance") or norm_name in ("none",) or self.norm is None
        output_nc = self.output_nc if self.output_nc is not None else self.ngf

        pt = self.padding_type.lower()

        # packed-shell route (TPU): the full-res stem/down_0/up_1/head run
        # on 2x2 space-to-depth packed tensors (C >= 128 full lanes) —
        # avoids XLA's batch-in-sublanes conv layouts + relayout copies at
        # C=64 and the head's 127/128-idle MXU (measured ~12 ms/apply fwd
        # at 3x512^2, scripts/perf_shell_ops.py). Exact re-expression;
        # params through the SAME modules (checkpoints swap freely).
        if self.uses_packed_shell(x):
            from .layers import pack_conv_kernel_io
            from .packed_shell import (
                down0_from_packed,
                head_from_packed,
                stem_packed,
                up1_packed_kernel,
                up1_to_packed,
            )
            from .pallas.fconv import fconv2_ok, fused_pro_conv2
            from .pallas.instance_norm import instance_norm_act_packed
            from .pallas.shell_fused import shell_fused_ok

            dt = x.dtype

            # megakernel stages (TPU, production family): selected shell
            # segments run as ONE resident Pallas kernel each with
            # in-kernel instance norms (nn/pallas/shell_fused.py).
            # RAYGUN_SHELL_MEGA selects stages ("d1,d2,u1"); each is an
            # exact re-expression with the SAME param modules, so any
            # combination is checkpoint-compatible. Default: "u1" — the
            # round-4 same-session step-level A/B (docs/PERFORMANCE.md
            # "Megakernel shell stages") measured the production 3x512^2
            # step at 151.23/151.17 ms baseline vs 145.41/145.55 ms with
            # u1 (repeated), d1 within noise (150.19) and d1+u1 no better
            # than u1 alone (145.46) — a reproducible 5.7 ms win that
            # takes the step past the 40% MFU target. Set
            # RAYGUN_SHELL_MEGA="" to disable, or name stages explicitly.
            mega = set()
            if shell_fused_ok(x, self.ngf) and not self.use_dropout:
                import os as _os

                raw = _os.environ.get("RAYGUN_SHELL_MEGA")
                if raw is None:
                    raw = "u1"
                mega = {t.strip() for t in raw.split(",") if t.strip()}

            w_s, b_s = ConvNd(
                features=self.ngf, kernel_size=(7, 7), padding="valid",
                use_bias=use_bias, name="stem",
            )(x, params_only=True)
            w_d, b_d = ConvNd(
                features=self.ngf * 2, kernel_size=(3, 3), strides=2,
                padding=1, use_bias=use_bias, name="down_0",
            )(jnp.zeros((1, 1, 1, self.ngf), dt), params_only=True)
            w2_d0 = pack_conv_kernel_io(
                w_d.astype(dt), (2, 2), (1, 1), (2, 2), (1, 1))[0]
            w2s_d0 = w2_d0.reshape(2, -1, w2_d0.shape[-1])
            if "d1" in mega and b_d is not None:
                from .pallas.shell_fused import d1_fused, stem_im2col

                ws = pack_conv_kernel_io(
                    w_s.astype(dt), (2, 2), (2, 2), (1, 1), (0, 0)
                )[0].reshape(-1, 4 * self.ngf)
                h = d1_fused(stem_im2col(x), ws,
                             jnp.tile(b_s, 4).astype(dt),
                             w2s_d0, b_d.astype(dt))
            else:
                y0 = stem_packed(x, w_s.astype(dt), b_s.astype(dt))
                # fused stage (TPU): the packed stem output's IN+relu,
                # the zero pad, and the 2x2-tap down_0 conv in ONE Pallas
                # kernel with a traffic-floor custom VJP
                # (nn/pallas/fconv.py). Exact; same params either way.
                if b_d is not None and fconv2_ok(y0, w2s_d0):
                    h = fused_pro_conv2(y0, w2s_d0, b_d.astype(dt), 4,
                                        "lo")
                else:
                    hp = instance_norm_act_packed(y0, self.ngf)
                    h = down0_from_packed(hp, w_d.astype(dt),
                                          b_d.astype(dt))
            down1 = ConvNd(
                features=self.ngf * 4, kernel_size=(3, 3), strides=2,
                padding=1, use_bias=use_bias, name="down_1",
            )
            if "d2" in mega and use_bias:
                from .pallas.shell_fused import d2_fused

                w_d1, b_d1 = down1(jnp.zeros((1, 1, 1, self.ngf * 2), dt),
                                   params_only=True)
                # fine origin -1 (the k3 zero pad lives inside the
                # padded cell grid) -> pack starts (0, 0)
                wd1 = pack_conv_kernel_io(
                    w_d1.astype(dt), (2, 2), (1, 1), (2, 2), (0, 0)
                )[0].reshape(2, 16 * self.ngf, 4 * self.ngf)
                h = d2_fused(h, wd1, b_d1.astype(dt))
            else:
                h = _apply_norm_act(norm_ctor, h, train, self.activation)
                h = down1(h)
                h = _apply_norm_act(norm_ctor, h, train, self.activation)
            h = _apply_resnet_blocks(
                h,
                [ResnetBlock(
                    dim=self.ngf * 4, ndims=nd, padding_type=pt,
                    norm=self.norm, use_dropout=self.use_dropout,
                    use_bias=use_bias, activation=self.activation,
                    name=f"block_{i}",
                ) for i in range(self.n_blocks)],
                train, nd, pt, norm_ctor, self.activation,
                self.use_dropout, use_bias, self.ngf * 4)
            if self.add_noise == "param":
                h = ParameterizedNoiseBlock()(h)
            elif self.add_noise:
                h = NoiseBlock()(h)
            up0 = ConvTransposeNd(
                features=self.ngf * 2, kernel_size=(3, 3), strides=2,
                padding=1, output_padding=1, use_bias=use_bias, name="up_0",
            )
            up1 = ConvTransposeNd(
                features=self.ngf, kernel_size=(3, 3), strides=2,
                padding=1, output_padding=1, use_bias=use_bias, name="up_1",
            )
            if "u1" in mega and use_bias:
                from .pallas.fconv import conv2_plain
                from .pallas.shell_fused import u1_fused

                w_u0, b_u0 = up0(jnp.zeros((1, 1, 1, self.ngf * 4), dt),
                                 params_only=True)
                wu0 = up1_packed_kernel(w_u0.astype(dt)).reshape(
                    2, 8 * self.ngf, 8 * self.ngf)
                a3 = u1_fused(h, wu0, jnp.tile(b_u0, 4).astype(dt))
                w_u, b_u = up1(jnp.zeros((1, 1, 1, self.ngf * 2), dt),
                               params_only=True)
                w2s_u1 = up1_packed_kernel(w_u.astype(dt)).reshape(
                    2, 4 * self.ngf, 4 * self.ngf)
                # up_1 as a plain (no-prologue — u1 owns the IN) fused k2
                hp = conv2_plain(a3, w2s_u1, jnp.tile(b_u, 4).astype(dt),
                                 "hi")
            else:
                y3 = up0(h)
                w_u, b_u = up1(jnp.zeros((1, 1, 1, y3.shape[-1]), dt),
                               params_only=True)
                # fused stage: up_0's IN+relu + the subpixel up_1 conv (a
                # 2x2-tap pad-'hi' stride-1 conv straight to the packed
                # layout) in one kernel — see the down_0 note above.
                w2_u1 = up1_packed_kernel(w_u.astype(dt))
                w2s_u1 = w2_u1.reshape(2, -1, w2_u1.shape[-1])
                if b_u is not None and fconv2_ok(y3, w2s_u1):
                    b2_u1 = jnp.tile(b_u, 4).astype(dt)
                    hp = fused_pro_conv2(y3, w2s_u1, b2_u1, 1, "hi")
                else:
                    h = _apply_norm_act(norm_ctor, y3, train,
                                        self.activation)
                    hp = up1_to_packed(h, w_u.astype(dt), b_u.astype(dt))
            w_h, b_h = ConvNd(
                features=output_nc, kernel_size=(7, 7), padding="valid",
                name="head",
            )(jnp.zeros((1, 1, 1, self.ngf), dt), params_only=True)
            if head_fold is not None:
                # fold the caller's 1x1 conv (systems' generator assembly,
                # base.py _WithHead) into the 7x7 head: no norm/activation
                # sits between them, so conv1x1(conv7(x, W)) ==
                # conv7(x, W @ V) exactly — and the folded head is narrow
                # (co=1), unlocking the f=8 output packing
                V, b1 = head_fold
                Vf = V.reshape(V.shape[-2:]).astype(jnp.float32)
                w_h = jnp.einsum(
                    "yxim,mo->yxio", w_h.astype(jnp.float32), Vf)
                b_h = b_h.astype(jnp.float32) @ Vf
                if b1 is not None:
                    b_h = b_h + b1.astype(jnp.float32)
            if "h1" in mega:
                # resident IN+pad+head stage (nn/pallas/shell_fused.py
                # h1_fused): the whole suffix boundary in one kernel per
                # image; falls through to the packed composition when the
                # shape family doesn't apply
                from .packed_shell import head_f_out
                from .pallas.shell_fused import h1_fused, h1_ok

                co = w_h.shape[-1]
                f = head_f_out(co)
                while (2 * hp.shape[1]) % f or (2 * hp.shape[2]) % f:
                    f //= 2
                if f == 8:
                    w2h, _, cstr = pack_conv_kernel_io(
                        w_h.astype(dt), (2, 2), (8, 8), (1, 1), (1, 1))
                    if tuple(cstr) == (4, 4) and h1_ok(hp, w2h):
                        from .layers import depth_to_space

                        yq = h1_fused(hp, w2h, self.ngf)
                        yq = yq + jnp.tile(b_h, f * f).astype(dt)
                        return depth_to_space(yq, (f, f))
            hp = instance_norm_act_packed(hp, self.ngf)
            return head_from_packed(hp, w_h.astype(dt), b_h.astype(dt))

        stem_pad = "valid"
        updown_p = 1
        if pt in ("reflect", "same"):
            x = pad_spatial(x, [(3, 3)] * nd, "reflect")
        elif pt == "replicate":
            x = pad_spatial(x, [(3, 3)] * nd, "replicate")
        elif pt == "zeros":
            stem_pad = 3
        elif pt == "valid":
            updown_p = 0
        else:
            raise NotImplementedError(f"padding [{pt}] is not implemented")

        h = ConvNd(
            features=self.ngf, kernel_size=(7,) * nd, padding=stem_pad, use_bias=use_bias,
            name="stem",
        )(x)
        if norm_ctor is not None:
            h = _apply_norm_act(norm_ctor, h, train, self.activation)
        else:
            h = act(h)

        for i in range(self.n_downsampling):
            mult = 2**i
            h = ConvNd(
                features=self.ngf * mult * 2,
                kernel_size=(3,) * nd,
                strides=2,
                padding=updown_p if updown_p else "valid",
                use_bias=use_bias,
                name=f"down_{i}",
            )(h)
            if norm_ctor is not None:
                h = _apply_norm_act(norm_ctor, h, train, self.activation)
            else:
                h = act(h)

        mult = 2**self.n_downsampling
        h = _apply_resnet_blocks(
            h,
            [ResnetBlock(
                dim=self.ngf * mult,
                ndims=nd,
                padding_type=pt,
                norm=self.norm,
                use_dropout=self.use_dropout,
                use_bias=use_bias,
                activation=self.activation,
                name=f"block_{i}",
            ) for i in range(self.n_blocks)],
            train, nd, pt, norm_ctor, self.activation,
            self.use_dropout, use_bias, self.ngf * mult)

        if self.add_noise == "param":
            h = ParameterizedNoiseBlock()(h)
        elif self.add_noise:
            h = NoiseBlock()(h)

        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            h = ConvTransposeNd(
                features=int(self.ngf * mult / 2),
                kernel_size=(3,) * nd,
                strides=2,
                padding=updown_p,
                output_padding=updown_p,
                use_bias=use_bias,
                name=f"up_{i}",
            )(h)
            if norm_ctor is not None:
                h = _apply_norm_act(norm_ctor, h, train, self.activation)
            else:
                h = act(h)

        head_pad = "valid"
        if pt in ("reflect", "same"):
            h = pad_spatial(h, [(3, 3)] * nd, "reflect")
        elif pt == "replicate":
            h = pad_spatial(h, [(3, 3)] * nd, "replicate")
        elif pt == "zeros":
            head_pad = 3
        h = ConvNd(
            features=output_nc, kernel_size=(7,) * nd, padding=head_pad, name="head"
        )(h)
        if head_fold is not None:
            # defensive completeness: a caller that requested the fold but
            # landed on the standard route still gets the 1x1 applied here
            from .layers import conv_nd

            V, b1 = head_fold
            h = conv_nd(h, V.astype(h.dtype))
            if b1 is not None:
                h = h + b1.astype(h.dtype)
        return h


def resnet_valid_output_shape(input_shape, n_blocks=6, n_downsampling=2):
    """Static FOV math for the valid-padding generator; used by blockwise
    inference to derive read/write ROIs (reference ``predict.py:73-108``)."""
    out = []
    for s in input_shape:
        s = s - 6  # 7-wide stem
        for _ in range(n_downsampling):
            s = (s - 3) // 2 + 1
        s = s - 4 * n_blocks
        for _ in range(n_downsampling):
            s = (s - 1) * 2 + 3
        s = s - 6  # 7-wide head
        out.append(s)
    return tuple(out)
