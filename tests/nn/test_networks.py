"""Shape / parameter parity tests mirroring the reference unit suite
(reference ``tests/torch/networks/*`` — SURVEY §4). Layout is channels-last
here, so torch's (N, C, *S) expectations become (N, *S, C)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raygun_tpu.nn import (
    ConvPass,
    MaxDownsample,
    NLayerDiscriminator,
    ResNet,
    UNet,
    ResidualUNet,
    param_count,
    resnet_valid_output_shape,
)


def init_and_apply(model, x, key=None, rngs_extra=None, train=False):
    key = key or jax.random.PRNGKey(0)
    rngs = {"params": key}
    if rngs_extra:
        rngs.update(rngs_extra)
    variables = model.init(rngs, x, train=train)
    out = model.apply(variables, x, train=train, rngs=rngs_extra)
    return variables, out


class TestConvPass:
    def test_valid_output_shape(self):
        # reference unet_test.py:11-28: 10^3 -> 8^3 with one 3^3 valid conv
        model = ConvPass(output_nc=1, kernel_sizes=[(3, 3, 3)], padding="valid")
        x = jnp.zeros((1, 10, 10, 10, 1))
        _, y = init_and_apply(model, x)
        assert y.shape == (1, 8, 8, 8, 1)

    def test_residual_output_shape(self):
        model = ConvPass(
            output_nc=1, kernel_sizes=[(3, 3, 3)], padding="valid", residual=True
        )
        x = jnp.zeros((1, 10, 10, 10, 1))
        _, y = init_and_apply(model, x)
        assert y.shape == (1, 8, 8, 8, 1)

    def test_same_padding(self):
        model = ConvPass(output_nc=4, kernel_sizes=[(3, 3), (3, 3)], padding="same")
        x = jnp.zeros((2, 16, 16, 3))
        _, y = init_and_apply(model, x)
        assert y.shape == (2, 16, 16, 4)


class TestMaxDownsample:
    def test_downsample_2d_3d(self):
        x2 = jnp.arange(1 * 32 * 32 * 3, dtype=jnp.float32).reshape(1, 32, 32, 3)
        y2 = MaxDownsample((2, 2)).apply({}, x2)
        assert y2.shape == (1, 16, 16, 3)
        x3 = jnp.zeros((1, 32, 32, 32, 3))
        y3 = MaxDownsample((2, 2, 2), flexible=False).apply({}, x3)
        assert y3.shape == (1, 16, 16, 16, 3)

    def test_mismatch_error(self):
        x = jnp.zeros((1, 33, 33, 3))
        with pytest.raises(RuntimeError):
            MaxDownsample((2, 2), flexible=False).apply({}, x)

    def test_flexible_floors(self):
        x = jnp.zeros((1, 33, 33, 3))
        y = MaxDownsample((2, 2), flexible=True).apply({}, x)
        assert y.shape == (1, 16, 16, 3)


class TestUNet:
    def test_init_properties(self):
        unet = UNet(
            input_nc=3, ngf=16, fmap_inc_factor=2,
            downsample_factors=[(2, 2, 2), (2, 2, 2), (2, 2, 2)],
        )
        assert unet.ndims == 3
        assert unet.num_levels == 4

    def test_forward_same_padding(self):
        # reference unet_test.py:184-196: 64^3 same-padded -> (1, ngf, 64^3)
        unet = UNet(
            input_nc=3, ngf=4, fmap_inc_factor=2,
            downsample_factors=[(2, 2, 2), (2, 2, 2)], padding_type="same",
        )
        x = jnp.zeros((1, 32, 32, 32, 3))
        _, y = init_and_apply(unet, x)
        assert y.shape == (1, 32, 32, 32, 4)

    def test_valid_mtlsd_shape(self):
        # The MTLSD config contract: 196^3 in -> 104^3 out with ngf=12,
        # fmap_inc 6, three (2,2,2) downsamples, constant upsample
        # (reference default_MTLSD_conf.json:132-141).
        unet = UNet(
            input_nc=1, ngf=4, fmap_inc_factor=2,
            downsample_factors=[(2, 2, 2), (2, 2, 2), (2, 2, 2)],
            constant_upsample=True, padding_type="valid",
        )
        x = jnp.zeros((1, 196, 196, 196, 1))
        shapes = jax.eval_shape(
            lambda: unet.init_with_output(jax.random.PRNGKey(0), x, train=False)
        )
        assert shapes[0].shape == (1, 104, 104, 104, 4)

    def test_multi_head(self):
        unet = UNet(
            input_nc=1, ngf=4, fmap_inc_factor=2,
            downsample_factors=[(2, 2)], padding_type="same", num_heads=2,
        )
        x = jnp.zeros((1, 16, 16, 1))
        variables = unet.init(jax.random.PRNGKey(0), x, train=False)
        ys = unet.apply(variables, x, train=False)
        assert len(ys) == 2
        assert ys[0].shape == (1, 16, 16, 4)
        # heads have distinct decoder params
        assert "r_conv_0_0" in variables["params"] and "r_conv_1_0" in variables["params"]

    def test_residual_unet_same(self):
        unet = ResidualUNet(
            input_nc=1, ngf=4, fmap_inc_factor=2,
            downsample_factors=[(2, 2)], padding_type="same", output_nc=1,
        )
        x = jnp.zeros((1, 16, 16, 1))
        _, y = init_and_apply(unet, x)
        assert y.shape == (1, 16, 16, 1)


class TestResNet:
    def test_2d_forward_shape(self):
        # reference resnet_test.py:6-16: 256^2 -> (1, 64, 256, 256)
        gen = ResNet(ndims=2, ngf=8)
        x = jnp.zeros((1, 32, 32, 1))  # smaller for CPU speed; same padding preserved
        _, y = init_and_apply(gen, x)
        assert y.shape == (1, 32, 32, 8)
        # default output channels == ngf (reference resnet_test.py:6-16)
        gen_default = ResNet(ndims=2)
        shapes = jax.eval_shape(
            lambda: gen_default.init_with_output(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)), train=False)
        )
        assert shapes[0].shape == (1, 64, 64, 64)

    def test_3d_valid_fov(self):
        # reference resnet_test.py:80-96: 128^3 valid -> 17^3
        assert resnet_valid_output_shape((128, 128, 128)) == (17, 17, 17)
        gen = ResNet(ndims=3, ngf=2, padding_type="valid")
        x = jnp.zeros((1, 128, 128, 128, 1))
        shapes = jax.eval_shape(
            lambda: gen.init_with_output(jax.random.PRNGKey(0), x, train=False)
        )
        assert shapes[0].shape == (1, 17, 17, 17, 2)

    def test_add_noise_changes_output(self):
        gen = ResNet(ndims=2, ngf=4, n_blocks=1, n_downsampling=1, add_noise=True)
        x = jnp.ones((1, 16, 16, 1))
        variables = gen.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x
        )
        y1 = gen.apply(variables, x, rngs={"noise": jax.random.PRNGKey(2)})
        y2 = gen.apply(variables, x, rngs={"noise": jax.random.PRNGKey(3)})
        assert not np.allclose(np.asarray(y1), np.asarray(y2), rtol=1e-3, atol=1e-3)

    def test_invalid_ndims(self):
        with pytest.raises(ValueError):
            ResNet(ndims=4, input_nc=3, output_nc=1, ngf=64)


class TestNLayerDiscriminator:
    def test_2d_output_shape(self):
        # reference nlayerdiscriminator_test.py:7-22: 256^2 -> 30^2 patch map
        netD = NLayerDiscriminator(ndims=2, input_nc=3, ngf=8, n_layers=3)
        x = jnp.zeros((1, 256, 256, 3))
        shapes = jax.eval_shape(
            lambda: netD.init_with_output(jax.random.PRNGKey(0), x, train=True)
        )
        assert shapes[0].shape == (1, 30, 30, 1)

    def test_fov(self):
        netD = NLayerDiscriminator(ndims=2, input_nc=3, ngf=8, n_layers=3)
        assert 30 <= netD.fov <= 110  # reference expects ~70

    def test_3d_output_shape(self):
        netD = NLayerDiscriminator(ndims=3, input_nc=1, ngf=4)
        x = jnp.zeros((2, 32, 32, 32, 1))
        variables = netD.init(jax.random.PRNGKey(0), x, train=True)
        y = netD.apply(variables, x, train=True, mutable=["batch_stats"])[0]
        assert y.shape == (2, 2, 2, 2, 1)

    def test_3d_param_count_parity(self):
        # reference nlayerdiscriminator_test.py:62-66: exactly 11,048,769
        netD = NLayerDiscriminator(ndims=3)
        x = jnp.zeros((1, 16, 16, 16, 1))
        variables = jax.eval_shape(
            lambda: netD.init(jax.random.PRNGKey(0), x, train=True)
        )
        assert param_count(variables["params"]) == 11048769

    def test_invalid_ndims(self):
        with pytest.raises(ValueError):
            NLayerDiscriminator(ndims=4, input_nc=1, ngf=32, n_layers=5)


class Test4D:
    def test_convpass_4d(self):
        """4D convolution capability (reference UNet.py:58 funlib Conv4d;
        lax.conv_general_dilated is natively N-D here)."""
        model = ConvPass(output_nc=2, kernel_sizes=[(3, 3, 3, 3)], padding="valid")
        x = jnp.zeros((1, 6, 6, 6, 6, 1))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        y = model.apply(variables, x, train=False)
        assert y.shape == (1, 4, 4, 4, 4, 2)
