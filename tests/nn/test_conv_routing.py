"""TPU conv-routing numerics: zdecomp / fused upsample+concat+conv paths
compute exactly what the native path computes.

These fast paths exist because XLA:TPU lowers small-channel 3D convs poorly
(perf notes in raygun_tpu/nn/layers.py); correctness must be independent of
routing, so each route is checked against the native lax.conv result in
fp32-highest precision.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raygun_tpu.nn.layers import (
    conv3d_zdecomp,
    conv_nd,
    depth_to_space,
    fold_upsample_kernel,
    nearest_upsample,
    space_to_depth,
)
from raygun_tpu.nn.unet import FusedUpConvPass, ConvPass, Upsample, UNet


def test_zdecomp_matches_native():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 7, 8, 9, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 5)).astype(np.float32))
    ref = conv_nd(x, w, precision="highest")
    got = conv3d_zdecomp(x, w, precision="highest")
    assert got.shape == ref.shape == (2, 5, 6, 7, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_space_depth_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 6, 4, 8, 3)).astype(np.float32))
    y = space_to_depth(x, (2, 2, 2))
    assert y.shape == (1, 3, 2, 4, 24)
    back = depth_to_space(y, (2, 2, 2))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


@pytest.mark.parametrize("factors", [(2, 2, 2), (1, 2, 2), (3, 3, 3)])
def test_fold_upsample_kernel_matches_conv_over_upsampled(factors):
    rng = np.random.default_rng(2)
    g = jnp.asarray(rng.normal(size=(1, 7, 6, 5, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 4, 2)).astype(np.float32))
    gu = nearest_upsample(g, factors)
    ref = conv_nd(gu, w, precision="highest")
    w2 = fold_upsample_kernel(w, factors)
    ntaps = w2.shape[:3]
    g_pad = jnp.pad(g, [(0, 0)] + [(0, n - 1) for n in ntaps] + [(0, 0)])
    got = depth_to_space(conv_nd(g_pad, w2, precision="highest"), factors)
    got = got[:, : ref.shape[1], : ref.shape[2], : ref.shape[3], :]
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def _unfused_decoder_step(f_left, g, params, out_nc, factors, crop_factor):
    """Upsample + ConvPass with the same params as FusedUpConvPass."""
    ks = [(3, 3, 3), (3, 3, 3)]
    up = Upsample(
        scale_factor=factors, mode="nearest", output_nc=None,
        crop_factor=crop_factor, next_conv_kernel_sizes=ks,
    )
    cat = up.apply({"params": {}}, f_left, g)
    cp = ConvPass(output_nc=out_nc, kernel_sizes=ks)
    return cp.apply({"params": params}, cat)


def test_fused_upconvpass_matches_unfused():
    rng = np.random.default_rng(3)
    cf, cg, co = 4, 8, 4
    f_left = jnp.asarray(rng.normal(size=(1, 22, 22, 22, cf)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(1, 8, 8, 8, cg)).astype(np.float32))
    factors, crop_factor = (2, 2, 2), (2, 2, 2)

    fused = FusedUpConvPass(
        output_nc=co, kernel_sizes=[(3, 3, 3), (3, 3, 3)],
        scale_factor=factors, crop_factor=crop_factor,
    )
    params = fused.init(jax.random.PRNGKey(0), f_left, g)["params"]
    y_fused = fused.apply({"params": params}, f_left, g)
    y_ref = _unfused_decoder_step(f_left, g, params, co, factors, crop_factor)
    assert y_fused.shape == y_ref.shape
    np.testing.assert_allclose(
        np.asarray(y_fused), np.asarray(y_ref), atol=2e-4
    )


def test_unet_fused_decoder_matches_unfused():
    """Whole-net check: same params, fused vs unfused decoders agree."""
    kwargs = dict(
        input_nc=1, ngf=3, fmap_inc_factor=2,
        downsample_factors=[(2, 2, 2), (2, 2, 2)],
        constant_upsample=True, padding_type="valid",
    )
    x = jnp.asarray(
        np.random.default_rng(4).normal(size=(1, 52, 52, 52, 1)).astype(np.float32)
    )
    fused_net = UNet(**kwargs, fuse_upsample=True)
    plain_net = UNet(**kwargs, fuse_upsample=False)
    params = fused_net.init(jax.random.PRNGKey(0), x)["params"]
    y_fused = fused_net.apply({"params": params}, x)
    y_plain = plain_net.apply({"params": params}, x)
    assert y_fused.shape == y_plain.shape
    np.testing.assert_allclose(
        np.asarray(y_fused), np.asarray(y_plain), atol=2e-4, rtol=1e-3
    )


def test_unet_fused_gradients_flow():
    kwargs = dict(
        input_nc=1, ngf=2, fmap_inc_factor=2,
        downsample_factors=[(2, 2, 2)], constant_upsample=True,
    )
    net = UNet(**kwargs)
    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(1, 20, 20, 20, 1)).astype(np.float32)
    )
    params = net.init(jax.random.PRNGKey(0), x)["params"]

    def loss(p):
        return jnp.sum(net.apply({"params": p}, x) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert sum(float(jnp.abs(l).sum()) for l in leaves) > 0


def test_packed_level0_matches_unpacked_unet():
    """s2d-packed level-0 execution == unpacked, same params."""
    kwargs = dict(
        input_nc=1, ngf=3, fmap_inc_factor=2,
        downsample_factors=[(2, 2, 2), (2, 2, 2)],
        constant_upsample=True, padding_type="valid",
    )
    x = jnp.asarray(
        np.random.default_rng(7).normal(size=(1, 52, 52, 52, 1)).astype(np.float32)
    )
    packed = UNet(**kwargs, pack_level0=True)
    plain = UNet(**kwargs, pack_level0=False)
    params = packed.init(jax.random.PRNGKey(0), x)["params"]
    y_packed = packed.apply({"params": params}, x)
    y_plain = plain.apply({"params": params}, x)
    assert y_packed.shape == y_plain.shape
    np.testing.assert_allclose(
        np.asarray(y_packed), np.asarray(y_plain), atol=2e-4, rtol=1e-3
    )


def test_packed_level0_odd_extent_falls_back():
    from raygun_tpu.nn.unet import packed_level0_active

    kwargs = dict(
        downsample_factors=[(2, 2, 2)], constant_upsample=True,
    )
    assert packed_level0_active(kwargs, (52, 52, 52))
    assert not packed_level0_active(kwargs, (51, 52, 52))
    assert not packed_level0_active({**kwargs, "norm": "instance"}, (52,) * 3)
    assert not packed_level0_active(
        {**kwargs, "downsample_factors": [(1, 2, 2)]}, (52,) * 3)


def test_packed_mtlsd_heads_match_unpacked():
    from raygun_tpu.systems.mtlsd import MTLSDModel

    base = dict(input_nc=1, ngf=2, fmap_inc_factor=3,
                downsample_factors=[(2, 2, 2)], constant_upsample=True)
    m_packed = MTLSDModel(unet_kwargs=base, num_affs=4, num_lsds=3)
    m_plain = MTLSDModel(unet_kwargs={**base, "pack_level0": False},
                         num_affs=4, num_lsds=3)
    x = jnp.asarray(
        np.random.default_rng(8).normal(size=(1, 36, 36, 36, 1)).astype(np.float32)
    )
    params = m_packed.init(jax.random.PRNGKey(0), x, train=False)["params"]
    a_p, l_p = m_packed.apply({"params": params}, x, train=False)
    a_u, l_u = m_plain.apply({"params": params}, x, train=False)
    assert a_p.shape == a_u.shape and l_p.shape == l_u.shape
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_u), atol=2e-5)
    np.testing.assert_allclose(np.asarray(l_p), np.asarray(l_u), atol=2e-5)


def test_packed_level0_gradients_flow():
    kwargs = dict(
        input_nc=1, ngf=2, fmap_inc_factor=2,
        downsample_factors=[(2, 2, 2)], constant_upsample=True,
    )
    net = UNet(**kwargs)
    x = jnp.asarray(
        np.random.default_rng(9).normal(size=(1, 24, 24, 24, 1)).astype(np.float32)
    )
    params = net.init(jax.random.PRNGKey(0), x)["params"]

    def loss(p):
        return jnp.sum(net.apply({"params": p}, x) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert sum(float(jnp.abs(l).sum()) for l in leaves) > 0


def test_conv2d_s2d_matches_native():
    from raygun_tpu.nn.layers import conv2d_s2d

    rng = np.random.default_rng(10)
    for shape, ks in [((2, 13, 16, 3), (3, 3)), ((1, 20, 20, 1), (7, 7)),
                      ((1, 14, 15, 5), (5, 3))]:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        w = jnp.asarray(
            rng.normal(size=ks + (shape[-1], 4)).astype(np.float32))
        ref = conv_nd(x, w, precision="highest")
        got = conv2d_s2d(x, w, precision="highest")
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_packed_gradients_match_unpacked():
    """Gradients through the packed/fused routes equal the unpacked path
    (same params): forward parity is exact, so AD must agree too — this
    guards against any routing-specific backward regression."""
    from raygun_tpu.systems.mtlsd import MTLSDModel

    base = dict(input_nc=1, ngf=2, fmap_inc_factor=3,
                downsample_factors=[(2, 2, 2)], constant_upsample=True)
    m_packed = MTLSDModel(unet_kwargs=base, num_affs=4, num_lsds=3)
    m_plain = MTLSDModel(unet_kwargs={**base, "pack_level0": False,
                                      "fuse_upsample": False},
                         num_affs=4, num_lsds=3)
    x = jnp.asarray(
        np.random.default_rng(11).normal(size=(1, 36, 36, 36, 1)).astype(np.float32)
    )
    params = m_packed.init(jax.random.PRNGKey(0), x, train=False)["params"]

    def loss(model):
        def f(p):
            a, l = model.apply({"params": p}, x, train=True)
            return jnp.sum(a ** 2) + jnp.sum((l - 0.3) ** 2)
        return f

    g_packed = jax.grad(loss(m_packed))(params)
    g_plain = jax.grad(loss(m_plain))(params)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_packed)
    flat_u = dict(jax.tree_util.tree_flatten_with_path(g_plain)[0])
    assert len(flat_p) > 0
    for path, leaf in flat_p:
        ref = flat_u[path]
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(ref), atol=5e-4, rtol=1e-3,
            err_msg=str(path),
        )
