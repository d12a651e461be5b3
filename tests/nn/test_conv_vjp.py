"""Custom-VJP conv routes (stride-2 down / subpixel transposed up):
values AND gradients must equal the native XLA lowering exactly —
the routes are algebraic re-expressions, not approximations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raygun_tpu.nn.layers import conv_s2_p1_k3, conv_t_s2_subpixel_vjp


def _native_s2(x, w):
    return jax.lax.conv_general_dilated(
        jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))), w, (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _native_t(x, w):
    y = jax.lax.conv_transpose(
        x, w, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y[:, 1:-0 if False else None, :, :][:, : 2 * x.shape[1], :, :][
        :, :, : 2 * x.shape[2], :] if False else y


@pytest.mark.parametrize("hw", [(16, 16), (15, 17), (12, 20)])
def test_down_conv_value_and_grads(hw):
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2,) + hw + (6,), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(k, 1), (3, 3, 6, 8),
                          jnp.float32) * 0.1

    y_got = conv_s2_p1_k3(x, w)
    y_ref = _native_s2(x, w)
    np.testing.assert_allclose(np.asarray(y_got), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)

    def loss(fn):
        return lambda x, w: jnp.sum(fn(x, w) ** 2)

    gx_got, gw_got = jax.grad(loss(conv_s2_p1_k3), argnums=(0, 1))(x, w)
    gx_ref, gw_ref = jax.grad(loss(_native_s2), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_got), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_got), np.asarray(gw_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("hw", [(8, 8), (7, 9)])
def test_up_conv_value_and_grads(hw):
    """Subpixel transposed conv custom VJP vs autodiff of the plain
    subpixel formulation (itself parity-tested against nn.ConvTranspose
    in test_conv_routing)."""
    from raygun_tpu.nn.layers import conv_transpose_s2_subpixel

    k = jax.random.PRNGKey(2)
    x = jax.random.normal(k, (2,) + hw + (6,), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(k, 3), (3, 3, 6, 4),
                          jnp.float32) * 0.1

    y_got = conv_t_s2_subpixel_vjp(x, w)
    y_ref = conv_transpose_s2_subpixel(x, w)
    np.testing.assert_allclose(np.asarray(y_got), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)

    def loss(fn):
        return lambda x, w: jnp.sum(fn(x, w) ** 3)

    gx_got, gw_got = jax.grad(loss(conv_t_s2_subpixel_vjp), argnums=(0, 1))(x, w)
    gx_ref, gw_ref = jax.grad(loss(conv_transpose_s2_subpixel), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_got), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_got), np.asarray(gw_ref),
                               rtol=1e-4, atol=1e-4)


def test_convnd_module_routes_use_custom_vjp_gradients():
    """End-to-end through the flax modules: gradients of ConvNd(s2) and
    ConvTransposeNd(subpixel) match a native reference implementation."""
    import flax.linen as _nn  # noqa
    from raygun_tpu.nn.layers import ConvNd, ConvTransposeNd

    k = jax.random.PRNGKey(5)
    x = jax.random.normal(k, (1, 12, 12, 4), jnp.float32)

    mod = ConvNd(8, (3, 3), strides=2, padding=1)
    p = mod.init(jax.random.PRNGKey(0), x)["params"]

    def loss(p, x):
        return jnp.sum(mod.apply({"params": p}, x) ** 2)

    def ref_loss(p, x):
        y = _native_s2(x, p["kernel"]) + p["bias"]
        return jnp.sum(y ** 2)

    g1 = jax.grad(loss)(p, x)
    g2 = jax.grad(ref_loss)(p, x)
    np.testing.assert_allclose(np.asarray(g1["kernel"]),
                               np.asarray(g2["kernel"]), rtol=1e-4, atol=1e-4)
