"""Fused Pallas instance norm == XLA reference, values AND gradients.

The Pallas kernels run in interpret mode on CPU so parity is testable
without a TPU (the TPU route is selected automatically in production —
nn/layers.instance_norm impl='auto')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from raygun_tpu.nn.layers import instance_norm


def _xla_in(x, eps=1e-5):
    return instance_norm(x, eps, impl="xla")


def _pallas_in(x, eps=1e-5):
    from raygun_tpu.nn.pallas.instance_norm import instance_norm_fused

    with pltpu.force_tpu_interpret_mode():
        return instance_norm_fused(x, eps)


@pytest.mark.parametrize("shape", [
    (2, 8, 8, 16),        # 2D, small
    (1, 40, 24, 3),       # 2D, tail tile exercised when S > tile
    (2, 4, 6, 5, 8),      # 3D
])
def test_forward_parity(shape):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32) * 3 + 1
    ref = _xla_in(x)
    got = _pallas_in(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_parity_partial_tile(monkeypatch):
    """S not a multiple of the row tile: tail masking must be exact."""
    import raygun_tpu.nn.pallas.instance_norm as m

    monkeypatch.setattr(m, "_TILE_S", 16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 5, 4), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(_pallas_in(x)), np.asarray(_xla_in(x)), rtol=1e-5, atol=1e-5)


def test_gradient_parity():
    from raygun_tpu.nn.pallas.instance_norm import instance_norm_fused

    x = jax.random.normal(jax.random.PRNGKey(2), (2, 12, 12, 8), jnp.float32)
    t = jax.random.normal(jax.random.PRNGKey(3), (2, 12, 12, 8), jnp.float32)

    def loss(fn):
        return lambda v: jnp.sum((fn(v) - t) ** 2)

    g_ref = jax.grad(loss(_xla_in))(x)
    # the context must span the WHOLE grad call: the custom-VJP backward
    # kernels trace during the backward pass, not inside fn(v)
    with pltpu.force_tpu_interpret_mode():
        g_got = jax.grad(loss(instance_norm_fused))(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_gradient_parity_partial_tile(monkeypatch):
    import raygun_tpu.nn.pallas.instance_norm as m

    monkeypatch.setattr(m, "_TILE_S", 8)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 5, 7, 4), jnp.float32)

    def loss_fn(fn):
        return lambda v: jnp.sum(fn(v) ** 3)

    g_ref = jax.grad(loss_fn(_xla_in))(x)
    with pltpu.force_tpu_interpret_mode():
        g_got = jax.grad(loss_fn(m.instance_norm_fused))(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_wide_channel_scaled_tiles():
    """C > 256 scales the row tile down (_tile_rows; fixed 2048-row tiles
    compile-OOM'd the 16 MB scoped VMEM at C=512 on hardware) — values
    AND gradients must stay exact across the scaled multi-tile + partial
    tail path."""
    import raygun_tpu.nn.pallas.instance_norm as m

    assert m._tile_rows(512) == 1024 and m._tile_rows(256) == m._TILE_S
    from raygun_tpu.nn.pallas.instance_norm import instance_norm_act_fused

    # S = 4900 -> 5 tiles of 1024 incl. a partial tail at C=512
    x = jax.random.normal(jax.random.PRNGKey(11), (1, 70, 70, 512),
                          jnp.float32)

    def ref_loss(v):
        y = _xla_in(v)
        return jnp.sum(jnp.where(y > 0, y, 0.0) ** 2)

    def got_loss(v):
        return jnp.sum(instance_norm_act_fused(v, 1e-5, 0.0) ** 2)

    with pltpu.force_tpu_interpret_mode():
        v_got, g_got = jax.value_and_grad(got_loss)(x)
    v_ref, g_ref = jax.value_and_grad(ref_loss)(x)
    np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_bf16_forward_close():
    """bf16 inputs: fp32-accumulated Pallas stats vs fp32 reference."""
    x32 = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 16, 8), jnp.float32)
    ref = _xla_in(x32)
    got = _pallas_in(x32.astype(jnp.bfloat16))
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               rtol=0.05, atol=0.05)


@pytest.mark.parametrize("slope", [0.0, 0.2])
def test_act_variant_parity(slope):
    """Fused IN+(leaky)relu == XLA reference, values and gradients."""
    from raygun_tpu.nn.pallas.instance_norm import instance_norm_act_fused

    x = jax.random.normal(jax.random.PRNGKey(7), (2, 10, 14, 8), jnp.float32)

    def ref_loss(v):
        y = _xla_in(v)
        y = jnp.where(y > 0, y, slope * y)
        return jnp.sum(y ** 2)

    def got_loss(v):
        return jnp.sum(instance_norm_act_fused(v, 1e-5, slope) ** 2)

    with pltpu.force_tpu_interpret_mode():
        v_got, g_got = jax.value_and_grad(got_loss)(x)
    v_ref, g_ref = jax.value_and_grad(ref_loss)(x)
    np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_add_variant_parity():
    """Fused residual + IN(x) == XLA reference, values and both gradients."""
    from raygun_tpu.nn.pallas.instance_norm import instance_norm_add_fused

    x = jax.random.normal(jax.random.PRNGKey(8), (2, 9, 11, 8), jnp.float32)
    r = jax.random.normal(jax.random.PRNGKey(9), (2, 9, 11, 8), jnp.float32)

    def ref_loss(v, w):
        return jnp.sum((w + _xla_in(v)) ** 3)

    def got_loss(v, w):
        return jnp.sum(instance_norm_add_fused(v, w) ** 3)

    with pltpu.force_tpu_interpret_mode():
        v_got, g_got = jax.value_and_grad(got_loss, argnums=(0, 1))(x, r)
    v_ref, g_ref = jax.value_and_grad(ref_loss, argnums=(0, 1))(x, r)
    np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-4)
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_resnet_cpu_unaffected():
    """The fused wiring must leave CPU ResNet outputs identical (fallback
    path) and the param tree unchanged."""
    from raygun_tpu.nn import ResNet

    gen = ResNet(ndims=2, input_nc=1, output_nc=1, ngf=4, n_blocks=1,
                 padding_type="same", norm="instance")
    x = jax.random.normal(jax.random.PRNGKey(10), (1, 16, 16, 1), jnp.float32)
    p = gen.init(jax.random.PRNGKey(0), x, train=False)["params"]
    y = gen.apply({"params": p}, x, train=True)
    assert np.isfinite(np.asarray(y)).all()
    assert "stem" in p and "block_0" in p


def test_cpu_auto_routes_to_xla():
    """impl='auto' on CPU must use the XLA path (no interpret overhead)."""
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 8, 8, 4), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(instance_norm(x)), np.asarray(_xla_in(x)), rtol=1e-6)
