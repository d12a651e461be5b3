"""Fused Pallas resblock == unfused math, values AND gradients.

The kernels run in interpret mode on CPU (production routing selects them
only on TPU — nn/pallas/resblock.resblock_fused_ok). The reference below
mirrors ResnetBlock's reflect/'same' route exactly: conv3x3(reflect pad)
+ bias → instance norm (fp32 stats of the rounded conv output) → relu →
conv3x3 → instance norm → +skip (reference ``ResNet.py:127-223``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu


def _ref_block(x, w1, b1, w2, b2, eps=1e-5):
    def conv(h, w, b):
        hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        y = jax.lax.conv_general_dilated(
            hp.astype(jnp.float32), w.astype(jnp.float32), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return (y + b.astype(jnp.float32)).astype(h.dtype)

    def inorm(h):
        hf = h.astype(jnp.float32)
        m = hf.mean(axis=(1, 2), keepdims=True)
        v = hf.var(axis=(1, 2), keepdims=True)
        return (hf - m) * jax.lax.rsqrt(v + eps)

    y1 = conv(x, w1, b1)
    h1 = jnp.maximum(inorm(y1), 0.0).astype(x.dtype)
    y2 = conv(h1, w2, b2)
    return (x.astype(jnp.float32) + inorm(y2)).astype(x.dtype)


def _mk(shape, C, dtype, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = (jax.random.normal(ks[0], shape, jnp.float32) * 1.5).astype(dtype)
    w1 = (jax.random.normal(ks[1], (3, 3, C, C), jnp.float32) * 0.05
          ).astype(dtype)
    b1 = (jax.random.normal(ks[2], (C,), jnp.float32) * 0.1).astype(dtype)
    w2 = (jax.random.normal(ks[3], (3, 3, C, C), jnp.float32) * 0.05
          ).astype(dtype)
    b2 = (jax.random.normal(ks[4], (C,), jnp.float32) * 0.1).astype(dtype)
    return x, w1, b1, w2, b2


@pytest.mark.parametrize("H,W", [(8, 8), (48, 8)])  # 1 slab and 3 slabs
def test_forward_parity_fp32(H, W):
    from raygun_tpu.nn.pallas.resblock import resblock_fused

    C = 128
    x, w1, b1, w2, b2 = _mk((2, H, W, C), C, jnp.float32)
    ref = _ref_block(x, w1, b1, w2, b2)
    with pltpu.force_tpu_interpret_mode():
        got = resblock_fused(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_forward_parity_bf16():
    from raygun_tpu.nn.pallas.resblock import resblock_fused

    C = 128
    x, w1, b1, w2, b2 = _mk((1, 16, 8, C), C, jnp.bfloat16, seed=3)
    ref = _ref_block(x, w1, b1, w2, b2).astype(jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = resblock_fused(x, w1, b1, w2, b2).astype(jnp.float32)
    # bf16 rounding points differ only in summation order
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_gradient_parity_fp32():
    from raygun_tpu.nn.pallas.resblock import resblock_fused

    C = 128
    x, w1, b1, w2, b2 = _mk((1, 16, 8, C), C, jnp.float32, seed=7)
    t = jax.random.normal(jax.random.PRNGKey(9), x.shape, jnp.float32)

    def loss(fn):
        return lambda *a: jnp.sum((fn(*a).astype(jnp.float32) - t) ** 2)

    g_ref = jax.grad(loss(_ref_block), argnums=(0, 1, 2, 3, 4))(
        x, w1, b1, w2, b2)
    with pltpu.force_tpu_interpret_mode():
        g_got = jax.grad(loss(resblock_fused), argnums=(0, 1, 2, 3, 4))(
            x, w1, b1, w2, b2)
    names = ["dx", "dw1", "db1", "dw2", "db2"]
    for n, a, b in zip(names, g_got, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=n)


def test_route_gate():
    from raygun_tpu.nn.pallas.resblock import resblock_fused_ok

    # CPU test runs must never take the pallas route
    x = jnp.zeros((3, 128, 128, 256), jnp.bfloat16)
    assert resblock_fused_ok(x) in (False,)  # platform-gated
