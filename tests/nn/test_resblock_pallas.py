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


def test_chain_parity_values_and_grads():
    """N-block chain megakernel == N sequential fused blocks, bit-level.

    The chain kernel reuses the per-block math in the same slab order, so
    values and ALL gradients match the sequential route exactly (fp32)."""
    from raygun_tpu.nn.pallas.resblock import resblock_fused
    from raygun_tpu.nn.pallas.resblock_chain import resblock_chain_fused

    N, B, H, W, C = 3, 2, 16, 8, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (B, H, W, C), jnp.float32) * 1.5
    w1s = jax.random.normal(ks[1], (N, 3, 3, C, C), jnp.float32) * 0.05
    b1s = jax.random.normal(ks[2], (N, C), jnp.float32) * 0.1
    w2s = jax.random.normal(ks[3], (N, 3, 3, C, C), jnp.float32) * 0.05
    b2s = jax.random.normal(ks[4], (N, C), jnp.float32) * 0.1

    def seq(x, w1s, b1s, w2s, b2s):
        h = x
        for i in range(N):
            h = resblock_fused(h, w1s[i], b1s[i], w2s[i], b2s[i])
        return h

    t = jax.random.normal(jax.random.PRNGKey(9), x.shape, jnp.float32)

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a) * t)

    args = (x, w1s, b1s, w2s, b2s)
    with pltpu.force_tpu_interpret_mode():
        ref = seq(*args)
        got = resblock_chain_fused(*args)
        gr = jax.grad(loss(seq), argnums=(0, 1, 2, 3, 4))(*args)
        gc = jax.grad(loss(resblock_chain_fused),
                      argnums=(0, 1, 2, 3, 4))(*args)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    for name, a, b in zip("dx dw1 db1 dw2 db2".split(), gc, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6, err_msg=name)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_bwd_parity(dtype):
    """Two-kernel resident backward == the split ~8-pass backward.

    Same formulas and bf16 rounding points; only fp32 summation order
    differs (row-slab association), so dx/dw match at fp32 noise and the
    analytically-zero bias grads at absolute fp32 noise."""
    from raygun_tpu.nn.pallas.instance_norm import _bwd_dx
    from raygun_tpu.nn.pallas.resblock import _conv_bwd, _rb_forward
    from raygun_tpu.nn.pallas.resblock_bwd import rb_bwd_fused

    B, H, W, C = 2, 32, 8, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = (jax.random.normal(ks[0], (B, H, W, C), jnp.float32) * 1.5
         ).astype(dtype)
    w1 = (jax.random.normal(ks[1], (3, 3, C, C), jnp.float32) * 0.05
          ).astype(dtype)
    b1 = (jax.random.normal(ks[2], (C,), jnp.float32) * 0.1).astype(dtype)
    w2 = (jax.random.normal(ks[3], (3, 3, C, C), jnp.float32) * 0.05
          ).astype(dtype)
    b2 = (jax.random.normal(ks[4], (C,), jnp.float32) * 0.1).astype(dtype)
    dout = jax.random.normal(ks[5], (B, H, W, C), jnp.float32).astype(dtype)
    n = H * W
    with pltpu.force_tpu_interpret_mode():
        _, (y1, y2, m1, r1, m2, r2) = _rb_forward(x, w1, b1, w2, b2, 1e-5)
        dy2 = _bwd_dx(1e-5, None, y2.reshape(B, n, C), m2, r2,
                      dout.reshape(B, n, C)).reshape(x.shape)
        dh1, dw2_s, db2_s = _conv_bwd(dy2, y1, w2, stats=(m1, r1))
        dy1 = _bwd_dx(1e-5, 0.0, y1.reshape(B, n, C), m1, r1,
                      dh1.reshape(B, n, C)).reshape(x.shape)
        dx_s, dw1_s, db1_s = _conv_bwd(dy1, x, w1, dout=dout)
        dx_f, dw1_f, db1_f, dw2_f, db2_f = rb_bwd_fused(
            x, w1, w2, y1, y2, m1, r1, m2, r2, dout)
    tol = 3e-5 if dtype == jnp.float32 else 0.02
    for name, a, b in [("dx", dx_s, dx_f), ("dw1", dw1_s, dw1_f),
                       ("dw2", dw2_s, dw2_f)]:
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        np.testing.assert_allclose(a, b, rtol=tol,
                                   atol=tol * max(1.0, np.abs(a).max()),
                                   err_msg=name)
    # bias grads of IN-backward outputs are analytically zero-sum: compare
    # at absolute fp32 summation noise relative to the summand magnitudes
    for name, a, b, g in [("db1", db1_s, db1_f, dy1),
                          ("db2", db2_s, db2_f, dy2)]:
        scale = float(jnp.abs(g).max()) * np.sqrt(B * n)
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=2e-6 * scale, rtol=0, err_msg=name)


def test_fused_bwd_gate():
    from raygun_tpu.nn.pallas.resblock_bwd import rb_bwd_fused_ok

    x = jnp.zeros((3, 128, 128, 256), jnp.bfloat16)
    assert rb_bwd_fused_ok(x) in (False,)  # platform-gated on CPU
