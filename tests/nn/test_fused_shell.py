"""Fused prologue-IN/relu + pad + 2x2-tap conv == unfused math, values AND
gradients — the packed-shell stage kernels (nn/pallas/fconv.py).

Kernels run in interpret mode on CPU (production routing selects them only
on TPU — fconv2_ok). The reference mirrors the unfused packed-shell
composition exactly: instance norm with phase-group stat folding -> relu ->
1-px zero pad ('lo' = down_0's pad at -1, 'hi' = up_1's subpixel pad) ->
2x2-tap valid conv + bias (reference ``ResNet.py:70-79`` / ``:105-114``
via the packed re-expression, nn/packed_shell.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu


def _ref_stage(y_prev, w22, b2, group, pad, eps=1e-5, slope=0.0):
    B, H, W, C = y_prev.shape
    f = group
    v = y_prev.astype(jnp.float32).reshape(B, H, W, f, C // f)
    m = v.mean(axis=(1, 2, 3), keepdims=True)
    var = v.var(axis=(1, 2, 3), keepdims=True)
    hhat = (v - m) * jax.lax.rsqrt(var + eps)
    h = jnp.where(hhat > 0, hhat, slope * hhat).reshape(B, H, W, C)
    p = (1, 0) if pad == "lo" else (0, 1)
    hp = jnp.pad(h, [(0, 0), p, p, (0, 0)])
    y = jax.lax.conv_general_dilated(
        hp, w22.astype(jnp.float32), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b2.astype(jnp.float32)


def _mk(B, H, W, Cin, Cout, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(ks[0], (B, H, W, Cin), jnp.float32) * 1.5
    w = jax.random.normal(ks[1], (2, 2, Cin, Cout), jnp.float32) * 0.05
    b = jax.random.normal(ks[2], (Cout,), jnp.float32) * 0.1
    return x, w, b


@pytest.mark.parametrize("pad,group", [("lo", 4), ("hi", 1), ("lo", 1),
                                       ("hi", 4)])
def test_forward_parity(pad, group):
    from raygun_tpu.nn.pallas.fconv import fused_pro_conv2

    Cin, Cout = 128, 64
    x, w, b = _mk(2, 16, 12, Cin, Cout)
    ref = _ref_stage(x, w, b, group, pad)
    with pltpu.force_tpu_interpret_mode():
        got = fused_pro_conv2(x, w.reshape(2, 2 * Cin, Cout), b, group, pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("pad,group", [("lo", 4), ("hi", 1)])
def test_gradient_parity(pad, group):
    from raygun_tpu.nn.pallas.fconv import fused_pro_conv2

    Cin, Cout = 128, 128
    x, w, b = _mk(1, 16, 8, Cin, Cout, seed=3)

    def loss_ref(x, w, b):
        y = _ref_stage(x, w, b, group, pad)
        return jnp.sum(y * y)

    def loss_fused(x, w, b):
        y = fused_pro_conv2(x, w.reshape(2, 2 * Cin, Cout), b, group, pad)
        yf = y.astype(jnp.float32)
        return jnp.sum(yf * yf)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    for a, e, name in zip(gf, gr, ("dx", "dw", "db")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=5e-3, atol=5e-3,
            err_msg=name)


def test_model_route_parity(monkeypatch):
    """Full packed-shell generator: fused fconv stages vs the unfused
    packed route — identical values, gradients, and param trees."""
    from raygun_tpu.nn import ResNet

    monkeypatch.setenv("RAYGUN_FORCE_PACKED_SHELL", "1")
    gen = ResNet(ndims=2, input_nc=1, output_nc=1, ngf=64, n_blocks=1,
                 padding_type="same")
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 1),
                          jnp.float32)
    params = gen.init(jax.random.PRNGKey(1), x, train=False)["params"]

    def loss(p):
        y = gen.apply({"params": p}, x, train=True)
        return jnp.sum(y.astype(jnp.float32) ** 2), y

    monkeypatch.setenv("RAYGUN_FORCE_PALLAS_FCONV", "1")
    with pltpu.force_tpu_interpret_mode():
        (_, yf), gf = jax.value_and_grad(loss, has_aux=True)(params)

    monkeypatch.delenv("RAYGUN_FORCE_PALLAS_FCONV", raising=False)
    monkeypatch.setenv("RAYGUN_DISABLE_PALLAS_FCONV", "1")
    (_, yu), gu = jax.value_and_grad(loss, has_aux=True)(params)

    np.testing.assert_allclose(np.asarray(yf), np.asarray(yu),
                               rtol=2e-4, atol=2e-4)
    assert jax.tree.structure(gf) == jax.tree.structure(gu)
    for kf, (pth, a) in zip(jax.tree.leaves_with_path(gf),
                            jax.tree.leaves_with_path(gu)):
        np.testing.assert_allclose(
            np.asarray(kf[1]), np.asarray(a), rtol=5e-3, atol=5e-3,
            err_msg=str(pth))
    monkeypatch.delenv("RAYGUN_DISABLE_PALLAS_FCONV", raising=False)
