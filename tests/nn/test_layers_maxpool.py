"""max_pool_nd cell-max route (r5): exact vs the reduce_window lowering.

XLA lowers ``reduce_window``'s backward to ``select-and-scatter``,
measured at 11 ms/step of the 260^3 MTLSD train step (r5 device trace);
the cell-max custom VJP scatters the cotangent to the argmax cell with
the SAME pick-first row-major tie-breaking, so values and gradients are
bit-identical — asserted here on tie-heavy integer-valued data (the
post-relu zero-plateau case).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raygun_tpu.nn.layers import max_pool_nd


@pytest.mark.parametrize("shape,factor", [
    ((2, 8, 8, 3), (2, 2)),
    ((1, 9, 7, 2), (2, 2)),          # VALID floors the remainder
    ((1, 8, 8, 8, 4), (2, 2, 2)),    # the U-Net's 3D case
    ((1, 6, 6, 6, 1), (3, 3, 3)),
])
def test_cell_max_bit_exact_vs_select_and_scatter(shape, factor, monkeypatch):
    rng = np.random.default_rng(0)
    # quantized + clamped: many exact ties inside windows
    x = jnp.asarray(np.maximum(rng.integers(-2, 3, shape), 0)
                    .astype(np.float32))

    def loss(x):
        y = max_pool_nd(x, factor)
        w = jnp.arange(1, 1 + int(np.prod(y.shape))).reshape(y.shape)
        return jnp.sum(jnp.sin(y) * w)

    y_ref = max_pool_nd(x, factor)
    g_ref = jax.grad(loss)(x)
    monkeypatch.setenv("RAYGUN_CELL_MAXPOOL", "1")
    y = max_pool_nd(x, factor)
    g = jax.grad(loss)(x)
    assert jnp.array_equal(y, y_ref)
    assert jnp.array_equal(g, g_ref), float(jnp.max(jnp.abs(g - g_ref)))


def test_cell_max_bf16_and_jit(monkeypatch):
    monkeypatch.setenv("RAYGUN_CELL_MAXPOOL", "1")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 16, 12),
                          jnp.bfloat16)
    y = jax.jit(lambda x: max_pool_nd(x, (2, 2, 2)))(x)
    assert y.shape == (2, 8, 8, 8, 12) and y.dtype == jnp.bfloat16
    ref = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), "VALID")
    assert jnp.array_equal(y, ref)
