"""tap-sum GEMM conv == lax conv numerics."""

import jax
import jax.numpy as jnp
import numpy as np

from raygun_tpu.nn.layers import ConvNd, tap_sum_conv


def test_tap_sum_matches_lax_conv():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 9, 9, 9, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 16, 8)).astype(np.float32))
    got = tap_sum_conv(x, w)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NZYXC", "ZYXIO", "NZYXC"))
    ref = jax.lax.conv_general_dilated(x, w, (1, 1, 1), "VALID", dimension_numbers=dn)
    assert got.shape == ref.shape == (2, 7, 7, 7, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_tap_sum_gradients_flow():
    x = jnp.ones((1, 5, 5, 5, 4))
    w = jnp.ones((3, 3, 3, 4, 4)) * 0.1

    def loss(w):
        return jnp.sum(tap_sum_conv(x, w) ** 2)

    g = jax.grad(loss)(w)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_convnd_uniform_param_layout():
    """All ConvNd routes share one param layout (kernel/bias directly on the
    module) so checkpoints are route-independent."""
    big = ConvNd(features=256, kernel_size=(3, 3), padding="valid", use_tap_sum=True)
    x = jnp.zeros((1, 8, 8, 256))
    v = big.init(jax.random.PRNGKey(0), x)
    assert "kernel" in v["params"]
    small = ConvNd(features=8, kernel_size=(3, 3), padding="valid")
    v2 = small.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)))
    assert "kernel" in v2["params"]
    assert v2["params"]["kernel"].shape == (3, 3, 4, 8)
