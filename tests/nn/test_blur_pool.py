"""Anti-aliased blur-pool: Pallas kernel vs XLA separable conv parity
(reference antialias.py capability)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raygun_tpu.nn.pallas import binomial_kernel, blur_pool_2d_pallas, blur_pool_xla


def test_binomial_kernel():
    assert np.allclose(binomial_kernel(3), [0.25, 0.5, 0.25])
    assert np.allclose(binomial_kernel(2), [0.5, 0.5])


def test_xla_blur_pool_shapes_and_smoothing():
    x = jnp.asarray(np.random.default_rng(0).random((16, 16, 3)).astype(np.float32))
    y = blur_pool_xla(x, stride=2, filt_size=3)
    assert y.shape == (8, 8, 3)
    # blur reduces high-frequency energy vs naive striding
    naive = x[::2, ::2]
    assert float(jnp.var(jnp.diff(y, axis=0))) < float(jnp.var(jnp.diff(naive, axis=0)))


def test_xla_blur_pool_3d():
    x = jnp.asarray(np.random.default_rng(1).random((8, 8, 8, 2)).astype(np.float32))
    y = blur_pool_xla(x, stride=2, filt_size=3)
    assert y.shape == (4, 4, 4, 2)


@pytest.mark.parametrize("H,W", [(16, 16), (18, 20), (13, 16)])
def test_pallas_matches_xla(H, W):
    """Pallas kernel (interpret mode on CPU) == XLA path exactly."""
    from functools import partial

    from jax.experimental import pallas as pl

    import raygun_tpu.nn.pallas.blur_pool as bp

    x = jnp.asarray(np.random.default_rng(2).random((H, W, 4)).astype(np.float32))
    ref = blur_pool_xla(x, stride=2, filt_size=3)

    # run the pallas kernel in interpreter mode (no TPU in tests)
    orig_call = pl.pallas_call
    try:
        pl.pallas_call = partial(orig_call, interpret=True)
        got = bp.blur_pool_2d_pallas(x, stride=2, filt_size=3, tile_rows=4)
    finally:
        pl.pallas_call = orig_call
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
