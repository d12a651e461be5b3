"""Streamed (z-slab tiled) U-Net inference == monolithic forward.

The streamed executor re-derives every slab window from valid-conv
translation equivariance; this test is the contract: identical outputs to
``MTLSDModel.apply`` for odd/even extents, multiple slab sizes, and a
production-shaped (deep) network.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raygun_tpu.nn.streamed import make_streamed_mtlsd_forward
from raygun_tpu.systems.mtlsd import MTLSDModel


def _make(unet_kwargs, num_affs=3, num_lsds=4):
    return MTLSDModel(unet_kwargs=unet_kwargs, num_affs=num_affs,
                      num_lsds=num_lsds)


@pytest.mark.parametrize("size,slab", [(48, 4), (50, 6), (54, 16)])
def test_streamed_matches_monolithic_2level(size, slab):
    m = _make(dict(input_nc=1, ngf=2, fmap_inc_factor=3,
                   downsample_factors=[(2, 2, 2), (2, 2, 2)],
                   constant_upsample=True))
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, size, size, size, 1))
        .astype(np.float32))
    params = jax.jit(
        lambda: m.init(jax.random.PRNGKey(0), x, train=False))()["params"]
    ref_a, ref_l = m.apply({"params": params}, x, train=False)
    fwd = make_streamed_mtlsd_forward(m, slab=slab)
    got_a, got_l = jax.jit(fwd)(params, x)
    assert got_a.shape == ref_a.shape and got_l.shape == ref_l.shape
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(ref_a),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(ref_l),
                               atol=1e-5, rtol=1e-5)


def test_streamed_matches_monolithic_3level_production_shape():
    """The MTLSD production architecture (ngf=12, inc=6, 3 levels) at a
    reduced block size; crop_to_factor at depth 0 is non-trivial here
    (crop factor (8,8,8)), exercising the d_lo window math."""
    m = _make(dict(input_nc=1, ngf=3, fmap_inc_factor=2,
                   downsample_factors=[(2, 2, 2), (2, 2, 2), (2, 2, 2)],
                   constant_upsample=True), num_affs=5, num_lsds=0)
    size = 100
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, size, size, size, 1))
        .astype(np.float32))
    params = jax.jit(
        lambda: m.init(jax.random.PRNGKey(0), x, train=False))()["params"]
    ref_a, _ = m.apply({"params": params}, x, train=False)
    fwd = make_streamed_mtlsd_forward(m, slab=2)
    got_a, got_l = jax.jit(fwd)(params, x)
    assert got_a.shape == ref_a.shape
    assert got_l.shape[-1] == 0
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(ref_a),
                               atol=1e-5, rtol=1e-5)


def test_streamed_anisotropic_rejected():
    m = _make(dict(input_nc=1, ngf=2, fmap_inc_factor=2,
                   downsample_factors=[(1, 2, 2)],
                   constant_upsample=True))
    with pytest.raises(AssertionError):
        make_streamed_mtlsd_forward(m)
