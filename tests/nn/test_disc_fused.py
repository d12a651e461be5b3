"""Parity tests for the fused (two-resident-Pallas-kernel) discriminator
route (nn/pallas/disc_fused.py + nn/discriminator.py routing).

Like the packed route, the fused route must be an EXACT re-expression of
the reference conv arithmetic (``NLayerDiscriminator.py:30-77``): value
parity AND gradient parity (params and input) against the generic path,
identical param tree, and the gate must stay off outside the production
architecture. Kernels run in interpret mode on CPU."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raygun_tpu.nn import NLayerDiscriminator


def _make(ngf=8):
    return NLayerDiscriminator(
        ndims=2, input_nc=1, ngf=ngf, n_layers=3, kw=3,
        downsampling_kw=2, norm="instance")


def _run(disc, x, key, env):
    os.environ.update(env)
    try:
        params = disc.init(key, x, train=False)["params"]

        def loss(p, xx):
            y = disc.apply({"params": p}, xx, train=True)
            return jnp.sum(y.astype(jnp.float32)
                           * jnp.sin(y.astype(jnp.float32))), y

        (lo, y), g = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(params, x)
    finally:
        for k in env:
            os.environ.pop(k, None)
    return params, y, g


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_disc_value_and_grad_parity(dtype):
    disc = _make()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 1),
                          jnp.float32).astype(dtype)
    key = jax.random.PRNGKey(1)
    pf, y_f, g_f = _run(disc, x, key, {"RAYGUN_FORCE_DISC_FUSED": "1"})
    pg, y_g, g_g = _run(disc, x, key, {"RAYGUN_DISABLE_DISC_FUSED": "1",
                                       "RAYGUN_DISABLE_PACKED_DISC": "1"})
    # identical param trees: same keys, same shapes
    assert jax.tree_util.tree_structure(pf) == \
        jax.tree_util.tree_structure(pg)
    for a, b in zip(jax.tree.leaves(pf), jax.tree.leaves(pg)):
        assert a.shape == b.shape

    tol = dict(rtol=2e-4, atol=2e-5) if dtype == jnp.float32 \
        else dict(rtol=0.05, atol=0.05)
    assert y_f.shape == y_g.shape
    np.testing.assert_allclose(np.asarray(y_f, np.float32),
                               np.asarray(y_g, np.float32), **tol)
    (gf_params, gf_x), (gg_params, gg_x) = g_f, g_g
    np.testing.assert_allclose(np.asarray(gf_x, np.float32),
                               np.asarray(gg_x, np.float32), **tol)
    for (kp, a), (kg, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(gf_params),
               key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(gg_params),
               key=lambda kv: str(kv[0])),
    ):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        # conv bias grads under non-affine IN are analytically ZERO: both
        # routes produce pure summation noise there (the generic route's
        # bf16-accumulated XLA sums are noisier than the kernels' fp32
        # accumulation), so assert both are small rather than close
        name = str(kp)
        if a.ndim == 1 and ("conv_1" in name or "conv_2" in name
                            or "conv_3" in name):
            bound = 1e-3 if dtype == jnp.float32 else 0.15
            assert np.abs(a).max() < bound, name
            assert np.abs(b).max() < bound, name
        else:
            # bf16: the two routes round dy at different points, so the
            # cancellation-heavy wgrad sums carry noise proportional to
            # the ARRAY scale — compare at atol scaled to max|b| (the
            # convention of tests/nn/test_resblock_pallas.py)
            atol = tol["atol"] if dtype == jnp.float32 \
                else tol["atol"] * max(1.0, float(np.abs(b).max()))
            np.testing.assert_allclose(a, b, rtol=tol["rtol"], atol=atol,
                                       err_msg=name)


def test_fused_disc_gate():
    disc = _make()
    # CPU without the force env: gate must stay off
    x = jnp.zeros((2, 32, 32, 1), jnp.bfloat16)
    assert disc.uses_fused(x) in (False,)
    # wrong architecture: gate must stay off even when forced
    os.environ["RAYGUN_FORCE_DISC_FUSED"] = "1"
    try:
        d2 = NLayerDiscriminator(ndims=2, input_nc=1, ngf=8, n_layers=2,
                                 kw=3, downsampling_kw=2, norm="instance")
        assert d2.uses_fused(x) in (False,)
        d3 = NLayerDiscriminator(ndims=2, input_nc=1, ngf=8, n_layers=3,
                                 kw=4, downsampling_kw=2, norm="instance")
        assert d3.uses_fused(x) in (False,)
        d4 = _make()
        assert d4.uses_fused(jnp.zeros((2, 30, 32, 1), jnp.bfloat16)) \
            in (False,)  # H % 8 != 0
        assert d4.uses_fused(x) in (True,)
    finally:
        os.environ.pop("RAYGUN_FORCE_DISC_FUSED", None)


def test_fused_disc_batch_and_channels():
    """Fused == generic at batch 3 and input_nc=2 (fp32, forced)."""
    disc = NLayerDiscriminator(ndims=2, input_nc=2, ngf=8, n_layers=3,
                               kw=3, downsampling_kw=2, norm="instance")
    x = jax.random.normal(jax.random.PRNGKey(3), (3, 24, 40, 2),
                          jnp.float32)
    key = jax.random.PRNGKey(4)
    _, y_f, _ = _run(disc, x, key, {"RAYGUN_FORCE_DISC_FUSED": "1"})
    _, y_g, _ = _run(disc, x, key, {"RAYGUN_DISABLE_DISC_FUSED": "1",
                                    "RAYGUN_DISABLE_PACKED_DISC": "1"})
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_g),
                               rtol=2e-4, atol=2e-5)
