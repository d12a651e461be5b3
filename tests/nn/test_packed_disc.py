"""Parity tests for the packed PatchGAN discriminator route
(nn/packed_shell.py packed-disc section + nn/discriminator.py routing).

The packed route must be an EXACT re-expression of the reference conv
arithmetic (``NLayerDiscriminator.py:30-77``): fp32 value parity AND
gradient parity (params and input) against the generic path, plus an
identical param tree (checkpoints swap freely between routes).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raygun_tpu.nn import NLayerDiscriminator


def _make(n_layers=3, kw=3, norm="instance", input_nc=1, ngf=8):
    return NLayerDiscriminator(
        ndims=2, input_nc=input_nc, ngf=ngf, n_layers=n_layers, kw=kw,
        downsampling_kw=2, norm=norm)


def _both_routes(disc, x, key):
    """(packed_out, generic_out, packed_grads, generic_grads)."""
    os.environ["RAYGUN_FORCE_PACKED_DISC"] = "1"
    os.environ.pop("RAYGUN_DISABLE_PACKED_DISC", None)
    try:
        assert disc.uses_packed(x)
        params = disc.init(key, x, train=False)["params"]

        def loss(p, xx):
            y = disc.apply({"params": p}, xx, train=True)
            return jnp.sum(y * jnp.sin(y)), y

        (lo_p, y_p), g_p = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(params, x)
    finally:
        os.environ.pop("RAYGUN_FORCE_PACKED_DISC", None)
    os.environ["RAYGUN_DISABLE_PACKED_DISC"] = "1"
    try:
        assert not disc.uses_packed(x)
        params_g = disc.init(key, x, train=False)["params"]
        # identical param trees: same keys, same shapes
        assert jax.tree_util.tree_structure(params) == \
            jax.tree_util.tree_structure(params_g)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params_g)):
            assert a.shape == b.shape
        (lo_g, y_g), g_g = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(params, x)
    finally:
        os.environ.pop("RAYGUN_DISABLE_PACKED_DISC", None)
    return y_p, y_g, g_p, g_g


@pytest.mark.parametrize(
    "n_layers,kw,norm,input_nc",
    [(3, 3, "instance", 1), (2, 4, "instance", 2), (1, 3, None, 1),
     (3, 4, None, 1)],
)
def test_packed_disc_value_and_grad_parity(n_layers, kw, norm, input_nc):
    disc = _make(n_layers=n_layers, kw=kw, norm=norm, input_nc=input_nc)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, input_nc),
                          jnp.float32)
    y_p, y_g, g_p, g_g = _both_routes(disc, x, jax.random.PRNGKey(1))
    assert y_p.shape == y_g.shape
    np.testing.assert_allclose(y_p, y_g, rtol=2e-4, atol=2e-5)
    (gp_params, gp_x), (gg_params, gg_x) = g_p, g_g
    np.testing.assert_allclose(gp_x, gg_x, rtol=2e-4, atol=2e-5)
    for (kp, a), (kg, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(gp_params),
               key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(gg_params),
               key=lambda kv: str(kv[0])),
    ):
        np.testing.assert_allclose(
            a, b, rtol=2e-4, atol=2e-5, err_msg=str(kp))


def test_packed_disc_gate_conditions():
    disc = _make()
    os.environ["RAYGUN_FORCE_PACKED_DISC"] = "1"
    try:
        ok = jnp.zeros((1, 32, 32, 1))
        assert disc.uses_packed(ok)
        # extent not divisible by 4
        assert not disc.uses_packed(jnp.zeros((1, 30, 30, 1)))
        # 3D input tensor shape
        assert not disc.uses_packed(jnp.zeros((1, 32, 32, 32, 1)))
        # ds_kw != 2 has no pair-window structure
        d4 = NLayerDiscriminator(ndims=2, input_nc=1, ngf=8, n_layers=3,
                                 kw=4, norm="instance")
        assert not d4.uses_packed(ok)
    finally:
        os.environ.pop("RAYGUN_FORCE_PACKED_DISC", None)


def test_packed_disc_fov_and_shapes_match_reference_arithmetic():
    """512^2 production shapes: output extent must match the generic conv
    arithmetic exactly (65^2 prediction map for n_layers=3, kw=3)."""
    disc = _make(n_layers=3, kw=3)
    x = jnp.zeros((1, 64, 64, 1))
    os.environ["RAYGUN_FORCE_PACKED_DISC"] = "1"
    try:
        params = disc.init(jax.random.PRNGKey(0), x, train=False)["params"]
        y = disc.apply({"params": params}, x, train=True)
    finally:
        os.environ.pop("RAYGUN_FORCE_PACKED_DISC", None)
    os.environ["RAYGUN_DISABLE_PACKED_DISC"] = "1"
    try:
        y_ref = disc.apply({"params": params}, x, train=True)
    finally:
        os.environ.pop("RAYGUN_DISABLE_PACKED_DISC", None)
    assert y.shape == y_ref.shape
