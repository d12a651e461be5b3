"""Parity tests for the packed generator shell (nn/packed_shell.py).

Every packed route must be an EXACT re-expression of the fine-resolution
op (same math, re-indexed kernels), so parity is asserted at fp32 with
tight tolerances, for values AND gradients, plus identical param trees
between the packed and standard ResNet routes (checkpoints swap freely).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raygun_tpu.nn.layers import (
    conv_dimension_numbers_nd,
    conv_nd,
    depth_to_space,
    pack_conv_kernel_io,
    pad_spatial,
    space_to_depth,
)
from raygun_tpu.nn.packed_shell import (
    down0_from_packed,
    head_from_packed,
    packed_reflect_pad3,
    stem_packed,
    up1_to_packed,
)
from raygun_tpu.nn.pallas.instance_norm import instance_norm_act_packed
from raygun_tpu.nn.resnet import ResNet


def rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


class TestPackedConvs:
    def test_stem_packed(self):
        x = rand(0, (2, 16, 16, 3))
        w = rand(1, (7, 7, 3, 5)) * 0.2
        b = rand(2, (5,)) * 0.1
        ref = conv_nd(pad_spatial(x, [(3, 3)] * 2, "reflect"), w) + b
        got = depth_to_space(stem_packed(x, w, b), (2, 2))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def test_stem_fine_matches_coarse(self, monkeypatch):
        """The opt-in FINE stem (one 8x8-tap stride-2 conv on the padded
        fine input; measured 72 ms SLOWER at step level and rejected, see
        stem_packed docstring) is the same sum as the default COARSE s2d
        form — values AND gradients."""
        x = rand(0, (2, 16, 16, 1))
        w = rand(1, (7, 7, 1, 5)) * 0.2
        b = rand(2, (5,)) * 0.1

        def loss(x, w, b):
            return jnp.sum(jnp.sin(stem_packed(x, w, b)))

        y_c = stem_packed(x, w, b)
        g_c = jax.grad(loss, argnums=(0, 1, 2))(x, w, b)
        monkeypatch.setenv("RAYGUN_STEM_FINE", "1")
        y_f = stem_packed(x, w, b)
        g_f = jax.grad(loss, argnums=(0, 1, 2))(x, w, b)
        np.testing.assert_allclose(y_f, y_c, rtol=1e-5, atol=1e-5)
        for a, bb in zip(g_c, g_f):
            np.testing.assert_allclose(bb, a, rtol=1e-4, atol=1e-4)

    def test_down0_packed(self):
        xf = rand(3, (2, 16, 16, 4))
        w = rand(4, (3, 3, 4, 6)) * 0.2
        b = rand(5, (6,)) * 0.1
        ref = jax.lax.conv_general_dilated(
            xf, w, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=conv_dimension_numbers_nd(2),
        ) + b
        got = down0_from_packed(space_to_depth(xf, (2, 2)), w, b)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def test_head_packed(self):
        xf = rand(6, (2, 16, 16, 4))
        w = rand(7, (7, 7, 4, 1)) * 0.2
        b = rand(8, (1,)) * 0.1
        ref = conv_nd(pad_spatial(xf, [(3, 3)] * 2, "reflect"), w) + b
        got = head_from_packed(space_to_depth(xf, (2, 2)), w, b)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def test_head_packed_multichannel_out(self):
        xf = rand(9, (1, 24, 24, 3))
        w = rand(10, (7, 7, 3, 2)) * 0.2
        ref = conv_nd(pad_spatial(xf, [(3, 3)] * 2, "reflect"), w)
        got = head_from_packed(space_to_depth(xf, (2, 2)), w, None)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def test_up1_packed(self):
        from raygun_tpu.nn.layers import conv_transpose_s2_subpixel

        x = rand(11, (2, 9, 9, 4))
        w = rand(12, (3, 3, 4, 3)) * 0.2
        b = rand(13, (3,)) * 0.1
        ref = conv_transpose_s2_subpixel(x, w) + b
        got = depth_to_space(up1_to_packed(x, w, b), (2, 2))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("B,H,C,N,K,s", [
        (2, 36, 8, 12, 8, 4),   # the production head's shape class (s=4)
        (1, 20, 4, 6, 4, 2),
        (2, 24, 16, 8, 8, 2),
    ])
    def test_conv_coarse_strided_custom_vjp(self, B, H, C, N, K, s):
        """_conv_coarse_strided's custom VJP (phase-regrouped dx conv +
        tap-shift einsum dw) must match XLA autodiff exactly — it is a
        re-indexing of the same sums."""
        from raygun_tpu.nn.packed_shell import _conv, _conv_coarse_strided

        xq = rand(30, (B, H, H, C))
        w2 = rand(31, (K, K, C, N)) * 0.1

        def loss(conv, xq, w2):
            return jnp.sum(jnp.sin(conv(xq, w2)))

        v0, g0 = jax.value_and_grad(
            lambda a, b: loss(lambda x, w: _conv(x, w, (s, s)), a, b),
            argnums=(0, 1))(xq, w2)
        v1, g1 = jax.value_and_grad(
            lambda a, b: loss(lambda x, w: _conv_coarse_strided(x, w, s),
                              a, b), argnums=(0, 1))(xq, w2)
        np.testing.assert_allclose(v0, v1, rtol=1e-6)
        np.testing.assert_allclose(g0[0], g1[0], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(g0[1], g1[1], rtol=1e-5, atol=1e-5)

    def test_head_from_packed_grads_match_default_conv(self):
        """head_from_packed routes through the custom-VJP strided conv on
        the f=8 path; gradients must match the default-autodiff routing
        (tolerance covers fp32 reassociation in the big dw reduction)."""
        import raygun_tpu.nn.packed_shell as ps

        xp = rand(32, (2, 32, 32, 4 * 16))
        w = rand(33, (7, 7, 16, 1)) * 0.1
        b = rand(34, (1,)) * 0.1

        def head_loss(xp, w):
            return jnp.sum(jnp.tanh(ps.head_from_packed(xp, w, b)))

        v, g = jax.value_and_grad(head_loss, argnums=(0, 1))(xp, w)
        orig = ps._conv_maybe_custom
        ps._conv_maybe_custom = lambda xq, w2, cstr: ps._conv(xq, w2, cstr)
        try:
            v2, g2 = jax.value_and_grad(head_loss, argnums=(0, 1))(xp, w)
        finally:
            ps._conv_maybe_custom = orig
        np.testing.assert_allclose(v, v2, rtol=1e-6)
        np.testing.assert_allclose(g[0], g2[0], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(g[1], g2[1], rtol=1e-4, atol=1e-4)

    def test_pack_conv_kernel_io_generalizes_s2d(self):
        # f_in == f_out, stride 1, start 0 must reproduce the fine conv
        xf = rand(14, (1, 12, 12, 2))
        w = rand(15, (3, 3, 2, 4)) * 0.3
        ref = conv_nd(xf, w)  # valid, (1, 10, 10, 4)
        xp = space_to_depth(xf, (2, 2))
        w2, ntaps, cstr = pack_conv_kernel_io(w, (2, 2), (2, 2), (1, 1), (0, 0))
        y = jax.lax.conv_general_dilated(
            xp, w2, cstr, "VALID",
            dimension_numbers=conv_dimension_numbers_nd(2))
        got = depth_to_space(y, (2, 2))[:, :10, :10, :]
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


class TestPackedReflectPad:
    def test_matches_fine_reflect_pad(self):
        xf = rand(20, (2, 12, 16, 3))
        ref = pad_spatial(xf, [(3, 3)] * 2, "reflect")
        got = depth_to_space(
            packed_reflect_pad3(space_to_depth(xf, (2, 2))), (2, 2))
        # packed pad spans fine [-4, N+3]; valid reflected values on [-3, N+2]
        np.testing.assert_allclose(got[:, 1:-1, 1:-1, :], ref,
                                   rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize(
        "shape", [(2, 16, 16, 128), (1, 28, 24, 256), (1, 12, 8, 512)])
    def test_pad_pallas_bit_exact(self, shape, monkeypatch):
        """The one-pass Pallas pad band kernel (r5, nn/pallas/pad_packed)
        is BIT-identical to the XLA impl — pure selects/copies, no
        arithmetic — across band sizes and edge-band layouts."""
        from raygun_tpu.nn.packed_shell import _packed_reflect_pad3_impl
        from raygun_tpu.nn.pallas.pad_packed import (
            pad3_pallas_ok,
            packed_reflect_pad3_pallas,
        )

        monkeypatch.setenv("RAYGUN_FORCE_PAD_PALLAS", "1")
        x = rand(shape[1], shape)
        assert pad3_pallas_ok(x)
        a = _packed_reflect_pad3_impl(x)
        b = packed_reflect_pad3_pallas(x)
        assert a.shape == b.shape
        assert bool(jnp.all(a == b)), float(jnp.max(jnp.abs(a - b)))

    @pytest.mark.parametrize(
        "shape", [(2, 16, 16, 128), (1, 28, 24, 256), (1, 12, 8, 512)])
    def test_padT_pallas_bit_exact(self, shape, monkeypatch):
        """The Pallas strip-add TRANSPOSE band kernel is bit-identical to
        the XLA strip-add impl AND to jax.vjp of the pad forward."""
        from raygun_tpu.nn.packed_shell import (
            _packed_reflect_pad3_impl,
            packed_reflect_pad3_T,
        )
        from raygun_tpu.nn.pallas.pad_packed import (
            pad3T_pallas_ok,
            packed_reflect_pad3_T_pallas,
        )

        B, Hc, Wc, C4 = shape
        g = rand(Hc, (B, Hc + 4, Wc + 4, C4))
        monkeypatch.setenv("RAYGUN_DISABLE_PAD_PALLAS", "1")
        ref = packed_reflect_pad3_T(g)
        monkeypatch.delenv("RAYGUN_DISABLE_PAD_PALLAS")
        monkeypatch.setenv("RAYGUN_FORCE_PAD_PALLAS", "1")
        assert pad3T_pallas_ok(g)
        got = packed_reflect_pad3_T_pallas(g)
        assert bool(jnp.all(ref == got))
        x = rand(Wc, (B, Hc, Wc, C4))
        y, vjp = jax.vjp(_packed_reflect_pad3_impl, x)
        gv = rand(7, y.shape)
        (want,) = vjp(gv)
        np.testing.assert_allclose(
            packed_reflect_pad3_T_pallas(gv), want, rtol=1e-6, atol=1e-6)


class TestPackedInstanceNorm:
    def _ref(self, xf, slope):
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.var(xf, axis=(1, 2), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
        return jnp.where(y > 0, y, slope * y)

    @pytest.mark.parametrize("slope", [0.0, 0.2])
    def test_values(self, slope):
        xf = rand(21, (2, 8, 8, 5))
        xp = space_to_depth(xf, (2, 2))
        got = depth_to_space(
            instance_norm_act_packed(xp, 5, 1e-5, slope), (2, 2))
        np.testing.assert_allclose(got, self._ref(xf, slope),
                                   rtol=1e-5, atol=1e-5)

    def test_grads(self):
        xf = rand(22, (1, 8, 8, 3))

        def f_packed(xf):
            xp = space_to_depth(xf, (2, 2))
            y = instance_norm_act_packed(xp, 3, 1e-5, 0.0)
            return jnp.sum(y ** 2)

        def f_ref(xf):
            return jnp.sum(self._ref(xf, 0.0) ** 2)

        gp, gr = jax.grad(f_packed)(xf), jax.grad(f_ref)(xf)
        np.testing.assert_allclose(gp, gr, rtol=1e-4, atol=1e-5)

    def test_pallas_interpret_matches_fallback(self):
        from jax.experimental.pallas import tpu as pltpu

        from raygun_tpu.nn.pallas.instance_norm import (
            instance_norm_act_packed_pallas,
        )

        xf = rand(23, (2, 8, 8, 5))
        xp = space_to_depth(xf, (2, 2))
        ref = instance_norm_act_packed(xp, 5, 1e-5, 0.2)  # XLA fallback (CPU)
        with pltpu.force_tpu_interpret_mode():
            got = instance_norm_act_packed_pallas(xp, 5, 1e-5, 0.2)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_pallas_interpret_grads(self):
        from jax.experimental.pallas import tpu as pltpu

        from raygun_tpu.nn.pallas.instance_norm import (
            instance_norm_act_packed_pallas,
        )

        xf = rand(24, (1, 8, 8, 3))
        xp = space_to_depth(xf, (2, 2))

        gr = jax.grad(
            lambda t: jnp.sum(instance_norm_act_packed(t, 3) ** 2))(xp)
        with pltpu.force_tpu_interpret_mode():
            gp = jax.grad(
                lambda t: jnp.sum(
                    instance_norm_act_packed_pallas(t, 3) ** 2))(xp)
        np.testing.assert_allclose(gp, gr, rtol=1e-4, atol=1e-5)


class TestResNetPackedRoute:
    """The full generator: packed route == standard route, same params."""

    def _mk(self):
        return ResNet(ndims=2, input_nc=1, output_nc=1, ngf=8, n_blocks=2)

    def _init_and_apply(self, force, x, gradcheck=False):
        env = ("RAYGUN_FORCE_PACKED_SHELL" if force
               else "RAYGUN_DISABLE_PACKED_SHELL")
        old = os.environ.get(env)
        os.environ[env] = "1"
        try:
            net = self._mk()
            params = net.init(jax.random.PRNGKey(7), x)
            y = net.apply(params, x)
            g = None
            if gradcheck:
                def loss(p, x):
                    return jnp.sum(net.apply(p, x) ** 2)
                g = jax.grad(loss, argnums=(0, 1))(params, x)
            return params, y, g
        finally:
            if old is None:
                del os.environ[env]
            else:
                os.environ[env] = old

    def test_output_and_param_tree_parity(self):
        x = rand(30, (2, 32, 32, 1))
        p_std, y_std, _ = self._init_and_apply(False, x)
        p_pkd, y_pkd, _ = self._init_and_apply(True, x)
        # identical param trees (same names, shapes, values from same seed)
        flat_s = jax.tree_util.tree_flatten_with_path(p_std)[0]
        flat_p = jax.tree_util.tree_flatten_with_path(p_pkd)[0]
        assert [k for k, _ in flat_s] == [k for k, _ in flat_p]
        for (k, a), (_, b) in zip(flat_s, flat_p):
            np.testing.assert_array_equal(a, b, err_msg=str(k))
        np.testing.assert_allclose(y_pkd, y_std, rtol=1e-4, atol=1e-4)

    def test_gradient_parity(self):
        x = rand(31, (1, 32, 32, 1))
        p_std, _, (gp_std, gx_std) = self._init_and_apply(
            False, x, gradcheck=True)
        _, _, (gp_pkd, gx_pkd) = self._init_and_apply(
            True, x, gradcheck=True)
        np.testing.assert_allclose(gx_pkd, gx_std, rtol=1e-3, atol=1e-4)
        for (k, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(gp_std)[0],
            jax.tree_util.tree_flatten_with_path(gp_pkd)[0],
        ):
            np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-4,
                                       err_msg=str(k))

    def test_head_fold_kwarg_parity(self):
        # core called with head_fold must equal core -> 1x1 conv, both routes
        from raygun_tpu.nn.layers import conv_nd

        x = rand(33, (1, 32, 32, 1))
        net = ResNet(ndims=2, input_nc=1, ngf=8, n_blocks=1)  # out = ngf
        V = rand(34, (1, 1, 8, 1)) * 0.3
        b1 = rand(35, (1,)) * 0.1
        outs = {}
        for force, env in ((True, "RAYGUN_FORCE_PACKED_SHELL"),
                           (False, "RAYGUN_DISABLE_PACKED_SHELL")):
            os.environ[env] = "1"
            try:
                p = net.init(jax.random.PRNGKey(9), x)
                y_fold = net.apply(p, x, head_fold=(V, b1))
                y_ref = conv_nd(net.apply(p, x), V) + b1
                np.testing.assert_allclose(y_fold, y_ref, rtol=1e-4,
                                           atol=1e-4)
                outs[force] = y_fold
            finally:
                del os.environ[env]
        np.testing.assert_allclose(outs[True], outs[False], rtol=1e-4,
                                   atol=1e-4)

    def test_applies_cross_route_checkpoint(self):
        # params trained on one route must drive the other bit-for-bit
        x = rand(32, (1, 16, 16, 1))
        p_std, _, _ = self._init_and_apply(False, x)
        os.environ["RAYGUN_FORCE_PACKED_SHELL"] = "1"
        try:
            y_pkd = self._mk().apply(p_std, x)
        finally:
            del os.environ["RAYGUN_FORCE_PACKED_SHELL"]
        os.environ["RAYGUN_DISABLE_PACKED_SHELL"] = "1"
        try:
            y_std = self._mk().apply(p_std, x)
        finally:
            del os.environ["RAYGUN_DISABLE_PACKED_SHELL"]
        np.testing.assert_allclose(y_pkd, y_std, rtol=1e-4, atol=1e-4)


class TestGeneratorAssemblyFold:
    """The PRODUCTION generator assembly (get_network: ResNet core whose
    own head is ngf-wide + 1x1 conv head + tanh, systems/base.py) — the
    packed route folds the 1x1 into the core head; parity + identical
    param trees across routes."""

    def _net(self):
        import types

        from raygun_tpu.systems.base import BaseSystem

        host = types.SimpleNamespace(ndims=2)
        return BaseSystem.get_network(host, "resnet", {
            "input_nc": 1, "output_nc": 1, "ngf": 8, "n_blocks": 2,
            "padding_type": "same", "final_activation": "tanh",
        })

    def _run(self, force, x, gradcheck=False):
        env = ("RAYGUN_FORCE_PACKED_SHELL" if force
               else "RAYGUN_DISABLE_PACKED_SHELL")
        os.environ[env] = "1"
        try:
            net = self._net()
            params = net.init(jax.random.PRNGKey(11), x)
            y = net.apply(params, x)
            g = None
            if gradcheck:
                g = jax.grad(
                    lambda p: jnp.sum(net.apply(p, x) ** 2))(params)
            return params, y, g
        finally:
            del os.environ[env]

    def test_assembly_parity(self):
        x = rand(40, (2, 32, 32, 1))
        p_std, y_std, _ = self._run(False, x)
        p_pkd, y_pkd, _ = self._run(True, x)
        flat_s = jax.tree_util.tree_flatten_with_path(p_std)[0]
        flat_p = jax.tree_util.tree_flatten_with_path(p_pkd)[0]
        assert [k for k, _ in flat_s] == [k for k, _ in flat_p]
        np.testing.assert_allclose(y_pkd, y_std, rtol=1e-4, atol=1e-4)

    def test_assembly_grad_parity(self):
        x = rand(41, (1, 32, 32, 1))
        _, _, g_std = self._run(False, x, gradcheck=True)
        _, _, g_pkd = self._run(True, x, gradcheck=True)
        for (k, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_std)[0],
            jax.tree_util.tree_flatten_with_path(g_pkd)[0],
        ):
            np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-4,
                                       err_msg=str(k))


class TestPackedReflectPadVJP:
    """packed_reflect_pad3's custom VJP (the explicit strip-add transpose)
    must equal the autodiff backward of the raw where/concat composition
    EXACTLY — including rectangular extents."""

    def test_transpose_matches_autodiff(self):
        from raygun_tpu.nn.packed_shell import (
            _packed_reflect_pad3_impl,
            packed_reflect_pad3,
            packed_reflect_pad3_T,
        )

        for shape in ((2, 16, 16, 32), (1, 16, 24, 8), (3, 12, 20, 128)):
            x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
            y, vjp_ref = jax.vjp(_packed_reflect_pad3_impl, x)
            y2, vjp_new = jax.vjp(packed_reflect_pad3, x)
            np.testing.assert_array_equal(np.asarray(y2), np.asarray(y))
            g = jax.random.normal(jax.random.PRNGKey(1), y.shape, jnp.float32)
            np.testing.assert_allclose(
                np.asarray(vjp_new(g)[0]), np.asarray(vjp_ref(g)[0]),
                rtol=1e-6, atol=1e-6, err_msg=str(shape))
            np.testing.assert_allclose(
                np.asarray(packed_reflect_pad3_T(g)),
                np.asarray(vjp_ref(g)[0]), rtol=1e-6, atol=1e-6)
