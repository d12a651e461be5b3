"""Chain-resident resblock backward == per-block kernels == unfused math.

The kernels run in interpret mode on CPU (production routing selects them
only on TPU — resblock_chain_bwd.rb_chain_bwd_ok). The chain backward
must be BIT-exact against chaining resblock_bwd.rb_bwd_fused per block
(same formulas, slab association, and bf16 rounding points — module
docstring), and gradient-close to the unfused fp32 reference. Reference
for the block math: torch ``ResNet.py:127-223``."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from raygun_tpu.nn.pallas.resblock import _rb_forward, resblock_fused
from raygun_tpu.nn.pallas.resblock_bwd import rb_bwd_fused
from raygun_tpu.nn.pallas import resblock_chain_bwd as rcb

N, B, H, W, C = 3, 2, 32, 16, 128


def _mk(seed=0, dtype=jnp.bfloat16):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = (jax.random.normal(ks[0], (B, H, W, C), jnp.float32) * 1.5
         ).astype(dtype)
    w1s = (jax.random.normal(ks[1], (N, 3, 3, C, C), jnp.float32) * 0.05
           ).astype(dtype)
    b1s = (jax.random.normal(ks[2], (N, C), jnp.float32) * 0.1).astype(dtype)
    w2s = (jax.random.normal(ks[3], (N, 3, 3, C, C), jnp.float32) * 0.05
           ).astype(dtype)
    b2s = (jax.random.normal(ks[4], (N, C), jnp.float32) * 0.1).astype(dtype)
    return x, w1s, b1s, w2s, b2s


def _chain_residuals(x, w1s, b1s, w2s, b2s, eps=1e-5):
    h = x  # (interpret-mode callers wrap this in force_tpu_interpret_mode)
    outs, y1s, y2s, m1s, r1s, m2s, r2s = [], [], [], [], [], [], []
    for i in range(N):
        h, (y1, y2, m1, r1, m2, r2) = _rb_forward(
            h, w1s[i], b1s[i], w2s[i], b2s[i], eps)
        outs.append(h); y1s.append(y1); y2s.append(y2)
        m1s.append(m1); r1s.append(r1); m2s.append(m2); r2s.append(r2)
    return (jnp.stack(outs), jnp.stack(y1s), jnp.stack(y2s),
            jnp.stack(m1s), jnp.stack(r1s), jnp.stack(m2s), jnp.stack(r2s))


def test_chain_forward_matches_sequential_blocks():
    x, w1s, b1s, w2s, b2s = _mk()
    with pltpu.force_tpu_interpret_mode():
        out = rcb.resblock_chain_bwdfused(x, w1s, b1s, w2s, b2s)
        h = x
        for i in range(N):
            h = resblock_fused(h, w1s[i], b1s[i], w2s[i], b2s[i])
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(h, np.float32))


def test_chain_bwd_kernel_bitexact_vs_per_block_kernels():
    x, w1s, b1s, w2s, b2s = _mk(seed=1)
    with pltpu.force_tpu_interpret_mode():
        outs, y1s, y2s, m1s, r1s, m2s, r2s = _chain_residuals(
            x, w1s, b1s, w2s, b2s)
    dout = (jax.random.normal(jax.random.PRNGKey(9), x.shape, jnp.float32)
            ).astype(x.dtype)

    with pltpu.force_tpu_interpret_mode():
        dx_c, dw1_c, db1_c, dw2_c, db2_c = rcb.rb_chain_bwd(
            x, outs, y1s, y2s, m1s, r1s, m2s, r2s, w1s, w2s, dout)

        d = dout
        dw1_p, db1_p, dw2_p, db2_p = [], [], [], []
        for i in range(N - 1, -1, -1):
            xi = x if i == 0 else outs[i - 1]
            d, dW1, dB1, dW2, dB2 = rb_bwd_fused(
                xi, w1s[i], w2s[i], y1s[i], y2s[i],
                m1s[i], r1s[i], m2s[i], r2s[i], d)
            dw1_p.append(dW1); db1_p.append(dB1)
            dw2_p.append(dW2); db2_p.append(dB2)

    np.testing.assert_array_equal(np.asarray(dx_c, np.float32),
                                  np.asarray(d, np.float32))
    for got, want in (
        (dw1_c, dw1_p), (db1_c, db1_p), (dw2_c, dw2_p), (db2_c, db2_p),
    ):
        want = jnp.stack(want[::-1])
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_chain_op_vjp_bitexact_vs_sequential_fused_route(monkeypatch):
    """jax.grad through the chain op == jax.grad through N sequential
    resblock_fused calls with the resident per-block backward — the
    production route the chain replaces. Bit-exact: identical kernels,
    slab association, and bf16 rounding points on both sides. (Anchoring
    to the unfused fp32 module is inherited transitively from
    test_resblock_pallas.py's per-block parity tests.)"""
    from raygun_tpu.nn.pallas import resblock_bwd as rbb

    monkeypatch.setattr(rcb, "rb_chain_bwd_ok", lambda x, n: True)
    monkeypatch.setattr(rbb, "rb_bwd_fused_ok", lambda x: True)
    x, w1s, b1s, w2s, b2s = _mk(seed=2)

    def loss_chain(args):
        x, w1s, b1s, w2s, b2s = args
        out = rcb.resblock_chain_bwdfused(x, w1s, b1s, w2s, b2s)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_seq(args):
        x, w1s, b1s, w2s, b2s = args
        h = x
        for i in range(N):
            h = resblock_fused(h, w1s[i], b1s[i], w2s[i], b2s[i])
        return jnp.sum(h.astype(jnp.float32) ** 2)

    args = (x, w1s, b1s, w2s, b2s)
    with pltpu.force_tpu_interpret_mode():
        gc = jax.grad(loss_chain)(args)
        gs = jax.grad(loss_seq)(args)
    for a, b, name in zip(gc, gs, "x w1s b1s w2s b2s".split()):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32),
                                      err_msg=name)


def test_inference_primal_no_residual_chain(monkeypatch):
    """The UNdifferentiated op (inference/rendering) routes through the
    no-residual resident chain and is bit-exact vs the sequential
    per-block forward; differentiation is unaffected (custom_vjp runs
    the residual-saving fwd instead of the primal)."""
    from raygun_tpu.nn.pallas import resblock_chain as rc

    monkeypatch.setattr(rc, "resblock_chain_ok", lambda x, n: True)
    x, w1s, b1s, w2s, b2s = _mk(seed=4)
    with pltpu.force_tpu_interpret_mode():
        out = rcb.resblock_chain_bwdfused(x, w1s, b1s, w2s, b2s)
        direct = rc._chain_forward_infer(x, w1s, b1s, w2s, b2s, 1e-5)
        h = x
        for i in range(N):
            h = resblock_fused(h, w1s[i], b1s[i], w2s[i], b2s[i])
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(h, np.float32))
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(direct, np.float32))


def test_chunked_batch_dispatch(monkeypatch):
    """Batches beyond the VMEM chunk run as multiple kernel calls: dx is
    bit-exact per image; dw/db partials add once per chunk (fp32
    reassociation only — same class as sibling-apply batching)."""
    monkeypatch.setattr(rcb, "_batch_chunk", lambda *a: 1)
    x, w1s, b1s, w2s, b2s = _mk(seed=3)
    with pltpu.force_tpu_interpret_mode():
        outs, y1s, y2s, m1s, r1s, m2s, r2s = _chain_residuals(
            x, w1s, b1s, w2s, b2s)
        dout = (jax.random.normal(jax.random.PRNGKey(7), x.shape)
                ).astype(x.dtype)
        dx_c, dw1_c, db1_c, dw2_c, db2_c = rcb.rb_chain_bwd(
            x, outs, y1s, y2s, m1s, r1s, m2s, r2s, w1s, w2s, dout)

        d = dout
        dw1_p, db1_p, dw2_p, db2_p = [], [], [], []
        for i in range(N - 1, -1, -1):
            xi = x if i == 0 else outs[i - 1]
            d, dW1, dB1, dW2, dB2 = rb_bwd_fused(
                xi, w1s[i], w2s[i], y1s[i], y2s[i],
                m1s[i], r1s[i], m2s[i], r2s[i], d)
            dw1_p.append(dW1); db1_p.append(dB1)
            dw2_p.append(dW2); db2_p.append(dB2)

    np.testing.assert_array_equal(np.asarray(dx_c, np.float32),
                                  np.asarray(d, np.float32))
    for got, want in ((dw1_c, dw1_p), (db1_c, db1_p),
                      (dw2_c, dw2_p), (db2_c, db2_p)):
        want = np.asarray(jnp.stack(want[::-1]))
        got = np.asarray(got)
        np.testing.assert_allclose(got, want, rtol=3e-5,
                                   atol=3e-5 * max(1.0, np.abs(want).max()))


def test_model_route_same_tree_values_and_grads(monkeypatch):
    """ResNet with RAYGUN_RBCHAIN=1 (gates forced on CPU) produces the
    same param tree, outputs, and gradients as the unrouted model."""
    from raygun_tpu.nn import resnet as rn
    from raygun_tpu.nn.pallas import resblock as rb
    from raygun_tpu.nn.pallas import resblock_bwd as rbb

    monkeypatch.setenv("RAYGUN_RBCHAIN", "1")
    monkeypatch.setattr(rcb, "rb_chain_bwd_ok", lambda x, n: True)
    monkeypatch.setattr(rb, "resblock_fused_ok", lambda x: True)
    # both arms must use the resident per-block backward family (the
    # split route reassociates fp32 sums — fused-vs-split is tolerance-
    # tested in test_resblock_pallas.py, not bit-equal)
    monkeypatch.setattr(rbb, "rb_bwd_fused_ok", lambda x: True)

    model = rn.ResNet(ndims=2, input_nc=1, output_nc=1, ngf=32, n_blocks=2,
                      padding_type="same")
    x = (jax.random.normal(jax.random.PRNGKey(3), (1, 128, 64, 1))
         ).astype(jnp.bfloat16)

    with pltpu.force_tpu_interpret_mode():
        params = model.init(jax.random.PRNGKey(0), x)

        def loss(p):
            return jnp.sum(model.apply(p, x).astype(jnp.float32) ** 2)

        v_on, g_on = jax.value_and_grad(loss)(params)

    monkeypatch.setenv("RAYGUN_RBCHAIN", "0")
    with pltpu.force_tpu_interpret_mode():
        params_off = model.init(jax.random.PRNGKey(0), x)

        def loss_off(p):
            return jnp.sum(model.apply(p, x).astype(jnp.float32) ** 2)

        v_off, g_off = jax.value_and_grad(loss_off)(params_off)

    assert jax.tree.structure(params) == jax.tree.structure(params_off)
    np.testing.assert_array_equal(np.asarray(v_on), np.asarray(v_off))
    flat_on = jax.tree.leaves(g_on)
    flat_off = jax.tree.leaves(g_off)
    for a, b in zip(flat_on, flat_off):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


def test_gate_rejects_wrong_shapes():
    ok = rcb.rb_chain_bwd_ok
    x = jnp.zeros((B, H, W, C), jnp.bfloat16)
    assert not ok(jnp.zeros((B, H, W, 96), jnp.bfloat16), N)  # C % 128
    assert not ok(x.astype(jnp.float32), N)                   # dtype
    assert not ok(x, 1)                                       # single block
    # platform gate: CPU runs reject (production kernels are TPU-routed)
    assert not ok(x, N)
