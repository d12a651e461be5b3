"""Per-stage forward vs forward+backward cost of the PACKED generator
shell at the production 3x512^2 bf16 workload.

perf_step_decompose.py (round 3, after the packed shell landed): G phase
fwd 48 ms, fwd+bwd 163 ms of a 187.6 ms step. Per G apply fwd+bwd
~38 ms: 6 fused resblocks ~16.6 ms (64% MFU), shell ~21.4 ms at ~17%
MFU on its ~0.72 TF. This script localizes the shell's fwd+bwd cost per
stage (isolated, relay-honest harness) so the backward can be attacked
where it actually hurts.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from _bench_util import bench, measure_overhead

from raygun_tpu.nn.layers import ConvNd, ConvTransposeNd
from raygun_tpu.nn.packed_shell import (
    down0_from_packed,
    head_from_packed,
    stem_packed,
    up1_to_packed,
)
from raygun_tpu.nn.pallas.instance_norm import (
    instance_norm_act_fused,
    instance_norm_act_packed,
)

NGF = 64
B, S = 3, 512


def _rand(key, shape, scale=1.0):
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(
        jnp.bfloat16)


def run_stage(label, fn, params, x, n=64):
    """fn(params, x) -> y. Times fwd and fwd+bwd (grads wrt params AND x),
    nonlinear checksums, relay overhead subtracted."""

    def fwd(params, x, i):
        y = fn(params, x * (1.0 + 1e-6 * i.astype(x.dtype)))
        yf = y.astype(jnp.float32)
        return jnp.sum(yf * yf)

    def loss(params, x):
        y = fn(params, x)
        yf = y.astype(jnp.float32)
        return jnp.sum(yf * yf)

    def fwdbwd(params, x, i):
        xi = x * (1.0 + 1e-6 * i.astype(x.dtype))
        v, (gp, gx) = jax.value_and_grad(loss, argnums=(0, 1))(params, xi)
        s = v + jnp.sum(gx.astype(jnp.float32))
        for leaf in jax.tree.leaves(gp):
            s = s + jnp.sum(leaf.astype(jnp.float32))
        return s

    tf = bench(fwd, params, x, n=n)
    tb = bench(fwdbwd, params, x, n=n)
    print(f"{label:28s} fwd {tf*1e3:6.2f} ms   fwd+bwd {tb*1e3:6.2f} ms "
          f"(bwd adds {(tb-tf)*1e3:6.2f})", flush=True)
    return tf, tb


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    print(f"relay overhead: {measure_overhead()*1e3:.1f} ms", flush=True)
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 16)

    x_in = _rand(ks[0], (B, S, S, 1))
    hp256 = _rand(ks[1], (B, S // 2, S // 2, 4 * NGF))   # packed ngf maps
    h128 = _rand(ks[2], (B, S // 2, S // 2, 2 * NGF))    # down0 out
    h256c = _rand(ks[3], (B, S // 4, S // 4, 4 * NGF))   # down1 out

    # 1. stem (packed) + packed IN+relu
    w_s, b_s = _rand(ks[4], (7, 7, 1, NGF), 0.1), _rand(ks[5], (NGF,), 0.1)
    run_stage(
        "stem+INrelu (packed)",
        lambda p, x: instance_norm_act_packed(stem_packed(x, p[0], p[1]), NGF),
        (w_s, b_s), x_in)

    # 2. down0 (from packed) + fused IN+relu
    w_d0, b_d0 = _rand(ks[6], (3, 3, NGF, 2 * NGF), 0.05), _rand(
        ks[7], (2 * NGF,), 0.1)
    run_stage(
        "down0+INrelu (from packed)",
        lambda p, x: instance_norm_act_fused(
            down0_from_packed(x, p[0], p[1]), 1e-5, 0.0),
        (w_d0, b_d0), hp256)

    # 3. down1 (routed ConvNd) + fused IN+relu
    m_d1 = ConvNd(features=4 * NGF, kernel_size=(3, 3), strides=2, padding=1,
                  use_bias=True)
    p_d1 = jax.jit(lambda: m_d1.init(ks[8], h128))()["params"]
    p_d1 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p_d1)
    run_stage(
        "down1+INrelu (routed conv)",
        lambda p, x: instance_norm_act_fused(
            m_d1.apply({"params": p}, x), 1e-5, 0.0),
        p_d1, h128)

    # 4. up0 (routed ConvTranspose) + fused IN+relu
    m_u0 = ConvTransposeNd(features=2 * NGF, kernel_size=(3, 3), strides=2,
                           padding=1, output_padding=1, use_bias=True)
    p_u0 = jax.jit(lambda: m_u0.init(ks[9], h256c))()["params"]
    p_u0 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p_u0)
    run_stage(
        "up0+INrelu (routed convT)",
        lambda p, x: instance_norm_act_fused(
            m_u0.apply({"params": p}, x), 1e-5, 0.0),
        p_u0, h256c)

    # 5. up1 (to packed) + packed IN+relu
    w_u1, b_u1 = _rand(ks[10], (3, 3, 2 * NGF, NGF), 0.05), _rand(
        ks[11], (NGF,), 0.1)
    run_stage(
        "up1+INrelu (to packed)",
        lambda p, x: instance_norm_act_packed(
            up1_to_packed(x, p[0], p[1]), NGF),
        (w_u1, b_u1), h128)

    # 6. head (from packed) + tanh
    w_h, b_h = _rand(ks[12], (7, 7, NGF, 1), 0.05), _rand(ks[13], (1,), 0.1)
    run_stage(
        "head+tanh (from packed)",
        lambda p, x: jnp.tanh(
            head_from_packed(x, p[0], p[1]).astype(jnp.float32)
        ).astype(jnp.bfloat16),
        (w_h, b_h), hp256)


if __name__ == "__main__":
    main()
