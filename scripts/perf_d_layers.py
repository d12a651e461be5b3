"""Per-layer cost of the production discriminator (b6, 512^2, bf16).

perf_round3_map.py: one D apply at batch 6 with grads wrt params costs
12.8 ms (13.5% MFU); the same apply with grad wrt the INPUT (the G-phase
unit) costs 8.75 ms at batch 3. This script isolates each conv(+IN+lrelu)
layer fwd and fwd+bwd so the packing/fusion work lands where it pays.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from _bench_util import bench, measure_overhead

from raygun_tpu.nn import NLayerDiscriminator
from raygun_tpu.nn.layers import ConvNd
from raygun_tpu.nn.pallas.instance_norm import instance_norm_act_fused

B, S = 6, 512
NGF = 64


def _rand(key, shape, scale=1.0):
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(
        jnp.bfloat16)


def run_stage(label, fn, params, x, n=64, grad_x=True):
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
        if grad_x:
            v, (gp, gx) = jax.value_and_grad(loss, argnums=(0, 1))(params, xi)
            s = v + jnp.sum(gx.astype(jnp.float32))
        else:
            v, gp = jax.value_and_grad(loss)(params, xi)
            s = v
        for leaf in jax.tree.leaves(gp):
            s = s + jnp.sum(leaf.astype(jnp.float32))
        return s

    tf = bench(fwd, params, x, n=n)
    tb = bench(fwdbwd, params, x, n=n)
    print(f"{label:34s} fwd {tf*1e3:6.2f} ms   fwd+bwd {tb*1e3:6.2f} ms "
          f"(bwd adds {(tb-tf)*1e3:6.2f})", flush=True)
    return tf, tb


def main():
    print(f"device: {jax.devices()[0]}  batch={B} side={S}", flush=True)
    print(f"relay overhead: {measure_overhead()*1e3:.1f} ms", flush=True)
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 16)

    x_in = _rand(ks[0], (B, S, S, 1))
    h0 = _rand(ks[1], (B, 257, 257, NGF))
    h1 = _rand(ks[2], (B, 129, 129, 2 * NGF))
    h2 = _rand(ks[3], (B, 65, 65, 4 * NGF))
    h3 = _rand(ks[4], (B, 65, 65, 8 * NGF))

    def mk(features, kernel, strides):
        return ConvNd(features=features, kernel_size=kernel, strides=strides,
                      padding=1, use_bias=True)

    lrelu = lambda y: jnp.where(y >= 0, y, 0.2 * y)

    specs = [
        ("conv_0 1->64 k2s2 +lrelu", mk(NGF, (2, 2), 2), x_in, False),
        ("conv_1 64->128 k2s2 +IN+lrelu", mk(2 * NGF, (2, 2), 2), h0, True),
        ("conv_2 128->256 k2s2 +IN+lrelu", mk(4 * NGF, (2, 2), 2), h1, True),
        ("conv_3 256->512 k3s1 +IN+lrelu", mk(8 * NGF, (3, 3), 1), h2, True),
        ("conv_out 512->1 k3s1", mk(1, (3, 3), 1), h3, False),
    ]
    for label, mod, xin, with_norm in specs:
        p = jax.jit(lambda m=mod, x=xin: m.init(ks[8], x))()["params"]
        p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
        if with_norm:
            fn = lambda pp, xx, m=mod: instance_norm_act_fused(
                m.apply({"params": pp}, xx), 1e-5, 0.2)
        else:
            fn = lambda pp, xx, m=mod: lrelu(m.apply({"params": pp}, xx))
        run_stage(label, fn, p, xin)

    # whole apply for reference
    disc = NLayerDiscriminator(ndims=2, input_nc=1, ngf=NGF, n_layers=3,
                               kw=3, downsampling_kw=2, norm="instance")
    dp = jax.jit(lambda: disc.init(ks[9], x_in[:1], train=False))()["params"]
    dp = jax.tree.map(lambda a: a.astype(jnp.bfloat16), dp)
    run_stage("FULL D apply", lambda pp, xx: disc.apply(
        {"params": pp}, xx, train=True), dp, x_in)


if __name__ == "__main__":
    main()
