"""Cumulative-prefix bisect of the CURRENT packed generator shell at HEAD
(production 3x512^2 bf16), fwd+bwd, composed exactly as resnet.py's packed
route does (fused_pro_conv2 stages included). Locates the remaining
shell cost after the fused down_0/up_1 stages landed.

Units:
  P1: stem_packed
  P2: + fused_pro_conv2 down_0 (IN+relu+pad+2x2tap)
  P3: + IN+relu + down_1 (routed ConvNd s2)
  P4: + IN+relu            (= everything before the blocks)
  S1: up_0 (routed ConvT) from the block output shape
  S2: + fused_pro_conv2 up_1 (to packed)
  S3: + IN packed + head_from_packed (folded co=1)  (= everything after)
  full apply n_blocks=0 and n_blocks=6 via the real ResNet module.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from _bench_util import bench, measure_overhead

from raygun_tpu.nn.layers import ConvNd, ConvTransposeNd, pack_conv_kernel_io
from raygun_tpu.nn.packed_shell import (
    head_from_packed,
    stem_packed,
    up1_packed_kernel,
)
from raygun_tpu.nn.pallas.fconv import fused_pro_conv2
from raygun_tpu.nn.pallas.instance_norm import (
    instance_norm_act_fused,
    instance_norm_act_packed,
)
from raygun_tpu.nn.resnet import ResNet

NGF = 64
B, S = 3, 512
DT = jnp.bfloat16


def _rand(key, shape, scale=1.0):
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(DT)


def run(label, fn, params, x, n=32):
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

    tb = bench(fwdbwd, params, x, n=n)
    print(f"{label:44s} fwd+bwd {tb*1e3:7.2f} ms", flush=True)
    return tb


def main():
    print(f"device: {jax.devices()[0]}  relay ovh "
          f"{measure_overhead()*1e3:.1f} ms", flush=True)
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 20)

    x_in = _rand(ks[0], (B, S, S, 1))
    hmid = _rand(ks[1], (B, S // 4, S // 4, 4 * NGF))  # block in/out

    w_s, b_s = _rand(ks[2], (7, 7, 1, NGF), 0.1), _rand(ks[3], (NGF,), 0.1)
    w_d0, b_d0 = _rand(ks[4], (3, 3, NGF, 2 * NGF), 0.05), _rand(
        ks[5], (2 * NGF,), 0.1)
    w2_d0 = pack_conv_kernel_io(w_d0, (2, 2), (1, 1), (2, 2), (1, 1))[0]
    w2s_d0 = w2_d0.reshape(2, -1, w2_d0.shape[-1])

    m_d1 = ConvNd(features=4 * NGF, kernel_size=(3, 3), strides=2, padding=1,
                  use_bias=True)
    p_d1 = jax.jit(lambda: m_d1.init(
        ks[6], jnp.zeros((1, 8, 8, 2 * NGF), DT)))()["params"]
    p_d1 = jax.tree.map(lambda a: a.astype(DT), p_d1)

    m_u0 = ConvTransposeNd(features=2 * NGF, kernel_size=(3, 3), strides=2,
                           padding=1, output_padding=1, use_bias=True)
    p_u0 = jax.jit(lambda: m_u0.init(
        ks[7], jnp.zeros((1, 8, 8, 4 * NGF), DT)))()["params"]
    p_u0 = jax.tree.map(lambda a: a.astype(DT), p_u0)

    w_u1, b_u1 = _rand(ks[8], (3, 3, 2 * NGF, NGF), 0.05), _rand(
        ks[9], (NGF,), 0.1)
    w2_u1 = up1_packed_kernel(w_u1)
    w2s_u1 = w2_u1.reshape(2, -1, w2_u1.shape[-1])
    b2_u1 = jnp.tile(b_u1, 4)

    w_h, b_h = _rand(ks[10], (7, 7, NGF, 1), 0.05), _rand(ks[11], (1,), 0.1)

    # ---- prefixes --------------------------------------------------------
    def p1(p, x):
        return stem_packed(x, p[0], p[1])

    run("P1 stem_packed", p1, (w_s, b_s), x_in)

    def p2(p, x):
        y0 = stem_packed(x, p[0], p[1])
        return fused_pro_conv2(y0, p[2], p[3], 4, "lo")

    run("P2 +fused down_0", p2, (w_s, b_s, w2s_d0, b_d0), x_in)

    def p3(p, x):
        y0 = stem_packed(x, p[0], p[1])
        h = fused_pro_conv2(y0, p[2], p[3], 4, "lo")
        h = instance_norm_act_fused(h, 1e-5, 0.0)
        return m_d1.apply({"params": p[4]}, h)

    run("P3 +INrelu+down_1", p3, (w_s, b_s, w2s_d0, b_d0, p_d1), x_in)

    def p4(p, x):
        h = p3(p, x)
        return instance_norm_act_fused(h, 1e-5, 0.0)

    run("P4 +INrelu (pre-blocks)", p4, (w_s, b_s, w2s_d0, b_d0, p_d1), x_in)

    # ---- suffixes --------------------------------------------------------
    def s1(p, x):
        return m_u0.apply({"params": p[0]}, x)

    run("S1 up_0 (routed convT)", s1, (p_u0,), hmid)

    def s2(p, x):
        y3 = m_u0.apply({"params": p[0]}, x)
        return fused_pro_conv2(y3, p[1], p[2], 1, "hi")

    run("S2 +fused up_1", s2, (p_u0, w2s_u1, b2_u1), hmid)

    def s3(p, x):
        y3 = m_u0.apply({"params": p[0]}, x)
        hp = fused_pro_conv2(y3, p[1], p[2], 1, "hi")
        hp = instance_norm_act_packed(hp, NGF)
        return head_from_packed(hp, p[3], p[4])

    run("S3 +INpacked+head", s3, (p_u0, w2s_u1, b2_u1, w_h, b_h), hmid)

    # ---- full applies via the real module --------------------------------
    for nb in (0, 6):
        G = ResNet(ndims=2, input_nc=1, output_nc=1, ngf=NGF, n_blocks=nb,
                   padding_type="same")
        pG = jax.jit(lambda G=G: G.init(ks[12], x_in[:1], train=False))()[
            "params"]
        pG = jax.tree.map(lambda a: a.astype(DT), pG)

        def ap(p, x, G=G):
            return G.apply({"params": p}, x, train=True)

        run(f"full apply n_blocks={nb}", ap, pG, x_in, n=16)


if __name__ == "__main__":
    main()
