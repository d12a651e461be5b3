"""Sub-kernel split of the two fattest remaining shell items at HEAD
(production shapes, bf16): the fused down_0 stage (P2-P1 = 4.4 ms) and
the INpacked+pad+head block (S3-S2 = 5.3 ms). Finds which sub-op is off
its traffic floor before any further kernel work."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from _bench_util import bench, measure_overhead

from raygun_tpu.nn.layers import pack_conv_kernel_io
from raygun_tpu.nn.packed_shell import head_from_packed, packed_reflect_pad3
from raygun_tpu.nn.pallas.fconv import _fwd_impl, _k2, _k2_wgrad, fused_pro_conv2
from raygun_tpu.nn.pallas.instance_norm import (
    _as3d,
    _bwd_dx,
    _moments,
    instance_norm_act_packed,
)

NGF = 64
B = 3
DT = jnp.bfloat16


def _rand(key, shape, scale=1.0):
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(DT)


def run(label, fn, *args, n=64):
    tb = bench(fn, *args, n=n)
    print(f"{label:44s} {tb*1e3:7.3f} ms", flush=True)
    return tb


def main():
    print(f"device: {jax.devices()[0]}  relay ovh "
          f"{measure_overhead()*1e3:.1f} ms", flush=True)
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 20)

    # ------- fused down_0 stage: y0 (3,256,256,256) -> (3,256,256,128) ----
    y0 = _rand(ks[0], (B, 256, 256, 4 * NGF))
    w_d0 = _rand(ks[1], (3, 3, NGF, 2 * NGF), 0.05)
    b_d0 = _rand(ks[2], (2 * NGF,), 0.1)
    w2 = pack_conv_kernel_io(w_d0, (2, 2), (1, 1), (2, 2), (1, 1))[0]
    w2s = w2.reshape(2, -1, w2.shape[-1])
    dy = _rand(ks[3], (B, 256, 256, 2 * NGF))

    def f_fwd(y0, i):
        y = fused_pro_conv2(y0 * (1 + 1e-6 * i.astype(DT)), w2s, b_d0, 4, "lo")
        return jnp.sum(y.astype(jnp.float32) ** 2)

    run("down0 fused FWD (stats+kernel)", f_fwd, y0)

    def f_stats(y0, i):
        x3 = _as3d(y0 * (1 + 1e-6 * i.astype(DT)))
        m, r = _moments(x3, 1e-5, group=4)
        return jnp.sum(m) + jnp.sum(r)

    run("  stats pass alone", f_stats, y0)

    def f_fwdbwd(y0, i):
        def loss(y0):
            y = fused_pro_conv2(y0, w2s, b_d0, 4, "lo")
            return jnp.sum(y.astype(jnp.float32) ** 2)
        v, g = jax.value_and_grad(loss)(y0 * (1 + 1e-6 * i.astype(DT)))
        return v + jnp.sum(g.astype(jnp.float32))

    run("down0 fused FWD+BWD (dinp+dw+INbwd)", f_fwdbwd, y0)

    # bwd sub-kernels
    Cin, Cout = 4 * NGF, 2 * NGF
    w22 = w2s.reshape(2, 2, Cin, Cout)
    wT = jnp.flip(w22, (0, 1)).transpose(0, 1, 3, 2).reshape(2, 2 * Cout, Cin)

    def f_dinp(dy, i):
        dh = _k2(dy * (1 + 1e-6 * i.astype(DT)), wT, None, "hi", out_dtype=DT)
        return jnp.sum(dh.astype(jnp.float32) ** 2)

    run("  dinp kernel alone", f_dinp, dy)

    mean, rstd, mt, rt = None, None, None, None
    x3 = _as3d(y0)
    m_, r_ = _moments(x3, 1e-5, group=4)
    mt_, rt_ = jnp.tile(m_, (1, 4)), jnp.tile(r_, (1, 4))

    def f_wgrad(dy, i):
        dw, db = _k2_wgrad(dy * (1 + 1e-6 * i.astype(DT)), y0, (mt_, rt_),
                           "lo", 0.0)
        return jnp.sum(dw) + jnp.sum(db)

    run("  wgrad kernel alone", f_wgrad, dy)

    dh0 = _rand(ks[4], (B, 256, 256, 4 * NGF))

    def f_inbwd(dh, i):
        dyp = _bwd_dx(1e-5, 0.0, x3, m_, r_,
                      _as3d(dh * (1 + 1e-6 * i.astype(DT))), group=4)
        return jnp.sum(dyp.astype(jnp.float32))

    run("  IN bwd (_bwd_dx) alone", f_inbwd, dh0)

    # ------- head block: hp (3,256,256,256) -> (3,512,512,1) --------------
    hp = _rand(ks[5], (B, 256, 256, 4 * NGF))
    w_h = _rand(ks[6], (7, 7, NGF, 1), 0.05)
    b_h = _rand(ks[7], (1,), 0.1)

    def h_in(hp, i):
        y = instance_norm_act_packed(hp * (1 + 1e-6 * i.astype(DT)), NGF)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    run("INpacked FWD alone", h_in, hp)

    def h_in_fb(hp, i):
        def loss(hp):
            y = instance_norm_act_packed(hp, NGF)
            return jnp.sum(y.astype(jnp.float32) ** 2)
        v, g = jax.value_and_grad(loss)(hp * (1 + 1e-6 * i.astype(DT)))
        return v + jnp.sum(g.astype(jnp.float32))

    run("INpacked FWD+BWD alone", h_in_fb, hp)

    def h_pad(hp, i):
        y = packed_reflect_pad3(hp * (1 + 1e-6 * i.astype(DT)))
        return jnp.sum(y.astype(jnp.float32) ** 2)

    run("packed_reflect_pad3 FWD alone", h_pad, hp)

    def h_head_fb(hp, i):
        def loss(hp):
            y = head_from_packed(hp, w_h, b_h)
            return jnp.sum(y.astype(jnp.float32) ** 2)
        v, g = jax.value_and_grad(loss)(hp * (1 + 1e-6 * i.astype(DT)))
        return v + jnp.sum(g.astype(jnp.float32))

    run("head_from_packed FWD+BWD (incl pad)", h_head_fb, hp)

    def h_full_fb(hp, i):
        def loss(hp):
            y = head_from_packed(instance_norm_act_packed(hp, NGF), w_h, b_h)
            return jnp.sum(y.astype(jnp.float32) ** 2)
        v, g = jax.value_and_grad(loss)(hp * (1 + 1e-6 * i.astype(DT)))
        return v + jnp.sum(g.astype(jnp.float32))

    run("IN+head FWD+BWD composed", h_full_fb, hp)


if __name__ == "__main__":
    main()
