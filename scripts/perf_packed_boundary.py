"""Cost of the fine C=1 inter-apply boundary vs a PACKED boundary.

perf_packed_stages.py at HEAD: stem fwd+bwd 5.32 ms, head 5.60 ms — both
dominated not by their GEMMs but by the FINE (B, 512, 512, 1) tensor they
exchange: a C=1 bf16 tensor is lane-padded 128x (T(8,128)), so every
materialization of a fake image (and of its cotangent on the way back)
moves ~200 MB instead of 1.5 MB, and the convs touching it pick idle-lane
emitters (head fwd co=1, stem dx ci=1 — nn/packed_shell.py docstring).

In the cycle chains the fine image is needed by NOTHING except the next
apply's stem (and the elementwise losses, which are packing-invariant):
G1 head -> [fine] -> G2 stem. This probe measures the chain boundary both
ways at the production 3x512^2 bf16 workload:

  A (fine):    head_from_packed (d2s to fine) -> stem_packed (pad + s2d)
  B (packed):  head kept f=8-packed -> repack 8->2 -> packed reflect pad
               -> stem conv (origin-1 packed kernel), fine never exists

Both include the stem's packed instance-norm+relu; grads flow to params
AND to the head's input (the real chain's cotangent path). Parity of B
vs A is asserted on CPU first (fp32).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from raygun_tpu.nn.layers import depth_to_space, pack_conv_kernel_io
from raygun_tpu.nn.packed_shell import (
    _conv,
    _conv_maybe_custom,
    head_f_out,
    head_from_packed,
    packed_reflect_pad3,
    stem_packed,
)
from raygun_tpu.nn.pallas.instance_norm import instance_norm_act_packed

NGF = 64


def head_keep_packed(xp, w, b):
    """head_from_packed minus the final depth_to_space: returns the
    f x f-packed head output (channel order (py, px, co))."""
    co = w.shape[-1]
    f = head_f_out(co)
    while (2 * xp.shape[1]) % f or (2 * xp.shape[2]) % f:
        f //= 2
    xq = packed_reflect_pad3(xp)
    w2, _, cstr = pack_conv_kernel_io(w, (2, 2), (f, f), (1, 1), (1, 1))
    y = _conv_maybe_custom(xq, w2.astype(xp.dtype), cstr)
    if b is not None:
        y = y + jnp.tile(b, f * f).astype(y.dtype)
    return y, f


def repack(yq, f_in, f_out):
    """f_in-packed -> f_out-packed (f_out | f_in), channels (py, px, c).
    fine = f_in*q + p; p = f_out*o + i -> out cell r*q + o, phase i."""
    B, Hq, Wq, C = yq.shape
    r = f_in // f_out
    c = C // (f_in * f_in)
    y = yq.reshape(B, Hq, Wq, r, f_out, r, f_out, c)
    y = y.transpose(0, 1, 2, 3, 5, 4, 6, 7)
    y = y.reshape(B, Hq, Wq, r * r * f_out * f_out * c)
    return depth_to_space(y, (r, r))


def stem_from_packed(xp2, w, b):
    """Reflect-pad(3) + 7x7 valid stem conv consuming the f=2-packed fine
    image (fine tensor never materializes). packed_reflect_pad3 puts the
    fine origin at -4; the first window starts at fine -3 -> starts=(1,1).
    Output has one overhang cell per axis (sliced off)."""
    Hc, Wc = xp2.shape[1], xp2.shape[2]
    xq = packed_reflect_pad3(xp2)
    w2, _, cstr = pack_conv_kernel_io(w, (2, 2), (2, 2), (1, 1), (1, 1))
    y = _conv(xq, w2.astype(xp2.dtype), cstr)
    y = y[:, :Hc, :Wc, :]
    if b is not None:
        y = y + jnp.tile(b, 4).astype(y.dtype)
    return y


def boundary_fine(hp, w_h, b_h, w_s, b_s):
    y = head_from_packed(hp, w_h, b_h)  # (B, H, W, 1) fine
    y = jnp.tanh(y)
    s = stem_packed(y, w_s, b_s)
    return instance_norm_act_packed(s, NGF)


def boundary_packed(hp, w_h, b_h, w_s, b_s):
    yq, f = head_keep_packed(hp, w_h, b_h)
    yq = jnp.tanh(yq)
    xp2 = repack(yq, f, 2)
    s = stem_from_packed(xp2, w_s, b_s)
    return instance_norm_act_packed(s, NGF)


def parity_check():
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 4)
    B, S = 2, 64
    hp = jax.random.normal(ks[0], (B, S // 2, S // 2, 4 * NGF), jnp.float32)
    w_h = jax.random.normal(ks[1], (7, 7, NGF, 1), jnp.float32) * 0.05
    b_h = jax.random.normal(ks[2], (1,), jnp.float32)
    w_s = jax.random.normal(ks[3], (7, 7, 1, NGF), jnp.float32) * 0.05
    b_s = jnp.zeros((NGF,), jnp.float32)

    def lossA(hp, w_h, w_s):
        y = boundary_fine(hp, w_h, b_h, w_s, b_s)
        return jnp.sum(y * y)

    def lossB(hp, w_h, w_s):
        y = boundary_packed(hp, w_h, b_h, w_s, b_s)
        return jnp.sum(y * y)

    va, ga = jax.value_and_grad(lossA, argnums=(0, 1, 2))(hp, w_h, w_s)
    vb, gb = jax.value_and_grad(lossB, argnums=(0, 1, 2))(hp, w_h, w_s)
    assert np.allclose(float(va), float(vb), rtol=1e-5), (va, vb)
    for a, b_, nm in zip(ga, gb, ("dhp", "dw_h", "dw_s")):
        err = float(jnp.max(jnp.abs(a - b_)) / (jnp.max(jnp.abs(a)) + 1e-30))
        assert err < 1e-4, (nm, err)
    print("parity OK (value + grads, fp32)", flush=True)


def main():
    if jax.devices()[0].platform == "cpu":
        parity_check()
        return

    from _bench_util import bench, measure_overhead

    B, S = 3, 512
    print(f"device: {jax.devices()[0]}  {B}x{S}^2 bf16", flush=True)
    print(f"relay overhead: {measure_overhead()*1e3:.1f} ms", flush=True)
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 5)
    hp = (jax.random.normal(ks[0], (B, S // 2, S // 2, 4 * NGF))
          ).astype(jnp.bfloat16)
    w_h = (jax.random.normal(ks[1], (7, 7, NGF, 1)) * 0.05).astype(jnp.bfloat16)
    b_h = jnp.zeros((1,), jnp.bfloat16)
    w_s = (jax.random.normal(ks[2], (7, 7, 1, NGF)) * 0.05).astype(jnp.bfloat16)
    b_s = jnp.zeros((NGF,), jnp.bfloat16)

    for name, fn in (("A fine boundary", boundary_fine),
                     ("B packed boundary", boundary_packed)):
        def fwd(hp, w_h, w_s, i, fn=fn):
            y = fn(hp * (1.0 + 1e-6 * i.astype(hp.dtype)), w_h, b_h, w_s, b_s)
            yf = y.astype(jnp.float32)
            return jnp.sum(yf * yf)

        def loss(hp, w_h, w_s, fn=fn):
            y = fn(hp, w_h, b_h, w_s, b_s)
            yf = y.astype(jnp.float32)
            return jnp.sum(yf * yf)

        def fwdbwd(hp, w_h, w_s, i):
            hpi = hp * (1.0 + 1e-6 * i.astype(hp.dtype))
            v, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(hpi, w_h, w_s)
            s = v
            for t in jax.tree.leaves(g):
                s = s + jnp.sum(t.astype(jnp.float32) ** 2)
            return s

        tf = bench(fwd, hp, w_h, w_s, n=64)
        tb = bench(fwdbwd, hp, w_h, w_s, n=64)
        print(f"{name:22s} fwd {tf*1e3:6.2f} ms   fwd+bwd {tb*1e3:6.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
