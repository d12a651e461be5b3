"""Fused Pallas resblock vs the unfused ResnetBlock route on TPU.

Production shape (3, 128, 128, 256) bf16 (the CycleGAN generator's 6
blocks at 3x512^2). Scan-amortized, full checksums incl. grads.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from raygun_tpu.nn.resnet import ResnetBlock
from raygun_tpu.nn.pallas.resblock import resblock_fused

PEAK = 197e12
N = 16


from _bench_util import bench as _bench


def bench(fn, *args):
    return _bench(fn, *args, n=64)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    B, H, W, C = 3, 128, 128, 256
    flops_fwd = 2 * 2 * 9 * C * C * H * W * B

    key = jax.random.PRNGKey(0)
    blk = ResnetBlock(dim=C, ndims=2, padding_type="same", norm="instance")
    x0 = jnp.zeros((B, H, W, C), jnp.bfloat16)
    p = jax.jit(lambda: blk.init(key, x0[:1]))()["params"]
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
    w1, b1 = p["conv1"]["kernel"], p["conv1"]["bias"]
    w2, b2 = p["conv2"]["kernel"], p["conv2"]["bias"]

    base = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)

    def mk(i):
        # distinct per iteration (relay dedupe) without paying ~1 ms of
        # on-device RNG per step: scale the pre-generated buffer
        return base * (1.0 + 1e-6 * i.astype(jnp.bfloat16))

    # parity spot check on hardware
    xs = mk(jnp.int32(0))
    a = blk.apply({"params": p}, xs, train=True).astype(jnp.float32)
    b = resblock_fused(xs, w1, b1, w2, b2).astype(jnp.float32)
    d = float(jnp.max(jnp.abs(a - b)))
    print(f"fwd max|diff| on hw: {d:.4f} (bf16 tolerances)", flush=True)

    def f_unfused(p, i):
        y = blk.apply({"params": p}, mk(i), train=True)
        return jnp.sum(y.astype(jnp.float32))

    def f_fused(args, i):
        w1, b1, w2, b2 = args
        y = resblock_fused(mk(i), w1, b1, w2, b2)
        return jnp.sum(y.astype(jnp.float32))

    def gsum(t):
        return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(t))

    def g_unfused(p, i):
        def loss(p, x):
            return jnp.sum(
                blk.apply({"params": p}, x, train=True).astype(jnp.float32))
        x = mk(i)
        l, g = jax.value_and_grad(loss, argnums=(0, 1))(p, x)
        return l + gsum(g)

    def g_fused(args, i):
        def loss(a, x):
            return jnp.sum(resblock_fused(x, *a).astype(jnp.float32))
        x = mk(i)
        l, g = jax.value_and_grad(loss, argnums=(0, 1))((w1, b1, w2, b2), x)
        return l + gsum(g)

    for name, fn, args, mult, disable in [
        ("unfused fwd", f_unfused, (p,), 1, True),
        ("fused   fwd", f_fused, ((w1, b1, w2, b2),), 1, False),
        ("unfused fwd+bwd", g_unfused, (p,), 3, True),
        ("fused   fwd+bwd", g_fused, ((w1, b1, w2, b2),), 3, False),
    ]:
        # ResnetBlock itself routes to the fused kernel on TPU; pin the
        # unfused baseline via the escape hatch (read at trace time)
        if disable:
            os.environ["RAYGUN_DISABLE_PALLAS_RESBLOCK"] = "1"
        else:
            os.environ.pop("RAYGUN_DISABLE_PALLAS_RESBLOCK", None)
        dt = bench(fn, *args)
        fl = flops_fwd * mult
        print(f"{name:18s} {dt*1e3:7.2f} ms  {fl/dt/1e12:6.1f} TF/s "
              f"({fl/dt/PEAK*100:5.1f}% MFU)", flush=True)


if __name__ == "__main__":
    main()
