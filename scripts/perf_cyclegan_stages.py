"""Per-stage, per-route cost of the CycleGAN shell at 3x512^2 (fwd+bwd).

Times each shell conv in isolation, comparing the packed/subpixel routes
(ConvNd impl='auto') against the native lowering (impl='native'), plus the
reflect-pad and an IN sandwich — to find where the 37 ms norm-free shell
(9% MFU, perf_cyclegan_shell.py) actually goes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from flax import linen as nn

from raygun_tpu.nn.layers import (
    ConvNd, ConvTransposeNd, instance_norm, pad_spatial,
)

PEAK = 197e12
OVERHEAD = 0.0


def _time_compiled(c, args, n):
    _ = float(c(*args))
    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(c(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - OVERHEAD, 1e-9) / n


def bench(fn, *args, n=16):
    def scanned(*a):
        def body(carry, i):
            return carry + fn(*a, i).astype(jnp.float32), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
        return tot

    c = jax.jit(scanned).lower(*args).compile()
    cost = c.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return _time_compiled(c, args, n), float(cost.get("flops", 0))


def report(label, dt, fl):
    print(f"{label:56s} {dt*1e3:8.2f} ms  {fl/dt/1e12:6.1f} TF/s "
          f"({fl/dt/PEAK*100:5.1f}% MFU)")
    sys.stdout.flush()


def fwdbwd(mod_fn, x, label, n=16):
    class M(nn.Module):
        @nn.compact
        def __call__(self, h):
            return mod_fn(h)

    mod = M()
    p = jax.jit(lambda: mod.init(jax.random.PRNGKey(0), x[:1]))()["params"]
    p = jax.tree.map(lambda q: q.astype(jnp.bfloat16), p)

    def loss(p, xx, i):
        y = mod.apply({"params": p}, xx + i.astype(xx.dtype) * 1e-6)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def step(p, xx, i):
        v, g = jax.value_and_grad(loss)(p, xx, i)
        return v + sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(g))

    dt, fl = bench(step, p, x, n=n)
    report(label, dt, fl)


def main():
    global OVERHEAD
    print(f"device: {jax.devices()[0]}")
    x0 = jnp.float32(1.5)
    c = jax.jit(lambda v: v * 2 + 1).lower(x0).compile()
    _ = float(c(x0))
    best = 1e9
    for i in range(5):
        t0 = time.perf_counter()
        _ = float(c(x0 + i))
        best = min(best, time.perf_counter() - t0)
    OVERHEAD = best
    print(f"relay fixed overhead: {best*1e3:.1f} ms")

    k = jax.random.PRNGKey(0)
    B = 3
    x1 = jax.random.normal(k, (B, 512, 512, 1), jnp.bfloat16)
    x64 = jax.random.normal(k, (B, 512, 512, 64), jnp.bfloat16)
    x128 = jax.random.normal(k, (B, 256, 256, 128), jnp.bfloat16)
    x256 = jax.random.normal(k, (B, 128, 128, 256), jnp.bfloat16)

    # reflect-pad alone (fwd+bwd): how much does the 'same' emulation cost?
    def pad_loss(xx, i):
        y = pad_spatial(xx * (1 + i.astype(xx.dtype) * 1e-6), [(3, 3)] * 2, "reflect")
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def pad_step(xx, i):
        v, g = jax.value_and_grad(pad_loss)(xx, i)
        return v + jnp.sum(g.astype(jnp.float32))

    dt, fl = bench(pad_step, x64, n=16)
    print(f"{'reflect-pad(3) 64ch @512^2 fwd+bwd':56s} {dt*1e3:8.2f} ms")

    # stem 7x7 1->64 @512^2 (input reflect-padded like the model does)
    for impl in ("auto", "native"):
        fwdbwd(
            lambda h, impl=impl: ConvNd(64, (7, 7), padding="valid", impl=impl)(
                pad_spatial(h, [(3, 3)] * 2, "reflect")),
            x1, f"stem 7x7 1->64 @512^2 [{impl}]")

    # head 7x7 64->1 @512^2
    for impl in ("auto", "native"):
        fwdbwd(
            lambda h, impl=impl: ConvNd(1, (7, 7), padding="valid", impl=impl)(
                pad_spatial(h, [(3, 3)] * 2, "reflect")),
            x64, f"head 7x7 64->1 @512^2 [{impl}]")

    # down0 3x3 s2 64->128 @512^2 (pad 1 zeros like updown_p=1)
    for impl in ("auto", "native"):
        fwdbwd(
            lambda h, impl=impl: ConvNd(128, (3, 3), strides=2, padding=1,
                                        impl=impl)(h),
            x64, f"down0 3x3 s2 64->128 @512^2 [{impl}]")

    # down1 3x3 s2 128->256 @256^2
    for impl in ("auto", "native"):
        fwdbwd(
            lambda h, impl=impl: ConvNd(256, (3, 3), strides=2, padding=1,
                                        impl=impl)(h),
            x128, f"down1 3x3 s2 128->256 @256^2 [{impl}]")

    # up0 convT 3x3 s2 256->128 @128^2 (subpixel route vs zero-dilated)
    fwdbwd(lambda h: ConvTransposeNd(128, (3, 3), strides=2, padding=1,
                                     output_padding=1)(h),
           x256, "up0 convT s2 256->128 @128^2 [subpixel]")
    fwdbwd(lambda h: ConvTransposeNd(128, (3, 2), strides=2, padding=0,
                                     output_padding=0)(h),
           x256, "up0-ish convT k(3,2) [lax.conv_transpose]", n=8)

    # up1 convT 3x3 s2 128->64 @256^2
    fwdbwd(lambda h: ConvTransposeNd(64, (3, 3), strides=2, padding=1,
                                     output_padding=1)(h),
           x128, "up1 convT s2 128->64 @256^2 [subpixel]")

    # conv+IN sandwich at 64ch full-res (what the shell pays per norm)
    def in_sandwich(h):
        h = ConvNd(64, (3, 3), padding="valid")(pad_spatial(h, [(1, 1)] * 2, "reflect"))
        return instance_norm(h)

    fwdbwd(in_sandwich, x64, "conv3x3+IN 64->64 @512^2 [auto]")


if __name__ == "__main__":
    main()
