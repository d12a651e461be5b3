"""Microbenchmark: conv+IN composition cost — XLA vs Pallas IN variants.

Finds where the fused-IN win leaks: per-op timings at the resnet-block
shape (3,128,128,256) and shell shape (3,512,512,64), fwd+bwd fully
forced. Tests the act-fused and add-fused variants too, plus a 4D-block
kernel prototype (no reshape) to detect layout-copy overhead.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from raygun_tpu.nn.layers import instance_norm
from raygun_tpu.nn.pallas.instance_norm import (
    instance_norm_fused, instance_norm_act_fused, instance_norm_add_fused,
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
    return _time_compiled(c, args, n)


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
    for (side, ch) in [(128, 256), (512, 64)]:
        x = jax.random.normal(k, (3, side, side, ch), jnp.bfloat16)
        w = jax.random.normal(k, (3, 3, ch, ch), jnp.bfloat16) * 0.05
        print(f"--- shape (3,{side},{side},{ch}) ---")

        def convf(x, w, i):
            return jax.lax.conv_general_dilated(
                x + i.astype(x.dtype) * 1e-6, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def fb(loss):
            def f(w, x, i):
                v, g = jax.value_and_grad(loss)(w, x, i)
                return v + jnp.sum(g.astype(jnp.float32))
            return f

        cases = {
            "conv alone": lambda w, x, i: jnp.sum(
                convf(x, w, i).astype(jnp.float32) ** 2),
            "conv+IN xla": lambda w, x, i: jnp.sum(
                instance_norm(convf(x, w, i), impl="xla").astype(jnp.float32) ** 2),
            "conv+IN pallas": lambda w, x, i: jnp.sum(
                instance_norm_fused(convf(x, w, i)).astype(jnp.float32) ** 2),
            "conv+IN+relu xla": lambda w, x, i: jnp.sum(
                jax.nn.relu(instance_norm(convf(x, w, i), impl="xla")).astype(jnp.float32) ** 2),
            "conv+IN+relu pallas-fused": lambda w, x, i: jnp.sum(
                instance_norm_act_fused(convf(x, w, i), 1e-5, 0.0).astype(jnp.float32) ** 2),
            "conv+IN+add xla": lambda w, x, i: jnp.sum(
                (x + instance_norm(convf(x, w, i), impl="xla")).astype(jnp.float32) ** 2),
            "conv+IN+add pallas-fused": lambda w, x, i: jnp.sum(
                instance_norm_add_fused(convf(x, w, i), x).astype(jnp.float32) ** 2),
        }
        for label, loss in cases.items():
            dt = bench(fb(loss), w, x, n=16)
            print(f"  {label:32s} {dt*1e3:7.2f} ms")
            sys.stdout.flush()

        # IN standalone fwd+bwd
        def in_xla(xx, i):
            v, g = jax.value_and_grad(lambda v: jnp.sum(
                instance_norm(v * (1 + i.astype(v.dtype) * 1e-6), impl="xla"
                              ).astype(jnp.float32) ** 2))(xx)
            return v + jnp.sum(g.astype(jnp.float32))

        def in_pallas(xx, i):
            v, g = jax.value_and_grad(lambda v: jnp.sum(
                instance_norm_fused(v * (1 + i.astype(v.dtype) * 1e-6)
                                    ).astype(jnp.float32) ** 2))(xx)
            return v + jnp.sum(g.astype(jnp.float32))

        print(f"  {'IN alone xla':32s} {bench(in_xla, x, n=16)*1e3:7.2f} ms")
        print(f"  {'IN alone pallas':32s} {bench(in_pallas, x, n=16)*1e3:7.2f} ms")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
