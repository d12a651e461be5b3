"""Folded (2^3 kernel) coarse convs + mid-size convs: native 3D vs z-decomposed."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from raygun_tpu.nn.layers import conv_nd, conv3d_zdecomp

N_SCAN = 8


def bench(fn, W, x):
    def scanned(W, x):
        def body(carry, i):
            xx = x + i.astype(x.dtype) * 1e-6
            out = fn(xx, W)
            return carry + jnp.sum(out.astype(jnp.float32)), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(N_SCAN))
        return tot
    c = jax.jit(scanned).lower(W, x).compile()
    _ = float(c(W, x))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(c(W, x))
        best = min(best, (time.perf_counter() - t0) / N_SCAN)
    return best


def main():
    k = jax.random.PRNGKey(0)
    # (name, spatial, kernel, cin, cout) at 388^3-block shapes
    cases = [
        ("enc_L3 conv1", 45, 3, 432, 2592),
        ("enc_L3 conv2", 43, 3, 2592, 2592),
        ("enc_L2 conv1", 92, 3, 72, 432),
        ("dec_L0 conv2", 290, 3, 12, 12),
    ]
    for name, s, kk, ci, co in cases:
        x = jax.random.uniform(k, (1, s, s, s, ci), jnp.bfloat16)
        W = (jax.random.normal(k, (kk, kk, kk, ci, co), jnp.float32) * 0.05
             ).astype(jnp.bfloat16)
        tn = bench(lambda xx, w: conv_nd(xx, w), W, x)
        tz = bench(lambda xx, w: conv3d_zdecomp(xx, w), W, x)
        gflop = 2 * kk**3 * ci * co * (s - kk + 1) ** 3 / 1e9
        print(f"{name} {ci}->{co} k{kk} @{s}^3: native {tn*1e3:7.2f} ms "
              f"({gflop/tn/1e3:5.1f} TF/s) | zdecomp {tz*1e3:7.2f} ms "
              f"({gflop/tz/1e3:5.1f} TF/s)")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
