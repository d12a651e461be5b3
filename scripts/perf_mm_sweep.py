"""MXU throughput sweep: which (M, K, N) geometries does v5e like?

All bf16 inputs, fp32-preferred accumulation, scan-amortized, input
perturbation (not RNG) per iteration.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

PEAK = 197e12
N_IT = 16


def bench(fn, *args):
    def scanned(*a):
        def body(carry, i):
            return carry + fn(*a, i), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(N_IT))
        return tot

    c = jax.jit(scanned).lower(*args).compile()
    _ = float(c(*args))
    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(c(*args))
        best = min(best, time.perf_counter() - t0)
    return best / N_IT


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    shapes = [
        (2048, 768, 256, 24),    # resblock K1 per-cell dot x 24 cells
        (2048, 768, 512, 24),
        (2048, 768, 1024, 12),
        (4096, 768, 256, 12),
        (16384, 768, 256, 3),
        (49152, 768, 256, 1),
        (2048, 256, 256, 72),    # 9-tap shape
        (8192, 1024, 1024, 4),   # big square-ish reference
        (16384, 2304, 256, 3),   # whole-conv-as-one-GEMM (9 taps stacked)
    ]
    for (M, K, N, G) in shapes:
        a0 = jax.random.normal(key, (G, M, K), jnp.bfloat16)
        w = jax.random.normal(key, (K, N), jnp.bfloat16) * 0.05
        fl = 2 * G * M * K * N

        def fn(a0, w, i):
            # perturb the small operand: distinct per iteration without
            # streaming the 75 MB activation an extra time
            wi = w * (1.0 + 1e-6 * i.astype(jnp.bfloat16))
            y = jnp.einsum("gmk,kn->gmn", a0, wi,
                           preferred_element_type=jnp.float32)
            return jnp.sum(y)

        dt = bench(fn, a0, w)
        print(f"[{M:6d},{K:5d},{N:5d}] x{G:3d}  {dt*1e3:7.2f} ms "
              f"{fl/dt/1e12:6.1f} TF/s ({fl/dt/PEAK*100:5.1f}% MFU)",
              flush=True)


if __name__ == "__main__":
    main()
