"""Map v5e GEMM efficiency vs (K, N) at large M — informs conv kernel design.

bf16 inputs; output dtype varied. Weight perturbed per iteration.
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
M = 16384


from _bench_util import bench as _bench


def bench(fn, *args):
    return _bench(fn, *args, n=64)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    cases = []
    for K in (256, 768, 2304):
        for N in (256, 512, 1024, 2048):
            cases.append((K, N, jnp.float32))
    cases.append((768, 256, jnp.bfloat16))
    cases.append((2304, 256, jnp.bfloat16))
    cases.append((4096, 4096, jnp.float32))

    for (K, N, od) in cases:
        a0 = jax.random.normal(key, (M, K), jnp.bfloat16)
        w = jax.random.normal(key, (K, N), jnp.bfloat16) * 0.05
        fl = 2 * M * K * N

        def fn(a0, w, i):
            wi = w * (1.0 + 1e-6 * i.astype(jnp.bfloat16))
            y = jax.lax.dot_general(a0, wi, (((1,), (0,)), ((), ())),
                                    preferred_element_type=od)
            # nonlinear checksum: sum(A@W) gets algebraically rewritten
            # to colsum(A)@W, skipping the GEMM — sum of squares cannot
            yf = y.astype(jnp.float32)
            return jnp.sum(yf * yf)

        dt = bench(fn, a0, w)
        print(f"K={K:5d} N={N:5d} out={od.__name__:8s} {dt*1e3:7.2f} ms "
              f"{fl/dt/1e12:6.1f} TF/s ({fl/dt/PEAK*100:5.1f}% MFU)",
              flush=True)


if __name__ == "__main__":
    main()
