"""Raw Pallas matmul throughput at the resblock kernel's shapes.

[2048, 768] @ [768, 256] bf16->fp32, grid (3, 8) like K1 — vs one XLA
einsum of the identical work. Separates per-cell/per-call overhead from
MXU throughput.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

PEAK = 197e12
N = 16
B, CELLS, M, K, Cout = 3, 8, 2048, 768, 256
FL = 2 * B * CELLS * M * K * Cout * 3  # 3 dots per cell


def bench(fn, *args):
    def scanned(*a):
        def body(carry, i):
            return carry + fn(*a, i), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(N))
        return tot

    c = jax.jit(scanned).lower(*args).compile()
    _ = float(c(*args))
    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(c(*args))
        best = min(best, time.perf_counter() - t0)
    return best / N


def kernel3(a_ref, w_ref, y_ref):
    acc = jnp.zeros((M, Cout), jnp.float32)
    for t in range(3):
        acc = acc + jax.lax.dot_general(
            a_ref[0, 0], w_ref[t], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    y_ref[0, 0] = acc.astype(y_ref.dtype)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    a0 = jax.random.normal(key, (B, CELLS, M, K), jnp.bfloat16)
    w = jax.random.normal(key, (3, K, Cout), jnp.bfloat16) * 0.05

    def pallas3(a0, w, i):
        a = a0 * (1.0 + 1e-6 * i.astype(jnp.bfloat16))
        y = pl.pallas_call(
            kernel3,
            grid=(B, CELLS),
            in_specs=[
                pl.BlockSpec((1, 1, M, K), lambda b, s: (b, s, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, K, Cout), lambda b, s: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, M, Cout),
                                   lambda b, s: (b, s, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, CELLS, M, Cout), jnp.bfloat16),
        )(a.reshape(B, CELLS, M, K), w)
        return jnp.sum(y.astype(jnp.float32))

    def xla3(a0, w, i):
        a = a0 * (1.0 + 1e-6 * i.astype(jnp.bfloat16))
        y = sum(jnp.einsum("bcmk,kn->bcmn", a, w[t],
                           preferred_element_type=jnp.float32)
                for t in range(3))
        return jnp.sum(y)

    for name, fn in [("pallas grid(3,8)", pallas3), ("xla einsum", xla3)]:
        dt = bench(fn, a0, w)
        print(f"{name:18s} {dt*1e3:7.2f} ms  {FL/dt/1e12:6.1f} TF/s "
              f"({FL/dt/PEAK*100:5.1f}% MFU)", flush=True)


if __name__ == "__main__":
    main()
