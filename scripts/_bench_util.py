"""Shared TPU micro-bench harness (CLAUDE.md relay discipline).

The axon relay adds a FIXED ~20-30 ms per execution: a 16-iteration scan
divided out still carries a ~1.5 ms/iter phantom floor that dwarfs
sub-millisecond kernels. measure_overhead() times an empty jit; bench()
scans N>=64 iterations and subtracts the measured overhead.
"""

import time

import jax
import jax.numpy as jnp

_OVERHEAD = None


def measure_overhead() -> float:
    global _OVERHEAD
    if _OVERHEAD is not None:
        return _OVERHEAD
    x0 = jnp.float32(1.5)
    c = jax.jit(lambda v: v * 2 + 1).lower(x0).compile()
    _ = float(c(x0))
    best = 1e9
    for i in range(5):
        t0 = time.perf_counter()
        _ = float(c(x0 + i))
        best = min(best, time.perf_counter() - t0)
    _OVERHEAD = best
    return best


def bench(fn, *args, n=64):
    """Per-iteration seconds of fn(*args, i), relay overhead subtracted.

    fn must make each iteration's work distinct (fold `i` into an operand)
    or the relay/XLA will dedupe it.
    """
    ovh = measure_overhead()

    def scanned(*a):
        def body(carry, i):
            return carry + fn(*a, i), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
        return tot

    c = jax.jit(scanned).lower(*args).compile()
    _ = float(c(*args))
    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(c(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - ovh, 1e-9) / n
