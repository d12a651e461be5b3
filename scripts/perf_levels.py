"""Per-level time budget for the MTLSD forward at a given block size.

Times each encoder/decoder ConvPass standalone at the shapes it sees inside
the 260^3 forward, so kernel work can be aimed at the real hot spots.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


N_SCAN = 8


def timeit(fn, *args, n=3):
    """Time fn via a device-side scan with a scalar checksum fetch (the axon
    relay neither executes on block_until_ready nor re-runs deduped requests;
    the scan varies inputs by folding the iteration index into the first arg)."""
    import jax
    import jax.numpy as jnp

    def scanned(*a):
        def body(carry, i):
            first = a[-1] + carry.astype(a[-1].dtype) * 0 + i.astype(a[-1].dtype) * 1e-6
            out = fn(*a[:-1], first)
            return carry + jnp.sum(out.astype(jnp.float32)), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(N_SCAN))
        return tot

    c = jax.jit(scanned).lower(*args).compile()
    cost = c.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))  # scan body counted once
    _ = float(c(*args))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        s = float(c(*args))
        best = min(best, (time.perf_counter() - t0) / N_SCAN)
    return best, flops


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    from raygun_tpu.nn.unet import ConvPass
    from raygun_tpu.nn.layers import nearest_upsample, max_pool_nd

    k = jax.random.PRNGKey(0)

    # (name, in_spatial, cin, cout)  — 260^3 forward shapes
    stages = [
        ("enc_L0", 260, 1, 12),
        ("enc_L1", 124, 12, 72),
        ("enc_L2", 58, 72, 432),
        ("enc_L3", 29, 432, 2592),
        ("dec_L2", 50, 3024, 432),
        ("dec_L1", 92, 504, 72),
        ("dec_L0", 176, 84, 12),
    ]
    total = 0.0
    for name, s, cin, cout in stages:
        x = jax.random.uniform(k, (1, s, s, s, cin), jnp.bfloat16)
        cp = ConvPass(output_nc=cout, kernel_sizes=[(3, 3, 3), (3, 3, 3)])
        params = jax.jit(lambda x: cp.init(jax.random.PRNGKey(1), x))(x)["params"]
        params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
        dt, flops = timeit(lambda p, x: cp.apply({"params": p}, x), params, x)
        total += dt
        print(f"{name}: in {s}^3 x{cin} -> x{cout}: {dt*1e3:7.2f} ms, "
              f"{flops/1e9:8.1f} GFLOP, {flops/dt/1e12:6.1f} TFLOP/s "
              f"({flops/dt/197e12*100:4.1f}% MFU)")
        sys.stdout.flush()

    # auxiliary ops
    x = jax.random.uniform(k, (1, 256, 256, 256, 12), jnp.bfloat16)
    dt, _ = timeit(lambda x: max_pool_nd(x, (2, 2, 2)), x)
    print(f"maxpool 256^3 x12: {dt*1e3:.2f} ms")
    g = jax.random.uniform(k, (1, 88, 88, 88, 72), jnp.bfloat16)
    dt, _ = timeit(lambda g: nearest_upsample(g, (2, 2, 2)), g)
    print(f"nearest_up 88->176 x72: {dt*1e3:.2f} ms")
    print(f"sum of stages: {total*1e3:.1f} ms")


if __name__ == "__main__":
    main()
