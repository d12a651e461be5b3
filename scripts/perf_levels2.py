"""Per-stage budget for the MTLSD forward AFTER fused-up/zdecomp routing,
at a given input block size (default 324)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from raygun_tpu.nn.unet import ConvPass, FusedUpConvPass
from raygun_tpu.nn.layers import max_pool_nd

N_SCAN = 8


def bench(fn, *args):
    def scanned(*a):
        def body(carry, i):
            xx = jax.tree.map(lambda t: t + i.astype(t.dtype) * 1e-6, a[-1])
            out = fn(*a[:-1], xx)
            return carry + jnp.sum(out.astype(jnp.float32)), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(N_SCAN))
        return tot
    c = jax.jit(scanned).lower(*args).compile()
    _ = float(c(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(c(*args))
        best = min(best, (time.perf_counter() - t0) / N_SCAN)
    return best


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 324
    k = jax.random.PRNGKey(0)
    # encoder shapes at input S (valid, 2x k3 convs per level, pool /2)
    e0 = S          # enc_L0 in
    e1 = (e0 - 4) // 2
    e2 = (e1 - 4) // 2
    e3 = (e2 - 4) // 2
    b_out = e3 - 4  # bottleneck convpass out
    chans = [1, 12, 72, 432, 2592]

    total = 0.0
    # encoder stages
    for lvl, (s_in, ci, co) in enumerate(
        [(e0, 1, 12), (e1, 12, 72), (e2, 72, 432), (e3, 432, 2592)]
    ):
        x = jax.random.uniform(k, (1, s_in, s_in, s_in, ci), jnp.bfloat16)
        cp = ConvPass(output_nc=co, kernel_sizes=[(3, 3, 3)] * 2)
        params = jax.jit(lambda xx: cp.init(jax.random.PRNGKey(1), xx))(x)["params"]
        params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
        dt = bench(lambda p, xx: cp.apply({"params": p}, xx), params, x)
        total += dt
        gflop = 2 * 27 * (ci * co + co * co) * (s_in - 2) ** 3 / 1e9  # approx
        print(f"enc_L{lvl} in {s_in}^3 x{ci}->x{co}: {dt*1e3:7.2f} ms "
              f"(~{gflop/dt/1e3:5.1f} TF/s logical)")
        sys.stdout.flush()

    # decoder fused stages: (f_spatial, cf, g_spatial, cg, co)
    d_specs = [
        ("dec_L2", e2 - 4, 432, b_out, 2592, 432),
        ("dec_L1", e1 - 4, 72, None, 432, 72),
        ("dec_L0", e0 - 4, 12, None, 72, 12),
    ]
    g_sp = b_out
    for name, f_sp, cf, _, cg, co in d_specs:
        fl = jax.random.uniform(k, (1, f_sp, f_sp, f_sp, cf), jnp.bfloat16)
        g = jax.random.uniform(k, (1, g_sp, g_sp, g_sp, cg), jnp.bfloat16)
        fp = FusedUpConvPass(
            output_nc=co, kernel_sizes=[(3, 3, 3)] * 2,
            scale_factor=(2, 2, 2), crop_factor=(2, 2, 2),
        )
        params = jax.jit(lambda a, bb: fp.init(jax.random.PRNGKey(1), a, bb))(fl, g)["params"]
        params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
        dt = bench(lambda p, pair: fp.apply({"params": p}, *pair), params, (fl, g))
        total += dt
        print(f"{name} f {f_sp}^3 x{cf} + g {g_sp}^3 x{cg} -> x{co}: {dt*1e3:7.2f} ms")
        sys.stdout.flush()
        # next g spatial = this stage's output extent
        full_up = 2 * g_sp
        tgt = full_up if (full_up - 4) % 2 == 0 else full_up - 1
        # crop_to_factor with factor 2, convs 2x3: target = 2*floor((fu-4)/2)+4
        tgt = 2 * ((full_up - 4) // 2) + 4
        g_sp = tgt - 4

    print(f"sum of stages: {total*1e3:.1f} ms")


if __name__ == "__main__":
    main()
