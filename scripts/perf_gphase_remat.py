"""Does remat (jax.checkpoint) over each generator apply cut the G phase's
126 GB/step scheduled traffic? (It trades recompute FLOPs for residual
storage; whether XLA's traffic drops is an empirical question.)"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from raygun_tpu.nn import NLayerDiscriminator, ResNet
from raygun_tpu.systems.cyclegan import gan_loss, smooth_l1

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


def bench(fn, *args, n=4):
    def scanned(*a):
        def body(carry, i):
            return carry + fn(*a, i).astype(jnp.float32), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
        return tot

    c = jax.jit(scanned).lower(*args).compile()
    cost = c.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return (_time_compiled(c, args, n), float(cost.get("flops", 0)),
            float(cost.get("bytes accessed", 0)))


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

    side, batch = 512, 3
    gen = ResNet(ndims=2, input_nc=1, output_nc=1, ngf=64, n_blocks=6,
                 padding_type="same")
    disc = NLayerDiscriminator(ndims=2, input_nc=1, ngf=64, n_layers=3,
                               kw=3, downsampling_kw=2, norm="instance")
    x = jnp.zeros((batch, side, side, 1), jnp.bfloat16)
    gp = jax.jit(lambda: gen.init(jax.random.PRNGKey(0), x[:1], train=False))()["params"]
    dp = jax.jit(lambda: disc.init(jax.random.PRNGKey(1), x[:1], train=False))()["params"]
    params = {"G1": gp, "G2": jax.tree.map(jnp.copy, gp),
              "D1": dp, "D2": jax.tree.map(jnp.copy, dp)}
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)

    def make_gphase(remat):
        apply_g = lambda p, a: gen.apply({"params": p}, a, train=True)
        if remat:
            apply_g = jax.checkpoint(apply_g)

        def g_loss(gP, dP, a, b):
            fake_B = apply_g(gP["G1"], a)
            fake_A = apply_g(gP["G2"], b)
            cyc_A = apply_g(gP["G2"], fake_B)
            cyc_B = apply_g(gP["G1"], fake_A)
            return (10 * smooth_l1(b, cyc_B) + 10 * smooth_l1(a, cyc_A)
                    + gan_loss(disc.apply({"params": jax.lax.stop_gradient(dP["D1"])}, fake_B, train=True), True)
                    + gan_loss(disc.apply({"params": jax.lax.stop_gradient(dP["D2"])}, fake_A, train=True), True))

        def gphase(params, i):
            a = jax.random.uniform(jax.random.fold_in(jax.random.PRNGKey(9), i),
                                   x.shape, jnp.bfloat16) * 2 - 1
            b = jax.random.uniform(jax.random.fold_in(jax.random.PRNGKey(8), i),
                                   x.shape, jnp.bfloat16) * 2 - 1
            gP = {"G1": params["G1"], "G2": params["G2"]}
            dP = {"D1": params["D1"], "D2": params["D2"]}
            l, grads = jax.value_and_grad(g_loss)(gP, dP, a, b)
            return l + sum(jnp.sum(q.astype(jnp.float32))
                           for q in jax.tree.leaves(grads))

        return gphase

    for remat in (False, True):
        dt, fl, by = bench(make_gphase(remat), params, n=4)
        print(f"G phase fwd+bwd remat={remat}: {dt*1e3:8.2f} ms  "
              f"{fl/dt/1e12:5.1f} TF/s ({fl/dt/PEAK*100:4.1f}% MFU)  "
              f"{by/dt/1e9:4.0f} GB/s  [{by/1e9:6.1f} GB accessed]")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
