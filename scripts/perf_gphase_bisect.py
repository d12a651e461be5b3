"""Where does the G phase's composition tax come from?

perf_step_decompose.py: G fwd+bwd = 350 ms but the per-op sum is only
~150-180 ms. Bisect: one G apply fwd+bwd in isolation, four INDEPENDENT
applies in one jit, the real chained cycle loss, and the cycle loss with
the second-leg applies rematerialized. All bf16 3x512^2, scan-amortized,
full-grad checksums (CLAUDE.md relay discipline).
"""

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


def bench(fn, *args, n=8):
    def scanned(*a):
        def body(carry, i):
            return carry + fn(*a, i).astype(jnp.float32), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
        return tot

    c = jax.jit(scanned).lower(*args).compile()
    cost = c.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    fl = float(cost.get("flops", 0.0))
    by = float(cost.get("bytes accessed", 0.0))
    _ = float(c(*args))
    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(c(*args))
        best = min(best, time.perf_counter() - t0)
    return best / n, fl, by


def report(label, dt, fl, by):
    print(f"{label:44s} {dt*1e3:8.2f} ms  {fl/dt/1e12:6.1f} TF/s "
          f"({fl/dt/PEAK*100:5.1f}% MFU) [{fl/1e9:7.1f} GF, {by/1e6:8.0f} MB]",
          flush=True)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    side, batch = 512, 3
    gen = ResNet(ndims=2, input_nc=1, output_nc=1, ngf=64, n_blocks=6,
                 padding_type="same")
    disc = NLayerDiscriminator(ndims=2, input_nc=1, ngf=64, n_layers=3,
                               kw=3, downsampling_kw=2, norm="instance")
    x = jnp.zeros((batch, side, side, 1), jnp.bfloat16)
    gp = jax.jit(lambda: gen.init(jax.random.PRNGKey(0), x[:1], train=False))()["params"]
    dp = jax.jit(lambda: disc.init(jax.random.PRNGKey(1), x[:1], train=False))()["params"]
    gp = jax.tree.map(lambda p: p.astype(jnp.bfloat16), gp)
    dp = jax.tree.map(lambda p: p.astype(jnp.bfloat16), dp)
    g2 = jax.tree.map(jnp.copy, gp)

    def mk(key):
        return jax.random.uniform(key, x.shape, jnp.bfloat16) * 2 - 1

    def gsum(t):
        return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(t))

    # 1. one G apply fwd+bwd
    def one_apply(gp, i):
        a = mk(jax.random.fold_in(jax.random.PRNGKey(9), i))
        def loss(p):
            y = gen.apply({"params": p}, a, train=True)
            return jnp.sum(y.astype(jnp.float32))
        l, g = jax.value_and_grad(loss)(gp)
        return l + gsum(g)

    report("one G apply fwd+bwd", *bench(one_apply, gp))

    # 2. one G apply fwd only
    def one_fwd(gp, i):
        a = mk(jax.random.fold_in(jax.random.PRNGKey(9), i))
        y = gen.apply({"params": gp}, a, train=True)
        return jnp.sum(y.astype(jnp.float32))

    report("one G apply fwd", *bench(one_fwd, gp))

    # 3. four INDEPENDENT applies fwd+bwd in one jit
    def four_indep(gp, i):
        def loss(p):
            tot = jnp.float32(0)
            for j in range(4):
                a = mk(jax.random.fold_in(jax.random.PRNGKey(9), i * 4 + j))
                y = gen.apply({"params": p}, a, train=True)
                tot += jnp.sum(y.astype(jnp.float32))
            return tot
        l, g = jax.value_and_grad(loss)(gp)
        return l + gsum(g)

    report("4 independent applies fwd+bwd", *bench(four_indep, gp))

    # 4. chained pair (cycle): G2(G1(a)) fwd+bwd
    def chained(gps, i):
        a = mk(jax.random.fold_in(jax.random.PRNGKey(9), i))
        def loss(ps):
            p1, p2 = ps
            fake = gen.apply({"params": p1}, a, train=True)
            cyc = gen.apply({"params": p2}, fake, train=True)
            return 10 * smooth_l1(a, cyc)
        l, g = jax.value_and_grad(loss)((gps[0], gps[1]))
        return l + gsum(g)

    report("chained cycle pair fwd+bwd", *bench(chained, (gp, g2)))

    # 5. chained pair with remat on the second apply
    def chained_remat(gps, i):
        a = mk(jax.random.fold_in(jax.random.PRNGKey(9), i))
        def loss(ps):
            p1, p2 = ps
            fake = gen.apply({"params": p1}, a, train=True)
            cyc = jax.checkpoint(
                lambda p, v: gen.apply({"params": p}, v, train=True)
            )(p2, fake)
            return 10 * smooth_l1(a, cyc)
        l, g = jax.value_and_grad(loss)((gps[0], gps[1]))
        return l + gsum(g)

    report("chained pair, remat 2nd apply", *bench(chained_remat, (gp, g2)))

    # 6. full g_loss (both cycles + 2 D applies)
    def full_g(ps, i):
        a = mk(jax.random.fold_in(jax.random.PRNGKey(9), i))
        b = mk(jax.random.fold_in(jax.random.PRNGKey(7), i))
        def loss(gP):
            fB = gen.apply({"params": gP[0]}, a, train=True)
            fA = gen.apply({"params": gP[1]}, b, train=True)
            cA = gen.apply({"params": gP[1]}, fB, train=True)
            cB = gen.apply({"params": gP[0]}, fA, train=True)
            return (10 * smooth_l1(b, cB) + 10 * smooth_l1(a, cA)
                    + gan_loss(disc.apply({"params": jax.lax.stop_gradient(dp)}, fB, train=True), True)
                    + gan_loss(disc.apply({"params": jax.lax.stop_gradient(dp)}, fA, train=True), True))
        l, g = jax.value_and_grad(loss)((gp, g2))
        return l + gsum(g)

    report("full g_loss fwd+bwd", *bench(full_g, (gp, g2)))


if __name__ == "__main__":
    main()
