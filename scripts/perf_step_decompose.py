"""Decompose the ACTUAL 3-phase CycleGAN train step at 3x512^2:
G-phase (4 G applies + 2 D applies, fwd+bwd), D-phase (4 D applies
fwd+bwd), optimizer updates — wall time and XLA-counted flops/bytes per
phase. This is the roofline table for docs/PERFORMANCE.md."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

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
    fl = float(cost.get("flops", 0))
    by = float(cost.get("bytes accessed", 0))
    return _time_compiled(c, args, n), fl, by


def report(label, dt, fl, by):
    print(f"{label:40s} {dt*1e3:8.2f} ms  {fl/dt/1e12:6.1f} TF/s "
          f"({fl/dt/PEAK*100:5.1f}% MFU)  {by/dt/1e9:6.0f} GB/s "
          f"[{fl/1e9:6.1f} GF, {by/1e6:7.0f} MB]")
    sys.stdout.flush()


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

    def g_loss(gP, dP, a, b):
        fake_B = gen.apply({"params": gP["G1"]}, a, train=True)
        fake_A = gen.apply({"params": gP["G2"]}, b, train=True)
        cyc_A = gen.apply({"params": gP["G2"]}, fake_B, train=True)
        cyc_B = gen.apply({"params": gP["G1"]}, fake_A, train=True)
        l = (10 * smooth_l1(b, cyc_B) + 10 * smooth_l1(a, cyc_A)
             + gan_loss(disc.apply({"params": jax.lax.stop_gradient(dP["D1"])}, fake_B, train=True), True)
             + gan_loss(disc.apply({"params": jax.lax.stop_gradient(dP["D2"])}, fake_A, train=True), True))
        return l, (fake_B, fake_A)

    def d_loss(dP, a, b, fake_A, fake_B):
        return (
            gan_loss(disc.apply({"params": dP["D1"]}, b, train=True), True)
            + gan_loss(disc.apply({"params": dP["D1"]}, jax.lax.stop_gradient(fake_B), train=True), False)
            + gan_loss(disc.apply({"params": dP["D2"]}, a, train=True), True)
            + gan_loss(disc.apply({"params": dP["D2"]}, jax.lax.stop_gradient(fake_A), train=True), False)
        )

    def mk_ab(key):
        a = jax.random.uniform(key, x.shape, jnp.bfloat16) * 2 - 1
        b = jax.random.uniform(jax.random.fold_in(key, 1), x.shape, jnp.bfloat16) * 2 - 1
        return a, b

    def gsum(t):
        return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(t))

    # G phase fwd only
    def gphase_fwd(params, i):
        a, b = mk_ab(jax.random.fold_in(jax.random.PRNGKey(9), i))
        gP = {"G1": params["G1"], "G2": params["G2"]}
        dP = {"D1": params["D1"], "D2": params["D2"]}
        (l, (fB, fA)) = g_loss(gP, dP, a, b)
        return l + jnp.sum(fB.astype(jnp.float32)[:, :4, :4])

    dt, fl, by = bench(gphase_fwd, params, n=8)
    report("G phase fwd (4G + 2D applies)", dt, fl, by)

    # G phase fwd+bwd
    def gphase(params, i):
        a, b = mk_ab(jax.random.fold_in(jax.random.PRNGKey(9), i))
        gP = {"G1": params["G1"], "G2": params["G2"]}
        dP = {"D1": params["D1"], "D2": params["D2"]}
        (l, _), grads = jax.value_and_grad(g_loss, has_aux=True)(gP, dP, a, b)
        return l + gsum(grads)

    dt, fl, by = bench(gphase, params, n=8)
    report("G phase fwd+bwd", dt, fl, by)

    # D phase fwd+bwd (fakes precomputed, stop-grad)
    def dphase(params, i):
        a, b = mk_ab(jax.random.fold_in(jax.random.PRNGKey(9), i))
        gP = {"G1": params["G1"], "G2": params["G2"]}
        dP = {"D1": params["D1"], "D2": params["D2"]}
        _, (fB, fA) = g_loss(gP, dP, a, b)
        fB, fA = jax.lax.stop_gradient((fB, fA))
        dl, grads = jax.value_and_grad(d_loss)(dP, a, b, fA, fB)
        return dl + gsum(grads)

    dt, fl, by = bench(dphase, params, n=4)
    report("D phase fwd+bwd (incl 4G fwd recompute)", dt, fl, by)

    # D-only fwd+bwd on static fakes
    def donly(params, i):
        a, b = mk_ab(jax.random.fold_in(jax.random.PRNGKey(9), i))
        dP = {"D1": params["D1"], "D2": params["D2"]}
        dl, grads = jax.value_and_grad(d_loss)(dP, a, b, a, b)
        return dl + gsum(grads)

    dt, fl, by = bench(donly, params, n=8)
    report("D phase fwd+bwd (static fakes)", dt, fl, by)

    # single D apply fwd+bwd
    def d1(params, i):
        a, _ = mk_ab(jax.random.fold_in(jax.random.PRNGKey(9), i))
        dP = params["D1"]
        dl, grads = jax.value_and_grad(
            lambda p: gan_loss(disc.apply({"params": p}, a, train=True), True)
        )(dP)
        return dl + gsum(grads)

    dt, fl, by = bench(d1, params, n=8)
    report("one D apply fwd+bwd", dt, fl, by)

    import bench as benchmod

    for s in (256, 512):
        sps, mfu = benchmod._cyclegan_steps_per_sec(jax, side=s)
        print(f"CycleGAN step @3x{s}^2: {sps:.2f} steps/s = {mfu*100:.1f}% MFU")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
