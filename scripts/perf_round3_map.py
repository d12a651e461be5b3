"""Millisecond map of the production CycleGAN step (3x512^2 bf16) at HEAD.

Splits the step into: full step / G phase (loss+grad+adam) / G phase without
the GAN terms (no D applies) / D phase / isolated D applies — to locate the
remaining gap to the 40% MFU target (BASELINE.json). Mirrors bench.py's
structures exactly (same nets, same batched sibling applies, same scan
methodology; relay discipline per CLAUDE.md).
"""

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
SIDE = int(os.environ.get("SIDE", "512"))
BATCH = 3
N = 8


def _timeit(c, args):
    _ = float(c(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(c(*args))
        best = min(best, time.perf_counter() - t0)
    return best / N


def report(name, fn, *args):
    # optional XLA compiler-option A/B: XLA_OPTS='{"flag": "value", ...}'
    opts = os.environ.get("XLA_OPTS")
    copts = __import__("json").loads(opts) if opts else None
    c = jax.jit(fn).lower(*args).compile(compiler_options=copts)
    cost = c.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    fl = float(cost.get("flops", 0.0))
    dt = _timeit(c, args)
    print(f"{name:34s} {dt*1e3:8.2f} ms  {fl/dt/1e12:6.1f} TF/s "
          f"({fl/1e9:7.1f} GF, {100*fl/dt/PEAK:5.1f}% MFU)", flush=True)
    return dt


def main():
    print(f"device: {jax.devices()[0]}  side={SIDE}", flush=True)
    gen = ResNet(ndims=2, input_nc=1, output_nc=1, ngf=64, n_blocks=6,
                 padding_type="same")
    disc = NLayerDiscriminator(ndims=2, input_nc=1, ngf=64, n_layers=3,
                               kw=3, downsampling_kw=2, norm="instance")
    x = jnp.zeros((BATCH, SIDE, SIDE, 1), jnp.bfloat16)
    gp = jax.jit(lambda: gen.init(jax.random.PRNGKey(0), x[:1], train=False))()["params"]
    dp = jax.jit(lambda: disc.init(jax.random.PRNGKey(1), x[:1], train=False))()["params"]
    params = {
        "G1": gp, "G2": jax.tree.map(jnp.copy, gp),
        "D1": dp, "D2": jax.tree.map(jnp.copy, dp),
    }
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    g_tx, d_tx = optax.adam(1e-5), optax.adam(1e-5)
    opt = {"G": g_tx.init({"G1": params["G1"], "G2": params["G2"]}),
           "D": d_tx.init({"D1": params["D1"], "D2": params["D2"]})}

    def g_loss(gP, dP, a, b, with_gan=True):
        fake_B = gen.apply({"params": gP["G1"]}, a, train=True)
        both = gen.apply({"params": gP["G2"]},
                         jnp.concatenate([b, fake_B], axis=0), train=True)
        fake_A, cyc_A = jnp.split(both, 2, axis=0)
        cyc_B = gen.apply({"params": gP["G1"]}, fake_A, train=True)
        l = 10 * smooth_l1(b, cyc_B) + 10 * smooth_l1(a, cyc_A)
        if with_gan:
            l = (l + gan_loss(disc.apply(
                    {"params": jax.lax.stop_gradient(dP["D1"])}, fake_B,
                    train=True), True)
                 + gan_loss(disc.apply(
                    {"params": jax.lax.stop_gradient(dP["D2"])}, fake_A,
                    train=True), True))
        return l, (fake_B, fake_A)

    def d_loss(dP, a, b, fake_A, fake_B):
        n = b.shape[0]
        p1 = disc.apply({"params": dP["D1"]}, jnp.concatenate(
            [b, jax.lax.stop_gradient(fake_B)], axis=0), train=True)
        p2 = disc.apply({"params": dP["D2"]}, jnp.concatenate(
            [a, jax.lax.stop_gradient(fake_A)], axis=0), train=True)
        return (gan_loss(p1[:n], True) + gan_loss(p1[n:], False)
                + gan_loss(p2[:n], True) + gan_loss(p2[n:], False))

    def rand_ab(k):
        a = jax.random.uniform(k, x.shape, jnp.bfloat16) * 2 - 1
        b = jax.random.uniform(jax.random.fold_in(k, 1), x.shape,
                               jnp.bfloat16) * 2 - 1
        return a, b

    # ---- G phase (loss+grad+adam), with and without the GAN terms --------
    def make_gphase(with_gan):
        def run(params, opt, key):
            def body(carry, k):
                p, o = carry
                a, b = rand_ab(k)
                gP = {"G1": p["G1"], "G2": p["G2"]}
                dP = {"D1": p["D1"], "D2": p["D2"]}
                (gl, _), g_grads = jax.value_and_grad(
                    g_loss, has_aux=True)(gP, dP, a, b, with_gan)
                gupd, go = g_tx.update(g_grads, o["G"], gP)
                gP = optax.apply_updates(gP, gupd)
                return ({**gP, **dP}, {**o, "G": go}), gl
            (p, o), losses = jax.lax.scan(
                body, (params, opt), jax.random.split(key, N))
            return jnp.sum(losses)
        return run

    # ---- D phase (loss+grad+adam) on fresh random fakes ------------------
    def dphase(params, opt, key):
        def body(carry, k):
            p, o = carry
            a, b = rand_ab(k)
            fa, fb = rand_ab(jax.random.fold_in(k, 7))
            dP = {"D1": p["D1"], "D2": p["D2"]}
            dl, d_grads = jax.value_and_grad(d_loss)(dP, a, b, fa, fb)
            dupd, do = d_tx.update(d_grads, o["D"], dP)
            dP = optax.apply_updates(dP, dupd)
            return ({**p, **dP}, {**o, "D": do}), dl
        (p, o), losses = jax.lax.scan(
            body, (params, opt), jax.random.split(key, N))
        return jnp.sum(losses)

    # ---- isolated D applies ----------------------------------------------
    def d_fwdbwd_params(params, key):
        """One D apply at batch 2*BATCH, grad wrt D params (D-phase unit)."""
        def body(carry, k):
            a, b = rand_ab(k)
            xx = jnp.concatenate([a, b], axis=0)
            def l(dp):
                pr = disc.apply({"params": dp}, xx, train=True)
                return gan_loss(pr[:BATCH], True) + gan_loss(pr[BATCH:], False)
            v, g = jax.value_and_grad(l)(params["D1"])
            cks = sum(jnp.sum(t.astype(jnp.float32) ** 2)
                      for t in jax.tree.leaves(g))
            return carry + v + cks, None
        tot, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, N))
        return tot

    def d_fwdbwd_input(params, key):
        """One D apply at batch BATCH, grad wrt the INPUT (G-phase unit)."""
        def body(carry, k):
            a, _ = rand_ab(k)
            def l(xx):
                return gan_loss(disc.apply(
                    {"params": params["D1"]}, xx, train=True), True)
            v, g = jax.value_and_grad(l)(a)
            return carry + v + jnp.sum(g.astype(jnp.float32) ** 2), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, N))
        return tot

    # ---- full step (bench.py's) ------------------------------------------
    def step(params, opt, key):
        a, b = rand_ab(key)
        gP = {"G1": params["G1"], "G2": params["G2"]}
        dP = {"D1": params["D1"], "D2": params["D2"]}
        (gl, (fake_B, fake_A)), g_grads = jax.value_and_grad(
            g_loss, has_aux=True)(gP, dP, a, b)
        gupd, gos = g_tx.update(g_grads, opt["G"], gP)
        gP = optax.apply_updates(gP, gupd)
        dl, d_grads = jax.value_and_grad(d_loss)(dP, a, b, fake_A, fake_B)
        dupd, dos = d_tx.update(d_grads, opt["D"], dP)
        dP = optax.apply_updates(dP, dupd)
        return {**gP, **dP}, {"G": gos, "D": dos}, gl + dl

    def full(params, opt, key):
        def body(carry, k):
            p, o = carry
            p, o, loss = step(p, o, k)
            return (p, o), loss
        (p, o), losses = jax.lax.scan(
            body, (params, opt), jax.random.split(key, N))
        return jnp.sum(losses)

    k = jax.random.PRNGKey(3)
    t_full = report("full step", full, params, opt, k)
    if os.environ.get("FULL_ONLY"):
        return
    t_g = report("G phase (grad+adam)", make_gphase(True), params, opt, k)
    t_gn = report("G phase, no GAN terms", make_gphase(False), params, opt, k)
    t_d = report("D phase (grad+adam)", dphase, params, opt, k)
    t_dp = report(f"1 D apply b{2*BATCH} bwd-params", d_fwdbwd_params, params, k)
    t_di = report(f"1 D apply b{BATCH} bwd-input", d_fwdbwd_input, params, k)
    print(f"\nG-phase D-apply overhead (t_g - t_gn): {(t_g-t_gn)*1e3:.2f} ms")
    print(f"residual (full - G - D): {(t_full-t_g-t_d)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
