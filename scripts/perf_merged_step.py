"""Probe: ONE value_and_grad over (G loss + D loss) vs the current
two-phase step.

The two phases share forward work the two-phase structure can't reuse:
the G phase applies D1(fake_B)/D2(fake_A) for the GAN terms (grad wrt
input), the D phase applies D1([b, fake_B])/D2([a, fake_A]) again (grad
wrt params). Both phases read the same pre-update params, and the D loss
uses stop_gradient'd fakes, so computing ALL grads in one backward is
semantically identical (same update as the reference's G-then-D order) —
and XLA can CSE the shared D forwards, since stop_gradient is the
identity in the forward graph.

Structure: d_loss reads rows of the SAME batched D apply the G terms
read, with the stop_gradient pattern deciding where gradients flow.
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


def main():
    print(f"device: {jax.devices()[0]}  side={SIDE}", flush=True)
    gen = ResNet(ndims=2, input_nc=1, output_nc=1, ngf=64, n_blocks=6,
                 padding_type="same")
    disc = NLayerDiscriminator(ndims=2, input_nc=1, ngf=64, n_layers=3,
                               kw=3, downsampling_kw=2, norm="instance")
    x = jnp.zeros((BATCH, SIDE, SIDE, 1), jnp.bfloat16)
    gp = jax.jit(lambda: gen.init(jax.random.PRNGKey(0), x[:1],
                                  train=False))()["params"]
    dp = jax.jit(lambda: disc.init(jax.random.PRNGKey(1), x[:1],
                                   train=False))()["params"]
    params = {
        "G1": gp, "G2": jax.tree.map(jnp.copy, gp),
        "D1": dp, "D2": jax.tree.map(jnp.copy, dp),
    }
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    g_tx, d_tx = optax.adam(1e-5), optax.adam(1e-5)
    opt = {"G": g_tx.init({"G1": params["G1"], "G2": params["G2"]}),
           "D": d_tx.init({"D1": params["D1"], "D2": params["D2"]})}

    def rand_ab(k):
        a = jax.random.uniform(k, x.shape, jnp.bfloat16) * 2 - 1
        b = jax.random.uniform(jax.random.fold_in(k, 1), x.shape,
                               jnp.bfloat16) * 2 - 1
        return a, b

    def merged_loss(P, a, b):
        """Total = G terms + D terms from ONE set of forwards.

        G cycle chains exactly as the current step; each D runs ONE
        batched apply whose forward serves both losses (stop_gradient
        patterns split the backward)."""
        gP = {"G1": P["G1"], "G2": P["G2"]}
        dP = {"D1": P["D1"], "D2": P["D2"]}
        n = a.shape[0]
        fake_B = gen.apply({"params": gP["G1"]}, a, train=True)
        both = gen.apply({"params": gP["G2"]},
                         jnp.concatenate([b, fake_B], axis=0), train=True)
        fake_A, cyc_A = jnp.split(both, 2, axis=0)
        cyc_B = gen.apply({"params": gP["G1"]}, fake_A, train=True)
        l = 10 * smooth_l1(b, cyc_B) + 10 * smooth_l1(a, cyc_A)
        # one batched apply per D; forward CSEs between the two usages
        p1_g = disc.apply({"params": jax.lax.stop_gradient(dP["D1"])},
                          jnp.concatenate(
                              [jax.lax.stop_gradient(b), fake_B], axis=0),
                          train=True)
        p2_g = disc.apply({"params": jax.lax.stop_gradient(dP["D2"])},
                          jnp.concatenate(
                              [jax.lax.stop_gradient(a), fake_A], axis=0),
                          train=True)
        l = l + gan_loss(p1_g[n:], True) + gan_loss(p2_g[n:], True)
        p1_d = disc.apply({"params": dP["D1"]}, jax.lax.stop_gradient(
            jnp.concatenate([b, fake_B], axis=0)), train=True)
        p2_d = disc.apply({"params": dP["D2"]}, jax.lax.stop_gradient(
            jnp.concatenate([a, fake_A], axis=0)), train=True)
        l = (l + gan_loss(p1_d[:n], True) + gan_loss(p1_d[n:], False)
             + gan_loss(p2_d[:n], True) + gan_loss(p2_d[n:], False))
        return l

    def merged_step(P, o, k):
        a, b = rand_ab(k)
        loss, grads = jax.value_and_grad(merged_loss)(P, a, b)
        gG = {"G1": grads["G1"], "G2": grads["G2"]}
        gD = {"D1": grads["D1"], "D2": grads["D2"]}
        gP = {"G1": P["G1"], "G2": P["G2"]}
        dP = {"D1": P["D1"], "D2": P["D2"]}
        gupd, gos = g_tx.update(gG, o["G"], gP)
        gP = optax.apply_updates(gP, gupd)
        dupd, dos = d_tx.update(gD, o["D"], dP)
        dP = optax.apply_updates(dP, dupd)
        return {**gP, **dP}, {"G": gos, "D": dos}, loss

    def full(params, opt, key):
        def body(carry, k):
            p, o = carry
            p, o, loss = merged_step(p, o, k)
            return (p, o), loss
        (p, o), losses = jax.lax.scan(
            body, (params, opt), jax.random.split(key, N))
        return jnp.sum(losses)

    c = jax.jit(full).lower(params, opt, jax.random.PRNGKey(3)).compile()
    dt = _timeit(c, (params, opt, jax.random.PRNGKey(3)))
    print(f"merged single-backward step: {dt*1e3:.2f} ms "
          f"({1/dt:.2f} steps/s)", flush=True)


if __name__ == "__main__":
    main()
