"""Round-5 production-step arms: scan unroll, PRNG input synthesis, trace.

Same-session A/B protocol (CLAUDE.md): the committed baseline is
RE-MEASURED first in this session; every arm uses a fresh jit wrapper and
the bench's exact 32-step scan harness at 3x512^2 bf16.

Arms:
  base       — the bench harness exactly as committed
  unrollK    — lax.scan(..., unroll=K): lets XLA overlap step i's optimizer
               tail with step i+1's forward head (the production trainer
               scans steps_per_call steps the same way, so a win here is a
               production lever, not a harness trick)
  rbg        — input synthesis via the RBG PRNG instead of threefry
               (harness-only: production samples crops from device-resident
               volumes, which costs ~nothing; threefry uniform is VPU work
               the real pipeline never does)
  prng-cost  — a scan that ONLY synthesizes the inputs (isolates the
               threefry share of the step)
  trace      — attempt a real jax.profiler device trace of one execution

Usage: ARMS=base,unroll2,rbg python scripts/perf_r5_step.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    print(f"device: {jax.devices()[0]}", flush=True)

    from raygun_tpu.nn import NLayerDiscriminator, ResNet
    from raygun_tpu.systems.cyclegan import gan_loss, smooth_l1

    side, batch = 512, 3
    gen = ResNet(ndims=2, input_nc=1, output_nc=1, ngf=64, n_blocks=6,
                 padding_type="same")
    disc = NLayerDiscriminator(ndims=2, input_nc=1, ngf=64, n_layers=3,
                               kw=3, downsampling_kw=2, norm="instance")
    x = jnp.zeros((batch, side, side, 1), jnp.bfloat16)
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

    def g_loss(gP, dP, a, b):
        fake_B = gen.apply({"params": gP["G1"]}, a, train=True)
        both = gen.apply({"params": gP["G2"]},
                         jnp.concatenate([b, fake_B], axis=0), train=True)
        fake_A, cyc_A = jnp.split(both, 2, axis=0)
        cyc_B = gen.apply({"params": gP["G1"]}, fake_A, train=True)
        l = (10 * smooth_l1(b, cyc_B) + 10 * smooth_l1(a, cyc_A)
             + gan_loss(disc.apply({"params": jax.lax.stop_gradient(dP["D1"])}, fake_B, train=True), True)
             + gan_loss(disc.apply({"params": jax.lax.stop_gradient(dP["D2"])}, fake_A, train=True), True))
        return l, (fake_B, fake_A)

    def d_loss(dP, a, b, fake_A, fake_B):
        n = b.shape[0]
        p1 = disc.apply({"params": dP["D1"]}, jnp.concatenate(
            [b, jax.lax.stop_gradient(fake_B)], axis=0), train=True)
        p2 = disc.apply({"params": dP["D2"]}, jnp.concatenate(
            [a, jax.lax.stop_gradient(fake_A)], axis=0), train=True)
        return (gan_loss(p1[:n], True) + gan_loss(p1[n:], False)
                + gan_loss(p2[:n], True) + gan_loss(p2[n:], False))

    N_STEPS = 32

    def make_inputs_threefry(key):
        a = jax.random.uniform(key, x.shape, jnp.bfloat16) * 2 - 1
        b = jax.random.uniform(jax.random.fold_in(key, 1), x.shape,
                               jnp.bfloat16) * 2 - 1
        return a, b

    def make_inputs_rbg(key):
        # counter-based RBG bits: distinct per step (relay dedupe safe),
        # ~free on the VPU vs threefry's rotate-heavy rounds
        k = jax.random.wrap_key_data(
            jnp.tile(jax.random.key_data(key), 2)[:4].astype(jnp.uint32),
            impl="rbg")
        a = jax.random.uniform(k, x.shape, jnp.bfloat16) * 2 - 1
        b = jax.random.uniform(jax.random.fold_in(k, 1), x.shape,
                               jnp.bfloat16) * 2 - 1
        return a, b

    # production-sampler-style inputs: crops dynamic-sliced from two
    # device-RESIDENT volumes with per-step random origins — the exact op
    # the production trainer's DeviceVolumeSampler runs, vs the harness's
    # full-image threefry synthesis (VPU work production never does).
    # Volumes are passed as jit ARGUMENTS (closure capture would fetch
    # them at lowering — CLAUDE.md ir_constant trap).
    vol_shape = (1536, 1536)
    vols = {
        "A": jax.random.uniform(jax.random.PRNGKey(11), vol_shape,
                                jnp.bfloat16) * 2 - 1,
        "B": jax.random.uniform(jax.random.PRNGKey(12), vol_shape,
                                jnp.bfloat16) * 2 - 1,
    }

    def make_inputs_sampler(vols):
        def make(key):
            def crops(vol, k):
                origins = jax.random.randint(
                    k, (batch, 2), 0, vol_shape[0] - side)
                return jax.vmap(
                    lambda o: jax.lax.dynamic_slice(vol, (o[0], o[1]),
                                                    (side, side))
                )(origins)[..., None]
            ka, kb = jax.random.split(key)
            return crops(vols["A"], ka), crops(vols["B"], kb)
        return make

    def step(params, opt, key, make_inputs):
        a, b = make_inputs(key)
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

    def make_run(unroll=1, make_inputs=make_inputs_threefry, sampler=False):
        @jax.jit
        def run(params, opt, key, vols=None):
            mk = make_inputs_sampler(vols) if sampler else make_inputs

            def body(carry, k):
                p, o = carry
                p, o, loss = step(p, o, k, mk)
                return (p, o), loss
            (p, o), losses = jax.lax.scan(
                body, (params, opt), jax.random.split(key, N_STEPS),
                unroll=unroll)
            return jnp.sum(losses)
        return run

    def time_arm(name, run, with_vols=False):
        extra = (vols,) if with_vols else ()
        t0 = time.perf_counter()
        compiled = run.lower(params, opt, jax.random.PRNGKey(2),
                             *extra).compile()
        print(f"{name}: compiled in {time.perf_counter() - t0:.0f}s",
              flush=True)
        _ = float(compiled(params, opt, jax.random.PRNGKey(2), *extra))
        best = 1e9
        for rep in range(3):
            t0 = time.perf_counter()
            _ = float(compiled(params, opt, jax.random.PRNGKey(3 + rep),
                               *extra))
            best = min(best, (time.perf_counter() - t0) / N_STEPS)
        print(f"{name:14s} {best*1e3:7.2f} ms/step = {1/best:.3f} steps/s",
              flush=True)
        return compiled, best

    arms = os.environ.get("ARMS", "base,unroll2,rbg,prng-cost").split(",")
    results = {}
    base_compiled = None
    for arm in arms:
        if arm == "base":
            base_compiled, results[arm] = time_arm("base", make_run())
        elif arm.startswith("unroll"):
            k = int(arm[len("unroll"):])
            _, results[arm] = time_arm(arm, make_run(unroll=k))
        elif arm == "rbg":
            _, results[arm] = time_arm("rbg", make_run(
                make_inputs=make_inputs_rbg))
        elif arm == "sampler":
            _, results[arm] = time_arm("sampler", make_run(sampler=True),
                                       with_vols=True)
        elif arm == "rbg-unroll2":
            _, results[arm] = time_arm(arm, make_run(
                unroll=2, make_inputs=make_inputs_rbg))
        elif arm == "prng-cost":
            @jax.jit
            def prng_only(key):
                def body(c, k):
                    a, b = make_inputs_threefry(k)
                    return c + jnp.sum(a.astype(jnp.float32)) + jnp.sum(
                        b.astype(jnp.float32)), None
                tot, _ = jax.lax.scan(body, jnp.float32(0),
                                      jax.random.split(key, N_STEPS))
                return tot

            c = prng_only.lower(jax.random.PRNGKey(2)).compile()
            _ = float(c(jax.random.PRNGKey(2)))
            best = 1e9
            for rep in range(3):
                t0 = time.perf_counter()
                _ = float(c(jax.random.PRNGKey(3 + rep)))
                best = min(best, (time.perf_counter() - t0) / N_STEPS)
            # subtract relay share (empty jit)
            @jax.jit
            def empty(key):
                return jax.random.uniform(key, ())
            ce = empty.lower(jax.random.PRNGKey(0)).compile()
            _ = float(ce(jax.random.PRNGKey(1)))
            ov = 1e9
            for rep in range(3):
                t0 = time.perf_counter()
                _ = float(ce(jax.random.PRNGKey(2 + rep)))
                ov = min(ov, time.perf_counter() - t0)
            print(f"prng-cost      {best*1e3:7.2f} ms/step raw "
                  f"({(best - ov/N_STEPS)*1e3:.2f} ms net of relay share; "
                  f"relay {ov*1e3:.1f} ms/exec)", flush=True)
        elif arm == "trace":
            if base_compiled is None:
                base_compiled, _ = time_arm("base", make_run())
            tdir = "/tmp/jaxtrace_r5"
            try:
                with jax.profiler.trace(tdir):
                    _ = float(base_compiled(params, opt, jax.random.PRNGKey(7)))
                print(f"trace written under {tdir}:", flush=True)
                for root, _, files in os.walk(tdir):
                    for f in files:
                        p = os.path.join(root, f)
                        print(f"  {p} ({os.path.getsize(p)} B)", flush=True)
            except Exception as e:
                print(f"trace FAILED: {type(e).__name__}: {e}", flush=True)

    print({k: round(v * 1e3, 2) for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
