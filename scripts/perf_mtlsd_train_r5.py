"""Round-5 MTLSD 3D TRAIN residency pass (VERDICT r4 #4).

Decomposes the bare train step (bench.py's exact harness: bf16 forward,
fp32 params/Adam, scan N=8 distinct inputs) into fwd / fwd+bwd / full-step
at 260^3 and 196^3, then measures candidate levers:

  fwd        — forward + loss only (no grad)
  fwdbwd     — value_and_grad, gradients fetched via checksum (no update)
  step       — full fwd+bwd+Adam (the bench line)
  allbf16    — params AND Adam moments in bf16 (halves optimizer+grad HBM
               traffic; numerics arm — NOT production until proven)
  unroll2    — scan unroll=2 (cross-step overlap)
  gelevels   — remat_levels=True (known rejected at 260; re-checked here
               only if ARMS includes it)

Usage: CROPS=260,196 ARMS=fwd,fwdbwd,step,allbf16,unroll2 \
       python scripts/perf_mtlsd_train_r5.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    print(f"device: {jax.devices()[0]}", flush=True)

    from raygun_tpu.systems.mtlsd import MTLSDModel

    unet_kwargs = dict(
        input_nc=1, ngf=12, fmap_inc_factor=6,
        downsample_factors=[(2, 2, 2), (2, 2, 2), (2, 2, 2)],
        constant_upsample=True,
    )
    model = MTLSDModel(unet_kwargs=unet_kwargs, num_affs=20)
    x0 = jnp.zeros((1, 196, 196, 196, 1), jnp.bfloat16)
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x0, train=False)
    )()["params"]

    N = 8
    crops = [int(c) for c in os.environ.get("CROPS", "260,196").split(",")]
    arms = os.environ.get("ARMS", "fwd,fwdbwd,step,allbf16,unroll2").split(",")

    def out_shape_for(c):
        xa = jax.ShapeDtypeStruct((1, c, c, c, 1), jnp.bfloat16)
        return jax.eval_shape(
            lambda p, x: model.apply({"params": p}, x, train=False),
            params, xa)[0].shape

    def loss_fn(p, x, t_affs, t_lsds):
        affs, lsds = model.apply(
            {"params": jax.tree.map(lambda q: q.astype(jnp.bfloat16), p)},
            x, train=True)
        la = jnp.mean((affs.astype(jnp.float32) - t_affs) ** 2)
        ll = jnp.mean((lsds.astype(jnp.float32) - t_lsds) ** 2)
        return la + ll

    def timed(tag, make_body, p0, s0, flops_hint=None, unroll=1):
        @jax.jit
        def scanned(params, opt_state, key):
            def body(carry, k):
                return make_body(carry, k)
            c, losses = jax.lax.scan(
                body, (params, opt_state), jax.random.split(key, N),
                unroll=unroll)
            return jnp.sum(losses)
        try:
            t0 = time.perf_counter()
            compiled = scanned.lower(p0, s0, jax.random.PRNGKey(1)).compile()
            dtc = time.perf_counter() - t0
        except Exception as e:
            print(f"{tag}: compile failed: {type(e).__name__} "
                  f"{str(e).splitlines()[0][:100]}", flush=True)
            return None
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        _ = float(compiled(p0, s0, jax.random.PRNGKey(2)))
        dt = 1e9
        for rep in range(2):
            t0 = time.perf_counter()
            _ = float(compiled(p0, s0, jax.random.PRNGKey(3 + rep)))
            dt = min(dt, (time.perf_counter() - t0) / N)
        tf = flops / dt / 1e12
        print(f"{tag:28s} {dt*1e3:7.1f} ms  {tf:5.1f} TF/s = "
              f"{tf/197*100:4.1f}% MFU  (compile {dtc:.0f}s)", flush=True)
        return dt

    for c in crops:
        shape = (1, c, c, c, 1)
        oshape = out_shape_for(c)
        print(f"--- crop {c}^3 -> {oshape[1]}^3", flush=True)

        def inputs(k):
            ka, kb = jax.random.split(k)
            x = jax.random.uniform(ka, shape, jnp.bfloat16)
            t_affs = jax.random.uniform(kb, oshape, jnp.float32)
            t_lsds = jnp.zeros(oshape[:-1] + (10,), jnp.float32)
            return x, t_affs, t_lsds

        for arm in arms:
            if arm == "fwd":
                def body(carry, k):
                    p, s = carry
                    x, ta, tl = inputs(k)
                    return (p, s), loss_fn(p, x, ta, tl)
                timed(f"{c} fwd-only", body, params, optax.adam(5e-5).init(params))
            elif arm == "fwdbwd":
                def body(carry, k):
                    p, s = carry
                    x, ta, tl = inputs(k)
                    loss, grads = jax.value_and_grad(loss_fn)(p, x, ta, tl)
                    gsum = sum(jnp.sum(g.astype(jnp.float32))
                               for g in jax.tree.leaves(grads))
                    return (p, s), loss + 0.0 * gsum
                timed(f"{c} fwd+bwd", body, params, optax.adam(5e-5).init(params))
            elif arm in ("step", "unroll2", "allbf16"):
                tx = optax.adam(5e-5)
                if arm == "allbf16":
                    p0 = jax.tree.map(lambda q: q.astype(jnp.bfloat16), params)
                else:
                    p0 = params
                s0 = tx.init(p0)

                def body(carry, k, tx=tx):
                    p, s = carry
                    x, ta, tl = inputs(k)
                    loss, grads = jax.value_and_grad(loss_fn)(p, x, ta, tl)
                    upd, s = tx.update(grads, s, p)
                    p = optax.apply_updates(p, upd)
                    return (p, s), loss
                timed(f"{c} {arm}", body, p0, s0,
                      unroll=2 if arm == "unroll2" else 1)
            elif arm == "gelevels":
                lm = MTLSDModel(
                    unet_kwargs=dict(unet_kwargs, remat_levels=True),
                    num_affs=20)

                def lf(p, x, ta, tl):
                    affs, lsds = lm.apply(
                        {"params": jax.tree.map(
                            lambda q: q.astype(jnp.bfloat16), p)},
                        x, train=True)
                    la = jnp.mean((affs.astype(jnp.float32) - ta) ** 2)
                    ll = jnp.mean((lsds.astype(jnp.float32) - tl) ** 2)
                    return la + ll

                tx = optax.adam(5e-5)
                s0 = tx.init(params)

                def body(carry, k):
                    p, s = carry
                    x, ta, tl = inputs(k)
                    loss, grads = jax.value_and_grad(lf)(p, x, ta, tl)
                    upd, s = tx.update(grads, s, p)
                    p = optax.apply_updates(p, upd)
                    return (p, s), loss
                timed(f"{c} remat_levels", body, params, s0)


if __name__ == "__main__":
    main()
