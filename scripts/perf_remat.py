"""Does rematerialization (jax.checkpoint) buy MTLSD training throughput?

Training crops amortize the network's fixed 92-voxel valid-conv halo the
same way inference blocks do (docs/PERFORMANCE.md: 196^3 -> 38.4% MFU,
260^3 -> 46.9%; 324^3 exceeds HBM with backward activations). Full remat
of the forward drops saved activations to O(inputs) at the cost of one
extra forward (~+33% step FLOPs); the halo win from 260^3 -> 324^3 crops
is (324/232)^3 / (260/168)^3 fewer wasted input voxels per trained voxel.
This script measures whether the trade nets out on hardware.

Usage: python scripts/perf_remat.py [crop ...]   (default 260 324 388)
Prints trained-output-voxels/sec and step MFU per (crop, remat) variant.
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    from raygun_tpu.systems.mtlsd import MTLSDModel

    unet_kwargs = dict(
        input_nc=1, ngf=12, fmap_inc_factor=6,
        downsample_factors=[(2, 2, 2), (2, 2, 2), (2, 2, 2)],
        constant_upsample=True,
    )
    model = MTLSDModel(unet_kwargs=unet_kwargs, num_affs=20)
    tx = optax.adam(5e-5)

    crops = [int(a) for a in sys.argv[1:]] or [260, 324, 388]

    x0 = jnp.zeros((1, 196, 196, 196, 1), jnp.bfloat16)
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x0, train=False)
    )()["params"]
    opt_state = tx.init(params)

    def out_shape_for(c):
        xa = jax.ShapeDtypeStruct((1, c, c, c, 1), jnp.bfloat16)
        return jax.eval_shape(
            lambda p, x: model.apply({"params": p}, x, train=False), params, xa
        )[0].shape

    N_SCAN = 4

    level_model = MTLSDModel(
        unet_kwargs=dict(unet_kwargs, remat_levels=True), num_affs=20)

    def make_step(c, remat):
        shape = (1, c, c, c, 1)
        oshape = out_shape_for(c)
        mdl = level_model if remat == "levels" else model

        def fwd(p, x):
            affs, lsds = mdl.apply(
                {"params": jax.tree.map(lambda q: q.astype(jnp.bfloat16), p)},
                x, train=True)
            return affs, lsds

        if remat is True:
            fwd = jax.checkpoint(fwd)

        def loss_fn(p, x, t_affs, t_lsds):
            affs, lsds = fwd(p, x)
            la = jnp.mean((affs.astype(jnp.float32) - t_affs) ** 2)
            ll = jnp.mean((lsds.astype(jnp.float32) - t_lsds) ** 2)
            return la + ll

        def scanned(params, opt_state, key):
            def body(carry, k):
                p, s = carry
                ka, kb = jax.random.split(k)
                x = jax.random.uniform(ka, shape, jnp.bfloat16)
                t_affs = jax.random.uniform(kb, oshape, jnp.float32)
                t_lsds = jnp.zeros(oshape[:-1] + (10,), jnp.float32)
                loss, grads = jax.value_and_grad(loss_fn)(p, x, t_affs, t_lsds)
                upd, s = tx.update(grads, s, p)
                p = optax.apply_updates(p, upd)
                return (p, s), loss
            (p, s), losses = jax.lax.scan(
                body, (params, opt_state), jax.random.split(key, N_SCAN))
            return jnp.sum(losses)

        return jax.jit(scanned)

    for c in crops:
        oshape = out_shape_for(c)
        out_vox = int(np.prod(oshape[1:-1]))
        for remat in (False, True, "levels"):
            tag = f"{c}^3->{oshape[1]}^3 remat={remat}"
            try:
                compiled = make_step(c, remat).lower(
                    params, opt_state, jax.random.PRNGKey(1)).compile()
            except Exception as e:
                print(f"{tag}: compile failed: {type(e).__name__} "
                      f"{str(e).splitlines()[0][:120]}")
                continue
            cost = compiled.cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0))  # per-step (scan body once)
            try:
                _ = float(compiled(params, opt_state, jax.random.PRNGKey(2)))
            except Exception as e:
                print(f"{tag}: run failed: {type(e).__name__} "
                      f"{str(e).splitlines()[0][:120]}")
                continue
            dt = 1e9
            for rep in range(2):
                t0 = time.perf_counter()
                _ = float(compiled(params, opt_state, jax.random.PRNGKey(3 + rep)))
                dt = min(dt, (time.perf_counter() - t0) / N_SCAN)
            tf = flops / dt / 1e12
            print(f"{tag}: {dt*1e3:.0f} ms/step, "
                  f"{out_vox/dt/1e6:.2f} Mvox-trained/s, "
                  f"{tf:.1f} TFLOP/s = {tf/197*100:.1f}% MFU")


if __name__ == "__main__":
    main()
