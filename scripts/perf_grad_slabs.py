"""Measure slab-wise-backward MTLSD training beyond the monolithic ceiling.

The monolithic 324^3 backward fails inside XLA:TPU (scripts/perf_remat.py;
docs/PERFORMANCE.md) and full/level remat doesn't unlock it. grad_slabs
(systems/mtlsd.py) splits the output into z-slabs, each carrying its full
92-voxel valid-conv input context, runs forward+backward per slab under
lax.scan, and sums gradients — exact (tests/systems/test_grad_slabs.py)
with peak activation memory of ONE slab. This script measures whether the
halo lever (196^3: 38.4% MFU -> 260^3: 46.9%) keeps paying past the
compiler/HBM wall, against the recompute overhead
n*(s+92) / (out+92) of slabbed input rows.

Usage: python scripts/perf_grad_slabs.py [crop:n1,n2 ...]
       default: 260:1,2 324:2,3 388:3,4
Prints ms/step, Mvox-trained/s, and step MFU per (crop, n_slabs).
MFU accounting: XLA cost analysis counts each scan body ONCE, so per-slab
flops are taken from a scan-free single-slab compile and multiplied by the
slab count (optimizer flops are negligible at these crops).
"""

import sys
import time

import numpy as np

HALO = 92          # fixed valid-conv context of the production net
ZSTEP = 8          # coarsest z stride (3 x (2,2,2) downsample levels)
PEAK_TF = 197.0    # v5e bf16
N_SCAN = 4


def slab_plan(out_z, n):
    """Mirror of MTLSD._slab_grad_plan for the production net geometry."""
    s = -(-out_z // n)
    s = min(-(-s // ZSTEP) * ZSTEP, out_z)
    starts = list(range(0, out_z - s + 1, s))
    if starts[-1] + s < out_z:
        starts.append(out_z - s)
    thr, covered = [], 0
    for st in starts:
        thr.append(max(0, covered - st))
        covered = max(covered, st + s)
    return starts, thr, s


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

    specs = sys.argv[1:] or ["260:1,2", "324:2,3", "388:3,4"]

    x0 = jnp.zeros((1, 196, 196, 196, 1), jnp.bfloat16)
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x0, train=False)
    )()["params"]
    opt_state = tx.init(params)

    def make_step(c, n):
        out = c - HALO
        starts, thr, s = slab_plan(out, n)
        starts_a = jnp.asarray(starts, jnp.int32)
        thr_a = jnp.asarray(thr, jnp.int32)
        yx = out

        def slab_loss(p, x, t_affs, t_lsds, st, th):
            xs = jax.lax.dynamic_slice_in_dim(x, st, s + HALO, axis=1)
            mask = (jnp.arange(s, dtype=jnp.int32) >= th
                    ).reshape(1, s, 1, 1, 1)
            affs, lsds = model.apply(
                {"params": jax.tree.map(lambda q: q.astype(jnp.bfloat16), p)},
                xs, train=True)
            ta = jax.lax.dynamic_slice_in_dim(t_affs, st, s, axis=1)
            tl = jax.lax.dynamic_slice_in_dim(t_lsds, st, s, axis=1)
            la = jnp.sum((mask * (affs.astype(jnp.float32) -
                                  ta.astype(jnp.float32))) ** 2)
            ll = jnp.sum((mask * (lsds.astype(jnp.float32) -
                                  tl.astype(jnp.float32))) ** 2)
            return (la + ll) / (out * yx * yx)

        def step(p, s_opt, x, t_affs, t_lsds):
            def body(carry, st_th):
                g_acc, l_acc = carry
                loss, g = jax.value_and_grad(slab_loss)(
                    p, x, t_affs, t_lsds, *st_th)
                return (jax.tree.map(jnp.add, g_acc, g), l_acc + loss), None

            zeros = jax.tree.map(jnp.zeros_like, p)
            (grads, loss), _ = jax.lax.scan(
                body, (zeros, jnp.float32(0)), (starts_a, thr_a))
            upd, s_opt = tx.update(grads, s_opt, p)
            return optax.apply_updates(p, upd), s_opt, loss

        def scanned(params, opt_state, key):
            def body(carry, k):
                p, so = carry
                ka, kb = jax.random.split(k)
                x = jax.random.uniform(ka, (1, c, c, c, 1), jnp.bfloat16)
                t_affs = jax.random.uniform(
                    kb, (1, out, yx, yx, 20), jnp.bfloat16)
                t_lsds = jnp.zeros((1, out, yx, yx, 10), jnp.bfloat16)
                p, so, loss = step(p, so, x, t_affs, t_lsds)
                return (p, so), loss
            (p, so), losses = jax.lax.scan(
                body, (params, opt_state), jax.random.split(key, N_SCAN))
            return jnp.sum(losses)

        # scan-free single-slab compile for honest per-slab flops
        def one_slab(p, x, t_affs, t_lsds):
            return jax.value_and_grad(slab_loss)(
                p, x, t_affs, t_lsds, jnp.int32(0), jnp.int32(0))

        return jax.jit(scanned), jax.jit(one_slab), len(starts), s, out

    for spec in specs:
        c_str, _, ns = spec.partition(":")
        c = int(c_str)
        for n in [int(v) for v in ns.split(",")] if ns else [2]:
            scanned, one_slab, n_eff, s, out = make_step(c, n)
            tag = f"{c}^3->{out}^3 slabs={n_eff} (s={s})"
            ovh = n_eff * (s + HALO) / (out + HALO)
            try:
                compiled = scanned.lower(
                    params, opt_state, jax.random.PRNGKey(1)).compile()
                slab_c = one_slab.lower(
                    params,
                    jax.ShapeDtypeStruct((1, c, c, c, 1), jnp.bfloat16),
                    jax.ShapeDtypeStruct((1, out, out, out, 20), jnp.bfloat16),
                    jax.ShapeDtypeStruct((1, out, out, out, 10), jnp.bfloat16),
                ).compile()
            except Exception as e:
                print(f"{tag}: compile failed: {type(e).__name__} "
                      f"{str(e).splitlines()[0][:120]}")
                continue
            cost = slab_c.cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0)) * n_eff
            try:
                _ = float(compiled(params, opt_state, jax.random.PRNGKey(2)))
            except Exception as e:
                print(f"{tag}: run failed: {type(e).__name__} "
                      f"{str(e).splitlines()[0][:120]}")
                continue
            dt = 1e9
            for rep in range(2):
                t0 = time.perf_counter()
                _ = float(compiled(
                    params, opt_state, jax.random.PRNGKey(3 + rep)))
                dt = min(dt, (time.perf_counter() - t0) / N_SCAN)
            tf = flops / dt / 1e12
            out_vox = out ** 3
            print(f"{tag}: {dt*1e3:.0f} ms/step, "
                  f"{out_vox/dt/1e6:.2f} Mvox-trained/s, "
                  f"{tf:.1f} TFLOP/s = {tf/PEAK_TF*100:.1f}% MFU, "
                  f"input-rows overhead {ovh:.2f}x")


if __name__ == "__main__":
    main()
