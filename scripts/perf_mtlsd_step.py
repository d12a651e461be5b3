"""Decompose the production MTLSD train step (VERDICT r2 follow-on).

The production recipe measured 0.78 steps/s end-to-end while bench.py's
bare net (same arch, same crop) does ~4.9 fwd+bwd+Adam steps/s — so ~80%
of the step is NOT the network. This script times each stage of the
device-resident step (sample, augment, affinity targets, LSD targets,
apply/update, full step) with the axon-relay discipline from CLAUDE.md:
device-side lax.scan over distinct keys, scalar checksum fetch, fixed
~25 ms relay overhead subtracted.

Usage:  python scripts/perf_mtlsd_step.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    print(f"device: {jax.devices()[0]}", flush=True)

    conf = "/root/repo/experiments_out/production_recipe/02_MTLSD/train_conf.json"
    from raygun_tpu.systems import load_system

    system = load_system(conf)
    system.build_system()

    N = 8

    def timed(name, make_scanned, *args):
        """make_scanned(key) -> scalar; scans N distinct keys on device."""

        @jax.jit
        def run(key):
            def body(carry, k):
                return carry + make_scanned(k), None
            tot, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, N))
            return tot

        c = run.lower(jax.random.PRNGKey(0)).compile()
        _ = float(c(jax.random.PRNGKey(1)))
        best = 1e9
        for rep in range(2):
            t0 = time.perf_counter()
            _ = float(c(jax.random.PRNGKey(2 + rep)))
            best = min(best, time.perf_counter() - t0)
        per = (best - overhead) / N
        print(f"{name:34s} {per*1e3:9.1f} ms", flush=True)
        return per

    # relay fixed overhead
    @jax.jit
    def empty(key):
        return jnp.float32(0) + jax.random.uniform(key, ())
    ce = empty.lower(jax.random.PRNGKey(0)).compile()
    _ = float(ce(jax.random.PRNGKey(1)))
    overhead = 1e9
    for rep in range(3):
        t0 = time.perf_counter()
        _ = float(ce(jax.random.PRNGKey(2 + rep)))
        overhead = min(overhead, time.perf_counter() - t0)
    print(f"relay fixed overhead: {overhead*1e3:.1f} ms", flush=True)

    # --- stage pieces ------------------------------------------------------
    from raygun_tpu.io.targets import (
        add_affinities, balance_labels, local_shape_descriptors, lsd_mask,
    )

    def checksum(tree):
        leaves = jax.tree.leaves(tree)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    # full sample (crop + augment + targets)
    timed("make_batch (sample+augment+targets)",
          lambda k: checksum(system.make_batch(k)))

    # crop only
    timed("crop sampling", lambda k: checksum(system.sampler.sample(k)))

    # LSD targets alone on a fixed-label crop
    out_shape = tuple(system.output_shape)
    labels_np = (np.random.RandomState(0).randint(
        0, 24, size=out_shape)).astype(np.int32)
    labels_dev = jnp.asarray(labels_np)
    lk = system.lsd_kwargs or {}
    sig = float(lk.get("sigma", 300))
    ds = int(lk.get("downsample", 1))
    ml = int(system.max_labels or 64)

    def lsd_only(k):
        # fold the key in so the relay doesn't dedupe identical requests
        l = labels_dev + (jax.random.randint(k, (), 0, 2) * 0).astype(jnp.int32)
        return jnp.sum(local_shape_descriptors(
            l, sig, tuple(system.voxel_size), max_labels=ml, downsample=ds))
    timed(f"local_shape_descriptors (ml={ml})", lsd_only)

    def uniq_only(k):
        l = labels_dev + (jax.random.randint(k, (), 0, 2) * 0).astype(jnp.int32)
        sl = tuple(slice(None, None, ds) for _ in range(l.ndim))
        return jnp.sum(jnp.unique(l[sl], size=ml, fill_value=0).astype(jnp.float32))
    timed("jnp.unique (downsampled crop)", uniq_only)

    def affs_only(k):
        l = labels_dev + (jax.random.randint(k, (), 0, 2) * 0).astype(jnp.int32)
        affs, mask = add_affinities(l, system.neighborhood,
                                    jnp.ones_like(l, jnp.float32))
        w = balance_labels(affs, mask)
        return jnp.sum(affs) + jnp.sum(w)
    timed("add_affinities + balance", affs_only)

    # NOTE: the full train step is too large for the remote compiler when
    # wrapped in a timing scan (it kills the compile service with a broken
    # pipe) — the heavy stages are wall-measured instead; at ~200+ ms/step
    # the ~25 ms relay overhead is an acceptable bias (reported raw).

    # full step (jitted sample+augment+targets+apply)
    step = system.make_train_step()

    # step donates state; run it through its own interface for a wall check
    t0 = time.perf_counter()
    s, key = system.state, jax.random.PRNGKey(9)
    for i in range(3):
        s, metrics = step(s, jax.random.fold_in(key, i))
    jax.tree.leaves(metrics)[0].block_until_ready()
    _ = float(jax.tree.leaves(metrics)[0])
    t_warm = time.perf_counter() - t0
    n_meas = 6
    t0 = time.perf_counter()
    for i in range(n_meas):
        s, metrics = step(s, jax.random.fold_in(key, 100 + i))
    _ = float(jax.tree.leaves(metrics)[0])
    per = (time.perf_counter() - t0) / n_meas
    print(f"{'full train step (wall, pipelined)':34s} {per*1e3:9.1f} ms "
          f"= {1/per:.2f} steps/s", flush=True)


if __name__ == "__main__":
    main()
