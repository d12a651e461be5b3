"""Decompose the REAL CycleGAN system step: batch build vs GAN update.

perf_step_decompose.py measured the raw G/D phases at ~364 ms (fp32,
3x512^2) but the full in-scan system step measures ~661 ms fp32 /
~544 ms bf16 (perf_cyclegan_step.py) — ~280 ms/step is NOT the GAN
phases. This script times, on the genuine system code path:

  1. jit(make_batch)        — sample + elastic warp + simple aug, per step
  2. jit(apply_update)      — the 3-phase GAN update on a fixed batch
  3. jit(full train step)   — both composed (the production number)

each as a device-side lax.scan over distinct keys (relay discipline:
distinct inputs, scalar checksum fetched, scan amortizes the ~25 ms
fixed relay cost).

Usage: python scripts/perf_cyclegan_batch.py <train_conf.json> [n_scan]
(e.g. the production recipe's 01_cycleGAN/train_conf.json)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from raygun_tpu.systems import load_system


def bench_scan(step_of_key, key0, n):
    """Time fn(key)->scalar over a scan of n distinct derived keys."""
    def scanned(key):
        def body(carry, k):
            return carry + step_of_key(k), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, n))
        return tot

    c = jax.jit(scanned).lower(key0).compile()
    _ = float(c(key0))
    best = 1e9
    for i in range(3):
        t0 = time.perf_counter()
        _ = float(c(jax.random.fold_in(key0, i)))
        best = min(best, time.perf_counter() - t0)
    return best / n


def main():
    conf = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    system = load_system(conf)
    system.build_system()
    state = system.state
    key0 = jax.random.PRNGKey(0)

    # 1. batch build alone (checksum every leaf to defeat DCE)
    def batch_only(k):
        b = system.make_batch(k)
        return sum(jnp.sum(v.astype(jnp.float32)) for v in b.values())

    dt_b = bench_scan(batch_only, key0, n)
    print(f"make_batch:        {dt_b*1e3:8.1f} ms/step")

    # 2. GAN update on a fixed prebuilt batch (state carried through scan;
    #    checksum one param leaf per net + the loss to defeat DCE of the
    #    optimizer -- params feed the next iteration so grads survive)
    batch = jax.jit(system.make_batch)(key0)
    apply_update = system._make_gan_update(True)

    def upd_scanned(state, key):
        def body(carry, k):
            st, acc = carry
            st2, metrics = apply_update(st, batch)
            return (st2, acc + metrics["loss"].astype(jnp.float32)), None
        (st, acc), _ = jax.lax.scan(
            body, (state, jnp.float32(0)), jax.random.split(key, n))
        leaves = jax.tree.leaves(st.params)
        return acc + sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    c = jax.jit(upd_scanned).lower(state, key0).compile()
    _ = float(c(state, key0))
    best = 1e9
    for i in range(3):
        t0 = time.perf_counter()
        _ = float(c(state, jax.random.fold_in(key0, i)))
        best = min(best, time.perf_counter() - t0)
    print(f"gan update only:   {best/n*1e3:8.1f} ms/step")

    # 3. full composed step
    def full_scanned(state, key):
        def body(carry, k):
            st, acc = carry
            st2, metrics = apply_update(st, system.make_batch(k))
            return (st2, acc + metrics["loss"].astype(jnp.float32)), None
        (st, acc), _ = jax.lax.scan(
            body, (state, jnp.float32(0)), jax.random.split(key, n))
        leaves = jax.tree.leaves(st.params)
        return acc + sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    c = jax.jit(full_scanned).lower(state, key0).compile()
    _ = float(c(state, key0))
    best = 1e9
    for i in range(3):
        t0 = time.perf_counter()
        _ = float(c(state, jax.random.fold_in(key0, i)))
        best = min(best, time.perf_counter() - t0)
    print(f"full step:         {best/n*1e3:8.1f} ms/step "
          f"= {n/best*0 + 1/(best/n):.2f} steps/s")


if __name__ == "__main__":
    main()
