"""Decompose CycleGAN make_batch (87.6 ms/step at 3x512^2 bf16).

perf_cyclegan_batch.py: make_batch 87.6 ms vs warp-only ~8.7 ms
(perf_warp.py). This times each stage of _sample_side cumulatively on
the genuine system path, scan-amortized per CLAUDE.md relay discipline:

  sample         sampler crop only
  +normalize
  +coords        elastic_coordinates
  +warp          map_coordinates bilinear
  +simple        flips/transposes
  +intensity     scale/shift + cast (== full make_batch body)

Usage: python scripts/perf_cyclegan_makebatch.py <train_conf.json> [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from raygun_tpu.io.augment import (
    elastic_coordinates, intensity_scale_shift, normalize, simple_augment,
    warp,
)
from raygun_tpu.systems import load_system


def bench_scan(step_of_key, key0, n):
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
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    system = load_system(conf)
    system.build_system()
    key0 = jax.random.PRNGKey(0)

    def staged(upto):
        def one_side(side, key):
            def one(kk):
                ks = jax.random.split(kk, 2)
                crop = system.samplers[side].sample(ks[0])["real"]
                extra = crop.ndim - system.ndims
                if extra:
                    crop = crop.reshape(crop.shape[extra:])
                if upto == "sample":
                    return crop.astype(jnp.float32)
                raw = normalize(crop)
                if upto == "normalize":
                    return raw
                ek = system.elastic_kwargs
                coords = elastic_coordinates(
                    ks[0], raw.shape, (system.side_length,) * system.ndims,
                    ek["control_point_spacing"], ek["jitter_sigma"],
                    subsample=ek["subsample"])
                if upto == "coords":
                    return raw[: system.side_length, : system.side_length] \
                        + coords[0] + coords[1]
                raw = warp(raw, coords, order=1)
                if upto == "warp":
                    return raw
                raw = simple_augment({"x": raw}, ks[1], ndims=system.ndims)["x"]
                if upto == "simple":
                    return raw
                return intensity_scale_shift(raw, 2, -1)[..., None].astype(
                    system.dtype)

            keys = jax.random.split(key, system.batch_size)
            return jax.vmap(one)(keys)

        def step(k):
            kA, kB = jax.random.split(k)
            a = one_side("A", kA)
            b = one_side("B", kB)
            return jnp.sum(a.astype(jnp.float32)) + jnp.sum(
                b.astype(jnp.float32))

        return step

    for stage in ["sample", "normalize", "coords", "warp", "simple", "full"]:
        dt = bench_scan(staged(stage), key0, n)
        print(f"upto {stage:10s} {dt*1e3:8.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
