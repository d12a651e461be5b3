"""Decompose the production CycleGAN train step (3x512^2, link mode).

The production recipe measured 1.15 steps/s end-to-end while bench.py's
bare 3-phase GAN update on a prebuilt batch does ~2.65 steps/s — so ~half
the step is batch construction (crop + elastic warp + simple augment).
Times each stage with the axon-relay discipline from CLAUDE.md (device-side
lax.scan over distinct keys, scalar checksum fetch, fixed ~25 ms relay
overhead subtracted).

Usage:  python scripts/perf_cyclegan_step.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    print(f"device: {jax.devices()[0]}", flush=True)

    conf = "/root/repo/experiments_out/production_recipe/01_cycleGAN/train_conf.json"
    from raygun_tpu.core import read_config
    from raygun_tpu.systems import load_system

    if len(sys.argv) > 1:  # e.g. `perf_cyclegan_step.py bfloat16`
        import json as _json
        import tempfile

        c = read_config(conf)
        c["dtype"] = sys.argv[1]
        tmp = os.path.join(tempfile.mkdtemp(), "train_conf.json")
        with open(tmp, "w") as f:
            _json.dump(c, f)
        print(f"dtype override: {sys.argv[1]}", flush=True)
        conf = tmp

    cwd = os.getcwd()
    os.chdir(os.path.dirname(conf))
    try:
        system = load_system(conf)
        system.build_system()
    finally:
        os.chdir(cwd)

    N = 8

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

    def checksum(tree):
        leaves = jax.tree.leaves(tree)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    def timed(name, make_scanned):
        @jax.jit
        def run(key):
            def body(carry, k):
                return carry + make_scanned(k), None
            tot, _ = jax.lax.scan(
                body, jnp.float32(0), jax.random.split(key, N)
            )
            return tot

        c = run.lower(jax.random.PRNGKey(0)).compile()
        _ = float(c(jax.random.PRNGKey(1)))
        best = 1e9
        for rep in range(2):
            t0 = time.perf_counter()
            _ = float(c(jax.random.PRNGKey(2 + rep)))
            best = min(best, time.perf_counter() - t0)
        per = (best - overhead) / N
        print(f"{name:40s} {per*1e3:9.1f} ms", flush=True)
        return per

    # full batch construction (both sides: crop + elastic + simple + scale)
    timed("make_batch (crop+elastic+augment)",
          lambda k: checksum(system.make_batch(k)))

    # crop only (one side, full batch)
    def crops_only(k):
        ks = jax.random.split(k, system.batch_size)
        return checksum(jax.vmap(
            lambda kk: system._sample_side("A", kk))(ks))
    timed("crop sampling (side A)", crops_only)

    # elastic warp alone on a fixed crop
    import numpy as np

    from raygun_tpu.io.augment import elastic_coordinates, warp

    side = int(system.side_length)
    crop_np = np.random.RandomState(0).rand(side, side).astype(np.float32)
    crop_dev = jnp.asarray(crop_np)
    ek = system.elastic_kwargs

    def elastic_only(k):
        x = crop_dev + jax.random.uniform(k, ()) * 0.0
        coords = elastic_coordinates(
            k, x.shape, (side, side),
            ek["control_point_spacing"], ek["jitter_sigma"],
            subsample=ek["subsample"],
        )
        return jnp.sum(warp(x, coords, order=1))
    timed("elastic_coordinates+warp (1 crop)", elastic_only)

    # GAN update alone on a prebuilt batch
    batch = jax.jit(system.make_batch)(jax.random.PRNGKey(7))
    batch = jax.tree.map(jnp.asarray, batch)
    inner = system._make_gan_update(norm_train=True)
    state = system.state

    def apply_only(k):
        b = dict(batch)
        b["real_A"] = b["real_A"] + jax.random.uniform(
            k, b["real_A"].shape, b["real_A"].dtype) * 0.001
        new_state, metrics = inner(state, b)
        # checksum EVERY param leaf: summing only one leaf lets XLA DCE the
        # weight-grad GEMMs of all other layers (measured 139 ms vs the
        # honest 460 ms at 3x512^2 bf16)
        return checksum(metrics) + checksum(new_state.params)
    timed("gan update (3-phase fwd+bwd+adam)", apply_only)

    # K steps fused into ONE device program (state carried through a scan,
    # batch built inside — nothing DCE-able): the honest device step time,
    # and the upside of a `scan_steps` trainer feature
    K = 8

    @jax.jit
    def runK(state, key):
        def body(s, k):
            s2, m = inner(s, system.make_batch(k))
            return s2, m["Total_Loss/G1"]
        s2, losses = jax.lax.scan(body, state, jax.random.split(key, K))
        return s2, jnp.sum(losses)

    cK = runK.lower(state, jax.random.PRNGKey(0)).compile()
    s2, l = cK(state, jax.random.PRNGKey(1))
    _ = float(l)
    t0 = time.perf_counter()
    s2, l = cK(state, jax.random.PRNGKey(2))
    _ = float(l)
    per = (time.perf_counter() - t0 - overhead) / K
    print(f"{'scanned step (K=8, one dispatch)':40s} {per*1e3:9.1f} ms "
          f"= {1/per:.2f} steps/s", flush=True)
    del s2

    # full step wall (pipelined through the real interface)
    step = system.make_train_step()
    s, key = system.state, jax.random.PRNGKey(9)
    for i in range(3):
        s, metrics = step(s, jax.random.fold_in(key, i))
    _ = float(jax.tree.leaves(metrics)[0])
    n_meas = 6
    t0 = time.perf_counter()
    for i in range(n_meas):
        s, metrics = step(s, jax.random.fold_in(key, 100 + i))
    _ = float(jax.tree.leaves(metrics)[0])
    per = (time.perf_counter() - t0) / n_meas
    print(f"{'full train step (wall, pipelined)':40s} {per*1e3:9.1f} ms "
          f"= {1/per:.2f} steps/s", flush=True)


if __name__ == "__main__":
    main()
