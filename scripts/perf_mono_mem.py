"""Plain (no scan harness) monolithic forward: compile memory + time vs size."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from raygun_tpu.systems.mtlsd import MTLSDModel


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [388, 420, 436, 452]
    unet_kwargs = dict(
        input_nc=1, ngf=12, fmap_inc_factor=6,
        downsample_factors=[(2, 2, 2)] * 3, constant_upsample=True,
    )
    model = MTLSDModel(unet_kwargs=unet_kwargs, num_affs=20)
    x0 = jnp.zeros((1, 196, 196, 196, 1), jnp.bfloat16)
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x0, train=False))()["params"]
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)

    for S in sizes:
        @jax.jit
        def probe(params, x):
            affs, lsds = model.apply({"params": params}, x, train=False)
            return jnp.sum(affs.astype(jnp.float32)) + jnp.sum(lsds.astype(jnp.float32))

        x = jnp.zeros((1, S, S, S, 1), jnp.bfloat16)
        try:
            c = probe.lower(params, x).compile()
        except Exception as e:
            print(f"{S}^3: COMPILE FAIL: {str(e)[:120]}")
            continue
        mem = c.memory_analysis()
        peak = getattr(mem, "temp_size_in_bytes", 0)
        arg = getattr(mem, "argument_size_in_bytes", 0)
        # time it: sequential distinct inputs, scalar fetch
        keys = jax.random.split(jax.random.PRNGKey(0), 4)
        xs = [jax.random.uniform(k, x.shape, jnp.bfloat16) for k in keys]
        jax.block_until_ready(xs)
        _ = float(c(params, xs[0]))
        t0 = time.perf_counter()
        vals = [c(params, xi) for xi in xs]
        _ = [float(v) for v in vals]
        dt = (time.perf_counter() - t0) / len(xs)
        out = S - 92
        print(f"{S}^3->{out}^3: temp {peak/1e9:.2f} GB + args {arg/1e9:.2f} GB; "
              f"{dt*1e3:.1f} ms/block, {out**3/dt/1e6:.2f} Mvox/s")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
