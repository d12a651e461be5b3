"""Compile-only memory ablation of the MTLSD forward at a given size."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from raygun_tpu.systems.mtlsd import MTLSDModel
import raygun_tpu.nn.layers as L


def probe(model, S):
    x0 = jnp.zeros((1, 100, 100, 100, 1), jnp.bfloat16)
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x0, train=False))()["params"]
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)

    @jax.jit
    def f(params, x):
        affs, lsds = model.apply({"params": params}, x, train=False)
        return jnp.sum(affs.astype(jnp.float32)) + jnp.sum(lsds.astype(jnp.float32))

    x = jnp.zeros((1, S, S, S, 1), jnp.bfloat16)
    try:
        c = f.lower(params, x).compile()
    except Exception as e:
        return None
    return getattr(c.memory_analysis(), "temp_size_in_bytes", 0) / 1e9


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 388
    base = dict(input_nc=1, ngf=12, fmap_inc_factor=6,
                downsample_factors=[(2, 2, 2)] * 3, constant_upsample=True)

    variants = [
        ("current (fused + zdecomp)", dict(), "auto"),
        ("no fused upsample", dict(fuse_upsample=False), "auto"),
        ("no zdecomp", dict(), "native"),
        ("neither", dict(fuse_upsample=False), "native"),
    ]
    for name, extra, impl in variants:
        old = L.ZDECOMP_MAX_MIN_CHANNELS
        if impl == "native":
            L.ZDECOMP_MAX_MIN_CHANNELS = -1
        try:
            m = MTLSDModel(unet_kwargs={**base, **extra}, num_affs=20)
            t = probe(m, S)
        finally:
            L.ZDECOMP_MAX_MIN_CHANNELS = old
        print(f"{name}: temp {t if t is None else round(t, 2)} GB")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
