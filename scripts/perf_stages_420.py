"""Stage budget of the CURRENT (packed/fused/zdecomp) MTLSD forward at 420^3:
packed stem+pool | mid-UNet (enc1..dec1) | packed dec0+heads."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from raygun_tpu.systems.mtlsd import MTLSDModel

N = 8


def bench(fn, *args):
    def scanned(*a):
        def body(carry, i):
            out = fn(*a[:-1], a[-1] + i.astype(a[-1].dtype) * 1e-6)
            return carry + jnp.sum(out.astype(jnp.float32)), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(N))
        return tot
    c = jax.jit(scanned).lower(*args).compile()
    _ = float(c(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(c(*args))
        best = min(best, (time.perf_counter() - t0) / N)
    return best - 25e-3 / N  # subtract amortized relay overhead


def main():
    S = 420
    unet_kwargs = dict(input_nc=1, ngf=12, fmap_inc_factor=6,
                       downsample_factors=[(2, 2, 2)] * 3,
                       constant_upsample=True)
    model = MTLSDModel(unet_kwargs=unet_kwargs, num_affs=20)
    x0 = jnp.zeros((1, 196, 196, 196, 1), jnp.bfloat16)
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x0, train=False))()["params"]
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)

    from raygun_tpu.nn.unet import (ConvPass, FusedUpConvPass, PackedConvPass,
                                     PackedHead)
    from raygun_tpu.nn.layers import phase_max_pool, space_to_depth
    u = params["unet"]
    k = jax.random.PRNGKey(1)

    # stage A: s2d + packed stem + pool (fine 420 -> p0 208^3 x12)
    x = jax.random.uniform(k, (1, S, S, S, 1), jnp.bfloat16)
    cp0 = PackedConvPass(output_nc=12, kernel_sizes=[(3, 3, 3)] * 2)

    def stage_a(p, xx):
        xp = space_to_depth(xx, (2, 2, 2))
        f0p = cp0.apply({"params": p}, xp, cin=1)
        return phase_max_pool(f0p, (2, 2, 2), 12)

    t = bench(stage_a, u["l_conv_0"], x)
    print(f"stage A (packed stem+pool): {t*1e3:7.1f} ms")
    sys.stdout.flush()

    # stage B: mid UNet on p0 (208^3 x12 -> d1)
    p0 = jax.random.uniform(k, (1, 208, 208, 208, 12), jnp.bfloat16)

    def stage_b(up, pp):
        h = pp
        from raygun_tpu.nn.layers import max_pool_nd
        f_lefts = {}
        for depth in (1, 2, 3):
            h = ConvPass(output_nc=12 * 6**depth, kernel_sizes=[(3, 3, 3)] * 2
                         ).apply({"params": up[f"l_conv_{depth}"]}, h)
            if depth < 3:
                f_lefts[depth] = h
                h = max_pool_nd(h, (2, 2, 2))
        for depth in (2, 1):
            cf = [None, (4, 4, 4), (2, 2, 2)][depth]
            h = FusedUpConvPass(
                output_nc=12 * 6**depth, kernel_sizes=[(3, 3, 3)] * 2,
                scale_factor=(2, 2, 2), crop_factor=cf,
            ).apply({"params": up[f"r_conv_0_{depth}"]}, f_lefts[depth], h)
        return h

    t = bench(stage_b, u, p0)
    print(f"stage B (mid UNet enc1..dec1): {t*1e3:7.1f} ms")
    sys.stdout.flush()

    # stage C: packed dec0 + heads (f0p + d1 -> affs/lsds)
    f0p = jax.random.uniform(k, (1, 208, 208, 208, 96), jnp.bfloat16)
    d1 = jax.random.uniform(k, (1, 168, 168, 168, 72), jnp.bfloat16)
    fp0 = FusedUpConvPass(
        output_nc=12, kernel_sizes=[(3, 3, 3)] * 2, scale_factor=(2, 2, 2),
        crop_factor=(8, 8, 8), packed_skip=True,
    )
    ah = PackedHead(output_nc=20, cin=12)
    lh = PackedHead(output_nc=10, cin=12)

    def stage_c(ps, dd):
        zp = fp0.apply({"params": ps["r_conv_0_0"]}, f0p, dd)
        return (jnp.sum(ah.apply({"params": ps["aff_head"]}, zp).astype(jnp.float32))
                + jnp.sum(lh.apply({"params": ps["lsd_head"]}, zp).astype(jnp.float32))
                ).reshape(1)

    ps = {"r_conv_0_0": u["r_conv_0_0"], "aff_head": params["aff_head"],
          "lsd_head": params["lsd_head"]}
    t = bench(stage_c, ps, d1)
    print(f"stage C (packed dec0+heads): {t*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
