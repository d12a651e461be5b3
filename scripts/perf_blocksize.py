"""Perf experiment: MTLSD forward throughput vs block size, with device-side
scan timing (amortizes the axon relay's fixed per-execution overhead, which is
how real pipelined blockwise inference behaves anyway).

Usage: python scripts/perf_blocksize.py [sizes...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    from raygun_tpu.systems.mtlsd import MTLSDModel

    unet_kwargs = dict(
        input_nc=1, ngf=12, fmap_inc_factor=6,
        downsample_factors=[(2, 2, 2), (2, 2, 2), (2, 2, 2)],
        constant_upsample=True,
    )
    model = MTLSDModel(unet_kwargs=unet_kwargs, num_affs=20)
    sizes = [int(s) for s in sys.argv[1:]] or [196, 260, 292, 324, 356, 388]

    x_init = jnp.zeros((1, 196, 196, 196, 1), jnp.bfloat16)
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x_init, train=False)
    )()["params"]
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)

    N_SCAN = 4

    for side in sizes:
        shape = (1, side, side, side, 1)

        def scan_fwd(params, key):
            def body(carry, k):
                x = jax.random.uniform(k, shape, jnp.bfloat16)
                affs, lsds = model.apply({"params": params}, x, train=False)
                s = jnp.sum(affs.astype(jnp.float32)) + jnp.sum(
                    lsds.astype(jnp.float32))
                return carry + s, None
            keys = jax.random.split(key, N_SCAN)
            tot, _ = jax.lax.scan(body, jnp.float32(0), keys)
            return tot

        jit_scan = jax.jit(scan_fwd)
        try:
            t0 = time.perf_counter()
            compiled = jit_scan.lower(params, jax.random.PRNGKey(1)).compile()
            tc = time.perf_counter() - t0
        except Exception as e:
            print(f"{side}^3: COMPILE FAIL: {type(e).__name__}: {str(e)[:300]}")
            continue
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) / N_SCAN
        mem = compiled.memory_analysis()
        peak = getattr(mem, "temp_size_in_bytes", 0) + getattr(
            mem, "argument_size_in_bytes", 0)
        out_side = side - 92  # valid U-Net shrinkage for this arch
        out_voxels = out_side ** 3

        # run twice, take the better
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            s = compiled(params, jax.random.PRNGKey(2))
            _ = float(s)
            best = min(best, (time.perf_counter() - t0) / N_SCAN)
        vox_s = out_voxels / best
        tflops = flops / best / 1e12
        mfu = tflops / 197.0
        print(
            f"{side}^3->{out_side}^3: {best*1e3:7.1f} ms/block  "
            f"{vox_s/1e6:6.2f} Mvox/s  {tflops:5.1f} TFLOP/s  MFU {mfu*100:4.1f}%  "
            f"{flops/out_voxels/1e3:6.0f} kFLOP/vox  peakmem {peak/1e9:.2f} GB  "
            f"(compile {tc:.0f}s)"
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
