"""Race warp implementations with PER-CROP coordinates (the real path).

perf_warp.py raced batch-6 warps sharing ONE coordinate field and saw
map_coordinates at 8.7 ms; the system path (perf_cyclegan_makebatch.py)
measures ~80 ms for the same six warps because each crop draws its OWN
elastic+rotation field — a fully batched gather, not a shared-index one.
This race vmaps coords per crop, matching systems/cyclegan.py.

Usage: python scripts/perf_warp2.py [side] [margin]
"""

import os
import sys
import math
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from raygun_tpu.io.augment import elastic_coordinates, warp

SIDE = int(sys.argv[1]) if len(sys.argv) > 1 else 512
MARGIN = int(sys.argv[2]) if len(sys.argv) > 2 else 111
SRC = SIDE + 2 * MARGIN
BATCH = 6
N = 16


def bench(fn, *args):
    def scanned(*a):
        def body(carry, i):
            return carry + fn(*a, i), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(N))
        return tot

    c = jax.jit(scanned).lower(*args).compile()
    _ = float(c(*args))
    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(c(*args))
        best = min(best, time.perf_counter() - t0)
    return best / N


def coords_of(key):
    return elastic_coordinates(
        key, (SRC, SRC), (SIDE, SIDE), (25, 25), (1.0, 1.0), subsample=4)


def taps(coords):
    y, x = coords[0], coords[1]
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, SRC - 2)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, SRC - 2)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    return y0, x0, fy, fx


def percrop(one_fn):
    """vmap (image, its own coords key) pairs."""
    def v(img, key, i):
        keys = jax.vmap(
            lambda j: jax.random.fold_in(jax.random.fold_in(key, i), j)
        )(jnp.arange(BATCH))
        return jnp.sum(jax.vmap(one_fn)(img, keys))
    return v


def one_mapcoords(im, k):
    return jnp.sum(warp(im, coords_of(k), order=1))


def one_flat(im, k):
    y0, x0, fy, fx = taps(coords_of(k))
    base = y0 * SRC + x0
    f = im.reshape(-1)
    v00 = jnp.take(f, base)
    v01 = jnp.take(f, base + 1)
    v10 = jnp.take(f, base + SRC)
    v11 = jnp.take(f, base + SRC + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return jnp.sum(top * (1 - fy) + bot * fy)


def one_rowgather(im, k, chunk=64):
    y0, x0, fy, fx = taps(coords_of(k))

    def do_chunk(args):
        y0c, x0c, fyc, fxc = args
        r0 = jnp.take(im, y0c.reshape(-1), axis=0).reshape(SIDE, chunk, SRC)
        r1 = jnp.take(im, (y0c + 1).reshape(-1), axis=0
                      ).reshape(SIDE, chunk, SRC)
        row = r0 * (1 - fyc)[..., None] + r1 * fyc[..., None]
        v0 = jnp.take_along_axis(row, x0c[..., None], axis=2)[..., 0]
        v1 = jnp.take_along_axis(row, (x0c + 1)[..., None], axis=2)[..., 0]
        return v0 * (1 - fxc) + v1 * fxc

    n = SIDE // chunk
    resh = lambda a: a.reshape(SIDE, n, chunk).transpose(1, 0, 2)
    out = jax.lax.map(do_chunk, (resh(y0), resh(x0), resh(fy), resh(fx)))
    return jnp.sum(out)


def one_shears(im, k):
    from raygun_tpu.io.augment import elastic_params, warp_shears
    theta, disp = elastic_params(
        k, (SRC, SRC), (25, 25), (1.0, 1.0), subsample=4)
    return jnp.sum(warp_shears(im, theta, disp, (SIDE, SIDE), max_disp=4.0))


def psnr_check(img, key):
    """Compare warp_shears vs direct map_coordinates on the SAME params."""
    import numpy as np
    from raygun_tpu.io.augment import elastic_params, warp_shears

    # smooth image: blurred noise (EM-ish long-range structure)
    base = jax.random.uniform(key, (SRC, SRC), jnp.float32)
    for _ in range(3):
        base = (base + jnp.roll(base, 1, 0) + jnp.roll(base, -1, 0)
                + jnp.roll(base, 1, 1) + jnp.roll(base, -1, 1)) / 5.0

    for name, theta_fix, sig in [("theta=0", 0.0, 1.0),
                                 ("theta=pi/2", math.pi / 2, 0.0),
                                 ("theta=0.3", 0.3, 1.0),
                                 ("theta=1.2", 1.2, 1.0)]:
        k = jax.random.fold_in(key, hash(name) % 1000)
        theta, disp = elastic_params(k, (SRC, SRC), (25, 25), (sig, sig),
                                     subsample=4)
        theta = jnp.float32(theta_fix)
        disp = jnp.clip(disp, -4.0, 4.0)
        fast = warp_shears(base, theta, disp, (SIDE, SIDE), max_disp=4.0)
        # direct: coords = R(theta)(v-c) + disp(v) + c at crop positions
        c = (SRC - 1) / 2.0
        off = (SRC - SIDE) // 2
        g = jnp.meshgrid(jnp.arange(SIDE, dtype=jnp.float32) + off - c,
                         jnp.arange(SIDE, dtype=jnp.float32) + off - c,
                         indexing="ij")
        ct, st = jnp.cos(theta), jnp.sin(theta)
        dc = disp[:, off:off + SIDE, off:off + SIDE]
        coords = jnp.stack([ct * g[0] - st * g[1] + dc[0] + c,
                            st * g[0] + ct * g[1] + dc[1] + c])
        direct = warp(base, coords, order=1)
        err = np.asarray(fast - direct)
        rng = float(jnp.max(direct) - jnp.min(direct))
        mse = float(np.mean(err ** 2))
        psnr = 10 * np.log10(rng ** 2 / mse) if mse > 0 else float("inf")
        print(f"  {name:12s} sigma={sig}: max|d|={np.abs(err).max():.2e} "
              f"PSNR={psnr:.1f} dB")


def main():
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (BATCH, SRC, SRC), jnp.float32)

    psnr_check(img[0] * 0 + jax.random.uniform(key, (SRC, SRC)), key)

    fns = [("map_coordinates", percrop(one_mapcoords)),
           ("flat 1D gather", percrop(one_flat)),
           ("rowgather+lane", percrop(one_rowgather)),
           ("3-shear rolls", percrop(one_shears))]
    # parity
    outs = [float(jax.jit(lambda im, f=fn: f(im, key, 0))(img))
            for _, fn in fns]
    print("parity sums:", " ".join(f"{s:.2f}" for s in outs))
    for name, fn in fns:
        dt = bench(fn, img, key)
        print(f"{name:18s} {dt*1e3:8.2f} ms / batch-{BATCH} per-crop warp",
              flush=True)


if __name__ == "__main__":
    main()
