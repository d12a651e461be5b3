"""Race TPU implementations of the bilinear elastic/rotation warp.

Suspect (perf_cyclegan_batch.py): the CycleGAN make_batch costs ~hundreds
of ms/step at 3x512^2, and its warp uses jax.scipy.ndimage.map_coordinates
— an arbitrary-index gather, the classic XLA:TPU slow path (no hardware
gather; XLA emits serialized loads). Candidates, all computing the SAME
bilinear sample of a (734, 734) source at (2, 512, 512) coordinates:

  a. map_coordinates            (current augment.warp)
  b. row-gather + lane-gather   (split axes: take() rows, take_along_axis x)
  c. flattened 1D gather        (y0*W+x0 single index per tap)
  d. one-hot matmul x-pass      (row gather for y; x interp as MXU matmul
                                 against a per-row 2-hot matrix -- exact)

Run at the production workload: batch 6 (3 crops x 2 sides), fp32.
Usage: python scripts/perf_warp.py [side] [margin]
"""

import os
import sys
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
    """Shared bilinear tap setup: integer corners + weights, clamped."""
    y, x = coords[0], coords[1]
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, SRC - 2)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, SRC - 2)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    return y0, x0, fy, fx


def v_map_coordinates(img, key, i):
    c = coords_of(jax.random.fold_in(key, i))
    out = jax.vmap(lambda im: warp(im, c, order=1))(img)
    return jnp.sum(out)


def v_rowgather_lanegather(img, key, i, chunk=64):
    """Gather full source rows per output pixel (row gathers are the
    TPU-friendly axis), lerp in y, then lane-gather x taps. Traffic is
    SRC lanes per output pixel (~180x the 4-tap ideal) but it's streaming
    reads, not serialized scalar gathers. Chunked over x' to bound memory
    ([SIDE, chunk, SRC] per step)."""
    c = coords_of(jax.random.fold_in(key, i))
    y0, x0, fy, fx = taps(c)

    def one(im):
        def do_chunk(args):
            y0c, x0c, fyc, fxc = args          # [SIDE, chunk]
            r0 = jnp.take(im, y0c.reshape(-1), axis=0
                          ).reshape(SIDE, chunk, SRC)
            r1 = jnp.take(im, (y0c + 1).reshape(-1), axis=0
                          ).reshape(SIDE, chunk, SRC)
            row = r0 * (1 - fyc)[..., None] + r1 * fyc[..., None]
            v0 = jnp.take_along_axis(row, x0c[..., None], axis=2)[..., 0]
            v1 = jnp.take_along_axis(row, (x0c + 1)[..., None], axis=2)[..., 0]
            return v0 * (1 - fxc) + v1 * fxc

        n = SIDE // chunk
        resh = lambda a: a.reshape(SIDE, n, chunk).transpose(1, 0, 2)
        out = jax.lax.map(do_chunk, (resh(y0), resh(x0), resh(fy), resh(fx)))
        return out  # [n, SIDE, chunk]

    return jnp.sum(jax.vmap(one)(img))


def v_flat_gather(img, key, i):
    c = coords_of(jax.random.fold_in(key, i))
    y0, x0, fy, fx = taps(c)
    base = y0 * SRC + x0

    def one(im):
        f = im.reshape(-1)
        v00 = jnp.take(f, base)
        v01 = jnp.take(f, base + 1)
        v10 = jnp.take(f, base + SRC)
        v11 = jnp.take(f, base + SRC + 1)
        top = v00 * (1 - fx) + v01 * fx
        bot = v10 * (1 - fx) + v11 * fx
        return top * (1 - fy) + bot * fy

    return jnp.sum(jax.vmap(one)(img))


def v_onehot_matmul(img, key, i):
    """y by row gather (efficient on TPU), x by 2-hot MXU contraction:
    out[r, x'] = sum_x row[r, x] * M[r, x, x'] with M 2-hot in x. The
    contraction is einsum over per-row matrices — SIDE x (SRC x SIDE)
    matmuls, ~2x512x734x512 flops = 0.4 GFLOP/image, trivial for the MXU;
    M is built with iota compares (no gather)."""
    c = coords_of(jax.random.fold_in(key, i))
    y0, x0, fy, fx = taps(c)

    xs = jnp.arange(SRC, dtype=jnp.int32)
    chunk = 64

    # y0 varies with x' (rotation mixes axes), so rows are gathered per
    # (r, x') pair and lerped in y first; x then interps via a 2-hot
    # compare-multiply-reduce (pure VPU, no lane gather — XLA fuses the
    # 2-hot construction into the reduction). Chunked over x'.
    def one2(im):
        def do_chunk(args):
            y0c, x0c, fyc, fxc = args
            r0 = jnp.take(im, y0c.reshape(-1), axis=0
                          ).reshape(SIDE, chunk, SRC)
            r1 = jnp.take(im, (y0c + 1).reshape(-1), axis=0
                          ).reshape(SIDE, chunk, SRC)
            row = r0 * (1 - fyc)[..., None] + r1 * fyc[..., None]
            m2 = ((xs[None, None, :] == x0c[..., None]) * (1 - fxc)[..., None]
                  + (xs[None, None, :] == (x0c + 1)[..., None])
                  * fxc[..., None]).astype(jnp.float32)
            return jnp.sum(row * m2, axis=-1)

        n = SIDE // chunk
        resh = lambda a: a.reshape(SIDE, n, chunk).transpose(1, 0, 2)
        return jax.lax.map(do_chunk, (resh(y0), resh(x0), resh(fy), resh(fx)))

    return jnp.sum(jax.vmap(one2)(img))


def main():
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (BATCH, SRC, SRC), jnp.float32)

    # parity check first (CPU-cheap shapes would differ; do it on-device)
    c = coords_of(jax.random.fold_in(key, 123))
    ref = jax.jit(lambda im: jax.vmap(lambda a: warp(a, c, order=1))(im))(img)
    for name, fn in [("rowgather", v_rowgather_lanegather),
                     ("flat", v_flat_gather), ("onehot", v_onehot_matmul)]:
        # re-run with same key to compare sums
        s_ref = float(jnp.sum(ref))
        s = float(jax.jit(lambda im: fn(im, key, 123 * 0 + 123))(img))
        # fold_in(key,123) must match coords_of in fn
        print(f"parity {name}: ref={s_ref:.3f} got={s:.3f} "
              f"rel={(abs(s - s_ref) / (abs(s_ref) + 1e-9)):.2e}")

    for name, fn in [("map_coordinates", v_map_coordinates),
                     ("rowgather+lane", v_rowgather_lanegather),
                     ("flat 1D gather", v_flat_gather),
                     ("onehot matmul", v_onehot_matmul)]:
        dt = bench(fn, img, key)
        print(f"{name:18s} {dt*1e3:8.2f} ms / batch-{BATCH} warp")


if __name__ == "__main__":
    main()
