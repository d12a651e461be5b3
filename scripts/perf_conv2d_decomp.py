"""Test: 3D conv as a sum of 2D convs over z-taps (z folded into batch),
with and without space-to-depth channel packing.

y[:, z, :, :, co] = sum_tz conv2d(x[:, z+tz, :, :, :], W[tz])   (valid)
"""

import itertools as it
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

N_SCAN = 8


def conv3d_plain(x, W):
    return jax.lax.conv_general_dilated(
        x, W, (1, 1, 1), "VALID", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def conv3d_as2d(x, W):
    """x (1, Z, Y, X, ci), W (kz, ky, kx, ci, co)."""
    b, Z, Y, X, ci = x.shape
    kz = W.shape[0]
    Zo = Z - kz + 1
    xb = x[0]  # (Z, Y, X, ci) — z as batch
    acc = None
    for tz in range(kz):
        term = jax.lax.conv_general_dilated(
            xb[tz:tz + Zo], W[tz], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        acc = term if acc is None else acc + term
    return acc[None][:, :, :, :, :] if False else acc[jnp.newaxis].reshape(
        (1, Zo) + acc.shape[1:])


def bench(fn, W, x):
    def scanned(W, x):
        def body(carry, i):
            xx = x + i.astype(x.dtype) * 1e-6
            out = fn(xx, W)
            return carry + jnp.sum(out.astype(jnp.float32)), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(N_SCAN))
        return tot
    c = jax.jit(scanned).lower(W, x).compile()
    _ = float(c(W, x))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(c(W, x))
        best = min(best, (time.perf_counter() - t0) / N_SCAN)
    return best


def main():
    k = jax.random.PRNGKey(0)
    # parity check
    x = jax.random.normal(k, (1, 8, 10, 12, 3), jnp.float32)
    W = jax.random.normal(jax.random.fold_in(k, 1), (3, 3, 3, 3, 5), jnp.float32)
    err = float(jnp.max(jnp.abs(conv3d_plain(x, W) - conv3d_as2d(x, W))))
    print("as2d parity err:", err)
    assert err < 1e-4

    cases = [
        ("enc_L0 conv1 1->12 @260", 260, 1, 12, 3),
        ("enc_L0 conv2 12->12 @258", 258, 12, 12, 3),
        ("dec_L0 conv1 84->12 @176", 176, 84, 12, 3),
        ("enc_L1 conv1 12->72 @124", 124, 12, 72, 3),
        ("enc_L1 conv2 72->72 @122", 122, 72, 72, 3),
        ("dec_L1 conv1 504->72 @92", 92, 504, 72, 3),
        ("enc_L2 conv2 432->432 @56", 56, 432, 432, 3),
        ("dec_L2 conv1 3024->432 @50", 50, 3024, 432, 3),
        ("enc_L3 conv2 2592->2592 @27", 27, 2592, 2592, 3),
    ]
    for name, s, ci, co, kk in cases:
        x = jax.random.uniform(k, (1, s, s, s, ci), jnp.bfloat16)
        W = (jax.random.normal(k, (kk, kk, kk, ci, co), jnp.float32) * 0.05).astype(jnp.bfloat16)
        t2 = bench(conv3d_as2d, W, x)
        gflop = 2 * kk**3 * ci * co * (s - kk + 1) ** 3 / 1e9
        print(f"{name}: as2d {t2*1e3:7.2f} ms ({gflop/t2/1e3:6.2f} TF/s, "
              f"{gflop/t2/1e3/197*100:4.1f}% MFU)")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
