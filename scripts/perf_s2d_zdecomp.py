"""s2d-packed + z-decomposed conv for tiny-channel 3^3 convs:
pack (f=2) -> 2^3 conv at 8x channels -> run via zdecomp -> d2s.
Parity + perf vs plain zdecomp.
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

from raygun_tpu.nn.layers import (
    conv3d_zdecomp, conv_nd, space_to_depth, depth_to_space,
)

N_SCAN = 8


def pack_kernel_s2d(W, f=2):
    """W (3,3,3,ci,co) -> (2,2,2, f^3*ci, f^3*co)."""
    k = W.shape[0]
    ci, co = W.shape[3], W.shape[4]
    ntap = (f - 1 + k - 1) // f + 1
    W2 = np.zeros((ntap,) * 3 + (f**3, ci, f**3, co), np.asarray(W, np.float32).dtype)
    Wn = np.asarray(W, np.float32)
    for u in it.product(range(ntap), repeat=3):
        for v in it.product(range(f), repeat=3):
            vf = (v[0] * f + v[1]) * f + v[2]
            for r in it.product(range(f), repeat=3):
                rf = (r[0] * f + r[1]) * f + r[2]
                t = tuple(f * uu + vv - rr for uu, vv, rr in zip(u, v, r))
                if all(0 <= tt < k for tt in t):
                    W2[u[0], u[1], u[2], vf, :, rf, :] = Wn[t[0], t[1], t[2]]
    return W2.reshape((ntap,) * 3 + (f**3 * ci, f**3 * co))


def conv_s2d_zdecomp(x, W2, out_extent, precision=None):
    """x even-dims (pad outside); W2 packed; returns valid conv result."""
    X = space_to_depth(x, (2, 2, 2))
    Y = conv3d_zdecomp(X, W2, precision=precision)
    y = depth_to_space(Y, (2, 2, 2))
    return y[:, :out_extent[0], :out_extent[1], :out_extent[2], :]


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
    k0 = jax.random.PRNGKey(0)
    # parity
    x = jax.random.normal(k0, (1, 10, 12, 14, 3))
    W = jax.random.normal(jax.random.fold_in(k0, 1), (3, 3, 3, 3, 5))
    ref = conv_nd(x, W, precision="highest")
    W2 = jnp.asarray(pack_kernel_s2d(np.asarray(W)))
    got = conv_s2d_zdecomp(x, W2, ref.shape[1:4], precision="highest")
    err = float(jnp.max(jnp.abs(ref - got)))
    print("parity err:", err)
    assert err < 1e-4

    cases = [
        ("enc_L0 conv1 1->12", 388, 1, 12),
        ("enc_L0 conv2 12->12", 386, 12, 12),
        ("dec_L0 conv2 12->12", 298, 12, 12),
    ]
    for name, s, ci, co in cases:
        x = jax.random.uniform(k0, (1, s, s, s, ci), jnp.bfloat16)
        W = (jax.random.normal(k0, (3, 3, 3, ci, co), jnp.float32) * 0.05)
        W2 = jnp.asarray(pack_kernel_s2d(np.asarray(W))).astype(jnp.bfloat16)
        Wb = jnp.asarray(W, jnp.bfloat16)
        tz = bench(lambda xx, w: conv3d_zdecomp(xx, w), Wb, x)
        se = s if s % 2 == 0 else s - 1
        out_e = (s - 2,) * 3
        xe = jnp.pad(x, [(0, 0)] + [(0, (2 - s % 2) % 2)] * 3 + [(0, 0)]) if s % 2 else x
        ts = bench(lambda xx, w: conv_s2d_zdecomp(xx, w, out_e), W2, xe)
        gflop = 2 * 27 * ci * co * (s - 2) ** 3 / 1e9
        print(f"{name} @{s}^3: zdecomp {tz*1e3:7.2f} ms ({gflop/tz/1e3:5.2f} TF/s) "
              f"| s2d+zdecomp {ts*1e3:7.2f} ms ({gflop/ts/1e3:5.2f} TF/s logical)")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
