"""Prototype + microbench: space-to-depth packed 3^3 valid conv for
small-channel stages (enc_L0/dec_L0 are <4% MFU with plain lax.conv).

Math: y[p,co] = sum_t x[p+t,ci] W[t,ci,co], p in [0,N-2)^3 (N even).
With p=2q+r, r in {0,1}^3 and X[q,(v,ci)] = x[2q+v,ci]:
  Y[q,(r,co)] = sum_u X[q+u,(v,ci)] W2[u,(v,ci),(r,co)],
  W2[u,(v,ci),(r,co)] = W[2u+v-r,ci,co] if 2u+v-r in [0,3)^3 else 0.
i.e. a 2^3 valid conv with 8x channels both sides; d2s(Y) == y exactly.
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


def space_to_depth3(x, f=2):
    """(b, Z, Y, X, c) -> (b, Z/f, Y/f, X/f, f^3*c); channel index = (vz,vy,vx,ci)."""
    b, Z, Y, X, c = x.shape
    x = x.reshape(b, Z // f, f, Y // f, f, X // f, f, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, Z // f, Y // f, X // f, f * f * f * c)


def depth_to_space3(y, f=2):
    b, Z, Y, X, rc = y.shape
    c = rc // f**3
    y = y.reshape(b, Z, Y, X, f, f, f, c)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return y.reshape(b, Z * f, Y * f, X * f, c)


def pack_kernel3(W):
    """W (3,3,3,ci,co) -> W2 (2,2,2, 8*ci, 8*co) with the s2d index map."""
    ci, co = W.shape[3], W.shape[4]
    W2 = np.zeros((2, 2, 2, 8, ci, 8, co), W.dtype)
    for u in it.product((0, 1), repeat=3):
        for v in it.product((0, 1), repeat=3):
            vflat = v[0] * 4 + v[1] * 2 + v[2]
            for r in it.product((0, 1), repeat=3):
                rflat = r[0] * 4 + r[1] * 2 + r[2]
                t = tuple(2 * uu + vv - rr for uu, vv, rr in zip(u, v, r))
                if all(0 <= tt <= 2 for tt in t):
                    W2[u[0], u[1], u[2], vflat, :, rflat, :] = W[t[0], t[1], t[2]]
    return W2.reshape(2, 2, 2, 8 * ci, 8 * co)


def conv_s2d(x, W2):
    X = space_to_depth3(x)
    Y = jax.lax.conv_general_dilated(
        X, W2, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return depth_to_space3(Y)


def conv_plain(x, W):
    return jax.lax.conv_general_dilated(
        x, W, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def check_parity():
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (1, 12, 10, 14, 3), jnp.float32)
    W = jax.random.normal(jax.random.fold_in(k, 1), (3, 3, 3, 3, 5), jnp.float32)
    y_ref = conv_plain(x, W)          # (1,10,8,12,5)
    W2 = pack_kernel3(np.asarray(W))
    y_s2d = conv_s2d(x, jnp.asarray(W2))
    # s2d output covers positions [0, N-2) per dim (one less than valid N-2
    # ... actually valid gives N-2 positions; s2d gives 2*(N/2-1) = N-2)
    print("shapes:", y_ref.shape, y_s2d.shape)
    err = float(jnp.max(jnp.abs(y_ref - y_s2d)))
    print("max abs err:", err)
    assert err < 1e-4


def bench(fn, *args):
    def scanned(*a):
        def body(carry, i):
            xx = a[-1] + i.astype(a[-1].dtype) * 1e-6
            out = fn(*a[:-1], xx)
            return carry + jnp.sum(out.astype(jnp.float32)), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(N_SCAN))
        return tot
    c = jax.jit(scanned).lower(*args).compile()
    _ = float(c(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(c(*args))
        best = min(best, (time.perf_counter() - t0) / N_SCAN)
    return best


def main():
    check_parity()
    k = jax.random.PRNGKey(0)
    cases = [
        ("enc_L0 conv1 1->12 @260", 260, 1, 12),
        ("enc_L0 conv2 12->12 @258", 258, 12, 12),
        ("dec_L0 conv1 84->12 @176", 176, 84, 12),
        ("dec_L0 conv2 12->12 @174", 174, 12, 12),
        ("enc_L1 conv1 12->72 @124", 124, 12, 72),
        ("dec_L1 conv2 72->72 @90", 90, 72, 72),
    ]
    for name, s, ci, co in cases:
        x = jax.random.uniform(k, (1, s, s, s, ci), jnp.bfloat16)
        W = (jax.random.normal(k, (3, 3, 3, ci, co), jnp.float32) * 0.1).astype(jnp.bfloat16)
        tp = bench(lambda w, xx: conv_plain(xx, w), W, x)
        se = s if s % 2 == 0 else s - 1
        xe = x[:, :se, :se, :se, :]
        W2 = jnp.asarray(pack_kernel3(np.asarray(W, np.float32))).astype(jnp.bfloat16)
        ts = bench(lambda w, xx: conv_s2d(xx, w), W2, xe)
        gflop = 2 * 27 * ci * co * (s - 2) ** 3 / 1e9
        print(f"{name}: plain {tp*1e3:7.2f} ms ({gflop/tp:6.0f} GF/s) | "
              f"s2d {ts*1e3:7.2f} ms ({gflop/ts:6.0f} GF/s eff)")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
