"""Prototype + parity check: folded upsample+concat+conv.

Decoder step (valid, nearest x2 upsample, k=3):
  y = conv3(concat([crop(f_left), crop_dtf(repeat(g,2))]), W1)
splits into
  y = conv3(f_c, W1f) + crop(d2s(conv2(g, fold(W1g))))
where fold(W1g)[u, cg, (r,co)] = sum_{t:(r+t)//2==u} W1g[t, cg, co].
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


def conv3d(x, W, precision=None):
    return jax.lax.conv_general_dilated(
        x, W, (1, 1, 1), "VALID", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=precision)


def nearest_up(x, f=2):
    for d in range(3):
        x = jnp.repeat(x, f, axis=1 + d)
    return x


def depth_to_space3(y, f=2):
    b, Z, Y, X, rc = y.shape
    c = rc // f**3
    y = y.reshape(b, Z, Y, X, f, f, f, c)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return y.reshape(b, Z * f, Y * f, X * f, c)


def fold_kernel_up(W, f=2):
    """W (3,3,3,cg,co) -> (2,2,2, cg, f^3*co): out channel = (r, co)."""
    k = W.shape[0]
    cg, co = W.shape[3], W.shape[4]
    ntap = (f - 1 + k - 1) // f + 1
    W2 = np.zeros((ntap,) * 3 + (cg, f**3, co), np.asarray(W).dtype)
    Wn = np.asarray(W)
    for r in it.product(range(f), repeat=3):
        rflat = (r[0] * f + r[1]) * f + r[2]
        for t in it.product(range(k), repeat=3):
            u = tuple((rr + tt) // f for rr, tt in zip(r, t))
            W2[u[0], u[1], u[2], :, rflat, :] += Wn[t[0], t[1], t[2]]
    return W2.reshape((ntap,) * 3 + (cg, f**3 * co))


def fused_up_branch(g, W1g, f=2, precision=None):
    W2 = jnp.asarray(fold_kernel_up(np.asarray(W1g, np.float32), f)).astype(g.dtype)
    Y = conv3d(g, W2, precision)
    return depth_to_space3(Y, f)


def main():
    k = jax.random.PRNGKey(0)
    G, cg, co = 9, 4, 5
    g = jax.random.normal(k, (1, G, G, G, cg), jnp.float32)
    W1g = jax.random.normal(jax.random.fold_in(k, 1), (3, 3, 3, cg, co), jnp.float32)

    # reference: conv3 over the full upsampled grid (size 2G -> out 2G-2)
    gu = nearest_up(g)
    y_ref = conv3d(gu, W1g, "highest")
    y_fused = fused_up_branch(g, W1g, precision="highest")
    print("shapes:", y_ref.shape, y_fused.shape)
    err = float(jnp.max(jnp.abs(y_ref - y_fused)))
    print("parity err:", err)
    assert err < 1e-4, err

    # ---- perf at dec_L2 shapes: g (1,25^3,2592) -> out 48^3 x432
    N_SCAN = 8

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

    for name, Gc, cg2, co2 in [("dec_L2", 26, 2592, 432),
                               ("dec_L1", 47, 432, 72),
                               ("dec_L0", 89, 72, 12)]:
        g2 = jax.random.uniform(k, (1, Gc, Gc, Gc, cg2), jnp.bfloat16)
        W = (jax.random.normal(k, (3, 3, 3, cg2, co2), jnp.float32) * 0.05
             ).astype(jnp.bfloat16)
        W2 = jnp.asarray(fold_kernel_up(np.asarray(W, np.float32))).astype(jnp.bfloat16)
        t_ref = bench(lambda w, gg: conv3d(nearest_up(gg), w), W, g2)
        t_fus = bench(lambda w, gg: depth_to_space3(conv3d(gg, w)), W2, g2)
        # logical (reference) flops for the branch
        out = 2 * Gc - 2
        gflop = 2 * 27 * cg2 * co2 * out**3 / 1e9
        print(f"{name} up-branch {cg2}->{co2} @g{Gc}^3: ref {t_ref*1e3:7.2f} ms "
              f"| fused {t_fus*1e3:7.2f} ms  ({t_ref/t_fus:.2f}x)  "
              f"[{gflop:.0f} logical GFLOP]")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
