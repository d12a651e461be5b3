"""Isolated A/B: 6-block chain megakernel vs per-block fused kernels.

Production block-stack shape (3, 128, 128, 256) bf16 (3x512^2 generator
after two downsamples). Relay discipline per CLAUDE.md: device-side scan,
vary inputs per iteration, checksum forces execution.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from raygun_tpu.nn.pallas.resblock import resblock_fused
from raygun_tpu.nn.pallas.resblock_chain import resblock_chain_fused
from raygun_tpu.nn.pallas.resblock_chain_bwd import resblock_chain_bwdfused

N = 6
B = int(os.environ.get("BATCH", "3"))  # 6 = the sibling-batched G2 chain
H, W, C = int(os.environ.get("SIDE", "128")), 128, 256
ITERS = 8


def make_params(key):
    ks = jax.random.split(key, 4)
    w1s = jax.random.normal(ks[0], (N, 3, 3, C, C), jnp.bfloat16) * 0.05
    b1s = jax.random.normal(ks[1], (N, C), jnp.bfloat16) * 0.1
    w2s = jax.random.normal(ks[2], (N, 3, 3, C, C), jnp.bfloat16) * 0.05
    b2s = jax.random.normal(ks[3], (N, C), jnp.bfloat16) * 0.1
    return w1s, b1s, w2s, b2s


def seq_chain(x, w1s, b1s, w2s, b2s):
    h = x
    for i in range(N):
        h = resblock_fused(h, w1s[i], b1s[i], w2s[i], b2s[i])
    return h


def bench(name, fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    _ = float(c(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(c(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best / ITERS * 1e3:7.3f} ms", flush=True)
    return best / ITERS


def main():
    print(f"device: {jax.devices()[0]}  shape=({B},{H},{W},{C}) x{N} blocks")
    params = make_params(jax.random.PRNGKey(0))

    def fwd_only(net):
        def run(params, key):
            def body(carry, k):
                x = jax.random.uniform(k, (B, H, W, C), jnp.bfloat16) * 2 - 1
                y = net(x, *params)
                return carry + jnp.sum(y.astype(jnp.float32)), None
            tot, _ = jax.lax.scan(body, jnp.float32(0),
                                  jax.random.split(key, ITERS))
            return tot
        return run

    def fwdbwd(net):
        def run(params, key):
            def body(carry, k):
                x = jax.random.uniform(k, (B, H, W, C), jnp.bfloat16) * 2 - 1
                def loss(p, xx):
                    return jnp.sum(net(xx, *p).astype(jnp.float32))
                v, (gp, gx) = jax.value_and_grad(loss, argnums=(0, 1))(
                    params, x)
                cks = sum(jnp.sum(t.astype(jnp.float32) ** 2)
                          for t in jax.tree.leaves((gp, gx)))
                return carry + v + cks, None
            tot, _ = jax.lax.scan(body, jnp.float32(0),
                                  jax.random.split(key, ITERS))
            return tot
        return run

    k = jax.random.PRNGKey(1)
    t_sf = bench("per-block fwd", fwd_only(seq_chain), params, k)
    t_cf = bench("chain fwd", fwd_only(resblock_chain_fused), params, k)
    t_sb = bench("per-block fwd+bwd", fwdbwd(seq_chain), params, k)
    t_cb = bench("chain fwd+bwd", fwdbwd(resblock_chain_fused), params, k)
    # chain-resident BACKWARD (per-block fwd kernels + one bwd kernel)
    t_nb = bench("chainbwd fwd+bwd", fwdbwd(resblock_chain_bwdfused),
                 params, k)
    print(f"\nfwd: {t_sf*1e3:.3f} -> {t_cf*1e3:.3f} ms "
          f"({(t_sf-t_cf)*1e3:+.3f}); "
          f"fwd+bwd: {t_sb*1e3:.3f} -> {t_cb*1e3:.3f} ms "
          f"({(t_sb-t_cb)*1e3:+.3f}); "
          f"chainbwd: {t_sb*1e3:.3f} -> {t_nb*1e3:.3f} ms "
          f"({(t_sb-t_nb)*1e3:+.3f})")


if __name__ == "__main__":
    main()
