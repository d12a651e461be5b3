"""Localize the packed head's backward cost (3x512^2, ngf=64, co=1).

perf_packed_stages.py: head fwd 1.91 ms, fwd+bwd 13.87 ms. The packed
head is a stride-4 coarse conv (f_out=8 over granularity-2 cells); its
autodiff backward runs a lhs-dilated transpose conv (dx) and a strided
wgrad (dw). This script splits dx vs dw and sweeps f_out.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from _bench_util import bench, measure_overhead

from raygun_tpu.nn import packed_shell

NGF = 64
B, S = 3, 512


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    print(f"relay overhead: {measure_overhead()*1e3:.1f} ms", flush=True)
    k = jax.random.PRNGKey(0)
    hp = (jax.random.normal(k, (B, S // 2, S // 2, 4 * NGF), jnp.float32)
          ).astype(jnp.bfloat16)
    w = (jax.random.normal(k, (7, 7, NGF, 1), jnp.float32) * 0.05).astype(
        jnp.bfloat16)
    b = jnp.zeros((1,), jnp.bfloat16)

    def loss(w, x):
        y = packed_shell.head_from_packed(x, w, b)
        yf = y.astype(jnp.float32)
        return jnp.sum(yf * yf)

    for f in (8, 4, 2):
        os.environ["RAYGUN_PACKED_HEAD_FOUT"] = str(f)

        def fwd(w, x, i):
            return loss(w, x * (1.0 + 1e-6 * i.astype(x.dtype)))

        def bwd_x(w, x, i):
            xi = x * (1.0 + 1e-6 * i.astype(x.dtype))
            v, gx = jax.value_and_grad(loss, argnums=1)(w, xi)
            return v + jnp.sum(gx.astype(jnp.float32))

        def bwd_w(w, x, i):
            xi = x * (1.0 + 1e-6 * i.astype(x.dtype))
            v, gw = jax.value_and_grad(loss, argnums=0)(w, xi)
            return v + jnp.sum(gw.astype(jnp.float32))

        def bwd_both(w, x, i):
            xi = x * (1.0 + 1e-6 * i.astype(x.dtype))
            v, (gw, gx) = jax.value_and_grad(loss, argnums=(0, 1))(w, xi)
            return (v + jnp.sum(gx.astype(jnp.float32))
                    + jnp.sum(gw.astype(jnp.float32)))

        tf = bench(fwd, w, hp, n=64)
        tx = bench(bwd_x, w, hp, n=64)
        tw = bench(bwd_w, w, hp, n=64)
        tb = bench(bwd_both, w, hp, n=64)
        print(f"f_out={f}:  fwd {tf*1e3:6.2f}  +dx {tx*1e3:6.2f}  "
              f"+dw {tw*1e3:6.2f}  +both {tb*1e3:6.2f} ms", flush=True)
    os.environ.pop("RAYGUN_PACKED_HEAD_FOUT", None)


if __name__ == "__main__":
    main()
