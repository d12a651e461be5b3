"""Decompose the CycleGAN step cost: G fwd, G fwd+bwd, D fwd+bwd, norm cost."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from raygun_tpu.nn import NLayerDiscriminator, ResNet

N = 8


def bench(fn, *args):
    def scanned(*a):
        def body(carry, i):
            out = fn(*a[:-1], a[-1] + i.astype(a[-1].dtype) * 1e-6)
            return carry + jnp.sum(out.astype(jnp.float32)) if out.ndim else carry + out.astype(jnp.float32), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(N))
        return tot
    c = jax.jit(scanned).lower(*args).compile()
    cost = c.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    fl = float(cost.get("flops", 0))
    _ = float(c(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(c(*args))
        best = min(best, (time.perf_counter() - t0) / N)
    return best, fl


def main():
    side, batch = 256, 3
    k = jax.random.PRNGKey(0)
    x = jax.random.uniform(k, (batch, side, side, 1), jnp.bfloat16) * 2 - 1

    for norm, label in [("instance", "instnorm"), (None, "no-norm")]:
        gen = ResNet(ndims=2, input_nc=1, output_nc=1, ngf=64, n_blocks=6,
                     padding_type="same", norm=norm) if norm else ResNet(
                     ndims=2, input_nc=1, output_nc=1, ngf=64, n_blocks=6,
                     padding_type="same", norm="none")
        gp = jax.jit(lambda: gen.init(jax.random.PRNGKey(0), x[:1], train=False))()["params"]
        gp = jax.tree.map(lambda p: p.astype(jnp.bfloat16), gp)

        dt, fl = bench(lambda p, xx: gen.apply({"params": p}, xx, train=True), gp, x)
        print(f"G fwd ({label}): {dt*1e3:6.1f} ms  {fl/dt/1e12:5.1f} TF/s ({fl/dt/197e12*100:4.1f}% MFU)")

        def loss(p, xx):
            return jnp.sum(gen.apply({"params": p}, xx, train=True) ** 2)

        dt, fl = bench(lambda p, xx: jax.value_and_grad(loss)(p, xx)[0], gp, x)
        print(f"G fwd+bwd ({label}): {dt*1e3:6.1f} ms  {fl/dt/1e12:5.1f} TF/s ({fl/dt/197e12*100:4.1f}% MFU)")
        sys.stdout.flush()

    disc = NLayerDiscriminator(ndims=2, input_nc=1, ngf=64, n_layers=3, kw=3,
                               downsampling_kw=2, norm="instance")
    dp = jax.jit(lambda: disc.init(jax.random.PRNGKey(1), x[:1], train=False))()["params"]
    dp = jax.tree.map(lambda p: p.astype(jnp.bfloat16), dp)
    dt, fl = bench(lambda p, xx: disc.apply({"params": p}, xx, train=True), dp, x)
    print(f"D fwd: {dt*1e3:6.1f} ms  {fl/dt/1e12:5.1f} TF/s ({fl/dt/197e12*100:4.1f}% MFU)")

    def dl(p, xx):
        return jnp.sum(disc.apply({"params": p}, xx, train=True) ** 2)

    dt, fl = bench(lambda p, xx: jax.value_and_grad(dl)(p, xx)[0], dp, x)
    print(f"D fwd+bwd: {dt*1e3:6.1f} ms  {fl/dt/1e12:5.1f} TF/s ({fl/dt/197e12*100:4.1f}% MFU)")


if __name__ == "__main__":
    main()
