"""Bisect the CycleGAN generator fwd+bwd cost by stage, at production
3x512^2, using fully-forced losses (full-tensor sum + grad checksum —
sliced checksums get partially DCE'd, see perf_cyclegan_512.py history).

Stages measured in isolation AND cumulatively (each with/without IN):
stem (s2d-packed 7^2), down0/down1 (packed stride-2), 6 resnet blocks
(native 3x3 @128^2), up0/up1 (subpixel transposed), head (s2d-packed 7^2),
plus standalone instance_norm fwd+bwd at each shell resolution.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from flax import linen as nn

from raygun_tpu.nn import ResNet
from raygun_tpu.nn.layers import instance_norm
from raygun_tpu.nn.resnet import ResnetBlock

PEAK = 197e12
OVERHEAD = 0.0


def _time_compiled(c, args, n):
    _ = float(c(*args))
    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(c(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - OVERHEAD, 1e-9) / n


def bench(fn, *args, n=8):
    def scanned(*a):
        def body(carry, i):
            return carry + fn(*a, i).astype(jnp.float32), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
        return tot

    c = jax.jit(scanned).lower(*args).compile()
    cost = c.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return _time_compiled(c, args, n), float(cost.get("flops", 0))


def report(label, dt, fl):
    print(f"{label:50s} {dt*1e3:8.2f} ms  {fl/dt/1e12:6.1f} TF/s "
          f"({fl/dt/PEAK*100:5.1f}% MFU)")
    sys.stdout.flush()


def fwdbwd_module(mod, x, rngs_shape=None, n=8):
    """fwd+bwd of a flax module with full-sum loss + grad checksum."""
    p = jax.jit(lambda: mod.init(jax.random.PRNGKey(0), x[:1], train=False))()["params"]
    p = jax.tree.map(lambda q: q.astype(jnp.bfloat16), p)

    def loss(p, xx, i):
        y = mod.apply({"params": p}, xx + i.astype(xx.dtype) * 1e-6, train=True)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def step(p, xx, i):
        v, g = jax.value_and_grad(loss)(p, xx, i)
        return v + sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(g))

    return bench(step, p, x, n=n)


class ShellOnly(nn.Module):
    """ResNet with n_blocks=0: stem + downs + ups + head."""
    norm: str = "instance"

    @nn.compact
    def __call__(self, x, train=True):
        return ResNet(ndims=2, input_nc=1, output_nc=1, ngf=64, n_blocks=0,
                      padding_type="same", norm=self.norm)(x, train=train)


class BlocksOnly(nn.Module):
    norm: str = "instance"

    @nn.compact
    def __call__(self, x, train=True):
        h = x
        for i in range(6):
            h = ResnetBlock(dim=256, ndims=2, padding_type="same",
                            norm=self.norm if self.norm != "none" else None,
                            name=f"block_{i}")(h, train=train)
        return h


def main():
    global OVERHEAD
    print(f"device: {jax.devices()[0]}")
    x0 = jnp.float32(1.5)
    c = jax.jit(lambda v: v * 2 + 1).lower(x0).compile()
    _ = float(c(x0))
    best = 1e9
    for i in range(5):
        t0 = time.perf_counter()
        _ = float(c(x0 + i))
        best = min(best, time.perf_counter() - t0)
    OVERHEAD = best
    print(f"relay fixed overhead: {best*1e3:.1f} ms")

    k = jax.random.PRNGKey(0)
    batch = 3

    # standalone instance norm fwd+bwd at each shell resolution
    for side, ch in [(512, 64), (256, 128), (128, 256)]:
        x = jax.random.normal(k, (batch, side, side, ch), jnp.bfloat16)

        def inloss(xx, i):
            y = instance_norm(xx * (1.0 + i.astype(xx.dtype) * 1e-6))
            return jnp.sum(y.astype(jnp.float32) ** 2)

        def instep(xx, i):
            v, g = jax.value_and_grad(inloss)(xx, i)
            return v + jnp.sum(g.astype(jnp.float32))

        dt, fl = bench(instep, x, n=16)
        nbytes = x.size * 2
        print(f"{'IN alone fwd+bwd %dch @%d^2' % (ch, side):50s} "
              f"{dt*1e3:8.2f} ms  ({nbytes/1e6:.0f} MB tensor, "
              f"{9*nbytes/dt/1e9:.0f} GB/s equiv at 9 passes)")
        sys.stdout.flush()

    x1 = jax.random.uniform(k, (batch, 512, 512, 1), jnp.bfloat16) * 2 - 1
    xb = jax.random.normal(k, (batch, 128, 128, 256), jnp.bfloat16)

    for norm in ("instance", "none"):
        dt, fl = fwdbwd_module(ShellOnly(norm=norm), x1)
        report(f"shell-only ({norm}) fwd+bwd @512^2", dt, fl)
        dt, fl = fwdbwd_module(BlocksOnly(norm=norm), xb)
        report(f"6 blocks ({norm}) fwd+bwd @128^2x256", dt, fl)

    # full generator reference points
    for norm in ("instance", "none"):
        gen = ResNet(ndims=2, input_nc=1, output_nc=1, ngf=64, n_blocks=6,
                     padding_type="same", norm=norm)
        dt, fl = fwdbwd_module(gen, x1)
        report(f"full G ({norm}) fwd+bwd @512^2", dt, fl)


if __name__ == "__main__":
    main()
