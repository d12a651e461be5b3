"""Honest (overhead-subtracted) decomposition of the CycleGAN shell ops.

Each op at its production shape (batch 3, 512² domain, bf16), fwd and
fwd+bwd, nonlinear checksums. The shell is what remains after the fused
resblocks: stem 7x7 1->64, down0 s2 64->128, up1 convT 128->64, head 7x7
64->1, and their instance norms.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from _bench_util import bench
from flax import linen as nn

from raygun_tpu.nn.layers import (
    ConvNd, ConvTransposeNd, instance_norm, pad_spatial,
)

PEAK = 197e12
B = 3


def gsum(t):
    return sum(jnp.sum(l.astype(jnp.float32) ** 2)
               for l in jax.tree.leaves(t))


def run_case(name, module, shape, flops, bwd=False, **apply_kw):
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros(shape, jnp.bfloat16)
    p = jax.jit(lambda: module.init(key, x0))().get("params", {})
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
    base = jax.random.normal(key, shape, jnp.bfloat16)

    if not bwd:
        def fn(p, i):
            xi = base * (1.0 + 1e-6 * i.astype(jnp.bfloat16))
            y = module.apply({"params": p}, xi).astype(jnp.float32)
            return jnp.sum(y * y)
        mult = 1
    else:
        def fn(p, i):
            xi = base * (1.0 + 1e-6 * i.astype(jnp.bfloat16))

            def loss(p, x):
                y = module.apply({"params": p}, x).astype(jnp.float32)
                return jnp.sum(y * y)
            l, g = jax.value_and_grad(loss, argnums=(0, 1))(p, xi)
            return l + gsum(g)
        mult = 3

    dt = bench(fn, p)
    fl = flops * mult
    tag = "fwd+bwd" if bwd else "fwd    "
    print(f"{name:34s} {tag} {dt*1e3:7.2f} ms  {fl/dt/1e12:6.1f} TF/s "
          f"({fl/dt/PEAK*100:5.1f}% MFU)", flush=True)


class Stem(nn.Module):
    with_in: bool = False

    @nn.compact
    def __call__(self, x):
        h = pad_spatial(x, [(3, 3)] * 2, "reflect")
        h = ConvNd(features=64, kernel_size=(7, 7), padding="valid")(h)
        if self.with_in:
            h = nn.relu(instance_norm(h))
        return h


class InOnly(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.relu(instance_norm(x))


class Down0(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = ConvNd(features=128, kernel_size=(3, 3), strides=(2, 2),
                   padding=1)(x)
        return nn.relu(instance_norm(h))


class Up1(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = ConvTransposeNd(features=64, kernel_size=(3, 3), strides=(2, 2),
                            padding=1, output_padding=1)(x)
        return nn.relu(instance_norm(h))


class Head(nn.Module):
    impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        h = pad_spatial(x, [(3, 3)] * 2, "reflect")
        return jnp.tanh(
            ConvNd(features=1, kernel_size=(7, 7), padding="valid",
                   impl=self.impl)(h))


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    S = 512
    f_stem = 2 * 49 * 1 * 64 * S * S * B
    f_d0 = 2 * 9 * 64 * 128 * (S // 2) ** 2 * B
    f_u1 = 2 * 9 * 128 * 64 * S * S * B // 2  # convT s2: per out voxel /4*9?
    f_head = 2 * 49 * 64 * 1 * S * S * B

    for bwd in (False, True):
        run_case("stem conv only", Stem(with_in=False),
                 (B, S, S, 1), f_stem, bwd)
        run_case("stem conv+IN+relu", Stem(with_in=True),
                 (B, S, S, 1), f_stem, bwd)
        run_case("IN+relu @512^2x64", InOnly(), (B, S, S, 64), 0.0001, bwd)
        run_case("down0 s2+IN+relu", Down0(), (B, S, S, 64), f_d0, bwd)
        run_case("up1 convT+IN+relu", Up1(), (B, S // 2, S // 2, 128),
                 f_u1, bwd)
        run_case("head 7x7+tanh [auto]", Head(), (B, S, S, 64), f_head, bwd)
        run_case("head 7x7+tanh [native]", Head(impl="native"),
                 (B, S, S, 64), f_head, bwd)


if __name__ == "__main__":
    main()
