"""Bisect the generator FORWARD: cumulative prefixes of the exact chain.

perf_gphase_bisect.py: one G apply fwd = 32.8 ms / 9.3 GB at 3x512^2 bf16
— ~9x the activation floor. This rebuilds the ResNet generator stage by
stage (same modules/routes) and times cumulative prefixes to localize the
traffic. Scan-amortized per CLAUDE.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from flax import linen as nn

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from raygun_tpu.nn import ResNet
from raygun_tpu.nn.layers import ConvNd, ConvTransposeNd, instance_norm, pad_spatial
from raygun_tpu.nn.resnet import ResnetBlock

PEAK = 197e12


class Prefix(nn.Module):
    upto: int
    ngf: int = 64

    @nn.compact
    def __call__(self, x):
        stages = []

        def stem(h):
            h = pad_spatial(h, [(3, 3)] * 2, "reflect")
            h = ConvNd(features=self.ngf, kernel_size=(7, 7), padding="valid",
                       use_bias=True, name="stem")(h)
            return nn.relu(instance_norm(h))

        def down0(h):
            h = ConvNd(features=self.ngf * 2, kernel_size=(3, 3), strides=(2, 2),
                       padding=1, use_bias=True, name="down0")(h)
            return nn.relu(instance_norm(h))

        def down1(h):
            h = ConvNd(features=self.ngf * 4, kernel_size=(3, 3), strides=(2, 2),
                       padding=1, use_bias=True, name="down1")(h)
            return nn.relu(instance_norm(h))

        stages += [("stem+IN+relu", stem), ("down0+IN+relu", down0),
                   ("down1+IN+relu", down1)]
        for i in range(6):
            stages.append((
                f"block{i}",
                lambda h, i=i: ResnetBlock(
                    dim=self.ngf * 4, ndims=2, padding_type="same",
                    norm="instance", name=f"blk{i}")(h, train=True),
            ))

        def up0(h):
            h = ConvTransposeNd(features=self.ngf * 2, kernel_size=(3, 3),
                                strides=(2, 2), padding=1, output_padding=1,
                                use_bias=True, name="up0")(h)
            return nn.relu(instance_norm(h))

        def up1(h):
            h = ConvTransposeNd(features=self.ngf, kernel_size=(3, 3),
                                strides=(2, 2), padding=1, output_padding=1,
                                use_bias=True, name="up1")(h)
            return nn.relu(instance_norm(h))

        def head(h):
            h = pad_spatial(h, [(3, 3)] * 2, "reflect")
            h = ConvNd(features=1, kernel_size=(7, 7), padding="valid",
                       use_bias=True, name="head")(h)
            return jnp.tanh(h)

        stages += [("up0+IN+relu", up0), ("up1+IN+relu", up1),
                   ("head+tanh", head)]

        for name, fn in stages[: self.upto]:
            x = fn(x)
        return x

    N_STAGES = 12


def bench(c, args, n):
    from _bench_util import measure_overhead
    ovh = measure_overhead()
    _ = float(c(*args))
    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(c(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - ovh, 1e-9) / n


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    side, batch, n = 512, 3, 32
    x = jnp.zeros((batch, side, side, 1), jnp.bfloat16)

    prev = 0.0
    names = ["stem", "down0", "down1"] + [f"blk{i}" for i in range(6)] + [
        "up0", "up1", "head"]
    for upto in range(1, Prefix.N_STAGES + 1):
        m = Prefix(upto=upto)
        p = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x[:1]))()["params"]
        p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)

        def run(p, key):
            base = jax.random.uniform(key, x.shape, jnp.bfloat16) * 2 - 1

            def body(carry, i):
                xi = base * (1.0 + 1e-6 * i.astype(jnp.bfloat16))
                y = m.apply({"params": p}, xi)
                yf = y.astype(jnp.float32)
                return carry + jnp.sum(yf * yf), None
            tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
            return tot

        c = jax.jit(run).lower(p, jax.random.PRNGKey(1)).compile()
        cost = c.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        dt = bench(c, (p, jax.random.PRNGKey(2)), n)
        fl = float(cost.get("flops", 0.0))
        by = float(cost.get("bytes accessed", 0.0))
        print(f"upto {names[upto-1]:7s} {dt*1e3:7.2f} ms (+{(dt-prev)*1e3:6.2f})"
              f"  [{fl/1e9:7.1f} GF, {by/1e6:7.0f} MB]", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
