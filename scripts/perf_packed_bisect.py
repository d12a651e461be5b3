"""Bisect WHERE the packed shell loses inside the full GAN step.

Isolated G apply fwd+bwd improves 66.2 -> 46.2 ms with the packed shell,
yet the full production step REGRESSES 389 -> 451 ms. Measure each
structural unit of the G phase packed vs standard to find the interaction.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from _bench_util import bench

from raygun_tpu.nn.discriminator import NLayerDiscriminator
from raygun_tpu.nn.resnet import ResNet

B, S, NGF = 3, 512, 64
DT = jnp.bfloat16


def gsum(t):
    return sum(jnp.sum(l.astype(jnp.float32) ** 2)
               for l in jax.tree.leaves(t))


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    G = ResNet(ndims=2, input_nc=1, output_nc=1, ngf=NGF, n_blocks=9)
    D = NLayerDiscriminator(ndims=2, input_nc=1, ngf=NGF, norm="instance")
    x0 = jnp.zeros((B, S, S, 1), DT)
    key = jax.random.PRNGKey(0)
    base = jax.random.normal(key, (B, S, S, 1), DT)

    def cast(p):
        return jax.tree.map(lambda a: a.astype(DT), p)

    pG1 = cast(jax.jit(lambda: G.init(jax.random.PRNGKey(1), x0))())
    pG2 = cast(jax.jit(lambda: G.init(jax.random.PRNGKey(2), x0))())
    pD = cast(jax.jit(lambda: D.init(jax.random.PRNGKey(3), x0))())

    def run(name, loss):
        def f(i):
            xi = base * (1.0 + 1e-6 * i.astype(DT))
            l, g = jax.value_and_grad(
                lambda ps: loss(ps, xi))((pG1, pG2))
            return l + gsum(g)
        dt = bench(f)
        print(f"{name:44s} fwd+bwd {dt*1e3:8.2f} ms", flush=True)

    def cases():
        run("G1 apply",
            lambda ps, xi: jnp.sum(G.apply(ps[0], xi).astype(jnp.float32) ** 2))
        run("cycle G2(G1(x))",
            lambda ps, xi: jnp.sum(
                G.apply(ps[1], G.apply(ps[0], xi)).astype(jnp.float32) ** 2))
        run("D(G1(x))  (grads wrt G only)",
            lambda ps, xi: jnp.sum(
                D.apply(pD, G.apply(ps[0], xi)).astype(jnp.float32) ** 2))
        run("cycle + D(fake)",
            lambda ps, xi: (
                lambda fake: jnp.sum(
                    G.apply(ps[1], fake).astype(jnp.float32) ** 2)
                + jnp.sum(D.apply(pD, fake).astype(jnp.float32) ** 2)
            )(G.apply(ps[0], xi)))

    for label, env in (("PACKED", None),
                       ("STANDARD", "RAYGUN_DISABLE_PACKED_SHELL")):
        print(f"--- {label}", flush=True)
        if env:
            os.environ[env] = "1"
        try:
            cases()
        finally:
            if env:
                os.environ.pop(env, None)


if __name__ == "__main__":
    main()
