"""Packed vs standard generator shell at the production CycleGAN shape.

Measures (honest harness: relay overhead subtracted, nonlinear checksums,
grad checksum folded into the scalar): each packed shell op, then the full
ResNet generator apply fwd / fwd+bwd under both routes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from _bench_util import bench

from raygun_tpu.nn.packed_shell import (
    down0_from_packed, head_from_packed, stem_packed, up1_to_packed,
)
from raygun_tpu.nn.pallas.instance_norm import instance_norm_act_packed
from raygun_tpu.nn.resnet import ResNet

B, S, NGF = 3, 512, 64
DT = jnp.bfloat16


def gsum(t):
    return sum(jnp.sum(l.astype(jnp.float32) ** 2)
               for l in jax.tree.leaves(t))


def run(name, fn, base, bwd=False):
    if not bwd:
        def f(i):
            xi = base * (1.0 + 1e-6 * i.astype(base.dtype))
            return jnp.sum(fn(xi).astype(jnp.float32) ** 2)
    else:
        def f(i):
            xi = base * (1.0 + 1e-6 * i.astype(base.dtype))
            l, g = jax.value_and_grad(
                lambda x: jnp.sum(fn(x).astype(jnp.float32) ** 2))(xi)
            return l + gsum(g)
    dt = bench(f)
    print(f"{name:40s} {'fwd+bwd' if bwd else 'fwd    '} {dt*1e3:7.2f} ms",
          flush=True)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    k = lambda i: jax.random.PRNGKey(i)

    x1 = jax.random.normal(key, (B, S, S, 1), DT)
    w_s = jax.random.normal(k(1), (7, 7, 1, NGF), DT) * 0.1
    b_s = jax.random.normal(k(2), (NGF,), DT) * 0.1
    xp = jax.random.normal(k(3), (B, S // 2, S // 2, 4 * NGF), DT)
    w_d = jax.random.normal(k(4), (3, 3, NGF, 2 * NGF), DT) * 0.1
    b_d = jax.random.normal(k(5), (2 * NGF,), DT) * 0.1
    hu = jax.random.normal(k(6), (B, S // 2, S // 2, 2 * NGF), DT)
    w_u = jax.random.normal(k(7), (3, 3, 2 * NGF, NGF), DT) * 0.1
    b_u = jax.random.normal(k(8), (NGF,), DT) * 0.1
    w_h = jax.random.normal(k(9), (7, 7, NGF, 1), DT) * 0.1
    b_h = jax.random.normal(k(10), (1,), DT) * 0.1

    for bwd in (False, True):
        run("stem packed (conv+IN+relu)",
            lambda xi: instance_norm_act_packed(
                stem_packed(xi, w_s, b_s), NGF), x1, bwd)
        run("down0 packed (conv+IN+relu)",
            lambda xi: instance_norm_act_packed(
                down0_from_packed(xi, w_d, b_d), 2 * NGF), xp, bwd)
        run("up1 packed (convT+IN+relu)",
            lambda xi: instance_norm_act_packed(
                up1_to_packed(xi, w_u, b_u), NGF), hu, bwd)
        run("head packed (conv, 8x8 out)",
            lambda xi: head_from_packed(xi, w_h, b_h), xp, bwd)

    net = ResNet(ndims=2, input_nc=1, output_nc=1, ngf=NGF, n_blocks=9)
    x0 = jnp.zeros((B, S, S, 1), DT)
    params = jax.jit(lambda: net.init(jax.random.PRNGKey(7), x0))()
    params = jax.tree.map(lambda a: a.astype(DT), params)
    base = jax.random.normal(key, (B, S, S, 1), DT)

    for label, env in (("packed", None), ("standard", "RAYGUN_DISABLE_PACKED_SHELL")):
        if env:
            os.environ[env] = "1"
        try:
            for bwd in (False, True):
                if not bwd:
                    def f(p, i):
                        xi = base * (1.0 + 1e-6 * i.astype(DT))
                        return jnp.sum(
                            net.apply(p, xi).astype(jnp.float32) ** 2)
                else:
                    def f(p, i):
                        xi = base * (1.0 + 1e-6 * i.astype(DT))
                        l, g = jax.value_and_grad(
                            lambda p_: jnp.sum(
                                net.apply(p_, xi).astype(jnp.float32) ** 2)
                        )(p)
                        return l + gsum(g)
                dt = bench(f, params, n=16 if bwd else 32)
                print(f"G apply [{label}]"
                      f"{'':{24 - len(label)}s} "
                      f"{'fwd+bwd' if bwd else 'fwd    '} {dt*1e3:7.2f} ms",
                      flush=True)
        finally:
            if env:
                os.environ.pop(env, None)


if __name__ == "__main__":
    main()
