"""Probe: run the CycleGAN step's two independent generator applies
(G1(a) and G2(b) — different params, same architecture) as ONE
vmap-stacked apply instead of two sequential applies.

Rationale: the production step is ~95% generator chains whose per-op
traffic is already at/near floor; the remaining cost is XLA's scheduling
of many sequential stages. Stacking the sibling applies halves the
number of sequential stages (the same lever as the G2 2x-batch /
"D kinds in one apply" batching that took the step 191 -> 183 ms).

Measures fwd+bwd (grads wrt params and inputs) of:
  seq:   G1(a); G2(b)               (two applies, batch 3 each)
  stack: vmap(apply)([G1;G2],[a;b]) (one apply, leading axis 2)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from _bench_util import bench, measure_overhead

from raygun_tpu.nn.resnet import ResNet

NGF = 64
B, S = 3, 512
DT = jnp.bfloat16


def main():
    print(f"device: {jax.devices()[0]}  relay ovh "
          f"{measure_overhead()*1e3:.1f} ms", flush=True)
    gen = ResNet(ndims=2, input_nc=1, output_nc=1, ngf=NGF, n_blocks=6,
                 padding_type="same")
    x0 = jnp.zeros((1, S, S, 1), DT)
    p1 = jax.jit(lambda: gen.init(jax.random.PRNGKey(0), x0,
                                  train=False))()["params"]
    p2 = jax.jit(lambda: gen.init(jax.random.PRNGKey(1), x0,
                                  train=False))()["params"]
    cast = lambda p: jax.tree.map(lambda a: a.astype(DT), p)
    p1, p2 = cast(p1), cast(p2)
    pstk = jax.tree.map(lambda a, b: jnp.stack([a, b]), p1, p2)
    xa = jax.random.normal(jax.random.PRNGKey(2), (B, S, S, 1), DT)
    xb = jax.random.normal(jax.random.PRNGKey(3), (B, S, S, 1), DT)
    xs = jnp.stack([xa, xb])

    def apply1(p, x):
        return gen.apply({"params": p}, x, train=True)

    def seq(ps, xa, xb, i):
        def loss(ps, xa, xb):
            y1 = apply1(ps[0], xa)
            y2 = apply1(ps[1], xb)
            return (jnp.sum(y1.astype(jnp.float32) ** 2)
                    + jnp.sum(y2.astype(jnp.float32) ** 2))
        xi = xa * (1 + 1e-6 * i.astype(DT))
        v, (gp, ga, gb) = jax.value_and_grad(loss, argnums=(0, 1, 2))(
            ps, xi, xb)
        s = v + jnp.sum(ga.astype(jnp.float32)) + jnp.sum(
            gb.astype(jnp.float32))
        for leaf in jax.tree.leaves(gp):
            s = s + jnp.sum(leaf.astype(jnp.float32))
        return s

    def stk(pstk, xs, i):
        def loss(pstk, xs):
            ys = jax.vmap(apply1)(pstk, xs)
            return jnp.sum(ys.astype(jnp.float32) ** 2)
        xi = xs * (1 + 1e-6 * i.astype(DT))
        v, (gp, gx) = jax.value_and_grad(loss, argnums=(0, 1))(pstk, xi)
        s = v + jnp.sum(gx.astype(jnp.float32))
        for leaf in jax.tree.leaves(gp):
            s = s + jnp.sum(leaf.astype(jnp.float32))
        return s

    t_seq = bench(seq, (p1, p2), xa, xb, n=16)
    print(f"sequential 2 applies fwd+bwd   {t_seq*1e3:7.2f} ms", flush=True)
    t_stk = bench(stk, pstk, xs, n=16)
    print(f"vmap-stacked 1 apply fwd+bwd   {t_stk*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
