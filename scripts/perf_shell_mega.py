"""A/B the megakernel shell route (nn/pallas/shell_fused.py) against the
packed route at the production generator apply (3x512^2 bf16, fwd+bwd).

Usage: python scripts/perf_shell_mega.py [side]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from _bench_util import bench, measure_overhead

B = 3
S = int(sys.argv[1]) if len(sys.argv) > 1 else 512
DT = jnp.bfloat16


def main():
    print(f"device: {jax.devices()[0]}  {B}x{S}^2", flush=True)
    print(f"relay overhead: {measure_overhead()*1e3:.1f} ms", flush=True)
    from raygun_tpu.nn import ResNet

    x = (jax.random.normal(jax.random.PRNGKey(0), (B, S, S, 1),
                           jnp.float32)).astype(DT)

    arms = [(None, "packed")] + [
        (sel, f"mega:{sel:8s}") for sel in
        (sys.argv[2].split(";") if len(sys.argv) > 2
         else ["d1", "d2", "u1", "d1,d2,u1"])
    ]
    for sel, tag in arms:
        if sel is None:
            os.environ["RAYGUN_DISABLE_SHELL_FUSED"] = "1"
        else:
            os.environ.pop("RAYGUN_DISABLE_SHELL_FUSED", None)
            os.environ["RAYGUN_SHELL_MEGA"] = sel
        net = ResNet(ndims=2, input_nc=1, output_nc=1, ngf=64, n_blocks=6,
                     padding_type="same")
        params = jax.jit(lambda: net.init(
            jax.random.PRNGKey(1), x[:1], train=False))()["params"]
        params = jax.tree.map(lambda a: a.astype(DT), params)

        def loss(p, xx):
            y = net.apply({"params": p}, xx, train=True).astype(jnp.float32)
            return jnp.sum(y * jnp.sin(y))

        def fwd(p, xx, i):
            return loss(p, xx * (1.0 + 1e-6 * i.astype(xx.dtype)))

        def fwdbwd(p, xx, i):
            xi = xx * (1.0 + 1e-6 * i.astype(xx.dtype))
            v, (gp, gx) = jax.value_and_grad(loss, argnums=(0, 1))(p, xi)
            s = v + jnp.sum(gx.astype(jnp.float32))
            for leaf in jax.tree.leaves(gp):
                s = s + jnp.sum(leaf.astype(jnp.float32))
            return s

        tf = bench(fwd, params, x, n=32)
        tb = bench(fwdbwd, params, x, n=32)
        print(f"{tag}: apply fwd {tf*1e3:7.2f} ms   fwd+bwd {tb*1e3:7.2f} ms",
              flush=True)
    os.environ.pop("RAYGUN_DISABLE_SHELL_FUSED", None)
    os.environ.pop("RAYGUN_SHELL_MEGA", None)


if __name__ == "__main__":
    main()
