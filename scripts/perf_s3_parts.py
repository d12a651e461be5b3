"""S3 boundary decomposition: packed-IN vs head cost at production shape
(3x512^2 bf16, ngf=64) — sizing the h1 fused-stage candidate."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
from _bench_util import bench, measure_overhead
from raygun_tpu.nn.packed_shell import head_from_packed, packed_reflect_pad3
from raygun_tpu.nn.pallas.instance_norm import instance_norm_act_packed

NGF, B, S = 64, 3, 512
DT = jnp.bfloat16
Hc = S // 2

def _rand(key, shape, scale=1.0):
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(DT)

def run(label, fn, params, x, n=32):
    def loss(params, x):
        y = fn(params, x)
        yf = y.astype(jnp.float32)
        return jnp.sum(yf * yf)
    def fwdbwd(params, x, i):
        xi = x * (1.0 + 1e-6 * i.astype(x.dtype))
        v, (gp, gx) = jax.value_and_grad(loss, argnums=(0, 1))(params, xi)
        s = v + jnp.sum(gx.astype(jnp.float32))
        for leaf in jax.tree.leaves(gp):
            s = s + jnp.sum(leaf.astype(jnp.float32))
        return s
    tb = bench(fwdbwd, params, x, n=n)
    print(f"{label:40s} fwd+bwd {tb*1e3:7.2f} ms", flush=True)
    return tb

def main():
    print(f"device: {jax.devices()[0]}  relay ovh {measure_overhead()*1e3:.1f} ms",
          flush=True)
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 8)
    hp = _rand(ks[0], (B, Hc, Hc, 4 * NGF))
    w_h = _rand(ks[1], (7, 7, NGF, 1), 0.05)
    b_h = _rand(ks[2], (1,), 0.1)

    run("IN packed alone", lambda p, x: instance_norm_act_packed(x, NGF),
        (), hp)
    run("head alone (on normalized input)",
        lambda p, x: head_from_packed(x, p[0], p[1]), (w_h, b_h), hp)
    run("reflect_pad3 alone",
        lambda p, x: packed_reflect_pad3(x), (), hp)
    run("S3 = IN + head",
        lambda p, x: head_from_packed(
            instance_norm_act_packed(x, NGF), p[0], p[1]),
        (w_h, b_h), hp)

if __name__ == "__main__":
    main()
