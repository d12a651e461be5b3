"""Isolate the conv->instance-norm composition tax at C=64 (512^2, bf16).

Measured (perf_shell_ops.py): stem conv 0.76 ms + IN+relu 0.58 ms compose
to 5.18 ms fwd. Candidates: (a) the pallas IN's lane-fold reshape
(B,S,64)->(B,S/2,128) materializing as a relayout when the input comes
from a conv, (b) XLA scheduling around the opaque custom call, (c) the
conv choosing a worse algorithm when its consumer is a bitcast/reshape.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from _bench_util import bench

from raygun_tpu.nn.layers import conv_nd, pad_spatial, instance_norm
from raygun_tpu.nn.pallas import instance_norm as inmod

B, S, C = 3, 512, 64
key = jax.random.PRNGKey(0)
x1 = jax.random.normal(key, (B, S, S, 1), jnp.bfloat16)
w7 = jax.random.normal(jax.random.PRNGKey(1), (7, 7, 1, C), jnp.bfloat16) * 0.1


def stem(xi):
    h = pad_spatial(xi, [(3, 3)] * 2, "reflect")
    return conv_nd(h, w7)


def run(name, fn):
    def f(i):
        xi = x1 * (1.0 + 1e-6 * i.astype(jnp.bfloat16))
        y = fn(xi).astype(jnp.float32)
        return jnp.sum(y * y)

    dt = bench(f)
    print(f"{name:44s} {dt*1e3:7.2f} ms", flush=True)


def in_pallas(h, fold=True):
    if fold:
        return inmod.instance_norm_relu_fused(h)
    old = inmod._fold_factor
    try:
        inmod._fold_factor = lambda S_, C_: 1
        return inmod.instance_norm_relu_fused(h)
    finally:
        inmod._fold_factor = old


def in_xla(h):
    xf = h.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.var(xf, axis=(1, 2), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    return jax.nn.relu(y).astype(h.dtype)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    run("stem conv only", stem)
    run("conv -> pallas IN+relu (fold)", lambda xi: in_pallas(stem(xi)))
    run("conv -> pallas IN+relu (NOfold)",
        lambda xi: in_pallas(stem(xi), fold=False))
    run("conv -> XLA IN+relu", lambda xi: in_xla(stem(xi)))
    # pure fold reshape after a conv: (B,S,S,64)->(B,S*S/2,128) roundtrip
    run("conv -> fold reshape -> *1.0001 (no IN)",
        lambda xi: stem(xi).reshape(B, S * S // 2, 128) * 1.0001)
    # conv -> plain elementwise (fusion baseline)
    run("conv -> relu only", lambda xi: jax.nn.relu(stem(xi)))


if __name__ == "__main__":
    main()


def extra():
    x64 = jax.random.normal(key, (B, S, S, 64), jnp.bfloat16)
    w3 = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 64, 64),
                           jnp.bfloat16) * 0.1

    def conv64(xi):
        return conv_nd(pad_spatial(xi, [(1, 1)] * 2, "reflect"), w3)

    def run64(name, fn):
        def f(i):
            xi = x64 * (1.0 + 1e-6 * i.astype(jnp.bfloat16))
            y = fn(xi).astype(jnp.float32)
            return jnp.sum(y * y)
        dt = bench(f)
        print(f"{name:44s} {dt*1e3:7.2f} ms", flush=True)

    run64("conv 64->64 only", conv64)
    run64("conv 64->64 -> pallas IN+relu",
          lambda xi: in_pallas(conv64(xi)))
    run("conv -> opt_barrier -> *1.0001",
        lambda xi: jax.lax.optimization_barrier(stem(xi)) * 1.0001)
    run("conv -> opt_barrier -> pallas IN",
        lambda xi: in_pallas(jax.lax.optimization_barrier(stem(xi))))


extra()
