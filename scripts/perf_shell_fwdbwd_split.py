"""Forward vs backward split of the bad shell stages (3x512^2 shapes),
plus candidate re-expressions for the backward:

  - down (3x3 s2): dx as the subpixel transposed-conv route, dw as
    per-phase s2d GEMMs — vs XLA's zero-dilated autodiff
  - up (subpixel convT): dx as the s2d stride-2 route
  - head (7x7 64->1): packed vs native fwd/bwd
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from raygun_tpu.nn.layers import (
    conv_stride2_s2d, conv_transpose_s2_subpixel, conv2d_s2d, conv_nd,
)

OVERHEAD = 0.0


def _time_compiled(c, args, n):
    _ = float(c(*args))
    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(c(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - OVERHEAD, 1e-9) / n


def bench(fn, *args, n=16):
    def scanned(*a):
        def body(carry, i):
            return carry + fn(*a, i).astype(jnp.float32), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
        return tot

    c = jax.jit(scanned).lower(*args).compile()
    return _time_compiled(c, args, n)


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
    x64 = jax.random.normal(k, (3, 512, 512, 64), jnp.bfloat16)
    w_d0 = jax.random.normal(k, (3, 3, 64, 128), jnp.bfloat16) * 0.05
    x256 = jax.random.normal(k, (3, 128, 128, 256), jnp.bfloat16)
    w_u0 = jax.random.normal(k, (3, 3, 256, 128), jnp.bfloat16) * 0.05
    w_h = jax.random.normal(k, (7, 7, 64, 1), jnp.bfloat16) * 0.05

    def run(label, f, *args, n=16):
        print(f"  {label:44s} {bench(f, *args, n=n)*1e3:7.2f} ms")
        sys.stdout.flush()

    def fwd_only(conv):
        def f(w, x, i):
            y = conv(x + i.astype(x.dtype) * 1e-6, w)
            return jnp.sum(y.astype(jnp.float32) ** 2)
        return f

    def fwdbwd(conv):
        def loss(w, x, i):
            y = conv(x + i.astype(x.dtype) * 1e-6, w)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        def f(w, x, i):
            v, g = jax.value_and_grad(loss, argnums=(0, 1))(w, x, i)
            return v + sum(jnp.sum(q.astype(jnp.float32)) for q in g)
        return f

    def native_s2(x, w):
        return jax.lax.conv_general_dilated(
            jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))), w, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def packed_s2(x, w):
        return conv_stride2_s2d(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))), w)

    print("--- down0 3x3 s2 64->128 @512^2 ---")
    run("fwd native", fwd_only(native_s2), w_d0, x64)
    run("fwd packed-s2d", fwd_only(packed_s2), w_d0, x64)
    run("fwd+bwd native", fwdbwd(native_s2), w_d0, x64)
    run("fwd+bwd packed-s2d", fwdbwd(packed_s2), w_d0, x64)

    # custom-vjp: fwd packed; dx via subpixel transposed conv of g with the
    # flipped kernel; dw via XLA (for now)
    @jax.custom_vjp
    def down_custom(x, w):
        return packed_s2(x, w)

    def down_fwd(x, w):
        return packed_s2(x, w), (x, w)

    def down_bwd(res, g):
        x, w = res
        # dx: transposed conv, stride 2, padding 1, output_padding 1 —
        # exactly the subpixel route with the flipped/transposed kernel
        wt = jnp.flip(w, (0, 1)).swapaxes(-1, -2)  # (3,3,128,64) -> dx kernel
        dx = conv_transpose_s2_subpixel(g, wt.swapaxes(-1, -2))
        # conv_transpose_s2_subpixel expects flax ConvTranspose layout
        # (k, k, cin, cout) applied to g (cin=128) producing cout=64
        dx = dx[:, : x.shape[1], : x.shape[2], :]
        # dw via the standard correlation (let XLA handle; small output)
        _, vjp = jax.vjp(lambda w_: native_s2(x, w_), w)
        (dw,) = vjp(g)
        return dx, dw

    down_custom.defvjp(down_fwd, down_bwd)

    # parity check on small input first
    xs = jax.random.normal(k, (1, 16, 16, 64), jnp.float32)
    ws = jax.random.normal(k, (3, 3, 64, 128), jnp.float32) * 0.05
    g1 = jax.grad(lambda x: jnp.sum(down_custom(x, ws) ** 2))(xs)
    g2 = jax.grad(lambda x: jnp.sum(native_s2(x, ws) ** 2))(xs)
    err = float(jnp.max(jnp.abs(g1 - g2)))
    print(f"  down_custom dx parity: {err:.2e}")
    run("fwd+bwd custom (subpixel dx)", fwdbwd(lambda x, w: down_custom(x, w)),
        w_d0, x64)

    print("--- up0 convT s2 256->128 @128^2 ---")
    run("fwd subpixel", fwd_only(lambda x, w: conv_transpose_s2_subpixel(x, w)),
        w_u0, x256)
    run("fwd+bwd subpixel", fwdbwd(lambda x, w: conv_transpose_s2_subpixel(x, w)),
        w_u0, x256)

    print("--- head 7x7 64->1 @512^2 ---")

    def head_packed(x, w):
        return conv2d_s2d(jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)),
                                  mode="reflect"), w)

    def head_native(x, w):
        return conv_nd(jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)),
                               mode="reflect"), w)

    run("fwd packed", fwd_only(head_packed), w_h, x64)
    run("fwd native", fwd_only(head_native), w_h, x64)
    run("fwd+bwd packed", fwdbwd(head_packed), w_h, x64)
    run("fwd+bwd native", fwdbwd(head_native), w_h, x64, n=8)


if __name__ == "__main__":
    main()
