"""Roofline decomposition of the CycleGAN train step at production shapes.

Measures, on the real chip:
  1. bf16 GEMM peak and HBM copy bandwidth (the roofline's two walls);
  2. conv+instance-norm incremental cost at each shell stage (what XLA's
     scheduling of the stats+normalize passes actually costs today);
  3. generator fwd / fwd+bwd with instance vs no norm;
  4. the full 3-phase GAN step (256^2 and 512^2).

Methodology per CLAUDE.md: device-side lax.scan over distinct inputs,
scalar checksum fetch, min over repeats.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from raygun_tpu.nn import NLayerDiscriminator, ResNet
from raygun_tpu.nn.layers import instance_norm

N = 8
PEAK = 197e12


def bench_scalar(fn, *args, n=N):
    """fn(*args, x_variant) -> scalar; returns (sec/iter, flops, bytes)."""

    def scanned(*a):
        def body(carry, i):
            out = fn(*a, i)
            return carry + out.astype(jnp.float32), None

        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
        return tot

    c = jax.jit(scanned).lower(*args).compile()
    cost = c.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    fl = float(cost.get("flops", 0))
    by = float(cost.get("bytes accessed", 0))
    _ = float(c(*args))
    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(c(*args))
        best = min(best, (time.perf_counter() - t0) / n)
    return best, fl, by


def report(label, dt, fl, by=0.0):
    gbs = by / dt / 1e9 if by else 0.0
    print(
        f"{label:46s} {dt*1e3:8.2f} ms  {fl/dt/1e12:6.1f} TF/s "
        f"({fl/dt/PEAK*100:5.1f}% MFU)  {gbs:6.0f} GB/s"
    )
    sys.stdout.flush()


def main():
    print(f"device: {jax.devices()[0]}")
    k = jax.random.PRNGKey(0)

    # ---- walls ------------------------------------------------------------
    M = 8192
    a = jax.random.normal(k, (M, M), jnp.bfloat16)
    b = jax.random.normal(jax.random.fold_in(k, 1), (M, M), jnp.bfloat16)

    def gemm(a, b, i):
        return jnp.sum((a + i.astype(a.dtype) * 1e-6 @ b).astype(jnp.float32))

    def gemm2(a, b, i):
        return jnp.sum(((a + i.astype(a.dtype) * 1e-6) @ b).astype(jnp.float32))

    dt, fl, by = bench_scalar(gemm2, a, b)
    report("bf16 GEMM 8192^3", dt, fl, by)

    big = jax.random.normal(k, (512, 1024, 1024), jnp.bfloat16)  # 1 GiB

    def copybw(x, i):
        return jnp.sum((x * (1.0 + i.astype(x.dtype) * 1e-6)).astype(jnp.float32)[:, :8, :8])

    dt, fl, by = bench_scalar(copybw, big)
    report("HBM stream 1GiB (read+write)", dt, fl, by)

    # ---- conv ± IN at shell stages ---------------------------------------
    batch = 3
    for side, ch in [(512, 64), (256, 128), (128, 256)]:
        x = jax.random.normal(k, (batch, side, side, ch), jnp.bfloat16)
        w = jax.random.normal(k, (3, 3, ch, ch), jnp.bfloat16) * 0.05

        def conv(x, w, i):
            y = jax.lax.conv_general_dilated(
                x + i.astype(x.dtype) * 1e-6, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return jnp.sum(y.astype(jnp.float32)[:, :8, :8, :8])

        def conv_in(x, w, i):
            y = jax.lax.conv_general_dilated(
                x + i.astype(x.dtype) * 1e-6, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = instance_norm(y)
            return jnp.sum(y.astype(jnp.float32)[:, :8, :8, :8])

        def conv_in_relu_conv(x, w, i):
            y = jax.lax.conv_general_dilated(
                x + i.astype(x.dtype) * 1e-6, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = jax.nn.relu(instance_norm(y)).astype(x.dtype)
            y = jax.lax.conv_general_dilated(
                y, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return jnp.sum(y.astype(jnp.float32)[:, :8, :8, :8])

        dt0, fl, by = bench_scalar(conv, x, w)
        report(f"conv3x3 {ch}ch @{side}^2", dt0, fl, by)
        dt1, fl, by = bench_scalar(conv_in, x, w)
        report(f"conv3x3+IN {ch}ch @{side}^2 (+{(dt1-dt0)*1e3:.2f} ms)", dt1, fl, by)
        dt2, fl, by = bench_scalar(conv_in_relu_conv, x, w)
        report(f"conv+IN+relu+conv {ch}ch @{side}^2", dt2, fl, by)

        # fwd+bwd of conv+IN vs conv
        def loss_c(w, x, i):
            y = jax.lax.conv_general_dilated(
                x + i.astype(x.dtype) * 1e-6, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return jnp.sum(y.astype(jnp.float32) ** 2)

        def loss_cin(w, x, i):
            y = jax.lax.conv_general_dilated(
                x + i.astype(x.dtype) * 1e-6, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = instance_norm(y)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        dt0, fl, by = bench_scalar(lambda w, x, i: jax.value_and_grad(loss_c)(w, x, i)[0], w, x)
        report(f"conv3x3 fwd+bwd {ch}ch @{side}^2", dt0, fl, by)
        dt1, fl, by = bench_scalar(lambda w, x, i: jax.value_and_grad(loss_cin)(w, x, i)[0], w, x)
        report(f"conv3x3+IN fwd+bwd {ch}ch @{side}^2 (+{(dt1-dt0)*1e3:.2f} ms)", dt1, fl, by)

    # ---- generator fwd / fwd+bwd at 512^2 --------------------------------
    for side in (256, 512):
        x = jax.random.uniform(k, (batch, side, side, 1), jnp.bfloat16) * 2 - 1
        for norm, label in (("instance", "IN"), ("none", "no-norm")):
            gen = ResNet(ndims=2, input_nc=1, output_nc=1, ngf=64, n_blocks=6,
                         padding_type="same", norm=norm)
            gp = jax.jit(lambda: gen.init(jax.random.PRNGKey(0), x[:1], train=False))()["params"]
            gp = jax.tree.map(lambda p: p.astype(jnp.bfloat16), gp)

            def gfwd(p, xx, i):
                y = gen.apply({"params": p}, xx + i.astype(xx.dtype) * 1e-6, train=True)
                return jnp.sum(y.astype(jnp.float32)[:, :8, :8])

            dt, fl, by = bench_scalar(gfwd, gp, x)
            report(f"G fwd {label} @{side}^2", dt, fl, by)

            def gloss(p, xx, i):
                y = gen.apply({"params": p}, xx + i.astype(xx.dtype) * 1e-6, train=True)
                return jnp.sum(y.astype(jnp.float32) ** 2)

            dt, fl, by = bench_scalar(
                lambda p, xx, i: jax.value_and_grad(gloss)(p, xx, i)[0], gp, x)
            report(f"G fwd+bwd {label} @{side}^2", dt, fl, by)


if __name__ == "__main__":
    main()
