"""Roofline decomposition of the CycleGAN train step at production shapes.

Measures, on the real chip:
  1. bf16 GEMM peak and HBM bandwidth (the roofline's two walls);
  2. conv+instance-norm incremental cost at each shell stage (what XLA's
     scheduling of the stats+normalize passes actually costs today);
  3. generator fwd / fwd+bwd with instance vs no norm;
  4. full 3-phase GAN step at 256^2 / 512^2.

Methodology per CLAUDE.md: device-side lax.scan over distinct inputs,
scalar checksum fetch, min over repeats — PLUS explicit subtraction of the
relay's fixed per-execution overhead (~25 ms), which dominates micro-op
timings (first version of this script forgot and mismeasured 5x).
Backward passes are forced by folding a grad checksum into the scalar
(value_and_grad alone gets DCE'd if the grad is unused).
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

PEAK = 197e12
OVERHEAD = None  # measured fixed cost per execution, seconds


def _time_compiled(c, args, n):
    _ = float(c(*args))  # warm-up
    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(c(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - (OVERHEAD or 0.0), 1e-9) / n


def bench_scalar(fn, *args, n=16):
    """fn(*args, i) -> scalar; returns (sec/iter, flops)."""

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
    return _time_compiled(c, args, n), fl


def report(label, dt, fl, extra=""):
    print(
        f"{label:52s} {dt*1e3:8.2f} ms  {fl/dt/1e12:6.1f} TF/s "
        f"({fl/dt/PEAK*100:5.1f}% MFU){extra}"
    )
    sys.stdout.flush()


def measure_overhead():
    """Fixed per-execution cost of the relay: an almost-empty program."""
    global OVERHEAD
    x = jnp.float32(1.5)
    c = jax.jit(lambda v: v * 2 + 1).lower(x).compile()
    _ = float(c(x))
    best = 1e9
    for i in range(5):
        t0 = time.perf_counter()
        _ = float(c(x + i))
        best = min(best, time.perf_counter() - t0)
    OVERHEAD = best
    print(f"relay fixed overhead per execution: {best*1e3:.1f} ms")


def main():
    print(f"device: {jax.devices()[0]}")
    measure_overhead()
    k = jax.random.PRNGKey(0)

    # ---- walls ------------------------------------------------------------
    M = 4096
    a = jax.random.normal(k, (M, M), jnp.bfloat16)
    b = jax.random.normal(jax.random.fold_in(k, 1), (M, M), jnp.bfloat16)

    def gemm(a, b, i):
        y = jax.lax.dot_general(
            a + i.astype(a.dtype) * 1e-6, b,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return jnp.sum(y[:8, :8])

    dt, fl = bench_scalar(gemm, a, b, n=64)
    report("bf16 GEMM 4096^3 (fp32 acc)", dt, fl)

    big = jax.random.normal(k, (256, 1024, 1024), jnp.bfloat16)  # 512 MiB

    def bwprobe(x, i):
        # full read forced by the global sum; no large write
        return jnp.sum((x * (1.0 + i.astype(x.dtype) * 1e-6)).astype(jnp.float32))

    dt, _ = bench_scalar(bwprobe, big, n=32)
    nbytes = big.size * 2
    print(f"{'HBM read 512MiB (sum-reduce)':52s} {dt*1e3:8.2f} ms  "
          f"{nbytes/dt/1e9:6.0f} GB/s read")

    def rwprobe(x, i):
        # read + write: the carry update materializes a full-size array
        return (x * (1.0 + i.astype(x.dtype) * 1e-6))

    def scanned_rw(x0):
        def body(carry, i):
            return rwprobe(carry, i), None
        z, _ = jax.lax.scan(body, x0, jnp.arange(32))
        return jnp.sum(z.astype(jnp.float32))

    c = jax.jit(scanned_rw).lower(big).compile()
    dt = _time_compiled(c, (big,), 32)
    print(f"{'HBM read+write 512MiB (scan carry)':52s} {dt*1e3:8.2f} ms  "
          f"{2*nbytes/dt/1e9:6.0f} GB/s r+w")

    # ---- conv ± IN at shell stages ---------------------------------------
    batch = 3
    for side, ch in [(512, 64), (256, 128), (128, 256)]:
        x = jax.random.normal(k, (batch, side, side, ch), jnp.bfloat16)
        w = jax.random.normal(k, (3, 3, ch, ch), jnp.bfloat16) * 0.05

        def conv_y(x, w, i):
            return jax.lax.conv_general_dilated(
                x + i.astype(x.dtype) * 1e-6, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        def conv(x, w, i):
            return jnp.sum(conv_y(x, w, i).astype(jnp.float32)[:, :8, :8, :8])

        def conv_in(x, w, i):
            return jnp.sum(
                instance_norm(conv_y(x, w, i)).astype(jnp.float32)[:, :8, :8, :8])

        def conv_in_relu_conv(x, w, i):
            y = jax.nn.relu(instance_norm(conv_y(x, w, i))).astype(x.dtype)
            y = jax.lax.conv_general_dilated(
                y, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.sum(y.astype(jnp.float32)[:, :8, :8, :8])

        dt0, fl = bench_scalar(conv, x, w)
        report(f"conv3x3 {ch}ch @{side}^2 fwd", dt0, fl)
        dt1, fl = bench_scalar(conv_in, x, w)
        report(f"conv3x3+IN {ch}ch @{side}^2 fwd", dt1, fl,
               f"  [IN adds {(dt1-dt0)*1e3:+.2f} ms]")
        dt2, fl = bench_scalar(conv_in_relu_conv, x, w)
        report(f"conv+IN+relu+conv {ch}ch @{side}^2 fwd", dt2, fl)

        def loss_c(w, x, i):
            return jnp.sum(conv_y(x, w, i).astype(jnp.float32) ** 2)

        def loss_cin(w, x, i):
            return jnp.sum(instance_norm(conv_y(x, w, i)).astype(jnp.float32) ** 2)

        def fwdbwd(loss):
            def f(w, x, i):
                v, g = jax.value_and_grad(loss)(w, x, i)
                return v + jnp.sum(g.astype(jnp.float32))  # force the bwd
            return f

        dt0, fl = bench_scalar(fwdbwd(loss_c), w, x)
        report(f"conv3x3 {ch}ch @{side}^2 fwd+bwd", dt0, fl)
        dt1, fl = bench_scalar(fwdbwd(loss_cin), w, x)
        report(f"conv3x3+IN {ch}ch @{side}^2 fwd+bwd", dt1, fl,
               f"  [IN adds {(dt1-dt0)*1e3:+.2f} ms]")

    # ---- generator fwd / fwd+bwd -----------------------------------------
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

            dt, fl = bench_scalar(gfwd, gp, x, n=8)
            report(f"G fwd {label} @{side}^2", dt, fl)

            def gloss(p, xx, i):
                y = gen.apply({"params": p}, xx + i.astype(xx.dtype) * 1e-6, train=True)
                return jnp.sum(y.astype(jnp.float32) ** 2)

            def gstep(p, xx, i):
                v, g = jax.value_and_grad(gloss)(p, xx, i)
                return v + sum(
                    jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(g))

            dt, fl = bench_scalar(gstep, gp, x, n=8)
            report(f"G fwd+bwd {label} @{side}^2", dt, fl)


if __name__ == "__main__":
    main()
