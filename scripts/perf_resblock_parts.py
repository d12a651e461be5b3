"""Bisect the fused resblock kernel's internal costs on TPU.

Variants of the K1 conv kernel at (3, 128, 128, 256) bf16, SH=16:
  matmul-only   pre-stacked ap3 input, 3 matmuls, no assembly/stats
  conv+asm      assembly (reflect halos + tap stores) + matmuls
  conv+stats    the real K1
  fused fwd     K1 + K2 + normalize-add tail
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from raygun_tpu.nn.pallas.resblock import (
    _assemble_reflect, _conv_stats, _pick_slab, _rb_forward, _stack_taps,
)

PEAK = 197e12
N = 16
B, H, W, C = 3, 128, 128, 256
FL1 = 2 * 9 * C * C * H * W * B  # one conv


from _bench_util import bench as _bench


def bench(fn, *args):
    return _bench(fn, *args, n=64)


def mm_only_kernel(SH, W, C, ap3_ref, w_ref, y_ref):
    acc = jnp.zeros((SH * W, C), jnp.float32)
    for ty in range(3):
        a = ap3_ref[0, ty:ty + SH].reshape(SH * W, -1)
        acc = acc + jax.lax.dot_general(
            a, w_ref[ty], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    y_ref[0] = acc.astype(y_ref.dtype).reshape(SH, W, C)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    SH = _pick_slab(H, W, C)
    n_slabs = H // SH
    print(f"SH={SH} n_slabs={n_slabs} grid cells={B * n_slabs}", flush=True)
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16) * 0.05
    b = jnp.zeros((C,), jnp.bfloat16)
    w3 = w.reshape(3, 3 * C, C)

    base = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
    base3 = jax.random.normal(key, (B, (H // 16) * 18, W, 3 * C),
                              jnp.bfloat16)

    def mk(i):
        return base * (1.0 + 1e-6 * i.astype(jnp.bfloat16))

    def mk3(i):
        return base3 * (1.0 + 1e-6 * i.astype(jnp.bfloat16))

    def mm_only(w3, i):
        ap3 = mk3(i)
        y = pl.pallas_call(
            functools.partial(mm_only_kernel, SH, W, C),
            grid=(B, n_slabs),
            in_specs=[
                pl.BlockSpec((1, SH + 2, W, 3 * C),
                             lambda b, s: (b, s, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, 3 * C, C), lambda b, s: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, SH, W, C), lambda b, s: (b, s, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.bfloat16),
        )(ap3, w3)
        yf = y.astype(jnp.float32)
        return jnp.sum(yf * yf)

    # NOTE: mm_only's in-block (SH+2) rows overlap slabs is wrong math (it
    # treats ap3 as H+2-row padded); timing-only.
    dt = bench(mm_only, w3)
    print(f"matmul-only      {dt*1e3:7.2f} ms  {FL1/dt/PEAK*100:5.1f}% MFU",
          flush=True)

    def k1(args, i):
        w, b = args
        y, sums = _conv_stats(mk(i), w, b)
        return jnp.sum(y.astype(jnp.float32)) + jnp.sum(sums)

    dt = bench(k1, (w, b))
    print(f"K1 conv+asm+stats{dt*1e3:7.2f} ms  {FL1/dt/PEAK*100:5.1f}% MFU",
          flush=True)

    def fwd(args, i):
        w, b = args
        out, _ = _rb_forward(mk(i), w, b, w, b, 1e-5)
        return jnp.sum(out.astype(jnp.float32))

    dt = bench(fwd, (w, b))
    print(f"fused fwd (2conv){dt*1e3:7.2f} ms  "
          f"{2*FL1/dt/PEAK*100:5.1f}% MFU", flush=True)


if __name__ == "__main__":
    main()
