"""Effect of the fused Pallas instance norm + routing fixes on the
CycleGAN generator and full train step (3x256^2 and 3x512^2)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

PEAK = 197e12
OVERHEAD = 0.0


def _time_compiled(c, args, n):
    _ = float(c(*args))
    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(c(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - OVERHEAD, 1e-9) / n


def bench(fn, *args, n=8):
    def scanned(*a):
        def body(carry, i):
            return carry + fn(*a, i).astype(jnp.float32), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
        return tot

    c = jax.jit(scanned).lower(*args).compile()
    cost = c.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return _time_compiled(c, args, n), float(cost.get("flops", 0))


def report(label, dt, fl):
    print(f"{label:52s} {dt*1e3:8.2f} ms  {fl/dt/1e12:6.1f} TF/s "
          f"({fl/dt/PEAK*100:5.1f}% MFU)")
    sys.stdout.flush()


def main():
    global OVERHEAD
    print(f"device: {jax.devices()[0]}")
    # smoke: the fused IN kernels compile and run on this backend
    from raygun_tpu.nn.pallas.instance_norm import instance_norm_fused
    from raygun_tpu.nn.layers import instance_norm

    xs = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 32), jnp.float32)
    got = jax.jit(instance_norm_fused)(xs)
    ref = jax.jit(lambda v: instance_norm(v, impl="xla"))(xs)
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f"pallas IN on-device parity: max|err| = {err:.2e}")
    assert err < 1e-4
    g1 = jax.jit(jax.grad(lambda v: jnp.sum(instance_norm_fused(v) ** 2)))(xs)
    g2 = jax.jit(jax.grad(lambda v: jnp.sum(instance_norm(v, impl='xla') ** 2)))(xs)
    gerr = float(jnp.max(jnp.abs(g1 - g2)))
    print(f"pallas IN on-device grad parity: max|err| = {gerr:.2e}")
    assert gerr < 1e-3

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

    from raygun_tpu.nn import ResNet

    k = jax.random.PRNGKey(0)
    for side in (256, 512):
        x = jax.random.uniform(k, (3, side, side, 1), jnp.bfloat16) * 2 - 1
        for disable, label in ((None, "pallas-IN"), ("1", "xla-IN")):
            if disable:
                os.environ["RAYGUN_DISABLE_PALLAS_IN"] = disable
            else:
                os.environ.pop("RAYGUN_DISABLE_PALLAS_IN", None)
            gen = ResNet(ndims=2, input_nc=1, output_nc=1, ngf=64, n_blocks=6,
                         padding_type="same", norm="instance")
            gp = jax.jit(lambda: gen.init(jax.random.PRNGKey(0), x[:1],
                                          train=False))()["params"]
            gp = jax.tree.map(lambda q: q.astype(jnp.bfloat16), gp)

            def gloss(p, xx, i):
                y = gen.apply({"params": p}, xx + i.astype(xx.dtype) * 1e-6,
                              train=True)
                return jnp.sum(y.astype(jnp.float32) ** 2)

            def gstep(p, xx, i):
                v, g = jax.value_and_grad(gloss)(p, xx, i)
                return v + sum(jnp.sum(l.astype(jnp.float32))
                               for l in jax.tree.leaves(g))

            dt, fl = bench(gstep, gp, x, n=8)
            report(f"G fwd+bwd {label} @{side}^2 (routing fixed)", dt, fl)

    # full step (the bench.py workload) at both resolutions, pallas IN on
    os.environ.pop("RAYGUN_DISABLE_PALLAS_IN", None)
    import bench as benchmod

    for side in (256, 512):
        sps, mfu = benchmod._cyclegan_steps_per_sec(jax, side=side)
        print(f"CycleGAN step @3x{side}^2: {sps:.2f} steps/s = "
              f"{mfu*100:.1f}% MFU")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
