"""Head strided-conv variants at production shape (3x512^2, ngf=64, co=1).

A: stride-4 coarse conv, XLA autodiff          (baseline pathology)
B: stride-4 coarse conv, custom VJP            (packed_shell._conv_coarse_strided)
C: s2d-regrouped STRIDE-1 conv, XLA autodiff   (y = conv(s2d(xq,4), regroup(w2)))
D: C's forward + custom VJP pieces if C's autodiff still lags

All exact re-expressions of the same sums.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from _bench_util import bench, measure_overhead

from raygun_tpu.nn.layers import space_to_depth
from raygun_tpu.nn.packed_shell import _conv, _conv_coarse_strided

B_, S = 3, 512
C, N, K, s = 256, 64, 8, 4   # head at f=8: xq (3,260,260,256) w2 (8,8,256,64)
H = 260
t = K // s


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    print(f"relay overhead: {measure_overhead()*1e3:.1f} ms", flush=True)
    k = jax.random.PRNGKey(0)
    xq = jax.random.normal(k, (B_, H, H, C), jnp.float32).astype(jnp.bfloat16)
    w2 = (jax.random.normal(jax.random.fold_in(k, 1), (K, K, C, N),
                            jnp.float32) * 0.05).astype(jnp.bfloat16)

    def conv_a(xq, w2):
        return _conv(xq, w2, (s, s))

    def conv_b(xq, w2):
        return _conv_coarse_strided(xq, w2, s)

    def conv_c(xq, w2):
        xqs = space_to_depth(xq, (s, s))  # (B, H/s, W/s, s^2*C)
        # w2s[q, r, (py,px,c), n] = w2[s*q+py, s*r+px, c, n]
        w2s = w2.reshape(t, s, t, s, C, N).transpose(0, 2, 1, 3, 4, 5)
        w2s = w2s.reshape(t, t, s * s * C, N)
        return _conv(xqs, w2s, (1, 1))

    for label, conv in (("A stride-4 autodiff", conv_a),
                        ("B stride-4 custom VJP", conv_b),
                        ("C s2d stride-1 autodiff", conv_c)):
        def loss(xq, w2):
            y = conv(xq, w2)
            yf = y.astype(jnp.float32)
            return jnp.sum(yf * yf)

        def fwd(xq, w2, i):
            return loss(xq * (1.0 + 1e-6 * i.astype(xq.dtype)), w2)

        def fwdbwd(xq, w2, i):
            xi = xq * (1.0 + 1e-6 * i.astype(xq.dtype))
            v, (gx, gw) = jax.value_and_grad(loss, argnums=(0, 1))(xi, w2)
            return (v + jnp.sum(gx.astype(jnp.float32))
                    + jnp.sum(gw.astype(jnp.float32)))

        tf = bench(fwd, xq, w2, n=64)
        tb = bench(fwdbwd, xq, w2, n=64)
        print(f"{label:26s} fwd {tf*1e3:6.2f}  fwd+bwd {tb*1e3:6.2f} ms",
              flush=True)

    # parity of C vs A (values)
    ya = conv_a(xq, w2)
    yc = conv_c(xq, w2)
    import numpy as np
    print("C vs A max |d|:",
          float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                                - yc.astype(jnp.float32)))), flush=True)


if __name__ == "__main__":
    main()
