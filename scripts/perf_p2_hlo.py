"""Dump the optimized HLO of the stem+fused-down0 fwd+bwd program (P2 in
perf_shell_now.py) to find the ~2.8 ms composition tax vs the isolated
parts. Prints the largest fusions/ops by estimated bytes."""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from raygun_tpu.nn.layers import pack_conv_kernel_io
from raygun_tpu.nn.packed_shell import stem_packed
from raygun_tpu.nn.pallas.fconv import fused_pro_conv2

NGF = 64
B, S = 3, 512
DT = jnp.bfloat16


def main():
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 8)
    x_in = (jax.random.normal(ks[0], (B, S, S, 1)) * 1.0).astype(DT)
    w_s = (jax.random.normal(ks[1], (7, 7, 1, NGF)) * 0.1).astype(DT)
    b_s = (jax.random.normal(ks[2], (NGF,)) * 0.1).astype(DT)
    w_d0 = (jax.random.normal(ks[3], (3, 3, NGF, 2 * NGF)) * 0.05).astype(DT)
    b_d0 = (jax.random.normal(ks[4], (2 * NGF,)) * 0.1).astype(DT)
    w2 = pack_conv_kernel_io(w_d0, (2, 2), (1, 1), (2, 2), (1, 1))[0]
    w2s = w2.reshape(2, -1, w2.shape[-1])

    def loss(params, x):
        w_s, b_s, w2s, b_d0 = params
        y0 = stem_packed(x, w_s, b_s)
        y = fused_pro_conv2(y0, w2s, b_d0, 4, "lo")
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def fwdbwd(params, x):
        v, (gp, gx) = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
        s = v + jnp.sum(gx.astype(jnp.float32))
        for leaf in jax.tree.leaves(gp):
            s = s + jnp.sum(leaf.astype(jnp.float32))
        return s

    params = (w_s, b_s, w2s, b_d0)
    txt = jax.jit(fwdbwd).lower(params, x_in).compile().as_text()
    print(f"HLO chars: {len(txt)}")
    # crude per-op size census: shape volume of each op's output
    sizes = []
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = (\w+)\[([\d,]*)\]", line)
        if not m:
            continue
        name, dtype, dims = m.groups()
        vol = 1
        for d in dims.split(","):
            if d:
                vol *= int(d)
        bpe = 2 if dtype in ("bf16", "f16") else 4
        op = line.split("=", 1)[1].strip().split("(")[0].strip()
        opname = op.split(" ")[-1] if " " in op else op
        sizes.append((vol * bpe, name, opname, line.strip()[:160]))
    sizes.sort(reverse=True)
    seen = 0
    for szb, name, opname, line in sizes[:40]:
        print(f"{szb/1e6:8.1f} MB  {line}")
        seen += 1


if __name__ == "__main__":
    main()
