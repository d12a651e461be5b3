"""Dump the optimized HLO of the FULL production CycleGAN step (bench.py's
structures, u1 default) and census the biggest copies / transposes /
fusions — evidence for where the remaining ms over the traffic floor live."""
import os, re, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, optax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
from raygun_tpu.nn import NLayerDiscriminator, ResNet
from raygun_tpu.systems.cyclegan import gan_loss, smooth_l1

SIDE, BATCH = int(os.environ.get("SIDE", "512")), 3

def main():
    gen = ResNet(ndims=2, input_nc=1, output_nc=1, ngf=64, n_blocks=6,
                 padding_type="same")
    disc = NLayerDiscriminator(ndims=2, input_nc=1, ngf=64, n_layers=3,
                               kw=3, downsampling_kw=2, norm="instance")
    x = jnp.zeros((BATCH, SIDE, SIDE, 1), jnp.bfloat16)
    gp = jax.jit(lambda: gen.init(jax.random.PRNGKey(0), x[:1], train=False))()["params"]
    dp = jax.jit(lambda: disc.init(jax.random.PRNGKey(1), x[:1], train=False))()["params"]
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), {
        "G1": gp, "G2": jax.tree.map(jnp.copy, gp),
        "D1": dp, "D2": jax.tree.map(jnp.copy, dp)})
    g_tx, d_tx = optax.adam(1e-5), optax.adam(1e-5)
    opt = {"G": g_tx.init({"G1": params["G1"], "G2": params["G2"]}),
           "D": d_tx.init({"D1": params["D1"], "D2": params["D2"]})}

    def g_loss(gP, dP, a, b):
        fake_B = gen.apply({"params": gP["G1"]}, a, train=True)
        both = gen.apply({"params": gP["G2"]},
                         jnp.concatenate([b, fake_B], axis=0), train=True)
        fake_A, cyc_A = jnp.split(both, 2, axis=0)
        cyc_B = gen.apply({"params": gP["G1"]}, fake_A, train=True)
        l = (10 * smooth_l1(b, cyc_B) + 10 * smooth_l1(a, cyc_A)
             + gan_loss(disc.apply({"params": jax.lax.stop_gradient(dP["D1"])}, fake_B, train=True), True)
             + gan_loss(disc.apply({"params": jax.lax.stop_gradient(dP["D2"])}, fake_A, train=True), True))
        return l, (fake_B, fake_A)

    def d_loss(dP, a, b, fake_A, fake_B):
        n = b.shape[0]
        p1 = disc.apply({"params": dP["D1"]}, jnp.concatenate(
            [b, jax.lax.stop_gradient(fake_B)], axis=0), train=True)
        p2 = disc.apply({"params": dP["D2"]}, jnp.concatenate(
            [a, jax.lax.stop_gradient(fake_A)], axis=0), train=True)
        return (gan_loss(p1[:n], True) + gan_loss(p1[n:], False)
                + gan_loss(p2[:n], True) + gan_loss(p2[n:], False))

    def step(params, opt, key):
        a = jax.random.uniform(key, x.shape, jnp.bfloat16) * 2 - 1
        b = jax.random.uniform(jax.random.fold_in(key, 1), x.shape, jnp.bfloat16) * 2 - 1
        gP = {"G1": params["G1"], "G2": params["G2"]}
        dP = {"D1": params["D1"], "D2": params["D2"]}
        (gl, (fake_B, fake_A)), g_grads = jax.value_and_grad(g_loss, has_aux=True)(gP, dP, a, b)
        gupd, gos = g_tx.update(g_grads, opt["G"], gP)
        gP = optax.apply_updates(gP, gupd)
        dl, d_grads = jax.value_and_grad(d_loss)(dP, a, b, fake_A, fake_B)
        dupd, dos = d_tx.update(d_grads, opt["D"], dP)
        dP = optax.apply_updates(dP, dupd)
        return {**gP, **dP}, {"G": gos, "D": dos}, gl + dl

    def one(params, opt, key):
        p, o, loss = step(params, opt, key)
        s = loss
        for leaf in jax.tree.leaves((p, o)):
            s = s + jnp.sum(leaf.astype(jnp.float32).ravel()[:1])
        return s

    txt = jax.jit(one).lower(params, opt, jax.random.PRNGKey(2)).compile().as_text()
    with open("/tmp/step_hlo.txt", "w") as f:
        f.write(txt)
    print(f"HLO chars: {len(txt)}, lines: {txt.count(chr(10))}")
    pat = re.compile(r"\s*(?:ROOT )?%?([\w.\-]+) = (\w+)\[([\d,]*)\][^=]*?= (\w[\w\-\.]*)\(")
    census = {}
    rows = []
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = (\w+)\[([\d,]*)\]", line)
        if not m:
            continue
        name, dtype, dims = m.groups()
        vol = 1
        for d in dims.split(","):
            if d:
                vol *= int(d)
        bpe = 2 if dtype in ("bf16", "f16", "u16", "s16") else 4
        rhs = line.split("=", 2)
        opname = ""
        if len(rhs) >= 3:
            opname = rhs[2].strip().split("(")[0].strip().split(" ")[-1]
        szb = vol * bpe
        rows.append((szb, opname, line.strip()[:200]))
        census[opname] = census.get(opname, 0) + szb
    print("---- output-bytes by op kind (top 15) ----")
    for k, v in sorted(census.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{v/1e6:10.1f} MB  {k}")
    print("---- biggest copy/transpose/reshape ops ----")
    n = 0
    for szb, opname, line in sorted(rows, reverse=True):
        if opname in ("copy", "transpose", "reshape", "bitcast-convert") and szb > 8e6:
            print(f"{szb/1e6:8.1f} MB  {line[:180]}")
            n += 1
            if n > 25:
                break

if __name__ == "__main__":
    main()
