"""Reproduce the production-recipe stage-4 MTLSD predict hang with
per-phase timestamps + a periodic all-thread stack dump (faulthandler),
so a stall points at the exact line."""

import faulthandler
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

faulthandler.dump_traceback_later(180, repeat=True, file=sys.stderr)

T0 = time.time()


def mark(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    mark(f"device: {jax.devices()[0]}")

    out = "/root/repo/experiments_out/production_recipe"
    conf_path = os.path.join(out, "predict_conf.json")

    from raygun_tpu.core import read_config
    from raygun_tpu.systems import load_system

    rc = read_config(conf_path)
    mark("render config read")

    cwd = os.getcwd()
    os.chdir(os.path.dirname(rc["config_path"]))
    try:
        system = load_system(rc["config_path"])
        mark("system loaded")
        fwd, spec = system.predict_setup(checkpoint=rc["checkpoint"])
        mark(f"predict_setup done (spec={spec})")
    finally:
        os.chdir(cwd)

    import numpy as np

    x = np.random.rand(1, 196, 196, 196, 1).astype(np.float32)
    y = fwd(x)
    s = float(sum(v.sum() for v in y.values()))
    mark(f"first 196^3 fwd done, checksum {s:.3f}")
    x2 = np.random.rand(1, 196, 196, 196, 1).astype(np.float32)
    t0 = time.time()
    y = fwd(x2)
    s = float(sum(v.sum() for v in y.values()))
    mark(f"second fwd done in {time.time() - t0:.1f}s, checksum {s:.3f}")

    # now the full predict CLI path
    from raygun_tpu.cli.predict import predict

    t0 = time.time()
    outputs = predict(conf_path)
    mark(f"predict() done in {time.time() - t0:.1f}s -> {outputs}")


if __name__ == "__main__":
    main()
