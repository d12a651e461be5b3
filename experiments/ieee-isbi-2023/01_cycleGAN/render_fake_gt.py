"""Render fake-30nm versions of the labeled training cube, section-wise.

The paper recipe (reference ``experiments/ieee-isbi-2023``) trains MTLSD on
CycleGAN-enhanced raw: the 2D generator is applied to every z-section of the
3D ground-truth volume (the reference's 2D-in-3D rendering, 512^2 -> 472^2
daisy blocks). Here each section is one jitted forward; labels are untouched.

Usage: python render_fake_gt.py [variant seed ...]   (default: all 6)
Writes gt.zarr/volumes/raw_fake_<variant>_seed<seed>.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from raygun_tpu.io.volume import open_ds, prepare_ds
from raygun_tpu.systems import load_system

HERE = os.path.dirname(os.path.abspath(__file__))
GT = os.path.join(HERE, "..", "gt.zarr")


def render(variant: str, seed: str) -> str:
    conf = os.path.join(HERE, variant, f"seed{seed}", "train_conf.json")
    cwd = os.getcwd()
    os.chdir(os.path.dirname(conf))
    try:
        system = load_system(conf)
        fwd, _ = system.predict_setup(net_name="netG2")
    finally:
        os.chdir(cwd)

    raw = open_ds(GT, "volumes/raw")
    data = raw.read().astype(np.float32)
    info = np.iinfo(raw.dtype) if np.issubdtype(raw.dtype, np.integer) else None
    if info is not None:
        data = (data - info.min) / (info.max - info.min)
    data = data * 2 - 1  # generator trains on [-1, 1]

    @jax.jit
    def section(x):
        return next(iter(fwd(x[None, ..., None]).values()))[0, ..., 0]

    # predict_setup's fwd already rescales generator output to [0, 1]
    fake = np.stack([np.asarray(section(jnp.asarray(z))) for z in data])
    fake = np.clip(fake, 0, 1)
    if info is not None:
        fake = (fake * info.max).astype(raw.dtype)

    ds_name = f"volumes/raw_fake_{variant}_seed{seed}"
    out = prepare_ds(GT, ds_name, raw.roi, raw.voxel_size, raw.dtype, delete=True)
    out.write(raw.roi, fake)
    return ds_name


if __name__ == "__main__":
    args = sys.argv[1:]
    pairs = (
        list(zip(args[::2], args[1::2]))
        if args else [(v, s) for v in ("link", "split") for s in ("3", "13", "42")]
    )
    for variant, seed in pairs:
        print("rendered", render(variant, seed))
