"""Synthetic stand-in volumes for the isbi-2023 template pipeline.

Uses the HARD protocol (membrane gaps + thin membranes, io/synthetic.py)
so segmentation quality keeps discriminating with training budget — the
easy protocol saturates VOI near zero within ~2k steps (VERDICT r4 #3).
Pass --easy to restore the r2-r4 volumes.
"""

import os
import sys

import numpy as np

from raygun_tpu.io.synthetic import make_cyclegan_dataset, make_segmentation_dataset

HERE = os.path.dirname(os.path.abspath(__file__))
HARD = {} if "--easy" in sys.argv else {
    "gap_fraction": 0.35, "membrane_sigma": 0.6,
}

make_cyclegan_dataset(
    os.path.join(HERE, "data.zarr"),
    shape=(256, 256), voxel_size_a=(30, 30), voxel_size_b=(90, 90),
    **HARD,
)
make_segmentation_dataset(
    os.path.join(HERE, "gt.zarr"), shape=(64, 96, 96), voxel_size=(30, 30, 30),
    **HARD,
)

# 90nm-acquisition stand-in on the same grid (reference 02_MTLSD/real/90nm
# trains on the lower-resolution acquisition of the same sample): blurred
# copy of the 30nm raw.
from scipy.ndimage import gaussian_filter

from raygun_tpu.io.volume import open_ds, prepare_ds

raw = open_ds(os.path.join(HERE, "gt.zarr"), "volumes/raw")
blurred = gaussian_filter(raw.read().astype(np.float32), sigma=1.5)
v90 = prepare_ds(os.path.join(HERE, "gt.zarr"), "volumes/raw_90nm",
                 raw.roi, raw.voxel_size, raw.dtype, delete=True)
v90.write(raw.roi, blurred.astype(raw.dtype))

# synthetic skeleton GT so the validation/test-eval configs run end-to-end
# (production runs replace these with webknossos annotation downloads)
from raygun_tpu.io.synthetic import make_skeleton_nml

labels = open_ds(os.path.join(HERE, "gt.zarr"), "volumes/labels").read()
for sub in ("02_MTLSD", "03_evaluate"):
    make_skeleton_nml(labels, os.path.join(HERE, sub, "skeleton.nml"))

print("wrote data.zarr (A/B sides), gt.zarr (labeled training cube "
      "+ 90nm stand-in), and synthetic skeleton.nml GT")
