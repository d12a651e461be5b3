"""Synthetic stand-in volumes for the isbi-2023 template pipeline."""

import os

from raygun_tpu.io.synthetic import make_cyclegan_dataset, make_segmentation_dataset

HERE = os.path.dirname(os.path.abspath(__file__))

make_cyclegan_dataset(
    os.path.join(HERE, "data.zarr"),
    shape=(256, 256), voxel_size_a=(30, 30), voxel_size_b=(90, 90),
)
make_segmentation_dataset(
    os.path.join(HERE, "gt.zarr"), shape=(64, 96, 96), voxel_size=(30, 30, 30),
)
print("wrote data.zarr (A/B sides) and gt.zarr (labeled training cube)")
