"""Chunked volume IO: zarr/N5 via tensorstore, with funke-style metadata.

Capability parity with the reference's use of ``daisy.open_ds`` /
``daisy.prepare_ds`` (funlib.persistence; reference ``predict.py:110-125``,
``segment.py:205-228``): datasets carry world-unit ``resolution`` (voxel
size) and ``offset`` attributes, addressed by :class:`raygun_tpu.core.Roi`
in world units. Backed by tensorstore so reads/writes are async-capable and
chunk-parallel (no zarr-python dependency in this environment).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional, Sequence, Tuple, Union

import numpy as np
import tensorstore as ts

from ..core.roi import Coordinate, Roi


def _dataset_format(path: str) -> str:
    p = path.lower()
    if p.endswith(".n5"):
        return "n5"
    return "zarr"


def _spec(path: str, ds_name: str, fmt: str) -> dict:
    # tensorstore requires absolute file paths in kvstore specs
    return {
        "driver": fmt,
        "kvstore": {"driver": "file", "path": os.path.abspath(os.path.join(path, ds_name))},
    }


def _attrs_path(path: str, ds_name: str, fmt: str) -> str:
    if fmt == "n5":
        return os.path.join(path, ds_name, "attributes.json")
    return os.path.join(path, ds_name, ".zattrs")


class Volume:
    """A chunked N-D dataset with world-unit geometry.

    ``data`` axes are ``([channels,] *spatial)``; ``voxel_size``/``offset``
    describe the spatial axes only (trailing ``ndims`` axes).
    """

    def __init__(self, store: ts.TensorStore, voxel_size, offset, path="", ds_name="",
                 axis_names=None):
        self.store = store
        ndims = len(voxel_size)
        self.voxel_size = Coordinate(voxel_size)
        self.offset = Coordinate(offset if offset is not None else (0,) * ndims)
        self.path = path
        self.ds_name = ds_name
        self.axis_names = axis_names

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.store.shape)

    @property
    def ndims(self) -> int:
        return len(self.voxel_size)

    @property
    def num_channels(self) -> int:
        extra = len(self.shape) - self.ndims
        if extra == 0:
            return 0  # no channel axis
        return self.shape[0]

    @property
    def spatial_shape(self) -> Tuple[int, ...]:
        return self.shape[-self.ndims:]

    @property
    def dtype(self):
        return self.store.dtype.numpy_dtype

    @property
    def roi(self) -> Roi:
        return Roi(self.offset, Coordinate(self.spatial_shape) * self.voxel_size)

    def _slices(self, roi: Roi) -> tuple:
        sl = roi.to_voxel_slices(self.voxel_size, self.offset)
        extra = len(self.shape) - self.ndims
        return (slice(None),) * extra + sl

    def read(self, roi: Optional[Roi] = None) -> np.ndarray:
        """Read (synchronously) the voxels covering ``roi`` (world units)."""
        if roi is None:
            return self.store.read().result()
        return self.store[self._slices(roi)].read().result()

    def read_async(self, roi: Roi):
        """Start an async read; call ``.result()`` on the return value."""
        return self.store[self._slices(roi)].read()

    def write(self, roi: Roi, data: np.ndarray) -> None:
        self.store[self._slices(roi)] = np.ascontiguousarray(data)

    def write_async(self, roi: Roi, data: np.ndarray):
        return self.store[self._slices(roi)].write(np.ascontiguousarray(data))

    def __getitem__(self, roi: Roi) -> np.ndarray:
        return self.read(roi)

    def __repr__(self):
        return (
            f"Volume({self.path}/{self.ds_name}, shape={self.shape}, "
            f"voxel_size={tuple(self.voxel_size)}, offset={tuple(self.offset)}, "
            f"dtype={self.dtype})"
        )


def open_ds(path: str, ds_name: str, mode: str = "r") -> Volume:
    """Open an existing zarr/N5 dataset (parity: ``daisy.open_ds``)."""
    fmt = _dataset_format(path)
    store = ts.open(
        _spec(path, ds_name, fmt), open=True, read=True, write=(mode != "r")
    ).result()
    attrs = {}
    ap = _attrs_path(path, ds_name, fmt)
    if os.path.exists(ap):
        with open(ap) as f:
            attrs = json.load(f)
    ndim = len(store.shape)
    resolution = attrs.get("resolution", (1,) * min(ndim, 3))
    offset = attrs.get("offset", (0,) * len(resolution))
    return Volume(store, resolution, offset, path, ds_name, attrs.get("axis_names"))


def prepare_ds(
    path: str,
    ds_name: str,
    total_roi: Roi,
    voxel_size,
    dtype,
    write_size=None,
    num_channels: Optional[int] = None,
    delete: bool = False,
    extra_attrs: Optional[dict] = None,
) -> Volume:
    """Create (or recreate) a dataset covering ``total_roi`` (parity:
    ``daisy.prepare_ds``; the reference deletes + recreates outputs before
    blockwise prediction, ``predict.py:110-125``)."""
    fmt = _dataset_format(path)
    voxel_size = Coordinate(voxel_size)
    assert total_roi.shape.is_multiple_of(voxel_size)
    spatial = total_roi.voxel_shape(voxel_size)
    shape = ((num_channels,) if num_channels else ()) + tuple(spatial)

    ds_path = os.path.join(path, ds_name)
    if delete and os.path.exists(ds_path):
        shutil.rmtree(ds_path)

    if write_size is not None:
        chunk_spatial = Roi((0,) * len(spatial), write_size).voxel_shape(voxel_size)
    else:
        chunk_spatial = tuple(min(s, 64) for s in spatial)
    chunks = ((num_channels,) if num_channels else ()) + tuple(chunk_spatial)

    dtype = np.dtype(dtype)
    spec = _spec(path, ds_name, fmt)
    if fmt == "n5":
        # tensorstore's n5 driver presents dimensions in the order given here
        # (it handles the file's fortran-order storage internally).
        spec["metadata"] = {
            "dimensions": list(shape),
            "blockSize": list(chunks),
            "dataType": dtype.name,
        }
    else:
        spec["metadata"] = {
            "shape": list(shape),
            "chunks": list(chunks),
            "dtype": dtype.str,
        }
    store = ts.open(spec, create=True, open=True, read=True, write=True).result()

    attrs = {
        "resolution": [int(v) for v in voxel_size],
        "offset": [int(o) for o in total_roi.offset],
    }
    if extra_attrs:
        attrs.update(extra_attrs)
    ap = _attrs_path(path, ds_name, fmt)
    existing = {}
    if fmt == "n5" and os.path.exists(ap):
        with open(ap) as f:
            existing = json.load(f)
    existing.update(attrs)
    with open(ap, "w") as f:
        json.dump(existing, f)

    return Volume(store, voxel_size, total_roi.offset, path, ds_name)
