import numpy as np
import pytest

from raygun_tpu.core import Coordinate, Roi
from raygun_tpu.io import open_ds, prepare_ds


@pytest.mark.parametrize("ext", ["zarr", "n5"])
def test_roundtrip(tmp_path, ext):
    path = str(tmp_path / f"vol.{ext}")
    vx = Coordinate(30, 30, 30)
    total = Roi((60, 0, 0), Coordinate(16, 16, 16) * vx)
    v = prepare_ds(path, "volumes/raw", total, vx, np.uint8, delete=True)
    data = np.arange(16**3, dtype=np.uint8).reshape(16, 16, 16)
    v.write(total, data)

    v2 = open_ds(path, "volumes/raw")
    assert v2.voxel_size == vx
    assert v2.offset == Coordinate(60, 0, 0)
    assert v2.roi == total
    assert np.array_equal(v2.read(total), data)

    # sub-roi read/write in world units
    sub = Roi((60 + 2 * 30, 3 * 30, 4 * 30), Coordinate(4, 4, 4) * vx)
    assert np.array_equal(v2.read(sub), data[2:6, 3:7, 4:8])
    v2b = open_ds(path, "volumes/raw", mode="a")
    v2b.write(sub, np.zeros((4, 4, 4), np.uint8))
    assert v2b.read(sub).sum() == 0


def test_multichannel(tmp_path):
    path = str(tmp_path / "vol.zarr")
    vx = Coordinate(30, 30, 30)
    total = Roi((0, 0, 0), Coordinate(8, 8, 8) * vx)
    v = prepare_ds(path, "affs", total, vx, np.float32, num_channels=3, delete=True)
    assert v.shape == (3, 8, 8, 8)
    assert v.num_channels == 3
    data = np.random.default_rng(0).random((3, 8, 8, 8)).astype(np.float32)
    v.write(total, data)
    assert np.allclose(open_ds(path, "affs").read(total), data)


def test_misaligned_roi_raises(tmp_path):
    path = str(tmp_path / "vol.zarr")
    vx = Coordinate(30, 30, 30)
    total = Roi((0, 0, 0), Coordinate(8, 8, 8) * vx)
    v = prepare_ds(path, "raw", total, vx, np.uint8, delete=True)
    with pytest.raises(AssertionError):
        v.read(Roi((15, 0, 0), (60, 60, 60)))
