import pytest

from raygun_tpu.core import Coordinate, Roi, block_grid


def test_coordinate_arithmetic():
    a = Coordinate(2, 4, 6)
    b = Coordinate(1, 2, 3)
    assert a + b == Coordinate(3, 6, 9)
    assert a - b == Coordinate(1, 2, 3)
    assert a * 2 == Coordinate(4, 8, 12)
    assert a / b == Coordinate(2, 2, 2)
    assert a // Coordinate(2, 3, 4) == Coordinate(1, 1, 1)
    assert -a == Coordinate(-2, -4, -6)
    assert a.min(b) == b
    assert a.max(b) == a
    assert Coordinate(7, 7, 7).ceil_div(Coordinate(2, 3, 4)) == Coordinate(4, 3, 2)


def test_coordinate_none_propagation():
    a = Coordinate(None, 4)
    assert (a + 1)[0] is None
    assert (a + 1)[1] == 5


def test_roi_basic():
    r = Roi((10, 20), (30, 40))
    assert r.end == Coordinate(40, 60)
    assert r.center == Coordinate(25, 40)
    assert r.size == 1200
    assert r.contains((10, 20))
    assert r.contains((39, 59))
    assert not r.contains((40, 60))


def test_roi_grow_intersect():
    r = Roi((10, 10), (20, 20))
    g = r.grow(5, 5)
    assert g == Roi((5, 5), (30, 30))
    s = r.grow(-5, -5)
    assert s == Roi((15, 15), (10, 10))
    other = Roi((20, 20), (20, 20))
    assert r.intersect(other) == Roi((20, 20), (10, 10))
    assert r.union(other) == Roi((10, 10), (30, 30))
    assert not r.intersect(Roi((100, 100), (5, 5))).intersects(r)


def test_roi_snap_to_grid():
    r = Roi((3, 5), (10, 10))
    g = r.snap_to_grid((4, 4), mode="grow")
    assert g.begin == Coordinate(0, 4)
    assert g.end == Coordinate(16, 16)
    s = r.snap_to_grid((4, 4), mode="shrink")
    assert s.begin == Coordinate(4, 8)
    assert s.end == Coordinate(12, 12)


def test_roi_voxel_slices():
    r = Roi((20, 40), (40, 80))
    sl = r.to_voxel_slices((20, 20))
    assert sl == (slice(1, 3), slice(2, 6))
    assert r.voxel_shape((20, 20)) == (2, 4)
    with pytest.raises(AssertionError):
        Roi((15, 40), (40, 80)).to_voxel_slices((20, 20))


def test_block_grid_tiles_and_context():
    # 100-long volume, write blocks of 30, context 10: writable = [10, 90)
    total = Roi((0,), (100,))
    blocks = block_grid(total, (30,), (10,))
    writes = [w for w, r in blocks]
    # covers [10,90) in 3 blocks: 30+30+20
    assert writes[0] == Roi((10,), (30,))
    assert writes[1] == Roi((40,), (30,))
    assert writes[2] == Roi((70,), (20,))
    # read rois = write grown by context
    assert blocks[0][1] == Roi((0,), (50,))
    assert blocks[2][1] == Roi((60,), (40,))
    # seamless coverage, no overlap of writes
    covered = sum(int(w.shape[0]) for w in writes)
    assert covered == 80


def test_block_grid_3d_count():
    total = Roi((0, 0, 0), (64, 64, 64))
    blocks = block_grid(total, (16, 16, 16), (8, 8, 8))
    assert len(blocks) == 27  # (64-16)/16 = 3 per dim
    for w, r in blocks:
        assert r.shape == w.shape + Coordinate(16, 16, 16)
