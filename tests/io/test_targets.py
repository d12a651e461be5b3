import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raygun_tpu.io import (
    add_affinities,
    balance_labels,
    diagonal_neighborhood,
    grow_boundary,
    local_shape_descriptors,
    lsd_mask,
    mtlsd_neighborhood,
)


def two_block_labels(n=8):
    """labels: left half = 1, right half = 2 along axis 0."""
    labels = np.ones((n, n, n), np.int32)
    labels[n // 2:] = 2
    return jnp.asarray(labels)


class TestAffinities:
    def test_simple_boundary(self):
        labels = two_block_labels(8)
        nb = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]])
        affs, mask = jax.jit(lambda l: add_affinities(l, nb))(labels)
        assert affs.shape == (8, 8, 8, 3)
        # affinity along axis 0 is 0 exactly at the boundary row (v=3: 1 vs 2)
        assert float(affs[3, 0, 0, 0]) == 0.0
        assert float(affs[2, 0, 0, 0]) == 1.0
        # along axes 1, 2 everything connected
        assert float(jnp.min(affs[..., 1][:, :-1])) == 1.0
        # boundary voxels (v+o out of bounds) masked out
        assert float(mask[7, 0, 0, 0]) == 0.0
        assert float(mask[6, 0, 0, 0]) == 1.0

    def test_background_zero(self):
        labels = jnp.zeros((4, 4, 4), jnp.int32)
        nb = np.array([[1, 0, 0]])
        affs, _ = add_affinities(labels, nb)
        assert float(jnp.max(affs)) == 0.0

    def test_long_range_offset(self):
        labels = two_block_labels(8)
        nb = np.array([[4, 0, 0]])
        affs, mask = add_affinities(labels, nb)
        # any voxel within 4 of the boundary is disconnected
        assert float(affs[0, 0, 0, 0]) == 0.0  # 1 vs 2 (crosses boundary)
        assert float(mask[4, 0, 0, 0]) == 0.0  # out of bounds


class TestDiagonalNeighborhood:
    def test_reference_construction(self):
        # parity with reference systems/MTLSD.py:30-43
        n = 8
        diag = diagonal_neighborhood(n)
        angles = np.linspace(0, np.pi, num=n, endpoint=False)
        assert np.array_equal(diag[:, 1], np.round(n * np.sin(angles)))
        assert np.array_equal(diag[:, 2], np.round(n * np.cos(angles)))
        assert np.all(diag[:, 0] == 0)
        nb = mtlsd_neighborhood([[1, 0, 0], [0, 1, 0], [0, 0, 1]], 8)
        assert nb.shape == (11, 3)


class TestBalanceLabels:
    def test_weights_sum_balanced(self):
        affs = jnp.asarray(np.random.default_rng(0).random((8, 8, 8, 3)) > 0.3).astype(
            jnp.float32
        )
        mask = jnp.ones_like(affs)
        w = balance_labels(affs, mask)
        # total weight on positives ≈ total weight on negatives
        pos = float(jnp.sum(w * affs))
        neg = float(jnp.sum(w * (1 - affs)))
        assert abs(pos - neg) / (pos + neg) < 0.02
        assert float(jnp.min(w)) > 0

    def test_masked_out_zero(self):
        affs = jnp.ones((4, 4, 4, 1), jnp.float32)
        mask = jnp.zeros_like(affs).at[0].set(1.0)
        w = balance_labels(affs, mask)
        assert float(jnp.sum(w[1:])) == 0.0


class TestGrowBoundary:
    def test_boundary_grows(self):
        labels = two_block_labels(8)
        grown = jax.jit(lambda l: grow_boundary(l, steps=1))(labels)
        # one voxel on each side of the 3|4 interface becomes 0
        assert int(grown[3, 4, 4]) == 0
        assert int(grown[4, 4, 4]) == 0
        assert int(grown[2, 4, 4]) == 1
        assert int(grown[5, 4, 4]) == 2
        # outer faces also erode (label↔outside counts as boundary? no —
        # out-of-bounds is fill=-1, masked off, so faces keep labels)
        assert int(grown[0, 4, 4]) == 1

    def test_two_steps(self):
        labels = two_block_labels(8)
        grown = grow_boundary(labels, steps=2)
        assert int(grown[2, 4, 4]) == 0
        assert int(grown[5, 4, 4]) == 0
        assert int(grown[1, 4, 4]) == 1


class TestLSDs:
    def test_shapes_and_range(self):
        labels = two_block_labels(8)
        lsds = jax.jit(
            lambda l: local_shape_descriptors(l, sigma=60.0, voxel_size=(30, 30, 30), max_labels=4)
        )(labels)
        assert lsds.shape == (8, 8, 8, 10)
        assert float(jnp.min(lsds)) >= 0.0
        assert float(jnp.max(lsds)) <= 1.0

    def test_background_zero(self):
        labels = jnp.zeros((6, 6, 6), jnp.int32).at[:2].set(5)
        lsds = local_shape_descriptors(labels, 30.0, (30, 30, 30), max_labels=4)
        assert float(jnp.sum(lsds[3:])) == 0.0
        assert float(jnp.sum(lsds[:2])) > 0.0

    def test_mean_offset_points_inward(self):
        # voxels at the boundary of a label should have offset pointing into
        # the label body: channel 0 (z-offset) > 0.5 at low-z face of label 2
        labels = two_block_labels(8)
        lsds = local_shape_descriptors(labels, 90.0, (30, 30, 30), max_labels=4)
        # label 2 occupies z in [4, 8); at z=4 the mass center is deeper → offset +z
        assert float(lsds[4, 4, 4, 0]) > 0.5
        # label 1 occupies z in [0, 4); at z=3 offset points to -z
        assert float(lsds[3, 4, 4, 0]) < 0.5

    def test_downsample(self):
        labels = two_block_labels(8)
        lsds = local_shape_descriptors(
            labels, 60.0, (30, 30, 30), max_labels=4, downsample=2
        )
        assert lsds.shape == (8, 8, 8, 10)

    def test_lsd_mask(self):
        labels = jnp.zeros((4, 4, 4), jnp.int32).at[0].set(1)
        m = lsd_mask(labels, 10)
        assert m.shape == (4, 4, 4, 10)
        assert float(jnp.sum(m)) == 16 * 10
