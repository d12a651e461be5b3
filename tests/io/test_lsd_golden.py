"""LSD numerics vs closed-form goldens (VERDICT r1 item 10).

The lsd-package semantics (gaussian-weighted same-label statistics,
reference ``MTLSDDataPipe.py:100-105``) admit closed forms for a half-space
label: along the boundary normal the statistics are those of a truncated
normal (erf/pdf expressions); along in-plane axes they are the free-window
values (offset 0, variance sigma^2, pearson 0). These tests pin the
implementation's numerics to those formulas — a correctness check no
regression in the blur/normalization machinery can pass by accident.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raygun_tpu.io.targets import local_shape_descriptors


SIGMA = 6.0  # voxels (voxel_size 1) — large enough for discretization error << tol


def _phi(x):
    return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))


def _pdf(x, s):
    return math.exp(-0.5 * (x / s) ** 2) / (s * math.sqrt(2 * math.pi))


def truncated_stats(a, b, s):
    """Mean/variance/mass of N(0, s^2) restricted to [a, b]."""
    mass = _phi(b / s) - _phi(a / s)
    m1 = s * s * (_pdf(a, s) - _pdf(b, s))
    mean = m1 / mass
    m2 = s * s * mass + s * s * (a * _pdf(a, s) - b * _pdf(b, s))
    var = m2 / mass - mean**2
    return mean, var, mass


@pytest.fixture(scope="module")
def halfspace_lsds():
    n = 64
    labels = np.zeros((n, n, n), np.int32)
    labels[:, :, n // 2:] = 1  # half-space: label occupies x >= 32
    lsds = np.asarray(
        local_shape_descriptors(jnp.asarray(labels), SIGMA, (1, 1, 1),
                                max_labels=4)
    )
    return labels, lsds


def test_halfspace_normal_axis_profile(halfspace_lsds):
    """Mean offset + variance along the boundary normal match the truncated
    normal closed form at several depths."""
    _, lsds = halfspace_lsds
    n = lsds.shape[0]
    x0 = n // 2
    for depth in (0, 3, 6, 12, 24):
        p = x0 + depth
        # label region in offset coords: t in [-depth-0.5, n-p-0.5) — the
        # upper bound is the VOLUME edge (the blur zero-pads past it)
        mean, var, _ = truncated_stats(-depth - 0.5, n - p - 0.5, SIGMA)
        got_off = lsds[n // 2, n // 2, p, 2]  # x-offset channel
        want_off = np.clip(mean / SIGMA * 0.5 + 0.5, 0, 1)
        assert abs(got_off - want_off) < 0.02, (depth, got_off, want_off)
        got_var = lsds[n // 2, n // 2, p, 5]  # x-variance channel
        want_var = np.clip(var / SIGMA**2, 0, 1)
        assert abs(got_var - want_var) < 0.03, (depth, got_var, want_var)


def test_halfspace_inplane_axes_free_window(halfspace_lsds):
    """In-plane axes see a free window: offset 0.5, variance ~= 1 (sigma^2
    normalized), pearson 0.5 (uncorrelated), deep inside."""
    _, lsds = halfspace_lsds
    n = lsds.shape[0]
    c = n // 2
    vox = lsds[c, c, c + 20]
    # z/y offsets (channels 0,1)
    assert abs(vox[0] - 0.5) < 0.01 and abs(vox[1] - 0.5) < 0.01
    # z/y variances (channels 3,4): discrete truncated gaussian slightly < 1
    assert vox[3] > 0.9 and vox[4] > 0.9
    # pearsons (channels 6,7,8) all ~0.5
    for ch in (6, 7, 8):
        assert abs(vox[ch] - 0.5) < 0.02
    # size (channel 9): full window mass
    assert vox[9] > 0.97


def test_halfspace_size_drops_at_boundary(halfspace_lsds):
    _, lsds = halfspace_lsds
    n = lsds.shape[0]
    c = n // 2
    # at the boundary voxel, half the window mass is outside the label
    _, _, mass = truncated_stats(-0.5, n - c - 0.5, SIGMA)
    got = lsds[c, c, c, 9]
    assert abs(got - mass) < 0.02, (got, mass)


def test_mirror_symmetry():
    rng = np.random.default_rng(0)
    labels = np.zeros((24, 24, 24), np.int32)
    labels[:, :, :10] = 1
    labels[:, :, 14:] = 2
    lsds = np.asarray(
        local_shape_descriptors(jnp.asarray(labels), 3.0, (1, 1, 1), max_labels=4))
    flipped = np.asarray(
        local_shape_descriptors(jnp.asarray(labels[:, :, ::-1].copy()), 3.0,
                                (1, 1, 1), max_labels=4))
    # x-offset channel mirrors around 0.5; variance/size channels mirror as-is
    np.testing.assert_allclose(
        flipped[..., 2], (1.0 - lsds[..., 2] * (lsds[..., 9] > 0))[:, :, ::-1]
        * (flipped[..., 9] > 0), atol=1e-4)
    np.testing.assert_allclose(flipped[..., 5], lsds[:, :, ::-1, 5], atol=1e-4)
    np.testing.assert_allclose(flipped[..., 9], lsds[:, :, ::-1, 9], atol=1e-4)


def test_outside_labels_zero():
    labels = np.zeros((16, 16, 16), np.int32)
    labels[:4] = 7
    lsds = np.asarray(
        local_shape_descriptors(jnp.asarray(labels), 3.0, (1, 1, 1), max_labels=4))
    assert (lsds[8:] == 0).all()
