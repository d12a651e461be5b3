import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raygun_tpu.io import (
    elastic_augment,
    elastic_margin,
    intensity_augment,
    intensity_scale_shift,
    normalize,
    simple_augment,
    valid_origins,
    DeviceVolumeSampler,
)


class TestIntensity:
    def test_normalize_uint8(self):
        x = jnp.asarray(np.array([0, 128, 255], np.uint8))
        y = normalize(x)
        assert y.dtype == jnp.float32
        assert float(y[0]) == 0.0
        assert abs(float(y[2]) - 1.0) < 1e-6

    def test_scale_shift_tanh_domain(self):
        x = jnp.asarray([0.0, 0.5, 1.0])
        y = intensity_scale_shift(x, 2, -1)
        assert np.allclose(np.asarray(y), [-1, 0, 1])

    def test_intensity_augment_bounds(self, key):
        x = jnp.asarray(np.random.default_rng(0).random((16, 16)).astype(np.float32))
        y = intensity_augment(x, key, 0.9, 1.1, -0.1, 0.1)
        assert y.shape == x.shape
        assert float(jnp.min(y)) >= 0.0 and float(jnp.max(y)) <= 1.0
        assert not np.allclose(np.asarray(y), np.asarray(x))


class TestSimpleAugment:
    def test_consistent_across_arrays(self, key):
        rng = np.random.default_rng(1)
        raw = jnp.asarray(rng.random((8, 8, 8)).astype(np.float32))
        labels = (raw > 0.5).astype(jnp.int32)
        out = jax.jit(
            lambda a, k: simple_augment(a, k, ndims=3)
        )({"raw": raw, "labels": labels}, key)
        # the same geometric transform must apply to both arrays
        assert np.array_equal(
            np.asarray(out["raw"] > 0.5).astype(np.int32), np.asarray(out["labels"])
        )

    def test_transform_diversity(self):
        x = jnp.asarray(np.arange(64, dtype=np.float32).reshape(8, 8))
        seen = set()
        for i in range(20):
            out = simple_augment({"x": x}, jax.random.PRNGKey(i), ndims=2)
            seen.add(np.asarray(out["x"]).tobytes())
        assert len(seen) > 3  # flips × transposes actually vary

    def test_channels_untouched(self, key):
        x = jnp.asarray(np.random.default_rng(0).random((4, 4, 3)).astype(np.float32))
        out = simple_augment({"x": x}, key, ndims=2)["x"]
        assert out.shape == (4, 4, 3)


class TestElastic:
    def test_identity_when_no_jitter_no_rotation(self, key):
        x = jnp.asarray(np.random.default_rng(2).random((16, 16, 16)).astype(np.float32))
        target = (8, 8, 8)
        out = elastic_augment(
            {"x": x}, key, target, control_point_spacing=(4, 4, 4),
            jitter_sigma=(0, 0, 0), rotation_interval=(0.0, 0.0), subsample=1,
        )["x"]
        # with zero displacement and zero rotation, output == center crop
        assert np.allclose(np.asarray(out), np.asarray(x[4:12, 4:12, 4:12]), atol=1e-5)

    def test_labels_stay_integral(self, key):
        labels = jnp.asarray(
            np.random.default_rng(3).integers(0, 5, (20, 20, 20)).astype(np.int32)
        )
        out = elastic_augment(
            {"labels": labels}, key, (8, 8, 8), (4, 4, 4), (1, 1, 1), (0, np.pi / 2),
        )["labels"]
        vals = set(np.unique(np.asarray(out)).tolist())
        assert vals.issubset({0, 1, 2, 3, 4})

    def test_margin_covers_rotation(self):
        m = elastic_margin((64, 64, 64), (2, 2, 2), rotation=True)
        assert m[0] == 7  # 3σ + 1, no rotation on leading axis... see below
        assert m[1] > 10 and m[2] > 10  # rotation margin on in-plane axes


class TestValidOrigins:
    def test_unmasked_counts(self):
        mask = np.ones((10, 10), bool)
        org = valid_origins(mask, (4, 4))
        assert len(org) == 7 * 7

    def test_min_masked(self):
        mask = np.zeros((10, 10), bool)
        mask[:, :5] = True  # left half masked-in
        org = valid_origins(mask, (4, 4), min_masked=0.99)
        # fully-inside-left-half origins only: cols 0..1 (crop cols j..j+3 ≤ 4)
        assert set(org[:, 1].tolist()) == {0, 1}

    def test_no_valid_raises(self):
        mask = np.zeros((8, 8), bool)
        with pytest.raises(ValueError):
            valid_origins(mask, (4, 4), min_masked=0.5)


class TestDeviceVolumeSampler:
    def test_sample_batch_shapes_and_determinism(self, key):
        rng = np.random.default_rng(0)
        arrays = {
            "raw": rng.random((32, 32, 32)).astype(np.float32),
            "labels": rng.integers(0, 9, (32, 32, 32)).astype(np.int32),
        }
        s = DeviceVolumeSampler(arrays, (8, 8, 8))
        batch = jax.jit(lambda k: s.sample_batch(k, 3))(key)
        assert batch["raw"].shape == (3, 8, 8, 8)
        assert batch["labels"].shape == (3, 8, 8, 8)
        batch2 = jax.jit(lambda k: s.sample_batch(k, 3))(key)
        assert np.array_equal(np.asarray(batch["raw"]), np.asarray(batch2["raw"]))

    def test_mask_constraint(self):
        mask = np.zeros((16, 16, 16), np.uint8)
        mask[:8] = 1
        arrays = {"raw": np.random.default_rng(0).random((16, 16, 16)).astype(np.float32),
                  "cell_mask": mask}
        s = DeviceVolumeSampler(arrays, (4, 4, 4), mask_name="cell_mask", min_masked=0.99)
        batch = s.sample_batch(jax.random.PRNGKey(0), 8)
        # all crops fully in masked region → cell_mask crops all ones
        assert float(jnp.min(batch["cell_mask"])) == 1.0


class TestWarpShears:
    """Gather-free 3-shear elastic warp (io/augment.py warp_shears).

    Not bit-identical to map_coordinates by design (3 linear interps vs one
    bilinear; jitter fields read at pass positions) — these tests pin the
    exactness islands and bound the divergence elsewhere. Reference
    capability: gp.ElasticAugment (``io/CycleDataPipe.py:139-150``)."""

    S, T = 96, 48

    def _direct(self, img, theta, disp, max_disp=4.0):
        import math

        from raygun_tpu.io import warp

        S, T = self.S, self.T
        c = (S - 1) / 2.0
        off = (S - T) // 2
        g = jnp.meshgrid(jnp.arange(T, dtype=jnp.float32) + off - c,
                         jnp.arange(T, dtype=jnp.float32) + off - c,
                         indexing="ij")
        ct, st = jnp.cos(theta), jnp.sin(theta)
        dc = jnp.clip(disp[:, off:off + T, off:off + T], -max_disp, max_disp)
        coords = jnp.stack([ct * g[0] - st * g[1] + dc[0] + c,
                            st * g[0] + ct * g[1] + dc[1] + c])
        return warp(img, coords, order=1)

    @pytest.mark.parametrize("q", [0, 1, 2, 3])
    def test_quadrant_rotations_exact(self, q):
        import math

        from raygun_tpu.io import warp_shears

        img = jnp.asarray(
            np.random.default_rng(3).random((self.S, self.S)), jnp.float32)
        theta = jnp.float32(q * math.pi / 2)
        disp = jnp.zeros((2, self.S, self.S), jnp.float32)
        fast = warp_shears(img, theta, disp, (self.T, self.T), max_disp=4.0)
        direct = self._direct(img, theta, disp)
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(direct), atol=2e-5)

    @pytest.mark.parametrize("theta", [0.31, 0.78, 1.13, -0.4])
    def test_pure_rotation_exact_on_linear_image(self, theta):
        # every interpolation (bilinear or shear-linear) is exact on an
        # affine image, and with zero jitter the shear COORDINATE
        # composition is exact, so the two routes must agree to roundoff.
        from raygun_tpu.io import warp_shears

        y, x = jnp.meshgrid(jnp.arange(self.S, dtype=jnp.float32),
                            jnp.arange(self.S, dtype=jnp.float32),
                            indexing="ij")
        img = 0.3 + 0.01 * y - 0.007 * x
        disp = jnp.zeros((2, self.S, self.S), jnp.float32)
        fast = warp_shears(img, jnp.float32(theta), disp,
                           (self.T, self.T), max_disp=4.0)
        direct = self._direct(img, jnp.float32(theta), disp)
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(direct), atol=1e-4)

    def test_jitter_only_close_on_smooth_image(self):
        from raygun_tpu.io import elastic_params, warp_shears

        key = jax.random.PRNGKey(7)
        img = jax.random.uniform(key, (self.S, self.S), jnp.float32)
        for _ in range(4):
            img = (img + jnp.roll(img, 1, 0) + jnp.roll(img, -1, 0)
                   + jnp.roll(img, 1, 1) + jnp.roll(img, -1, 1)) / 5.0
        theta, disp = elastic_params(
            key, (self.S, self.S), (12, 12), (1.0, 1.0), subsample=2)
        disp = jnp.clip(disp, -4.0, 4.0)
        fast = warp_shears(img, jnp.float32(0.0), disp,
                           (self.T, self.T), max_disp=4.0)
        direct = self._direct(img, jnp.float32(0.0), disp)
        err = np.abs(np.asarray(fast) - np.asarray(direct))
        # pass-position field evaluation shifts coordinates by ≤ ~0.5 px
        assert err.max() < 0.05, err.max()

    def test_determinism_and_batch(self):
        from raygun_tpu.io import elastic_params, warp_shears

        key = jax.random.PRNGKey(11)
        imgs = jax.random.uniform(key, (3, self.S, self.S), jnp.float32)

        def one(im, k):
            theta, disp = elastic_params(
                k, (self.S, self.S), (12, 12), (1.0, 1.0), subsample=2)
            return warp_shears(im, theta, disp, (self.T, self.T),
                               max_disp=4.0)

        keys = jax.random.split(key, 3)
        a = jax.jit(jax.vmap(one))(imgs, keys)
        b = jax.jit(jax.vmap(one))(imgs, keys)
        assert a.shape == (3, self.T, self.T)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert np.isfinite(np.asarray(a)).all()
        # distinct keys give distinct warps
        assert not np.allclose(np.asarray(a[0]), np.asarray(a[1]))
