"""Multi-source sampling (reference MergeProvider over several volumes)."""

import jax
import jax.numpy as jnp
import numpy as np

from raygun_tpu.io import MultiSourceSampler


def test_multisource_ragged_shapes():
    rng = np.random.default_rng(0)
    # source 0 is constant 1.0, source 1 constant 2.0, different shapes
    s0 = {"raw": np.full((16, 16, 16), 1.0, np.float32),
          "labels": np.ones((16, 16, 16), np.int32)}
    s1 = {"raw": np.full((24, 20, 16), 2.0, np.float32),
          "labels": np.full((24, 20, 16), 2, np.int32)}
    sampler = MultiSourceSampler([s0, s1], (8, 8, 8))
    batch = jax.jit(lambda k: sampler.sample_batch(k, 16))(jax.random.PRNGKey(0))
    assert batch["raw"].shape == (16, 8, 8, 8)
    # every crop comes wholly from one source (constant value 1 or 2)
    vals = np.asarray(batch["raw"]).reshape(16, -1)
    per_crop = np.unique(vals, axis=1)
    assert per_crop.shape[1] == 1
    assert set(np.unique(vals)).issubset({1.0, 2.0})
    # both sources get sampled
    assert len(set(np.unique(vals))) == 2


def test_multisource_mask():
    s0 = {"raw": np.zeros((12, 12, 12), np.float32),
          "cell_mask": np.zeros((12, 12, 12), np.uint8)}
    s1 = {"raw": np.ones((12, 12, 12), np.float32),
          "cell_mask": np.ones((12, 12, 12), np.uint8)}
    sampler = MultiSourceSampler([s0, s1], (4, 4, 4), mask_name="cell_mask",
                                 min_masked=0.99)
    batch = sampler.sample_batch(jax.random.PRNGKey(1), 8)
    # only source 1 satisfies the mask constraint
    assert float(jnp.min(batch["raw"])) == 1.0
