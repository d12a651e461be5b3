"""grad_slabs: slab-wise backward equals the monolithic gradient exactly.

VERDICT r2 #4: training crops beyond the monolithic-backward HBM/compiler
ceiling. Each z-slab carries its full valid-conv input context, so every
output row is computed once (overlap rows masked in the weights); the
weighted-MSE normalizers are data, so summed slab grads equal the
monolithic gradient. Reference has no equivalent (its crops are fixed at
196^3; ``default_MTLSD_conf.json:132-146``).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raygun_tpu.io import make_segmentation_dataset
from raygun_tpu.systems import load_system


def _system(tmp_path, **extra):
    src = make_segmentation_dataset(
        str(tmp_path / "train.zarr"), shape=(48, 64, 64), num_cells=12
    )
    config = {
        "system": "MTLSD",
        "sources": [src],
        "ndims": 3,
        "batch_size": 2,
        "input_shape": [36, 36, 36],
        "output_shape": [20, 20, 20],
        "voxel_size": [30, 30, 30],
        "neighborhood": [[1, 0, 0], [0, 1, 0], [0, 0, 1]],
        "n_diagonals": 0,
        "model_kwargs": {
            "unet_kwargs": {
                "input_nc": 1, "ngf": 3, "fmap_inc_factor": 2,
                "downsample_factors": [[2, 2, 2]],
                "constant_upsample": True,
            },
            "num_affs": 3,
        },
        "elastic_aug1_kwargs": None,
        "elastic_aug2_kwargs": None,
        "intensity_aug_kwargs": None,
        "lsd_kwargs": {"sigma": 120, "downsample": 1},
        "max_labels": 16,
        "optim_type": "adam",
        "optim_kwargs": {"learning_rate": 0.0005},
        "model_path": str(tmp_path / "models") + "/",
        "train_kwargs": {"log_dir": str(tmp_path / "tb"), "num_epochs": 2},
        "random_seed": 7,
    }
    config.update(extra)
    p = tmp_path / "train_conf.json"
    p.write_text(json.dumps(config))
    system = load_system(str(p))
    system.build_system()
    return system


def test_slab_update_matches_monolithic(tmp_path):
    system = _system(tmp_path)
    batch = jax.jit(system.make_batch)(jax.random.PRNGKey(3))
    state = system.state

    mono = jax.jit(system._make_apply_update())
    s_mono, m_mono = mono(state, batch)

    system.grad_slabs = 3
    starts, thr, s, ctx = system._slab_grad_plan()
    # 20 rows, stride 2: ceil(20/3)=7 -> slab 8; last slab shifted back
    assert (starts, thr, s) == ([0, 8, 12], [0, 0, 4], 8)

    slab = jax.jit(system._make_apply_update())
    s_slab, m_slab = slab(state, batch)

    np.testing.assert_allclose(
        float(m_mono["loss"]), float(m_slab["loss"]), rtol=5e-5)
    for a, b in zip(jax.tree.leaves(s_mono.params),
                    jax.tree.leaves(s_slab.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)


def test_slab_plan_uneven_and_guards(tmp_path):
    system = _system(tmp_path)
    system.grad_slabs = 20  # more slabs than stride allows -> stride-sized
    starts, thr, s, ctx = system._slab_grad_plan()
    assert s == 2 and starts[0] == 0 and starts[-1] == 18
    assert all(t == 0 for t in thr)
    assert ctx == 16

    # norm'd U-Net must be rejected (slab stats would differ)
    sys2 = _system(tmp_path / "n", model_kwargs={
        "unet_kwargs": {
            "input_nc": 1, "ngf": 3, "fmap_inc_factor": 2,
            "downsample_factors": [[2, 2, 2]],
            "constant_upsample": True, "norm": "instance",
        },
        "num_affs": 3,
    })
    sys2.grad_slabs = 2
    with pytest.raises(ValueError, match="norm-free"):
        sys2._make_apply_update()


def test_slab_trains_through_trainer(tmp_path):
    system = _system(tmp_path, grad_slabs=2)
    step = system.make_train_step()
    state, metrics = step(system.state, jax.random.PRNGKey(0))
    assert jnp.isfinite(metrics["loss"])
    state, metrics = step(state, jax.random.PRNGKey(1))
    assert jnp.isfinite(metrics["loss"])
