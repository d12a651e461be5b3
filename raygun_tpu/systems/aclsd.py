"""ACLSD system: auto-context affinity training.

Capability parity with reference ``src/raygun/torch/systems/ACLSD.py`` +
``models/ACLSDModel.py`` — with the reference's latent defects FIXED
(SURVEY §2.4: the reference imports ``ACLSDDataPipe`` /
``WeightedMSELoss_ACLSD`` / a default config that do not exist; here the
system actually runs): an MTLSD U-Net predicts affinities + LSDs, a second
U-Net consumes the predicted LSDs and emits auto-context affinities; all
three outputs are trained with class-balanced weighted MSE.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ..nn import ConvPass, UNet
from ..nn.layers import center_crop
from ..train.state import TrainState
from .mtlsd import MTLSD, weighted_mse


class ACLSDModel(nn.Module):
    """Parity: reference ``ACLSDModel.py:36-82``."""

    mt_unet_kwargs: Dict[str, Any]
    ac_unet_kwargs: Dict[str, Any]
    num_affs: int = 3
    num_lsds: int = 10

    @nn.compact
    def __call__(self, raw, train: bool = True):
        ndims = len(self.mt_unet_kwargs["downsample_factors"][0])
        a = UNet(**self.mt_unet_kwargs, name="mt_unet")(raw, train=train)
        affs = ConvPass(
            output_nc=self.num_affs, kernel_sizes=[(1,) * ndims],
            activation="sigmoid", name="aff_head",
        )(a, train=train)
        lsds = ConvPass(
            output_nc=self.num_lsds, kernel_sizes=[(1,) * ndims],
            activation="sigmoid", name="lsd_head",
        )(a, train=train)
        b = UNet(**self.ac_unet_kwargs, name="ac_unet")(lsds, train=train)
        affs_ac = ConvPass(
            output_nc=self.num_affs, kernel_sizes=[(1,) * ndims],
            activation="sigmoid", name="ac_aff_head",
        )(b, train=train)
        return affs, lsds, affs_ac


class ACLSD(MTLSD):
    """Reuses the MTLSD pipeline; adds the auto-context head + loss term."""

    def __init__(self, config=None):
        super(MTLSD, self).__init__(
            config=config, default_config="default_ACLSD_conf.json"
        )
        self._mtlsd_shared_init()

    def _mtlsd_shared_init(self):
        import numpy as np

        from ..core.roi import Coordinate
        from ..io import mtlsd_neighborhood

        if self.ndims is None:
            self.ndims = int(np.sum(np.array(self.voxel_size) == np.min(self.voxel_size)))
        self.neighborhood = mtlsd_neighborhood(self.neighborhood, self.n_diagonals or 0)
        self.voxel_size = Coordinate(self.voxel_size)
        self.input_shape = tuple(self.input_shape)
        self.output_shape = tuple(self.output_shape)
        self.input_size = Coordinate(self.input_shape) * self.voxel_size
        self.output_size = Coordinate(self.output_shape) * self.voxel_size
        self.dtype = jnp.dtype(self.dtype or "float32")

    def setup_model(self):
        mk = dict(self.model_kwargs)
        self.model = ACLSDModel(**mk)
        in_shape = (1,) + self.input_shape + (
            mk["mt_unet_kwargs"].get("input_nc", 1),
        )
        variables = self.init_network_params(self.model, in_shape, init_type="kaiming")
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats")
        out = jax.eval_shape(
            lambda p, x: self.model.apply({"params": p}, x, train=False),
            self.params, jnp.zeros(in_shape, self.dtype),
        )
        # the auto-context output is the (smaller) final output
        self.ac_output_shape = tuple(out[2].shape[1:-1])
        model_out = tuple(out[0].shape[1:-1])
        assert model_out == self.output_shape, (
            f"config output_shape {self.output_shape} != model output {model_out}"
        )

    def make_train_step(self):
        model, tx = self.model, self.tx
        ac_shape = self.ac_output_shape

        if self.grad_slabs:
            raise ValueError(
                "grad_slabs (slab-wise backward) is not supported for ACLSD "
                "(two chained U-Nets); use mesh {'space': N} to bound "
                "activation memory instead"
            )
        # spatial mesh axis: anchor model outputs so XLA SPMD keeps the
        # whole fwd+bwd spatially sharded (see MTLSD.make_train_step)
        sp_sharding = None
        if self.mesh_space_size() > 1:
            from jax.sharding import NamedSharding

            sp_sharding = NamedSharding(self.get_mesh(), self.batch_pspec())

        @partial(jax.jit, donate_argnums=0)
        def train_step(state: TrainState, key):
            batch = self.make_batch(key)

            def loss_fn(params):
                affs, lsds, affs_ac = model.apply(
                    {"params": params}, batch["raw"], train=True
                )
                if sp_sharding is not None:
                    affs = jax.lax.with_sharding_constraint(affs, sp_sharding)
                    lsds = jax.lax.with_sharding_constraint(lsds, sp_sharding)
                    affs_ac = jax.lax.with_sharding_constraint(
                        affs_ac, sp_sharding)
                aff_loss = weighted_mse(affs, batch["gt_affs"], batch["affs_weights"])
                lsd_loss = weighted_mse(lsds, batch["gt_lsds"], batch["lsds_weights"])
                gt_ac = center_crop(batch["gt_affs"], ac_shape)
                w_ac = center_crop(batch["affs_weights"], ac_shape)
                ac_loss = weighted_mse(affs_ac, gt_ac, w_ac)
                metrics = {
                    "Affinities": aff_loss, "LSDs": lsd_loss,
                    "AC_Affinities": ac_loss,
                }
                return aff_loss + lsd_loss + ac_loss, metrics

            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                state.replace(step=state.step + 1, params=params, opt_state=opt_state),
                {"loss": loss, **metrics},
            )

        return train_step

    def make_snapshot_fn(self):
        model = self.model

        @jax.jit
        def snapshot_fn(state, key):
            batch = self.make_batch(key)
            affs, lsds, affs_ac = model.apply(
                {"params": state.params}, batch["raw"], train=False
            )
            out = dict(batch)
            out.update(pred_affs=affs, pred_lsds=lsds, pred_affs_ac=affs_ac)
            return out

        return snapshot_fn

    def predict_setup(self, checkpoint=None, net_name=None):
        import os

        from ..train.state import latest_checkpoint, load_params_only

        self._abstract_init = True  # template-only init (no init compile)
        try:
            self.setup_model()
        finally:
            self._abstract_init = False
        if checkpoint is not None and not os.path.exists(str(checkpoint)):
            checkpoint = f"{self.checkpoint_basename}_checkpoint_{checkpoint}"
        if checkpoint is None:
            checkpoint, _ = latest_checkpoint(self.checkpoint_basename)
        params = load_params_only(str(checkpoint), self.params)
        self.resolved_checkpoint = str(checkpoint)
        import re as _re
        m = _re.search(r"_checkpoint_(\d+)$", str(checkpoint))
        self.resolved_iteration = int(m.group(1)) if m else None
        model = self.model

        ac_shape = self.ac_output_shape

        # params as jit ARGUMENTS (closure capture would bake them into the
        # HLO as constants — see MTLSD.predict_setup note)
        params = jax.device_put(params)

        def raw_fwd(params, x):
            affs, lsds, affs_ac = model.apply({"params": params}, x, train=False)
            # crop all outputs to the auto-context shape so one write ROI
            # covers every dataset (blockwise runner uses a single grid)
            return {
                "affs": center_crop(affs, ac_shape),
                "lsds": center_crop(lsds, ac_shape),
                "affs_ac": affs_ac,
            }

        _fwd = jax.jit(raw_fwd)

        def fwd(x):
            return _fwd(params, x)

        fwd.raw = raw_fwd
        fwd.variables = params

        num_affs = int(self.model_kwargs.get("num_affs", 3))
        return fwd, [
            ("affs", num_affs),
            ("lsds", int(self.model_kwargs.get("num_lsds", 10))),
            ("affs_ac", num_affs),
        ]
