"""Export raygun_tpu checkpoints as reference (htem/raygun, PyTorch)
state_dicts — the reverse of ``train/import_torch.py``, completing
bidirectional migration: weights trained here load into the reference's
torch networks with ``load_state_dict(..., strict=True)``.

Weight conversions invert the import (verified round-trip + forward-parity
against the reference torch nets in ``tests/train/test_import_torch.py``):

- ``ConvNd`` kernel ``(*k, I, O)``       -> torch ``(O, I, *k)``
- ``ConvTransposeNd`` ``(*k, I, O)``     -> spatial-flip, then ``(I, O, *k)``

Unlike the import (which PARSES whatever Sequential indices a checkpoint
has), export must SYNTHESIZE the reference's ``torch.nn.Sequential``
indices. Those are deterministic given the net kwargs, replicating the
reference constructors:

- ResNet (``networks/ResNet.py:231-340``): ``model`` = [pad?] stem norm act
  | (down norm act) x n_downsampling | blocks (1 idx each, convs at
  ``conv_block.{1,5}`` for reflect/replicate, ``{0,3}`` for zeros/valid) |
  (up norm act) x n_downsampling | [pad?] head. ``pad?`` present for
  reflect/replicate/same padding.
- NLayerDiscriminator (``NLayerDiscriminator.py:135-177``): conv lrelu |
  (conv norm lrelu) x (n_layers-1) | conv norm lrelu | conv.
- UNet ConvPass (``UNet.py:41-118``): per conv [pad?] conv [norm] act —
  name-addressed (``l_conv.{L}.conv_pass.{i}``), indices synthesized the
  same way.
- Generator assembly (``systems/BaseSystem.py:210-224``):
  ``Sequential(core, 1x1 conv[, act])`` -> prefixes ``0.`` / ``1.``.

Norm layers occupy an index but carry no params (the reference builds
InstanceNorm with ``affine=False``), so only the index arithmetic — not
any norm weights — depends on them.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import numpy as np

__all__ = ["export_network", "export_system_state_dict", "export_checkpoint"]


def conv_kernel_to_torch(k: np.ndarray) -> np.ndarray:
    """flax ``(*k, I, O)`` -> torch Conv weight ``(O, I, *k)``."""
    return np.ascontiguousarray(np.moveaxis(k, (-1, -2), (0, 1)))


def conv_transpose_kernel_to_torch(k: np.ndarray) -> np.ndarray:
    """flax ``(*k, I, O)`` -> torch ConvTranspose weight ``(I, O, *k)``."""
    flip = tuple(slice(None, None, -1) for _ in range(k.ndim - 2))
    k = k[flip + (slice(None), slice(None))]
    return np.ascontiguousarray(np.moveaxis(k, (-2, -1), (0, 1)))


def _np(v) -> np.ndarray:
    return np.asarray(v)


def _emit(out: Dict[str, np.ndarray], key: str, leaf: dict,
          transpose: bool = False) -> None:
    conv = conv_transpose_kernel_to_torch if transpose else conv_kernel_to_torch
    out[f"{key}.weight"] = conv(_np(leaf["kernel"]))
    if "bias" in leaf:
        out[f"{key}.bias"] = _np(leaf["bias"])


# --------------------------------------------------------------------------
# per-network exporters
# --------------------------------------------------------------------------

def _has_pad_module(padding_type: str) -> bool:
    return padding_type.lower() in ("reflect", "same", "replicate")


def export_resnet(params: dict, *, padding_type: str = "reflect",
                  norm: bool = True, activation: bool = True) -> Dict[str, np.ndarray]:
    """Our ResNet tree (``nn/resnet.py``: stem/down_i/block_j/up_i/head) ->
    reference ``model.{i}`` Sequential keys."""
    pad = 1 if _has_pad_module(padding_type) else 0
    per_stage = 1 + (1 if norm else 0) + (1 if activation else 0)
    n_down = len([k for k in params if k.startswith("down_")])
    n_blocks = len([k for k in params if k.startswith("block_")])
    out: Dict[str, np.ndarray] = {}
    i = pad
    _emit(out, f"model.{i}", params["stem"])
    i += per_stage
    for d in range(n_down):
        _emit(out, f"model.{i}", params[f"down_{d}"])
        i += per_stage
    # resnet block internal ConvPass indices (ResNet.py:172-207): each conv
    # is [pad?] conv norm act (+ dropout slot unused here)
    cb = (1, 5) if pad else (0, 3)
    for b in range(n_blocks):
        blk = params[f"block_{b}"]
        _emit(out, f"model.{i}.conv_block.{cb[0]}", blk["conv1"])
        _emit(out, f"model.{i}.conv_block.{cb[1]}", blk["conv2"])
        i += 1
    for u in range(n_down):
        _emit(out, f"model.{i}", params[f"up_{u}"], transpose=True)
        i += per_stage
    i += pad
    _emit(out, f"model.{i}", params["head"])
    return out


def export_conv_pass(params: dict, *, padding_type: str = "valid",
                     norm: bool = False) -> Dict[str, np.ndarray]:
    """Our ConvPass (``ConvNd_{r}`` children) -> reference
    ``conv_pass.{i}`` Sequential keys (UNet.py:41-118: per conv
    [pad?] conv [norm] act)."""
    pad = 1 if _has_pad_module(padding_type) else 0
    stride = pad + 1 + (1 if norm else 0) + 1  # [pad] conv [norm] act
    out: Dict[str, np.ndarray] = {}
    ranks = sorted(
        (int(k.split("_")[1]) for k in params if k.startswith("ConvNd_")))
    for r in ranks:
        _emit(out, f"conv_pass.{pad + r * stride}", params[f"ConvNd_{r}"])
    return out


def export_unet(params: dict, *, padding_type: str = "valid",
                norm: bool = False) -> Dict[str, np.ndarray]:
    """Our UNet tree -> reference ``l_conv.{L}`` / ``r_conv.{h}.{L}`` /
    ``r_up.{h}.{L}.up`` keys."""
    out: Dict[str, np.ndarray] = {}
    for name, sub in params.items():
        m = re.fullmatch(r"l_conv_(\d+)", name)
        if m:
            for k, v in export_conv_pass(
                    sub, padding_type=padding_type, norm=norm).items():
                out[f"l_conv.{m.group(1)}.{k}"] = v
            continue
        m = re.fullmatch(r"r_conv_(\d+)_(\d+)", name)
        if m:
            for k, v in export_conv_pass(
                    sub, padding_type=padding_type, norm=norm).items():
                out[f"r_conv.{m.group(1)}.{m.group(2)}.{k}"] = v
            continue
        m = re.fullmatch(r"r_up_(\d+)_(\d+)", name)
        if m:
            _emit(out, f"r_up.{m.group(1)}.{m.group(2)}.up",
                  sub["ConvTransposeNd_0"], transpose=True)
            continue
        raise NotImplementedError(f"unexpected UNet param module '{name}'")
    return out


def export_discriminator(params: dict) -> Dict[str, np.ndarray]:
    """Our NLayerDiscriminator tree -> reference ``model.{i}`` keys
    (NLayerDiscriminator.py:135-177: conv lrelu | (conv norm lrelu)* |
    final conv)."""
    convs = sorted(
        (k for k in params if k.startswith("conv_") and k != "conv_out"),
        key=lambda s: int(s.split("_")[1]),
    )
    out: Dict[str, np.ndarray] = {}
    _emit(out, "model.0", params[convs[0]])
    i = 2  # stem conv + lrelu
    for name in convs[1:]:
        _emit(out, f"model.{i}", params[name])
        i += 3  # conv norm lrelu
    _emit(out, f"model.{i}", params["conv_out"])
    return out


def export_generator(params: dict, *, gnet_type: str = "resnet",
                     **net_kwargs) -> Dict[str, np.ndarray]:
    """Our ``{core, head}`` generator -> reference
    ``Sequential(core, 1x1)`` keys (``0.*`` / ``1.*``)."""
    padding_type = net_kwargs.get(
        "padding_type", "reflect" if gnet_type == "resnet" else "valid")
    if gnet_type == "resnet":
        core = export_resnet(
            params["core"], padding_type=padding_type,
            norm=net_kwargs.get("norm", "instance") is not None,
        )
    elif gnet_type in ("unet", "residualunet"):
        core = export_unet(params["core"], padding_type=padding_type,
                           norm=net_kwargs.get("norm") is not None)
    else:
        raise NotImplementedError(f"gnet_type '{gnet_type}'")
    out = {f"0.{k}": v for k, v in core.items()}
    _emit(out, "1", params["head"])
    return out


def export_network(params: dict, **kwargs) -> Dict[str, np.ndarray]:
    """Dispatch on our param-tree shape (mirrors
    ``import_torch.import_network``)."""
    if set(params) >= {"core", "head"}:
        return export_generator(params, **kwargs)
    if "stem" in params:
        return export_resnet(params, **kwargs)
    if any(k.startswith("l_conv_") for k in params):
        return export_unet(params, **kwargs)
    if "conv_out" in params:
        return export_discriminator(params)
    raise NotImplementedError(
        f"unrecognized param tree; top-level keys {sorted(params)[:6]}"
    )


# --------------------------------------------------------------------------
# system-level export
# --------------------------------------------------------------------------

def export_system_state_dict(system) -> Dict[str, np.ndarray]:
    """Map ``system``'s params onto the reference model's state_dict keys
    (CycleModel: netG1/netG2; MTLSDModel/ACLSDModel: named submodules)."""
    import jax

    params = jax.device_get(system.state.params)
    kind = type(system).__name__
    out: Dict[str, np.ndarray] = {}
    if kind == "CycleGAN":
        gk = dict(system.gnet_kwargs or {})
        gk.pop("input_nc", None)
        for ours, theirs in (("G1", "netG1"), ("G2", "netG2")):
            sd = export_generator(params[ours],
                                  gnet_type=system.gnet_type, **gk)
            out.update({f"{theirs}.{k}": v for k, v in sd.items()})
        return out
    # MTLSD / ACLSD: top-level names match the reference's
    mk = system.model_kwargs or {}
    for name, sub in params.items():
        if "unet" in name:
            uk = mk.get(f"{name}_kwargs", mk.get("unet_kwargs", {}))
            sd = export_unet(
                sub,
                padding_type=uk.get("padding_type", "valid"),
                norm=uk.get("norm") is not None,
            )
        else:  # heads are single-conv ConvPasses (valid, no norm)
            sd = export_conv_pass(sub)
        out.update({f"{name}.{k}": v for k, v in sd.items()})
    return out


def export_checkpoint(system, out_path: str) -> str:
    """Write ``{"model_state_dict": ...}`` exactly as the reference's
    loader expects (``systems/BaseSystem.py:114-121``)."""
    import torch

    sd = export_system_state_dict(system)
    torch.save(
        {"model_state_dict": {
            k: torch.from_numpy(np.ascontiguousarray(v).copy())
            for k, v in sd.items()}},
        out_path,
    )
    return out_path
