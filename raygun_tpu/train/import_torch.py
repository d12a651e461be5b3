"""Import reference (htem/raygun, PyTorch) checkpoints into raygun_tpu.

Migration capability: a user of the reference can bring trained weights
straight into this framework (``raygun-import-torch ckpt config.json``)
and continue training / run inference on TPU. The reference writes
checkpoints via gunpowder's torch Train node as either a raw
``state_dict`` or ``{"model_state_dict": ..., "optimizer_state_dict": ...}``
(reference ``systems/BaseSystem.py:100-123``); this module maps those
torch module trees onto our flax param trees.

Weight-layout conversions (verified numerically against torch in
``tests/train/test_import_torch.py``; both frameworks compute
cross-correlation, so plain convs need no spatial flip):

- ``Conv{1,2,3}d``:           torch ``(O, I, *k)`` -> flax ``(*k, I, O)``
- ``ConvTranspose{1,2,3}d``:  torch ``(I, O, *k)`` -> flax ``(*k, I, O)``
  **plus a spatial flip** (torch's transposed conv correlates with the
  kernel as stored; ours is the gradient-of-conv formulation).

Key-layout maps (reference file:line):

- ResNet (``networks/ResNet.py:120,340``): one ``torch.nn.Sequential``
  named ``model``; param-bearing entries in order are
  ``[stem, down_0..down_{n-1}, <blocks>, up_0..up_{n-1}, head]`` with
  resnet blocks at ``model.{i}.conv_block.{a,b}`` (two convs each; norm
  layers are param-free InstanceNorm). Ours names these
  ``stem / down_i / block_j.conv{1,2} / up_i / head`` (``nn/resnet.py``).
- UNet / ResidualUNet (``networks/UNet.py:354-666``):
  ``l_conv.{L}.conv_pass.{a}`` -> ``l_conv_{L}.ConvNd_{rank}``,
  ``r_conv.{h}.{L}.conv_pass.{a}`` -> ``r_conv_{h}_{L}.ConvNd_{rank}``,
  ``r_up.{h}.{L}.up`` -> ``r_up_{h}_{L}.ConvTransposeNd_0``.
- NLayerDiscriminator (``networks/NLayerDiscriminator.py:58-105``): a
  Sequential ``model``; convs in order -> ``conv_0..conv_{n}, conv_out``
  (``nn/discriminator.py``). The reference builds discriminators with
  param-free InstanceNorm (``systems/BaseSystem.py:192-199``).
- Generator assembly (``systems/BaseSystem.py:210-224``):
  ``Sequential(core, Conv 1x..x1)`` -> our ``{core: ..., head: ...}``
  (``systems/base.py get_network``).
- CycleModel (``models/CycleModel.py``): ``netG1.* / netG2.*`` ->
  our CycleGAN params ``{"G1": ..., "G2": ...}`` (discriminators are not
  part of the reference's saved model, so D1/D2 keep their current
  values — fresh inits on import).
- MTLSDModel / ACLSDModel (``models/MTLSDModel.py:26-34``,
  ``models/ACLSDModel.py:36-50``): submodule names match ours exactly
  (``unet / aff_head / lsd_head``; ``mt_unet / ac_unet / ac_aff_head``).

Because our conv-routing re-expressions (packed level-0, fused upsample,
z-decomposition) keep param trees IDENTICAL across routes (design
invariant), imported trees work unchanged on every execution route.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import numpy as np

__all__ = [
    "load_torch_state_dict",
    "import_network",
    "import_system_params",
    "import_checkpoint",
]


# --------------------------------------------------------------------------
# low-level conversions
# --------------------------------------------------------------------------

def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def conv_kernel_from_torch(w: np.ndarray) -> np.ndarray:
    """torch Conv weight ``(O, I, *k)`` -> flax ``(*k, I, O)``."""
    return np.ascontiguousarray(np.moveaxis(w, (0, 1), (-1, -2)))


def conv_transpose_kernel_from_torch(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose weight ``(I, O, *k)`` -> flax ``(*k, I, O)``
    with every spatial axis reversed."""
    k = np.moveaxis(w, (0, 1), (-2, -1))
    flip = tuple(slice(None, None, -1) for _ in range(k.ndim - 2))
    return np.ascontiguousarray(k[flip + (slice(None), slice(None))])


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a reference checkpoint file into ``{key: np.ndarray}``.

    Accepts both container layouts the reference loads
    (``systems/BaseSystem.py:114-121``): a bare ``state_dict`` or a dict
    with ``model_state_dict``.
    """
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        ckpt = ckpt["model_state_dict"]
    if not isinstance(ckpt, dict):
        raise ValueError(
            f"{path}: expected a state_dict or {{'model_state_dict': ...}}, "
            f"got {type(ckpt).__name__}"
        )
    return {str(k): _np(v) for k, v in ckpt.items()}


def _sub(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _shape_check(name: str, got: np.ndarray, template_leaf) -> np.ndarray:
    want = tuple(template_leaf.shape)
    if tuple(got.shape) != want:
        raise ValueError(
            f"imported '{name}' has shape {tuple(got.shape)} but the target "
            f"network expects {want} — config/network mismatch between the "
            "torch checkpoint and this system's net kwargs"
        )
    return got.astype(np.asarray(template_leaf).dtype
                      if hasattr(template_leaf, "dtype") else np.float32)


# --------------------------------------------------------------------------
# per-network importers (each takes the torch sub-dict + our params template)
# --------------------------------------------------------------------------

def _conv_entries(sd: Dict[str, np.ndarray], pattern: str):
    """Yield ``(index, weight, bias)`` for Sequential conv entries matching
    ``pattern`` (a regex with one int group), sorted by index. 1-D weights
    (norm affine) are rejected loudly — the reference's production configs
    use param-free norms everywhere these maps apply."""
    idx: Dict[int, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        m = re.fullmatch(pattern + r"\.(weight|bias)", k)
        if not m:
            continue
        i = int(m.group(1))
        idx.setdefault(i, {})[m.group(2)] = v
    out = []
    for i in sorted(idx):
        ent = idx[i]
        w = ent.get("weight")
        if w is None:
            raise ValueError(f"entry {i} matching '{pattern}' has no weight")
        if w.ndim == 1:
            raise NotImplementedError(
                f"entry {i} matching '{pattern}' is a 1-D weight (norm "
                "affine); the reference's generator/discriminator configs "
                "use affine-free norms — affine-norm import is not supported"
            )
        out.append((i, w, ent.get("bias")))
    return out


def _leaf(w: np.ndarray, b: Optional[np.ndarray], transpose: bool,
          name: str, template: dict) -> dict:
    conv = (conv_transpose_kernel_from_torch if transpose
            else conv_kernel_from_torch)
    out = {"kernel": _shape_check(f"{name}.kernel", conv(w),
                                  template["kernel"])}
    if "bias" in template:
        if b is None:
            raise ValueError(f"'{name}' expects a bias; checkpoint has none")
        out["bias"] = _shape_check(f"{name}.bias", b, template["bias"])
    return out


def import_resnet(sd: Dict[str, np.ndarray], template: dict) -> dict:
    """Map reference ``ResNet`` (``networks/ResNet.py``) onto our tree."""
    blocks: Dict[int, Any] = {}
    nonblock = {}
    for i, w, b in _conv_entries(sd, r"model\.(\d+)"):
        nonblock[i] = (w, b)
    for k in sd:
        m = re.fullmatch(r"model\.(\d+)\.conv_block\.(\d+)\.(weight|bias)", k)
        if m:
            blocks.setdefault(int(m.group(1)), {}).setdefault(
                int(m.group(2)), {})[m.group(3)] = sd[k]
    known = set()
    for k in sd:
        if re.fullmatch(r"model\.\d+\.(weight|bias)", k) or re.fullmatch(
                r"model\.\d+\.conv_block\.\d+\.(weight|bias)", k):
            known.add(k)
    leftover = sorted(set(sd) - known)
    if leftover:
        raise NotImplementedError(
            f"unrecognized ResNet checkpoint keys {leftover[:6]} — "
            "noise blocks / affine norms are not importable"
        )

    order = sorted(nonblock)
    n_down = (len(order) - 2) // 2
    if len(order) != 2 * n_down + 2:
        raise ValueError(
            f"unexpected ResNet conv count {len(order)} (want 2*n_down+2)"
        )
    out: dict = {}
    out["stem"] = _leaf(*nonblock[order[0]], False, "stem", template["stem"])
    for d in range(n_down):
        name = f"down_{d}"
        out[name] = _leaf(*nonblock[order[1 + d]], False, name,
                          template[name])
    for u in range(n_down):
        name = f"up_{u}"
        out[name] = _leaf(*nonblock[order[1 + n_down + u]], True, name,
                          template[name])
    out["head"] = _leaf(*nonblock[order[-1]], False, "head",
                        template["head"])
    for j, bi in enumerate(sorted(blocks)):
        convs = sorted(blocks[bi])
        if len(convs) != 2:
            raise ValueError(
                f"resnet block {bi}: expected 2 convs, found {len(convs)}"
            )
        name = f"block_{j}"
        out[name] = {
            "conv1": _leaf(blocks[bi][convs[0]]["weight"],
                           blocks[bi][convs[0]].get("bias"), False,
                           f"{name}.conv1", template[name]["conv1"]),
            "conv2": _leaf(blocks[bi][convs[1]]["weight"],
                           blocks[bi][convs[1]].get("bias"), False,
                           f"{name}.conv2", template[name]["conv2"]),
        }
    _check_complete("ResNet", out, template)
    return out


def import_conv_pass(sd: Dict[str, np.ndarray], template: dict,
                     name: str = "conv_pass") -> dict:
    """Reference ``ConvPass`` (``networks/UNet.py:13-118``): Sequential
    ``conv_pass.{i}`` -> our ``ConvNd_{rank}``."""
    entries = _conv_entries(sd, r"conv_pass\.(\d+)")
    out = {}
    for rank, (_, w, b) in enumerate(entries):
        key = f"ConvNd_{rank}"
        if key not in template:
            raise ValueError(
                f"{name}: checkpoint has {len(entries)} convs but the "
                f"target has {sorted(template)}"
            )
        out[key] = _leaf(w, b, False, f"{name}.{key}", template[key])
    _check_complete(name, out, template)
    return out


def import_unet(sd: Dict[str, np.ndarray], template: dict,
                name: str = "UNet") -> dict:
    """Reference ``UNet``/``ResidualUNet`` (``networks/UNet.py:354-666``,
    ``networks/ResidualUNet.py``) -> our ``nn/unet.py`` trees (the module
    names were designed to mirror the reference's)."""
    out: dict = {}
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        m = re.match(r"(l_conv\.\d+|r_conv\.\d+\.\d+|r_up\.\d+\.\d+)\.(.+)", k)
        if not m:
            raise NotImplementedError(
                f"{name}: unrecognized UNet checkpoint key '{k}'"
            )
        groups.setdefault(m.group(1), {})[m.group(2)] = v
    for g, sub in groups.items():
        ours = g.replace(".", "_")
        if ours not in template:
            raise ValueError(
                f"{name}: checkpoint module '{g}' has no counterpart "
                f"'{ours}' in the target net (levels/heads mismatch)"
            )
        if g.startswith("r_up"):
            w = sub.get("up.weight")
            if w is None:
                raise ValueError(f"{name}.{g}: no 'up.weight' "
                                 "(constant_upsample nets store no params)")
            out[ours] = {"ConvTransposeNd_0": _leaf(
                w, sub.get("up.bias"), True, f"{name}.{ours}",
                template[ours]["ConvTransposeNd_0"])}
        else:
            out[ours] = import_conv_pass(sub, template[ours],
                                         name=f"{name}.{ours}")
    _check_complete(name, out, template)
    return out


def import_discriminator(sd: Dict[str, np.ndarray], template: dict,
                         name: str = "NLayerDiscriminator") -> dict:
    """Reference ``NLayerDiscriminator`` -> our ``nn/discriminator.py``
    (convs in Sequential order are ``conv_0..conv_{n}, conv_out``)."""
    entries = _conv_entries(sd, r"model\.(\d+)")
    targets = sorted(
        (k for k in template if k.startswith("conv_") and k != "conv_out"),
        key=lambda s: int(s.split("_")[1]),
    ) + ["conv_out"]
    if len(entries) != len(targets):
        raise ValueError(
            f"{name}: checkpoint has {len(entries)} convs, target has "
            f"{len(targets)} ({targets}) — n_layers mismatch"
        )
    out = {}
    for (_, w, b), tgt in zip(entries, targets):
        out[tgt] = _leaf(w, b, False, f"{name}.{tgt}", template[tgt])
    _check_complete(name, out, template)
    return out


def import_generator(sd: Dict[str, np.ndarray], template: dict,
                     name: str = "generator") -> dict:
    """Reference generator assembly ``Sequential(core, Conv 1x..x1[, act])``
    (``systems/BaseSystem.py:210-224``) -> our ``{core, head}``."""
    core_sd = _sub(sd, "0.")
    head_w, head_b = sd.get("1.weight"), sd.get("1.bias")
    if head_w is None or not core_sd:
        raise ValueError(
            f"{name}: expected Sequential keys '0.*' (core) and '1.weight' "
            f"(1x1 head); got {sorted(sd)[:6]}"
        )
    out = {"head": _leaf(head_w, head_b, False, f"{name}.head",
                         template["head"])}
    if any(".conv_block." in k for k in core_sd):
        out["core"] = import_resnet(core_sd, template["core"])
    elif any(k.startswith("l_conv.") for k in core_sd):
        out["core"] = import_unet(core_sd, template["core"],
                                  name=f"{name}.core")
    else:
        raise NotImplementedError(
            f"{name}: cannot identify core network from keys "
            f"{sorted(core_sd)[:6]}"
        )
    _check_complete(name, out, template)
    return out


def import_network(sd: Dict[str, np.ndarray], template: dict,
                   name: str = "network") -> dict:
    """Dispatch on the torch key layout: generator assembly, bare ResNet,
    bare UNet/ResidualUNet, or discriminator."""
    if "1.weight" in sd and any(k.startswith("0.") for k in sd):
        return import_generator(sd, template, name=name)
    if any(".conv_block." in k for k in sd):
        return import_resnet(sd, template)
    if any(k.startswith("l_conv.") for k in sd):
        return import_unet(sd, template, name=name)
    if any(re.fullmatch(r"model\.\d+\.weight", k) for k in sd):
        return import_discriminator(sd, template, name=name)
    raise NotImplementedError(
        f"{name}: unrecognized torch network layout; keys start "
        f"{sorted(sd)[:6]}"
    )


def _check_complete(name: str, out: dict, template: dict) -> None:
    missing = sorted(set(template) - set(out))
    extra = sorted(set(out) - set(template))
    if missing or extra:
        raise ValueError(
            f"{name}: import incomplete — target modules without weights: "
            f"{missing[:8]}; imported modules without a target: {extra[:8]}"
        )


# --------------------------------------------------------------------------
# system-level import
# --------------------------------------------------------------------------

def import_system_params(sd: Dict[str, np.ndarray], system) -> Any:
    """Map a reference model ``state_dict`` onto ``system``'s params tree.

    - CycleGAN: ``CycleModel`` saves ``netG1/netG2`` only (the reference's
      discriminators live in the loss module and are NOT in the model
      checkpoint) -> G1/G2 imported, D1/D2 keep their current (fresh) values.
    - MTLSD / ACLSD: submodule names match 1:1.
    """
    import jax

    params = jax.device_get(system.state.params)
    kind = type(system).__name__
    if kind == "CycleGAN":
        out = dict(params)
        for tk, ok in (("netG1", "G1"), ("netG2", "G2"),
                       ("netD1", "D1"), ("netD2", "D2")):
            sub = _sub(sd, tk + ".")
            if not sub:
                if tk.startswith("netG"):
                    raise ValueError(
                        f"CycleGAN checkpoint has no '{tk}.*' keys; found "
                        f"prefixes {sorted({k.split('.')[0] for k in sd})}"
                    )
                continue  # discriminators absent from reference checkpoints
            out[ok] = import_network(sub, params[ok], name=tk)
        return out
    # MTLSD / ACLSD: matching top-level names (unet/aff_head/... )
    out = {}
    prefixes = sorted({k.split(".")[0] for k in sd})
    for p in prefixes:
        if p not in params:
            raise ValueError(
                f"{kind}: checkpoint module '{p}' not in the system's params "
                f"(has {sorted(params)})"
            )
        sub = _sub(sd, p + ".")
        if "unet" in p:
            out[p] = import_unet(sub, params[p], name=p)
        else:
            out[p] = import_conv_pass(sub, params[p], name=p)
    _check_complete(kind, out, params)
    return out


def import_checkpoint(torch_path: str, system, step: Optional[int] = None,
                      save: bool = True) -> str:
    """Full import: read a reference checkpoint, map its weights into
    ``system`` (already built), and write a native checkpoint at the same
    iteration number so ``raygun-train`` resumes from it and
    ``raygun-predict`` can render with it.

    Optimizer moments are NOT in the reference model checkpoint; the saved
    state carries a fresh optimizer (same as the reference's own finetune
    behavior, which reloads weights only — ``BaseSystem.py:100-123``).
    """
    import jax

    from .state import save_checkpoint

    sd = load_torch_state_dict(torch_path)
    new_params = import_system_params(sd, system)
    if step is None:
        m = re.search(r"checkpoint[_-](\d+)$", torch_path)
        step = int(m.group(1)) if m else 0
    state = system.state.replace(
        params=new_params,
        step=system.state.step * 0 + step,
    )
    system.state = state
    if not save:
        return ""
    return save_checkpoint(system.checkpoint_basename, step, state)
