"""Train state + checkpoint lifecycle.

Capability parity with the reference's checkpointing contract (SURVEY §5.4;
reference ``train/BaseTrain.py:72-74``, ``systems/BaseSystem.py:100-143``):
checkpoints are written every ``save_every`` steps to
``{checkpoint_basename}_checkpoint_{iter}`` and the latest is rediscovered by
natural-sort glob on resume. Improvement over the reference (which saves
model weights only): the FULL train state — params, optimizer moments, step,
norm statistics, PRNG key — is checkpointed, so resume is exact.

Format: a single msgpack file via flax.serialization (fast, portable,
no directory-layout dependency), matching the reference's single-file naming
so downstream tooling (predict worker, checkpoint pickers) can glob the same
patterns (reference ``worker.py:50-54``, ``inspect_logs.py:276-277``).
"""

from __future__ import annotations

import os
import re
from glob import glob
from typing import Any, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
from flax import serialization
from flax import struct


class TrainState(struct.PyTreeNode):
    """Generic train state; systems may subclass for extra fields."""

    step: jax.Array
    params: Any
    opt_state: Any
    extra: Dict[str, Any] = struct.field(default_factory=dict)
    rng: Optional[jax.Array] = None


def natural_keys(text: str):
    return [int(c) if c.isdigit() else c for c in re.split(r"(\d+)", text)]


def latest_checkpoint(basename: str) -> Tuple[Optional[str], int]:
    """Find newest ``{basename}_checkpoint_*`` (parity with reference
    ``BaseSystem.py:125-143``)."""
    # filter to exact `_checkpoint_<digits>` names so leftover `.tmp` files
    # from a crash mid-save (or unrelated suffixes) can never be resumed from
    checkpoints = [
        c for c in glob(basename + "_checkpoint_*")
        if re.search(r"_checkpoint_\d+$", c)
    ]
    checkpoints.sort(key=natural_keys)
    if checkpoints:
        checkpoint = checkpoints[-1]
        return checkpoint, int(checkpoint.split("_")[-1])
    return None, 0


def save_checkpoint(basename: str, step: int, state: Any) -> str:
    path = f"{basename}_checkpoint_{step}"
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    data = serialization.to_bytes(jax.device_get(state))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic: no truncated checkpoints on crash
    return path


def _migrate_conv_param_paths(node: Any) -> Any:
    """Flatten the pre-uniform-layout conv param nesting: early checkpoints
    stored ``ConvNd_i/Conv_0/{kernel,bias}`` (flax nn.Conv submodule) and
    ``ConvTransposeNd_i/ConvTranspose_0/...``; the uniform layout puts
    kernel/bias directly under ``ConvNd_i``/``ConvTransposeNd_i``."""
    if not isinstance(node, dict):
        return node
    out = {}
    for k, v in node.items():
        v = _migrate_conv_param_paths(v)
        if (
            isinstance(v, dict)
            and len(v) == 1
            and next(iter(v)) in ("Conv_0", "ConvTranspose_0")
            and (k.startswith("ConvNd") or k.startswith("ConvTransposeNd"))
        ):
            v = next(iter(v.values()))
        out[k] = v
    return out


def load_checkpoint(path: str, template: Any) -> Any:
    """Restore into a pytree of the same structure as ``template``."""
    with open(path, "rb") as f:
        data = f.read()
    try:
        return serialization.from_bytes(template, data)
    except (ValueError, KeyError):
        state_dict = _migrate_conv_param_paths(
            serialization.msgpack_restore(data)
        )
        return serialization.from_state_dict(template, state_dict)


def load_collection(path: str, name: str, template: Any) -> Optional[Any]:
    """Load an ``extra[name]`` collection (e.g. batch_stats) from a full-state
    checkpoint; None if the checkpoint has no such collection."""
    with open(path, "rb") as f:
        data = f.read()
    state_dict = serialization.msgpack_restore(data)
    node = state_dict.get("extra", {}).get(name)
    if node is None or node == {}:
        return None
    return serialization.from_state_dict(template, node)


def load_params_only(path: str, params_template: Any) -> Any:
    """Load just the params sub-tree from a full-state checkpoint (the
    predict worker's need — reference ``worker.py:48-66``)."""
    with open(path, "rb") as f:
        data = f.read()
    state_dict = serialization.msgpack_restore(data)
    node = state_dict.get("params", state_dict)
    try:
        return serialization.from_state_dict(params_template, node)
    except (ValueError, KeyError):
        return serialization.from_state_dict(
            params_template, _migrate_conv_param_paths(node)
        )
