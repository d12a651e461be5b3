"""Misc utilities (parity with reference ``src/raygun/utils.py``)."""

from __future__ import annotations

import inspect
import json
import os
from typing import Optional, Sequence

import numpy as np

from .config import strip_json_comments
from .roi import Coordinate, Roi


def passing_locals(local_dict: dict) -> dict:
    """Constructor idiom: forward locals() as kwargs (reference
    ``utils.py:10-18``)."""
    kwargs = {}
    for k, v in local_dict.items():
        if k[0] != "_" and k != "self":
            if k == "kwargs":
                kwargs.update(v)
            else:
                kwargs[k] = v
    return kwargs


def get_config_name(config_path: str, base_folder: str) -> str:
    """Run name from a config's folder path (reference ``utils.py:21-26``)."""
    config_name = os.path.dirname(config_path)
    config_name = config_name.replace(base_folder, "")
    return "_".join(config_name.split(os.sep))[1:]


def calc_max_padding(
    output_size,
    voxel_size,
    neighborhood: Optional[Sequence] = None,
    sigma: Optional[float] = None,
    mode: str = "shrink",
) -> Coordinate:
    """Max world-unit padding needed for affinity/LSD context under rotation
    (reference ``utils.py:29-55``): half the in-plane diagonal of the output
    plus the method context (longest affinity offset or 3σ), snapped to the
    voxel grid."""
    voxel_size = Coordinate(voxel_size)
    output_size = Coordinate(output_size)
    method_padding = Coordinate((0,) * len(voxel_size))
    if neighborhood is not None:
        nb = np.asarray(neighborhood)
        if len(nb) > 3:
            nb = nb[9:12]
        max_affinity = Coordinate(
            [np.abs(aff) for val in nb for aff in val if aff != 0]
        )
        method_padding = voxel_size * max_affinity
    if sigma:
        method_padding = Coordinate((int(sigma * 3),) * len(voxel_size))
    diag = np.sqrt(output_size[1] ** 2 + output_size[2] ** 2)
    begin = Coordinate(
        [i / 2 for i in (output_size[0], diag, diag)]
    ) + method_padding
    roi = Roi(begin, (0,) * len(voxel_size)).snap_to_grid(voxel_size, mode=mode)
    return roi.begin


def serialize(obj):
    """Round-trip config values back into '#...#' strings (reference
    ``utils.py:58-74``)."""
    if isinstance(obj, dict):
        return {k: serialize(v) for k, v in obj.items()}
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if inspect.isclass(obj):
        return f"#{'.'.join([obj.__module__, obj.__name__])}#"
    try:
        json.dumps(obj)
        return obj
    except (TypeError, ValueError):
        return f"#{repr(obj)}#"


def to_json(obj, file: str, indent: int = 3) -> None:
    with open(file, "w") as f:
        json.dump(serialize(obj), f, indent=indent)


def load_json_file(fin: str) -> dict:
    with open(fin) as f:
        return json.loads(strip_json_comments(f.read()))
