"""Experiment systems (parity: reference src/raygun/torch/systems/)."""

from .base import BaseSystem
from .mtlsd import MTLSD, MTLSDModel, weighted_mse, get_optimizer, make_lr_schedule

_REGISTRY = {"MTLSD": MTLSD}


def register_system(name, cls):
    _REGISTRY[name] = cls


def get_system_class(name: str):
    # late imports so optional systems don't slow basic use
    if name not in _REGISTRY:
        if name == "CycleGAN":
            from .cyclegan import CycleGAN
            _REGISTRY["CycleGAN"] = CycleGAN
        elif name == "ACLSD":
            from .aclsd import ACLSD
            _REGISTRY["ACLSD"] = ACLSD
    if name not in _REGISTRY:
        raise ValueError(f"unknown system {name!r}")
    return _REGISTRY[name]


def load_system(config_path: str):
    """Resolve + instantiate the system named in a config (parity:
    reference src/raygun/load_system.py:9-21)."""
    from ..core.config import read_config

    config = read_config(config_path)
    return get_system_class(config["system"])(config_path)
