"""raygun_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the raygun
capabilities: config-driven large-scale deep learning for N-D biological
imaging volumes (CycleGAN enhancement, MTLSD/ACLSD segmentation, blockwise
whole-volume inference, watershed/MWS segmentation, VOI validation).

Top-level re-exports mirror the reference's ``import raygun`` surface
(reference ``src/raygun/__init__.py:1-19``).
"""

__version__ = "0.1.0"

from .core import (  # noqa: F401
    Coordinate, Roi, block_grid, read_config, eval_args, merge_dicts,
    passing_locals, serialize, to_json, load_json_file, calc_max_padding,
    get_config_name,
)
from .systems import load_system  # noqa: F401


def train(config_path):
    from .cli.train import train as _train

    return _train(config_path)


def predict(render_config_path):
    from .cli.predict import predict as _predict

    return _predict(render_config_path)


def segment(config_path):
    from .seg.segment import segment as _segment

    return _segment(config_path)
