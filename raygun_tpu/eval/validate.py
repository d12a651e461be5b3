"""Training-time validation loop: predict → segment → skeleton-VOI.

Capability parity with reference
``src/raygun/evaluation/validate_affinities.py``: per-checkpoint meta-config
rewriting with ``$source_dirname``/``$source_dataset`` resolution (``:20-60``),
optional launch_command indirection (``:63-83``), validate_affinities =
predict + segment (``:86-103``), validate_segmentation = segment → rasterize
skeleton → crop/pad-align → rand_voi → append ``{iter: metrics}`` JSON
(``:106-149``), and the nvi_split+nvi_merge score with NaN→999 (``:207-216``).
"""

from __future__ import annotations

import json
import logging
import os
import sys
from glob import glob
from subprocess import call
from typing import Optional

import numpy as np

from ..core.config import read_config, to_json
from ..native import rand_voi
from ..seg.segment import segment
from .skeleton import rasterize_skeleton

logger = logging.getLogger(__name__)


def find_source_path(path_template: str, try_path: str, n_search: int = 3) -> str:
    """Resolve ``$source_dirname`` templates against the training source dir,
    walking up parents (parity: reference ``validate_affinities.py:20-31``)."""
    try_path = try_path.rstrip("/")
    n = -1
    while len(glob(path_template.replace("$source_dirname", try_path + "/*" * n))) == 0:
        if n - 1 > n_search:
            raise ValueError(
                f"Source not found at "
                f"{path_template.replace('$source_dirname/', try_path + '/*' * n)}"
            )
        try_path = os.path.dirname(try_path)
        n += 1
    return glob(path_template.replace("$source_dirname", try_path + "/*" * n))[0]


def update_validation_configs(config, iter: Optional[int] = None) -> dict:
    if isinstance(config, str):
        config = read_config(config)
    if iter is not None:
        config["checkpoint"] = iter
        config["predict_config"]["checkpoint"] = iter

    train_config = read_config(config["predict_config"]["config_path"])
    sources = train_config["sources"]
    raw_src = sources[int(np.argmax(["raw" in src.keys() for src in sources]))]

    if "$source_dirname" in config["predict_config"]["source_path"]:
        config["predict_config"]["source_path"] = find_source_path(
            config["predict_config"]["source_path"], raw_src["path"]
        )
    config["predict_config"]["source_dataset"] = config["predict_config"][
        "source_dataset"
    ].replace("$source_dataset", raw_src["raw"])

    to_json(config, config["validation_config_path"])
    to_json(config["predict_config"], config["prediction_config_path"])
    return config


def launch(launch_command: str):
    try:
        retcode = call(launch_command, shell=True)
        if retcode < 0:
            logger.warning(f"Child was terminated by signal {-retcode}")
        else:
            logger.info(f"Child returned {retcode}")
    except OSError as e:
        logger.warning(f"Execution failed: {e}")


def run_validation(config=None, iter=None):
    if config is None:
        config = sys.argv[1]
        iter = int(sys.argv[2]) if len(sys.argv) > 2 else None
    config = update_validation_configs(config, iter)
    if config.get("launch_command"):
        launch(f"{config['launch_command']}")
    else:
        validate_affinities(config["validation_config_path"])


def validate_affinities(config=None):
    if config is None:
        config = sys.argv[1]
    if isinstance(config, str):
        config = read_config(config)
    logger.info("Predicting validation volume affinities...")
    from ..cli.predict import predict

    predict(config["prediction_config_path"])
    if config.get("segment_config", {}).get("launch_command"):
        launch(config["segment_config"]["launch_command"])
    else:
        validate_segmentation(config)


def validate_segmentation(config=None):
    if config is None:
        config = sys.argv[1]
    if isinstance(config, str):
        config_path = config
        config = read_config(config)
    crop = config.get("crop")

    seg = segment(config["segment_config"])
    if isinstance(seg, list):
        seg = seg[0]
    image = rasterize_skeleton(config["skeleton_config"])
    logger.info("Evaluating...")
    evaluation = pad_eval(seg, image, crop=crop)
    logger.info("Done... saving...")

    current_iteration = config["checkpoint"]
    metric_path = config["metric_path"]
    if not os.path.isfile(metric_path):
        metrics = {current_iteration: evaluation}
    else:
        with open(metric_path) as f:
            metrics = json.load(f)
        metrics[current_iteration] = evaluation
    to_json(metrics, metric_path)
    return evaluation


def pad_eval(segment_array: np.ndarray, image: np.ndarray, crop=None) -> dict:
    """Crop/pad-align seg to the skeleton image, then rand_voi (parity:
    reference ``validate_affinities.py:137-149``)."""
    if crop is not None:
        segment_array = segment_array[
            crop[0]: -crop[0], crop[1]: -crop[1], crop[2]: -crop[2]
        ]
    pad = (np.array(image.shape) - np.array(segment_array.shape)) // 2
    if pad.sum() >= 3:
        image = image[pad[0]: -pad[0], pad[1]: -pad[1], pad[2]: -pad[2]]
    # final shape alignment (odd differences)
    sl = tuple(slice(0, min(a, b)) for a, b in zip(image.shape, segment_array.shape))
    return rand_voi(image[sl].astype(np.uint64), segment_array[sl].astype(np.uint64))


def get_score(metrics: dict, keys=("nvi_split", "nvi_merge")) -> float:
    """Composite validation score, NaN→999 (parity: reference
    ``validate_affinities.py:207-216``)."""
    score = 0.0
    for key in keys:
        if not np.isnan(metrics[key]):
            score += metrics[key]
        else:
            return 999
    return score
