"""Render the best checkpoints picked by log inspection.

The reference ships this as an EMPTY file star-imported by
``evaluation/__init__.py`` (reference ``render_best.py``, SURVEY §2.4) — a
real implementation here: read ``model_logs_bests.json``, then run blockwise
prediction for each best (model, step) with the run's render config.
"""

from __future__ import annotations

import json
import logging
import os
import sys
from typing import Optional

from ..core.config import read_config, to_json

logger = logging.getLogger(__name__)


def render_best(config=None):
    """config: {bests_path | base_folder, render_config, out_dir?}.

    For each model in model_logs_bests.json, sets checkpoint=best step in a
    copy of the render config and runs raygun-predict."""
    if config is None:
        config = sys.argv[1]
    if isinstance(config, str):
        config = read_config(config)

    bests_path = config.get(
        "bests_path", os.path.join(config.get("base_folder", "."), "model_logs_bests.json")
    )
    with open(bests_path) as f:
        bests = json.load(f)
    render_template = read_config(config["render_config"])
    out_dir = config.get("out_dir", os.path.dirname(os.path.abspath(bests_path)))

    from ..cli.predict import predict

    rendered = []
    for model, best in bests.items():
        step = best.get("step")
        if step is None:
            continue
        render = dict(render_template)
        render["checkpoint"] = int(step)
        cfg_path = os.path.join(out_dir, f"render_{model}_{step}.json")
        to_json(render, cfg_path)
        logger.info(f"rendering {model} @ {step}")
        rendered.append(predict(cfg_path))
    return rendered
