"""Log/metric inspection + best-checkpoint picking.

Capability parity with reference ``src/raygun/evaluation/inspect_logs.py``
(+ ``inspect_evals.py``): parse tensorboard event files or JSON metric logs
(``:13-51``), EMA smoothing (``:207-215``), composite sum/geomean scores
(``:187-204``), per-model best-checkpoint selection writing
``model_logs.json`` / ``model_logs_bests.json`` (``:117-176``, ``:245-273``).
"""

from __future__ import annotations

import json
import logging
import os
import sys
from glob import glob
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..core.config import read_config, to_json

logger = logging.getLogger(__name__)


def read_json_log(path: str) -> Dict[int, Dict[str, float]]:
    """{iteration: {metric: value}} metric files (validation output format)."""
    with open(path) as f:
        raw = json.load(f)
    return {int(k): v for k, v in raw.items()}


def read_tensorboard_log(log_dir: str, tags: Optional[Sequence[str]] = None
                         ) -> Dict[str, Dict[int, float]]:
    """{tag: {step: value}} from tensorboard event files (reference parses
    events via tf.summary_iterator, ``inspect_logs.py:39-51``)."""
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(log_dir, size_guidance={"scalars": 0})
    acc.Reload()
    available = acc.Tags().get("scalars", [])
    tags = tags or available
    out: Dict[str, Dict[int, float]] = {}
    for tag in tags:
        if tag not in available:
            continue
        out[tag] = {e.step: e.value for e in acc.Scalars(tag)}
    return out


def smooth(values: Sequence[float], alpha: float = 0.999) -> np.ndarray:
    """EMA smoothing (parity: reference ``inspect_logs.py:207-215``)."""
    values = np.asarray(values, np.float64)
    out = np.empty_like(values)
    acc = values[0]
    for i, v in enumerate(values):
        acc = alpha * acc + (1 - alpha) * v
        out[i] = acc
    return out


def composite_score(metrics: Dict[str, float], keys: Sequence[str],
                    mode: str = "sum") -> float:
    vals = [metrics[k] for k in keys if k in metrics and np.isfinite(metrics[k])]
    if len(vals) < len(keys):
        return float("nan")
    if mode == "sum":
        return float(np.sum(vals))
    if mode == "geomean":
        return float(np.exp(np.mean(np.log(np.maximum(vals, 1e-12)))))
    raise ValueError(mode)


def score_log(log: Dict[str, Dict[int, float]], keys: Sequence[str],
              alpha: float = 0.999, mode: str = "sum") -> Dict[int, float]:
    """Smoothed composite score per step over a tensorboard-style log."""
    steps = sorted(set.intersection(*[set(log[k]) for k in keys if k in log]))
    if not steps:
        return {}
    smoothed = {k: smooth([log[k][s] for s in steps], alpha) for k in keys if k in log}
    return {
        s: composite_score({k: smoothed[k][i] for k in smoothed}, keys, mode)
        for i, s in enumerate(steps)
    }


def pick_best(scores: Dict[int, float], lower_is_better: bool = True):
    if not scores:
        return None, float("nan")
    items = [(s, v) for s, v in scores.items() if np.isfinite(v)]
    if not items:
        return None, float("nan")
    best = min(items, key=lambda kv: kv[1]) if lower_is_better else max(
        items, key=lambda kv: kv[1]
    )
    return int(best[0]), float(best[1])


def plot_scores(
    logs: Dict[str, Dict[int, float]],
    bests: Optional[dict] = None,
    save_path: Optional[str] = None,
    title: str = "smoothed composite score",
):
    """Smoothed score curves per model with best-checkpoint markers
    (capability: reference ``inspect_evals.plot_scores``/``plot_geo_mean``).
    Headless-safe; written to ``save_path`` when given."""
    import matplotlib

    if save_path:
        matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(9, 5))
    cmap = plt.get_cmap("tab10")
    for i, (name, scores) in enumerate(sorted(logs.items())):
        steps = sorted(scores)
        ax.plot(steps, [scores[s] for s in steps], label=name,
                color=cmap(i % 10))
        if bests and name in bests:
            b = bests[name]
            ax.scatter([b["step"]], [b["score"]], marker="*", s=160,
                       color=cmap(i % 10), zorder=5)
    ax.set_xlabel("iteration")
    ax.set_ylabel("score")
    ax.set_title(title)
    ax.legend(fontsize=8)
    if save_path:
        fig.savefig(save_path, bbox_inches="tight", dpi=120)
        plt.close(fig)
    return fig


def inspect_logs(config=None) -> dict:
    """CLI body: walk a folder tree, aggregate each run's tensorboard scalars
    or metric JSONs, pick per-model best checkpoints, write
    ``model_logs.json`` + ``model_logs_bests.json``."""
    if config is None:
        config = sys.argv[1]
    if isinstance(config, str) and config.endswith(".json"):
        config = read_config(config)
    elif isinstance(config, str):
        config = {"base_folder": config}

    base = config.get("base_folder", ".")
    keys = config.get("keys")
    alpha = float(config.get("smoothing", 0.999))
    mode = config.get("mode", "sum")
    lower = bool(config.get("lower_is_better", True))

    model_logs: dict = {}
    bests: dict = {}

    # tensorboard runs
    for tb_dir in sorted(glob(os.path.join(base, "**", "tensorboard"), recursive=True)):
        name = os.path.relpath(os.path.dirname(tb_dir), base).replace(os.sep, "_")
        try:
            log = read_tensorboard_log(tb_dir)
        except Exception as e:
            logger.warning(f"failed to read {tb_dir}: {e}")
            continue
        if not log:
            continue
        use_keys = keys or sorted(log.keys())
        scores = score_log(log, use_keys, alpha, mode)
        step, value = pick_best(scores, lower)
        model_logs[name] = {
            "tags": sorted(log.keys()),
            "scores": {str(k): v for k, v in scores.items()},
        }
        bests[name] = {"step": step, "score": value, "keys": list(use_keys)}

    # validation metric JSONs
    for mpath in sorted(
        glob(os.path.join(base, "**", "*metrics*.json"), recursive=True)
    ):
        if "bests" in mpath or "model_logs" in mpath:
            continue
        name = os.path.relpath(mpath, base).replace(os.sep, "_")
        try:
            metrics = read_json_log(mpath)
        except Exception:
            continue
        from .validate import get_score

        scores = {it: get_score(m) for it, m in metrics.items()
                  if isinstance(m, dict) and "nvi_split" in m}
        if not scores:
            continue
        step, value = pick_best(scores, lower_is_better=True)
        model_logs[name] = {"scores": {str(k): v for k, v in scores.items()}}
        bests[name] = {"step": step, "score": value,
                       "metrics": metrics.get(step, {})}

    to_json(model_logs, os.path.join(base, "model_logs.json"))
    to_json(bests, os.path.join(base, "model_logs_bests.json"))
    if config.get("plot", True) and model_logs:
        curves = {
            name: {int(k): float(v) for k, v in ml["scores"].items()}
            for name, ml in model_logs.items()
        }
        plot_scores(
            curves, bests,
            save_path=os.path.join(base, "model_logs_scores.png"),
        )
    return bests
