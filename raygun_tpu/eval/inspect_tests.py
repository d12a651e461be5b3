"""Statistical comparison of model test metrics.

Capability parity with reference ``src/raygun/evaluation/inspect_tests.py``
(``:42-100``, ``:334+``): collect per-model VOI metric distributions and
compute pairwise significance matrices (KS, Mann-Whitney U, Wilcoxon,
t-test) plus scatter summaries.
"""

from __future__ import annotations

import json
import logging
import os
import sys
from glob import glob
from typing import Dict, List, Optional, Sequence

import numpy as np
from scipy import stats

from ..core.config import read_config
from ..core.utils import to_json

logger = logging.getLogger(__name__)

TESTS = {
    "ks": lambda a, b: stats.ks_2samp(a, b),
    "mannwhitneyu": lambda a, b: stats.mannwhitneyu(a, b),
    "ttest": lambda a, b: stats.ttest_ind(a, b, equal_var=False),
    "wilcoxon": lambda a, b: stats.ranksums(a, b),
}


def collect_metric_distributions(
    base_folder: str,
    metric_glob: str = "**/test_*metrics*.json",
    keys: Sequence[str] = ("nvi_split", "nvi_merge"),
) -> Dict[str, List[float]]:
    """{model_name: [scores]} from metric JSON files under a folder tree."""
    out: Dict[str, List[float]] = {}
    for path in sorted(glob(os.path.join(base_folder, metric_glob), recursive=True)):
        name = os.path.relpath(os.path.dirname(path), base_folder).replace(os.sep, "_")
        try:
            with open(path) as f:
                metrics = json.load(f)
        except Exception:
            continue
        rows = metrics.values() if all(
            isinstance(v, dict) for v in metrics.values()
        ) else [metrics]
        for row in rows:
            if all(k in row for k in keys):
                out.setdefault(name, []).append(
                    float(np.sum([row[k] for k in keys]))
                )
    return out


def significance_matrices(
    distributions: Dict[str, List[float]],
    tests: Sequence[str] = ("ks", "mannwhitneyu", "ttest"),
) -> Dict[str, Dict[str, Dict[str, float]]]:
    """Pairwise p-value matrices per test (reference inspect_tests
    significance matrices)."""
    names = sorted(distributions)
    out: Dict[str, Dict[str, Dict[str, float]]] = {}
    for test in tests:
        fn = TESTS[test]
        mat: Dict[str, Dict[str, float]] = {}
        for a in names:
            mat[a] = {}
            for b in names:
                if a == b or len(distributions[a]) < 2 or len(distributions[b]) < 2:
                    mat[a][b] = float("nan")
                    continue
                try:
                    mat[a][b] = float(fn(distributions[a], distributions[b]).pvalue)
                except Exception:
                    mat[a][b] = float("nan")
        out[test] = mat
    return out


def collect_metric_pairs(
    base_folder: str,
    metric_glob: str = "**/test_*metrics*.json",
    pair: Sequence[str] = ("nvi_split", "nvi_merge"),
) -> Dict[str, List[Sequence[float]]]:
    """{model_name: [(split, merge), ...]} for the scatter figure."""
    out: Dict[str, List[Sequence[float]]] = {}
    for path in sorted(glob(os.path.join(base_folder, metric_glob), recursive=True)):
        name = os.path.relpath(os.path.dirname(path), base_folder).replace(os.sep, "_")
        try:
            with open(path) as f:
                metrics = json.load(f)
        except Exception:
            continue
        rows = metrics.values() if all(
            isinstance(v, dict) for v in metrics.values()
        ) else [metrics]
        for row in rows:
            if all(k in row for k in pair):
                out.setdefault(name, []).append(
                    tuple(float(row[k]) for k in pair)
                )
    return out


def plot_metric_pair_scatter(
    pairs: Dict[str, List[Sequence[float]]],
    pair_names: Sequence[str] = ("split", "merge"),
    save_path: Optional[str] = None,
):
    """Split-vs-merge scatter per model (capability: reference
    ``inspect_tests.plot_metric_pairs_scatters:334+``) — one marker style +
    color per model, saved to ``save_path`` when given (headless-safe)."""
    import matplotlib

    if save_path:
        matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 8))
    markers = "ov^sDPX*<>"
    cmap = plt.get_cmap("tab10")
    for i, (name, values) in enumerate(sorted(pairs.items())):
        arr = np.asarray(values, np.float64)
        ax.scatter(
            arr[:, 0], arr[:, 1], label=name,
            marker=markers[i % len(markers)], color=cmap(i % 10), s=80,
        )
    ax.set_xlabel(pair_names[0])
    ax.set_ylabel(pair_names[1])
    ax.set_title(" vs ".join(pair_names))
    ax.legend(fontsize=8)
    if save_path:
        fig.savefig(save_path, bbox_inches="tight", dpi=120)
        plt.close(fig)
    return fig


def inspect_tests(config=None) -> dict:
    if config is None:
        config = sys.argv[1]
    if isinstance(config, str) and config.endswith(".json"):
        config = read_config(config)
    elif isinstance(config, str):
        config = {"base_folder": config}
    base = config.get("base_folder", ".")
    keys = tuple(config.get("keys", ("nvi_split", "nvi_merge")))
    dists = collect_metric_distributions(base, keys=keys)
    result = {
        "distributions": {
            k: {"n": len(v), "mean": float(np.mean(v)), "std": float(np.std(v)),
                "values": v}
            for k, v in dists.items()
        },
        "significance": significance_matrices(dists),
    }
    to_json(result, os.path.join(base, "test_comparison.json"))
    if config.get("plot", True):
        pairs = collect_metric_pairs(base, pair=keys)
        if pairs:
            plot_metric_pair_scatter(
                pairs, pair_names=keys,
                save_path=os.path.join(base, "test_comparison_scatter.png"),
            )
            result["scatter"] = os.path.join(base, "test_comparison_scatter.png")
    return result
