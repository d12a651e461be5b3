"""Generic training loop: progress, logging, snapshots, profiling, resume.

Capability parity with the reference trainer (``train/BaseTrain.py:90-186``):
tqdm progress with live loss postfix, tensorboard scalars every ``log_every``,
volume snapshots every ``snapshot_every`` (written as ``{iteration}.zarr``),
checkpoints every ``save_every``, per-stage profiling summary
(print_profiling_stats-compatible), and resume from the latest checkpoint.

TPU-first differences: the whole step (sampling + augmentation + targets +
fwd/bwd + optimizer) is ONE jitted function of ``(state, key)``; the loop is
async — it only blocks on device results at logging boundaries, letting XLA
pipeline steps back-to-back.
"""

from __future__ import annotations

import statistics
import time
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.roi import Coordinate, Roi
from .state import latest_checkpoint, load_checkpoint, save_checkpoint

try:
    from tensorboardX import SummaryWriter
except ImportError:  # pragma: no cover
    SummaryWriter = None

try:
    from tqdm import trange
except ImportError:  # pragma: no cover
    trange = None


class ProfilingStats:
    """Per-stage wall-time stats, printed like the reference's gunpowder
    profiling summary (``BaseTrain.py:132-165``)."""

    def __init__(self):
        self.times: Dict[str, list] = {}

    def add(self, stage: str, seconds: float):
        self.times.setdefault(stage, []).append(seconds)

    def summary(self) -> str:
        header = f"{'stage':<20}{'counts':>8}{'min':>10}{'max':>10}{'mean':>10}{'median':>10}"
        lines = [header]
        for stage, ts in self.times.items():
            lines.append(
                f"{stage:<20}{len(ts):>8}{min(ts):>10.4f}{max(ts):>10.4f}"
                f"{statistics.fmean(ts):>10.4f}{statistics.median(ts):>10.4f}"
            )
        return "\n".join(lines)

    def reset(self):
        self.times.clear()


class Trainer:
    """Drive a jitted ``step_fn(state, key) -> (state, metrics)``.

    ``snapshot_fn(state, key) -> dict[name, array]`` (optional) produces the
    arrays to snapshot; arrays are written to ``{snapshot_dir}/{iter}.zarr``.
    """

    def __init__(
        self,
        step_fn: Callable,
        state: Any,
        step_fn_phases: Optional[Dict[int, Callable]] = None,
        num_epochs: int = 1000,
        log_every: int = 20,
        save_every: int = 2000,
        snapshot_every: Optional[int] = None,
        checkpoint_basename: str = "./models/model",
        log_dir: Optional[str] = None,
        snapshot_dir: str = "./snapshots",
        snapshot_fn: Optional[Callable] = None,
        voxel_size: Sequence[int] = (1, 1, 1),
        seed: int = 42,
        log_fn: Optional[Callable[[Any, Any, int], None]] = None,
    ):
        self.step_fn = step_fn
        # {start_step: fn} phase switches (e.g. freeze_norms_at — reference
        # FreezableModel.update_status switches norm modes mid-training)
        self.step_fn_phases = dict(sorted((step_fn_phases or {}).items()))
        self.state = state
        self.num_epochs = num_epochs
        self.log_every = max(1, log_every)
        self.save_every = save_every
        self.snapshot_every = snapshot_every
        self.checkpoint_basename = checkpoint_basename
        self.snapshot_dir = snapshot_dir
        self.snapshot_fn = snapshot_fn
        self.voxel_size = tuple(voxel_size)
        self.base_key = jax.random.PRNGKey(seed)
        self.writer = (
            SummaryWriter(log_dir) if (log_dir and SummaryWriter is not None) else None
        )
        self.log_fn = log_fn
        self.stats = ProfilingStats()

    # -- checkpointing ---------------------------------------------------
    def resume(self) -> int:
        path, it = latest_checkpoint(self.checkpoint_basename)
        if path is not None:
            self.state = load_checkpoint(path, self.state)
            print(f"resumed from {path} (iteration {it})")
        return it

    def save(self, step: int):
        path = save_checkpoint(self.checkpoint_basename, step, self.state)
        return path

    # -- snapshots ---------------------------------------------------------
    def snapshot(self, step: int, key):
        if self.snapshot_fn is None:
            return
        from ..io.volume import prepare_ds

        arrays = jax.device_get(self.snapshot_fn(self.state, key))
        path = f"{self.snapshot_dir}/{step}.zarr"
        nd = len(self.voxel_size)
        for name, arr in arrays.items():
            arr = np.asarray(arr)
            # contract: snapshot_fn returns BATCHED arrays (B, *spatial[, C]);
            # write the first element, channels-first on disk
            if arr.ndim > nd:
                arr = arr[0]
            if arr.ndim == nd + 1:  # channels-last -> channels-first
                arr = np.moveaxis(arr, -1, 0)
                channels = arr.shape[0]
            else:
                channels = None
            total = Roi((0,) * nd, Coordinate(arr.shape[-nd:]) * Coordinate(self.voxel_size))
            ds = prepare_ds(
                path, name, total, self.voxel_size, arr.dtype,
                num_channels=channels, delete=True,
            )
            ds.write(total, arr)

    # -- main loop ---------------------------------------------------------
    def train(self, start_iteration: Optional[int] = None) -> Any:
        it0 = self.resume() if start_iteration is None else start_iteration
        iters = range(it0, self.num_epochs)
        bar = trange(it0, self.num_epochs, desc="train") if trange else iters
        last_metrics = None
        step_fn = self.step_fn
        for i in bar:
            for boundary, fn in self.step_fn_phases.items():
                if i >= boundary:
                    step_fn = fn
            key = jax.random.fold_in(self.base_key, i)
            t0 = time.perf_counter()
            self.state, metrics = step_fn(self.state, key)
            step = i + 1
            if step % self.log_every == 0 or step == self.num_epochs:
                metrics = jax.device_get(metrics)  # sync point
                self.stats.add("step", time.perf_counter() - t0)
                last_metrics = metrics
                if trange and hasattr(bar, "set_postfix"):
                    bar.set_postfix(
                        {k: f"{float(v):.4f}" for k, v in metrics.items() if np.ndim(v) == 0}
                    )
                if self.writer is not None:
                    for k, v in metrics.items():
                        if np.ndim(v) == 0:
                            self.writer.add_scalar(k, float(v), step)
                    if self.log_fn is not None:
                        self.log_fn(self.writer, self.state, step)
            else:
                self.stats.add("step_async", time.perf_counter() - t0)
            if self.save_every and step % self.save_every == 0:
                self.save(step)
                print(f"\n{self.stats.summary()}")
                self.stats.reset()
            if self.snapshot_every and step % self.snapshot_every == 0:
                self.snapshot(step, key)
        if self.save_every and self.num_epochs % self.save_every != 0:
            self.save(self.num_epochs)
        if self.writer is not None:
            self.writer.flush()
        return last_metrics
