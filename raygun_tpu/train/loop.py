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
        image_every: Optional[int] = None,
        histogram_every: Optional[int] = None,
        validate_every: Optional[int] = None,
        validate_fn: Optional[Callable[[int], Any]] = None,
        profile_dir: Optional[str] = None,
        profile_steps: Sequence[int] = (10, 20),
        steps_per_call: int = 1,
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
        # tensorboard image panels / param histograms (parity: reference
        # ``MTLSDModel.add_log:39-55`` mid-section images and
        # ``FreezableModel.add_log:16-28`` norm-stat histograms)
        self.image_every = image_every
        self.histogram_every = histogram_every
        # training-time validation (parity: reference
        # ``BaseCompetentLoss.update_status:72-76`` -> run_validation)
        self.validate_every = validate_every
        self.validate_fn = validate_fn
        # device-level profiling (SURVEY §5.1: jax.profiler traces, replacing
        # the reference's CPU-only gunpowder node timings): trace the steps
        # in [profile_steps[0], profile_steps[1]) into profile_dir —
        # viewable with tensorboard's profile plugin / xprof
        self.profile_dir = profile_dir
        self.profile_steps = tuple(profile_steps)
        self._profiling = False
        # steps_per_call > 1 runs K steps as ONE dispatched lax.scan
        # between host syncs — amortizing the fixed per-execution dispatch
        # cost (25 ms through the axon relay; host dispatch latency on any
        # deployment). Chunks never straddle a logging/checkpoint/snapshot/
        # validation/phase/profile boundary, so every observable event sees
        # exactly the same state and metrics as steps_per_call=1 (same
        # per-iteration PRNG keys). Device-resident sampling only — the
        # systems reject it in `stream: true` mode (host crops per step).
        self.steps_per_call = max(1, int(steps_per_call or 1))
        self._multi_cache: Dict[Any, Callable] = {}
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

    # -- tensorboard extras --------------------------------------------------
    def log_images(self, step: int, key):
        """Mid-section image panels of the snapshot arrays (reference
        ``MTLSDModel.add_log``/``BaseCompetentLoss.add_log`` behavior:
        first batch element, middle z-section, [-1,1] rescaled to [0,1])."""
        if self.writer is None or self.snapshot_fn is None:
            return
        arrays = jax.device_get(self.snapshot_fn(self.state, key))
        nd = len(self.voxel_size)
        for name, arr in arrays.items():
            img = np.asarray(arr)
            if img.ndim > nd:  # batch dim
                img = img[0]
            # channels-last -> pick first channel for the panel
            if img.ndim == nd + 1:
                img = img[..., 0]
            while img.ndim > 2:  # 3D volume: middle z-section
                img = img[img.shape[0] // 2]
            img = img.astype(np.float32)
            if img.min() < 0 and img.min() >= -1.0 and img.max() <= 1.0:
                img = img * 0.5 + 0.5
            self.writer.add_image(name, img[None], global_step=step)

    def log_histograms(self, step: int):
        """Per-module parameter histograms + norm-layer stats (the
        instance-norm-era equivalent of the reference's running-stat
        histograms, ``FreezableModel.add_log:16-28``)."""
        if self.writer is None:
            return
        params = jax.device_get(getattr(self.state, "params", None))
        if params is None:
            return
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        by_top: Dict[str, list] = {}
        norm_leaves = []
        for path, leaf in flat:
            top = str(path[0]).strip("'[].")
            by_top.setdefault(top, []).append(np.asarray(leaf).ravel())
            pstr = "/".join(str(p).strip("'[].") for p in path)
            if "norm" in pstr.lower() or "scale" in pstr.lower():
                norm_leaves.append(np.asarray(leaf).ravel())
        rng = np.random.default_rng(0)
        for top, leaves in by_top.items():
            v = np.concatenate(leaves)
            if v.size > 65536:  # keep event files small
                v = rng.choice(v, 65536, replace=False)
            self.writer.add_histogram(f"params/{top}", v, global_step=step)
        if norm_leaves:
            self.writer.add_histogram(
                "norm_params", np.concatenate(norm_leaves), global_step=step
            )

    # -- multi-step dispatch ------------------------------------------------
    def _multi_step(self, step_fn, n: int) -> Callable:
        """One jitted lax.scan of ``n`` steps; returns the LAST step's
        metrics (chunks end exactly at logging boundaries, so the logged
        metric is identical to per-step dispatch)."""
        ck = (id(step_fn), n)
        fn = self._multi_cache.get(ck)
        if fn is None:
            def multi(state, keys):
                state, ms = jax.lax.scan(step_fn, state, keys)
                return state, jax.tree.map(lambda a: a[-1], ms)

            fn = jax.jit(multi)
            self._multi_cache[ck] = fn
        return fn

    def _chunk_len(self, i: int) -> int:
        """Steps runnable from iteration ``i`` without crossing any
        observable boundary (events fire at step = i+1 multiples)."""
        n = min(self.steps_per_call, self.num_epochs - i)
        for c in (self.log_every, self.save_every, self.snapshot_every,
                  self.image_every, self.histogram_every,
                  self.validate_every):
            if c:
                n = min(n, int(c) - (i % int(c)))
        for b in self.step_fn_phases:
            if b > i:
                n = min(n, b - i)
        if self.profile_dir is not None:
            for b in self.profile_steps:
                if b > i:
                    n = min(n, b - i)
        return max(1, n)

    # -- main loop ---------------------------------------------------------
    def train(self, start_iteration: Optional[int] = None) -> Any:
        it0 = self.resume() if start_iteration is None else start_iteration
        bar = trange(it0, self.num_epochs, desc="train") if trange else None
        last_metrics = None
        step_fn = self.step_fn
        i = it0
        while i < self.num_epochs:
            for boundary, fn in self.step_fn_phases.items():
                if i >= boundary:
                    step_fn = fn
            if self.profile_dir is not None:
                if i == self.profile_steps[0] and not self._profiling:
                    try:
                        jax.profiler.start_trace(self.profile_dir)
                        self._profiling = True
                    except Exception as e:  # backend without profiler support
                        print(f"profiler unavailable: {e}")
                        self.profile_dir = None
                elif i == self.profile_steps[1] and self._profiling:
                    jax.block_until_ready(self.state)
                    jax.profiler.stop_trace()
                    self._profiling = False
                    print(f"wrote jax.profiler trace to {self.profile_dir}")
            key = jax.random.fold_in(self.base_key, i)
            t0 = time.perf_counter()
            n = 1
            if self.steps_per_call > 1:
                n = self._chunk_len(i)
            if n > 1:
                keys = jax.vmap(
                    lambda t: jax.random.fold_in(self.base_key, t)
                )(jnp.arange(i, i + n))
                self.state, metrics = self._multi_step(step_fn, n)(
                    self.state, keys)
            else:
                self.state, metrics = step_fn(self.state, key)
            step = i + n
            i = step
            # key of the LAST executed iteration (what spc=1 would pass to
            # snapshot/log_images at this event boundary)
            if n > 1:
                key = jax.random.fold_in(self.base_key, step - 1)
            if bar is not None:
                bar.update(n)
            if step % self.log_every == 0 or step == self.num_epochs:
                metrics = jax.device_get(metrics)  # sync point
                self.stats.add("step", (time.perf_counter() - t0) / n)
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
                self.stats.add("step_async", (time.perf_counter() - t0) / n)
            if self.save_every and step % self.save_every == 0:
                self.save(step)
                print(f"\n{self.stats.summary()}")
                self.stats.reset()
            if self.snapshot_every and step % self.snapshot_every == 0:
                self.snapshot(step, key)
            if self.image_every and step % self.image_every == 0:
                self.log_images(step, key)
            if self.histogram_every and step % self.histogram_every == 0:
                self.log_histograms(step)
            if (
                self.validate_every
                and self.validate_fn is not None
                and step % self.validate_every == 0
            ):
                if not (self.save_every and step % self.save_every == 0):
                    self.save(step)  # validation loads the checkpoint
                self.validate_fn(step)
        if bar is not None:
            bar.close()
        if self._profiling:
            jax.profiler.stop_trace()
            self._profiling = False
        if (
            self.save_every
            and self.num_epochs % self.save_every != 0
            and self.num_epochs > it0  # no-op runs (resume past the end)
        ):                             # must not write a LOWER checkpoint
            self.save(self.num_epochs)
        if self.writer is not None:
            self.writer.flush()
        return last_metrics
