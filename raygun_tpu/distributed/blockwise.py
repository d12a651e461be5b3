"""Blockwise whole-volume inference: the daisy replacement.

The reference scales inference by daisy blockwise fan-out: a TCP server
leases ROI blocks to GPU worker processes that read/compute/write zarr
(reference ``predict.py:154-170``, ``torch/predict/worker.py:94-161``).
TPU-native redesign, two tiers:

1. :class:`BlockwiseRunner` — single-host scheduler: deterministic block
   grid (``core.roi.block_grid``), double-buffered async tensorstore reads
   and writes overlapped with jitted forward passes, bounded retries
   (daisy's ``max_retries``). No TCP: the grid is a pure function of the
   ROI, so any worker can recompute its assignment (multi-host splits the
   grid by ``jax.process_index()``).

2. :func:`halo_exchange_1d` / :func:`sharded_infer_1d` — whole-volume
   inference as ONE sharded program over a device mesh: the volume is
   sharded along z, halo slabs move over ICI via ``lax.ppermute``, and each
   chip runs the valid-conv net on shard+halo. Replaces file-mediated worker
   swarms for volumes that fit the pod (SURVEY §5.7's north star).

Seam-freeness in both tiers relies on the networks' translation-equivariance
crops (``nn/layers.crop_to_factor``): outputs of adjacent blocks agree
exactly, which ``tests/distributed`` asserts.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.roi import Coordinate, Roi, block_grid
from ..io.volume import Volume


class BlockwiseRunner:
    """Run ``fn`` over a block grid with overlapped IO.

    ``fn(block_input) -> dict[name, array]``: jitted forward on one read
    block (channels-last, no batch dim handled here).
    ``source``: input Volume; ``outputs``: dict name → (Volume, num_channels).
    ``input_shape``/``output_shape``: voxel shapes of the net's read/write.
    """

    def __init__(
        self,
        source: Volume,
        outputs: Dict[str, Volume],
        fn: Callable,
        input_shape: Sequence[int],
        output_shape: Sequence[int],
        total_roi: Optional[Roi] = None,
        max_retries: int = 2,
        normalize_fn: Optional[Callable] = None,
        process_index: int = 0,
        num_processes: int = 1,
        device_batch: int = 1,
        queue_dir: Optional[str] = None,
        lease_timeout: float = 600.0,
    ):
        self.source = source
        self.outputs = outputs
        self.fn = fn
        self.input_shape = tuple(input_shape)
        self.output_shape = tuple(output_shape)
        self.voxel_size = source.voxel_size
        self.total_roi = total_roi if total_roi is not None else source.roi
        context_vox = tuple(
            (i - o) // 2 for i, o in zip(self.input_shape, self.output_shape)
        )
        self.context = Coordinate(context_vox) * self.voxel_size
        self.write_size = Coordinate(self.output_shape) * self.voxel_size
        blocks = block_grid(self.total_roi, self.write_size, self.context)
        # two multi-host modes replace daisy's TCP lease server:
        #   static split (default): deterministic, zero coordination
        #   queue_dir: shared-filesystem lease queue — elastic workers +
        #   failed-shard reissue (see distributed.queue.FileClaimQueue)
        self.queue = None
        if queue_dir is not None:
            from .queue import FileClaimQueue

            self.all_blocks = blocks
            self.blocks = blocks  # length used for grouping; order via queue
            self.queue = FileClaimQueue(
                queue_dir, len(blocks), lease_timeout=lease_timeout
            )
        else:
            self.blocks = blocks[process_index::num_processes]
        self.max_retries = max_retries
        self.normalize_fn = normalize_fn
        self.device_batch = max(1, int(device_batch))
        self.stats = {"blocks": 0, "read_s": 0.0, "compute_s": 0.0, "write_s": 0.0}

    def _prep(self, data: np.ndarray) -> jnp.ndarray:
        if self.normalize_fn is not None:
            data = self.normalize_fn(data)
        # boundary blocks read less than input_shape: pad the high side so
        # every block hits the same compiled forward (static shapes)
        nd = len(self.input_shape)
        if data.shape[:nd] != self.input_shape:
            pad = [(0, t - s) for t, s in zip(self.input_shape, data.shape[:nd])]
            pad += [(0, 0)] * (data.ndim - nd)
            data = np.pad(data, pad, mode="reflect")
        x = jnp.asarray(data, jnp.float32)
        if x.ndim == nd:
            x = x[..., None]
        return x[None]  # batch dim

    def _crop_to_write(self, out: np.ndarray, write: Roi, nominal_write: Roi):
        """Boundary blocks write a clipped ROI; crop the array to match."""
        if write == nominal_write:
            return out
        rel = (write.offset - nominal_write.offset) / self.voxel_size
        shape = write.voxel_shape(self.voxel_size)
        sl = tuple(slice(int(r), int(r) + s) for r, s in zip(rel, shape))
        return out[sl]

    def _read_result(self, fut, read_roi: Roi) -> np.ndarray:
        """Wait for an async read; on failure re-issue it up to max_retries
        times (daisy retries guard exactly this: transient storage errors,
        reference ``predict.py:161``)."""
        for attempt in range(self.max_retries + 1):
            try:
                return np.asarray(fut.result())
            except Exception:
                if attempt == self.max_retries:
                    raise
                fut = self.source.read_async(read_roi)

    def _drain_write(self, entry) -> None:
        fut, vol, roi, arr = entry
        for attempt in range(self.max_retries + 1):
            try:
                fut.result()
                return
            except Exception:
                if attempt == self.max_retries:
                    raise
                fut = vol.write_async(roi, arr)

    def _start_reads(self, block_list):
        # read only each (possibly clipped) block's real region; inputs
        # are padded back to the static input_shape at the high side in
        # _prep, keeping one compiled forward for every block.
        futures = []
        for write, read in block_list:
            nominal_write = Roi(write.offset, self.write_size)
            futures.append(
                (self.source.read_async(read), read, write, nominal_write)
            )
        return futures

    def _compute_and_write(self, group_futures, pending_writes):
        t0 = time.perf_counter()
        group = [
            (self._read_result(fut, read), write, nominal)
            for fut, read, write, nominal in group_futures
        ]
        self.stats["read_s"] += time.perf_counter() - t0

        # stack the group into one device batch (pad the tail group by
        # repeating the last block; extra outputs are discarded)
        t0 = time.perf_counter()
        db = self.device_batch
        prepped = [self._prep(data)[0] for data, _, _ in group]
        while len(prepped) < db and db > 1:
            prepped.append(prepped[-1])
        x = jnp.stack(prepped) if db > 1 else prepped[0][None]
        for attempt in range(self.max_retries + 1):
            try:
                outs = self.fn(x)
                outs = {k: np.asarray(v) for k, v in outs.items()}
                break
            except Exception:
                if attempt == self.max_retries:
                    raise
        self.stats["compute_s"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        for b, (_, write, nominal_write) in enumerate(group):
            for name, arr in outs.items():
                if name not in self.outputs:
                    continue
                vol = self.outputs[name]
                a = arr[b]
                has_channels = a.ndim == len(self.output_shape) + 1
                a = self._crop_to_write(a, write, nominal_write)
                if has_channels:
                    if vol.num_channels:
                        a = np.moveaxis(a, -1, 0)  # channels-first on disk
                    else:
                        # single-channel net output into a channel-less
                        # dataset (e.g. CycleGAN fake rendering)
                        a = a[..., 0]
                if vol.dtype != a.dtype:
                    a = _rescale_to_dtype(a, vol.dtype)
                pending_writes.append((vol.write_async(write, a), vol, write, a))
            self.stats["blocks"] += 1
        # bound the write queue
        while len(pending_writes) > 8:
            self._drain_write(pending_writes.pop(0))
        self.stats["write_s"] += time.perf_counter() - t0

    def run(self, progress: bool = True) -> dict:
        if self.queue is not None:
            return self._run_queue()
        pending_writes: List = []
        n = len(self.blocks)
        if n == 0:
            return self.stats
        db = self.device_batch
        group_futures = self._start_reads(self.blocks[0:db])
        for g in range(0, n, db):
            next_futures = (
                self._start_reads(self.blocks[g + db: g + 2 * db])
                if g + db < n else None
            )
            self._compute_and_write(group_futures, pending_writes)
            group_futures = next_futures
        for w in pending_writes:
            self._drain_write(w)
        return self.stats

    def _run_queue(self) -> dict:
        """Queue mode: claim blocks from the shared-filesystem lease queue
        (elastic multi-worker + failed-shard reissue); completion is marked
        only after the block's writes have drained."""
        pending_writes: List = []

        def claim_group():
            # only the FIRST claim of a group may wait (for stale leases of
            # dead workers); later claims fill the device batch
            # opportunistically — waiting there would deadlock on the
            # group's own fresh leases
            idxs = []
            for k in range(self.device_batch):
                i = self.queue.next_block(wait=(k == 0))
                if i is None:
                    break
                idxs.append(i)
            return idxs

        idxs = claim_group()
        while idxs:
            futures = self._start_reads([self.all_blocks[i] for i in idxs])
            self._compute_and_write(futures, pending_writes)
            # drain THIS group's writes before marking done: a done-marked
            # block must be durably on disk (reissue correctness)
            for w in pending_writes:
                self._drain_write(w)
            pending_writes.clear()
            for i in idxs:
                self.queue.mark_done(i)
            idxs = claim_group()
        return self.stats


def _rescale_to_dtype(a: np.ndarray, dtype) -> np.ndarray:
    """float [0,1] predictions → integer dtype range (parity: reference
    ``worker.py:116-161`` rescale-to-out-dtype)."""
    dtype = np.dtype(dtype)
    if np.issubdtype(dtype, np.integer):
        info = np.iinfo(dtype)
        return np.clip(a * info.max, info.min, info.max).astype(dtype)
    return a.astype(dtype)


# ---------------------------------------------------------------------------
# Mesh-sharded whole-volume inference with ICI halo exchange
# ---------------------------------------------------------------------------

def halo_exchange_1d(x: jax.Array, halo: int, axis_name: str, axis: int = 0) -> jax.Array:
    """Concatenate each shard with ``halo`` voxels from its mesh neighbors
    along ``axis`` (edge shards pad by reflection). Halo slabs move over ICI
    via ``ppermute`` — the TPU-native equivalent of daisy's overlapping read
    ROIs (reference ``predict.py:92-97``)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    def take(arr, sl):
        slicer = [slice(None)] * arr.ndim
        slicer[axis] = sl
        return arr[tuple(slicer)]

    # slab I send right = my high edge; received from left neighbor
    high = take(x, slice(x.shape[axis] - halo, None))
    low = take(x, slice(0, halo))
    from_left = jax.lax.ppermute(
        high, axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    from_right = jax.lax.ppermute(
        low, axis_name, [(i + 1, i) for i in range(n - 1)]
    )
    # edge shards: reflect own data (callers should arrange the global ROI so
    # edge halos fall outside the write region, or pre-pad the volume)
    reflect_low = jnp.flip(low, axis=axis)
    reflect_high = jnp.flip(high, axis=axis)
    left = jnp.where(idx == 0, reflect_low, from_left)
    right = jnp.where(idx == n - 1, reflect_high, from_right)
    return jnp.concatenate([left, x, right], axis=axis)


def _peel_model_fn(model_fn: Callable):
    """Split a predict_setup-style forward into ``(raw(variables, x),
    variables)`` so params enter the sharded program as ARGUMENTS. Closing
    over a concrete param tree and re-jitting would embed ~the whole
    checkpoint into the HLO as constants, exploding compile time (see
    systems/mtlsd.py predict_setup). Plain fns without ``.raw`` (tests,
    paramless closures) pass through with an empty variables tree."""
    raw = getattr(model_fn, "raw", None)
    if raw is not None:
        return raw, model_fn.variables
    return (lambda _v, x: model_fn(x)), ()


def make_sharded_infer_1d(
    model_fn: Callable,
    mesh: Mesh,
    halo: int,
    axis_name: str = "block",
    spatial_axis: int = 0,
    edge: str = "reflect",
):
    """Whole-volume inference as one jitted sharded program.

    ``model_fn(x)``: valid-conv net mapping ``(*in_spatial, C) →
    (*out_spatial, C')`` where in = out + 2·halo on ``spatial_axis`` (and
    equal elsewhere — the caller supplies context on non-sharded axes by
    growing the input ROI). Input array is sharded along ``spatial_axis``;
    output comes back sharded the same way.

    ``edge``: what happens at the global volume boundary, where the edge
    shards' halo context is REFLECTED data, not neighbors.
    ``"reflect"`` returns those outputs anyway (caller must arrange the
    read ROI so they fall outside the write region — what
    :func:`sharded_infer_volume` does); ``"valid"`` crops the ``halo``
    outermost output voxels per side on ``spatial_axis`` so every
    returned voxel was computed from real context only.
    """
    from jax import shard_map

    if edge not in ("reflect", "valid"):
        raise ValueError(f"edge must be 'reflect' or 'valid', got {edge!r}")
    in_spec = P(*([None] * spatial_axis + [axis_name]))
    out_spec = in_spec
    raw, variables = _peel_model_fn(model_fn)

    def per_shard(variables, x):
        x = halo_exchange_1d(x, halo, axis_name, axis=spatial_axis)
        return raw(variables, x)

    sharded = jax.jit(shard_map(
        per_shard, mesh=mesh, in_specs=(P(), in_spec), out_specs=out_spec,
        check_vma=False,
    ))

    def run(x):
        out = sharded(variables, x)
        if edge == "valid" and halo > 0:
            def crop(leaf):
                sl = [slice(None)] * leaf.ndim
                sl[spatial_axis] = slice(
                    halo, leaf.shape[spatial_axis] - halo)
                return leaf[tuple(sl)]

            out = jax.tree.map(crop, out)
        return out

    return run


def halo_exchange(
    x: jax.Array,
    halos: Sequence[int],
    axis_names: Sequence[str],
    axes: Sequence[int],
) -> jax.Array:
    """N-D halo exchange: sequential 1-D exchanges per mesh axis. Corner
    regions are correct because each later exchange sends slabs of the
    already-extended array."""
    for h, name, ax in zip(halos, axis_names, axes):
        if h > 0:
            x = halo_exchange_1d(x, h, name, axis=ax)
    return x


def make_sharded_infer(
    model_fn: Callable,
    mesh: Mesh,
    halos: Sequence[int],
    spatial_axes: Optional[Sequence[int]] = None,
    edge: str = "reflect",
):
    """N-D mesh-sharded whole-volume inference (one jitted program).

    ``model_fn(x)``: valid-conv net ``(*in_spatial, C) → pytree of
    (*out_spatial, C')`` with in = out + 2·halo per axis. The input is
    sharded over ``mesh.axis_names`` along ``spatial_axes`` (default: the
    leading axes in mesh order); halo slabs move over ICI; each output
    leaf comes back sharded the same way (per-shard extent = shard extent,
    so the global output has the INPUT's extent along sharded axes — the
    outer ``halo`` voxels there were computed from edge-reflected context).

    ``edge="reflect"`` returns those edge voxels anyway (caller must crop,
    or arrange the read ROI so they fall outside the write region — what
    :func:`sharded_infer_volume` does); ``edge="valid"`` crops each
    sharded axis by its ``halo`` per side so every returned voxel was
    computed from real context only.
    """
    from jax import shard_map

    if edge not in ("reflect", "valid"):
        raise ValueError(f"edge must be 'reflect' or 'valid', got {edge!r}")

    names = list(mesh.axis_names)
    if spatial_axes is None:
        spatial_axes = list(range(len(names)))
    max_ax = max(spatial_axes)
    spec_list: List[Optional[str]] = [None] * (max_ax + 1)
    for name, ax in zip(names, spatial_axes):
        spec_list[ax] = name
    in_spec = P(*spec_list)

    raw, variables = _peel_model_fn(model_fn)

    def per_shard(variables, x):
        # axes with one mesh slot already hold their full context — an
        # exchange there would concatenate reflected slabs onto real data
        active = [
            (h, n_, ax) for h, n_, ax in zip(halos, names, spatial_axes)
            if mesh.shape[n_] > 1
        ]
        x = halo_exchange(
            x, [a[0] for a in active], [a[1] for a in active],
            [a[2] for a in active],
        )
        return raw(variables, x)

    sharded = jax.jit(shard_map(
        per_shard, mesh=mesh, in_specs=(P(), in_spec), out_specs=in_spec,
        check_vma=False,
    ))

    def run(x):
        out = sharded(variables, x)
        if edge == "valid":
            # only exchanged axes (mesh size > 1) carry reflected edge
            # outputs; size-1 axes consumed caller-grown real context
            def crop(leaf):
                sl = [slice(None)] * leaf.ndim
                for h, n_, ax in zip(halos, names, spatial_axes):
                    if h > 0 and mesh.shape[n_] > 1:
                        sl[ax] = slice(h, leaf.shape[ax] - h)
                return leaf[tuple(sl)]

            out = jax.tree.map(crop, out)
        return out

    return run


class SuperBlockRunner:
    """Teravoxel tier: stream super-blocks through the N-D mesh-sharded
    program — mesh-parallel compute with bounded host memory.

    :func:`sharded_infer_volume` stages the ENTIRE read ROI in host RAM
    (fine for pod-fit volumes); the reference's answer at scale is the
    daisy fan-out of single-GPU workers (``predict.py:154-170``), which
    never aggregates chips. This runner is the missing middle tier
    (VERDICT r2 #2): an outer loop over super-blocks, each read with its
    valid-conv context, sharded over the mesh, halo-exchanged over ICI,
    cropped, and written — peak host memory is O(super_block + context),
    independent of volume size. Reads are double-buffered against compute,
    writes are async with bounded depth and retries (the
    :class:`BlockwiseRunner` IO discipline).

    Every super-block runs the SAME compiled program: boundary blocks are
    reflect-padded up to the static padded read shape and their outputs
    cropped, exactly like ``BlockwiseRunner._prep``.

    ``super_block_shape``: per-axis WRITE extent (voxels) of one
    super-block; per-axis it must be a multiple of the mesh axis (after
    context growth it is padded up to divisibility).
    """

    def __init__(
        self,
        source: Volume,
        outputs: Dict[str, Volume],
        fn: Callable,
        input_shape: Sequence[int],
        output_shape: Sequence[int],
        mesh_shape: Sequence[int],
        super_block_shape: Sequence[int],
        total_write_roi: Optional[Roi] = None,
        normalize_fn: Optional[Callable] = None,
        devices=None,
        max_retries: int = 2,
    ):
        nd = len(input_shape)
        self.nd = nd
        self.source = source
        self.outputs = outputs
        self.mesh_shape = tuple(mesh_shape)
        self.super_block = tuple(int(s) for s in super_block_shape)
        assert len(self.mesh_shape) == nd and len(self.super_block) == nd
        self.voxel_size = source.voxel_size
        self.context_vox = tuple(
            (i - o) // 2 for i, o in zip(input_shape, output_shape)
        )
        self.context = Coordinate(self.context_vox) * self.voxel_size
        if total_write_roi is None:
            total_write_roi = source.roi.grow(-self.context, -self.context)
        self.total_write_roi = total_write_roi
        assert source.roi.contains(total_write_roi.grow(self.context, self.context)), (
            "super-block sharded inference reads write_roi + context; grow "
            "the source or shrink total_write_roi"
        )
        self.write_size = Coordinate(self.super_block) * self.voxel_size
        # block_grid shrinks its total ROI by context to get the writable
        # region; grow first so writable == total_write_roi exactly
        self.blocks = block_grid(
            total_write_roi.grow(self.context, self.context),
            self.write_size, self.context,
        )
        self.normalize_fn = normalize_fn
        self.max_retries = max_retries

        # static per-super-block read shape, padded up so every mesh axis
        # divides it (one compile serves every block)
        read_shape = tuple(s + 2 * c for s, c in zip(self.super_block, self.context_vox))
        self.read_shape = read_shape
        self.padded_shape = tuple(
            -(-r // m) * m for r, m in zip(read_shape, self.mesh_shape)
        )
        for p, m, h in zip(self.padded_shape, self.mesh_shape, self.context_vox):
            if m > 1 and p // m < h:
                raise ValueError(
                    f"super_block too small: shard extent {p // m} < halo {h} "
                    f"(ppermute slabs cannot exceed the shard); raise "
                    f"super_block or lower the mesh factor on that axis"
                )

        if devices is None:
            devices = jax.devices()[: int(np.prod(self.mesh_shape))]
        names = tuple(f"b{d}" for d in range(nd))
        self.mesh = Mesh(np.asarray(devices).reshape(self.mesh_shape), names)
        self.sharded_fn = make_sharded_infer(
            fn, self.mesh, halos=self.context_vox, spatial_axes=list(range(nd))
        )
        self.in_sharding = jax.sharding.NamedSharding(self.mesh, P(*names))
        self.stats = {"blocks": 0, "read_s": 0.0, "compute_s": 0.0, "write_s": 0.0}

    def _read_block(self, read_roi: Roi):
        return self.source.read_async(read_roi)

    def _prep(self, data: np.ndarray) -> jnp.ndarray:
        if self.normalize_fn is not None:
            data = self.normalize_fn(data)
        nd = self.nd
        if data.ndim == nd:
            data = data[..., None]
        # boundary blocks read less; pad (plus mesh-divisibility padding)
        # reflect on the high side — outputs there are cropped before write
        pad = [
            (0, p - s) for p, s in zip(self.padded_shape, data.shape[:nd])
        ] + [(0, 0)]
        if any(p != (0, 0) for p in pad):
            data = np.pad(data, pad, mode="reflect")
        return jax.device_put(jnp.asarray(data, jnp.float32), self.in_sharding)

    def _run_block(self, fut, read_roi, write_roi, pending_writes):
        t0 = time.perf_counter()
        for attempt in range(self.max_retries + 1):
            try:
                data = np.asarray(fut.result())
                break
            except Exception:
                if attempt == self.max_retries:
                    raise
                fut = self._read_block(read_roi)
        self.stats["read_s"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        x = self._prep(data)
        for attempt in range(self.max_retries + 1):
            try:
                outs = self.sharded_fn(x)
                outs = {k: np.asarray(v) for k, v in outs.items()}
                break
            except Exception:
                if attempt == self.max_retries:
                    raise
        self.stats["compute_s"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        W = write_roi.voxel_shape(self.voxel_size)
        for name, arr in outs.items():
            if name not in self.outputs:
                continue
            vol = self.outputs[name]
            # sharded axes return the PADDED input extent: outer context +
            # divisibility padding live beyond the write window (crop); an
            # unsharded (mesh=1) axis already shaved the context
            sl = tuple(
                slice(c, c + w) if m > 1 else slice(0, w)
                for c, w, m in zip(self.context_vox, W, self.mesh_shape)
            )
            a = arr[sl]
            if a.ndim == self.nd + 1 and a.shape[-1] > 1:
                a = np.moveaxis(a, -1, 0)
            elif a.ndim == self.nd + 1:
                a = a[..., 0]
            if vol.dtype != a.dtype:
                a = _rescale_to_dtype(a, vol.dtype)
            pending_writes.append((vol.write_async(write_roi, a), vol, write_roi, a))
        self.stats["blocks"] += 1
        while len(pending_writes) > 4:
            entry = pending_writes.pop(0)
            _drain_write_entry(entry, self.max_retries)
        self.stats["write_s"] += time.perf_counter() - t0

    def run(self, progress: bool = True) -> dict:
        pending_writes: List = []
        n = len(self.blocks)
        if n == 0:
            return self.stats
        # double buffer: next super-block's read overlaps this one's compute
        write0, read0 = self.blocks[0]
        fut = self._read_block(read0)
        for i in range(n):
            write_roi, read_roi = self.blocks[i]
            next_fut = (
                self._read_block(self.blocks[i + 1][1]) if i + 1 < n else None
            )
            self._run_block(fut, read_roi, write_roi, pending_writes)
            fut = next_fut
        for entry in pending_writes:
            _drain_write_entry(entry, self.max_retries)
        return self.stats


def _drain_write_entry(entry, max_retries: int) -> None:
    fut, vol, roi, arr = entry
    for attempt in range(max_retries + 1):
        try:
            fut.result()
            return
        except Exception:
            if attempt == max_retries:
                raise
            fut = vol.write_async(roi, arr)


def sharded_infer_volume(
    source: Volume,
    outputs: Dict[str, Volume],
    fn: Callable,
    input_shape: Sequence[int],
    output_shape: Sequence[int],
    mesh_shape: Sequence[int],
    total_write_roi: Optional[Roi] = None,
    normalize_fn: Optional[Callable] = None,
    devices=None,
) -> dict:
    """Whole-volume inference over an N-D device mesh, CLI-reachable
    (``raygun-predict`` config key ``sharded``).

    Reads the write ROI grown by the valid-conv context (so edge shards'
    halo context is REAL data; the reflected outermost halo only influences
    voxels outside the write region, which are cropped), shards it over the
    mesh, runs one jitted program with ICI halo exchange, and writes each
    output. Replaces the reference's file-mediated worker swarm
    (``predict.py:154-170``) for volumes that fit the pod (SURVEY §5.7).

    ``fn(x)``: batchless forward ``(*in_spatial, C) → {name: (*out, C')}``.
    ``mesh_shape``: devices per spatial axis, e.g. ``(2, 2, 2)``; axes with
    1 are unsharded.
    """
    nd = len(input_shape)
    mesh_shape = tuple(mesh_shape)
    assert len(mesh_shape) == nd
    voxel_size = source.voxel_size
    context_vox = tuple(
        (i - o) // 2 for i, o in zip(input_shape, output_shape)
    )
    context = Coordinate(context_vox) * voxel_size
    if total_write_roi is None:
        total_write_roi = source.roi.grow(-context, -context)
    read_roi = total_write_roi.grow(context, context)
    assert source.roi.contains(read_roi), (
        "sharded inference reads write_roi + context; grow the source or "
        "shrink total_write_roi"
    )

    stats = {"read_s": 0.0, "compute_s": 0.0, "write_s": 0.0, "blocks": 1}
    t0 = time.perf_counter()
    data = np.asarray(source.read(read_roi))
    stats["read_s"] = time.perf_counter() - t0
    if normalize_fn is not None:
        data = normalize_fn(data)
    if data.ndim == nd:
        data = data[..., None]

    # pad sharded axes up to divisibility (high side; the extra outputs are
    # cropped — they never reach the write region)
    R = data.shape[:nd]
    padded = tuple(-(-r // m) * m for r, m in zip(R, mesh_shape))
    if padded != R:
        pad = [(0, p - r) for p, r in zip(padded, R)] + [(0, 0)]
        data = np.pad(data, pad, mode="reflect")

    if devices is None:
        devices = jax.devices()[: int(np.prod(mesh_shape))]
    names = tuple(f"b{d}" for d in range(nd))
    mesh = Mesh(np.asarray(devices).reshape(mesh_shape), names)
    sharded_fn = make_sharded_infer(
        fn, mesh, halos=context_vox, spatial_axes=list(range(nd))
    )
    spec = P(*names)
    x = jax.device_put(
        jnp.asarray(data), jax.sharding.NamedSharding(mesh, spec)
    )
    t0 = time.perf_counter()
    outs = sharded_fn(x)
    outs = {k: np.asarray(v) for k, v in outs.items()}
    stats["compute_s"] = time.perf_counter() - t0

    # crop: sharded axes produced the input extent (outer context + padding
    # garbage); unsharded axes already shaved the context
    W = total_write_roi.voxel_shape(voxel_size)
    t0 = time.perf_counter()
    for name, arr in outs.items():
        if name not in outputs:
            continue
        sl = tuple(
            slice(c, c + w) if m > 1 else slice(0, w)
            for c, w, m in zip(context_vox, W, mesh_shape)
        )
        a = arr[sl]
        vol = outputs[name]
        if a.ndim == nd + 1 and a.shape[-1] > 1:
            a = np.moveaxis(a, -1, 0)
        elif a.ndim == nd + 1:
            a = a[..., 0]
        if vol.dtype != a.dtype:
            a = _rescale_to_dtype(a, vol.dtype)
        vol.write(total_write_roi, a)
    stats["write_s"] = time.perf_counter() - t0
    return stats
