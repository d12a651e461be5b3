"""raygun-predict CLI: blockwise whole-volume inference.

Parity with reference ``src/raygun/predict.py`` + ``torch/predict/worker.py``:
render-config surface (config_path, source_path/dataset, checkpoint,
net_name, input/output_shape, out_specs, max_retries, crop), default output
naming ``{source_dataset}_{net_name}_{checkpoint}``, dtype-range input
normalization + optional scaleShift_input, output rescale to target dtype,
and a neuroglancer view script next to the outputs.

TPU-native: no worker swarm / TCP server — a deterministic block grid with
double-buffered tensorstore IO drives one jitted forward per block batch
(``distributed.BlockwiseRunner``); multi-host splits the grid by process
index. ``device_batch > 1`` stacks blocks to amortize dispatch.
"""

from __future__ import annotations

import os
import sys
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import read_config
from ..core.roi import Coordinate, Roi
from ..distributed.blockwise import BlockwiseRunner
from ..io.volume import open_ds, prepare_ds
from ..systems import load_system

RENDER_DEFAULTS = {
    "crop": 0,
    "max_retries": 2,
    "num_workers": 1,
    "ndims": None,
    "net_name": None,
    "output_ds": None,
    "out_specs": None,
    "scaleShift_input": None,
    "device_batch": 1,
    # mesh-sharded whole-volume inference (SURVEY §5.7): true = shard the
    # leading spatial axis over all devices; a list like [2, 2, 2] = devices
    # per spatial axis. Replaces the block grid with ONE jitted program +
    # ICI halo exchange; seam-equivalent to the blockwise path (tested).
    "sharded": None,
    # teravoxel tier: with "sharded", stream super-blocks of this WRITE
    # shape (voxels, per axis; or one int) through the mesh-sharded program
    # instead of staging the whole volume in host RAM (VERDICT r2 #2) —
    # mesh-parallel compute, peak host memory O(super_block + context).
    "super_block": None,
    # shared-filesystem block lease queue (daisy control-plane replacement,
    # distributed.queue): elastic multi-worker + failed-shard reissue.
    # Default: deterministic static split by process index.
    "queue_dir": None,
    "lease_timeout": 600.0,
}


def predict(render_config_path: str) -> List[str]:
    render_config = dict(RENDER_DEFAULTS)
    render_config.update(read_config(render_config_path))

    config_path = render_config["config_path"]
    if not os.path.isabs(config_path):
        config_path = os.path.join(os.path.dirname(render_config_path), config_path)
    train_config = read_config(config_path)
    source_path = render_config["source_path"]
    source_dataset = render_config["source_dataset"]
    net_name = render_config.get("net_name")
    checkpoint = render_config.get("checkpoint")

    # build system + load weights
    cwd = os.getcwd()
    os.chdir(os.path.dirname(config_path))
    try:
        system = load_system(config_path)
        fwd, output_spec = system.predict_setup(
            checkpoint=checkpoint, net_name=net_name
        )
    finally:
        os.chdir(cwd)

    source = open_ds(source_path, source_dataset)

    input_shape = render_config.get("input_shape") or train_config.get("input_shape")
    output_shape = render_config.get("output_shape") or train_config.get("output_shape")
    ndims = render_config["ndims"] or train_config.get("ndims") or source.ndims
    if input_shape == "auto":
        # probe the largest block that compiles on this device: bigger
        # valid-conv blocks amortize the fixed network halo (the reference's
        # fixed daisy block sizes never exploit this — docs/PERFORMANCE.md).
        # Each candidate costs one compile; the winner is cached by XLA.
        input_shape, output_shape = _auto_block_shape(
            fwd, ndims, render_config.get("auto_block_candidates")
        )
        print(f"auto block: {input_shape} -> {output_shape}")
    if isinstance(input_shape, int):
        input_shape = (input_shape,) * ndims
    if isinstance(output_shape, int):
        output_shape = (output_shape,) * ndims
    input_shape = tuple(input_shape)
    output_shape = tuple(output_shape)
    crop = render_config["crop"]
    if crop:
        output_shape = tuple(o - 2 * crop for o in output_shape)
    # 2D-in-3D section-wise rendering (reference render_eval0: a 2D
    # generator over 3D volumes via (1, s, s) daisy blocks)
    section_extra = source.ndims - len(input_shape)
    if section_extra > 0:
        input_shape = (1,) * section_extra + input_shape
        output_shape = (1,) * section_extra + output_shape

    # destination datasets
    dest_path = render_config.get("dest_path") or os.path.join(
        os.path.dirname(config_path), os.path.basename(source_path)
    )
    output_ds = render_config["output_ds"]
    # when the render config omits 'checkpoint', name outputs after the
    # iteration predict_setup actually resolved (never "..._None")
    ckpt_label = checkpoint
    if ckpt_label is None:
        ckpt_label = getattr(system, "resolved_iteration", None)
    if output_ds is None:
        suffix = f"_{net_name}" if net_name else ""
        output_ds = [
            f"{source_dataset}{suffix}_{ckpt_label}_{key}" if len(output_spec) > 1
            else f"{source_dataset}{suffix}_{ckpt_label}"
            for key, _ in output_spec
        ]

    voxel_size = source.voxel_size
    context = Coordinate(
        tuple((i - o) // 2 for i, o in zip(input_shape, output_shape))
    ) * voxel_size
    total_write_roi = source.roi.grow(-context, -context)

    out_specs = render_config["out_specs"] or {}
    outputs: Dict[str, "Volume"] = {}
    for (key, channels), ds_name in zip(output_spec, output_ds):
        spec = out_specs.get(key, {}) if isinstance(out_specs, dict) else {}
        dtype = np.dtype(spec.get("dtype", "float32"))
        outputs[key] = prepare_ds(
            dest_path,
            ds_name,
            total_write_roi,
            voxel_size,
            dtype,
            write_size=Coordinate(output_shape) * voxel_size,
            num_channels=channels if channels and channels > 1 else None,
            delete=True,
        )

    # input normalization (reference worker.py:109-114)
    scale_shift = render_config["scaleShift_input"]
    src_dtype = source.dtype

    def normalize_fn(data: np.ndarray) -> np.ndarray:
        if np.issubdtype(src_dtype, np.integer):
            info = np.iinfo(src_dtype)
            data = (data.astype(np.float32) - info.min) / (info.max - info.min)
        else:
            data = data.astype(np.float32)
        if scale_shift is not None:
            data = data * scale_shift[0] + scale_shift[1]
        return data

    crop_slices = None
    if crop:
        crop_slices = (slice(None),) + (slice(crop, -crop),) * ndims + (slice(None),)

    def block_fn(x):
        if section_extra > 0:
            # blocks carry leading singleton axes squeezed around the 2D net
            x = x.reshape((x.shape[0],) + x.shape[1 + section_extra:])
        outs = fwd(x)
        if crop_slices is not None:
            outs = {k: v[crop_slices] for k, v in outs.items()}
        if section_extra > 0:
            outs = {
                k: v.reshape(v.shape[:1] + (1,) * section_extra + v.shape[1:])
                for k, v in outs.items()
            }
        return outs

    sharded = render_config["sharded"]
    if sharded:
        from ..distributed.blockwise import sharded_infer_volume

        spatial_rank = ndims + section_extra
        if sharded is True:
            mesh_shape = [len(jax.devices())] + [1] * (spatial_rank - 1)
        elif isinstance(sharded, int):
            mesh_shape = [sharded] + [1] * (spatial_rank - 1)
        else:
            mesh_shape = list(sharded)

        if section_extra > 0:
            # 2D-in-3D sectionwise rendering on the mesh (VERDICT r2 #6):
            # z-sections are embarrassingly parallel — shard the leading
            # (z) axes across devices with ZERO halo there (context_vox is
            # 0 on section axes since input z extent == output z extent
            # == 1); in-plane context rides the grown read ROI as usual.
            # Each shard maps the 2D net over its local sections
            # sequentially (lax.map: one resident section per device).
            # Replaces the reference's 32-worker 2D farm
            # (render_eval0_netG2.json) with one sharded program.
            def shard_fn(x):
                lead = tuple(range(section_extra))

                def one(sec):
                    outs = block_fn(sec[(None,) * (1 + section_extra)])
                    # (batch=1, *section_singletons, Y', X', C) -> (Y', X', C)
                    return {k: v.reshape(v.shape[1 + section_extra:])
                            for k, v in outs.items()}

                if section_extra == 1:
                    return jax.lax.map(one, x)
                flat = x.reshape((-1,) + x.shape[section_extra:])
                outs = jax.lax.map(one, flat)
                return {
                    k: v.reshape(x.shape[:section_extra] + v.shape[1:])
                    for k, v in outs.items()
                }
        else:
            def shard_fn(x):
                return {k: v[0] for k, v in block_fn(x[None]).items()}

        super_block = render_config["super_block"]
        if super_block is not None:
            from ..distributed.blockwise import SuperBlockRunner

            if isinstance(super_block, int):
                super_block = [super_block] * ndims
            stats = SuperBlockRunner(
                source=source,
                outputs=outputs,
                fn=shard_fn,
                input_shape=input_shape,
                output_shape=output_shape,
                mesh_shape=mesh_shape,
                super_block_shape=super_block,
                total_write_roi=total_write_roi,
                normalize_fn=normalize_fn,
                max_retries=render_config["max_retries"],
            ).run()
        else:
            stats = sharded_infer_volume(
                source=source,
                outputs=outputs,
                fn=shard_fn,
                input_shape=input_shape,
                output_shape=output_shape,
                mesh_shape=mesh_shape,
                total_write_roi=total_write_roi,
                normalize_fn=normalize_fn,
            )
    else:
        runner = BlockwiseRunner(
            source=source,
            outputs=outputs,
            fn=block_fn,
            input_shape=input_shape,
            output_shape=output_shape,
            max_retries=render_config["max_retries"],
            normalize_fn=normalize_fn,
            process_index=jax.process_index(),
            num_processes=jax.process_count(),
            device_batch=int(render_config["device_batch"]),
            queue_dir=render_config["queue_dir"],
            lease_timeout=float(render_config["lease_timeout"]),
        )
        stats = runner.run()
    print(
        f"predicted {stats['blocks']} blocks: read {stats['read_s']:.1f}s, "
        f"compute {stats['compute_s']:.1f}s, write {stats['write_s']:.1f}s"
    )

    write_ng_script(dest_path, list(outputs.values()), source_path,
                    source_dataset, checkpoint=ckpt_label)
    return [os.path.join(dest_path, d) for d in output_ds]


def _auto_block_shape(fwd, ndims: int, candidates=None):
    """Find the largest cubic block the compiled forward fits on this
    device; returns (input_shape, output_shape). Valid-conv shape algebra
    comes from an eval_shape probe; fit is checked by actually compiling."""
    if candidates is None:
        candidates = (
            [420, 388, 324, 260, 196, 132] if ndims == 3
            else [2048, 1024, 512, 256, 128]
        )
    last_err = None
    for side in candidates:
        shape = (1,) + (int(side),) * ndims + (1,)
        try:
            out = jax.eval_shape(
                fwd, jax.ShapeDtypeStruct(shape, jnp.float32)
            )
            out_spatial = next(iter(jax.tree_util.tree_leaves(out))).shape[1:-1]
            if any(o <= 0 for o in out_spatial):
                continue
            raw = getattr(fwd, "raw", None)
            if raw is not None:
                # params stay jit ARGUMENTS (constant-embedding would make
                # each probe compile pathological — systems/mtlsd.py note)
                jax.jit(raw).lower(
                    fwd.variables, jax.ShapeDtypeStruct(shape, jnp.float32)
                ).compile()
            else:
                jax.jit(fwd).lower(
                    jax.ShapeDtypeStruct(shape, jnp.float32)
                ).compile()
            return (int(side),) * ndims, tuple(int(o) for o in out_spatial)
        except Exception as e:  # too big for HBM (or invalid): try smaller
            last_err = e
            continue
    raise RuntimeError(f"no auto block candidate compiled: {last_err}")


def batch_predict(base_folder: str, config_name: str = "render_conf.json"):
    """Render every ``render_conf.json`` under a folder tree — the
    capability reference ``predict.py:195-253`` stubs out (its
    ``batch_predict`` is dead code marked TODO with missing imports,
    SURVEY §2.4). Walks like ``batch_train``, skipping output dirs."""
    base_folder = os.path.abspath(base_folder)
    skip = {"models", "snapshots", "tensorboard", "tensorboards", "__pycache__"}
    rendered = []
    for root, dirs, files in os.walk(base_folder):
        dirs[:] = [d for d in dirs if d not in skip and not d.endswith(".zarr")
                   and not d.endswith(".n5")]
        if config_name in files:
            conf = os.path.join(root, config_name)
            print(f"rendering {conf}")
            rendered.extend(predict(conf))
    return rendered


def batch_main():
    if len(sys.argv) < 2:
        print("usage: raygun-predict-batch <folder> [config_name]", file=sys.stderr)
        sys.exit(1)
    batch_predict(sys.argv[1], *(sys.argv[2:3] or []))


def write_ng_script(dest_path, volumes, source_path, source_dataset,
                    checkpoint=None):
    """Neuroglancer view script (parity: reference ``predict.py:172-189``);
    records the RESOLVED checkpoint so a view script is traceable to the
    exact weights that produced its layers."""
    script = os.path.join(dest_path + ".ng")
    layers = "\n".join(
        f"# layer: {v.path}/{v.ds_name}" for v in volumes
    )
    ckpt_line = f"# checkpoint: {checkpoint}\n" if checkpoint is not None else ""
    with open(script, "w") as f:
        f.write(
            "#!/usr/bin/env python\n"
            "# neuroglancer view script (auto-generated)\n"
            f"# source: {source_path}/{source_dataset}\n"
            f"{ckpt_line}"
            f"{layers}\n"
            "import neuroglancer  # requires neuroglancer installed\n"
            "# open the datasets above with your preferred viewer\n"
        )
    return script


def main():
    if len(sys.argv) < 2:
        print("usage: raygun-predict <render_config.json>", file=sys.stderr)
        sys.exit(1)
    predict(os.path.abspath(sys.argv[1]))


if __name__ == "__main__":
    main()
