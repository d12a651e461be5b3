"""The console-script surface (reference setup.cfg:67-79 parity): drive the
actual ``main()`` entry points with patched argv — argument handling, config
resolution, working-dir behavior — on a tiny synthetic run."""

import json
import os
import sys

import numpy as np
import pytest

from raygun_tpu.io import make_segmentation_dataset
from raygun_tpu.io.volume import open_ds


def _write_train_conf(tmp_path, src):
    conf = {
        "system": "MTLSD",
        "sources": [src],
        "ndims": 3, "batch_size": 1,
        "input_shape": [20, 20, 20], "output_shape": [4, 4, 4],
        "voxel_size": [30, 30, 30],
        "neighborhood": [[1, 0, 0], [0, 1, 0], [0, 0, 1]],
        "n_diagonals": 0,
        "model_kwargs": {"unet_kwargs": {
            "input_nc": 1, "ngf": 2, "fmap_inc_factor": 2,
            "downsample_factors": [[2, 2, 2]], "constant_upsample": True,
        }, "num_affs": 3},
        "elastic_aug1_kwargs": None, "elastic_aug2_kwargs": None,
        "intensity_aug_kwargs": None,
        "lsd_kwargs": None, "max_labels": 16,
        "optim_type": "adam", "optim_kwargs": {"learning_rate": 0.001},
        "model_path": str(tmp_path / "models") + "/",
        "train_kwargs": {"log_every": 2, "num_epochs": 2, "save_every": 2},
    }
    p = tmp_path / "train_conf.json"
    p.write_text(json.dumps(conf))
    return str(p)


def test_train_and_predict_mains(tmp_path, monkeypatch):
    from raygun_tpu.cli import predict as predict_cli
    from raygun_tpu.cli import train as train_cli

    src = make_segmentation_dataset(
        str(tmp_path / "gt.zarr"), shape=(32, 32, 32), num_cells=6)
    conf = _write_train_conf(tmp_path, src)

    cwd = os.getcwd()
    monkeypatch.setattr(sys, "argv", ["raygun-train", conf])
    try:
        train_cli.main()
    finally:
        os.chdir(cwd)
    assert any("checkpoint" in f for f in os.listdir(tmp_path / "models"))

    render = {
        "config_path": "train_conf.json",
        "source_path": src["path"],
        "source_dataset": src["raw"],
        "checkpoint": 2,
        "input_shape": 20,
        "output_shape": 4,
        "output_ds": ["pred_affs"],
        "dest_path": str(tmp_path / "out.zarr"),
        "scaleShift_input": [2, -1],
    }
    rp = tmp_path / "render_conf.json"
    rp.write_text(json.dumps(render))
    monkeypatch.setattr(sys, "argv", ["raygun-predict", str(rp)])
    try:
        predict_cli.main()
    finally:
        os.chdir(cwd)
    affs = open_ds(str(tmp_path / "out.zarr"), "pred_affs").read()
    assert np.isfinite(affs).all() and affs.shape[0] == 3


def test_train_main_usage_error(monkeypatch, capsys):
    from raygun_tpu.cli import train as train_cli

    monkeypatch.setattr(sys, "argv", ["raygun-train"])
    with pytest.raises(SystemExit):
        train_cli.main()


def test_predict_auto_block(tmp_path, monkeypatch):
    """render config input_shape: 'auto' probes the largest compiling block."""
    from raygun_tpu.cli import predict as predict_cli
    from raygun_tpu.cli import train as train_cli

    src = make_segmentation_dataset(
        str(tmp_path / "gt.zarr"), shape=(40, 40, 40), num_cells=6)
    conf = _write_train_conf(tmp_path, src)
    cwd = os.getcwd()
    monkeypatch.setattr(sys, "argv", ["raygun-train", conf])
    try:
        train_cli.main()
    finally:
        os.chdir(cwd)

    render = {
        "config_path": "train_conf.json",
        "source_path": src["path"],
        "source_dataset": src["raw"],
        "checkpoint": 2,
        "input_shape": "auto",
        "auto_block_candidates": [36, 28, 20],
        "output_ds": ["pred_affs"],
        "dest_path": str(tmp_path / "out.zarr"),
        "scaleShift_input": [2, -1],
    }
    rp = tmp_path / "render_auto.json"
    rp.write_text(json.dumps(render))
    monkeypatch.setattr(sys, "argv", ["raygun-predict", str(rp)])
    try:
        predict_cli.main()
    finally:
        os.chdir(cwd)
    affs = open_ds(str(tmp_path / "out.zarr"), "pred_affs").read()
    assert np.isfinite(affs).all() and affs.shape[0] == 3


def test_cyclegan_render_main(tmp_path, monkeypatch):
    """Single-channel (fake) rendering through the predict CLI — the
    reference's netG2 whole-volume rendering path (render_eval0)."""
    from raygun_tpu.cli import predict as predict_cli
    from raygun_tpu.io import make_cyclegan_dataset
    from raygun_tpu.systems.cyclegan import CycleGAN

    src = make_cyclegan_dataset(
        str(tmp_path / "data.zarr"), shape=(96, 96),
        voxel_size_a=(90, 90), voxel_size_b=(90, 90))
    cfg = {
        "system": "CycleGAN",
        "sources": {"A": {"path": src["path"], "name": src["A"]},
                    "B": {"path": src["path"], "name": src["B"]}},
        "common_voxel_size": [90, 90], "ndims": 2, "side_length": 32,
        "batch_size": 1, "loss_type": "link", "gnet_type": "resnet",
        "gnet_kwargs": {"input_nc": 1, "output_nc": 1, "ngf": 4,
                        "n_blocks": 1, "n_downsampling": 1,
                        "padding_type": "same", "final_activation": "tanh"},
        "dnet_kwargs": {"input_nc": 1, "ngf": 4, "n_layers": 2, "kw": 3,
                        "downsampling_kw": 2},
        "g_optim_kwargs": {"lr": 1e-4}, "d_optim_kwargs": {"lr": 1e-4},
        "model_path": str(tmp_path / "models") + "/",
        "num_epochs": 2, "log_every": 1, "save_every": 2,
    }
    cpath = tmp_path / "train_conf.json"
    cpath.write_text(json.dumps(cfg))
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        system = CycleGAN(str(cpath))
        system.build_system()
        system.train()
    finally:
        os.chdir(cwd)

    render = {"config_path": "train_conf.json", "source_path": src["path"],
              "source_dataset": src["B"], "net_name": "netG2",
              "checkpoint": 2, "input_shape": 48, "output_shape": 48,
              "out_specs": {"fake": {"dtype": "uint8"}}}
    rp = tmp_path / "render.json"
    rp.write_text(json.dumps(render))
    monkeypatch.setattr(sys, "argv", ["raygun-predict", str(rp)])
    try:
        predict_cli.main()
    finally:
        os.chdir(cwd)
    out_name = f"{src['B']}_netG2_2"
    fake = open_ds(str(tmp_path / "data.zarr"), out_name).read()
    assert fake.dtype == np.uint8 and fake.ndim == 2 and fake.size > 0


def test_cyclegan_section_render_2d_in_3d(tmp_path, monkeypatch):
    """A 2D generator rendered over a 3D volume section-wise through the
    predict CLI (reference render_eval0: (1, s, s) daisy blocks)."""
    from raygun_tpu.cli import predict as predict_cli
    from raygun_tpu.core.roi import Roi
    from raygun_tpu.io import make_cyclegan_dataset
    from raygun_tpu.io.volume import prepare_ds
    from raygun_tpu.systems.cyclegan import CycleGAN

    src = make_cyclegan_dataset(
        str(tmp_path / "data.zarr"), shape=(96, 96),
        voxel_size_a=(90, 90), voxel_size_b=(90, 90))
    cfg = {
        "system": "CycleGAN",
        "sources": {"A": {"path": src["path"], "name": src["A"]},
                    "B": {"path": src["path"], "name": src["B"]}},
        "common_voxel_size": [90, 90], "ndims": 2, "side_length": 32,
        "batch_size": 1, "loss_type": "link", "gnet_type": "resnet",
        "gnet_kwargs": {"input_nc": 1, "output_nc": 1, "ngf": 4,
                        "n_blocks": 1, "n_downsampling": 1,
                        "padding_type": "same", "final_activation": "tanh"},
        "dnet_kwargs": {"input_nc": 1, "ngf": 4, "n_layers": 2, "kw": 3,
                        "downsampling_kw": 2},
        "g_optim_kwargs": {"lr": 1e-4}, "d_optim_kwargs": {"lr": 1e-4},
        "model_path": str(tmp_path / "models") + "/",
        "num_epochs": 2, "log_every": 1, "save_every": 2,
    }
    cpath = tmp_path / "train_conf.json"
    cpath.write_text(json.dumps(cfg))
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        system = CycleGAN(str(cpath))
        system.build_system()
        system.train()
    finally:
        os.chdir(cwd)

    # 3D raw stack (z sections)
    rng = np.random.default_rng(0)
    vol3 = rng.integers(0, 255, (4, 64, 64)).astype(np.uint8)
    roi3 = Roi((0, 0, 0), (4 * 90, 64 * 90, 64 * 90))
    prepare_ds(str(tmp_path / "stack.zarr"), "raw", roi3, (90, 90, 90),
               np.uint8).write(roi3, vol3)

    render = {"config_path": "train_conf.json",
              "source_path": str(tmp_path / "stack.zarr"),
              "source_dataset": "raw", "net_name": "netG2",
              "checkpoint": 2, "input_shape": 48, "output_shape": 48,
              "ndims": 2,
              "out_specs": {"fake": {"dtype": "uint8"}}}
    rp = tmp_path / "render3d.json"
    rp.write_text(json.dumps(render))
    monkeypatch.setattr(sys, "argv", ["raygun-predict", str(rp)])
    try:
        predict_cli.main()
    finally:
        os.chdir(cwd)
    fake = open_ds(str(tmp_path / "stack.zarr"), "raw_netG2_2").read()
    assert fake.ndim == 3 and fake.shape[0] == 4 and fake.size > 0


def test_cyclegan_section_render_sharded_matches_blockwise(tmp_path, monkeypatch):
    """2D-in-3D sectionwise rendering ON THE MESH (VERDICT r2 #6): z
    sections shard across devices (no halo on z; in-plane context via the
    grown read ROI), seam-equal to the blockwise section path. Replaces the
    reference's 32-worker 2D farm (render_eval0_netG2.json)."""
    from raygun_tpu.cli import predict as predict_cli
    from raygun_tpu.core.roi import Roi
    from raygun_tpu.io import make_cyclegan_dataset
    from raygun_tpu.io.volume import prepare_ds
    from raygun_tpu.systems.cyclegan import CycleGAN

    src = make_cyclegan_dataset(
        str(tmp_path / "data.zarr"), shape=(96, 96),
        voxel_size_a=(90, 90), voxel_size_b=(90, 90))
    cfg = {
        "system": "CycleGAN",
        "sources": {"A": {"path": src["path"], "name": src["A"]},
                    "B": {"path": src["path"], "name": src["B"]}},
        "common_voxel_size": [90, 90], "ndims": 2, "side_length": 48,
        "batch_size": 1, "loss_type": "link", "gnet_type": "resnet",
        # VALID padding: exact seam math so blockwise == sharded bytewise
        "gnet_kwargs": {"input_nc": 1, "output_nc": 1, "ngf": 4,
                        "n_blocks": 1, "n_downsampling": 0,
                        "padding_type": "valid", "final_activation": "tanh"},
        "dnet_kwargs": {"input_nc": 1, "ngf": 4, "n_layers": 2, "kw": 3,
                        "downsampling_kw": 2},
        "g_optim_kwargs": {"lr": 1e-4}, "d_optim_kwargs": {"lr": 1e-4},
        "model_path": str(tmp_path / "models") + "/",
        "num_epochs": 2, "log_every": 1, "save_every": 2,
    }
    cpath = tmp_path / "train_conf.json"
    cpath.write_text(json.dumps(cfg))
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        system = CycleGAN(str(cpath))
        system.build_system()
        system.train()
    finally:
        os.chdir(cwd)

    rng = np.random.default_rng(0)
    vol3 = rng.integers(0, 255, (4, 64, 64)).astype(np.uint8)
    roi3 = Roi((0, 0, 0), (4 * 90, 64 * 90, 64 * 90))
    prepare_ds(str(tmp_path / "stack.zarr"), "raw", roi3, (90, 90, 90),
               np.uint8).write(roi3, vol3)

    base = {"config_path": "train_conf.json",
            "source_path": str(tmp_path / "stack.zarr"),
            "source_dataset": "raw", "net_name": "netG2",
            "checkpoint": 2, "input_shape": 48, "output_shape": 32,
            "ndims": 2, "out_specs": {"fake": {"dtype": "uint8"}}}
    for suffix, extra in (
        ("bw", {}),
        ("sh", {"sharded": [4, 1, 1]}),
    ):
        render = dict(base, output_ds=[f"fake_{suffix}"], **extra)
        rp = tmp_path / f"render_{suffix}.json"
        rp.write_text(json.dumps(render))
        monkeypatch.setattr(sys, "argv", ["raygun-predict", str(rp)])
        try:
            predict_cli.main()
        finally:
            os.chdir(cwd)

    bw = open_ds(str(tmp_path / "stack.zarr"), "fake_bw").read()
    sh = open_ds(str(tmp_path / "stack.zarr"), "fake_sh").read()
    assert bw.shape == sh.shape and bw.shape[0] == 4
    # identical math on different tile shapes: fp32 reassociation can move
    # values across a uint8 rounding boundary by exactly one level
    diff = np.abs(sh.astype(np.int16) - bw.astype(np.int16))
    assert diff.max() <= 1, diff.max()
    assert (diff == 0).mean() > 0.8
