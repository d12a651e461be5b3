"""Eval layer: image metrics vs closed-form cases, skeleton rasterization,
pad_eval alignment, log inspection."""

import json
import os

import numpy as np
import pytest

from raygun_tpu.core import Coordinate, Roi
from raygun_tpu.eval import (
    composite_score,
    get_score,
    image_compare,
    line_nd,
    normalized_root_mse,
    pad_eval,
    parse_nml,
    peak_signal_noise_ratio,
    pick_best,
    rand_voi,
    rasterize_skeleton,
    score_log,
    smooth,
    structural_similarity,
)
from raygun_tpu.io import prepare_ds


class TestImageMetrics:
    def test_identical(self):
        a = np.random.default_rng(0).random((16, 16)).astype(np.float32)
        assert normalized_root_mse(a, a) == 0.0
        assert structural_similarity(a, a) == pytest.approx(1.0)
        assert peak_signal_noise_ratio(a, a, data_range=1.0) == np.inf

    def test_psnr_known(self):
        a = np.zeros((8, 8), np.float32)
        b = np.full((8, 8), 0.1, np.float32)
        # mse = 0.01, data_range=1 -> psnr = 20
        assert peak_signal_noise_ratio(a, b, data_range=1.0) == pytest.approx(20.0)

    def test_nrmse_euclidean(self):
        a = np.ones((4, 4), np.float32) * 2
        b = np.ones((4, 4), np.float32)
        # rmse=1, sqrt(mean(a^2))=2 -> 0.5
        assert normalized_root_mse(a, b) == pytest.approx(0.5)

    def test_ssim_degrades_with_noise(self):
        rng = np.random.default_rng(1)
        a = rng.random((32, 32)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.2, a.shape), 0, 1).astype(np.float32)
        s = structural_similarity(a, b, data_range=1.0)
        assert 0.0 < s < 0.95

    def test_image_compare_rois(self, tmp_path):
        vx = Coordinate(10, 10)
        data = np.random.default_rng(2).random((16, 16)).astype(np.float32)
        p = str(tmp_path / "x.zarr")
        v1 = prepare_ds(p, "a", Roi((0, 0), (160, 160)), vx, np.float32, delete=True)
        v1.write(v1.roi, data)
        # target shifted: overlap region is data[4:, :] vs data[:12, :]
        v2 = prepare_ds(p, "b", Roi((40, 0), (160, 160)), vx, np.float32, delete=True)
        v2.write(v2.roi, data)
        res = image_compare(v1, v2)
        assert set(res) == {
            "normalized_root_mse", "peak_signal_noise_ratio", "structural_similarity"
        }

    def test_image_compare_mixed_voxel_size(self, tmp_path):
        """A render stored at the coarse acquisition grid compares against a
        fine-grid target: the ROI snaps to both grids and the coarse image
        is nearest-upsampled (capability beyond the reference, which assumes
        equal voxel sizes)."""
        p = str(tmp_path / "x.zarr")
        g = np.linspace(0, 1, 24, dtype=np.float32)
        fine = (g[:, None] + g[None, :]) / 2  # smooth ramp
        v_fine = prepare_ds(p, "fine", Roi((0, 0), (720, 720)),
                            Coordinate(30, 30), np.float32, delete=True)
        v_fine.write(v_fine.roi, fine)
        # coarse volume: 3x the voxel size, nearest-downsampled content
        v_coarse = prepare_ds(p, "coarse", Roi((0, 0), (2160, 2160)),
                              Coordinate(90, 90), np.float32, delete=True)
        v_coarse.write(v_coarse.roi, np.zeros((24, 24), np.float32))
        coarse_overlap = fine[::3, ::3]  # 8x8 voxels over the 720^2 overlap
        v_coarse.write(Roi((0, 0), (720, 720)), coarse_overlap)
        res = image_compare(v_coarse, v_fine)
        # nearest-upsampled smooth ramp stays close to the fine original
        assert np.isfinite(res["peak_signal_noise_ratio"])
        assert res["normalized_root_mse"] < 0.1
        # identical content at matching grids stays a perfect match
        v_same = prepare_ds(p, "same", Roi((0, 0), (720, 720)),
                            Coordinate(90, 90), np.float32, delete=True)
        v_same.write(v_same.roi, coarse_overlap)
        res2 = image_compare(v_same, v_coarse, roi=Roi((0, 0), (720, 720)))
        assert res2["normalized_root_mse"] == 0.0


class TestSkeleton:
    def test_line_nd_diagonal(self):
        coords = line_nd((0, 0, 0), (4, 4, 4))
        assert len(coords[0]) == 5
        assert coords[0][-1] == 4 and coords[2][-1] == 4

    def test_parse_nml_and_rasterize(self, tmp_path):
        nml = b"""<?xml version="1.0"?>
        <things>
          <thing id="3">
            <nodes>
              <node id="1" x="1" y="2" z="0"/>
              <node id="2" x="6" y="2" z="0"/>
            </nodes>
            <edges><edge source="1" target="2"/></edges>
          </thing>
        </things>"""
        trees = parse_nml(nml)
        assert 3 in trees and len(trees[3]) == 1
        nml_path = tmp_path / "skel.nml"
        nml_path.write_bytes(nml)
        config = {
            "file": str(tmp_path / "skel.zarr"),
            "skeleton_path": str(nml_path),
            "shape": [4, 8, 8],
            "voxel_size": [1, 1, 1],
        }
        img = rasterize_skeleton(config)
        # edge from xyz (1,2,0) to (6,2,0) -> zyx (0,2,1)..(0,2,6)
        assert (img[0, 2, 1:7] == 3).all()
        assert img.sum() == 3 * 6
        # cached on second call
        img2 = rasterize_skeleton(config)
        assert np.array_equal(img, img2)


class TestValidationHelpers:
    def test_pad_eval_alignment(self):
        gt = np.zeros((20, 20, 20), np.uint64)
        gt[:10] = 1
        gt[10:] = 2
        seg = gt[2:-2, 2:-2, 2:-2].copy()
        m = pad_eval(seg, gt)
        assert m["voi_split"] == pytest.approx(0.0, abs=1e-9)

    def test_get_score(self):
        assert get_score({"nvi_split": 0.1, "nvi_merge": 0.2}) == pytest.approx(0.3)
        assert get_score({"nvi_split": float("nan"), "nvi_merge": 0.2}) == 999


class TestInspect:
    def test_smooth_and_scores(self):
        vals = [1.0] * 10 + [0.0] * 10
        sm = smooth(vals, alpha=0.5)
        assert sm[0] == 1.0 and sm[-1] < 0.01
        log = {"a": {i: float(i) for i in range(5)},
               "b": {i: 1.0 for i in range(5)}}
        scores = score_log(log, ["a", "b"], alpha=0.0)
        assert scores[0] == pytest.approx(1.0)
        assert scores[4] == pytest.approx(5.0)
        step, val = pick_best(scores)
        assert step == 0 and val == pytest.approx(1.0)

    def test_composite_geomean(self):
        assert composite_score({"x": 4.0, "y": 1.0}, ["x", "y"], "geomean") == (
            pytest.approx(2.0)
        )
