"""webknossos utils, figures, inspect_tests, core utils coverage."""

import json
import os

import numpy as np
import pytest

from raygun_tpu.core import (
    Coordinate, Roi, calc_max_padding, get_config_name, load_json_file,
    passing_locals, serialize,
)
from raygun_tpu.eval import (
    batch_show, collect_metric_distributions, label2rgb,
    significance_matrices,
)
from raygun_tpu.io import prepare_ds
from raygun_tpu.webknossos_utils import mask_seg, parse_wkw_header
from raygun_tpu.webknossos_utils.wk import NetworkUnavailableError, get_wk_mask


class TestCoreUtils:
    def test_passing_locals(self):
        def ctor(a, b, **kwargs):
            return passing_locals(locals())

        out = ctor(1, 2, c=3)
        assert out == {"a": 1, "b": 2, "c": 3}

    def test_serialize_roundtrip(self):
        out = serialize({"arr": np.arange(3), "cls": np.float32, "n": np.int64(5)})
        assert out["arr"] == [0, 1, 2]
        assert out["cls"] == "#numpy.float32#"
        assert out["n"] == 5

    def test_load_json_file_with_comments(self, tmp_path):
        p = tmp_path / "c.json"
        p.write_text('{\n// hi\n"a": 1}')
        assert load_json_file(str(p)) == {"a": 1}

    def test_get_config_name(self):
        assert get_config_name("/base/run1/seed3/conf.json", "/base") == "run1_seed3"


class TestWebknossos:
    def test_network_gated(self):
        with pytest.raises(NetworkUnavailableError):
            get_wk_mask("abc", "/tmp/x")

    def test_wkw_header(self):
        hdr = bytes([ord("W"), ord("K"), ord("W"), 1, (5 << 4) | 5, 1, 4, 8])
        meta = parse_wkw_header(hdr)
        assert meta["block_len"] == 32 and meta["file_len"] == 32
        assert meta["block_type"] == "raw"
        assert meta["dtype"] == np.uint64

    def test_mask_seg(self, tmp_path):
        path = str(tmp_path / "v.zarr")
        vx = Coordinate(10, 10, 10)
        roi = Roi((0, 0, 0), (160, 160, 160))
        seg = prepare_ds(path, "seg", roi, vx, np.uint64, delete=True)
        seg.write(roi, np.ones((16, 16, 16), np.uint64) * 7)
        mask = prepare_ds(path, "mask", roi, vx, np.uint8, delete=True)
        m = np.zeros((16, 16, 16), np.uint8)
        m[:8] = 1
        mask.write(roi, m)
        out = mask_seg(path, "seg", "mask", block_size=(8, 8, 8))
        data = out.read()
        assert (data[:8] == 7).all() and (data[8:] == 0).all()


class TestFigures:
    def test_label2rgb(self):
        labels = np.zeros((8, 8), np.int32)
        labels[:4] = 3
        img = np.random.default_rng(0).random((8, 8))
        rgb = label2rgb(labels, img)
        assert rgb.shape == (8, 8, 3)
        assert rgb.min() >= 0 and rgb.max() <= 1

    def test_batch_show_saves(self, tmp_path):
        batch = {
            "real_A": np.random.default_rng(0).normal(0, 0.3, (2, 16, 16, 1)),
            "fake_B": np.random.default_rng(1).normal(0, 0.3, (2, 16, 16, 1)),
        }
        out = batch_show(batch, save_path=str(tmp_path / "b.png"))
        assert os.path.exists(out)


class TestInspectTests:
    def test_distributions_and_significance(self, tmp_path):
        for model, mu in (("m1", 0.5), ("m2", 2.0)):
            d = tmp_path / model
            d.mkdir()
            for s in range(6):
                rows = {str(k): {"nvi_split": mu + 0.01 * s, "nvi_merge": mu}
                        for k in (1000, 2000)}
                (d / f"test_eval{s}_metrics.json").write_text(json.dumps(rows))
        dists = collect_metric_distributions(str(tmp_path))
        assert set(dists) == {"m1", "m2"}
        assert len(dists["m1"]) == 12
        sig = significance_matrices(dists, tests=("ks", "mannwhitneyu"))
        assert sig["ks"]["m1"]["m2"] < 0.01  # clearly different
        assert np.isnan(sig["ks"]["m1"]["m1"])


class TestWkwDecode:
    """wkw voxel decode round-trip (reference ``wkw_seg_to_zarr.py:284-410``):
    encode a synthetic labeled cube into the wkw on-disk format (Morton-order
    blocks + voxels), zip it webknossos-style, convert to zarr, compare."""

    def test_morton_grid_is_permutation(self):
        from raygun_tpu.webknossos_utils.wk import _morton_grid

        for n in (1, 2, 4, 8):
            m = _morton_grid(n).ravel()
            assert sorted(m.tolist()) == list(range(n**3))
        # canonical z-order: (1,0,0)->1, (0,1,0)->2, (0,0,1)->4
        m = _morton_grid(2)
        assert m[1, 0, 0] == 1 and m[0, 1, 0] == 2 and m[0, 0, 1] == 4

    def test_encode_decode_roundtrip(self):
        from raygun_tpu.webknossos_utils.wk import decode_wkw_file, encode_wkw_file

        rng = np.random.default_rng(3)
        vol = rng.integers(0, 40, (1, 8, 8, 8)).astype(np.uint32)
        data = encode_wkw_file(vol, block_len=4, file_len=2)
        out = decode_wkw_file(data)
        assert out.dtype == vol.dtype
        np.testing.assert_array_equal(out, vol)

    def test_multichannel_roundtrip(self):
        from raygun_tpu.webknossos_utils.wk import decode_wkw_file, encode_wkw_file

        rng = np.random.default_rng(4)
        vol = rng.random((3, 4, 4, 4)).astype(np.float32)
        out = decode_wkw_file(encode_wkw_file(vol, block_len=4, file_len=1))
        np.testing.assert_array_equal(out, vol)

    def test_wkw_seg_to_zarr(self, tmp_path):
        import zipfile

        from raygun_tpu.io import open_ds
        from raygun_tpu.webknossos_utils.wk import encode_wkw_file, wkw_seg_to_zarr

        rng = np.random.default_rng(7)
        side = 16  # one file of 4x4x4 blocks of 4^3 voxels
        seg = rng.integers(0, 12, (side, side, side)).astype(np.uint32)
        zp = tmp_path / "annotation.zip"
        with zipfile.ZipFile(zp, "w") as z:
            z.writestr(
                "segmentation/1/z0/y0/x0.wkw",
                encode_wkw_file(seg[None], block_len=4, file_len=4),
            )
            z.writestr(
                "datasource-properties.json", json.dumps({"scale": [30, 30, 30]})
            )
        save = str(tmp_path / "out.zarr")
        ds_name = wkw_seg_to_zarr(str(zp), save, dataset_name="volumes/gt")
        vol = open_ds(save, ds_name)
        assert tuple(vol.voxel_size) == (30, 30, 30)
        got = vol.read()
        # wkw (x,y,z) -> zarr (z,y,x)
        np.testing.assert_array_equal(got, np.transpose(seg, (2, 1, 0)))


def test_inspect_tests_scatter(tmp_path):
    """inspect_tests writes the significance JSON AND the split-vs-merge
    scatter figure (reference inspect_tests.py:334+ capability)."""
    import json as _json

    from raygun_tpu.eval.inspect_tests import inspect_tests

    rng = np.random.default_rng(0)
    for model in ("model_a", "model_b"):
        d = tmp_path / model
        d.mkdir()
        for i in range(3):
            m = {
                "nvi_split": float(rng.uniform(0.1, 0.3)),
                "nvi_merge": float(rng.uniform(0.5, 0.9)),
            }
            (d / f"test_eval{i}_metrics.json").write_text(_json.dumps(m))
    result = inspect_tests({"base_folder": str(tmp_path)})
    assert set(result["distributions"]) == {"model_a", "model_b"}
    assert "ks" in result["significance"]
    assert os.path.exists(result["scatter"])
    assert os.path.getsize(result["scatter"]) > 1000


def test_inspect_logs_score_plot(tmp_path):
    """inspect_logs writes the score-curve figure alongside the bests JSON
    (reference inspect_evals plot_scores capability)."""
    import json as _json

    from raygun_tpu.eval.inspect_logs import inspect_logs

    d = tmp_path / "runA"
    d.mkdir()
    metrics = {str(it): {"nvi_split": 0.3 / (1 + it), "nvi_merge": 0.2}
               for it in (1000, 2000, 3000)}
    (d / "validation_metrics.json").write_text(_json.dumps(metrics))
    bests = inspect_logs({"base_folder": str(tmp_path)})
    assert bests
    fig = tmp_path / "model_logs_scores.png"
    assert fig.exists() and fig.stat().st_size > 1000
