import json
import os

import numpy as np
import pytest

from raygun_tpu.core import eval_args, eval_expr, merge_dicts, read_config
from raygun_tpu.core.config import strip_json_comments


def test_strip_comments():
    text = '{\n // a comment\n "a": 1, /* block */ "b": "http://x//y"\n}'
    out = json.loads(strip_json_comments(text))
    assert out == {"a": 1, "b": "http://x//y"}


def test_read_config_include_and_working_dir(tmp_path):
    parent = tmp_path / "parent.json"
    parent.write_text('{"a": 1, "b": {"x": 1, "y": 2}, "dir": "$working_dir"}')
    child = tmp_path / "child.json"
    child.write_text(
        '{\n// child overrides\n"include_config": "parent.json", "b": {"y": 3}, "c": 4,}'
    )
    cfg = read_config(str(child))
    assert cfg["a"] == 1
    assert cfg["b"] == {"x": 1, "y": 3}
    assert cfg["c"] == 4
    assert cfg["dir"] == str(tmp_path)


def test_eval_expr_whitelist():
    assert eval_expr("np.float32") is np.float32
    assert eval_expr("2 ** 10") == 1024
    assert eval_expr("[1, 2, 3][1]") == 2
    p = eval_expr("partial(np.sum, axis=0)")
    assert p(np.ones((2, 3))).shape == (3,)
    with pytest.raises(Exception):
        eval_expr("__import__('os')")
    with pytest.raises(Exception):
        eval_expr("open('/etc/passwd')")
    with pytest.raises(Exception):
        eval_expr("np.__loader__")


def test_eval_args_recursive():
    cfg = {"dtype": "#np.float32#", "nested": [{"v": "#1 + 1#"}], "plain": "#notexpr"}
    out = eval_args(cfg)
    assert out["dtype"] is np.float32
    assert out["nested"][0]["v"] == 2
    assert out["plain"] == "#notexpr"


def test_merge_dicts_deep():
    a = {"x": {"y": 1, "z": 2}, "k": 1}
    b = {"x": {"z": 3}, "m": 4}
    assert merge_dicts(a, b) == {"x": {"y": 1, "z": 3}, "k": 1, "m": 4}
