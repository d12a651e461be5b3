"""Config system: commented JSON + inheritance + safe expressions.

Capability parity with the reference's ``read_config`` (reference
``src/raygun/read_config.py:30-95``): JSON with ``//`` and ``/* */`` comments,
multi-level ``include_config`` inheritance (child wins), ``$working_dir``
substitution, and ``#expr#`` embedded expressions.

Two deliberate departures from the reference (documented defects, SURVEY
§2.4): comments are stripped by a small built-in minifier (no jsmin dep), and
``#expr#`` strings are evaluated by a *whitelisted AST interpreter* rather
than raw ``eval`` — configs can reference dtypes, numpy helpers, and
``partial`` but cannot execute arbitrary code.
"""

from __future__ import annotations

import ast
import json
import math
import operator
import os
from functools import partial
from typing import Any, Dict, Optional

import numpy as np


def strip_json_comments(text: str) -> str:
    """Remove // line comments and /* */ block comments outside strings."""
    out = []
    i, n = 0, len(text)
    in_string = False
    while i < n:
        c = text[i]
        if in_string:
            out.append(c)
            if c == "\\" and i + 1 < n:
                out.append(text[i + 1])
                i += 2
                continue
            if c == '"':
                in_string = False
            i += 1
            continue
        if c == '"':
            in_string = True
            out.append(c)
            i += 1
            continue
        if c == "/" and i + 1 < n and text[i + 1] == "/":
            while i < n and text[i] != "\n":
                i += 1
            continue
        if c == "/" and i + 1 < n and text[i + 1] == "*":
            i += 2
            while i + 1 < n and not (text[i] == "*" and text[i + 1] == "/"):
                i += 1
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _strip_trailing_commas(text: str) -> str:
    """Remove trailing commas before } or ] outside strings (lenient JSON)."""
    out = []
    i, n = 0, len(text)
    in_string = False
    while i < n:
        c = text[i]
        if in_string:
            out.append(c)
            if c == "\\" and i + 1 < n:
                out.append(text[i + 1])
                i += 2
                continue
            if c == '"':
                in_string = False
            i += 1
            continue
        if c == '"':
            in_string = True
            out.append(c)
            i += 1
            continue
        if c == ",":
            j = i + 1
            while j < n and text[j] in " \t\r\n":
                j += 1
            if j < n and text[j] in "}]":
                i += 1
                continue
        out.append(c)
        i += 1
    return "".join(out)


# ---------------------------------------------------------------------------
# Safe expression evaluation for "#...#" config strings
# ---------------------------------------------------------------------------

_ALLOWED_BINOPS = {
    ast.Add: operator.add,
    ast.Sub: operator.sub,
    ast.Mult: operator.mul,
    ast.Div: operator.truediv,
    ast.FloorDiv: operator.floordiv,
    ast.Mod: operator.mod,
    ast.Pow: operator.pow,
}
_ALLOWED_UNARY = {ast.USub: operator.neg, ast.UAdd: operator.pos, ast.Not: operator.not_}


def _default_namespace() -> Dict[str, Any]:
    import jax.numpy as jnp

    ns: Dict[str, Any] = {
        "np": np,
        "jnp": jnp,
        "math": math,
        "partial": partial,
        "True": True,
        "False": False,
        "None": None,
        "float32": np.float32,
        "uint8": np.uint8,
        "int64": np.int64,
        "bfloat16": jnp.bfloat16,
    }
    return ns


class SafeEvaluator(ast.NodeVisitor):
    """Evaluate a restricted expression AST: literals, names from the
    namespace, attribute access, calls, indexing, arithmetic, tuples/lists/
    dicts. No lambdas, comprehensions, imports, or dunder access."""

    def __init__(self, namespace: Dict[str, Any]):
        self.ns = namespace

    def eval(self, expr: str) -> Any:
        tree = ast.parse(expr, mode="eval")
        return self.visit(tree.body)

    def generic_visit(self, node):
        raise ValueError(f"disallowed expression element: {type(node).__name__}")

    def visit_Constant(self, node):
        return node.value

    def visit_Name(self, node):
        if node.id.startswith("_"):
            raise ValueError(f"disallowed name {node.id}")
        if node.id not in self.ns:
            raise NameError(f"unknown config name {node.id!r}")
        return self.ns[node.id]

    def visit_Attribute(self, node):
        if node.attr.startswith("_"):
            raise ValueError(f"disallowed attribute {node.attr}")
        return getattr(self.visit(node.value), node.attr)

    def visit_Call(self, node):
        fn = self.visit(node.func)
        args = [self.visit(a) for a in node.args]
        kwargs = {kw.arg: self.visit(kw.value) for kw in node.keywords}
        return fn(*args, **kwargs)

    def visit_BinOp(self, node):
        op = _ALLOWED_BINOPS.get(type(node.op))
        if op is None:
            raise ValueError(f"disallowed operator {type(node.op).__name__}")
        return op(self.visit(node.left), self.visit(node.right))

    def visit_UnaryOp(self, node):
        op = _ALLOWED_UNARY.get(type(node.op))
        if op is None:
            raise ValueError(f"disallowed operator {type(node.op).__name__}")
        return op(self.visit(node.operand))

    def visit_Tuple(self, node):
        return tuple(self.visit(e) for e in node.elts)

    def visit_List(self, node):
        return [self.visit(e) for e in node.elts]

    def visit_Dict(self, node):
        return {self.visit(k): self.visit(v) for k, v in zip(node.keys, node.values)}

    def visit_Subscript(self, node):
        return self.visit(node.value)[self.visit(node.slice)]

    def visit_Compare(self, node):
        left = self.visit(node.left)
        for op, comp in zip(node.ops, node.comparators):
            right = self.visit(comp)
            fn = {
                ast.Eq: operator.eq,
                ast.NotEq: operator.ne,
                ast.Lt: operator.lt,
                ast.LtE: operator.le,
                ast.Gt: operator.gt,
                ast.GtE: operator.ge,
            }.get(type(op))
            if fn is None:
                raise ValueError("disallowed comparison")
            if not fn(left, right):
                return False
            left = right
        return True


def eval_expr(expr: str, namespace: Optional[Dict[str, Any]] = None) -> Any:
    ns = _default_namespace()
    if namespace:
        ns.update(namespace)
    return SafeEvaluator(ns).eval(expr)


def eval_args(config: Any, namespace: Optional[Dict[str, Any]] = None) -> Any:
    """Recursively resolve '#expr#' strings in a config tree (parity with
    reference ``read_config.py:30-61``)."""
    if isinstance(config, dict):
        return {k: eval_args(v, namespace) for k, v in config.items()}
    if isinstance(config, list):
        return [eval_args(v, namespace) for v in config]
    if isinstance(config, str) and len(config) >= 2 and config.startswith("#") and config.endswith("#"):
        return eval_expr(config[1:-1], namespace)
    return config


def _substitute(config: Any, subs: Dict[str, str]) -> Any:
    if isinstance(config, dict):
        return {k: _substitute(v, subs) for k, v in config.items()}
    if isinstance(config, list):
        return [_substitute(v, subs) for v in config]
    if isinstance(config, str):
        for key, val in subs.items():
            config = config.replace(key, val)
        return config
    return config


def merge_dicts(base: dict, override: dict) -> dict:
    """Deep merge: override wins; nested dicts merge recursively (parity with
    reference ``utils.py:90-101``)."""
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_dicts(out[k], v)
        else:
            out[k] = v
    return out


def read_config(path: str, subs: Optional[Dict[str, str]] = None) -> dict:
    """Load a commented-JSON config with ``include_config`` inheritance and
    ``$working_dir`` substitution (parity with reference
    ``read_config.py:64-95``). ``#expr#`` strings are left as strings here;
    call :func:`eval_args` on the fields that should be resolved."""
    path = os.path.abspath(os.path.expanduser(str(path)))
    if os.path.isdir(path):
        raise IsADirectoryError(path)
    with open(path) as f:
        raw = f.read()
    text = _strip_trailing_commas(strip_json_comments(raw))
    config = json.loads(text)

    working_dir = os.path.dirname(path)
    all_subs = {"$working_dir": working_dir}
    if subs:
        all_subs.update(subs)
    config = _substitute(config, all_subs)

    include = config.pop("include_config", None)
    if include is not None:
        if not os.path.isabs(include):
            include = os.path.join(working_dir, include)
        parent = read_config(include, subs)
        config = merge_dicts(parent, config)
    return config


def to_json(config: dict, path: str, **kwargs) -> None:
    def default(o):
        if isinstance(o, np.ndarray):
            return o.tolist()
        if isinstance(o, (np.integer,)):
            return int(o)
        if isinstance(o, (np.floating,)):
            return float(o)
        if isinstance(o, type):
            return f"#{o.__module__}.{o.__name__}#"
        return str(o)

    with open(path, "w") as f:
        json.dump(config, f, default=default, **kwargs)
