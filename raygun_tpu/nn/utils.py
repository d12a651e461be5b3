"""Network utilities: functional weight init, param counting, shape probes.

Parity with reference ``src/raygun/torch/networks/utils.py`` (init_weights
normal/xavier/kaiming/orthogonal) re-cast functionally: instead of mutating
modules in place, :func:`init_weights` maps over a flax params pytree and
re-samples conv/dense kernels from the requested distribution (biases → 0),
returning a new pytree.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def _fans(shape: Tuple[int, ...]):
    # flax conv kernel layout: (*window, in_c, out_c); dense: (in, out)
    if len(shape) < 2:
        return 1, 1
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    fan_in = shape[-2] * receptive
    fan_out = shape[-1] * receptive
    return fan_in, fan_out


def init_weights(params, key, init_type: str = "normal", init_gain: float = 0.02):
    """Re-initialize all kernel leaves; zero all biases. Returns new pytree.

    Schemes (reference ``networks/utils.py:45-81``):
      normal      — N(0, init_gain)
      xavier      — xavier-normal with gain
      kaiming     — kaiming-normal fan_in (relu)
      orthogonal  — orthogonal with gain
    """
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = jax.random.split(key, len(leaves))
    new_leaves = []
    for (path, leaf), k in zip(leaves, keys):
        name = str(path[-1]).strip("'[].")
        if "kernel" in name and leaf.ndim >= 2:
            shape = leaf.shape
            fan_in, fan_out = _fans(shape)
            if init_type == "normal":
                new = init_gain * jax.random.normal(k, shape, leaf.dtype)
            elif init_type == "xavier":
                std = init_gain * math.sqrt(2.0 / (fan_in + fan_out))
                new = std * jax.random.normal(k, shape, leaf.dtype)
            elif init_type == "kaiming":
                std = math.sqrt(2.0 / fan_in)
                new = std * jax.random.normal(k, shape, leaf.dtype)
            elif init_type == "orthogonal":
                flat = jax.random.normal(k, (int(np.prod(shape[:-1])), shape[-1]), jnp.float32)
                q, r = jnp.linalg.qr(flat)
                d = jnp.sign(jnp.diagonal(r))
                q = q * d
                new = (init_gain * q.reshape(shape)).astype(leaf.dtype)
            else:
                raise NotImplementedError(f"initialization method [{init_type}] is not implemented")
            new_leaves.append(new)
        elif "bias" in name:
            new_leaves.append(jnp.zeros_like(leaf))
        elif "scale" in name:  # norm affine weights: N(1, gain) per reference
            new_leaves.append(jnp.ones_like(leaf))
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, [l for l in new_leaves])


def probe_output_shape(model, params, input_shape, rngs: Optional[dict] = None, **kwargs):
    """Run a zeros tensor through the net under eval_shape to learn the valid
    output size without FLOPs (replaces the reference's zeros forward probe,
    ``BaseSystem.py:244-255``)."""
    x = jnp.zeros(input_shape, jnp.float32)

    def fwd(p, x):
        return model.apply({"params": p}, x, train=False, rngs=rngs)

    out = jax.eval_shape(fwd, params, x)
    return jax.tree_util.tree_map(lambda o: o.shape, out)


def valid_context(input_spatial: Sequence[int], output_spatial: Sequence[int]):
    """Per-side context shaved by valid convolutions: (in - out) // 2
    (reference ``predict.py:92-97``)."""
    return tuple((i - o) // 2 for i, o in zip(input_spatial, output_spatial))
