"""Device-mesh helpers.

The reference's distributed axes (SURVEY §2.3): data-loading workers, spatial
blockwise fan-out (daisy, TCP), and job farms. On TPU those become one
``jax.sharding.Mesh``: a ``block`` axis for spatial block parallelism (the
daisy replacement) and an optional ``batch`` axis for data parallelism. All
collectives compile onto ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("block",),
    devices=None,
) -> Mesh:
    """Build a mesh over available devices. Default: 1-D 'block' axis over
    all devices (spatial block parallelism)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = (n,)
    assert int(np.prod(axis_sizes)) == n, (
        f"mesh {axis_sizes} does not match {n} devices"
    )
    dev_array = np.array(devices).reshape(axis_sizes)
    return Mesh(dev_array, axis_names)


def spec(mesh: Mesh, *names) -> NamedSharding:
    return NamedSharding(mesh, P(*names))
