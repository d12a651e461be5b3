"""webknossos ground-truth ingest utilities.

Capability parity with reference ``src/raygun/webknossos_utils/``:
``wkw_seg_to_zarr`` (annotation download → wkw voxels → zarr,
``wkw_seg_to_zarr.py:284-410``), skeleton download (``:20-96``),
``get_wk_mask`` (``:146``), ``make_cutout``/``upload_raw_to_webknossos``
(``make_cutout.py:13-100``), and ``mask_seg`` blockwise multiply
(``mask_seg.py:6-89``).

Network-dependent operations (webknossos API) require a ``wk_token`` and
egress; this environment has neither, so those paths raise a clear error
until credentials/network are available. The wkw block-format reader is
implemented natively (header parse + raw/uncompressed blocks; lz4-compressed
wkw needs the lz4 module, gated).
"""

from __future__ import annotations

import json
import logging
import os
import struct
import zipfile
from typing import Optional, Tuple

import numpy as np

from ..core.roi import Coordinate, Roi
from ..io.volume import open_ds, prepare_ds

logger = logging.getLogger(__name__)


class NetworkUnavailableError(RuntimeError):
    pass


def _require_wk(kwargs):
    token = kwargs.get("wk_token") or os.environ.get("WK_TOKEN")
    if not token:
        raise NetworkUnavailableError(
            "webknossos access needs a wk_token and network egress; "
            "set WK_TOKEN or pass wk_token=..."
        )
    try:
        import webknossos  # noqa: F401
    except ImportError as e:
        raise NetworkUnavailableError(
            "the webknossos package is not installed in this environment"
        ) from e
    return token


# ---------------------------------------------------------------------------
# wkw block format (native reader for uncompressed files)
# ---------------------------------------------------------------------------

WKW_MAGIC = b"WKW"

_WKW_DTYPES = {1: np.uint8, 2: np.uint16, 3: np.uint32, 4: np.uint64,
               5: np.float32, 6: np.float64, 7: np.int8, 8: np.int16,
               9: np.int32, 10: np.int64}
_WKW_DTYPE_CODES = {np.dtype(v): k for k, v in _WKW_DTYPES.items()}


def _spread_bits_3(v: np.ndarray) -> np.ndarray:
    """Spread the low 21 bits of each value so bit i lands at bit 3i
    (the x-component of a 3D Morton code)."""
    v = v.astype(np.uint64) & np.uint64(0x1FFFFF)
    v = (v | (v << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
    v = (v | (v << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
    v = (v | (v << np.uint64(2))) & np.uint64(0x1249249249249249)
    return v


def _morton_grid(n: int) -> np.ndarray:
    """(n, n, n) array: Morton index of each (x, y, z) voxel/block coordinate
    (x fastest — wkw stores both blocks-within-file and voxels-within-block
    in this z-order)."""
    c = np.arange(n, dtype=np.uint64)
    x, y, z = np.meshgrid(c, c, c, indexing="ij")
    return (
        _spread_bits_3(x)
        | (_spread_bits_3(y) << np.uint64(1))
        | (_spread_bits_3(z) << np.uint64(2))
    ).astype(np.int64)


def parse_wkw_header(data: bytes) -> dict:
    """Parse a wkw file header (magic 'WKW', version, per-dim block/ file
    lengths as log2, block type, voxel dtype, channels)."""
    if data[:3] != WKW_MAGIC:
        raise ValueError("not a wkw file (bad magic)")
    version = data[3]
    sides = data[4]
    block_len_log2 = sides & 0x0F
    file_len_log2 = sides >> 4
    block_type = data[5]
    voxel_type = data[6]
    voxel_size = data[7]
    dtype = np.dtype(_WKW_DTYPES[voxel_type])
    return {
        "version": version,
        "block_len": 1 << block_len_log2,
        "file_len": 1 << file_len_log2,
        "block_type": {1: "raw", 2: "lz4", 3: "lz4hc"}.get(block_type, block_type),
        "dtype": dtype,
        "voxel_size_bytes": voxel_size,
        "num_channels": voxel_size // dtype.itemsize,
    }


def decode_wkw_file(data: bytes) -> np.ndarray:
    """Decode one ``.wkw`` file into a dense ``(C, fx, fy, fz)`` array where
    ``f = file_len · block_len`` (parity with the reference's ``wkw``-package
    reads in ``wkw_seg_to_zarr.py:284-410``, re-implemented from the
    webknossos-wrap on-disk format): 8-byte header; blocks laid out in
    Morton order over the file's block grid; voxels in Morton order within
    each block; channels interleaved per voxel; blocks raw or lz4."""
    h = parse_wkw_header(data[:8])
    bl, fl = h["block_len"], h["file_len"]
    c = h["num_channels"]
    dtype = h["dtype"]
    block_voxels = bl**3
    block_bytes = block_voxels * h["voxel_size_bytes"]
    n_blocks = fl**3

    if h["block_type"] == "raw":
        def block_payload(i):
            off = 8 + i * block_bytes
            return data[off: off + block_bytes]
    elif h["block_type"] in ("lz4", "lz4hc"):
        try:
            import lz4.block as lz4block
        except ImportError as e:  # pragma: no cover - lz4 not in this image
            raise NotImplementedError(
                "lz4-compressed wkw needs the lz4 package"
            ) from e
        jumps = np.frombuffer(data, dtype="<u8", count=n_blocks + 1, offset=8)

        def block_payload(i):
            return lz4block.decompress(
                data[jumps[i]: jumps[i + 1]], uncompressed_size=block_bytes
            )
    else:
        raise NotImplementedError(f"wkw block type {h['block_type']!r}")

    side = fl * bl
    out = np.empty((c, side, side, side), dtype)
    voxel_morton = _morton_grid(bl)  # (bl,bl,bl) -> morton index
    block_morton = _morton_grid(fl)
    for bx in range(fl):
        for by in range(fl):
            for bz in range(fl):
                i = int(block_morton[bx, by, bz])
                flat = np.frombuffer(block_payload(i), dtype=dtype)
                vox = flat.reshape(block_voxels, c)  # morton-major, interleaved
                block = vox[voxel_morton]  # (bl,bl,bl,C)
                out[:, bx * bl:(bx + 1) * bl, by * bl:(by + 1) * bl,
                    bz * bl:(bz + 1) * bl] = np.moveaxis(block, -1, 0)
    return out


def encode_wkw_file(volume: np.ndarray, block_len: int = 32,
                    file_len: Optional[int] = None) -> bytes:
    """Encode ``(C, x, y, z)`` (or ``(x, y, z)``) into one raw-block ``.wkw``
    file — the writer half used for synthetic fixtures and local round-trips
    (the reference uploads via the webknossos API instead)."""
    if volume.ndim == 3:
        volume = volume[None]
    c, sx, sy, sz = volume.shape
    assert sx == sy == sz, "wkw files are cubic"
    if file_len is None:
        file_len = max(1, sx // block_len)
    side = file_len * block_len
    assert side == sx, f"volume side {sx} != file_len*block_len {side}"
    dtype = np.dtype(volume.dtype)
    voxel_size = dtype.itemsize * c
    header = WKW_MAGIC + bytes([
        1,
        (int(np.log2(file_len)) << 4) | int(np.log2(block_len)),
        1,  # raw
        _WKW_DTYPE_CODES[dtype],
        voxel_size,
    ])
    voxel_morton = _morton_grid(block_len)
    block_morton = _morton_grid(file_len)
    inv_vox = np.argsort(voxel_morton.ravel(order="C"))
    payload = [b""] * (file_len**3)
    for bx in range(file_len):
        for by in range(file_len):
            for bz in range(file_len):
                blk = volume[:, bx * block_len:(bx + 1) * block_len,
                             by * block_len:(by + 1) * block_len,
                             bz * block_len:(bz + 1) * block_len]
                # (C, bl, bl, bl) -> voxel-major (bl^3, C) in (x,y,z) C-order,
                # then reorder into morton sequence
                vox = np.moveaxis(blk, 0, -1).reshape(-1, blk.shape[0])
                payload[int(block_morton[bx, by, bz])] = vox[inv_vox].tobytes()
    return header + b"".join(payload)


def wkw_seg_to_zarr(
    annotation_path: str,
    save_path: str,
    dataset_name: str = "volumes/gt_labels",
    voxel_size=(1, 1, 1),
    offset=(0, 0, 0),
    **kwargs,
):
    """Convert a webknossos annotation (zip containing a wkw layer) to zarr.

    Local zips are converted without network; `annotation_id=` kwargs trigger
    a download (gated on wk_token)."""
    if not os.path.exists(annotation_path):
        _require_wk(kwargs)  # would download; no egress here
        raise NetworkUnavailableError(f"{annotation_path} not found locally")

    import re

    with zipfile.ZipFile(annotation_path) as z:
        names = [n for n in z.namelist() if n.endswith(".wkw")]
        if not names:
            raise ValueError(f"no .wkw layers in {annotation_path}")
        # voxel size from datasource-properties.json when present
        props = [n for n in z.namelist() if n.endswith("datasource-properties.json")]
        if props:
            meta = json.loads(z.read(props[0]))
            scale = meta.get("scale")
            if scale:
                voxel_size = tuple(int(round(s)) for s in scale)

        # file grid coordinates from the z{Z}/y{Y}/x{X}.wkw convention
        pat = re.compile(r"z(\d+)[/\\]y(\d+)[/\\]x(\d+)\.wkw$")
        tiles = {}
        side = None
        dtype = None
        channels = None
        for name in names:
            m = pat.search(name)
            if not m:
                continue
            fz, fy, fx = (int(g) for g in m.groups())
            arr = decode_wkw_file(z.read(name))  # (C, x, y, z)
            channels, side = arr.shape[0], arr.shape[1]
            dtype = arr.dtype
            tiles[(fx, fy, fz)] = arr
        if not tiles:
            raise ValueError(
                f"no z*/y*/x*.wkw files in {annotation_path} (got {names[:3]}...)"
            )

    nx = max(k[0] for k in tiles) + 1
    ny = max(k[1] for k in tiles) + 1
    nz = max(k[2] for k in tiles) + 1
    full = np.zeros((channels, nx * side, ny * side, nz * side), dtype)
    for (fx, fy, fz), arr in tiles.items():
        full[:, fx * side:(fx + 1) * side, fy * side:(fy + 1) * side,
             fz * side:(fz + 1) * side] = arr
    # wkw is (C, x, y, z); the zarr convention is (z, y, x) spatial
    data = np.transpose(full, (0, 3, 2, 1))
    if channels == 1:
        data = data[0]

    vx = Coordinate(voxel_size)
    nd = len(vx)
    spatial = data.shape[-nd:]
    roi = Roi(Coordinate(offset) * vx, Coordinate(spatial) * vx)
    out = prepare_ds(
        save_path, dataset_name, roi, vx, data.dtype,
        num_channels=channels if channels > 1 else None, delete=True,
    )
    out.write(roi, data)
    logger.info(
        "wkw -> zarr: %s/%s %s %s", save_path, dataset_name, data.shape, data.dtype
    )
    return dataset_name


def download_wk_skeleton(annotation_id: str, save_path: str, **kwargs):
    _require_wk(kwargs)
    raise NetworkUnavailableError("no egress in this environment")


def get_wk_mask(annotation_id: str, save_path: str, **kwargs):
    _require_wk(kwargs)
    raise NetworkUnavailableError("no egress in this environment")


def make_cutout(source_path: str, dataset: str, roi: Roi, out_path: str,
                out_dataset: str = "volumes/raw"):
    """Cut a ROI out of a local dataset into a new zarr (the local half of
    reference ``make_cutout.py``)."""
    src = open_ds(source_path, dataset)
    data = src.read(roi)
    out = prepare_ds(out_path, out_dataset, roi, src.voxel_size, src.dtype,
                     delete=True)
    out.write(roi, data)
    return out


def upload_raw_to_webknossos(*args, **kwargs):
    _require_wk(kwargs)
    raise NetworkUnavailableError("no egress in this environment")


def mask_seg(
    file: str,
    seg_dataset: str,
    mask_dataset: str,
    out_dataset: Optional[str] = None,
    block_size=(64, 64, 64),
):
    """Blockwise seg × mask multiply (parity: reference ``mask_seg.py:6-89``,
    daisy-blockwise there; chunked tensorstore here)."""
    seg = open_ds(file, seg_dataset)
    mask = open_ds(file, mask_dataset)
    out_dataset = out_dataset or f"{seg_dataset}_masked"
    out = prepare_ds(file, out_dataset, seg.roi, seg.voxel_size, seg.dtype,
                     delete=True)
    block = Coordinate(block_size) * seg.voxel_size
    from ..core.roi import block_grid

    zero = Coordinate((0,) * seg.roi.dims)
    for write, _ in block_grid(seg.roi, block, zero):
        s = seg.read(write)
        m = mask.read(write)
        out.write(write, s * (m > 0).astype(s.dtype))
    return out
