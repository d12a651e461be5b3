"""World-unit geometry: ``Coordinate`` and ``Roi``.

TPU-native replacement for the funlib.geometry semantics the reference relies
on everywhere (see reference ``src/raygun/predict.py:73-108`` for the ROI math
it performs, and ``setup.cfg:21-52`` for the funlib dependency).  All
arithmetic is elementwise over integer world units (nanometres); ROIs snap to
voxel grids and support the grow/intersect/contains algebra needed by the
blockwise scheduler and the valid-convolution context math.

This is a clean-room implementation: plain tuples + integer math, designed so
every quantity that reaches a jitted function is a static Python int (XLA
requires static shapes).
"""

from __future__ import annotations

import math
from typing import Iterable, Optional, Sequence, Union

Number = Union[int, float]


class Coordinate(tuple):
    """An immutable N-dimensional integer-ish vector with elementwise ops.

    Division between Coordinates uses floor division with a divisibility
    check helper (`//` floors, `/` requires exact divisibility for ints).
    ``None`` entries propagate (used for unbounded ROI dims).
    """

    def __new__(cls, *args):
        if len(args) == 1 and isinstance(args[0], Iterable):
            args = tuple(args[0])
        values = tuple(None if a is None else int(a) if float(a).is_integer() else float(a) for a in args)
        return super().__new__(cls, values)

    @property
    def dims(self) -> int:
        return len(self)

    def _binary(self, other, op):
        if isinstance(other, Iterable):
            other = tuple(other)
            assert len(other) == len(self), f"dim mismatch: {self} vs {other}"
            return Coordinate(
                None if a is None or b is None else op(a, b)
                for a, b in zip(self, other)
            )
        return Coordinate(None if a is None else op(a, other) for a in self)

    def __add__(self, other):
        return self._binary(other, lambda a, b: a + b)

    def __radd__(self, other):
        return self.__add__(other)

    def __sub__(self, other):
        return self._binary(other, lambda a, b: a - b)

    def __rsub__(self, other):
        return self._binary(other, lambda a, b: b - a)

    def __mul__(self, other):
        return self._binary(other, lambda a, b: a * b)

    def __rmul__(self, other):
        return self.__mul__(other)

    def __truediv__(self, other):
        return self._binary(other, lambda a, b: a / b)

    def __floordiv__(self, other):
        return self._binary(other, lambda a, b: a // b)

    def __mod__(self, other):
        return self._binary(other, lambda a, b: a % b)

    def __neg__(self):
        return Coordinate(None if a is None else -a for a in self)

    def __abs__(self):
        return Coordinate(None if a is None else abs(a) for a in self)

    def min(self, other) -> "Coordinate":
        return self._binary(other, min)

    def max(self, other) -> "Coordinate":
        return self._binary(other, max)

    def ceil_div(self, other) -> "Coordinate":
        return self._binary(other, lambda a, b: -(-a // b))

    def round_division(self, other) -> "Coordinate":
        return self._binary(other, lambda a, b: int(round(a / b)))

    def is_multiple_of(self, other) -> bool:
        return all(
            a is None or b is None or a % b == 0 for a, b in zip(self, Coordinate(other))
        )

    def as_ints(self) -> tuple:
        return tuple(int(a) for a in self)


class Roi:
    """A rectangular region of interest in world units: ``offset`` + ``shape``.

    Mirrors the capability surface the reference uses from funlib.geometry
    (grow, snap_to_grid, intersect, union, contains, center; see reference
    ``predict.py:92-97`` context math): here re-derived from the contract.
    """

    def __init__(self, offset: Sequence[Number], shape: Sequence[Number]):
        self._offset = Coordinate(offset)
        self._shape = Coordinate(shape)
        assert self._offset.dims == self._shape.dims

    # -- accessors -----------------------------------------------------
    @property
    def offset(self) -> Coordinate:
        return self._offset

    @property
    def shape(self) -> Coordinate:
        return self._shape

    @property
    def begin(self) -> Coordinate:
        return self._offset

    @property
    def end(self) -> Coordinate:
        return self._offset + self._shape

    @property
    def dims(self) -> int:
        return self._offset.dims

    @property
    def center(self) -> Coordinate:
        return self._offset + self._shape // 2

    @property
    def size(self):
        s = 1
        for x in self._shape:
            if x is None:
                return None
            s *= x
        return s

    def empty(self) -> bool:
        return any(s is not None and s <= 0 for s in self._shape)

    def unbounded(self) -> bool:
        return any(s is None for s in self._shape)

    # -- algebra -------------------------------------------------------
    def grow(self, amount_neg=0, amount_pos=None) -> "Roi":
        """Grow by ``amount_neg`` on the low side and ``amount_pos`` on the
        high side (either may be negative to shrink)."""
        if amount_pos is None:
            amount_pos = amount_neg
        if not isinstance(amount_neg, Iterable):
            amount_neg = Coordinate((amount_neg,) * self.dims)
        if not isinstance(amount_pos, Iterable):
            amount_pos = Coordinate((amount_pos,) * self.dims)
        amount_neg = Coordinate(amount_neg)
        amount_pos = Coordinate(amount_pos)
        return Roi(self._offset - amount_neg, self._shape + amount_neg + amount_pos)

    def shift(self, by) -> "Roi":
        return Roi(self._offset + Coordinate(by), self._shape)

    def intersect(self, other: "Roi") -> "Roi":
        begin = self.begin.max(other.begin)
        end = self.end.min(other.end)
        shape = Coordinate(
            None if (e is None or b is None) else max(0, e - b)
            for b, e in zip(begin, end)
        )
        return Roi(begin, shape)

    def intersects(self, other: "Roi") -> bool:
        return not self.intersect(other).empty()

    def union(self, other: "Roi") -> "Roi":
        begin = self.begin.min(other.begin)
        end = self.end.max(other.end)
        return Roi(begin, end - begin)

    def contains(self, other) -> bool:
        if isinstance(other, Roi):
            if other.empty():
                return self.contains(other.begin)
            return self.contains(other.begin) and self.contains(
                other.end - Coordinate((1,) * self.dims)
            )
        point = Coordinate(other)
        return all(
            (b is None or (p is not None and p >= b))
            and (e is None or (p is not None and p < e))
            for p, b, e in zip(point, self.begin, self.end)
        )

    def snap_to_grid(self, voxel_size, mode: str = "grow") -> "Roi":
        """Expand (or shrink/round) so offset and shape are multiples of
        ``voxel_size``."""
        vs = Coordinate(voxel_size)
        if mode == "grow":
            begin = Coordinate(
                b if b is None else (b // v) * v for b, v in zip(self.begin, vs)
            )
            end = Coordinate(
                e if e is None else -((-e) // v) * v for e, v in zip(self.end, vs)
            )
        elif mode == "shrink":
            begin = Coordinate(
                b if b is None else -((-b) // v) * v for b, v in zip(self.begin, vs)
            )
            end = Coordinate(
                e if e is None else (e // v) * v for e, v in zip(self.end, vs)
            )
        elif mode == "closest":
            begin = Coordinate(
                b if b is None else int(round(b / v)) * v for b, v in zip(self.begin, vs)
            )
            end = Coordinate(
                e if e is None else int(round(e / v)) * v for e, v in zip(self.end, vs)
            )
        else:
            raise ValueError(f"unknown snap mode {mode!r}")
        return Roi(begin, end - begin)

    # -- voxel-space helpers -------------------------------------------
    def to_voxel_slices(self, voxel_size, base_offset=None) -> tuple:
        """Slices into a voxel array whose element [0,...,0] sits at world
        position ``base_offset`` with spacing ``voxel_size``."""
        vs = Coordinate(voxel_size)
        base = Coordinate(base_offset) if base_offset is not None else Coordinate((0,) * self.dims)
        rel = self._offset - base
        assert rel.is_multiple_of(vs), f"roi offset {self._offset} not aligned to {vs} from {base}"
        assert self._shape.is_multiple_of(vs), f"roi shape {self._shape} not aligned to {vs}"
        begin = (rel / vs).as_ints()
        count = (self._shape / vs).as_ints()
        return tuple(slice(b, b + c) for b, c in zip(begin, count))

    def voxel_shape(self, voxel_size) -> tuple:
        return (self._shape / Coordinate(voxel_size)).as_ints()

    # -- dunder --------------------------------------------------------
    def __eq__(self, other):
        return (
            isinstance(other, Roi)
            and self._offset == other._offset
            and self._shape == other._shape
        )

    def __hash__(self):
        return hash((self._offset, self._shape))

    def __repr__(self):
        return f"Roi(offset={tuple(self._offset)}, shape={tuple(self._shape)})"


def block_grid(total_roi: Roi, write_shape: Coordinate, context: Coordinate):
    """Enumerate write ROIs tiling ``total_roi`` (shrunk by context) and their
    read ROIs (write grown by context).

    This is the static block-grid that replaces the reference's dynamic daisy
    scheduling (reference ``predict.py:154-170``): deterministic enumeration →
    any worker/chip can recompute its assignment without a TCP server.
    Boundary blocks are clipped to the writable region.
    """
    write_shape = Coordinate(write_shape)
    context = Coordinate(context)
    writable = total_roi.grow(-context, -context)
    if writable.empty():
        return []
    counts = writable.shape.ceil_div(write_shape)
    blocks = []
    ndim = total_roi.dims
    idx = [0] * ndim

    def rec(d):
        if d == ndim:
            offset = writable.begin + Coordinate(idx) * write_shape
            write = Roi(offset, write_shape).intersect(writable)
            read = write.grow(context, context)
            blocks.append((write, read))
            return
        for i in range(int(counts[d])):
            idx[d] = i
            rec(d + 1)

    rec(0)
    return blocks
