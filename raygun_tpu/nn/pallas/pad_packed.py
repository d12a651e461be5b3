"""Pallas TPU kernel: the f=2-packed fine reflect-pad(3) in ONE pass.

``packed_shell._packed_reflect_pad3_impl`` builds the padded tensor as two
axis-wise concats of mask-selected edge strips; XLA schedules that as a
slice + dynamic-update-slice + copy chain that re-materializes the ~34 MB
(3x512^2 bf16 packed) tensor several times — the r5 device trace
attributes ~2-3 ms/step of the production CycleGAN step to exactly these
ops around the head boundary. This kernel writes the padded tensor once:
a band of output rows per grid step (input rows DMA'd HBM→VMEM with the
blur_pool halo pattern — overlapping windows are not expressible with
BlockSpec), edge rows/cols built with the same phase-swap selects as the
reference impl (h1_fused's proven band logic, nn/pallas/shell_fused.py).

Forward-only: the backward stays ``packed_reflect_pad3_T``'s exact
strip-add transpose via the existing custom VJP. Exact: pure selects and
copies, no arithmetic — output is bit-identical to the XLA impl
(asserted, tests/nn/test_packed_shell.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _interpret() -> bool:
    try:
        return jax.devices()[0].platform not in ("tpu", "axon")
    except Exception:
        return True


def _pick_band(Hc: int):
    """Largest output-band height dividing Hp = Hc + 4 (>= 4 so the two
    special rows of each edge band land in the first/last band; the
    input halo slab SH + 4 must fit inside the input)."""
    for sh in (32, 26, 20, 16, 13, 10, 8, 5, 4):
        if (Hc + 4) % sh == 0 and sh + 4 <= Hc:
            return sh
    return None


def _pad3_kernel(Hc, Wc, C4, SH, x_hbm, o_ref, scr, sem):
    k = pl.program_id(1)
    nb = (Hc + 4) // SH
    IN_ROWS = SH + 4
    C = C4 // 4
    start = jnp.clip(k * SH - 2, 0, Hc - IN_ROWS)
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.program_id(0), pl.ds(start, IN_ROWS)], scr, sem
    )
    dma.start()
    dma.wait()

    ch = jax.lax.broadcasted_iota(jnp.int32, (1, 1, C4), 2)
    m_row = ch < C4 // 2          # vy phase-0 lanes
    m_col = (ch // C) % 2 == 0    # vx phase-0 lanes
    zero = jnp.zeros((), scr.dtype)

    def srow(idx):
        return scr[pl.ds(jnp.clip(idx, 0, IN_ROWS - 1), 1)]

    def colpad(row):
        # fine col pad: two phase-mixed strips each side (exactly
        # _packed_reflect_pad3_impl's pad_axis on axis 2)
        c0, c1 = row[:, 0:1], row[:, 1:2]
        cn1, cn2 = row[:, Wc - 1:Wc], row[:, Wc - 2:Wc - 1]
        left2 = jnp.where(m_col, zero, c1)
        left1 = jnp.where(m_col, c1, c0)
        right0 = jnp.where(m_col, cn1, cn2)
        right1 = jnp.where(m_col, cn2, zero)
        return jnp.concatenate([left2, left1, row, right0, right1], axis=1)

    for r in range(SH):
        p = k * SH + r
        o_ref[0, pl.ds(r, 1)] = colpad(srow(p - 2 - start))

    @pl.when(k == 0)
    def _():
        r0, r1 = srow(0), srow(1)
        o_ref[0, pl.ds(0, 1)] = colpad(jnp.where(m_row, zero, r1))
        o_ref[0, pl.ds(1, 1)] = colpad(jnp.where(m_row, r1, r0))

    @pl.when(k == nb - 1)
    def _():
        rn1 = srow(Hc - 1 - start)
        rn2 = srow(Hc - 2 - start)
        o_ref[0, pl.ds(SH - 2, 1)] = colpad(jnp.where(m_row, rn1, rn2))
        o_ref[0, pl.ds(SH - 1, 1)] = colpad(jnp.where(m_row, rn2, zero))


def _pick_band_T(Hc: int):
    """Output-band height for the transpose (bands over Hc output rows).
    Capped at 16: the two overlapping input views + output block are all
    double-buffered, and SH=32 at 260x256ch measured a 24.5M scoped-VMEM
    stack against the 16M limit (SH=16 fits)."""
    for sh in (16, 13, 10, 8, 5, 4):
        if Hc % sh == 0 and sh >= 4:
            return sh
    return None


def _pad3T_kernel(Hc, Wc, C4, SH, v0_ref, v1_ref, o_ref):
    # Two overlapping SH-row views of g (blocks k and k+1): every row this
    # band needs has a STATIC index in one of them — interior row r reads
    # g[k*SH + r + 2] = v0[r+2] or v1[r+2-SH]; the edge strips live at
    # v0[0..1] (band 0) and v1[2..3] (last band, = g rows Hp-2, Hp-1).
    # (A manual DMA of the (*, Wp, C4) slab is NOT used: Wp = Wc+4 is not
    # sublane-aligned and Mosaic rejects the memref slice; BlockSpec
    # views mask the ragged tail instead.)
    k = pl.program_id(1)
    nb = Hc // SH
    C = C4 // 4

    ch = jax.lax.broadcasted_iota(jnp.int32, (1, 1, C4), 2)
    m_row = ch < C4 // 2
    m_col = (ch // C) % 2 == 0
    zero = jnp.zeros((), o_ref.dtype)

    def srow(i):
        # row i of this band's 2*SH-row window (STATIC python int)
        return v0_ref[0, i:i + 1] if i < SH else v1_ref[0, i - SH:i - SH + 1]

    def colunpad(row):
        # exact mirror of packed_reflect_pad3_T's unpad_axis(axis=2):
        # interior slice + masked strip adds into cols 0, 1, Wc-2, Wc-1
        g_m2, g_m1 = row[:, 0:1], row[:, 1:2]
        g_p0, g_p1 = row[:, Wc + 2:Wc + 3], row[:, Wc + 3:Wc + 4]
        core = row[:, 2:Wc + 2]
        c0 = core[:, 0:1] + jnp.where(m_col, zero, g_m1)
        c1 = core[:, 1:2] + (jnp.where(m_col, g_m1, zero)
                             + jnp.where(m_col, zero, g_m2))
        cn2 = core[:, Wc - 2:Wc - 1] + (jnp.where(m_col, zero, g_p0)
                                        + jnp.where(m_col, g_p1, zero))
        cn1 = core[:, Wc - 1:Wc] + jnp.where(m_col, g_p0, zero)
        return jnp.concatenate(
            [c0, c1, core[:, 2:Wc - 2], cn2, cn1], axis=1)

    for r in range(SH):
        o_ref[0, r:r + 1] = colunpad(srow(r + 2))

    @pl.when(k == 0)
    def _():
        g0, g1 = colunpad(srow(0)), colunpad(srow(1))
        o_ref[0, 0:1] = colunpad(srow(2)) + jnp.where(m_row, zero, g1)
        o_ref[0, 1:2] = colunpad(srow(3)) + (jnp.where(m_row, g1, zero)
                                             + jnp.where(m_row, zero, g0))

    @pl.when(k == nb - 1)
    def _():
        # last band: g rows Hp-2, Hp-1 are v1 rows 2, 3 (v1 = block nb)
        gp0 = colunpad(v1_ref[0, 2:3])
        gp1 = colunpad(v1_ref[0, 3:4])
        o_ref[0, SH - 2:SH - 1] = colunpad(srow(SH)) + (
            jnp.where(m_row, zero, gp0) + jnp.where(m_row, gp1, zero))
        o_ref[0, SH - 1:SH] = colunpad(srow(SH + 1)) + jnp.where(
            m_row, gp0, zero)


def pad3T_pallas_ok(g: Array) -> bool:
    if os.environ.get("RAYGUN_DISABLE_PAD_PALLAS"):
        return False
    if g.ndim != 4:
        return False
    B, Hp, Wp, C4 = g.shape
    Hc, Wc = Hp - 4, Wp - 4
    if C4 % 128 or C4 % 4 or Hc < 8 or Wc < 8:
        return False
    if _pick_band_T(Hc) is None:
        return False
    if os.environ.get("RAYGUN_FORCE_PAD_PALLAS"):
        return True
    if g.dtype != jnp.bfloat16:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def packed_reflect_pad3_T_pallas(g: Array) -> Array:
    """(B, Hc+4, Wc+4, 4C) -> (B, Hc, Wc, 4C) — the Pallas form of
    ``packed_shell.packed_reflect_pad3_T`` (exact strip-add transpose)."""
    B, Hp, Wp, C4 = g.shape
    Hc, Wc = Hp - 4, Wp - 4
    SH = _pick_band_T(Hc)
    nb = Hc // SH
    view = lambda off: pl.BlockSpec(
        (1, SH, Wp, C4), lambda b, k, off=off: (b, k + off, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_pad3T_kernel, Hc, Wc, C4, SH),
        grid=(B, nb),
        in_specs=[view(0), view(1)],
        out_specs=pl.BlockSpec(
            (1, SH, Wc, C4), lambda b, k: (b, k, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hc, Wc, C4), g.dtype),
        interpret=_interpret(),
    )(g, g)


def pad3_pallas_ok(xp: Array) -> bool:
    if os.environ.get("RAYGUN_DISABLE_PAD_PALLAS"):
        return False
    if xp.ndim != 4:
        return False
    B, Hc, Wc, C4 = xp.shape
    # Wc is the DMA slab's sublane dim: Mosaic requires 8-alignment for
    # the memref slice (the transpose kernel sidesteps this with
    # BlockSpec views; here the halo windows need the manual copy)
    if C4 % 128 or C4 % 4 or Hc < 8 or Wc < 8 or Wc % 8:
        return False
    if _pick_band(Hc) is None:
        return False
    if os.environ.get("RAYGUN_FORCE_PAD_PALLAS"):
        return True
    if xp.dtype != jnp.bfloat16:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def packed_reflect_pad3_pallas(xp: Array) -> Array:
    """(B, Hc, Wc, 4C) -> (B, Hc+4, Wc+4, 4C), fine origin -4 — the
    Pallas forward of ``packed_shell.packed_reflect_pad3``."""
    B, Hc, Wc, C4 = xp.shape
    SH = _pick_band(Hc)
    nb = (Hc + 4) // SH
    return pl.pallas_call(
        functools.partial(_pad3_kernel, Hc, Wc, C4, SH),
        grid=(B, nb),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, SH, Wc + 4, C4), lambda b, k: (b, k, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hc + 4, Wc + 4, C4), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((SH + 4, Wc, C4), xp.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(xp)
