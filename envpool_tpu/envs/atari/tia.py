"""TIA scanline layer over the 6502 core — registers to pixels.

Second stage of the ALE-emulation path (after ``cpu6502.py``): a
per-scanline TIA model.  The CPU races the beam exactly as on real
hardware — 76 CPU cycles per scanline, ``WSYNC`` ($02) burns the rest of
the line — and at each line boundary the display registers are
snapshotted into a ``[192, NREG]`` buffer; ``render_frame`` then turns
the whole buffer into a 160×192 pixel frame in one vectorized pass
(kernel-style games, where the ROM rewrites registers line by line, are
exactly representable this way; mid-scanline register races are not —
documented scope).

Implemented registers: VSYNC($00, frame restart), WSYNC($02, strobe),
NUSIZ0/NUSIZ1($04/$05, player copies+size, missile size),
COLUP0/COLUP1/COLUPF/COLUBK($06-$09), CTRLPF($0A, bit0 = reflect,
bits 4-5 = ball size), PF0/PF1/PF2($0D-$0F), RESP0/RESP1/RESM0/RESM1/
RESBL($10-$14, strobes latching object x from the beam position),
GRP0/GRP1($1B/$1C), ENAM0/ENAM1/ENABL($1D-$1F, missile/ball enables).
Colors are the 7-bit NTSC luma/hue byte mapped to gray by luma
(bits 1-3) — enough for the 84×84 grayscale pipeline the suite uses.

No ROM assets exist in this image, so the tests drive hand-assembled
kernels and assert the rendered playfield/player geometry
(tests/test_tia.py) — on-device CPU→TIA→pixels end to end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import cpu6502

__all__ = ["attach_tia", "step_tia", "run_frame", "render_frame"]

VISIBLE_LINES = 192
FIRST_VISIBLE = 40      # 3 vsync + 37 vblank lines
CYCLES_PER_LINE = 76

# Snapshot register layout: indices into the [NREG] per-line record.
R_PF0, R_PF1, R_PF2, R_COLUPF, R_COLUBK, R_CTRLPF = 0, 1, 2, 3, 4, 5
R_COLUP0, R_COLUP1, R_GRP0, R_GRP1, R_POSP0, R_POSP1 = 6, 7, 8, 9, 10, 11
R_NUSIZ0, R_NUSIZ1, R_ENAM0, R_ENAM1, R_ENABL = 12, 13, 14, 15, 16
R_POSM0, R_POSM1, R_POSBL = 17, 18, 19
NREG = 20

# NUSIZ player modes: (copy at +0, +16, +32, +64, pixel scale).
_NUSIZ_COPIES = np.asarray([
    [1, 0, 0, 0], [1, 1, 0, 0], [1, 0, 1, 0], [1, 1, 1, 0],
    [1, 0, 0, 1], [1, 0, 0, 0], [1, 0, 1, 1], [1, 0, 0, 0],
], np.int32)
_NUSIZ_SCALE = np.asarray([1, 1, 1, 1, 1, 2, 1, 4], np.int32)
_COPY_OFFSETS = np.asarray([0, 16, 32, 64], np.int32)


def attach_tia(m: dict) -> dict:
    """Add TIA beam state to a 6502 machine."""
    return {
        **m,
        "scanline": jnp.int32(0),
        "line_cycles": jnp.int32(0),
        "posp0": jnp.int32(0),
        "posp1": jnp.int32(0),
        "posm0": jnp.int32(0),
        "posm1": jnp.int32(0),
        "posbl": jnp.int32(0),
        "lines": jnp.zeros((VISIBLE_LINES, NREG), jnp.int32),
    }


def step_tia(m: dict, rom: jax.Array) -> dict:
    """One CPU instruction + beam bookkeeping.

    Strobes are detected via register-file deltas: ``_write`` stores the
    written value, so WSYNC/RESP writes are visible as tia[addr] updates;
    the cores write strobes with changing values is NOT required — we
    track them by comparing pre/post cycles and register files.
    """
    pre_cycles = m["cycles"]
    pre_tia = m["tia"]
    pre_vsync = pre_tia[0]
    m2 = cpu6502.step_instruction(m, rom)
    dcycles = m2["cycles"] - pre_cycles

    # Detect writes by register-file change OR rewrite-same-value (the
    # common kernel idiom STA WSYNC writes A which may equal the old
    # value).  We conservatively detect WSYNC via the instruction's
    # target: cheaper and exact is to make the CPU flag TIA writes; the
    # core records the last bus write address in tia-space via the
    # write-capture below.
    wrote = m2["tia_waddr"]
    wsync = wrote == 0x02
    resp0 = wrote == 0x10
    resp1 = wrote == 0x11
    resm0 = wrote == 0x12
    resm1 = wrote == 0x13
    resbl = wrote == 0x14
    vsync_on = (m2["tia"][0] & 0x02) != 0
    vsync_off = ((pre_vsync & 0x02) != 0) & ~vsync_on

    line_cycles = m["line_cycles"] + dcycles
    # Player position latch: beam pixel = 3·cycles − 68 (visible span).
    beam = jnp.clip(line_cycles * 3 - 68, 0, 159)
    posp0 = jnp.where(resp0, beam, m["posp0"])
    posp1 = jnp.where(resp1, beam, m["posp1"])
    posm0 = jnp.where(resm0, beam, m["posm0"])
    posm1 = jnp.where(resm1, beam, m["posm1"])
    posbl = jnp.where(resbl, beam, m["posbl"])

    line_cycles = jnp.where(wsync, CYCLES_PER_LINE, line_cycles)
    advance = line_cycles >= CYCLES_PER_LINE
    # Snapshot the display registers at the END of the line.
    t = m2["tia"]
    record = jnp.stack([
        t[0x0D], t[0x0E], t[0x0F], t[0x08], t[0x09], t[0x0A],
        t[0x06], t[0x07], t[0x1B], t[0x1C], posp0, posp1,
        t[0x04], t[0x05], t[0x1D], t[0x1E], t[0x1F],
        posm0, posm1, posbl,
    ])
    vis = m["scanline"] - FIRST_VISIBLE
    store = advance & (vis >= 0) & (vis < VISIBLE_LINES)
    oh = jax.nn.one_hot(
        jnp.clip(vis, 0, VISIBLE_LINES - 1), VISIBLE_LINES, dtype=jnp.int32
    )
    lines = jnp.where(
        store,
        m["lines"] * (1 - oh[:, None]) + oh[:, None] * record[None, :],
        m["lines"],
    )
    scanline = jnp.where(advance, m["scanline"] + 1, m["scanline"])
    line_cycles = jnp.where(advance, line_cycles - CYCLES_PER_LINE,
                            line_cycles)
    # VSYNC pulse ending restarts the frame counter.
    scanline = jnp.where(vsync_off, 3, scanline)
    return {
        **m2,
        "scanline": scanline.astype(jnp.int32),
        "line_cycles": line_cycles.astype(jnp.int32),
        "posp0": posp0.astype(jnp.int32),
        "posp1": posp1.astype(jnp.int32),
        "posm0": posm0.astype(jnp.int32),
        "posm1": posm1.astype(jnp.int32),
        "posbl": posbl.astype(jnp.int32),
        "lines": lines,
    }


def run_frame(m: dict, rom: jax.Array, max_instructions: int) -> dict:
    """Advance one frame under ``lax.fori_loop``.

    Stops at the frame boundary: 262 lines elapsed, or the ROM's next
    VSYNC pulse wrapping the scanline counter (kernel loops signal frame
    completion this way).  ``max_instructions`` bounds runaway ROMs."""

    def body(_, carry):
        mm, done = carry
        mm2 = step_tia(mm, rom)
        wrapped = mm2["scanline"] < mm["scanline"]
        done2 = done | wrapped | (mm2["scanline"] >= 262)
        out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(done, a, b), mm, mm2
        )
        return out, done2

    m = {**m, "scanline": jnp.int32(0)}
    m, _ = jax.lax.fori_loop(
        0, max_instructions, body, (m, jnp.bool_(False))
    )
    return m


def _luma(color: jax.Array) -> jax.Array:
    """NTSC color byte → gray level (luma bits 1-3 scaled to 0..255)."""
    return ((color >> 1) & 0x07) * 36


def render_frame(lines: jax.Array) -> jax.Array:
    """[VISIBLE_LINES, NREG] register snapshots → [192, 160] uint8 gray."""
    x = jnp.arange(160)

    # Playfield bit per pixel: 20 4-pixel-wide bits on the left half;
    # right half repeats (CTRLPF bit0 clear) or reflects (set).
    left_bit = x // 4                      # 0..39; left half uses 0..19
    pfbit_l = jnp.where(
        left_bit < 4, 0, left_bit
    )
    # Bit order: PF0 bits 4-7 (left to right), PF1 bits 7-0, PF2 0-7.
    def pf_lookup(pf0, pf1, pf2, bit):
        b = bit
        v0 = (pf0 >> (4 + b)) & 1                  # bits 0-3 → PF0 4..7
        v1 = (pf1 >> (7 - (b - 4))) & 1            # bits 4-11 → PF1 7..0
        v2 = (pf2 >> (b - 12)) & 1                 # bits 12-19 → PF2 0..7
        return jnp.where(b < 4, v0, jnp.where(b < 12, v1, v2))

    bit20_l = left_bit                             # 0..19 valid on left
    bit20_r_repeat = left_bit - 20                 # 0..19 on right
    bit20_r_reflect = 39 - left_bit                # mirrored

    def line_pixels(rec):
        pf0, pf1, pf2 = rec[R_PF0], rec[R_PF1], rec[R_PF2]
        reflect = (rec[R_CTRLPF] & 1) != 0
        bit = jnp.where(
            left_bit < 20,
            bit20_l,
            jnp.where(reflect, bit20_r_reflect, bit20_r_repeat),
        )
        pf_on = pf_lookup(pf0, pf1, pf2, bit) != 0
        px = jnp.full((160,), _luma(rec[R_COLUBK]), jnp.int32)
        px = jnp.where(pf_on, _luma(rec[R_COLUPF]), px)
        # Ball: CTRLPF bits 4-5 give width 1/2/4/8, playfield color.
        bl_w = 1 << ((rec[R_CTRLPF] >> 4) & 3)
        rel_bl = x - rec[R_POSBL]
        bl_on = (
            ((rec[R_ENABL] & 2) != 0) & (rel_bl >= 0) & (rel_bl < bl_w)
        )
        px = jnp.where(bl_on, _luma(rec[R_COLUPF]), px)
        # Players: NUSIZ copies (+0/+16/+32/+64) and 1x/2x/4x widths;
        # missiles: 2-bit width field, player color.
        copies = jnp.asarray(_NUSIZ_COPIES)
        offsets = jnp.asarray(_COPY_OFFSETS)
        scales = jnp.asarray(_NUSIZ_SCALE)
        for grp_i, pos_i, col_i, nus_i, enam_i, posm_i in (
            (R_GRP0, R_POSP0, R_COLUP0, R_NUSIZ0, R_ENAM0, R_POSM0),
            (R_GRP1, R_POSP1, R_COLUP1, R_NUSIZ1, R_ENAM1, R_POSM1),
        ):
            mode = rec[nus_i] & 7
            oh_m = jax.nn.one_hot(mode, 8, dtype=jnp.int32)
            has_copy = oh_m @ copies          # [4]
            scale = jnp.sum(oh_m * scales)
            on = jnp.zeros((160,), bool)
            for c in range(4):
                rel = x - rec[pos_i] - offsets[c]
                inside = (rel >= 0) & (rel < 8 * scale)
                bitv = (
                    rec[grp_i] >> (7 - jnp.clip(rel // scale, 0, 7))
                ) & 1
                on = on | ((has_copy[c] > 0) & inside & (bitv != 0))
            px = jnp.where(on, _luma(rec[col_i]), px)
            # Missile.
            m_w = 1 << ((rec[nus_i] >> 4) & 3)
            rel_m = x - rec[posm_i]
            m_on = (
                ((rec[enam_i] & 2) != 0) & (rel_m >= 0) & (rel_m < m_w)
            )
            px = jnp.where(m_on, _luma(rec[col_i]), px)
        return px

    frame = jax.vmap(line_pixels)(lines)
    return jnp.clip(frame, 0, 255).astype(jnp.uint8)
