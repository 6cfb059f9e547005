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
COLUP0/COLUP1/COLUPF/COLUBK($06-$09), CTRLPF($0A: bit0 reflect,
bit1 score mode, bit2 playfield priority, bits 4-5 ball size),
REFP0/REFP1($0B/$0C, player reflection), PF0/PF1/PF2($0D-$0F),
RESP0/RESP1/RESM0/RESM1/RESBL($10-$14, strobes latching object x from
the beam position), GRP0/GRP1($1B/$1C, with the VDEL double-buffer
cross-latch), ENAM0/ENAM1/ENABL($1D-$1F), HMP0/HMP1/HMM0/HMM1/HMBL
($20-$24) applied by the HMOVE strobe($2A), VDELP0/VDELP1/VDELBL
($25-$27), RESMP0/RESMP1($28/$29, missile locked to player center),
HMCLR($2B), CXCLR($2C).  The full 15-latch collision matrix (CXM0P …
CXPPMM) is computed per visible scanline from the object masks and is
readable through the CPU bus at TIA read addresses $x0-$x7 (mirrors
decode ``addr & 0xF``, as on hardware).

Colors are the 7-bit NTSC luma/hue byte mapped to gray by luma
(bits 1-3) — enough for the 84×84 grayscale pipeline the suite uses.

Scope notes (documented deviations from cycle-exact TIA): HMOVE applies
the signed motion immediately rather than over the following 24 clocks
of extended hblank (no "HMOVE comb" or +8 early-hblank shift); motion
values latched mid-line act from the next snapshot on.

No ROM assets exist in this image, so the tests drive hand-assembled
kernels and assert the rendered geometry and collision latches
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
R_REFP0, R_REFP1, R_RESMP0, R_RESMP1 = 20, 21, 22, 23
NREG = 24

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
        # VDEL double buffers ("old" registers, cross-latched on GRP writes).
        "grp0_old": jnp.int32(0),
        "grp1_old": jnp.int32(0),
        "enabl_old": jnp.int32(0),
        # Collision latches CXM0P..CXPPMM ($0-$7), bits 7/6 as on hardware.
        "cx": jnp.zeros(8, jnp.int32),
        # Sticky frame-wrap flag (VSYNC pulse ended while mid-frame).
        "wrapped": jnp.bool_(False),
        "lines": jnp.zeros((VISIBLE_LINES, NREG), jnp.int32),
    }


def _signed_hm(v: jax.Array) -> jax.Array:
    """HMxx high nibble → signed motion (+7 left … −8 right)."""
    nib = (v >> 4) & 0xF
    return jnp.where(nib >= 8, nib - 16, nib)


def _player_mask(x, grp, pos, nusiz, refp):
    """[160] player mask for one snapshot record (NUSIZ copies, REFP)."""
    mode = nusiz & 7
    oh_m = jax.nn.one_hot(mode, 8, dtype=jnp.int32)
    has_copy = oh_m @ jnp.asarray(_NUSIZ_COPIES)     # [4]
    scale = jnp.sum(oh_m * jnp.asarray(_NUSIZ_SCALE))
    offsets = jnp.asarray(_COPY_OFFSETS)
    on = jnp.zeros((160,), bool)
    reflect = (refp & 0x08) != 0
    for c in range(4):
        rel = x - pos - offsets[c]
        inside = (rel >= 0) & (rel < 8 * scale)
        bitidx = jnp.clip(rel // scale, 0, 7)
        bit = jnp.where(reflect, bitidx, 7 - bitidx)
        bitv = (grp >> bit) & 1
        on = on | ((has_copy[c] > 0) & inside & (bitv != 0))
    return on


def _missile_mask(x, enam, pos, nusiz, resmp):
    w = 1 << ((nusiz >> 4) & 3)
    rel = x - pos
    on = ((enam & 2) != 0) & (rel >= 0) & (rel < w)
    # RESMP bit 1: missile hidden while locked to the player center.
    return on & ((resmp & 2) == 0)


def _pf_bits(x):
    """Static per-pixel playfield bit indices (left 0..19, right maps)."""
    left_bit = x // 4
    bit20_l = left_bit
    bit20_r_repeat = left_bit - 20
    bit20_r_reflect = 39 - left_bit
    return left_bit, bit20_l, bit20_r_repeat, bit20_r_reflect


def _pf_mask(x, pf0, pf1, pf2, ctrlpf):
    left_bit, bl, br_rep, br_ref = _pf_bits(x)
    reflect = (ctrlpf & 1) != 0
    bit = jnp.where(
        left_bit < 20, bl, jnp.where(reflect, br_ref, br_rep)
    )
    # Bit order: PF0 bits 4-7 (left to right), PF1 bits 7-0, PF2 0-7.
    v0 = (pf0 >> (4 + bit)) & 1
    v1 = (pf1 >> (7 - (bit - 4))) & 1
    v2 = (pf2 >> (bit - 12)) & 1
    v = jnp.where(bit < 4, v0, jnp.where(bit < 12, v1, v2))
    return v != 0


def _ball_mask(x, enabl, pos, ctrlpf):
    w = 1 << ((ctrlpf >> 4) & 3)
    rel = x - pos
    return ((enabl & 2) != 0) & (rel >= 0) & (rel < w)


def _line_masks(rec):
    """All six object masks ([160] bool each) for one snapshot record."""
    x = jnp.arange(160)
    pf = _pf_mask(x, rec[R_PF0], rec[R_PF1], rec[R_PF2], rec[R_CTRLPF])
    bl = _ball_mask(x, rec[R_ENABL], rec[R_POSBL], rec[R_CTRLPF])
    p0 = _player_mask(x, rec[R_GRP0], rec[R_POSP0], rec[R_NUSIZ0],
                      rec[R_REFP0])
    p1 = _player_mask(x, rec[R_GRP1], rec[R_POSP1], rec[R_NUSIZ1],
                      rec[R_REFP1])
    m0 = _missile_mask(x, rec[R_ENAM0], rec[R_POSM0], rec[R_NUSIZ0],
                       rec[R_RESMP0])
    m1 = _missile_mask(x, rec[R_ENAM1], rec[R_POSM1], rec[R_NUSIZ1],
                       rec[R_RESMP1])
    return pf, bl, p0, p1, m0, m1


def _collisions(rec) -> jax.Array:
    """[8] collision-latch contribution from one scanline's masks.

    Register layout (bit 7, bit 6), matching the TIA read map $0-$7:
    CXM0P(M0·P1, M0·P0) CXM1P(M1·P0, M1·P1) CXP0FB(P0·PF, P0·BL)
    CXP1FB(P1·PF, P1·BL) CXM0FB(M0·PF, M0·BL) CXM1FB(M1·PF, M1·BL)
    CXBLPF(BL·PF, —) CXPPMM(P0·P1, M0·M1).
    """
    pf, bl, p0, p1, m0, m1 = _line_masks(rec)

    def hit(a, b):
        return jnp.any(a & b).astype(jnp.int32)

    return jnp.stack([
        (hit(m0, p1) << 7) | (hit(m0, p0) << 6),
        (hit(m1, p0) << 7) | (hit(m1, p1) << 6),
        (hit(p0, pf) << 7) | (hit(p0, bl) << 6),
        (hit(p1, pf) << 7) | (hit(p1, bl) << 6),
        (hit(m0, pf) << 7) | (hit(m0, bl) << 6),
        (hit(m1, pf) << 7) | (hit(m1, bl) << 6),
        hit(bl, pf) << 7,
        (hit(p0, p1) << 7) | (hit(m0, m1) << 6),
    ])


def _instr(m: dict, rom: jax.Array) -> dict:
    """One CPU instruction + TIA beam bookkeeping (no line snapshot).

    Strobes are detected via the CPU core's last-TIA-write capture
    (``tia_waddr``), so STA WSYNC/RESPx/HMOVE work regardless of the
    value written.  ``line_cycles`` accumulates past 76 (or is pinned
    there by WSYNC); crossing the threshold marks the line as finished —
    the caller applies ``_end_line``.
    """
    pre_cycles = m["cycles"]
    pre_vsync = m["tia"][0]
    m2 = cpu6502.step_instruction(m, rom)
    dcycles = m2["cycles"] - pre_cycles

    wrote = m2["tia_waddr"]
    wsync = wrote == 0x02
    resp0 = wrote == 0x10
    resp1 = wrote == 0x11
    resm0 = wrote == 0x12
    resm1 = wrote == 0x13
    resbl = wrote == 0x14
    grp0_w = wrote == 0x1B
    grp1_w = wrote == 0x1C
    hmove = wrote == 0x2A
    hmclr = wrote == 0x2B
    cxclr = wrote == 0x2C
    vsync_on = (m2["tia"][0] & 0x02) != 0
    vsync_off = ((pre_vsync & 0x02) != 0) & ~vsync_on

    t = m2["tia"]
    # VDEL cross-latch: writing GRP0 copies new GRP1 → old GRP1; writing
    # GRP1 copies new GRP0 → old GRP0 and new ENABL → old ENABL.
    grp1_old = jnp.where(grp0_w, t[0x1C], m["grp1_old"])
    grp0_old = jnp.where(grp1_w, t[0x1B], m["grp0_old"])
    enabl_old = jnp.where(grp1_w, t[0x1F], m["enabl_old"])

    line_cycles = m["line_cycles"] + dcycles
    # Player position latch: beam pixel = 3·cycles − 68 (visible span).
    beam = jnp.clip(line_cycles * 3 - 68, 0, 159)
    posp0 = jnp.where(resp0, beam, m["posp0"])
    posp1 = jnp.where(resp1, beam, m["posp1"])
    posm0 = jnp.where(resm0, beam, m["posm0"])
    posm1 = jnp.where(resm1, beam, m["posm1"])
    posbl = jnp.where(resbl, beam, m["posbl"])

    # HMOVE: apply the signed per-object motion registers ($20-$24).
    posp0 = jnp.where(hmove, (posp0 - _signed_hm(t[0x20])) % 160, posp0)
    posp1 = jnp.where(hmove, (posp1 - _signed_hm(t[0x21])) % 160, posp1)
    posm0 = jnp.where(hmove, (posm0 - _signed_hm(t[0x22])) % 160, posm0)
    posm1 = jnp.where(hmove, (posm1 - _signed_hm(t[0x23])) % 160, posm1)
    posbl = jnp.where(hmove, (posbl - _signed_hm(t[0x24])) % 160, posbl)
    # HMCLR zeroes all five motion registers.
    hm_keep = jnp.ones(64, jnp.int32).at[0x20:0x25].set(0)
    tia_file = jnp.where(hmclr, t * hm_keep, t)
    m2 = {**m2, "tia": tia_file}
    t = tia_file

    # RESMP: while set the missile tracks the player center (pos+4·scale);
    # it stays there when the bit is cleared (how games "fire from ship").
    def _center(nusiz, posp):
        oh = jax.nn.one_hot(nusiz & 7, 8, dtype=jnp.int32)
        scale = jnp.sum(oh * jnp.asarray(_NUSIZ_SCALE))
        return (posp + 4 * scale) % 160

    posm0 = jnp.where((t[0x28] & 2) != 0, _center(t[0x04], posp0), posm0)
    posm1 = jnp.where((t[0x29] & 2) != 0, _center(t[0x05], posp1), posm1)

    line_cycles = jnp.where(wsync, CYCLES_PER_LINE, line_cycles)
    # CXCLR acts immediately (mid-line read-then-clear idiom).
    cx = jnp.where(cxclr, jnp.zeros_like(m["cx"]), m["cx"])
    # VSYNC pulse ending resyncs the frame counter (wrap = frame done).
    wrapped = m["wrapped"] | (vsync_off & (m["scanline"] > 3))
    scanline = jnp.where(vsync_off, 3, m["scanline"])
    return {
        **m2,
        "scanline": scanline.astype(jnp.int32),
        "line_cycles": line_cycles.astype(jnp.int32),
        "posp0": posp0.astype(jnp.int32),
        "posp1": posp1.astype(jnp.int32),
        "posm0": posm0.astype(jnp.int32),
        "posm1": posm1.astype(jnp.int32),
        "posbl": posbl.astype(jnp.int32),
        "grp0_old": grp0_old.astype(jnp.int32),
        "grp1_old": grp1_old.astype(jnp.int32),
        "enabl_old": enabl_old.astype(jnp.int32),
        "cx": cx.astype(jnp.int32),
        "wrapped": wrapped,
    }


def _make_record(m: dict) -> jax.Array:
    """Snapshot the display registers (GRP/ENABL resolved through the
    VDEL selects) into one [NREG] line record."""
    t = m["tia"]
    grp0_disp = jnp.where((t[0x25] & 1) != 0, m["grp0_old"], t[0x1B])
    grp1_disp = jnp.where((t[0x26] & 1) != 0, m["grp1_old"], t[0x1C])
    enabl_disp = jnp.where((t[0x27] & 1) != 0, m["enabl_old"], t[0x1F])
    return jnp.stack([
        t[0x0D], t[0x0E], t[0x0F], t[0x08], t[0x09], t[0x0A],
        t[0x06], t[0x07], grp0_disp, grp1_disp, m["posp0"], m["posp1"],
        t[0x04], t[0x05], t[0x1D], t[0x1E], enabl_disp,
        m["posm0"], m["posm1"], m["posbl"],
        t[0x0B], t[0x0C], t[0x28], t[0x29],
    ])


def _end_line(m: dict) -> tuple[dict, jax.Array, jax.Array]:
    """Close the current scanline: snapshot, collision OR, advance.

    Returns (machine, record, store) — ``store`` marks visible lines.
    """
    record = _make_record(m)
    vis = m["scanline"] - FIRST_VISIBLE
    store = (vis >= 0) & (vis < VISIBLE_LINES)
    cx = jnp.where(store, m["cx"] | _collisions(record), m["cx"])
    return (
        {
            **m,
            "cx": cx,
            "scanline": m["scanline"] + 1,
            "line_cycles": m["line_cycles"] - CYCLES_PER_LINE,
        },
        record,
        store,
    )


def step_tia(m: dict, rom: jax.Array) -> dict:
    """One CPU instruction + beam bookkeeping (reference-level API).

    Instruction-granular variant used by unit tests and single-step
    debugging; ``run_frame`` uses the line-structured fast path instead
    (identical semantics, one buffer write per line instead of per
    instruction).
    """
    pre_line = m["scanline"]
    buf = m["lines"]
    m = {k: v for k, v in m.items() if k != "lines"}
    m2 = _instr(m, rom)
    advance = m2["line_cycles"] >= CYCLES_PER_LINE
    m3, record, store = _end_line(m2)
    store = store & advance
    oh = jax.nn.one_hot(
        jnp.clip(pre_line - FIRST_VISIBLE, 0, VISIBLE_LINES - 1),
        VISIBLE_LINES, dtype=jnp.int32,
    )
    lines = jnp.where(
        store,
        buf * (1 - oh[:, None]) + oh[:, None] * record[None, :],
        buf,
    )
    out = jax.tree_util.tree_map(
        lambda a, b: jnp.where(advance, a, b), m3, m2
    )
    return {**out, "lines": lines}


_LINE_BUDGET = 40  # ≥ 76 cycles / 2 cycles-per-instruction


def run_frame(m: dict, rom: jax.Array, max_instructions: int) -> dict:
    """Advance one frame: ``lax.scan`` over 262 scanlines.

    Each scan step runs a bounded ``while_loop`` of CPU instructions
    until the line's 76 cycles are consumed (WSYNC pins the counter),
    then emits that line's register snapshot as the scan output — the
    frame buffer is written once per line, not once per instruction
    (the naive form was HBM-bound on the [192, NREG] buffer).  Stops at
    the frame boundary: 262 lines, or the ROM's next VSYNC pulse
    (kernel loops signal frame completion this way).  A line with no
    cycle progress is cut off after ``_LINE_BUDGET`` instructions.
    ``max_instructions`` is kept for API compatibility (the line
    structure itself bounds the work).
    """
    del max_instructions
    # The frame buffer stays OUT of the instruction-level carry: the CPU
    # core's masked-update tree_maps would otherwise drag the [192, NREG]
    # buffer through HBM on every instruction.
    lines0 = m["lines"]
    m = {k: v for k, v in m.items() if k != "lines"}

    def line_body(carry, _):
        mm, done = carry
        pre_line = mm["scanline"]

        def cond(c):
            s, n = c
            return (s["line_cycles"] < CYCLES_PER_LINE) & (
                n < _LINE_BUDGET
            )

        def body(c):
            s, n = c
            return _instr(s, rom), n + 1

        mm2, _ = jax.lax.while_loop(cond, body, (mm, jnp.int32(0)))
        mm2, record, store = _end_line(mm2)
        done2 = done | mm2["wrapped"] | (mm2["scanline"] >= 262)
        out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(done, a, b), mm, mm2
        )
        record = jnp.where(done | ~store, 0, record)
        rowsel = jnp.where(done | ~store, 0, 1)
        # A mid-iteration VSYNC resync (inside _instr) can bump the
        # scanline counter without consuming an iteration, so the row
        # index is the SCANLINE the line closed at, not the iteration
        # position — rows are scattered by it below (advisor r4 #3).
        row = jnp.clip(
            mm2["scanline"] - 1 - FIRST_VISIBLE, 0, VISIBLE_LINES - 1
        )
        return (out, done2), (record, rowsel, row)

    m = {**m, "scanline": jnp.int32(0), "wrapped": jnp.bool_(False)}
    (m, _), (recs, rowsel, rows) = jax.lax.scan(
        line_body, (m, jnp.bool_(False)), None,
        length=FIRST_VISIBLE + VISIBLE_LINES + 30,
    )
    # Scatter records into the frame buffer by scanline index (one-hot
    # contraction: [LINES, ITERS] @ [ITERS, NREG]); rows the frame never
    # reached keep the previous frame's content.
    oh = (
        jax.nn.one_hot(rows, VISIBLE_LINES, dtype=jnp.float32)
        * rowsel[:, None]
    )  # [ITERS, LINES]
    new_rows = (oh.T @ recs.astype(jnp.float32)).astype(jnp.int32)
    written = oh.sum(axis=0).astype(jnp.int32)
    lines = jnp.where(written[:, None] != 0, new_rows, lines0)
    return {**m, "lines": lines}


def _luma(color: jax.Array) -> jax.Array:
    """NTSC color byte → gray level (luma bits 1-3 scaled to 0..255)."""
    return ((color >> 1) & 0x07) * 36


def render_frame(lines: jax.Array) -> jax.Array:
    """[VISIBLE_LINES(+1), NREG] register snapshots → [192, 160] gray.

    Compositing follows hardware priority: P0/M0 over P1/M1 over BL/PF
    over background, unless CTRLPF bit 2 (PFP) lifts PF/BL above the
    players; CTRLPF bit 1 (score mode) paints the playfield halves in
    the matching player colors.
    """
    x = jnp.arange(160)

    def line_pixels(rec):
        pf, bl, p0, p1, m0, m1 = _line_masks(rec)
        score = ((rec[R_CTRLPF] & 2) != 0) & ((rec[R_CTRLPF] & 4) == 0)
        pfp = (rec[R_CTRLPF] & 4) != 0
        pf_col = jnp.where(
            score,
            jnp.where(x < 80, _luma(rec[R_COLUP0]), _luma(rec[R_COLUP1])),
            _luma(rec[R_COLUPF]),
        )
        bk = jnp.full((160,), _luma(rec[R_COLUBK]), jnp.int32)
        c0 = _luma(rec[R_COLUP0])
        c1 = _luma(rec[R_COLUP1])
        cpf = _luma(rec[R_COLUPF])

        def put(px, mask, col):
            return jnp.where(mask, col, px)

        # Normal: BK < PF < BL < P1/M1 < P0/M0.
        norm = put(put(put(put(put(put(bk,
            pf, pf_col), bl, cpf), p1, c1), m1, c1), p0, c0), m0, c0)
        # PFP: BK < P1/M1 < P0/M0 < PF < BL.
        front = put(put(put(put(put(put(bk,
            p1, c1), m1, c1), p0, c0), m0, c0), pf, pf_col), bl, cpf)
        return jnp.where(pfp, front, norm)

    frame = jax.vmap(line_pixels)(lines[:VISIBLE_LINES])
    return jnp.clip(frame, 0, 255).astype(jnp.uint8)
