"""TIA scanline layer: hand-assembled kernel ROM → rendered frame.

End-to-end emulation-path test: the 6502 core races the beam (76
cycles/line, WSYNC), rewrites TIA registers per line, and the frame
renderer turns the register snapshots into pixels — all on device.
"""

import jax
import jax.numpy as jnp
import numpy as np

from envpool_tpu.envs.atari import cpu6502, tia


def _band_kernel_rom():
    """Kernel: 16-line playfield bands (PF1=$FF when line & 16)."""
    prog = []

    def emit(*b):
        prog.extend(b)

    emit(0xA9, 0x02, 0x85, 0x00)              # LDA #2; STA VSYNC
    emit(0x85, 0x02, 0x85, 0x02, 0x85, 0x02)  # 3x STA WSYNC
    emit(0xA9, 0x00, 0x85, 0x00)              # VSYNC off
    emit(0xA9, 0x0F, 0x85, 0x08)              # COLUPF = $0F (luma 7)
    emit(0xA9, 0x00, 0x85, 0x09)              # COLUBK = 0
    emit(0xA2, 37)                            # LDX #37 (vblank lines)
    blank = len(prog)
    emit(0x85, 0x02)                          # STA WSYNC
    emit(0xCA)                                # DEX
    emit(0xD0, (blank - (len(prog) + 2)) & 0xFF)  # BNE blank
    emit(0xA0, 192)                           # LDY #192
    vis = len(prog)
    emit(0x98)                                # TYA
    emit(0x29, 0x10)                          # AND #$10
    beq_at = len(prog)
    emit(0xF0, 0x00)                          # BEQ clr (patched)
    emit(0xA9, 0xFF)                          # LDA #$FF
    jmp_at = len(prog)
    emit(0x4C, 0x00, 0x00)                    # JMP set (patched)
    clr = len(prog)
    emit(0xA9, 0x00)                          # LDA #0
    set_ = len(prog)
    emit(0x85, 0x0E)                          # STA PF1
    emit(0x85, 0x02)                          # STA WSYNC
    emit(0x88)                                # DEY
    emit(0xD0, (vis - (len(prog) + 2)) & 0xFF)  # BNE vis
    spin = len(prog)
    emit(0x4C, (0xF000 + spin) & 0xFF, ((0xF000 + spin) >> 8) & 0xFF)

    prog[beq_at + 1] = (clr - (beq_at + 2)) & 0xFF
    prog[jmp_at + 1] = (0xF000 + set_) & 0xFF
    prog[jmp_at + 2] = ((0xF000 + set_) >> 8) & 0xFF

    rom = np.zeros(4096, np.uint8)
    rom[: len(prog)] = prog
    rom[0xFFC] = 0x00
    rom[0xFFD] = 0xF0
    return rom


def test_kernel_renders_playfield_bands():
    rom = _band_kernel_rom()
    m = tia.attach_tia(cpu6502.make_machine(rom))
    rom_j = jnp.asarray(rom, jnp.int32)
    m = jax.jit(tia.run_frame, static_argnums=2)(m, rom_j, 3000)
    assert int(m["scanline"]) >= tia.FIRST_VISIBLE + tia.VISIBLE_LINES
    frame = np.asarray(tia.render_frame(m["lines"]))
    assert frame.shape == (192, 160)

    # Visible row r corresponds to Y = 192 - r; band on when Y & 16.
    lit = 252  # luma(0x0F) = 7 * 36
    for r in (0, 8, 20, 40, 100, 150, 191):
        y = 192 - r
        band = bool(y & 16)
        # PF1 covers playfield bits 4-11 → pixels 16..47 (left) and
        # 96..127 (right half, repeat mode).
        px = frame[r, 20]
        px_r = frame[r, 100]
        if band:
            assert px == lit and px_r == lit, (r, px, px_r)
        else:
            assert px == 0 and px_r == 0, (r, px, px_r)
        # PF0 (pixels 0..15) stays background everywhere.
        assert frame[r, 4] == 0


def test_player_sprite_latched_position():
    """RESP0 latches the player x from the beam; GRP0 paints 8 pixels."""
    prog = []

    def emit(*b):
        prog.extend(b)

    emit(0xA9, 0x00, 0x85, 0x00)              # VSYNC off path
    emit(0xA9, 0x0E, 0x85, 0x06)              # COLUP0 = $0E (luma 7)
    emit(0xA9, 0xFF, 0x85, 0x1B)              # GRP0 = $FF
    emit(0xA2, 40)                            # LDX #40 → skip to visible
    blank = len(prog)
    emit(0x85, 0x02, 0xCA)                    # STA WSYNC; DEX
    emit(0xD0, (blank - (len(prog) + 2)) & 0xFF)
    # Burn ~20 cycles into the line, then strobe RESP0.
    for _ in range(10):
        emit(0xEA)                            # NOP x10 = 20 cycles
    emit(0x85, 0x10)                          # STA RESP0
    emit(0xA0, 100)                           # LDY #100 more lines
    vis = len(prog)
    emit(0x85, 0x02, 0x88)                    # STA WSYNC; DEY
    emit(0xD0, (vis - (len(prog) + 2)) & 0xFF)
    spin = len(prog)
    emit(0x4C, (0xF000 + spin) & 0xFF, ((0xF000 + spin) >> 8) & 0xFF)
    rom = np.zeros(4096, np.uint8)
    rom[: len(prog)] = prog
    rom[0xFFC] = 0x00
    rom[0xFFD] = 0xF0

    m = tia.attach_tia(cpu6502.make_machine(rom))
    m = jax.jit(tia.run_frame, static_argnums=2)(
        m, jnp.asarray(rom, jnp.int32), 2000
    )
    frame = np.asarray(tia.render_frame(m["lines"]))
    pos = int(m["posp0"])
    assert 0 <= pos < 152
    # Some visible row after the latch shows the 8-pixel sprite run.
    row = frame[30]
    assert (row[pos : pos + 8] == 252).all(), (pos, row[pos - 2 : pos + 10])
    assert row[pos + 9] == 0


def test_nusiz_copies_missile_and_ball():
    """NUSIZ mode 3 renders three player copies; ENAM0 missile and ENABL
    ball render at their RES-latched positions with configured widths."""
    prog = []

    def emit(*b):
        prog.extend(b)

    emit(0xA9, 0x03, 0x85, 0x04)              # NUSIZ0 = 3 (three copies)
    emit(0xA9, 0x0E, 0x85, 0x06)              # COLUP0
    emit(0xA9, 0x0E, 0x85, 0x08)              # COLUPF (ball color)
    emit(0xA9, 0x80, 0x85, 0x1B)              # GRP0 = $80 (leftmost bit)
    emit(0xA9, 0x02, 0x85, 0x1D)              # ENAM0 on
    emit(0xA9, 0x02, 0x85, 0x1F)              # ENABL on
    emit(0xA9, 0x30, 0x85, 0x0A)              # CTRLPF: ball width 8
    emit(0xA2, 40)                            # skip to visible
    blank = len(prog)
    emit(0x85, 0x02, 0xCA)
    emit(0xD0, (blank - (len(prog) + 2)) & 0xFF)
    # Latch player at ~beam, then missile later, ball later still.
    for _ in range(8):
        emit(0xEA)
    emit(0x85, 0x10)                          # RESP0
    for _ in range(6):
        emit(0xEA)
    emit(0x85, 0x12)                          # RESM0
    for _ in range(6):
        emit(0xEA)
    emit(0x85, 0x14)                          # RESBL
    emit(0xA0, 100)
    vis = len(prog)
    emit(0x85, 0x02, 0x88)
    emit(0xD0, (vis - (len(prog) + 2)) & 0xFF)
    spin = len(prog)
    emit(0x4C, (0xF000 + spin) & 0xFF, ((0xF000 + spin) >> 8) & 0xFF)
    rom = np.zeros(4096, np.uint8)
    rom[: len(prog)] = prog
    rom[0xFFC] = 0x00
    rom[0xFFD] = 0xF0

    m = tia.attach_tia(cpu6502.make_machine(rom))
    m = jax.jit(tia.run_frame, static_argnums=2)(
        m, jnp.asarray(rom, jnp.int32), 2500
    )
    frame = np.asarray(tia.render_frame(m["lines"]))
    row = frame[30]
    p0 = int(m["posp0"])
    pm = int(m["posm0"])
    pb = int(m["posbl"])
    # Three single-pixel copies of GRP0 bit 7 at +0/+16/+32.
    for off in (0, 16, 32):
        assert row[p0 + off] == 252, (p0, off, row[p0 + off])
        assert row[p0 + off + 1] == 0 or (p0 + off + 1) in (pm, pb)
    # Missile: default width 1 at its own latch position.
    assert row[pm] == 252
    # Ball: 8 wide at COLUPF.
    assert (row[pb : pb + 8] == 252).all(), (pb, row[pb : pb + 8])


# ---------------------------------------------------------------------------
# Depth round 2: HMOVE, REFP, score/priority, VDEL, collision latches.
# ---------------------------------------------------------------------------


def _rom_from(prog):
    rom = np.zeros(4096, np.uint8)
    rom[: len(prog)] = prog
    rom[0xFFC] = 0x00
    rom[0xFFD] = 0xF0
    return rom


def _run(rom, n=4000):
    m = tia.attach_tia(cpu6502.make_machine(rom))
    m = jax.jit(tia.run_frame, static_argnums=2)(
        m, jnp.asarray(rom, jnp.int32), n
    )
    return m


def _blank_then(prog, nlines=40):
    """Emit the 40 vsync+vblank WSYNC lines preamble."""
    prog.extend([0xA2, nlines])               # LDX #nlines
    blank = len(prog)
    prog.extend([0x85, 0x02, 0xCA])           # STA WSYNC; DEX
    prog.extend([0xD0, (blank - (len(prog) + 2)) & 0xFF])


def _visible(prog, nlines):
    prog.extend([0xA0, nlines])               # LDY #nlines
    vis = len(prog)
    prog.extend([0x85, 0x02, 0x88])           # STA WSYNC; DEY
    prog.extend([0xD0, (vis - (len(prog) + 2)) & 0xFF])


def _spin(prog):
    spin = len(prog)
    prog.extend([0x4C, (0xF000 + spin) & 0xFF, ((0xF000 + spin) >> 8) & 0xFF])


def _hmove_rom(extra):
    """Latch RESP0 mid-line, then run ``extra`` bytes, then visible lines."""
    prog = [0xA9, 0x0E, 0x85, 0x06,           # COLUP0
            0xA9, 0xFF, 0x85, 0x1B]           # GRP0 = $FF
    _blank_then(prog)
    prog.extend([0xEA] * 10)                  # burn 20 cycles into the line
    prog.extend([0x85, 0x10])                 # STA RESP0
    prog.extend(extra)
    _visible(prog, 100)
    _spin(prog)
    return _rom_from(prog)


def test_hmove_signed_motion():
    base = int(_run(_hmove_rom([]))["posp0"])
    # HMP0 = $70 (+7) moves the player LEFT seven pixels.
    left = _run(_hmove_rom([
        0xA9, 0x70, 0x85, 0x20,               # HMP0 = $70
        0x85, 0x02,                           # STA WSYNC
        0x85, 0x2A,                           # STA HMOVE
    ]))
    assert int(left["posp0"]) == (base - 7) % 160
    # HMP0 = $80 (−8) moves it RIGHT eight pixels.
    right = _run(_hmove_rom([
        0xA9, 0x80, 0x85, 0x20,
        0x85, 0x02, 0x85, 0x2A,
    ]))
    assert int(right["posp0"]) == (base + 8) % 160
    # HMCLR before HMOVE leaves the position unchanged.
    cleared = _run(_hmove_rom([
        0xA9, 0x70, 0x85, 0x20,
        0x85, 0x2B,                           # STA HMCLR
        0x85, 0x02, 0x85, 0x2A,
    ]))
    assert int(cleared["posp0"]) == base


def test_refp_reflects_player_graphics():
    """GRP0=$C0: bits 7,6 render at +0,+1 normally; +6,+7 reflected."""
    prog = [0xA9, 0x0E, 0x85, 0x06,           # COLUP0
            0xA9, 0xC0, 0x85, 0x1B]           # GRP0 = $C0
    _blank_then(prog)
    _visible(prog, 96)                        # rows 0..95: normal
    prog.extend([0xA9, 0x08, 0x85, 0x0B])     # REFP0 bit 3 set
    _visible(prog, 96)                        # rows 96..191: reflected
    _spin(prog)
    m = _run(_rom_from(prog))
    frame = np.asarray(tia.render_frame(m["lines"]))
    p = int(m["posp0"])
    assert (frame[30, p : p + 2] == 252).all()
    assert (frame[30, p + 6 : p + 8] == 0).all()
    assert (frame[150, p : p + 2] == 0).all()
    assert (frame[150, p + 6 : p + 8] == 252).all()


def test_ctrlpf_score_and_priority_modes():
    """Score mode paints PF halves in player colors; PFP lifts PF over
    the players."""
    prog = [0xA9, 0xFF, 0x85, 0x0D, 0x85, 0x0E, 0x85, 0x0F,  # PF solid
            0xA9, 0x0E, 0x85, 0x06,           # COLUP0 → luma 252
            0xA9, 0x04, 0x85, 0x07,           # COLUP1 → luma 72
            0xA9, 0x0A, 0x85, 0x08,           # COLUPF → luma 180
            0xA9, 0x02, 0x85, 0x0A]           # CTRLPF = score
    _blank_then(prog)
    _visible(prog, 64)                        # rows 0..63: score mode
    prog.extend([0xA9, 0xFF, 0x85, 0x1B])     # GRP0=$FF (player at pos 0)
    prog.extend([0xA9, 0x04, 0x85, 0x0A])     # CTRLPF = PF priority
    _visible(prog, 64)                        # rows 64..127: PFP
    prog.extend([0xA9, 0x00, 0x85, 0x0A])     # CTRLPF = normal
    _visible(prog, 64)                        # rows 128..191: player on top
    _spin(prog)
    m = _run(_rom_from(prog))
    frame = np.asarray(tia.render_frame(m["lines"]))
    # Score mode: left half in COLUP0, right half in COLUP1.
    assert frame[30, 10] == 252 and frame[30, 100] == 72
    p = int(m["posp0"])
    # PFP: playfield color wins where the player overlaps it.
    assert frame[90, p + 1] == 180
    # Normal: player color wins.
    assert frame[160, p + 1] == 252


def test_vdel_double_buffers_grp0():
    """With VDELP0 set, a GRP0 write only shows after a GRP1 write
    latches it into the old register (the standard 2-line kernel)."""
    prog = [0xA9, 0x0E, 0x85, 0x06,           # COLUP0
            0xA9, 0x01, 0x85, 0x25,           # VDELP0 = 1
            0xA9, 0xFF, 0x85, 0x1B]           # GRP0 new = $FF (hidden)
    _blank_then(prog)
    _visible(prog, 96)                        # rows 0..95: hidden
    prog.extend([0xA9, 0x00, 0x85, 0x1C])     # GRP1 write → old GRP0=$FF
    _visible(prog, 96)                        # rows 96..191: shown
    _spin(prog)
    m = _run(_rom_from(prog))
    frame = np.asarray(tia.render_frame(m["lines"]))
    p = int(m["posp0"])
    assert (frame[30, p : p + 8] == 0).all()
    assert (frame[150, p : p + 8] == 252).all()


def test_collision_latches_and_cxclr_via_bus():
    """P0 overlapping the playfield sets CXP0FB bit 7, readable at $02;
    CXCLR clears it.  Reads happen in overscan (no re-latching)."""
    prog = [0xA9, 0x0E, 0x85, 0x06,           # COLUP0
            0xA9, 0x0F, 0x85, 0x08,           # COLUPF
            0xA9, 0xFF, 0x85, 0x1B,           # GRP0 = $FF at pos 0
            0xA9, 0xF0, 0x85, 0x0D]           # PF0 → pixels 0..15 on
    _blank_then(prog)
    _visible(prog, 192)
    # Overscan: read latches through the TIA bus, then clear, read again.
    prog.extend([0xA5, 0x02, 0x85, 0x80])     # LDA CXP0FB; STA $80
    prog.extend([0xA5, 0x07, 0x85, 0x81])     # LDA CXPPMM; STA $81
    prog.extend([0x85, 0x2C])                 # STA CXCLR
    prog.extend([0xA5, 0x02, 0x85, 0x82])     # LDA CXP0FB; STA $82
    _spin(prog)
    m = _run(_rom_from(prog), n=6000)
    ram = np.asarray(m["ram"])
    assert ram[0] & 0x80, hex(int(ram[0]))    # P0·PF latched
    assert ram[1] == 0                        # no P0·P1 / M0·M1
    assert ram[2] == 0                        # cleared by CXCLR
    cx = np.asarray(m["cx"])
    assert cx[2] == 0                         # state agrees post-clear
