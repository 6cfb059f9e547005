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
