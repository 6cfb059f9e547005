"""6502 CPU interpreter — vectorizable pure-JAX core (the ALE-emulation
path's foundation).

The reference runs ALE — a 6502+TIA emulator — on CPU worker threads
(``envpool/atari/atari_env.h:193-209`` drives ``ale->act``).  The
TPU-native equivalent keeps machine state as small int arrays and steps
instructions as a pure function, so a whole pool of machines advances
under one ``vmap``: registers are ``[B]`` vectors, RAM is ``[B, 128]``,
and each instruction step is a fixed dataflow over decode TABLES (no
data-dependent Python control flow):

* opcode → (addressing mode, operation, size, cycles) via static numpy
  tables indexed by one-hot contraction (vector-index gathers are a TPU
  pathology — docs/benchmark.md);
* effective-address computation: all 13 addressing modes evaluated
  branchlessly and selected by mode id;
* operation semantics: every op computes its (result, flags, side
  effects) on the fetched operand; a select tree keyed on the op id
  merges them.  Under ``vmap`` this is the standard SIMD-interpreter
  layout (every lane pays the union of ops — exactly how GPU/TPU
  emulators are written).

Memory map (Atari 2600): ``$00-$7F`` TIA registers (reads return the
collision-latch stub, writes land in a 64-byte TIA register file),
``$80-$FF`` RIOT RAM (the canonical 128 bytes — ALE's ``info:ram``),
``$280-$29F`` RIOT I/O (SWCHA joystick, INTIM timer), ``$F000-$FFFF``
ROM (4K, mirrored by masking).  Scope note: no cycle-exact TIA beam —
this module is the CPU/bus layer; no ROM assets ship in this image, so
correctness is pinned by lockstep fuzzing against an independently
written scalar 6502 (``tests/oracle_fixtures/independent/
scalar_6502.py``) over randomized instruction streams, chess-perft-grade
evidence for ISA correctness.

All official opcodes and addressing modes are implemented with exact
NVZC/BDI flag semantics (including ADC/SBC decimal-mode-off behavior,
page-crossing-free timing is NOT modeled — ``cycles`` uses base costs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["CPU_TABLES", "make_machine", "step_instruction", "run"]

# Addressing modes.
IMP, ACC, IMM, ZP, ZPX, ZPY, ABS, ABX, ABY, IND, IZX, IZY, REL = range(13)

# Operations (op ids).
(
    O_LDA, O_LDX, O_LDY, O_STA, O_STX, O_STY, O_TAX, O_TAY, O_TXA, O_TYA,
    O_TSX, O_TXS, O_PHA, O_PHP, O_PLA, O_PLP, O_AND, O_ORA, O_EOR, O_ADC,
    O_SBC, O_CMP, O_CPX, O_CPY, O_INC, O_INX, O_INY, O_DEC, O_DEX, O_DEY,
    O_ASL, O_LSR, O_ROL, O_ROR, O_JMP, O_JSR, O_RTS, O_BCC, O_BCS, O_BEQ,
    O_BMI, O_BNE, O_BPL, O_BVC, O_BVS, O_BIT, O_BRK, O_RTI, O_CLC, O_CLD,
    O_CLI, O_CLV, O_SEC, O_SED, O_SEI, O_NOP,
) = range(56)

# Flag bit positions in P.
F_C, F_Z, F_I, F_D, F_B, F_U, F_V, F_N = 0, 1, 2, 3, 4, 5, 6, 7


def _build_tables():
    """(mode[256], op[256], size[256], cycles[256]) int32 numpy tables."""
    mode = np.full(256, IMP, np.int32)
    op = np.full(256, O_NOP, np.int32)
    cyc = np.full(256, 2, np.int32)

    def put(code, o, m, c):
        op[code] = o
        mode[code] = m
        cyc[code] = c

    # Load/store.
    for o, codes in (
        (O_LDA, [(0xA9, IMM, 2), (0xA5, ZP, 3), (0xB5, ZPX, 4),
                 (0xAD, ABS, 4), (0xBD, ABX, 4), (0xB9, ABY, 4),
                 (0xA1, IZX, 6), (0xB1, IZY, 5)]),
        (O_LDX, [(0xA2, IMM, 2), (0xA6, ZP, 3), (0xB6, ZPY, 4),
                 (0xAE, ABS, 4), (0xBE, ABY, 4)]),
        (O_LDY, [(0xA0, IMM, 2), (0xA4, ZP, 3), (0xB4, ZPX, 4),
                 (0xAC, ABS, 4), (0xBC, ABX, 4)]),
        (O_STA, [(0x85, ZP, 3), (0x95, ZPX, 4), (0x8D, ABS, 4),
                 (0x9D, ABX, 5), (0x99, ABY, 5), (0x81, IZX, 6),
                 (0x91, IZY, 6)]),
        (O_STX, [(0x86, ZP, 3), (0x96, ZPY, 4), (0x8E, ABS, 4)]),
        (O_STY, [(0x84, ZP, 3), (0x94, ZPX, 4), (0x8C, ABS, 4)]),
        (O_AND, [(0x29, IMM, 2), (0x25, ZP, 3), (0x35, ZPX, 4),
                 (0x2D, ABS, 4), (0x3D, ABX, 4), (0x39, ABY, 4),
                 (0x21, IZX, 6), (0x31, IZY, 5)]),
        (O_ORA, [(0x09, IMM, 2), (0x05, ZP, 3), (0x15, ZPX, 4),
                 (0x0D, ABS, 4), (0x1D, ABX, 4), (0x19, ABY, 4),
                 (0x01, IZX, 6), (0x11, IZY, 5)]),
        (O_EOR, [(0x49, IMM, 2), (0x45, ZP, 3), (0x55, ZPX, 4),
                 (0x4D, ABS, 4), (0x5D, ABX, 4), (0x59, ABY, 4),
                 (0x41, IZX, 6), (0x51, IZY, 5)]),
        (O_ADC, [(0x69, IMM, 2), (0x65, ZP, 3), (0x75, ZPX, 4),
                 (0x6D, ABS, 4), (0x7D, ABX, 4), (0x79, ABY, 4),
                 (0x61, IZX, 6), (0x71, IZY, 5)]),
        (O_SBC, [(0xE9, IMM, 2), (0xE5, ZP, 3), (0xF5, ZPX, 4),
                 (0xED, ABS, 4), (0xFD, ABX, 4), (0xF9, ABY, 4),
                 (0xE1, IZX, 6), (0xF1, IZY, 5)]),
        (O_CMP, [(0xC9, IMM, 2), (0xC5, ZP, 3), (0xD5, ZPX, 4),
                 (0xCD, ABS, 4), (0xDD, ABX, 4), (0xD9, ABY, 4),
                 (0xC1, IZX, 6), (0xD1, IZY, 5)]),
        (O_CPX, [(0xE0, IMM, 2), (0xE4, ZP, 3), (0xEC, ABS, 4)]),
        (O_CPY, [(0xC0, IMM, 2), (0xC4, ZP, 3), (0xCC, ABS, 4)]),
        (O_INC, [(0xE6, ZP, 5), (0xF6, ZPX, 6), (0xEE, ABS, 6),
                 (0xFE, ABX, 7)]),
        (O_DEC, [(0xC6, ZP, 5), (0xD6, ZPX, 6), (0xCE, ABS, 6),
                 (0xDE, ABX, 7)]),
        (O_ASL, [(0x0A, ACC, 2), (0x06, ZP, 5), (0x16, ZPX, 6),
                 (0x0E, ABS, 6), (0x1E, ABX, 7)]),
        (O_LSR, [(0x4A, ACC, 2), (0x46, ZP, 5), (0x56, ZPX, 6),
                 (0x4E, ABS, 6), (0x5E, ABX, 7)]),
        (O_ROL, [(0x2A, ACC, 2), (0x26, ZP, 5), (0x36, ZPX, 6),
                 (0x2E, ABS, 6), (0x3E, ABX, 7)]),
        (O_ROR, [(0x6A, ACC, 2), (0x66, ZP, 5), (0x76, ZPX, 6),
                 (0x6E, ABS, 6), (0x7E, ABX, 7)]),
        (O_BIT, [(0x24, ZP, 3), (0x2C, ABS, 4)]),
        (O_JMP, [(0x4C, ABS, 3), (0x6C, IND, 5)]),
        (O_JSR, [(0x20, ABS, 6)]),
    ):
        for code, m, c in codes:
            put(code, o, m, c)

    # Implied / single-byte.
    for code, o, c in (
        (0xAA, O_TAX, 2), (0xA8, O_TAY, 2), (0x8A, O_TXA, 2),
        (0x98, O_TYA, 2), (0xBA, O_TSX, 2), (0x9A, O_TXS, 2),
        (0x48, O_PHA, 3), (0x08, O_PHP, 3), (0x68, O_PLA, 4),
        (0x28, O_PLP, 4), (0xE8, O_INX, 2), (0xC8, O_INY, 2),
        (0xCA, O_DEX, 2), (0x88, O_DEY, 2), (0x60, O_RTS, 6),
        (0x00, O_BRK, 7), (0x40, O_RTI, 6), (0x18, O_CLC, 2),
        (0xD8, O_CLD, 2), (0x58, O_CLI, 2), (0xB8, O_CLV, 2),
        (0x38, O_SEC, 2), (0xF8, O_SED, 2), (0x78, O_SEI, 2),
        (0xEA, O_NOP, 2),
    ):
        put(code, o, IMP, c)

    # Branches (relative).
    for code, o in (
        (0x90, O_BCC), (0xB0, O_BCS), (0xF0, O_BEQ), (0x30, O_BMI),
        (0xD0, O_BNE), (0x10, O_BPL), (0x50, O_BVC), (0x70, O_BVS),
    ):
        put(code, o, REL, 2)

    size = np.ones(256, np.int32)
    size[(mode == IMM) | (mode == ZP) | (mode == ZPX) | (mode == ZPY)
         | (mode == IZX) | (mode == IZY) | (mode == REL)] = 2
    size[(mode == ABS) | (mode == ABX) | (mode == ABY) | (mode == IND)] = 3
    size[(mode == IMP) | (mode == ACC)] = 1
    return mode, op, size, cyc


CPU_TABLES = _build_tables()
# Packed [256, 4] decode table: one one-hot contraction yields
# (mode, op, size, cycles) together instead of four separate reads.
_T_PACKED = jnp.asarray(np.stack(CPU_TABLES, axis=1))


def make_machine(rom: np.ndarray) -> dict:
    """Fresh machine state (PC ← reset vector $FFFC/D of the start bank).

    ROM sizes: 4K (plain), 8K (F8 bankswitching, hotspots $1FF8/$1FF9,
    powers up in bank 1 as on Stella), 16K (F6, hotspots $1FF6-$1FF9,
    powers up in bank 0).  Bank state lives in ``bank``; switching is
    triggered by data/jump accesses to the hotspot addresses
    (step_instruction), the standard cartridge idiom.
    """
    rom = np.asarray(rom, np.uint8)
    n = rom.shape[0]
    assert n in (4096, 8192, 16384), rom.shape
    nbanks = n // 4096
    start_bank = 1 if nbanks == 2 else 0
    base = start_bank * 4096
    pc = int(rom[base + 0xFFC]) | (int(rom[base + 0xFFD]) << 8)
    return {
        "bank": jnp.int32(start_bank),
        "a": jnp.int32(0),
        "x": jnp.int32(0),
        "y": jnp.int32(0),
        "sp": jnp.int32(0xFD),
        "pc": jnp.int32(pc),
        "p": jnp.int32((1 << F_U) | (1 << F_I)),
        "ram": jnp.zeros(128, jnp.int32),
        "tia": jnp.zeros(64, jnp.int32),
        "tia_waddr": jnp.int32(-1),  # last TIA write this instruction
        "swcha": jnp.int32(0xFF),  # joystick byte (active-low)
        "inpt4": jnp.int32(0x80),  # P0 fire button, bit 7 active-low
        "cycles": jnp.int32(0),
    }


def _onehot_read(table: jax.Array, idx: jax.Array, n: int) -> jax.Array:
    oh = jax.nn.one_hot(jnp.clip(idx, 0, n - 1), n, dtype=jnp.float32)
    return (oh @ table.astype(jnp.float32)).astype(jnp.int32)


def _rom_read(rom: jax.Array, idx: jax.Array) -> jax.Array:
    """Factored two-level one-hot ROM read (row 64-chunk, then column).

    A flat one-hot over a 4-16K ROM materializes [B, 4096+] floats per
    read under vmap — HBM-bound (measured 5x the whole-step cost).  The
    64-way factorization turns it into a [B, R] @ [R, 64] matmul plus a
    64-wide select: 32-64x less traffic, and the matmul rides the MXU.
    """
    rom2d = rom.reshape(-1, 64).astype(jnp.float32)
    r = rom2d.shape[0]
    oh_hi = jax.nn.one_hot(jnp.clip(idx >> 6, 0, r - 1), r,
                           dtype=jnp.float32)
    row = oh_hi @ rom2d
    oh_lo = jax.nn.one_hot(idx & 63, 64, dtype=jnp.float32)
    return (row * oh_lo).sum(-1).astype(jnp.int32)


def _ram_sel(addr: jax.Array) -> jax.Array:
    """RIOT RAM chip select: A12=0, A9=0, A7=1 — $80-$FF plus the $180-$1FF
    mirror the 6502 stack page lives in on a real 2600."""
    return (
        (addr < 0x1000) & ((addr & 0x200) == 0) & ((addr & 0x80) == 0x80)
    )


def _bus_nonrom(m: dict, addr: jax.Array) -> jax.Array:
    """Non-ROM bus read; vectorizes over an index array ``addr`` [K].

    When the machine carries TIA beam state (``cx`` present, i.e. after
    ``tia.attach_tia``), the TIA read map decodes ``addr & 0xF`` as on
    hardware: $x0-$x7 are the collision latches CXM0P..CXPPMM, $xC/$xD
    the INPT4/INPT5 triggers.  Bare-CPU machines keep the minimal stub
    (INPT4 at $3C) so the ISA fuzz tests see a quiet bus.
    """
    addr = addr & 0x1FFF
    is_ram = _ram_sel(addr)
    is_swcha = addr == 0x280
    oh = jax.nn.one_hot(addr & 0x7F, 128, dtype=jnp.float32)
    ram_v = (oh @ m["ram"].astype(jnp.float32)).astype(jnp.int32)
    v = jnp.where(is_ram, ram_v, 0)
    v = jnp.where(is_swcha, m["swcha"], v)
    inpt4 = m.get("inpt4", jnp.int32(0x80))
    inpt5 = m.get("inpt5", jnp.int32(0x80))
    if "cx" in m:
        is_tia_rd = (
            (addr < 0x1000) & ((addr & 0x80) == 0) & ((addr & 0x200) == 0)
        )
        idx = addr & 0x0F
        cx_v = _onehot_read(m["cx"], idx, 8)
        tia_v = jnp.where(idx < 8, cx_v, 0)
        tia_v = jnp.where(idx == 0xC, inpt4, tia_v)
        tia_v = jnp.where(idx == 0xD, inpt5, tia_v)
        v = jnp.where(is_tia_rd, tia_v, v)
    else:
        v = jnp.where(addr == 0x3C, inpt4, v)
    return v & 0xFF


def _rom_idx(m: dict, rom: jax.Array, addr: jax.Array) -> jax.Array:
    """Cartridge-space index for ``addr`` (banked window when >4K)."""
    if rom.shape[0] > 4096:
        return m["bank"] * 4096 + (addr & 0xFFF)
    return addr & 0xFFF


def _read(m: dict, rom: jax.Array, addr: jax.Array) -> jax.Array:
    """Full bus read, scalar or vectorized over an index array [K].

    A [K] call groups its K ROM lookups into ONE two-level contraction
    ([K,R]@[R,64] + 64-select); the per-instruction read plan batches
    independent reads through here so a step costs 2 grouped ROM
    matmuls instead of ~10 scalar ones.
    """
    a = addr & 0x1FFF
    rom_v = _rom_read(rom, _rom_idx(m, rom, a))
    return jnp.where(a >= 0x1000, rom_v, _bus_nonrom(m, a))


def _write(m: dict, addr: jax.Array, value: jax.Array) -> dict:
    addr = addr & 0x1FFF
    value = value & 0xFF
    is_ram = _ram_sel(addr)
    is_tia = (addr < 0x40) & (addr < 0x1000)
    oh_r = jax.nn.one_hot(addr & 0x7F, 128, dtype=jnp.int32)
    ram = jnp.where(is_ram, m["ram"] * (1 - oh_r) + oh_r * value, m["ram"])
    tia_i = jnp.clip(addr, 0, 63)
    oh_t = jax.nn.one_hot(tia_i, 64, dtype=jnp.int32)
    tia = jnp.where(is_tia, m["tia"] * (1 - oh_t) + oh_t * value, m["tia"])
    # Record the TIA write target (strobe detection for the TIA layer).
    waddr = jnp.where(
        is_tia, addr, m.get("tia_waddr", jnp.int32(-1))
    ).astype(jnp.int32)
    return {**m, "ram": ram, "tia": tia, "tia_waddr": waddr}


def _set_zn(p: jax.Array, v: jax.Array) -> jax.Array:
    z = (v & 0xFF) == 0
    n = (v & 0x80) != 0
    p = p & ~((1 << F_Z) | (1 << F_N))
    return p | z.astype(jnp.int32) << F_Z | n.astype(jnp.int32) << F_N


def step_instruction(m: dict, rom: jax.Array) -> dict:
    """Execute ONE instruction; returns the new machine state."""
    m = {**m, "tia_waddr": jnp.int32(-1)}  # fresh strobe capture
    pc = m["pc"]
    # Read plan round 1: the three instruction bytes in ONE grouped
    # bus read (one two-level ROM contraction for all three).
    fetch = _read(m, rom, jnp.stack([pc, pc + 1, pc + 2]))
    opcode, b1, b2 = fetch[0], fetch[1], fetch[2]
    dec = (
        jax.nn.one_hot(jnp.clip(opcode, 0, 255), 256, dtype=jnp.float32)
        @ _T_PACKED.astype(jnp.float32)
    ).astype(jnp.int32)
    mode, op, size, cycles = dec[0], dec[1], dec[2], dec[3]
    a, x, y, sp, p = m["a"], m["x"], m["y"], m["sp"], m["p"]

    # --- effective address per mode (all computed; selected by id) -----
    abs_addr = b1 | (b2 << 8)
    zp_a = b1
    zpx_a = (b1 + x) & 0xFF
    zpy_a = (b1 + y) & 0xFF
    abx_a = (abs_addr + x) & 0xFFFF
    aby_a = (abs_addr + y) & 0xFFFF
    # (zp),Y and (zp,X): pointer reads from zero page — outside RAM on a
    # 2600 this reads TIA/zero, matching the bus model.
    izx_ptr = (b1 + x) & 0xFF
    # Pointer reads are zero-page (never ROM): one vectorized non-ROM
    # bus read covers both (zp,X) and (zp),Y pointer pairs.
    zp_ptrs = _bus_nonrom(
        m,
        jnp.stack([izx_ptr, (izx_ptr + 1) & 0xFF, b1, (b1 + 1) & 0xFF]),
    )
    izx_a = zp_ptrs[0] | (zp_ptrs[1] << 8)
    izy_a = ((zp_ptrs[2] | (zp_ptrs[3] << 8)) + y) & 0xFFFF

    # Pre-indirect effective address (IND lanes resolved below; a JMP
    # (ind) never uses its operand, so reading mem at abs_addr for those
    # lanes is harmless).
    addr_pre = jnp.select(
        [mode == ZP, mode == ZPX, mode == ZPY, mode == ABS, mode == ABX,
         mode == ABY, mode == IZX, mode == IZY, mode == IND],
        [zp_a, zpx_a, zpy_a, abs_addr, abx_a, aby_a, izx_a, izy_a,
         abs_addr],
        jnp.int32(0),
    )
    # Read plan round 2: JMP-(ind) vector bytes (with the 6502
    # page-wrap bug) + the memory operand, in one grouped bus read.
    r2 = _read(
        m, rom,
        jnp.stack([
            abs_addr,
            (abs_addr & 0xFF00) | ((abs_addr + 1) & 0xFF),
            addr_pre,
        ]),
    )
    ind_a = r2[0] | (r2[1] << 8)
    addr = jnp.where(mode == IND, ind_a, addr_pre)
    mem_v = r2[2]
    operand = jnp.select(
        [mode == IMM, mode == ACC], [b1, a], mem_v
    )

    # --- ALU / flag results (all computed; selected by op id) ----------
    carry = p >> F_C & 1
    decimal = (p >> F_D & 1) != 0
    # ADC binary.
    adc_sum = a + operand + carry
    adc_rb = adc_sum & 0xFF
    adc_cb = (adc_sum > 0xFF).astype(jnp.int32)
    # ADC decimal (NMOS): low nibble fixed first; N/V from the
    # intermediate high byte; C after the high fix; Z stays BINARY.
    d_lo = (a & 0x0F) + (operand & 0x0F) + carry
    d_hi = (a & 0xF0) + (operand & 0xF0)
    lo_fix = d_lo > 0x09
    d_hi = d_hi + jnp.where(lo_fix, 0x10, 0)
    d_lo = d_lo + jnp.where(lo_fix, 0x06, 0)
    adc_v_dec = ((~(a ^ operand) & (a ^ d_hi)) & 0x80) != 0
    adc_n_dec = (d_hi & 0x80) != 0
    hi_fix = d_hi > 0x90
    d_hi = d_hi + jnp.where(hi_fix, 0x60, 0)
    adc_c_dec = (d_hi > 0xF0).astype(jnp.int32)
    adc_r_dec = ((d_lo & 0x0F) | (d_hi & 0xF0)) & 0xFF
    adc_r = jnp.where(decimal, adc_r_dec, adc_rb)
    adc_c = jnp.where(decimal, adc_c_dec, adc_cb)
    adc_v = jnp.where(
        decimal, adc_v_dec, ((~(a ^ operand) & (a ^ adc_sum)) & 0x80) != 0
    )
    # SBC: flags always binary; decimal adjusts the RESULT only (NMOS).
    sbc_op = operand ^ 0xFF
    sbc_sum = a + sbc_op + carry
    sbc_rb = sbc_sum & 0xFF
    sbc_c = (sbc_sum > 0xFF).astype(jnp.int32)
    sbc_v = ((~(a ^ sbc_op) & (a ^ sbc_sum)) & 0x80) != 0
    s_lo = (a & 0x0F) - (operand & 0x0F) - (1 - carry)
    lo_borrow = (s_lo & 0x10) != 0
    s_lo = s_lo - jnp.where(lo_borrow, 6, 0)
    s_hi = (a >> 4) - (operand >> 4) - lo_borrow.astype(jnp.int32)
    hi_borrow = (s_hi & 0x10) != 0
    s_hi = s_hi - jnp.where(hi_borrow, 6, 0)
    sbc_r_dec = ((s_lo & 0x0F) | ((s_hi & 0x0F) << 4)) & 0xFF
    sbc_r = jnp.where(decimal, sbc_r_dec, sbc_rb)
    asl_r = (operand << 1) & 0xFF
    asl_c = operand >> 7 & 1
    lsr_r = operand >> 1
    lsr_c = operand & 1
    rol_r = ((operand << 1) | carry) & 0xFF
    ror_r = (operand >> 1) | (carry << 7)

    is_cmp = (op == O_CMP) | (op == O_CPX) | (op == O_CPY)
    cmp_src = jnp.select([op == O_CPX, op == O_CPY], [x, y], a)
    cmp_d = (cmp_src - operand) & 0x1FF

    # --- register file updates ----------------------------------------
    new_a = jnp.select(
        [op == O_LDA, op == O_AND, op == O_ORA, op == O_EOR, op == O_ADC,
         op == O_SBC, op == O_TXA, op == O_TYA, op == O_PLA,
         (op == O_ASL) & (mode == ACC), (op == O_LSR) & (mode == ACC),
         (op == O_ROL) & (mode == ACC), (op == O_ROR) & (mode == ACC)],
        [operand, a & operand, a | operand, a ^ operand, adc_r,
         sbc_r, x, y, jnp.int32(0),  # PLA patched below
         asl_r, lsr_r, rol_r, ror_r],
        a,
    )
    new_x = jnp.select(
        [op == O_LDX, op == O_TAX, op == O_TSX, op == O_INX, op == O_DEX],
        [operand, a, sp, (x + 1) & 0xFF, (x - 1) & 0xFF], x,
    )
    new_y = jnp.select(
        [op == O_LDY, op == O_TAY, op == O_INY, op == O_DEY],
        [operand, a, (y + 1) & 0xFF, (y - 1) & 0xFF], y,
    )

    # --- stack (lives in RAM $80-$FF; SP is an offset into $100 page,
    # which mirrors RAM on the 2600) ------------------------------------
    def stack_pull_addr(ssp):
        return 0x100 + ((ssp + 1) & 0xFF)

    is_jsr = op == O_JSR
    is_pha = op == O_PHA
    is_php = op == O_PHP
    ret_pc = (pc + 2) & 0xFFFF  # JSR pushes PC+2 (addr of last byte)
    # Pushes (at most two bytes; JSR pushes hi then lo).
    push1_v = jnp.select(
        [is_jsr, is_pha, is_php],
        [ret_pc >> 8, a, p | (1 << F_B) | (1 << F_U)],
        jnp.int32(0),
    )
    do_push1 = is_jsr | is_pha | is_php
    sp1 = jnp.where(do_push1, (sp - 1) & 0xFF, sp)
    m2 = jax.tree_util.tree_map(
        lambda new, old: jnp.where(do_push1, new, old),
        _write(m, 0x100 + sp, push1_v), m,
    )
    do_push2 = is_jsr
    m3 = jax.tree_util.tree_map(
        lambda new, old: jnp.where(do_push2, new, old),
        _write(m2, 0x100 + sp1, ret_pc & 0xFF), m2,
    )
    sp2 = jnp.where(do_push2, (sp1 - 1) & 0xFF, sp1)

    # Pulls.
    is_pla = op == O_PLA
    is_plp = op == O_PLP
    is_rts = op == O_RTS
    is_rti = op == O_RTI
    # Stack pulls: the stack page ($100-$1FF) is never ROM; one
    # vectorized non-ROM read covers all three potential pulls.
    sp3 = jnp.where(
        is_pla | is_plp | is_rts | is_rti, (sp2 + 1) & 0xFF, sp2
    )
    sp4 = jnp.where(is_rts | is_rti, (sp3 + 1) & 0xFF, sp3)
    pulls = _bus_nonrom(
        m3,
        jnp.stack([
            stack_pull_addr(sp2), stack_pull_addr(sp3),
            stack_pull_addr(sp4),
        ]),
    )
    pull1, pull2, pull3 = pulls[0], pulls[1], pulls[2]
    sp5 = jnp.where(is_rti, (sp4 + 1) & 0xFF, sp4)
    new_sp = jnp.where(op == O_TXS, x, sp5)
    new_a = jnp.where(is_pla, pull1, new_a)

    # --- memory write-back ops -----------------------------------------
    store_v = jnp.select(
        [op == O_STA, op == O_STX, op == O_STY, op == O_INC, op == O_DEC,
         op == O_ASL, op == O_LSR, op == O_ROL, op == O_ROR],
        [a, x, y, (mem_v + 1) & 0xFF, (mem_v - 1) & 0xFF,
         asl_r, lsr_r, rol_r, ror_r],
        jnp.int32(0),
    )
    do_store = (
        (op == O_STA) | (op == O_STX) | (op == O_STY) | (op == O_INC)
        | (op == O_DEC)
        | (((op == O_ASL) | (op == O_LSR) | (op == O_ROL) | (op == O_ROR))
           & (mode != ACC))
    )
    m4 = jax.tree_util.tree_map(
        lambda new, old: jnp.where(do_store, new, old),
        _write(m3, addr, store_v), m3,
    )

    # --- flags ----------------------------------------------------------
    zn_src = jnp.select(
        [op == O_LDA, op == O_LDX, op == O_LDY, op == O_AND, op == O_ORA,
         op == O_EOR, op == O_ADC, op == O_SBC, op == O_TAX, op == O_TAY,
         op == O_TXA, op == O_TYA, op == O_TSX, op == O_PLA, op == O_INX,
         op == O_INY, op == O_DEX, op == O_DEY, op == O_INC, op == O_DEC,
         op == O_ASL, op == O_LSR, op == O_ROL, op == O_ROR, is_cmp],
        [new_a, new_x, new_y, new_a, new_a,
         new_a, adc_rb, sbc_rb, new_x, new_y,
         new_a, new_a, new_x, pull1, new_x,
         new_y, new_x, new_y, (mem_v + 1) & 0xFF, (mem_v - 1) & 0xFF,
         asl_r, lsr_r, rol_r, ror_r, cmp_d],
        jnp.int32(-1),  # sentinel: no ZN update
    )
    new_p = jnp.where(zn_src >= 0, _set_zn(p, zn_src), p)
    # Carry.
    new_c = jnp.select(
        [op == O_ADC, op == O_SBC, is_cmp,
         (op == O_ASL) | (op == O_ROL), (op == O_LSR) | (op == O_ROR),
         op == O_CLC, op == O_SEC],
        [adc_c, sbc_c, (cmp_src >= operand).astype(jnp.int32),
         asl_c, lsr_c, jnp.int32(0), jnp.int32(1)],
        p >> F_C & 1,
    )
    new_p = (new_p & ~(1 << F_C)) | (new_c << F_C)
    # Overflow.
    new_v = jnp.select(
        [op == O_ADC, op == O_SBC, op == O_CLV, op == O_BIT],
        [adc_v.astype(jnp.int32), sbc_v.astype(jnp.int32), jnp.int32(0),
         operand >> 6 & 1],
        p >> F_V & 1,
    )
    new_p = (new_p & ~(1 << F_V)) | (new_v << F_V)
    # BIT: Z from A&M, N from M.
    bit_p = new_p & ~((1 << F_Z) | (1 << F_N))
    bit_p = bit_p | jnp.where((a & operand) == 0, 1 << F_Z, 0)
    bit_p = bit_p | ((operand >> 7 & 1) << F_N)
    new_p = jnp.where(op == O_BIT, bit_p, new_p)
    # Decimal / interrupt flags.
    new_p = jnp.select(
        [op == O_CLD, op == O_SED, op == O_CLI, op == O_SEI],
        [new_p & ~(1 << F_D), new_p | (1 << F_D),
         new_p & ~(1 << F_I), new_p | (1 << F_I)],
        new_p,
    )
    # Decimal-mode ADC: N comes from the intermediate BCD high byte
    # (Z stays binary; SBC flags are fully binary on NMOS).
    adc_dec = decimal & (op == O_ADC)
    new_p = jnp.where(
        adc_dec,
        (new_p & ~(1 << F_N))
        | (adc_n_dec.astype(jnp.int32) << F_N),
        new_p,
    )
    # PLP / RTI restore P (B cleared, U set).
    restored = (pull1 & ~(1 << F_B)) | (1 << F_U)
    new_p = jnp.where(is_plp | is_rti, restored, new_p)

    # --- control flow ----------------------------------------------------
    next_pc = (pc + size) & 0xFFFF
    rel = jnp.where(b1 < 0x80, b1, b1 - 256)
    flag_of = {
        O_BCC: (F_C, 0), O_BCS: (F_C, 1), O_BEQ: (F_Z, 1),
        O_BNE: (F_Z, 0), O_BMI: (F_N, 1), O_BPL: (F_N, 0),
        O_BVC: (F_V, 0), O_BVS: (F_V, 1),
    }
    branch_taken = jnp.int32(0)
    for bop, (bit, want) in flag_of.items():
        t = (op == bop) & ((p >> bit & 1) == want)
        branch_taken = branch_taken | t.astype(jnp.int32)
    branch_pc = (next_pc + rel) & 0xFFFF
    rts_pc = ((pull1 | (pull2 << 8)) + 1) & 0xFFFF
    rti_pc = (pull2 | (pull3 << 8)) & 0xFFFF
    new_pc = jnp.select(
        [(op == O_JMP), is_jsr, is_rts, is_rti, branch_taken == 1,
         op == O_BRK],
        [addr, abs_addr, rts_pc, rti_pc, branch_pc, next_pc],
        next_pc,
    )

    # Bankswitch hotspots (F8/F6): any access — data, jump target, or
    # instruction FETCH — to $1FF8/$1FF9 (8K) or $1FF6-$1FF9 (16K)
    # selects the matching bank.  Data accesses read the OLD bank (the
    # operand was already fetched above; the value at a hotspot is
    # junk either way).  Fetch-triggered switching is modeled by also
    # testing the NEXT instruction's fetch address (new_pc): switching
    # at end-of-step is observably identical to hardware's
    # switch-at-fetch (the fetch itself then reads the new bank, as on
    # a real cart).  Covers fall-through into a hotspot, taken
    # branches landing on one, and JMP-to-hotspot trampolines.  Not
    # modeled: operand bytes of a multi-byte instruction straddling a
    # hotspot (instruction STARTING at hotspot-1) — no known cart
    # relies on that.
    nrom = rom.shape[0]
    if nrom > 4096:
        nbanks = nrom // 4096
        hot_base = 0xFF8 if nbanks == 2 else 0xFF6
        acc = addr & 0x1FFF
        off = (acc & 0xFFF) - hot_base
        touches_mem = ~(
            (mode == IMP) | (mode == ACC) | (mode == IMM) | (mode == REL)
        )
        is_hot = (
            (acc >= 0x1000) & (off >= 0) & (off < nbanks) & touches_mem
        )
        new_bank = jnp.where(
            is_hot, jnp.clip(off, 0, nbanks - 1), m["bank"]
        ).astype(jnp.int32)
        facc = new_pc & 0x1FFF
        foff = (facc & 0xFFF) - hot_base
        fetch_hot = (facc >= 0x1000) & (foff >= 0) & (foff < nbanks)
        new_bank = jnp.where(
            fetch_hot, jnp.clip(foff, 0, nbanks - 1), new_bank
        ).astype(jnp.int32)
    else:
        new_bank = m["bank"]

    return {
        **m4,
        "bank": new_bank,
        "a": new_a & 0xFF,
        "x": new_x & 0xFF,
        "y": new_y & 0xFF,
        "sp": new_sp & 0xFF,
        "p": new_p & 0xFF,
        "pc": new_pc,
        "cycles": m["cycles"] + cycles,
    }


def run(m: dict, rom: jax.Array, n: int) -> dict:
    """Run ``n`` instructions under ``lax.fori_loop`` (jit/vmap-able)."""

    def body(_, mm):
        return step_instruction(mm, rom)

    return jax.lax.fori_loop(0, n, body, m)
