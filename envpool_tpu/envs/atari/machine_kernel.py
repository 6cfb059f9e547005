"""Batched 6502+TIA frame kernel — the trainable-speed emulation path.

``cpu6502.step_instruction`` + ``tia._instr`` are written scalar-per-
machine and vectorized by ``vmap``; on TPU every instruction step then
costs a full XLA dispatch round (~48 us at B=1024 — PLAN.md), three
orders below the Lite cores.  This module re-expresses the SAME
semantics as explicitly batched array code in a lane-last layout
(batch on the 128-wide TPU lane dimension):

* per-machine scalars are ``[B]`` vectors;
* RAM/TIA/collision files are ``[128, B]`` / ``[64, B]`` / ``[8, B]``
  (field on sublanes, machine on lanes) so per-lane byte reads are
  mask-and-reduce VPU ops and STATIC register reads are free row
  slices;
* ROM reads ride the MXU: a one-hot ``[RH, B]`` row mask contracted
  against the ``[RH, 64]`` chunked ROM, then a 64-wide select;
* a whole video frame (262 line slots x bounded instruction loop)
  runs inside ONE Pallas kernel with all state resident in VMEM —
  zero HBM traffic and zero dispatch overhead per instruction.

The pure-jnp twin (`frame_batched`) runs the identical batched step
under ``lax.scan`` and is bit-compared against the vmapped
``tia.run_frame`` in tests/test_machine_kernel.py; the Pallas kernel
body IS `frame_batched`'s loop, so one equivalence proof covers both.

Semantics source (behavioral spec, not copied code): the scalar
implementations in ``cpu6502.py``/``tia.py``, themselves fuzz-locked
against an independent scalar 6502.  Reference counterpart: ALE's
emulator core consumed by ``envpool/atari/atari_env.h:193-209``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import cpu6502, tia
from .cpu6502 import (
    ABS, ABX, ABY, ACC, CPU_TABLES, F_B, F_C, F_D, F_I, F_N, F_U, F_V,
    F_Z, IMM, IMP, IND, IZX, IZY, REL, ZP, ZPX, ZPY,
    O_ADC, O_AND, O_ASL, O_BCC, O_BCS, O_BEQ, O_BIT, O_BMI, O_BNE,
    O_BPL, O_BRK, O_BVC, O_BVS, O_CLC, O_CLD, O_CLI, O_CLV, O_CMP,
    O_CPX, O_CPY, O_DEC, O_DEX, O_DEY, O_EOR, O_INC, O_INX, O_INY,
    O_JMP, O_JSR, O_LDA, O_LDX, O_LDY, O_LSR, O_NOP, O_ORA, O_PHA,
    O_PHP, O_PLA, O_PLP, O_ROL, O_ROR, O_RTI, O_RTS, O_SBC, O_SEC,
    O_SED, O_SEI, O_STA, O_STX, O_STY, O_TAX, O_TAY, O_TSX, O_TXA,
    O_TXS, O_TYA,
)
from .tia import (
    CYCLES_PER_LINE, FIRST_VISIBLE, NREG, VISIBLE_LINES,
    R_COLUBK, R_COLUP0, R_COLUP1, R_COLUPF, R_CTRLPF, R_ENABL, R_ENAM0,
    R_ENAM1, R_GRP0, R_GRP1, R_NUSIZ0, R_NUSIZ1, R_PF0, R_PF1, R_PF2,
    R_POSBL, R_POSM0, R_POSM1, R_POSP0, R_POSP1, R_REFP0, R_REFP1,
    R_RESMP0, R_RESMP1,
)

__all__ = ["build_tables", "frame_batched", "run_frame_fast"]

_SLOTS = FIRST_VISIBLE + VISIBLE_LINES + 30  # 262, as tia.run_frame
_BUDGET = 40  # tia._LINE_BUDGET

# Scalar state fields, in packed-row order ([NS, B] kernel layout).
SCALARS = (
    "a", "x", "y", "sp", "pc", "p", "bank", "cycles", "tia_waddr",
    "swcha", "inpt4", "scanline", "line_cycles", "posp0", "posp1",
    "posm0", "posm1", "posbl", "grp0_old", "grp1_old", "enabl_old",
    "wrapped",
)
NS = len(SCALARS)

_i32 = jnp.int32
_f32 = jnp.float32


def build_tables(rom_np: np.ndarray) -> dict:
    """Static per-ROM lookup tables (numpy; shared across the batch)."""
    rom_np = np.asarray(rom_np, np.uint8)
    n = rom_np.shape[0]
    assert n in (4096, 8192, 16384), rom_np.shape
    mode, op, size, cyc = CPU_TABLES
    nbanks = n // 4096
    # Per-PC fetch+decode meta table: for cartridge offset j (within its
    # bank), the three instruction bytes and the decode row of byte 0 —
    # one MXU contraction replaces three bus reads plus the decode read.
    # Offsets whose pc+1/pc+2 would leave the 4K window get garbage here;
    # the step takes the exact slow path for those lanes (lax.cond).
    banks = rom_np.reshape(nbanks, 4096).astype(np.int64)
    j = np.arange(4096)
    b0 = banks[:, j]
    b1 = banks[:, (j + 1) & 0xFFF]
    b2 = banks[:, (j + 2) & 0xFFF]
    # Eight byte-sized fields per offset.  Round-5 ablations: every
    # value must fit bfloat16's 8-bit mantissa — the MXU's DEFAULT
    # precision is single-pass bf16 and silently zeroes the low bits of
    # wider packed words (observed at B>1); Mosaic offers only the
    # 6-pass HIGHEST above that (measured -25%).  And the field count
    # must stay EIGHT: a [64, 4, B] select/reduce (half the fields)
    # measured 10% SLOWER than [64, 8, B] — the middle axis of 8
    # matches the vreg sublane count exactly.
    meta = np.stack([
        b0, b1, b2, mode[b0], op[b0], size[b0], cyc[b0],
        np.zeros_like(b0),
    ], axis=-1)  # [nbanks, 4096, 8]
    # JMP-(ind) vector pair per offset: byte j and byte at the 6502
    # PAGE-wrapped j+1 ((j & 0xF00) | ((j + 1) & 0xFF)) — both static,
    # so the two vector-byte reads collapse to one contraction.
    jw = (j & 0xF00) | ((j + 1) & 0xFF)
    indpair = np.stack([banks[:, j], banks[:, jw]], axis=-1)
    return {
        "rom2d": rom_np.reshape(-1, 64).astype(np.float32),  # [RH, 64]
        "decode": np.stack([mode, op, size, cyc], 1).astype(np.float32),
        "meta": meta.reshape(-1, 64 * 8).astype(np.float32),  # [RH, 512]
        "indpair": indpair.reshape(-1, 128).astype(np.float32),  # [RH,128]
        "nbanks": nbanks,
    }


def _oh_rows(idx: jax.Array, n: int) -> jax.Array:
    """[n, B] bool one-hot along sublanes for [1, B] per-lane indices.

    All per-lane "scalars" are [1, B] (never 1-D): Mosaic's vector
    layout inference crashes joining 1-D layouts with implicit-dim
    rank-2 layouts (VectorLayout::join assert, observed on v5e).
    """
    it = jax.lax.broadcasted_iota(_i32, (n, idx.shape[-1]), 0)
    return it == idx


# Toggled off when Mosaic rejects f32 MXU contractions inside the big
# frame loop; the int path is pure VPU mask-reduce.
_USE_MATMUL = True


def _rom_read(rom2d: jax.Array, bank: jax.Array, addr: jax.Array):
    """Cartridge read at bus address ``addr`` [B] (already &0x1FFF)."""
    rh = rom2d.shape[0]
    idx = jnp.where(rh > 64, bank * 4096 + (addr & 0xFFF), addr & 0xFFF)
    hi = idx >> 6
    lo = idx & 63
    ml = _oh_rows(lo, 64)
    if _USE_MATMUL:
        mh = _oh_rows(hi, rh).astype(_f32)  # [RH, B]
        rows = jax.lax.dot_general(
            rom2d, mh, (((0,), (0,)), ((), ())),
            preferred_element_type=_f32,
        )  # [64, B]
        return (jnp.where(ml, rows, 0.0)).sum(0, keepdims=True).astype(_i32)
    rom_i = rom2d.astype(_i32)  # [RH, 64]
    mh = _oh_rows(hi, rh)  # [RH, B] bool
    rows = (
        jnp.where(mh[:, None, :], rom_i[:, :, None], 0).sum(0)
    )  # [64, B]
    return jnp.where(ml, rows, 0).sum(0, keepdims=True)


def _ram_sel(addr):
    return (addr < 0x1000) & ((addr & 0x200) == 0) & ((addr & 0x80) == 0x80)


def _ram_read(ram: jax.Array, addr: jax.Array) -> jax.Array:
    """RAM byte at per-lane 7-bit offset.

    RAM is stored as 32 little-endian 4-byte words per lane ([32, B])
    — 4x fewer sublanes than a byte file, so the mask/select/reduce
    per access and the loop-carry footprint shrink 4x.
    """
    mask = _oh_rows((addr & 0x7F) >> 2, 32)
    w = jnp.where(mask, ram, 0).sum(0, keepdims=True)
    return (w >> ((addr & 3) * 8)) & 0xFF


def _bus_nonrom(s: dict, addr: jax.Array) -> jax.Array:
    """Batched ``cpu6502._bus_nonrom`` with the TIA read map ($x0-$x7
    collision latches, $xC/$xD INPT4/5)."""
    addr = addr & 0x1FFF
    v = jnp.where(_ram_sel(addr), _ram_read(s["ram"], addr), 0)
    v = jnp.where(addr == 0x280, s["swcha"], v)
    is_tia_rd = (addr < 0x1000) & ((addr & 0x80) == 0) & ((addr & 0x200) == 0)
    idx = addr & 0x0F
    cx_v = jnp.where(_oh_rows(jnp.clip(idx, 0, 7), 8), s["cx"], 0).sum(
        0, keepdims=True
    )
    tia_v = jnp.where(idx < 8, cx_v, 0)
    tia_v = jnp.where(idx == 0xC, s["inpt4"], tia_v)
    tia_v = jnp.where(idx == 0xD, 0x80, tia_v)
    v = jnp.where(is_tia_rd, tia_v, v)
    return v & 0xFF


def _read(s: dict, rom2d: jax.Array, addr: jax.Array) -> jax.Array:
    a = addr & 0x1FFF
    return jnp.where(
        a >= 0x1000, _rom_read(rom2d, s["bank"], a), _bus_nonrom(s, a)
    )


def _write_ram(ram, addr, value, do):
    addr = addr & 0x1FFF
    value = value & 0xFF
    sh = (addr & 3) * 8
    mr = _oh_rows((addr & 0x7F) >> 2, 32) & (_ram_sel(addr) & do)
    return jnp.where(mr, (ram & ~(0xFF << sh)) | (value << sh), ram)


def _write(s: dict, addr: jax.Array, value: jax.Array, do: jax.Array):
    """Masked bus write; returns (ram, tia, tia_waddr) merged by ``do``."""
    addr = addr & 0x1FFF
    value = value & 0xFF
    is_ram = _ram_sel(addr) & do
    is_tia = (addr < 0x40) & do
    sh = (addr & 3) * 8
    mr = _oh_rows((addr & 0x7F) >> 2, 32) & is_ram
    ram = jnp.where(
        mr, (s["ram"] & ~(0xFF << sh)) | (value << sh), s["ram"]
    )
    mt = _oh_rows(jnp.clip(addr, 0, 63), 64) & is_tia
    tia_f = jnp.where(mt, value, s["tia"])
    waddr = jnp.where(is_tia, addr, s["tia_waddr"])
    return ram, tia_f, waddr


def _set_zn(p, v):
    z = (v & 0xFF) == 0
    n = (v & 0x80) != 0
    p = p & ~((1 << F_Z) | (1 << F_N))
    return p | z.astype(_i32) << F_Z | n.astype(_i32) << F_N



def _select(conds, choices, default):
    """``jnp.select`` semantics via nested wheres (first true wins).

    jnp.select lowers through an int argmax that Mosaic cannot lower;
    a reverse fold of jnp.where is equivalent and VPU-friendly.
    """
    out = default
    for c, v in zip(reversed(conds), reversed(choices)):
        out = jnp.where(c, v, out)
    return out




def _any(m: jax.Array) -> jax.Array:
    return jnp.sum(m.astype(_i32)) > 0


def _wrap160(v: jax.Array) -> jax.Array:
    """``v % 160`` for v in [-160, 320) without an integer division
    (no native int div/mod on the VPU — measured ~10x op cost)."""
    v = jnp.where(v < 0, v + 160, v)
    return jnp.where(v >= 160, v - 160, v)


def step_batched(s: dict, tables: dict, act: jax.Array = None) -> dict:
    """One instruction for every lane — batched ``step_instruction``
    (cpu6502.py:303) fused with the TIA beam bookkeeping
    (tia.py::_instr).  All per-lane scalars are [B] vectors.

    ``act`` ([1, B] bool) masks which lanes advance: memory writes are
    gated at their masks and the register scalars merged at the end, so
    an inactive lane's state is bit-identical to not stepping — this
    replaces the line loop's former wholesale ~126-row state merge per
    sub-step (RAM 32 + TIA 64 + CX 8 rows of where-traffic) with 8
    one-row scalar merges.  It also sharpens the rare-path lax.cond
    gates below (a finished lane cannot trigger them)."""
    rom2d = tables["rom2d"]
    if act is None:
        act = jnp.ones(s["pc"].shape, bool)
    waddr_prev = s["tia_waddr"]
    s = {**s, "tia_waddr": jnp.full_like(s["pc"], -1)}
    pre_cycles = s["cycles"]
    pre_vsync = s["tia"][0:1]
    pc = s["pc"]
    meta = tables.get("meta")

    def _fetch_slow(operand):
        s_, pc_ = operand  # s_ is the minimal bus view (incl. bank)
        opcode = _read(s_, rom2d, pc_)
        b1 = _read(s_, rom2d, pc_ + 1)
        b2 = _read(s_, rom2d, pc_ + 2)
        dec_oh = _oh_rows(jnp.clip(opcode, 0, 255), 256).astype(_f32)
        dec = jax.lax.dot_general(
            jnp.asarray(tables["decode"]), dec_oh, (((0,), (0,)), ((), ())),
            preferred_element_type=_f32,
        ).astype(_i32)  # [4, B]
        return b1, b2, dec

    def _fetch_fast(operand):
        s_, pc_ = operand
        rh = meta.shape[0]
        idx = jnp.where(
            rh > 64, s_["bank"] * 4096 + (pc_ & 0xFFF), pc_ & 0xFFF
        )
        mh = _oh_rows(idx >> 6, rh).astype(_f32)  # [RH, B]
        row = jax.lax.dot_general(
            meta, mh, (((0,), (0,)), ((), ())),
            preferred_element_type=_f32,
        )  # [256, B]
        row3 = row.reshape(64, 8, row.shape[-1])
        sel = _oh_rows(idx & 63, 64)[:, None, :]
        f = jnp.where(sel, row3, 0.0).sum(0).astype(_i32)  # [8, B]
        dec = jnp.concatenate([f[3:4], f[4:5], f[5:6], f[6:7]])
        return f[1:2], f[2:3], dec

    if meta is None:
        b1, b2, dec = _fetch_slow((s, pc))
    else:
        # Slow path when any lane executes from RAM/TIA space or within
        # 2 bytes of the 4K window end (pc+1/pc+2 leave the window).
        needs_slow = (pc < 0x1000) | ((pc & 0xFFF) >= 0xFFD)
        fetch_bus = {
            "ram": s["ram"], "cx": s["cx"], "swcha": s["swcha"],
            "inpt4": s["inpt4"], "bank": s["bank"],
        }
        b1, b2, dec = jax.lax.cond(
            jnp.sum(needs_slow.astype(_i32)) > 0,
            _fetch_slow, _fetch_fast, (fetch_bus, pc),
        )
    mode, op, size, cycles = dec[0:1], dec[1:2], dec[2:3], dec[3:4]
    a, x, y, sp, p = s["a"], s["x"], s["y"], s["sp"], s["p"]

    # --- effective address per mode -----------------------------------
    abs_addr = b1 | (b2 << 8)
    zp_a = b1
    zpx_a = (b1 + x) & 0xFF
    zpy_a = (b1 + y) & 0xFF
    abx_a = (abs_addr + x) & 0xFFFF
    aby_a = (abs_addr + y) & 0xFFFF
    # Zero-page pointer reads only matter for IZX/IZY lanes — gated
    # per tile with a MINIMAL cond operand (the bus-view pattern that
    # survived the round-4/5 cond ablations; whole-state operands made
    # lax.cond slower than the work it saved).
    zp_bus = {
        "ram": s["ram"], "cx": s["cx"], "swcha": s["swcha"],
        "inpt4": s["inpt4"],
    }

    def _zp_ptr_reads(operand):
        bus, b1_, x_ = operand
        ptr = (b1_ + x_) & 0xFF
        return (
            _bus_nonrom(bus, ptr),
            _bus_nonrom(bus, (ptr + 1) & 0xFF),
            _bus_nonrom(bus, b1_),
            _bus_nonrom(bus, (b1_ + 1) & 0xFF),
        )

    p0, p1, p2, p3 = jax.lax.cond(
        _any(((mode == IZX) | (mode == IZY)) & act), _zp_ptr_reads,
        lambda operand: tuple(jnp.zeros_like(pc) for _ in range(4)),
        (zp_bus, b1, x),
    )
    izx_a = p0 | (p1 << 8)
    izy_a = ((p2 | (p3 << 8)) + y) & 0xFFFF
    addr_pre = _select(
        [mode == ZP, mode == ZPX, mode == ZPY, mode == ABS, mode == ABX,
         mode == ABY, mode == IZX, mode == IZY, mode == IND],
        [zp_a, zpx_a, zpy_a, abs_addr, abx_a, aby_a, izx_a, izy_a,
         abs_addr],
        jnp.zeros_like(pc),
    )
    # JMP-(ind) vector reads: both bytes of the 6502 page-wrapped
    # vector come from ONE indpair contraction (build_tables packs
    # rom[j] and rom[page-wrap(j+1)] side by side) when the vector is
    # in ROM, with the exact bus fallback for RAM vectors; gated per
    # tile — opcode $6C is rare.  indpair entries are single bytes
    # (<= 255), exact at default matmul precision.
    indpair = tables.get("indpair")

    def _ind_reads(operand):
        bus, bank_, aaddr = operand
        am = aaddr & 0x1FFF
        wrap = (am & 0xFF00) | ((am + 1) & 0xFF)
        rh_i = indpair.shape[0]
        idx_i = jnp.where(
            rh_i > 64, bank_ * 4096 + (am & 0xFFF), am & 0xFFF
        )
        mh_i = _oh_rows(idx_i >> 6, rh_i).astype(_f32)
        row_i = jax.lax.dot_general(
            indpair, mh_i, (((0,), (0,)), ((), ())),
            preferred_element_type=_f32,
        )
        row2_i = row_i.reshape(64, 2, row_i.shape[-1])
        sel_i = _oh_rows(idx_i & 63, 64)[:, None, :]
        pair_i = jnp.where(sel_i, row2_i, 0.0).sum(0).astype(_i32)
        in_rom_i = am >= 0x1000
        lo = jnp.where(in_rom_i, pair_i[0:1], _bus_nonrom(bus, am))
        hi = jnp.where(in_rom_i, pair_i[1:2], _bus_nonrom(bus, wrap))
        return lo, hi

    indl, indh = jax.lax.cond(
        _any((mode == IND) & act), _ind_reads,
        lambda operand: (jnp.zeros_like(pc), jnp.zeros_like(pc)),
        (zp_bus, s["bank"], abs_addr),
    )
    mem_v = _read(s, rom2d, addr_pre)
    ind_a = indl | (indh << 8)
    addr = jnp.where(mode == IND, ind_a, addr_pre)
    operand = _select([mode == IMM, mode == ACC], [b1, a], mem_v)

    # --- ALU ------------------------------------------------------------
    carry = p >> F_C & 1
    decimal = (p >> F_D & 1) != 0
    adc_sum = a + operand + carry
    adc_rb = adc_sum & 0xFF
    adc_cb = (adc_sum > 0xFF).astype(_i32)

    # NMOS decimal-mode ALU, gated per tile: game kernels only run
    # ADC/SBC with the D flag set in score-update sections, and the BCD
    # fix-up chain is ~25 VPU ops per instruction otherwise.
    def _decimal_alu(operand_):
        a_, op_, carry_ = operand_
        d_lo = (a_ & 0x0F) + (op_ & 0x0F) + carry_
        d_hi = (a_ & 0xF0) + (op_ & 0xF0)
        lo_fix = d_lo > 0x09
        d_hi = d_hi + jnp.where(lo_fix, 0x10, 0)
        d_lo = d_lo + jnp.where(lo_fix, 0x06, 0)
        adc_v_d = (((~(a_ ^ op_) & (a_ ^ d_hi)) & 0x80) != 0).astype(_i32)
        adc_n_d = ((d_hi & 0x80) != 0).astype(_i32)
        hi_fix = d_hi > 0x90
        d_hi = d_hi + jnp.where(hi_fix, 0x60, 0)
        adc_c_d = (d_hi > 0xF0).astype(_i32)
        adc_r_d = ((d_lo & 0x0F) | (d_hi & 0xF0)) & 0xFF
        s_lo = (a_ & 0x0F) - (op_ & 0x0F) - (1 - carry_)
        lo_borrow = (s_lo & 0x10) != 0
        s_lo = s_lo - jnp.where(lo_borrow, 6, 0)
        s_hi = (a_ >> 4) - (op_ >> 4) - lo_borrow.astype(_i32)
        hi_borrow = (s_hi & 0x10) != 0
        s_hi = s_hi - jnp.where(hi_borrow, 6, 0)
        sbc_r_d = ((s_lo & 0x0F) | ((s_hi & 0x0F) << 4)) & 0xFF
        return adc_r_d, adc_c_d, adc_v_d, adc_n_d, sbc_r_d

    dec_used = decimal & ((op == O_ADC) | (op == O_SBC))
    adc_r_dec, adc_c_dec, adc_v_dec_i, adc_n_dec_i, sbc_r_dec = (
        jax.lax.cond(
            _any(dec_used & act), _decimal_alu,
            lambda o: tuple(jnp.zeros_like(a) for _ in range(5)),
            (a, operand, carry),
        )
    )
    adc_v_dec = adc_v_dec_i != 0
    adc_n_dec = adc_n_dec_i != 0
    adc_r = jnp.where(decimal, adc_r_dec, adc_rb)
    adc_c = jnp.where(decimal, adc_c_dec, adc_cb)
    # Select between int32 flags, not i1 vectors: an i1-valued select
    # hits Mosaic's "unsupported target bitwidth for truncation" when it
    # sits on a loop-carried path (observed on v5e).
    adc_v = jnp.where(
        decimal,
        adc_v_dec.astype(_i32),
        (((~(a ^ operand) & (a ^ adc_sum)) & 0x80) != 0).astype(_i32),
    )
    sbc_op = operand ^ 0xFF
    sbc_sum = a + sbc_op + carry
    sbc_rb = sbc_sum & 0xFF
    sbc_c = (sbc_sum > 0xFF).astype(_i32)
    sbc_v = ((~(a ^ sbc_op) & (a ^ sbc_sum)) & 0x80) != 0
    sbc_r = jnp.where(decimal, sbc_r_dec, sbc_rb)
    asl_r = (operand << 1) & 0xFF
    asl_c = operand >> 7 & 1
    lsr_r = operand >> 1
    lsr_c = operand & 1
    rol_r = ((operand << 1) | carry) & 0xFF
    ror_r = (operand >> 1) | (carry << 7)

    is_cmp = (op == O_CMP) | (op == O_CPX) | (op == O_CPY)
    cmp_src = _select([op == O_CPX, op == O_CPY], [x, y], a)
    cmp_d = (cmp_src - operand) & 0x1FF

    # --- register updates ------------------------------------------------
    new_a = _select(
        [op == O_LDA, op == O_AND, op == O_ORA, op == O_EOR, op == O_ADC,
         op == O_SBC, op == O_TXA, op == O_TYA, op == O_PLA,
         (op == O_ASL) & (mode == ACC), (op == O_LSR) & (mode == ACC),
         (op == O_ROL) & (mode == ACC), (op == O_ROR) & (mode == ACC)],
        [operand, a & operand, a | operand, a ^ operand, adc_r,
         sbc_r, x, y, jnp.zeros_like(a),  # PLA patched below
         asl_r, lsr_r, rol_r, ror_r],
        a,
    )
    new_x = _select(
        [op == O_LDX, op == O_TAX, op == O_TSX, op == O_INX, op == O_DEX],
        [operand, a, sp, (x + 1) & 0xFF, (x - 1) & 0xFF], x,
    )
    new_y = _select(
        [op == O_LDY, op == O_TAY, op == O_INY, op == O_DEY],
        [operand, a, (y + 1) & 0xFF, (y - 1) & 0xFF], y,
    )

    # --- stack -----------------------------------------------------------
    is_jsr = op == O_JSR
    is_pha = op == O_PHA
    is_php = op == O_PHP
    ret_pc = (pc + 2) & 0xFFFF
    push1_v = _select(
        [is_jsr, is_pha, is_php],
        [ret_pc >> 8, a, p | (1 << F_B) | (1 << F_U)],
        jnp.zeros_like(a),
    )
    do_push1 = is_jsr | is_pha | is_php
    sp1 = jnp.where(do_push1, (sp - 1) & 0xFF, sp)

    # Stack pushes only touch RAM ($100+SP) — RAM-only writes, gated
    # per tile (pushes are a small slice of the instruction mix).
    def _push_writes(operand):
        ram_, sp_, sp1_, v1, v2, do1, do2 = operand
        ram_ = _write_ram(ram_, 0x100 + sp_, v1, do1)
        return _write_ram(ram_, 0x100 + sp1_, v2, do2)

    ram3 = jax.lax.cond(
        _any(do_push1 & act), _push_writes, lambda operand: operand[0],
        (s["ram"], sp, sp1, push1_v, ret_pc & 0xFF,
         do_push1 & act, is_jsr & act),
    )
    s3 = {**s, "ram": ram3}
    sp2 = jnp.where(is_jsr, (sp1 - 1) & 0xFF, sp1)

    is_pla = op == O_PLA
    is_plp = op == O_PLP
    is_rts = op == O_RTS
    is_rti = op == O_RTI
    sp3 = jnp.where(is_pla | is_plp | is_rts | is_rti, (sp2 + 1) & 0xFF, sp2)
    sp4 = jnp.where(is_rts | is_rti, (sp3 + 1) & 0xFF, sp3)
    # Stack pulls gated per tile with a MINIMAL cond operand (the bus
    # subset _bus_nonrom touches) — passing the whole state dict made
    # lax.cond cost more than the reads it saved.  Full bus decode is
    # kept: $100-$17F pulls (SP < $80) read TIA latches on a 2600.
    def _pull_reads(operand):
        bus, a1, a2, a3 = operand
        return (
            _bus_nonrom(bus, 0x100 + a1),
            _bus_nonrom(bus, 0x100 + a2),
            _bus_nonrom(bus, 0x100 + a3),
        )

    bus_view = {
        "ram": s3["ram"], "cx": s3["cx"], "swcha": s3["swcha"],
        "inpt4": s3["inpt4"],
    }
    pull1, pull2, pull3 = jax.lax.cond(
        _any((is_pla | is_plp | is_rts | is_rti) & act), _pull_reads,
        lambda operand: tuple(jnp.zeros_like(sp) for _ in range(3)),
        (bus_view, (sp2 + 1) & 0xFF, (sp3 + 1) & 0xFF, (sp4 + 1) & 0xFF),
    )
    sp5 = jnp.where(is_rti, (sp4 + 1) & 0xFF, sp4)
    new_sp = jnp.where(op == O_TXS, x, sp5)
    new_a = jnp.where(is_pla, pull1, new_a)

    # --- memory write-back ops -------------------------------------------
    store_v = _select(
        [op == O_STA, op == O_STX, op == O_STY, op == O_INC, op == O_DEC,
         op == O_ASL, op == O_LSR, op == O_ROL, op == O_ROR],
        [a, x, y, (mem_v + 1) & 0xFF, (mem_v - 1) & 0xFF,
         asl_r, lsr_r, rol_r, ror_r],
        jnp.zeros_like(a),
    )
    do_store = (
        (op == O_STA) | (op == O_STX) | (op == O_STY) | (op == O_INC)
        | (op == O_DEC)
        | (((op == O_ASL) | (op == O_LSR) | (op == O_ROL) | (op == O_ROR))
           & (mode != ACC))
    )
    ram4, tia4, wa4 = _write(s3, addr, store_v, do_store & act)
    s4 = {**s3, "ram": ram4, "tia": tia4, "tia_waddr": wa4}

    # --- flags ------------------------------------------------------------
    zn_src = _select(
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
        jnp.full_like(a, -1),
    )
    new_p = jnp.where(zn_src >= 0, _set_zn(p, zn_src), p)
    new_c = _select(
        [op == O_ADC, op == O_SBC, is_cmp,
         (op == O_ASL) | (op == O_ROL), (op == O_LSR) | (op == O_ROR),
         op == O_CLC, op == O_SEC],
        [adc_c, sbc_c, (cmp_src >= operand).astype(_i32),
         asl_c, lsr_c, jnp.zeros_like(a), jnp.ones_like(a)],
        p >> F_C & 1,
    )
    new_p = (new_p & ~(1 << F_C)) | (new_c << F_C)
    new_v = _select(
        [op == O_ADC, op == O_SBC, op == O_CLV, op == O_BIT],
        [adc_v.astype(_i32), sbc_v.astype(_i32), jnp.zeros_like(a),
         operand >> 6 & 1],
        p >> F_V & 1,
    )
    new_p = (new_p & ~(1 << F_V)) | (new_v << F_V)
    bit_p = new_p & ~((1 << F_Z) | (1 << F_N))
    bit_p = bit_p | jnp.where((a & operand) == 0, 1 << F_Z, 0)
    bit_p = bit_p | ((operand >> 7 & 1) << F_N)
    new_p = jnp.where(op == O_BIT, bit_p, new_p)
    new_p = _select(
        [op == O_CLD, op == O_SED, op == O_CLI, op == O_SEI],
        [new_p & ~(1 << F_D), new_p | (1 << F_D),
         new_p & ~(1 << F_I), new_p | (1 << F_I)],
        new_p,
    )
    adc_dec = decimal & (op == O_ADC)
    new_p = jnp.where(
        adc_dec,
        (new_p & ~(1 << F_N)) | (adc_n_dec.astype(_i32) << F_N),
        new_p,
    )
    restored = (pull1 & ~(1 << F_B)) | (1 << F_U)
    new_p = jnp.where(is_plp | is_rti, restored, new_p)

    # --- control flow ------------------------------------------------------
    next_pc = (pc + size) & 0xFFFF
    rel = jnp.where(b1 < 0x80, b1, b1 - 256)
    flag_of = {
        O_BCC: (F_C, 0), O_BCS: (F_C, 1), O_BEQ: (F_Z, 1),
        O_BNE: (F_Z, 0), O_BMI: (F_N, 1), O_BPL: (F_N, 0),
        O_BVC: (F_V, 0), O_BVS: (F_V, 1),
    }
    branch_taken = jnp.zeros_like(a)
    for bop, (bit, want) in flag_of.items():
        t = (op == bop) & ((p >> bit & 1) == want)
        branch_taken = branch_taken | t.astype(_i32)
    branch_pc = (next_pc + rel) & 0xFFFF
    rts_pc = ((pull1 | (pull2 << 8)) + 1) & 0xFFFF
    rti_pc = (pull2 | (pull3 << 8)) & 0xFFFF
    new_pc = _select(
        [op == O_JMP, is_jsr, is_rts, is_rti, branch_taken == 1,
         op == O_BRK],
        [addr, abs_addr, rts_pc, rti_pc, branch_pc, next_pc],
        next_pc,
    )

    # --- bankswitch hotspots (data/jump access + next fetch) ---------------
    nbanks = tables["nbanks"]
    if nbanks > 1:
        hot_base = 0xFF8 if nbanks == 2 else 0xFF6
        acc = addr & 0x1FFF
        off = (acc & 0xFFF) - hot_base
        touches_mem = ~(
            (mode == IMP) | (mode == ACC) | (mode == IMM) | (mode == REL)
        )
        is_hot = (acc >= 0x1000) & (off >= 0) & (off < nbanks) & touches_mem
        new_bank = jnp.where(is_hot, jnp.clip(off, 0, nbanks - 1), s["bank"])
        facc = new_pc & 0x1FFF
        foff = (facc & 0xFFF) - hot_base
        fetch_hot = (facc >= 0x1000) & (foff >= 0) & (foff < nbanks)
        new_bank = jnp.where(
            fetch_hot, jnp.clip(foff, 0, nbanks - 1), new_bank
        ).astype(_i32)
    else:
        new_bank = s["bank"]

    new_cycles = s["cycles"] + cycles

    # Inactive lanes keep their registers (writes above were gated).
    new_a = jnp.where(act, new_a, a)
    new_x = jnp.where(act, new_x, x)
    new_y = jnp.where(act, new_y, y)
    new_sp = jnp.where(act, new_sp, sp)
    new_p = jnp.where(act, new_p, p)
    new_pc = jnp.where(act, new_pc, pc)
    new_bank = jnp.where(act, new_bank, s["bank"])
    new_cycles = jnp.where(act, new_cycles, pre_cycles)

    # ===== TIA beam bookkeeping (tia.py::_instr, batched) ==================
    wrote = s4["tia_waddr"]
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
    t = s4["tia"]
    vsync_on = (t[0:1] & 0x02) != 0
    vsync_off = ((pre_vsync & 0x02) != 0) & ~vsync_on

    grp1_old = jnp.where(grp0_w, t[0x1C:0x1D], s["grp1_old"])
    grp0_old = jnp.where(grp1_w, t[0x1B:0x1C], s["grp0_old"])
    enabl_old = jnp.where(grp1_w, t[0x1F:0x20], s["enabl_old"])

    dcycles = new_cycles - pre_cycles
    line_cycles = s["line_cycles"] + dcycles
    beam = jnp.clip(line_cycles * 3 - 68, 0, 159)
    posp0 = jnp.where(resp0, beam, s["posp0"])
    posp1 = jnp.where(resp1, beam, s["posp1"])
    posm0 = jnp.where(resm0, beam, s["posm0"])
    posm1 = jnp.where(resm1, beam, s["posm1"])
    posbl = jnp.where(resbl, beam, s["posbl"])

    def _signed_hm(v):
        nib = (v >> 4) & 0xF
        return jnp.where(nib >= 8, nib - 16, nib)

    posp0 = jnp.where(hmove, _wrap160(posp0 - _signed_hm(t[0x20:0x21])), posp0)
    posp1 = jnp.where(hmove, _wrap160(posp1 - _signed_hm(t[0x21:0x22])), posp1)
    posm0 = jnp.where(hmove, _wrap160(posm0 - _signed_hm(t[0x22:0x23])), posm0)
    posm1 = jnp.where(hmove, _wrap160(posm1 - _signed_hm(t[0x23:0x24])), posm1)
    posbl = jnp.where(hmove, _wrap160(posbl - _signed_hm(t[0x24:0x25])), posbl)
    hm_row = jax.lax.broadcasted_iota(_i32, (64, 1), 0)
    hm_keep = (hm_row < 0x20) | (hm_row >= 0x25)
    tia_f = jnp.where(hmclr & ~hm_keep, 0, t)
    t = tia_f

    def _center(nusiz, posp):
        mode7 = nusiz & 7
        # _NUSIZ_SCALE = [1,1,1,1,1,2,1,4] as direct expressions.
        scale = jnp.where(mode7 == 5, 2, jnp.where(mode7 == 7, 4, 1))
        return _wrap160(posp + 4 * scale)

    posm0 = jnp.where(
        (t[0x28:0x29] & 2) != 0, _center(t[0x04:0x05], posp0), posm0
    )
    posm1 = jnp.where(
        (t[0x29:0x2A] & 2) != 0, _center(t[0x05:0x06], posp1), posm1
    )

    line_cycles = jnp.where(wsync, CYCLES_PER_LINE, line_cycles)
    cx = jnp.where(cxclr, 0, s["cx"])
    # int32 0/1 flag (i1 vectors cannot cross Mosaic loop boundaries).
    wrapped = s["wrapped"] | (
        vsync_off & (s["scanline"] > 3)
    ).astype(_i32)
    scanline = jnp.where(vsync_off, 3, s["scanline"])

    return {
        "ram": s4["ram"],
        "tia": tia_f,
        "cx": cx,
        "a": new_a & 0xFF,
        "x": new_x & 0xFF,
        "y": new_y & 0xFF,
        "sp": new_sp & 0xFF,
        "p": new_p & 0xFF,
        "pc": new_pc,
        "bank": new_bank,
        "cycles": new_cycles,
        "tia_waddr": jnp.where(act, s4["tia_waddr"], waddr_prev),
        "swcha": s["swcha"],
        "inpt4": s["inpt4"],
        "scanline": scanline.astype(_i32),
        "line_cycles": line_cycles.astype(_i32),
        "posp0": posp0.astype(_i32),
        "posp1": posp1.astype(_i32),
        "posm0": posm0.astype(_i32),
        "posm1": posm1.astype(_i32),
        "posbl": posbl.astype(_i32),
        "grp0_old": grp0_old.astype(_i32),
        "grp1_old": grp1_old.astype(_i32),
        "enabl_old": enabl_old.astype(_i32),
        "wrapped": wrapped,
    }


# ---------------------------------------------------------------------------
# Line structure (batched tia._make_record / _collisions / _end_line)
# ---------------------------------------------------------------------------


def _make_record(s: dict) -> jax.Array:
    """[NREG, B] display-register snapshot with VDEL resolution."""
    t = s["tia"]

    def r(i):
        return t[i : i + 1]

    grp0_disp = jnp.where((r(0x25) & 1) != 0, s["grp0_old"], r(0x1B))
    grp1_disp = jnp.where((r(0x26) & 1) != 0, s["grp1_old"], r(0x1C))
    enabl_disp = jnp.where((r(0x27) & 1) != 0, s["enabl_old"], r(0x1F))
    return jnp.concatenate([
        r(0x0D), r(0x0E), r(0x0F), r(0x08), r(0x09), r(0x0A),
        r(0x06), r(0x07), grp0_disp, grp1_disp, s["posp0"], s["posp1"],
        r(0x04), r(0x05), r(0x1D), r(0x1E), enabl_disp,
        s["posm0"], s["posm1"], s["posbl"],
        r(0x0B), r(0x0C), r(0x28), r(0x29),
    ])


def _line_masks(rec: jax.Array):
    """Object masks [160, B] from a record [NREG, B]."""
    b = rec.shape[1]
    xx = jax.lax.broadcasted_iota(_i32, (160, b), 0)

    def row(i):
        return rec[i : i + 1]

    def pf_mask():
        pf0, pf1, pf2, ctrl = row(R_PF0), row(R_PF1), row(R_PF2), row(R_CTRLPF)
        left_bit = xx >> 2
        reflect = (ctrl & 1) != 0
        bit = jnp.where(
            left_bit < 20, left_bit,
            jnp.where(reflect, 39 - left_bit, left_bit - 20),
        )
        v0 = (pf0 >> (4 + bit)) & 1
        v1 = (pf1 >> (7 - (bit - 4))) & 1
        v2 = (pf2 >> (bit - 12)) & 1
        v = jnp.where(bit < 4, v0, jnp.where(bit < 12, v1, v2))
        return v != 0

    def player_mask(grp, pos, nusiz, refp):
        mode7 = nusiz & 7
        # _NUSIZ_COPIES/_NUSIZ_SCALE as direct boolean expressions
        # (Pallas kernels cannot capture array constants).  scale is a
        # power of two; log2(scale) drives shifts instead of divisions.
        lgs = jnp.where(mode7 == 5, 1, jnp.where(mode7 == 7, 2, 0))
        scale = 1 << lgs
        has = (
            jnp.ones_like(mode7, bool),                      # +0
            (mode7 == 1) | (mode7 == 3),                     # +16
            (mode7 == 2) | (mode7 == 3) | (mode7 == 6),      # +32
            (mode7 == 4) | (mode7 == 6),                     # +64
        )
        reflect = (refp & 0x08) != 0
        on = jnp.zeros((160, b), bool)
        for c, off in enumerate((0, 16, 32, 64)):
            rel = xx - pos - off
            inside = (rel >= 0) & (rel < 8 * scale)
            bitidx = jnp.clip(rel >> lgs, 0, 7)
            bit = jnp.where(reflect, bitidx, 7 - bitidx)
            bitv = (grp >> bit) & 1
            on = on | (has[c] & inside & (bitv != 0))
        return on

    def missile_mask(enam, pos, nusiz, resmp):
        w = 1 << ((nusiz >> 4) & 3)
        rel = xx - pos
        on = ((enam & 2) != 0) & (rel >= 0) & (rel < w)
        return on & ((resmp & 2) == 0)

    def ball_mask():
        w = 1 << ((row(R_CTRLPF) >> 4) & 3)
        rel = xx - row(R_POSBL)
        return ((row(R_ENABL) & 2) != 0) & (rel >= 0) & (rel < w)

    pf = pf_mask()
    bl = ball_mask()
    pl0 = player_mask(row(R_GRP0), row(R_POSP0), row(R_NUSIZ0), row(R_REFP0))
    pl1 = player_mask(row(R_GRP1), row(R_POSP1), row(R_NUSIZ1), row(R_REFP1))
    m0 = missile_mask(row(R_ENAM0), row(R_POSM0), row(R_NUSIZ0),
                      row(R_RESMP0))
    m1 = missile_mask(row(R_ENAM1), row(R_POSM1), row(R_NUSIZ1),
                      row(R_RESMP1))
    return pf, bl, pl0, pl1, m0, m1


def _collisions_matmul(rec: jax.Array) -> jax.Array:
    """[8, B] per-line collision contributions (tia._collisions).

    The 15 pairwise any-overlap tests ride the MXU: the AND-masks are
    concatenated into one [15*160, B] matrix and contracted against a
    static 15-row block-selector — one matmul replaces 15 sublane
    reductions (measured ~1.6 ms/frame at B=1024).  Superseded by the
    bit-parallel ``_collisions`` below; kept as the property-test
    oracle (tests/test_machine_kernel.py locks them equal).
    """
    pf, bl, pl0, pl1, m0, m1 = _line_masks(rec)
    pairs = [
        (m0, pl1), (m0, pl0), (m1, pl0), (m1, pl1),
        (pl0, pf), (pl0, bl), (pl1, pf), (pl1, bl),
        (m0, pf), (m0, bl), (m1, pf), (m1, bl),
        (bl, pf), (pl0, pl1), (m0, m1),
    ]
    prods = jnp.concatenate(
        [(a_ & b_).astype(_f32) for a_, b_ in pairs], axis=0
    )  # [15*160, B]
    n = prods.shape[0]
    sel = (
        jax.lax.broadcasted_iota(_i32, (15, n), 1) // 160
        == jax.lax.broadcasted_iota(_i32, (15, n), 0)
    ).astype(_f32)
    h = (
        jax.lax.dot_general(
            sel, prods, (((1,), (0,)), ((), ())),
            preferred_element_type=_f32,
        )
        > 0
    ).astype(_i32)  # [15, B]

    def g(i):
        return h[i : i + 1]

    return jnp.concatenate([
        (g(0) << 7) | (g(1) << 6),
        (g(2) << 7) | (g(3) << 6),
        (g(4) << 7) | (g(5) << 6),
        (g(6) << 7) | (g(7) << 6),
        (g(8) << 7) | (g(9) << 6),
        (g(10) << 7) | (g(11) << 6),
        g(12) << 7,
        (g(13) << 7) | (g(14) << 6),
    ])


# ---------------------------------------------------------------------------
# Bit-parallel collision masks: each object's 160-pixel line lives in
# five 32-bit words per lane ([5, B] u32, bit p of word w = pixel
# 32w+p), so a pairwise any-overlap test is 5 ANDs + an OR-reduce
# instead of 160 boolean rows — the full 15-pair matrix drops from a
# [2400, B] concat + MXU contraction to ~150 one-row VPU ops.
# ---------------------------------------------------------------------------

_u32 = jnp.uint32


def _rev8(x):
    """Bit-reverse of an 8-bit value (3 swap stages)."""
    x = ((x & 0xF0) >> 4) | ((x & 0x0F) << 4)
    x = ((x & 0xCC) >> 2) | ((x & 0x33) << 2)
    return ((x & 0xAA) >> 1) | ((x & 0x55) << 1)


def _spread2(x):
    """8 bits -> 16 bits, each input bit doubled (x2 scale)."""
    x = (x | (x << 4)) & 0x0F0F
    x = (x | (x << 2)) & 0x3333
    x = (x | (x << 1)) & 0x5555
    return x * 0x3


def _spread4(x):
    """8 bits -> 32 bits, each input bit quadrupled (x4 scale)."""
    x = (x | (x << 12)) & 0x000F000F
    x = (x | (x << 6)) & 0x03030303
    x = (x | (x << 3)) & 0x11111111
    return x * 0xF


def _place_bits(pat, pos):
    """[5, B] u32 line words with ``pat`` (<= 32 bits) at pixel ``pos``.

    Pixels past 159 fall off word 4 — identical to the mask form's
    ``xx < 160`` clipping.  Shift amounts are clamped to [0, 31] and
    the results gated (shift-by->=width is undefined)."""
    words = []
    for w in range(5):
        sh = pos - 32 * w
        shl = jnp.clip(sh, 0, 31).astype(_u32)
        shr = jnp.clip(-sh, 0, 31).astype(_u32)
        left = jnp.where((sh >= 0) & (sh < 32), pat << shl, _u32(0))
        right = jnp.where((sh < 0) & (sh > -32), pat >> shr, _u32(0))
        words.append(left | right)
    return jnp.concatenate(words)  # [5, B]


def _pf_words(pf0, pf1, pf2, ctrl):
    """Playfield occupancy words: 20-bit half expanded x4, mirrored or
    repeated on the right per CTRLPF bit 0."""
    seq = (
        ((pf0 >> 4) & 0xF) | (_rev8(pf1) << 4) | ((pf2 & 0xFF) << 12)
    ).astype(_u32)  # bit i = playfield column i (left to right)
    rev = (
        (_rev8(seq & 0xFF) << 12)
        | (_rev8((seq >> 8) & 0xFF) << 4)
        | (_rev8((seq >> 16) & 0xF) >> 4)
    )
    right_seq = jnp.where((ctrl & 1) != 0, rev, seq)

    def half(s):
        return (
            _spread4(s & 0xFF),            # pixels 0-31 of the half
            _spread4((s >> 8) & 0xFF),     # 32-63
            _spread4((s >> 16) & 0xF),     # 64-79 (low 16 bits)
        )

    l0, l1, l2 = half(seq)
    r0, r1, r2 = half(right_seq)
    return jnp.concatenate([
        l0, l1, (l2 & 0xFFFF) | (r0 << 16),
        ((r0 >> 16) & 0xFFFF) | (r1 << 16),
        ((r1 >> 16) & 0xFFFF) | ((r2 & 0xFFFF) << 16),
    ])  # [5, B]


def _player_words(grp, pos, nusiz, refp):
    """Player occupancy: GRP pattern (reflected per REFP, scaled per
    NUSIZ 5/7) placed at each NUSIZ copy offset."""
    mode7 = nusiz & 7
    reflect = (refp & 0x08) != 0
    # Pixel q of a copy shows grp bit (reflect ? q>>lgs : 7 - q>>lgs).
    base = jnp.where(reflect, grp, _rev8(grp)).astype(_u32)
    pat = jnp.where(
        mode7 == 5, _spread2(base),
        jnp.where(mode7 == 7, _spread4(base), base),
    )
    has16 = (mode7 == 1) | (mode7 == 3)
    has32 = (mode7 == 2) | (mode7 == 3) | (mode7 == 6)
    has64 = (mode7 == 4) | (mode7 == 6)
    out = _place_bits(pat, pos)
    out = out | jnp.where(has16, _place_bits(pat, pos + 16), _u32(0))
    out = out | jnp.where(has32, _place_bits(pat, pos + 32), _u32(0))
    out = out | jnp.where(has64, _place_bits(pat, pos + 64), _u32(0))
    return out


def _missile_words(enam, pos, nusiz, resmp):
    w = _u32(1) << (((nusiz >> 4) & 3).astype(_u32))
    pat = (_u32(1) << w) - _u32(1)
    on = ((enam & 2) != 0) & ((resmp & 2) == 0)
    return jnp.where(on, _place_bits(pat, pos), _u32(0))


def _ball_words(enabl, pos, ctrl):
    w = _u32(1) << (((ctrl >> 4) & 3).astype(_u32))
    pat = (_u32(1) << w) - _u32(1)
    return jnp.where((enabl & 2) != 0, _place_bits(pat, pos), _u32(0))


def _collisions(rec: jax.Array) -> jax.Array:
    """[8, B] per-line collision contributions, bit-parallel form.

    Exactly ``_collisions_matmul``'s semantics (property-locked in
    tests); each object mask is [5, B] u32 words and a pair test is
    (A & B) OR-reduced != 0."""

    def row(i):
        return rec[i : i + 1]

    pf = _pf_words(row(R_PF0), row(R_PF1), row(R_PF2), row(R_CTRLPF))
    bl = _ball_words(row(R_ENABL), row(R_POSBL), row(R_CTRLPF))
    pl0 = _player_words(row(R_GRP0), row(R_POSP0), row(R_NUSIZ0),
                        row(R_REFP0))
    pl1 = _player_words(row(R_GRP1), row(R_POSP1), row(R_NUSIZ1),
                        row(R_REFP1))
    m0 = _missile_words(row(R_ENAM0), row(R_POSM0), row(R_NUSIZ0),
                        row(R_RESMP0))
    m1 = _missile_words(row(R_ENAM1), row(R_POSM1), row(R_NUSIZ1),
                        row(R_RESMP1))

    def hit(a_, b_):
        x = a_ & b_
        return (
            (x[0:1] | x[1:2] | x[2:3] | x[3:4] | x[4:5]) != 0
        ).astype(_i32)

    return jnp.concatenate([
        (hit(m0, pl1) << 7) | (hit(m0, pl0) << 6),
        (hit(m1, pl0) << 7) | (hit(m1, pl1) << 6),
        (hit(pl0, pf) << 7) | (hit(pl0, bl) << 6),
        (hit(pl1, pf) << 7) | (hit(pl1, bl) << 6),
        (hit(m0, pf) << 7) | (hit(m0, bl) << 6),
        (hit(m1, pf) << 7) | (hit(m1, bl) << 6),
        hit(bl, pf) << 7,
        (hit(pl0, pl1) << 7) | (hit(m0, m1) << 6),
    ])


def _merge(act: jax.Array, new: dict, old: dict) -> dict:
    """Per-lane select; ``act`` [1, B] broadcasts over every [k, B] leaf."""
    return {k: jnp.where(act, v, old[k]) for k, v in new.items()}


def _line_slot(s: dict, done: jax.Array, tables: dict):
    """Advance every lane by one scanline (tia.run_frame's line_body).

    Returns (s', done', record [NREG,B], rowsel [B], row [B]).
    """

    def cond(c):
        s_, n = c
        act = (s_["line_cycles"] < CYCLES_PER_LINE) & (n < _BUDGET)
        return jnp.sum(act.astype(_i32)) > 0

    def body(c):
        # Three masked instructions per iteration: cuts the while-loop
        # carry/branch overhead (a large share of kernel time); the
        # active mask is recomputed between sub-steps, so semantics are
        # identical to single-stepping.
        s_, n = c
        for _ in range(3):
            act = (s_["line_cycles"] < CYCLES_PER_LINE) & (n < _BUDGET)
            s_ = step_batched(s_, tables, act)
            n = n + act.astype(_i32)
        return s_, n

    n0 = jnp.zeros_like(s["pc"])
    s2, _ = jax.lax.while_loop(cond, body, (s, n0))

    # _end_line: snapshot, collision OR, advance.
    record = _make_record(s2)
    vis = s2["scanline"] - FIRST_VISIBLE
    store = (vis >= 0) & (vis < VISIBLE_LINES)
    cx = jnp.where(
        store, s2["cx"] | _collisions(record), s2["cx"]
    )
    s3 = {
        **s2,
        "cx": cx,
        "scanline": s2["scanline"] + 1,
        "line_cycles": s2["line_cycles"] - CYCLES_PER_LINE,
    }
    done2 = done | s3["wrapped"] | (s3["scanline"] >= 262).astype(_i32)
    live = done == 0
    out = _merge(live, s3, s)
    keep = live & store
    record = jnp.where(keep, record, 0)
    rowsel = keep.astype(_i32)
    row = jnp.clip(out["scanline"] - 1 - FIRST_VISIBLE, 0, VISIBLE_LINES - 1)
    row = jnp.where(keep, row, 0)
    return out, done2, record, rowsel, row


def frame_batched(s: dict, tables: dict):
    """Pure-jnp batched frame: scan over line slots.

    Input state is lane-last; returns (s', recs [S,NREG,B],
    rowsel [S,B], rows [S,B]).  Bit-equivalent to
    ``vmap(tia.run_frame)`` (tests/test_machine_kernel.py).
    """
    s = {
        **s,
        "scanline": jnp.zeros_like(s["scanline"]),
        "wrapped": jnp.zeros_like(s["wrapped"]),
    }
    done0 = jnp.zeros(s["pc"].shape, _i32)

    def step(carry, _):
        s_, d = carry
        s2, d2, rec, rowsel, row = _line_slot(s_, d, tables)
        return (s2, d2), (rec, rowsel, row)

    (s, _), (recs, rowsel, rows) = jax.lax.scan(
        step, (s, done0), None, length=_SLOTS
    )
    return s, recs, rowsel[:, 0], rows[:, 0]


def scatter_lines(lines0, recs, rowsel, rows):
    """Merge per-slot records into the [B, 192, NREG] frame buffer.

    ``recs`` [S, NREG, B], ``rowsel``/``rows`` [S, B]; rows are the
    closing SCANLINE of each slot (visible-window index), so a VSYNC
    resync can't skew the buffer.
    """
    oh = (
        jax.nn.one_hot(rows, VISIBLE_LINES, dtype=jnp.bfloat16, axis=1)
        * rowsel[:, None, :].astype(jnp.bfloat16)
    )  # [S, L, B]
    ones = jnp.ones((recs.shape[0], 1, recs.shape[2]), jnp.bfloat16)
    recs_ext = jnp.concatenate([recs.astype(jnp.bfloat16), ones], axis=1)
    out = jnp.einsum(
        "slb,skb->blk", oh, recs_ext, preferred_element_type=_f32
    )  # [B, L, NREG + 1]
    new_rows = out[..., :-1].astype(_i32)
    written = out[..., -1]
    return jnp.where(written[:, :, None] != 0, new_rows, lines0)


# ---------------------------------------------------------------------------
# Layout conversion and the public vmap-compatible entry point
# ---------------------------------------------------------------------------

_2D = {"tia": 64, "cx": 8}


def _to_lane_last(m: dict) -> tuple[dict, jax.Array]:
    """[B]-leading machine pytree → lane-last state dict (+ lines)."""
    s = {}
    for k in SCALARS:
        s[k] = m[k].astype(_i32)[None, :]
    for k in _2D:
        s[k] = m[k].transpose(1, 0).astype(_i32)
    rb = m["ram"].astype(_i32)  # [B, 128] bytes
    words = (
        rb[:, 0::4] | rb[:, 1::4] << 8 | rb[:, 2::4] << 16
        | rb[:, 3::4] << 24
    )  # [B, 32]
    s["ram"] = words.transpose(1, 0)
    return s, m["lines"]


def _from_lane_last(s: dict, lines: jax.Array, proto: dict) -> dict:
    out = dict(proto)
    for k in SCALARS:
        out[k] = s[k][0].astype(proto[k].dtype)
    for k in _2D:
        out[k] = s[k].transpose(1, 0).astype(proto[k].dtype)
    w = s["ram"].transpose(1, 0)  # [B, 32] words
    rb = jnp.stack(
        [w & 0xFF, w >> 8 & 0xFF, w >> 16 & 0xFF, w >> 24 & 0xFF], -1
    ).reshape(w.shape[0], 128)
    out["ram"] = rb.astype(proto["ram"].dtype)
    out["lines"] = lines
    return out


def _run_frame_batched(m: dict, rom2d_j, decode_j, meta_j, indpair_j,
                       nbanks: int) -> dict:
    tables = {
        "rom2d": rom2d_j, "decode": decode_j, "meta": meta_j,
        "indpair": indpair_j, "nbanks": nbanks,
    }
    s, lines0 = _to_lane_last(m)
    if jax.default_backend() == "tpu":
        from .machine_pallas import frame_pallas

        s2, recs, rowsel, rows = frame_pallas(s, tables)
    else:
        s2, recs, rowsel, rows = frame_batched(s, tables)
    lines = scatter_lines(lines0, recs, rowsel, rows)
    return _from_lane_last(s2, lines, m)


@functools.lru_cache(maxsize=32)
def _make_run_frame(rom_bytes: bytes):
    """Build the custom-vmap frame function for one ROM image.

    Unbatched call = the scalar ``tia.run_frame`` (drop-in); under
    ``vmap`` (the engine always vmaps) the batched lane-last kernel
    runs instead — this is exactly what ``jax.custom_batching`` is for.
    """
    rom_np = np.frombuffer(rom_bytes, np.uint8)
    tables = build_tables(rom_np)
    nbanks = int(tables["nbanks"])
    # Closure holds NUMPY tables only: jnp constants created inside a
    # trace are tracers, and this function is lru_cached across traces.

    @jax.custom_batching.custom_vmap
    def run_frame(m: dict) -> dict:
        return tia.run_frame(m, jnp.asarray(rom_np, jnp.int32), 0)

    @run_frame.def_vmap
    def _batched(axis_size, in_batched, m):  # noqa: ANN001
        # Leaves closed over by outer lax.cond/fori can reach here
        # unbatched; broadcast them to the batch before the kernel.
        m = jax.tree_util.tree_map(
            lambda leaf, b: leaf if b else jnp.broadcast_to(
                leaf, (axis_size,) + leaf.shape
            ),
            m, in_batched[0],
        )
        out = _run_frame_batched(
            m, jnp.asarray(tables["rom2d"]), jnp.asarray(tables["decode"]),
            jnp.asarray(tables["meta"]), jnp.asarray(tables["indpair"]),
            nbanks,
        )
        return out, jax.tree_util.tree_map(lambda _: True, out)

    return run_frame


def run_frame_fast(m: dict, rom_np: np.ndarray) -> dict:
    """Advance one frame; drop-in for ``tia.run_frame(m, rom, ipf)``.

    Scalar when called directly; batched lane-last (Pallas on TPU)
    under ``vmap``.
    """
    return _make_run_frame(np.asarray(rom_np, np.uint8).tobytes())(m)
