"""Tiny label-based 6502 assembler for hand-built 2600 test cartridges.

Only the opcodes the test ROMs need; two-pass label resolution for
branches and JMP/JSR.  4K image at $F000 with the reset vector set.
Independent of the env code (test tooling only).
"""

from __future__ import annotations

import numpy as np

ORG = 0xF000


class Asm:
    def __init__(self):
        self.b: list[int] = []
        self.labels: dict[str, int] = {}
        self.fix: list[tuple[int, str, str]] = []  # (pos, kind, label)

    # -- core ------------------------------------------------------------

    def label(self, name: str) -> None:
        self.labels[name] = len(self.b)

    def db(self, *vals: int) -> None:
        self.b.extend(v & 0xFF for v in vals)

    def _branch(self, opcode: int, target: str) -> None:
        self.db(opcode, 0x00)
        self.fix.append((len(self.b) - 1, "rel", target))

    def _abs(self, opcode: int, target: str) -> None:
        self.db(opcode, 0x00, 0x00)
        self.fix.append((len(self.b) - 2, "abs", target))

    def rom(self) -> np.ndarray:
        rom = np.zeros(4096, np.uint8)
        for pos, kind, name in self.fix:
            t = self.labels[name]
            if kind == "rel":
                off = t - (pos + 1)
                assert -128 <= off < 128, (name, off)
                self.b[pos] = off & 0xFF
            else:
                addr = ORG + t
                self.b[pos] = addr & 0xFF
                self.b[pos + 1] = (addr >> 8) & 0xFF
        assert len(self.b) <= 4090
        rom[: len(self.b)] = self.b
        rom[0xFFC] = ORG & 0xFF
        rom[0xFFD] = (ORG >> 8) & 0xFF
        return rom

    # -- mnemonics -------------------------------------------------------

    def lda_imm(self, v): self.db(0xA9, v)
    def lda_zp(self, a): self.db(0xA5, a)
    def lda_abs(self, a): self.db(0xAD, a & 0xFF, (a >> 8) & 0xFF)
    def sta_zp(self, a): self.db(0x85, a)
    def ldx_imm(self, v): self.db(0xA2, v)
    def ldy_imm(self, v): self.db(0xA0, v)
    def inc_zp(self, a): self.db(0xE6, a)
    def dec_zp(self, a): self.db(0xC6, a)
    def cmp_imm(self, v): self.db(0xC9, v)
    def cpx_imm(self, v): self.db(0xE0, v)
    def and_imm(self, v): self.db(0x29, v)
    def sbc_zp(self, a): self.db(0xE5, a)
    def txa(self): self.db(0x8A)
    def tax(self): self.db(0xAA)
    def inx(self): self.db(0xE8)
    def dex(self): self.db(0xCA)
    def dey(self): self.db(0x88)
    def sec(self): self.db(0x38)
    def clc(self): self.db(0x18)
    def nop(self): self.db(0xEA)
    def bne(self, t): self._branch(0xD0, t)
    def beq(self, t): self._branch(0xF0, t)
    def bcc(self, t): self._branch(0x90, t)
    def bcs(self, t): self._branch(0xB0, t)
    def bpl(self, t): self._branch(0x10, t)
    def bmi(self, t): self._branch(0x30, t)
    def jmp(self, t): self._abs(0x4C, t)
