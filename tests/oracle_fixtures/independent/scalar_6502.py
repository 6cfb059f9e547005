"""Scalar 6502 oracle — plain-Python interpreter written directly from
the MOS 6502 ISA (opcode-by-opcode if/elif), independent of the
table-driven branchless JAX core in ``envpool_tpu/envs/atari/cpu6502.py``.

Shares only the documented bus model (Atari 2600: TIA $00-$3F writes /
zero reads, RIOT RAM $80-$FF with the $180-$1FF stack mirror, SWCHA at
$280, 4K ROM at $F000 with mirroring) and two documented scope choices:
BRK behaves as a 1-byte halt-NOP (no IRQ vector on a 2600 cart test).
NMOS decimal mode is implemented (ADC: BCD result, N from the
intermediate high byte, Z binary; SBC: BCD result, binary flags).
"""

from __future__ import annotations


class Scalar6502:
    def __init__(self, rom):
        self.rom = [int(b) & 0xFF for b in rom]
        assert len(self.rom) == 4096
        self.ram = [0] * 128
        self.tia = [0] * 64
        self.swcha = 0xFF
        self.inpt4 = 0x80
        self.a = self.x = self.y = 0
        self.sp = 0xFD
        self.p = 0x24  # U | I
        self.pc = self.rom[0xFFC] | (self.rom[0xFFD] << 8)
        self.cycles = 0

    # -- bus ---------------------------------------------------------------

    def read(self, addr):
        addr &= 0x1FFF
        if addr >= 0x1000:
            return self.rom[addr & 0xFFF]
        if addr < 0x1000 and (addr & 0x200) == 0 and (addr & 0x80) == 0x80:
            return self.ram[addr & 0x7F]
        if addr == 0x280:
            return self.swcha
        if addr == 0x3C:
            return self.inpt4
        return 0

    def write(self, addr, val):
        addr &= 0x1FFF
        val &= 0xFF
        if addr < 0x1000 and (addr & 0x200) == 0 and (addr & 0x80) == 0x80:
            self.ram[addr & 0x7F] = val
        elif addr < 0x40:
            self.tia[addr] = val

    # -- flags -------------------------------------------------------------

    def set_zn(self, v):
        v &= 0xFF
        self.p = (self.p & ~0x82) | (0x02 if v == 0 else 0) | (
            0x80 if v & 0x80 else 0
        )
        return v

    def get(self, bit):
        return (self.p >> bit) & 1

    def put(self, bit, v):
        self.p = (self.p & ~(1 << bit)) | ((1 if v else 0) << bit)

    # -- stack -------------------------------------------------------------

    def push(self, v):
        self.write(0x100 + self.sp, v)
        self.sp = (self.sp - 1) & 0xFF

    def pull(self):
        self.sp = (self.sp + 1) & 0xFF
        return self.read(0x100 + self.sp)

    # -- addressing --------------------------------------------------------

    def _abs(self):
        lo = self.read(self.pc + 1)
        hi = self.read(self.pc + 2)
        return lo | (hi << 8)

    def step(self):
        op = self.read(self.pc)
        pc1 = self.read(self.pc + 1)

        def zp():
            return pc1

        def zpx():
            return (pc1 + self.x) & 0xFF

        def zpy():
            return (pc1 + self.y) & 0xFF

        def izx():
            p = (pc1 + self.x) & 0xFF
            return self.read(p) | (self.read((p + 1) & 0xFF) << 8)

        def izy():
            base = self.read(pc1) | (self.read((pc1 + 1) & 0xFF) << 8)
            return (base + self.y) & 0xFFFF

        A = self._abs

        def abx():
            return (A() + self.x) & 0xFFFF

        def aby():
            return (A() + self.y) & 0xFFFF

        # (addr_fn, size) per mode for each opcode family, written longhand.
        modes = {
            # LDA
            0xA9: ("imm", 2), 0xA5: (zp, 2), 0xB5: (zpx, 2), 0xAD: (A, 3),
            0xBD: (abx, 3), 0xB9: (aby, 3), 0xA1: (izx, 2), 0xB1: (izy, 2),
        }

        def operand(addr_mode):
            fn, size = addr_mode
            if fn == "imm":
                return pc1, size, None
            addr = fn()
            return self.read(addr), size, addr

        def adc(v):
            c = self.get(0)
            s = self.a + v + c
            if self.get(3):  # decimal (NMOS)
                lo = (self.a & 0x0F) + (v & 0x0F) + c
                hi = (self.a & 0xF0) + (v & 0xF0)
                if lo > 0x09:
                    hi += 0x10
                    lo += 0x06
                self.put(6, (~(self.a ^ v) & (self.a ^ hi)) & 0x80)
                n_dec = (hi & 0x80) != 0
                if hi > 0x90:
                    hi += 0x60
                self.put(0, hi > 0xF0)
                self.put(1, (s & 0xFF) == 0)       # Z binary
                self.put(7, n_dec)                 # N from intermediate
                self.a = ((lo & 0x0F) | (hi & 0xF0)) & 0xFF
            else:
                self.put(0, s > 0xFF)
                self.put(6, (~(self.a ^ v) & (self.a ^ s)) & 0x80)
                self.a = self.set_zn(s)

        def sbc(v):
            c = self.get(0)
            vv = v ^ 0xFF
            s = self.a + vv + c
            # Flags are always binary on NMOS.
            self.put(0, s > 0xFF)
            self.put(6, (~(self.a ^ vv) & (self.a ^ s)) & 0x80)
            self.set_zn(s)
            if self.get(3):
                lo = (self.a & 0x0F) - (v & 0x0F) - (1 - c)
                borrow = (lo & 0x10) != 0
                if borrow:
                    lo -= 6
                hi = (self.a >> 4) - (v >> 4) - (1 if borrow else 0)
                if hi & 0x10:
                    hi -= 6
                self.a = ((lo & 0x0F) | ((hi & 0x0F) << 4)) & 0xFF
            else:
                self.a = s & 0xFF

        def branch(cond):
            off = pc1 if pc1 < 0x80 else pc1 - 256
            self.pc = (self.pc + 2) & 0xFFFF
            if cond:
                self.pc = (self.pc + off) & 0xFFFF

        # Dispatch (grouped by family; sizes advance PC unless control op).
        am = {
            "lda": {0xA9: ("imm", 2), 0xA5: (zp, 2), 0xB5: (zpx, 2),
                    0xAD: (A, 3), 0xBD: (abx, 3), 0xB9: (aby, 3),
                    0xA1: (izx, 2), 0xB1: (izy, 2)},
            "ldx": {0xA2: ("imm", 2), 0xA6: (zp, 2), 0xB6: (zpy, 2),
                    0xAE: (A, 3), 0xBE: (aby, 3)},
            "ldy": {0xA0: ("imm", 2), 0xA4: (zp, 2), 0xB4: (zpx, 2),
                    0xAC: (A, 3), 0xBC: (abx, 3)},
            "sta": {0x85: (zp, 2), 0x95: (zpx, 2), 0x8D: (A, 3),
                    0x9D: (abx, 3), 0x99: (aby, 3), 0x81: (izx, 2),
                    0x91: (izy, 2)},
            "stx": {0x86: (zp, 2), 0x96: (zpy, 2), 0x8E: (A, 3)},
            "sty": {0x84: (zp, 2), 0x94: (zpx, 2), 0x8C: (A, 3)},
            "and": {0x29: ("imm", 2), 0x25: (zp, 2), 0x35: (zpx, 2),
                    0x2D: (A, 3), 0x3D: (abx, 3), 0x39: (aby, 3),
                    0x21: (izx, 2), 0x31: (izy, 2)},
            "ora": {0x09: ("imm", 2), 0x05: (zp, 2), 0x15: (zpx, 2),
                    0x0D: (A, 3), 0x1D: (abx, 3), 0x19: (aby, 3),
                    0x01: (izx, 2), 0x11: (izy, 2)},
            "eor": {0x49: ("imm", 2), 0x45: (zp, 2), 0x55: (zpx, 2),
                    0x4D: (A, 3), 0x5D: (abx, 3), 0x59: (aby, 3),
                    0x41: (izx, 2), 0x51: (izy, 2)},
            "adc": {0x69: ("imm", 2), 0x65: (zp, 2), 0x75: (zpx, 2),
                    0x6D: (A, 3), 0x7D: (abx, 3), 0x79: (aby, 3),
                    0x61: (izx, 2), 0x71: (izy, 2)},
            "sbc": {0xE9: ("imm", 2), 0xE5: (zp, 2), 0xF5: (zpx, 2),
                    0xED: (A, 3), 0xFD: (abx, 3), 0xF9: (aby, 3),
                    0xE1: (izx, 2), 0xF1: (izy, 2)},
            "cmp": {0xC9: ("imm", 2), 0xC5: (zp, 2), 0xD5: (zpx, 2),
                    0xCD: (A, 3), 0xDD: (abx, 3), 0xD9: (aby, 3),
                    0xC1: (izx, 2), 0xD1: (izy, 2)},
            "cpx": {0xE0: ("imm", 2), 0xE4: (zp, 2), 0xEC: (A, 3)},
            "cpy": {0xC0: ("imm", 2), 0xC4: (zp, 2), 0xCC: (A, 3)},
            "inc": {0xE6: (zp, 2), 0xF6: (zpx, 2), 0xEE: (A, 3),
                    0xFE: (abx, 3)},
            "dec": {0xC6: (zp, 2), 0xD6: (zpx, 2), 0xCE: (A, 3),
                    0xDE: (abx, 3)},
            "asl": {0x06: (zp, 2), 0x16: (zpx, 2), 0x0E: (A, 3),
                    0x1E: (abx, 3)},
            "lsr": {0x46: (zp, 2), 0x56: (zpx, 2), 0x4E: (A, 3),
                    0x5E: (abx, 3)},
            "rol": {0x26: (zp, 2), 0x36: (zpx, 2), 0x2E: (A, 3),
                    0x3E: (abx, 3)},
            "ror": {0x66: (zp, 2), 0x76: (zpx, 2), 0x6E: (A, 3),
                    0x7E: (abx, 3)},
            "bit": {0x24: (zp, 2), 0x2C: (A, 3)},
        }

        for name, table in am.items():
            if op not in table:
                continue
            v, size, addr = operand(table[op])
            if name == "lda":
                self.a = self.set_zn(v)
            elif name == "ldx":
                self.x = self.set_zn(v)
            elif name == "ldy":
                self.y = self.set_zn(v)
            elif name == "sta":
                self.write(addr, self.a)
            elif name == "stx":
                self.write(addr, self.x)
            elif name == "sty":
                self.write(addr, self.y)
            elif name == "and":
                self.a = self.set_zn(self.a & v)
            elif name == "ora":
                self.a = self.set_zn(self.a | v)
            elif name == "eor":
                self.a = self.set_zn(self.a ^ v)
            elif name == "adc":
                adc(v)
            elif name == "sbc":
                sbc(v)
            elif name in ("cmp", "cpx", "cpy"):
                src = {"cmp": self.a, "cpx": self.x, "cpy": self.y}[name]
                self.put(0, src >= v)
                self.set_zn((src - v) & 0xFF)
            elif name == "inc":
                self.write(addr, self.set_zn(v + 1))
            elif name == "dec":
                self.write(addr, self.set_zn(v - 1))
            elif name == "asl":
                self.put(0, v & 0x80)
                self.write(addr, self.set_zn(v << 1))
            elif name == "lsr":
                self.put(0, v & 1)
                self.write(addr, self.set_zn(v >> 1))
            elif name == "rol":
                c = self.get(0)
                self.put(0, v & 0x80)
                self.write(addr, self.set_zn((v << 1) | c))
            elif name == "ror":
                c = self.get(0)
                self.put(0, v & 1)
                self.write(addr, self.set_zn((v >> 1) | (c << 7)))
            elif name == "bit":
                self.put(1, (self.a & v) == 0)
                self.put(6, v & 0x40)
                self.put(7, v & 0x80)
            self.pc = (self.pc + size) & 0xFFFF
            self.cycles += 2
            return

        # Accumulator shifts.
        if op == 0x0A:
            self.put(0, self.a & 0x80)
            self.a = self.set_zn(self.a << 1)
        elif op == 0x4A:
            self.put(0, self.a & 1)
            self.a = self.set_zn(self.a >> 1)
        elif op == 0x2A:
            c = self.get(0)
            self.put(0, self.a & 0x80)
            self.a = self.set_zn((self.a << 1) | c)
        elif op == 0x6A:
            c = self.get(0)
            self.put(0, self.a & 1)
            self.a = self.set_zn((self.a >> 1) | (c << 7))
        # Transfers / stack / flags.
        elif op == 0xAA:
            self.x = self.set_zn(self.a)
        elif op == 0xA8:
            self.y = self.set_zn(self.a)
        elif op == 0x8A:
            self.a = self.set_zn(self.x)
        elif op == 0x98:
            self.a = self.set_zn(self.y)
        elif op == 0xBA:
            self.x = self.set_zn(self.sp)
        elif op == 0x9A:
            self.sp = self.x
        elif op == 0x48:
            self.push(self.a)
        elif op == 0x08:
            self.push(self.p | 0x30)
        elif op == 0x68:
            self.a = self.set_zn(self.pull())
        elif op == 0x28:
            self.p = (self.pull() & ~0x10) | 0x20
        elif op == 0xE8:
            self.x = self.set_zn(self.x + 1)
        elif op == 0xC8:
            self.y = self.set_zn(self.y + 1)
        elif op == 0xCA:
            self.x = self.set_zn(self.x - 1)
        elif op == 0x88:
            self.y = self.set_zn(self.y - 1)
        elif op == 0x18:
            self.put(0, 0)
        elif op == 0x38:
            self.put(0, 1)
        elif op == 0xD8:
            self.put(3, 0)
        elif op == 0xF8:
            self.put(3, 1)
        elif op == 0x58:
            self.put(2, 0)
        elif op == 0x78:
            self.put(2, 1)
        elif op == 0xB8:
            self.put(6, 0)
        # Control flow.
        elif op == 0x4C:
            self.pc = self._abs()
            self.cycles += 3
            return
        elif op == 0x6C:
            base = self._abs()
            lo = self.read(base)
            hi = self.read((base & 0xFF00) | ((base + 1) & 0xFF))
            self.pc = lo | (hi << 8)
            self.cycles += 5
            return
        elif op == 0x20:
            ret = (self.pc + 2) & 0xFFFF
            self.push(ret >> 8)
            self.push(ret & 0xFF)
            self.pc = self._abs()
            self.cycles += 6
            return
        elif op == 0x60:
            lo = self.pull()
            hi = self.pull()
            self.pc = ((lo | (hi << 8)) + 1) & 0xFFFF
            self.cycles += 6
            return
        elif op == 0x40:
            self.p = (self.pull() & ~0x10) | 0x20
            lo = self.pull()
            hi = self.pull()
            self.pc = lo | (hi << 8)
            self.cycles += 6
            return
        elif op in (0x90, 0xB0, 0xF0, 0x30, 0xD0, 0x10, 0x50, 0x70):
            conds = {
                0x90: self.get(0) == 0, 0xB0: self.get(0) == 1,
                0xF0: self.get(1) == 1, 0xD0: self.get(1) == 0,
                0x30: self.get(7) == 1, 0x10: self.get(7) == 0,
                0x50: self.get(6) == 0, 0x70: self.get(6) == 1,
            }
            branch(conds[op])
            self.cycles += 2
            return
        # BRK-as-halt-NOP + every unofficial opcode = 1-byte NOP.
        self.pc = (self.pc + 1) & 0xFFFF
        self.cycles += 2
