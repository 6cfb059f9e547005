"""6502 interpreter: lockstep fuzzing vs the independent scalar oracle +
a hand-assembled program with human-verifiable results.

The JAX core (envs/atari/cpu6502.py) is table-driven and branchless; the
oracle (oracle_fixtures/independent/scalar_6502.py) is a plain if/elif
interpreter written from the ISA.  Agreement over random ROMs executes
every addressing mode and flag path from both directions.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "oracle_fixtures")
)

from independent.scalar_6502 import Scalar6502  # noqa: E402

from envpool_tpu.envs.atari import cpu6502  # noqa: E402


def _sync_state(m):
    return {
        "a": int(m["a"]), "x": int(m["x"]), "y": int(m["y"]),
        "sp": int(m["sp"]), "p": int(m["p"]), "pc": int(m["pc"]),
        "ram": np.asarray(m["ram"]).tolist(),
        "tia": np.asarray(m["tia"]).tolist(),
    }


def _oracle_state(o):
    return {
        "a": o.a, "x": o.x, "y": o.y, "sp": o.sp, "p": o.p, "pc": o.pc,
        "ram": list(o.ram), "tia": list(o.tia),
    }


def _run_lockstep(rom, steps, tag):
    m = cpu6502.make_machine(rom)
    oracle = Scalar6502(rom)
    step = jax.jit(cpu6502.step_instruction)
    rom_j = jnp.asarray(rom, jnp.int32)
    for t in range(steps):
        m = step(m, rom_j)
        oracle.step()
        got = _sync_state(m)
        want = _oracle_state(oracle)
        assert got == want, (
            f"{tag}: diverged at instruction {t}\n"
            f"  jax:    { {k: v for k, v in got.items() if k not in ('ram', 'tia')} }\n"
            f"  oracle: { {k: v for k, v in want.items() if k not in ('ram', 'tia')} }\n"
            f"  ram equal: {got['ram'] == want['ram']} "
            f"tia equal: {got['tia'] == want['tia']}"
        )


def test_fuzz_random_roms():
    """Fully random ROM bytes: every byte value is decoded identically
    (official ops by the ISA, everything else as 1-byte NOP)."""
    for seed in range(4):
        rng = np.random.default_rng(seed)
        rom = rng.integers(0, 256, 4096).astype(np.uint8)
        rom[0xFFC] = 0x00
        rom[0xFFD] = 0xF0
        _run_lockstep(rom, 300, f"random seed={seed}")


def test_fuzz_official_streams():
    """Streams of official opcodes with random operands (denser coverage
    of the ALU/flag paths than uniform bytes)."""
    official = np.flatnonzero(
        np.asarray(cpu6502.CPU_TABLES[1]) != cpu6502.O_NOP
    )
    official = official[official != 0x00]  # BRK is halt-NOP scope
    sizes = np.asarray(cpu6502.CPU_TABLES[2])
    for seed in range(4):
        rng = np.random.default_rng(100 + seed)
        rom = rng.integers(0, 256, 4096).astype(np.uint8)
        pos = 0
        while pos < 3500:
            op = int(rng.choice(official))
            rom[pos] = op
            for k in range(1, int(sizes[op])):
                rom[pos + k] = rng.integers(0, 256)
            pos += int(sizes[op])
        rom[0xFFC] = 0x00
        rom[0xFFD] = 0xF0
        _run_lockstep(rom, 400, f"official seed={seed}")


def _asm(program):
    rom = np.zeros(4096, np.uint8)
    rom[: len(program)] = program
    rom[0xFFC] = 0x00
    rom[0xFFD] = 0xF0
    return rom


def test_program_sum_and_fibonacci():
    """Hand-assembled: sum 1..10 → $80, fib(10) → $81, then spin."""
    prog = [
        0xA9, 0x00,        # LDA #0
        0xA2, 0x0A,        # LDX #10
        # loop: CLC; ADC X... (no ADC-from-X: use STX $90; ADC $90)
        0x86, 0x90,        # STX $90
        0x18,              # CLC
        0x65, 0x90,        # ADC $90
        0xCA,              # DEX
        0xD0, 0xF8,        # BNE loop (-8)
        0x85, 0x80,        # STA $80  (sum 1..10 = 55)
        # Fibonacci: $91=0, $92=1; 9 iterations → fib(10)=55
        0xA9, 0x00, 0x85, 0x91,   # LDA #0; STA $91
        0xA9, 0x01, 0x85, 0x92,   # LDA #1; STA $92
        0xA0, 0x09,               # LDY #9
        # fib: LDA $91; CLC; ADC $92; LDX $92; STX $91; STA $92; DEY; BNE
        0xA5, 0x91,
        0x18,
        0x65, 0x92,
        0xA6, 0x92,
        0x86, 0x91,
        0x85, 0x92,
        0x88,
        0xD0, 0xF2,               # BNE fib (-14)
        0xA5, 0x92, 0x85, 0x81,   # LDA $92; STA $81
        0x4C, 0x2A, 0xF0,         # JMP * (spin)
    ]
    rom = _asm(prog)
    m = cpu6502.make_machine(rom)
    m = jax.jit(cpu6502.run, static_argnums=2)(
        m, jnp.asarray(rom, jnp.int32), 200
    )
    ram = np.asarray(m["ram"])
    assert ram[0] == 55, ram[0]    # $80: sum 1..10
    assert ram[1] == 55, ram[1]    # $81: fib(10)
    # Oracle agrees on the full final state.
    o = Scalar6502(rom)
    for _ in range(200):
        o.step()
    assert o.ram[0] == 55 and o.ram[1] == 55
    assert int(m["pc"]) == o.pc


def test_stack_and_subroutines():
    """JSR/RTS nesting + PHA/PLA round-trips through the $180 RAM mirror."""
    prog = [
        0xA2, 0xFF, 0x9A,        # LDX #$FF; TXS
        0xA9, 0x42,              # LDA #$42
        0x20, 0x10, 0xF0,        # JSR $F010
        0x85, 0x82,              # STA $82   (now $43)
        0x4C, 0x0A, 0xF0,        # JMP * (spin)
    ]
    prog += [0xEA] * (0x10 - len(prog))
    prog += [
        0x48,                    # PHA
        0x68,                    # PLA
        0x18, 0x69, 0x01,        # CLC; ADC #1
        0x60,                    # RTS
    ]
    rom = _asm(prog)
    m = cpu6502.make_machine(rom)
    m = jax.jit(cpu6502.run, static_argnums=2)(
        m, jnp.asarray(rom, jnp.int32), 40
    )
    assert int(np.asarray(m["ram"])[2]) == 0x43


def test_vmapped_machines_diverge_by_input():
    """A pool of machines steps under vmap; per-machine SWCHA inputs
    produce different RAM (the env-pool execution model)."""
    prog = [
        0xAD, 0x80, 0x02,        # LDA $0280  (SWCHA)
        0x85, 0x83,              # STA $83
        0x4C, 0x05, 0xF0,        # JMP * (spin)
    ]
    rom = _asm(prog)
    base = cpu6502.make_machine(rom)
    B = 8
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B, *jnp.shape(x))), base
    )
    batched = {**batched, "swcha": jnp.arange(B, dtype=jnp.int32) + 16}
    rom_j = jnp.asarray(rom, jnp.int32)
    stepped = jax.jit(
        jax.vmap(lambda mm: cpu6502.run(mm, rom_j, 8))
    )(batched)
    ram = np.asarray(stepped["ram"])
    np.testing.assert_array_equal(ram[:, 3], np.arange(B) + 16)


def test_decimal_mode_vectors_and_fuzz():
    """NMOS BCD: known arithmetic vectors + a SED-heavy fuzz stream."""
    # Known vectors: (a, operand, carry_in, op) -> (result, carry_out)
    vectors = [
        (0x19, 0x01, 0, "adc", 0x20, 0),
        (0x99, 0x01, 0, "adc", 0x00, 1),
        (0x50, 0x50, 0, "adc", 0x00, 1),
        (0x20, 0x01, 1, "sbc", 0x19, 1),
        (0x00, 0x01, 1, "sbc", 0x99, 0),
    ]
    for a, v, c, op, want, want_c in vectors:
        prog = [
            0xF8,                            # SED
            0x38 if c else 0x18,             # SEC/CLC
            0xA9, a,                         # LDA #a
            (0x69 if op == "adc" else 0xE9), v,
            0x85, 0x80,                      # STA $80
            0x08, 0x68, 0x85, 0x81,          # PHP; PLA; STA $81
            0x4C, 0x0C, 0xF0,
        ]
        rom = _asm(prog)
        m = cpu6502.make_machine(rom)
        m = jax.jit(cpu6502.run, static_argnums=2)(
            m, jnp.asarray(rom, jnp.int32), 10
        )
        ram = np.asarray(m["ram"])
        assert ram[0] == want, (op, hex(a), hex(v), c, hex(int(ram[0])))
        assert (ram[1] & 1) == want_c, (op, hex(a), hex(v), c, ram[1] & 1)
        # Scalar oracle agrees bit for bit (including flags).
        o = Scalar6502(rom)
        for _ in range(10):
            o.step()
        assert o.ram[0] == want and (o.ram[1] & 1) == want_c

    # SED-heavy fuzz: dense decimal ADC/SBC with random operands.
    rng = np.random.default_rng(7)
    rom = rng.integers(0, 256, 4096).astype(np.uint8)
    pos = 0
    rom[pos] = 0xF8  # SED
    pos += 1
    ops = [0x69, 0xE9, 0xA9, 0x18, 0x38, 0x69, 0xE9]
    while pos < 3000:
        op = int(rng.choice(ops))
        rom[pos] = op
        if op in (0x69, 0xE9, 0xA9):
            rom[pos + 1] = rng.integers(0, 256)
            pos += 2
        else:
            pos += 1
    rom[0xFFC] = 0x00
    rom[0xFFD] = 0xF0
    _run_lockstep(rom, 300, "decimal fuzz")


def _trampoline(banks, hops, start_bank):
    """Build a banked ROM whose code hops across banks via hotspot
    reads, dropping a marker byte in RAM after each hop."""
    rom = np.zeros(banks * 4096, np.uint8)
    hot_base = 0xFF8 if banks == 2 else 0xFF6
    pos = 0
    cur = start_bank

    def put(bank, at, bs):
        rom[bank * 4096 + at : bank * 4096 + at + len(bs)] = bs

    for i, nxt in enumerate(hops):
        # marker i+1 in RAM $90+i, then LDA hotspot → switch to `nxt`.
        put(cur, pos, [0xA9, i + 1, 0x85, 0x90 + i])
        put(cur, pos + 4, [0xAD, (hot_base + nxt) & 0xFF, 0xFF])
        pos += 7
        cur = nxt
    put(cur, pos, [0xA9, len(hops) + 1, 0x85, 0x90 + len(hops)])
    spin = 0xF000 + pos + 4
    put(cur, pos + 4, [0x4C, spin & 0xFF, spin >> 8])
    put(start_bank, 0xFFC, [0x00, 0xF0])
    return rom


@pytest.mark.parametrize(
    "banks,start,hops",
    [(2, 1, [0, 1, 0]), (4, 0, [2, 3, 1, 0])],
    ids=["F8-8K", "F6-16K"],
)
def test_bankswitching_trampoline(banks, start, hops):
    """F8/F6 hotspot accesses switch the mapped 4K window; execution
    falls through into the new bank at the same PC (the standard
    cartridge trampoline), leaving one marker per bank visited."""
    rom = _trampoline(banks, hops, start)
    m = cpu6502.make_machine(rom)
    assert int(m["bank"]) == start
    m = jax.jit(cpu6502.run, static_argnums=2)(
        m, jnp.asarray(rom, jnp.int32), 4 * (len(hops) + 2)
    )
    ram = np.asarray(m["ram"])
    want = list(range(1, len(hops) + 2))
    assert list(ram[0x10 : 0x10 + len(want)]) == want, ram[0x10:0x18]
    assert int(m["bank"]) == hops[-1]


def test_bankswitching_fetch_trigger():
    """Instruction FETCH at a hotspot switches banks (Stella semantics:
    the cart switches on any hotspot access, then the fetch reads the
    NEW bank).  Bank 1 falls through into $1FF8 (hotspot for bank 0);
    bank 0 must hold real code AT the hotspot address that runs next."""
    rom = np.zeros(2 * 4096, np.uint8)

    def put(bank, at, bs):
        rom[bank * 4096 + at : bank * 4096 + at + len(bs)] = bs

    # Bank 1 (power-up bank): marker $90=1, then code laid out so the
    # NEXT instruction's fetch address is exactly $1FF8 (fall-through).
    put(1, 0xFF2, [0xA9, 0x01, 0x85, 0x90, 0xEA, 0xEA])  # ends at $FF8
    # Bank 0: at the hotspot itself, marker $91=2, then JMP to a spin
    # loop at $F000 (the JMP doubles as bank 0's reset-vector bytes).
    put(0, 0xFF8, [0xA9, 0x02, 0x85, 0x91])
    put(0, 0xFFC, [0x4C, 0x00, 0xF0])
    put(0, 0x000, [0x4C, 0x00, 0xF0])  # spin
    put(1, 0xFFC, [0xF2, 0xFF])  # reset vector → $FFF2 (bank 1)
    m = cpu6502.make_machine(rom)
    assert int(m["bank"]) == 1
    m = jax.jit(cpu6502.run, static_argnums=2)(
        m, jnp.asarray(rom, jnp.int32), 12
    )
    ram = np.asarray(m["ram"])
    assert ram[0x10] == 1, ram[0x10:0x14]  # bank-1 marker ($90)
    assert ram[0x11] == 2, ram[0x10:0x14]  # bank-0 marker ($91)
    assert int(m["bank"]) == 0
