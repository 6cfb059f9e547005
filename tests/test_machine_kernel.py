"""Batched lane-last frame kernel vs the vmapped scalar emulator.

The equivalence proof for machine_kernel.py: the same cartridges the
scalar path is tested on (the playable pong ROM, banked trampolines)
must produce BIT-IDENTICAL machine state, collision latches and frame
buffers through `frame_batched`/`run_frame_fast` as through
``vmap(tia.run_frame)``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from envpool_tpu.envs.atari import cpu6502, machine_kernel, tia
from test_machine_game import _pong_rom


def _boot_batch(rom_np, batch):
    m = tia.attach_tia(cpu6502.make_machine(rom_np))
    return jax.tree_util.tree_map(
        lambda x: jnp.stack([x] * batch), m
    )


def _cmp_trees(a, b, where):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = jax.tree_util.tree_leaves_with_path(b)
    for (ka, va), (_, vb) in zip(fa, fb):
        np.testing.assert_array_equal(
            np.asarray(va), np.asarray(vb),
            err_msg=f"{where}: leaf {jax.tree_util.keystr(ka)} differs",
        )


@pytest.mark.parametrize("frames", [3])
def test_pong_cartridge_lockstep(frames):
    """Pong cart, 4 lanes with different joystick inputs, N frames:
    every state leaf (RAM, TIA file, collision latches, positions,
    frame buffer) bit-equal between the two implementations."""
    rom_np = _pong_rom()
    batch = 4
    m_ref = _boot_batch(rom_np, batch)
    rom_j = jnp.asarray(rom_np, jnp.int32)
    # Different inputs per lane: none, up, down, up (active-low bits).
    swcha = jnp.asarray([0xFF, 0xFF ^ 0x10, 0xFF ^ 0x20, 0xFF ^ 0x10],
                        jnp.int32)
    m_ref = {**m_ref, "swcha": swcha}
    m_fast = m_ref

    ref_step = jax.jit(
        jax.vmap(lambda mm: tia.run_frame(mm, rom_j, 4600))
    )
    fast_step = jax.jit(
        jax.vmap(lambda mm: machine_kernel.run_frame_fast(mm, rom_np))
    )
    for f in range(frames):
        m_ref = ref_step(m_ref)
        m_fast = fast_step(m_fast)
        _cmp_trees(m_ref, m_fast, f"frame {f}")
    # The game actually ran: ball present, nonzero line buffer.
    assert int(np.asarray(m_ref["lines"]).sum()) != 0


def test_banked_rom_lockstep():
    """F8 8K cartridge with a cross-bank kernel loop: bank state and
    frame buffer agree between the paths."""
    rom = np.zeros(8192, np.uint8)

    def put(bank, at, bs):
        rom[bank * 4096 + at : bank * 4096 + at + len(bs)] = bs

    # Bank 1 boot: set COLUBK, strobe WSYNC in a loop, swap to bank 0.
    put(1, 0x000, [
        0xA9, 0x30, 0x85, 0x09,        # LDA #$30, STA COLUBK
        0xA9, 0x02, 0x85, 0x00,        # VSYNC on
        0x85, 0x02, 0x85, 0x02, 0x85, 0x02,  # 3x WSYNC
        0xA9, 0x00, 0x85, 0x00,        # VSYNC off
        0xAD, 0xF8, 0xFF,              # LDA $FFF8 -> bank 0
    ])
    # Bank 0 at the same continuation address: WSYNC spin + jump back.
    cont = 21
    put(0, cont, [0x85, 0x02, 0x4C, (0xF000 + cont) & 0xFF,
                  ((0xF000 + cont) >> 8) & 0xFF])
    put(1, 0xFFC, [0x00, 0xF0])
    put(0, 0xFFC, [0x00, 0xF0])
    m_ref = _boot_batch(rom, 2)
    rom_j = jnp.asarray(rom, jnp.int32)
    out_ref = jax.jit(jax.vmap(lambda mm: tia.run_frame(mm, rom_j, 4600)))(
        m_ref
    )
    out_fast = jax.jit(
        jax.vmap(lambda mm: machine_kernel.run_frame_fast(mm, rom))
    )(m_ref)
    _cmp_trees(out_ref, out_fast, "banked")
    assert int(np.asarray(out_ref["bank"])[0]) == 0


def test_pallas_wrapper_interpret_matches_batched():
    """frame_pallas (interpret mode) vs frame_batched on the pong cart:
    identical state and record streams through the Pallas wrapper."""
    from envpool_tpu.envs.atari import machine_pallas

    rom_np = _pong_rom()
    tables = machine_kernel.build_tables(rom_np)
    tables = {
        "rom2d": jnp.asarray(tables["rom2d"]),
        "decode": jnp.asarray(tables["decode"]),
        "meta": jnp.asarray(tables["meta"]),
        "indpair": jnp.asarray(tables["indpair"]),
        "nbanks": tables["nbanks"],
    }
    m = _boot_batch(rom_np, 3)
    s, _ = machine_kernel._to_lane_last(m)
    ref = machine_kernel.frame_batched(s, tables)
    got = machine_pallas.frame_pallas(s, tables, interpret=True)
    _cmp_trees(ref[0], got[0], "pallas state")
    for name, r, g in zip(("recs", "rowsel", "rows"), ref[1:], got[1:]):
        np.testing.assert_array_equal(
            np.asarray(r), np.asarray(g), err_msg=name
        )


def test_multi_frame_trajectory_vs_unbatched_scalar():
    """Frame-count trajectory vs the UNVMAPPED scalar emulator.

    Regression test for the round-5 matmul-precision bug: the MXU's
    default precision is single-pass bf16, which silently zeroes the
    low bits of table entries wider than 8 mantissa bits at some batch
    sizes — the batched fetch then mis-reads operands and frames run
    the wrong length.  The scalar reference here never touches the
    batched contractions, so any lossy table encoding diverges within
    a frame (the short power-on frame makes cycle counts a sharp
    signal: 192 vs a full 19916-cycle frame when broken).
    """
    rom_np = _pong_rom()
    rom_j = jnp.asarray(rom_np, jnp.int32)
    m_s = tia.attach_tia(cpu6502.make_machine(rom_np))
    B = 4
    m_b = jax.tree_util.tree_map(lambda x: jnp.stack([x] * B), m_s)

    scalar_frame = jax.jit(lambda m: tia.run_frame(m, rom_j, 0))
    fast = jax.jit(
        jax.vmap(lambda mm: machine_kernel.run_frame_fast(mm, rom_np))
    )
    for f in range(5):
        m_s = scalar_frame(m_s)
        m_b = fast(m_b)
        assert int(np.asarray(m_s["cycles"])) == int(m_b["cycles"][0]), (
            f"frame {f}: cycle trajectory diverged"
        )
        for k in ("a", "x", "y", "pc", "p", "scanline"):
            assert int(np.asarray(m_s[k])) == int(m_b[k][0]), (f, k)
        np.testing.assert_array_equal(
            np.asarray(m_s["ram"]), np.asarray(m_b["ram"][0]),
            err_msg=f"frame {f}: RAM diverged",
        )


def test_bit_parallel_collisions_match_matmul_form():
    """The [5, B]-word bit-parallel collision matrix is bit-equal to
    the mask/matmul oracle over random register files (all NUSIZ
    modes, reflections, scales, VDEL'd patterns, widths)."""
    rng = np.random.default_rng(7)
    B = 512
    rec = np.zeros((tia.NREG, B), np.int32)
    for i in range(tia.NREG):
        rec[i] = rng.integers(0, 256, B)
    for i in (tia.R_POSP0, tia.R_POSP1, tia.R_POSM0, tia.R_POSM1,
              tia.R_POSBL):
        rec[i] = rng.integers(0, 160, B)
    a = np.asarray(machine_kernel._collisions_matmul(jnp.asarray(rec)))
    b = np.asarray(machine_kernel._collisions(jnp.asarray(rec)))
    np.testing.assert_array_equal(a, b)
