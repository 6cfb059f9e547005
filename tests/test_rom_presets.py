"""Machine2600 per-ROM preset layer (ALE-settings analog).

No ROM assets ship in this image, so these tests pin the preset
MECHANISM with hand-assembled cartridges that drive the exact RAM
addresses a preset decodes: multi-byte packed-BCD scoring with carry,
lives-counter termination, zero-sum opponent scoring, and minimal
action sets — through the full gymnasium pipeline.
"""

import os
import sys

import numpy as np
import pytest

import envpool_tpu

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "oracle_fixtures")
)

from independent.asm6502 import Asm  # noqa: E402

SED, CLD, ADC_IMM, ADC_ZP = 0xF8, 0xD8, 0x69, 0x65


def _frame_prologue(a):
    a.lda_imm(0x02); a.sta_zp(0x00)
    a.sta_zp(0x02); a.sta_zp(0x02); a.sta_zp(0x02)
    a.lda_imm(0x00); a.sta_zp(0x00)


def _frame_epilogue(a, label):
    a.ldx_imm(60)
    a.label(f"wl_{label}")
    a.sta_zp(0x02); a.dex(); a.bne(f"wl_{label}")
    a.jmp("frame")


def _scorekeeper_rom():
    """Breakout-preset exerciser: +5 BCD points and a lives countdown.

    Score lives at RIOT offsets 77 (lo) / 76 (hi) = $CD/$CC, lives at
    57 = $B9 — the breakout preset's map.  Every frame adds 5 points in
    decimal mode (carrying into the high byte past 99) and every 10th
    frame loses a life (3 lives at boot).
    """
    a = Asm()
    a.db(CLD)
    a.lda_imm(3); a.sta_zp(0xB9)
    a.lda_imm(0); a.sta_zp(0xCD); a.sta_zp(0xCC); a.sta_zp(0x80)
    a.label("frame")
    _frame_prologue(a)
    a.db(SED)
    a.lda_zp(0xCD); a.clc(); a.db(ADC_IMM, 0x05); a.sta_zp(0xCD)
    a.lda_zp(0xCC); a.db(ADC_IMM, 0x00); a.sta_zp(0xCC)
    a.db(CLD)
    a.inc_zp(0x80)
    a.lda_zp(0x80); a.cmp_imm(10); a.bne("nolife")
    a.dec_zp(0xB9)
    a.lda_imm(0); a.sta_zp(0x80)
    a.label("nolife")
    _frame_epilogue(a, "a")
    return a.rom()


def _pong_like_rom():
    """Pong-preset exerciser: raw scores, own +2 / opponent +1 per frame
    at RIOT offsets 14 ($8E) and 13 ($8D)."""
    a = Asm()
    a.db(CLD)
    a.lda_imm(0); a.sta_zp(0x8E); a.sta_zp(0x8D)
    a.label("frame")
    _frame_prologue(a)
    a.lda_zp(0x8E); a.clc(); a.db(ADC_IMM, 0x02); a.sta_zp(0x8E)
    a.lda_zp(0x8D); a.clc(); a.db(ADC_IMM, 0x01); a.sta_zp(0x8D)
    _frame_epilogue(a, "b")
    return a.rom()


def _write_rom(tmp_path, rom, name):
    p = tmp_path / name
    p.write_bytes(np.asarray(rom, np.uint8).tobytes())
    return str(p)


def test_preset_listing_and_errors():
    from envpool_tpu.envs.atari import rom_presets

    names = rom_presets.list_presets()
    assert len(names) >= 10
    assert "breakout" in names and "pong" in names
    with pytest.raises(ValueError, match="no Machine2600 preset"):
        rom_presets.get_preset("not_a_game")
    p = rom_presets.get_preset("breakout")
    assert p["score"] == (77, 76) and p["lives"] == 57


def test_preset_ids_registered():
    ids = envpool_tpu.list_all_envs()
    for name in ("Breakout", "Pong", "Seaquest", "MsPacman", "Qbert"):
        assert f"Machine2600/{name}-v5" in ids


def test_bcd_score_lives_and_minimal_actions(tmp_path):
    rom_path = _write_rom(tmp_path, _scorekeeper_rom(), "score.bin")
    env = envpool_tpu.make_gymnasium(
        "Machine2600/Breakout-v5", num_envs=2, rom_path=rom_path,
        noop_max=0, use_fire_reset=False, repeat_action_probability=0.0,
    )
    # Breakout's ALE minimal set: NOOP FIRE RIGHT LEFT.
    assert env.action_space.n == 4
    env.reset()
    total = np.zeros(2)
    terminated_at = None
    for step in range(12):
        obs, rew, term, trunc, info = env.step(
            np.zeros(2, np.int32)
        )
        total += rew
        # +5 BCD points per frame, frame_skip=4 → +20 per step.
        if terminated_at is None and bool(term[0]):
            terminated_at = step
            break
        assert rew[0] == pytest.approx(20.0), (step, rew)
    # 3 lives, one lost every 10 frames → game over by frame 30
    # (agent step index 6-8 depending on reset frames).
    assert terminated_at is not None and terminated_at <= 9
    assert total[0] >= 100.0


def test_bcd_carry_into_high_byte(tmp_path):
    """Past 99 points the decimal-mode carry lands in the high byte and
    the preset decode keeps counting 100, 105, ... correctly."""
    rom_path = _write_rom(tmp_path, _scorekeeper_rom(), "score.bin")
    env = envpool_tpu.make_gymnasium(
        "Machine2600-v0", num_envs=1, rom_path=rom_path,
        game="breakout", noop_max=0, use_fire_reset=False,
        episodic_life=False, repeat_action_probability=0.0,
    )
    env.reset()
    total = 0.0
    for _ in range(6):  # 24 frames → score 120, crosses 99
        _, rew, term, trunc, _ = env.step(np.zeros(1, np.int32))
        total += float(rew[0])
        if bool(term[0]):
            break
    assert total >= 100.0, total  # not 8-bit-wrapped (e.g. 120 % 100)


def test_opponent_score_subtracts(tmp_path):
    rom_path = _write_rom(tmp_path, _pong_like_rom(), "pong.bin")
    env = envpool_tpu.make_gymnasium(
        "Machine2600/Pong-v5", num_envs=1, rom_path=rom_path,
        noop_max=0, use_fire_reset=False, repeat_action_probability=0.0,
    )
    assert env.action_space.n == 6
    env.reset()
    _, rew, *_ = env.step(np.zeros(1, np.int32))
    # own +2, opponent +1 per frame → net +1/frame, frame_skip=4.
    assert rew[0] == pytest.approx(4.0), rew
