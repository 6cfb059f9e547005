"""A playable hand-assembled pong-like cartridge through Machine2600-v0.

The strongest in-image evidence for the emulation path: a real game
program — paddle (player 0, joystick up/down), ball (ENABL + per-frame
HMOVE motion), walls (reflected playfield), 2D hit detection via the
TIA collision latches, score and lives in RIOT RAM — running on the
vectorized 6502+TIA machine behind the standard ALE pipeline with the
``ram_reward_addr``/``ram_lives_addr`` hooks.

Game rules encoded in the ROM (all logic in 6502, not Python):
* ball serves at ~x64 moving left 4 px/frame (HMBL=$40 + HMOVE);
* paddle occupies 16 scanlines at ``$82``; ball 4 scanlines at ``$83``;
* CXP0FB bit 6 (P0·ball) while moving left → bounce right + score++
  (``$81``);
* CXBLPF bit 7 (ball·PF) while moving left → a miss: lives-- (``$87``)
  and re-serve; while moving right → bounce off the right wall.
"""

import numpy as np
import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "oracle_fixtures")
)

from independent.asm6502 import Asm  # noqa: E402

# Zero-page game variables.
SCORE, PADDLE_Y, BALL_Y, VX, LIVES = 0x81, 0x82, 0x83, 0x84, 0x87


def _pong_rom():
    a = Asm()
    # ---- boot -----------------------------------------------------------
    a.lda_imm(1); a.sta_zp(LIVES)
    a.lda_imm(88); a.sta_zp(PADDLE_Y)
    a.lda_imm(96); a.sta_zp(BALL_Y)
    a.lda_imm(0xFC); a.sta_zp(VX)            # vx = −4 (toward the paddle)
    a.lda_imm(0); a.sta_zp(SCORE)
    a.lda_imm(0x0E); a.sta_zp(0x06)          # COLUP0
    a.lda_imm(0x0E); a.sta_zp(0x08)          # COLUPF
    a.lda_imm(0x21); a.sta_zp(0x0A)          # CTRLPF: reflect | ball 4 px
    a.lda_imm(0x10); a.sta_zp(0x0D)          # PF0 bit4 → 4-px side walls
    # Position P0 at ~x19 (delay loop then RESP0 latch).
    a.sta_zp(0x02)                           # WSYNC
    a.ldx_imm(5)
    a.label("pd")
    a.dex(); a.bne("pd")
    a.sta_zp(0x10)                           # RESP0
    # Position ball at ~x64.
    a.sta_zp(0x02)
    a.ldx_imm(8)
    a.label("bd")
    a.dex(); a.bne("bd")
    a.sta_zp(0x14)                           # RESBL

    # ---- frame loop -----------------------------------------------------
    a.label("frame")
    a.lda_imm(0x02); a.sta_zp(0x00)          # VSYNC on
    a.sta_zp(0x02); a.sta_zp(0x02); a.sta_zp(0x02)
    a.lda_imm(0x00); a.sta_zp(0x00)          # VSYNC off

    # Joystick (SWCHA active-low: bit4 up, bit5 down).
    a.lda_abs(0x0280); a.and_imm(0x10); a.bne("no_up")
    a.dec_zp(PADDLE_Y); a.dec_zp(PADDLE_Y)
    a.label("no_up")
    a.lda_abs(0x0280); a.and_imm(0x20); a.bne("no_down")
    a.inc_zp(PADDLE_Y); a.inc_zp(PADDLE_Y)
    a.label("no_down")
    # Clamp paddle to [4, 172].
    a.lda_zp(PADDLE_Y); a.cmp_imm(173); a.bcc("pc1")
    a.lda_imm(172); a.sta_zp(PADDLE_Y)
    a.label("pc1")
    a.lda_zp(PADDLE_Y); a.cmp_imm(4); a.bcs("pc2")
    a.lda_imm(4); a.sta_zp(PADDLE_Y)
    a.label("pc2")

    # Collision latches from the previous visible frame.
    a.lda_zp(0x02); a.and_imm(0x40); a.beq("no_hit")   # CXP0FB: P0·BL
    a.lda_zp(VX); a.bpl("no_hit")                      # only moving left
    a.lda_imm(0x04); a.sta_zp(VX)                      # bounce right
    a.inc_zp(SCORE)
    a.label("no_hit")
    a.lda_zp(0x06); a.and_imm(0x80); a.beq("no_wall")  # CXBLPF: BL·PF
    a.lda_zp(VX); a.bmi("lose")
    a.lda_imm(0xFC); a.sta_zp(VX)                      # right wall bounce
    a.jmp("no_wall")
    a.label("lose")
    a.dec_zp(LIVES)                                    # missed the paddle
    a.lda_imm(0x04); a.sta_zp(VX)                      # re-serve rightward
    a.label("no_wall")
    a.sta_zp(0x2C)                                     # CXCLR

    # Ball motion: HMBL nibble from vx sign, one HMOVE per frame.
    a.lda_zp(VX); a.bmi("mv_left")
    a.lda_imm(0xC0); a.sta_zp(0x24)                    # −4 → 4 px right
    a.jmp("mv_done")
    a.label("mv_left")
    a.lda_imm(0x40); a.sta_zp(0x24)                    # +4 → 4 px left
    a.label("mv_done")
    a.sta_zp(0x02)                                     # WSYNC
    a.sta_zp(0x2A)                                     # HMOVE

    # Rest of vblank.
    a.ldx_imm(30)
    a.label("vb")
    a.sta_zp(0x02); a.dex(); a.bne("vb")

    # Visible kernel: per-line paddle (16 rows) and ball (4 rows).
    a.ldx_imm(0)
    a.label("vis")
    a.sta_zp(0x02)                                     # WSYNC
    a.txa(); a.sec(); a.sbc_zp(PADDLE_Y); a.cmp_imm(16)
    a.lda_imm(0xFF); a.bcc("pon"); a.lda_imm(0x00)
    a.label("pon")
    a.sta_zp(0x1B)                                     # GRP0
    a.txa(); a.sec(); a.sbc_zp(BALL_Y); a.cmp_imm(4)
    a.lda_imm(0x02); a.bcc("bon"); a.lda_imm(0x00)
    a.label("bon")
    a.sta_zp(0x1F)                                     # ENABL
    a.inx(); a.cpx_imm(192); a.bne("vis")

    # Overscan then next frame.
    a.ldx_imm(8)
    a.label("os")
    a.sta_zp(0x02); a.dex(); a.bne("os")
    a.jmp("frame")
    return a.rom()


IPF = 4600  # ~4.3k instructions per frame (192-line kernel) + margin


@pytest.fixture(scope="module")
def rom_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("roms") / "pong_like.bin"
    p.write_bytes(_pong_rom().tobytes())
    return str(p)


def test_rally_scores_through_pipeline(rom_path):
    """Holding still: the serve hits the paddle → +1 reward via the
    ram_reward_addr hook, and the ball bounces away (vx flips)."""
    import envpool_tpu

    env = envpool_tpu.make(
        "Machine2600-v0", env_type="gymnasium", num_envs=1, seed=0,
        rom_path=rom_path, ram_reward_addr=SCORE, ram_lives_addr=LIVES,
        frame_skip=1, noop_max=1, use_fire_reset=False,
        instructions_per_frame=IPF,
    )
    obs, _ = env.reset()
    total = 0.0
    for t in range(16):
        obs, rew, term, trunc, info = env.step(np.zeros(1, np.int32))
        total += float(rew[0])
        if total > 0:
            break
    assert total >= 1.0, "paddle hit never scored"
    ram = np.asarray(info["ram"])[0]
    assert ram[SCORE & 0x7F] >= 1
    assert ram[VX & 0x7F] == 0x04          # ball bounced rightward
    assert not term[0]                     # still one life


def test_miss_loses_life_and_terminates(rom_path):
    """Holding DOWN moves the paddle away → the ball reaches the left
    wall, lives hit 0, and the episode terminates through the pipeline."""
    import envpool_tpu

    env = envpool_tpu.make(
        "Machine2600-v0", env_type="gymnasium", num_envs=1, seed=0,
        rom_path=rom_path, ram_reward_addr=SCORE, ram_lives_addr=LIVES,
        frame_skip=1, noop_max=1, use_fire_reset=False,
        instructions_per_frame=IPF,
    )
    env.reset()
    terminated = False
    for t in range(24):
        obs, rew, term, trunc, info = env.step(np.full(1, 5, np.int32))
        if term[0]:
            terminated = True
            break
        assert float(rew[0]) == 0.0, "paddle should never touch the ball"
    assert terminated, "missing the ball must end the episode"
