"""Machine2600-v0: a hand-assembled interactive cartridge through the
full make() pipeline — joystick actions reach SWCHA, the ROM moves its
sprite, and the standard 84x84 pipeline returns the frames."""

import numpy as np
import pytest

import envpool_tpu


def _paddle_rom(tmp_path):
    """Kernel: RIGHT/LEFT adjust $80; sprite repositioned each frame via
    a $80-length delay loop before RESP0; score byte $81 increments every
    frame RIGHT is held (exercises the ram_reward_addr hook)."""
    prog = []

    def emit(*b):
        prog.extend(b)

    start = 0
    emit(0xA9, 0x02, 0x85, 0x00)              # VSYNC on
    emit(0x85, 0x02, 0x85, 0x02, 0x85, 0x02)  # 3 lines
    emit(0xA9, 0x00, 0x85, 0x00)              # VSYNC off
    # Joystick: SWCHA bit7 = right (active low), bit6 = left.
    emit(0xAD, 0x80, 0x02)                    # LDA SWCHA
    emit(0x29, 0x80)                          # AND #$80
    bne1 = len(prog)
    emit(0xD0, 0x00)                          # BNE no_right (patched)
    emit(0xE6, 0x80)                          # INC $80
    emit(0xE6, 0x81)                          # INC $81 (score)
    no_right = len(prog)
    prog[bne1 + 1] = (no_right - (bne1 + 2)) & 0xFF
    emit(0xAD, 0x80, 0x02)                    # LDA SWCHA
    emit(0x29, 0x40)                          # AND #$40
    bne2 = len(prog)
    emit(0xD0, 0x00)                          # BNE no_left
    emit(0xC6, 0x80)                          # DEC $80
    no_left = len(prog)
    prog[bne2 + 1] = (no_left - (bne2 + 2)) & 0xFF
    # Clamp $80 to [2, 24].
    emit(0xA5, 0x80, 0xC9, 25)                # LDA $80; CMP #25
    bcc1 = len(prog)
    emit(0x90, 0x00)                          # BCC ok_hi
    emit(0xA9, 24, 0x85, 0x80)                # LDA #24; STA $80
    ok_hi = len(prog)
    prog[bcc1 + 1] = (ok_hi - (bcc1 + 2)) & 0xFF
    emit(0xA5, 0x80, 0xC9, 2)                 # LDA $80; CMP #2
    bcs1 = len(prog)
    emit(0xB0, 0x00)                          # BCS ok_lo
    emit(0xA9, 2, 0x85, 0x80)                 # LDA #2; STA $80
    ok_lo = len(prog)
    prog[bcs1 + 1] = (ok_lo - (bcs1 + 2)) & 0xFF
    # Colors + sprite pattern.
    emit(0xA9, 0x0E, 0x85, 0x06)              # COLUP0
    emit(0xA9, 0xFF, 0x85, 0x1B)              # GRP0
    # 37 vblank lines.
    emit(0xA2, 37)
    vb = len(prog)
    emit(0x85, 0x02, 0xCA)
    emit(0xD0, (vb - (len(prog) + 2)) & 0xFF)
    # Position P0: delay $80 iterations then strobe RESP0.
    emit(0xA6, 0x80)                          # LDX $80
    d = len(prog)
    emit(0xCA)                                # DEX
    emit(0xD0, (d - (len(prog) + 2)) & 0xFF)  # BNE d
    emit(0x85, 0x10)                          # STA RESP0
    # 192 visible lines.
    emit(0xA0, 192)
    v = len(prog)
    emit(0x85, 0x02, 0x88)
    emit(0xD0, (v - (len(prog) + 2)) & 0xFF)
    emit(0x4C, 0x00, 0xF0)                    # JMP start

    rom = np.zeros(4096, np.uint8)
    rom[: len(prog)] = prog
    rom[0xFFC] = 0x00
    rom[0xFFD] = 0xF0
    path = tmp_path / "paddle.bin"
    path.write_bytes(rom.tobytes())
    return str(path)


def test_rom_runs_through_pipeline(tmp_path):
    path = _paddle_rom(tmp_path)
    env = envpool_tpu.make(
        "Machine2600-v0", env_type="gymnasium", num_envs=2, seed=0,
        rom_path=path, ram_reward_addr=0x81, frame_skip=1, noop_max=1,
        use_fire_reset=False, instructions_per_frame=2500,
    )
    assert env.action_space.n == 18
    obs, _ = env.reset()
    assert obs.shape == (2, 4, 84, 84)

    # Hold RIGHT (ALE action 3): sprite position and score advance.
    ram0 = None
    for t in range(6):
        obs, rew, term, trunc, info = env.step(
            np.full(2, 3, np.int32)
        )
        if ram0 is None:
            ram0 = np.asarray(info["ram"])
    ram1 = np.asarray(info["ram"])
    # $80 (sprite delay) increased; $81 (score) ticked → rewards flowed.
    assert ram1[0, 0] > ram0[0, 0]
    assert rew.sum() > 0
    # The rendered obs contains the sprite (nonzero pixels).
    assert (obs > 0).sum() > 0


def test_rom_required():
    with pytest.raises(ValueError, match="rom_path"):
        envpool_tpu.make(
            "Machine2600-v0", env_type="gymnasium", num_envs=1
        )


def test_left_right_move_sprite(tmp_path):
    """Direction actions change the RESP-latched sprite position."""
    import jax

    from envpool_tpu.core.registry import registry

    path = _paddle_rom(tmp_path)
    env = registry._env(
        "Machine2600-v0", num_envs=1, rom_path=path, frame_skip=1,
        instructions_per_frame=2500,
    )
    g = env.game.init(jax.random.PRNGKey(0))
    import jax.numpy as jnp

    # Warm one frame, then hold RIGHT vs LEFT.
    g, _, _ = env.game.tick(g, jnp.int32(0), jax.random.PRNGKey(0))
    g_r = g
    for _ in range(4):
        g_r, _, _ = env.game.tick(g_r, jnp.int32(3), jax.random.PRNGKey(0))
    g_l = g
    for _ in range(4):
        g_l, _, _ = env.game.tick(g_l, jnp.int32(4), jax.random.PRNGKey(0))
    assert int(g_r["posp0"]) > int(g_l["posp0"]), (
        int(g_r["posp0"]), int(g_l["posp0"]),
    )
