"""Atari 2600 machine env: run a real cartridge ROM (2K/4K plain,
8K F8 / 16K F6 bank-switched) through the full pipeline.

The user-facing end of the emulation path: ``make("Machine2600-v0",
rom_path=...)`` boots a cartridge on the vectorized 6502+TIA machine
(``cpu6502.py`` + ``tia.py``) and runs it behind the standard ALE
preprocessing pipeline (frame skip/max-pool, grayscale, resize, stack,
noop/fire reset, sticky actions) — the same ``ArcadeEnv`` wrapper the
Lite cores use, so the ids are drop-in.

ALE actions map to console inputs exactly: the joystick directions set
the SWCHA bits (active-low, P0 nibble) and FIRE pulls INPT4 bit 7 low.

Like ALE itself, per-game reward/termination needs a ROM-specific RAM
map (``atari_env.h`` gets them from ALE's per-ROM settings classes); the
generic machine env exposes ``ram_reward_addr``/``ram_lives_addr``
config hooks (score byte delta → reward, lives byte → termination) and
otherwise reports 0 reward.  No ROM assets ship in this image — tests
drive hand-assembled kernels (tests/test_machine_env.py)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import cpu6502, machine_kernel, tia
from .arcade_env import ALE_COMPONENTS, ArcadeEnv, ArcadeGame

# SWCHA player-0 nibble (active low): bit7 right, bit6 left, bit5 down,
# bit4 up.
_UP, _DOWN, _LEFT, _RIGHT = 0x10, 0x20, 0x40, 0x80

_COMP = np.asarray(ALE_COMPONENTS, np.int32)  # [18, 5] = up,down,left,right,fire


def _action_to_inputs(action: jax.Array):
    comp = jnp.asarray(_COMP)
    oh = jax.nn.one_hot(jnp.clip(action, 0, 17), 18, dtype=jnp.int32)
    bits = oh @ comp  # [5]
    up, down, left, right, fire = (bits[i] for i in range(5))
    swcha = (
        0xFF
        ^ (up * _UP)
        ^ (down * _DOWN)
        ^ (left * _LEFT)
        ^ (right * _RIGHT)
    )
    inpt4 = jnp.where(fire > 0, 0x00, 0x80)
    return swcha.astype(jnp.int32), inpt4.astype(jnp.int32)


class Machine2600Game(ArcadeGame):
    """One 2600 machine as an ArcadeGame core (tick = one video frame).

    With a ``preset`` (see :mod:`rom_presets`) the game gets ALE-style
    per-ROM semantics: multi-byte BCD/raw score decode, optional
    opponent score (zero-sum reward), lives byte and minimal action
    set — the analog of ALE's per-ROM settings classes consumed at
    ``envpool/atari/atari_env.h:75-88``.
    """

    action_set_size = 18
    has_fire = True

    def __init__(self, rom: np.ndarray, instructions_per_frame: int = 4000,
                 reward_addr: int = -1, lives_addr: int = -1,
                 preset: dict | None = None):
        self.rom_np = np.asarray(rom, np.uint8)
        self.rom = jnp.asarray(self.rom_np, jnp.int32)
        self.ipf = int(instructions_per_frame)
        self.reward_addr = int(reward_addr)
        self.lives_addr = int(lives_addr)
        self.preset = preset
        if preset is not None:
            self.minimal_set = tuple(preset["minimal_actions"])
            self.action_set_size = len(self.minimal_set)
            if preset["lives"] >= 0:
                self.lives_addr = int(preset["lives"])

    def init(self, key):
        del key  # console power-on is deterministic
        return tia.attach_tia(cpu6502.make_machine(self.rom_np))

    def tick(self, g, action, key):
        del key
        # Presets with a minimal action set receive core indices; map
        # them back to ALE ids before decoding joystick components.
        if self.preset is not None and self.minimal_set != tuple(range(18)):
            table = jnp.asarray(np.asarray(self.minimal_set, np.int32))
            n = len(self.minimal_set)
            oh = jax.nn.one_hot(jnp.clip(action, 0, n - 1), n,
                                dtype=jnp.int32)
            action = oh @ table
        swcha, inpt4 = _action_to_inputs(action)
        g = {**g, "swcha": swcha, "inpt4": inpt4}
        prev_score = self._score(g)
        # Under the engine's vmap this dispatches the batched lane-last
        # frame kernel (Pallas on TPU, ~12x the scalar path); called
        # unbatched it falls back to tia.run_frame (custom_vmap).
        g = machine_kernel.run_frame_fast(g, self.rom_np)
        reward = (self._score(g) - prev_score).astype(jnp.float32)
        return g, reward, self.over(g)

    @staticmethod
    def _ram_byte(g, off: int):
        oh = jax.nn.one_hot(off & 0x7F, 128, dtype=jnp.int32)
        return (oh * g["ram"]).sum().astype(jnp.int32)

    def _decode(self, g, addrs, mode: str):
        """Multi-byte score decode, least-significant byte first.

        ``bcd``: two packed decimal digits per byte (ALE's
        getDecimalScore convention); ``raw``: base-256 binary.
        """
        total = jnp.int32(0)
        base = 1
        for off in addrs:
            b = self._ram_byte(g, off)
            if mode == "bcd":
                total = total + ((b >> 4) * 10 + (b & 0xF)) * base
                base *= 100
            else:
                total = total + b * base
                base *= 256
        return total

    def _score(self, g):
        if self.preset is not None and self.preset["score"]:
            p = self.preset
            score = self._decode(g, p["score"], p["mode"]) * p["mult"]
            if p["opponent_score"] >= 0:
                score = score - self._decode(
                    g, (p["opponent_score"],), p["mode"]
                ) * p["mult"]
            return score.astype(jnp.float32)
        if self.reward_addr < 0:
            return jnp.float32(0.0)
        return self._ram_byte(g, self.reward_addr).astype(jnp.float32)

    def lives(self, g):
        if self.lives_addr < 0:
            return jnp.int32(1)
        mask = (
            self.preset["lives_mask"] if self.preset is not None else 0xFF
        )
        return self._ram_byte(g, self.lives_addr) & mask

    def over(self, g):
        if self.lives_addr < 0:
            return jnp.bool_(False)
        return self.lives(g) <= 0

    def ram(self, g):
        return g["ram"].astype(jnp.uint8)

    def render_gray(self, g):
        frame = tia.render_frame(g["lines"]).astype(jnp.float32)
        # 160x192 TIA frame → the 210x160 raw-pipeline canvas (letterboxed).
        canvas = jnp.zeros((210, 160), jnp.float32)
        return canvas.at[9:201].set(
            jnp.repeat(frame, 1, axis=0)[:192]
        )

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray, gray])


class Machine2600Env(ArcadeEnv):
    """ArcadeEnv over a user-supplied ROM (``rom_path`` make-kwarg).

    With ``game="breakout"`` (etc. — :mod:`rom_presets`) the pool gets
    per-ROM reward/lives/terminal semantics and the game's ALE minimal
    action set; the ``Machine2600/{Game}-v5`` registry ids preset this
    for you, so ``make("Machine2600/Breakout-v5", rom_path=...)`` is
    the real-emulation drop-in for ``Breakout-v5``.
    """

    DEFAULT_CONFIG = {
        **ArcadeEnv.DEFAULT_CONFIG,
        "rom_path": "",
        "instructions_per_frame": 4000,
        "ram_reward_addr": -1,
        "ram_lives_addr": -1,
        "game": "",
    }

    def __init__(self, config):
        rom_path = str(config["rom_path"])
        if not rom_path:
            raise ValueError(
                "Machine2600 needs rom_path= pointing at a cartridge ROM "
                "(no ROM assets ship in this image)"
            )
        rom = np.fromfile(rom_path, np.uint8)
        if rom.size not in (2048, 4096, 8192, 16384):
            raise ValueError(
                f"{rom_path}: expected a 2K/4K/8K(F8)/16K(F6) cartridge, "
                f"got {rom.size} B"
            )
        if rom.size == 2048:
            rom = np.tile(rom, 2)  # 2K carts mirror into 4K
        preset = None
        if str(config["game"]):
            from .rom_presets import get_preset

            preset = get_preset(str(config["game"]))
        self._game_inst = Machine2600Game(
            rom,
            int(config["instructions_per_frame"]),
            int(config["ram_reward_addr"]),
            int(config["ram_lives_addr"]),
            preset,
        )
        super().__init__(config)

    # ArcadeEnv.__init__ instantiates GAME_CLS(); override with ours.
    @property
    def game(self):
        return self._game_inst

    @game.setter
    def game(self, value):  # ArcadeEnv.__init__ assigns; ignore it
        pass
