"""Atari-class pixel env base: the full preprocessing pipeline on device.

Behavioral reference: ``envpool/atari/atari_env.h`` — config surface
(``:50-89``), noop/fire reset (``:168-200``), frame-skip with max-pool over
the last two frames (``:202-247``), frame stacking (``:308-346``),
episodic-life / reward-clip / sticky actions, and the info keys
(``lives``, ``reward``, ``terminated``, ``ram``).

The reference runs ALE ROMs on CPU worker threads.  Here the *game itself*
runs on the TPU as a pure function over an int/float state pytree, and the
whole pixel pipeline — render → maxpool → grayscale → INTER_AREA resize →
stack — is fused by XLA into the env step.  The resize is two MXU matmuls
(``envpool_tpu/ops/image.py``).  Scope note: games are faithful-behavior
reimplementations (Pong, Breakout), not bit-exact ALE emulation; ``info:ram``
carries a best-effort encoding of game variables at the well-known ALE RAM
addresses.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec
from ...ops.image import resize_area

RAW_H, RAW_W = 210, 160


# ALE full action set (18 actions): id → (up, down, left, right, fire).
# Order per ale::Action — NOOP FIRE UP RIGHT LEFT DOWN UPRIGHT UPLEFT
# DOWNRIGHT DOWNLEFT UPFIRE RIGHTFIRE LEFTFIRE DOWNFIRE UPRIGHTFIRE
# UPLEFTFIRE DOWNRIGHTFIRE DOWNLEFTFIRE
# (reference: envpool/atari/atari_env.h full_action_space handling).
ALE_COMPONENTS = (
    (0, 0, 0, 0, 0),  # 0  NOOP
    (0, 0, 0, 0, 1),  # 1  FIRE
    (1, 0, 0, 0, 0),  # 2  UP
    (0, 0, 0, 1, 0),  # 3  RIGHT
    (0, 0, 1, 0, 0),  # 4  LEFT
    (0, 1, 0, 0, 0),  # 5  DOWN
    (1, 0, 0, 1, 0),  # 6  UPRIGHT
    (1, 0, 1, 0, 0),  # 7  UPLEFT
    (0, 1, 0, 1, 0),  # 8  DOWNRIGHT
    (0, 1, 1, 0, 0),  # 9  DOWNLEFT
    (1, 0, 0, 0, 1),  # 10 UPFIRE
    (0, 0, 0, 1, 1),  # 11 RIGHTFIRE
    (0, 0, 1, 0, 1),  # 12 LEFTFIRE
    (0, 1, 0, 0, 1),  # 13 DOWNFIRE
    (1, 0, 0, 1, 1),  # 14 UPRIGHTFIRE
    (1, 0, 1, 0, 1),  # 15 UPLEFTFIRE
    (0, 1, 0, 1, 1),  # 16 DOWNRIGHTFIRE
    (0, 1, 1, 0, 1),  # 17 DOWNLEFTFIRE
)


def full_to_minimal_map(minimal_set) -> "np.ndarray":
    """[18] table: each ALE full action → index into ``minimal_set``.

    Projection by joystick components: each full action maps to the
    minimal-set entry sharing the most components (matched components
    score +2, spurious components −1); exact matches win, unmatched
    actions fall back to NOOP-like behavior — how a real cartridge
    ignores switch bits it doesn't read.
    """
    import numpy as np

    table = np.zeros(18, np.int32)
    for full_id in range(18):
        fc = ALE_COMPONENTS[full_id]
        best, best_score = 0, -10**9
        for idx, ale_id in enumerate(minimal_set):
            mc = ALE_COMPONENTS[ale_id]
            if mc == fc:
                best, best_score = idx, 10**9
                break
            score = sum(
                2 if (a and b) else (-1 if (a != b) else 0)
                for a, b in zip(fc, mc)
            )
            if score > best_score:
                best, best_score = idx, score
        table[full_id] = best
    return table


class ArcadeGame:
    """One game core: pure tick/render functions over a state dict.

    ``tick`` advances ONE raw frame.  ``render_gray`` draws the current
    frame as float32 luma in [0, 255]; ``render_rgb`` as float32 RGB
    ``[3, H, W]``.

    ``minimal_set`` lists the ALE action ids the core's action indices
    correspond to (defaults to the first ``action_set_size`` full-set
    ids, which matches the 18-action cores); ``full_action_space=True``
    pools project the 18 ALE ids through :func:`full_to_minimal_map`.
    ``mode`` / ``difficulty`` are set by the env layer before ``init``;
    cores that support game variants read them (``supported_modes`` /
    ``supported_difficulties`` declare the valid values, mirroring ALE's
    per-ROM mode/difficulty lists, atari_env.h:50-89).
    """

    action_set_size: int = 6
    has_fire: bool = True  # action 1 == FIRE → fire_reset applies
    minimal_set: tuple = ()  # ALE ids per action index; () → range(n)
    supported_modes: tuple = (0,)
    supported_difficulties: tuple = (0,)
    mode: int = 0
    difficulty: int = 0

    def init(self, key: jax.Array) -> dict[str, Any]:
        raise NotImplementedError

    def tick(self, g: dict, action: jax.Array, key: jax.Array):
        """-> (g, reward: f32, game_over: bool)."""
        raise NotImplementedError

    def over(self, g: dict) -> jax.Array:
        """Whether the game (not just the episode) has ended."""
        raise NotImplementedError

    def lives(self, g: dict) -> jax.Array:
        return jnp.int32(0)

    def render_gray(self, g: dict) -> jax.Array:
        raise NotImplementedError

    def render_rgb(self, g: dict) -> jax.Array:
        raise NotImplementedError

    def ram(self, g: dict) -> jax.Array:
        return jnp.zeros(128, jnp.uint8)


class ArcadeEnv(TpuEnv):
    """Generic Atari-pipeline env over an :class:`ArcadeGame`."""

    GAME_CLS: type[ArcadeGame] = ArcadeGame

    DEFAULT_CONFIG = {
        "stack_num": 4,
        "frame_skip": 4,
        "noop_max": 30,
        "zero_discount_on_life_loss": False,
        "episodic_life": False,
        "reward_clip": False,
        "use_fire_reset": True,
        "img_height": 84,
        "img_width": 84,
        "task": "",
        "mode": -1,
        "difficulty": -1,
        "full_action_space": False,
        "repeat_action_probability": 0.0,
        "use_inter_area_resize": True,
        "gray_scale": True,
    }

    def __init__(self, config):
        super().__init__(config)
        self.game = self.GAME_CLS()
        # mode / difficulty: validated against the core's declared
        # variants and installed on the game instance before any init()
        # (ALE setMode/setDifficulty semantics, atari_env.h:50-89;
        # -1 = the ROM default, i.e. the first supported value).
        mode = int(config["mode"])
        difficulty = int(config["difficulty"])
        if mode >= 0:
            if mode not in self.game.supported_modes:
                raise ValueError(
                    f"mode {mode} not supported by "
                    f"{type(self.game).__name__}; supported: "
                    f"{self.game.supported_modes}"
                )
            self.game.mode = mode
        else:
            self.game.mode = int(self.game.supported_modes[0])
        if difficulty >= 0:
            if difficulty not in self.game.supported_difficulties:
                raise ValueError(
                    f"difficulty {difficulty} not supported by "
                    f"{type(self.game).__name__}; supported: "
                    f"{self.game.supported_difficulties}"
                )
            self.game.difficulty = difficulty
        else:
            self.game.difficulty = int(
                self.game.supported_difficulties[0]
            )
        # full_action_space: expose all 18 ALE actions, projected onto
        # the core's minimal set by joystick components.
        if bool(config["full_action_space"]):
            minimal = self.game.minimal_set or tuple(
                range(self.game.action_set_size)
            )
            self._full_map = jnp.asarray(full_to_minimal_map(minimal))
        else:
            self._full_map = None

    # -- config helpers ----------------------------------------------------

    @property
    def _stack_num(self) -> int:
        return int(self.config["stack_num"])

    @property
    def _frame_skip(self) -> int:
        return int(self.config["frame_skip"])

    @property
    def _gray(self) -> bool:
        return bool(self.config["gray_scale"])

    @property
    def _img_hw(self) -> tuple[int, int]:
        return int(self.config["img_height"]), int(self.config["img_width"])

    @property
    def _channels(self) -> int:
        return 1 if self._gray else 3

    @property
    def _fire_reset(self) -> bool:
        return bool(self.config["use_fire_reset"]) and self.game.has_fire

    # -- specs -------------------------------------------------------------

    def state_spec(self):
        h, w = self._img_hw
        return {
            "obs": ArraySpec(
                jnp.uint8, (self._stack_num * self._channels, h, w), 0, 255
            ),
            "info:lives": ArraySpec(jnp.int32, ()),
            "info:reward": ArraySpec(jnp.float32, ()),
            "info:terminated": ArraySpec(jnp.int32, (), 0, 1),
            "info:ram": ArraySpec(jnp.uint8, (128,), 0, 255),
        }

    def action_spec(self):
        n = 18 if self._full_map is not None else self.game.action_set_size
        return {
            "action": ArraySpec(jnp.int32, (), 0, n - 1, is_discrete=True)
        }

    # -- frame pipeline ----------------------------------------------------

    def _render(self, g: dict) -> jax.Array:
        """Raw-resolution frame: [H, W] gray or [3, H, W] rgb, float32."""
        if self._gray:
            return self.game.render_gray(g)
        return self.game.render_rgb(g)

    def _shrink(self, frame: jax.Array) -> jax.Array:
        """Resize raw frame to [(1|3), h, w] uint8."""
        out = resize_area(frame, self._img_hw, jnp.uint8)
        if self._gray:
            return out[None]
        return out

    def _push(self, stack, frame, push_all):
        """Frame-stack update (atari_env.h:308-346)."""
        pushed = jnp.concatenate([stack[1:], frame[None]], axis=0)
        filled = jnp.broadcast_to(frame[None], stack.shape).astype(stack.dtype)
        return jnp.where(push_all, filled, pushed)

    def _obs_dict(self, stack, g, reward_raw, terminated):
        h, w = self._img_hw
        obs = stack.reshape(self._stack_num * self._channels, h, w)
        return {
            "obs": obs,
            "info:lives": self.game.lives(g),
            "info:reward": jnp.float32(reward_raw),
            "info:terminated": terminated.astype(jnp.int32),
            "info:ram": self.game.ram(g),
        }

    # -- render ------------------------------------------------------------

    render_size = (RAW_H, RAW_W)

    def render_state(self, state):
        """Raw-resolution RGB frame of the current game state (HWC uint8)."""
        rgb = self.game.render_rgb(state["game"])  # [3, H, W] float32
        return (
            jnp.clip(jnp.round(jnp.transpose(rgb, (1, 2, 0))), 0, 255)
            .astype(jnp.uint8)
        )

    # -- reset -------------------------------------------------------------

    def reset_env(self, key):
        h, w = self._img_hw
        zero_stack = jnp.zeros(
            (self._stack_num, self._channels, h, w), jnp.uint8
        )
        state = {
            "game": self.game.init(jax.random.PRNGKey(0)),
            "stack": zero_stack,
            "last_action": jnp.int32(0),
        }
        return self._reset_impl(state, key, jnp.bool_(True))

    def reset_env_from(self, state, key, full):
        if not bool(self.config["episodic_life"]):
            full = jnp.bool_(True)
        return self._reset_impl(state, key, full)

    def _reset_impl(self, state, key, full):
        """noop/fire reset (atari_env.h:168-200)."""
        k_game, k_noop, k_tick = jax.random.split(key, 3)
        # Full restart when forced, when the game is actually over, or when
        # episodic_life is off (handled by caller).
        full = full | self.game.over(state["game"])
        fresh = self.game.init(k_game)
        g = jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                full.reshape(full.shape + (1,) * (a.ndim - full.ndim)), a, b
            ),
            fresh,
            state["game"],
        )
        noop_max = max(int(self.config["noop_max"]), 1)
        noop = (
            jax.random.randint(k_noop, (), 0, noop_max, jnp.int32)
            + 1
            - jnp.int32(self._fire_reset)
        )

        def noop_body(i, g):
            # Branchless (tick + select) rather than lax.cond: under the
            # engine's vmap the per-env predicate makes cond evaluate
            # both branches anyway, and a batched cond closes its
            # operands over custom_vmap primitives (Machine2600's frame
            # kernel), which jax's custom_batching rejects.
            g2 = self.game.tick(
                g, jnp.int32(0), jax.random.fold_in(k_tick, i)
            )[0]
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(i < noop, a, b), g2, g
            )

        g = jax.lax.fori_loop(0, noop_max, noop_body, g)
        if self._fire_reset:
            g = self.game.tick(
                g, jnp.int32(1), jax.random.fold_in(k_tick, noop_max)
            )[0]
        frame = self._shrink(self._render(g))
        stack = self._push(state["stack"], frame, full)
        new_state = {
            "game": g,
            "stack": stack,
            "last_action": jnp.int32(0),
        }
        obs = self._obs_dict(stack, g, 0.0, jnp.bool_(False))
        return new_state, obs

    # -- step --------------------------------------------------------------

    def step_env(self, state, action, key):
        cfg = self.config
        frame_skip = self._frame_skip
        if self._full_map is not None:
            # Project the ALE full-set id onto the core's minimal set
            # (one-hot contraction: batched vector-index gathers are a
            # TPU pathology — docs/benchmark.md "TPU performance rules").
            oh = jax.nn.one_hot(
                jnp.clip(action, 0, 17), 18, dtype=jnp.int32
            )
            action = (oh * self._full_map).sum().astype(jnp.int32)
        k_sticky, k_tick = jax.random.split(key)
        p = float(cfg["repeat_action_probability"])
        if p > 0:
            sticky = jax.random.uniform(k_sticky, ()) < p
            action = jnp.where(sticky, state["last_action"], action)

        g = state["game"]
        prev_lives = self.game.lives(g)
        reward = jnp.float32(0.0)
        game_over = jnp.bool_(False)
        pooled = min(frame_skip, 2)
        frames = []
        for i in range(frame_skip):
            g2, r, over = self.game.tick(
                g, action, jax.random.fold_in(k_tick, i)
            )
            # Stop acting once the game is over mid-skip (atari_env.h:207).
            g = jax.tree_util.tree_map(
                lambda a, b: jnp.where(
                    game_over.reshape(
                        game_over.shape + (1,) * (a.ndim - game_over.ndim)
                    ),
                    a,
                    b,
                ),
                g,
                g2,
            )
            reward = reward + jnp.where(game_over, 0.0, r)
            game_over = game_over | over
            if i >= frame_skip - pooled:
                frames.append(self._render(g))
        raw = frames[0] if len(frames) == 1 else jnp.maximum(*frames)
        frame = self._shrink(raw)
        stack = self._push(state["stack"], frame, jnp.bool_(False))

        lives = self.game.lives(g)
        terminated = game_over
        if bool(cfg["episodic_life"]):
            terminated = terminated | ((0 < lives) & (lives < prev_lives))
        discount = None
        if bool(cfg["zero_discount_on_life_loss"]):
            discount = ((lives == prev_lives) & ~terminated).astype(
                jnp.float32
            )
        info_reward = reward
        if bool(cfg["reward_clip"]):
            reward = jnp.sign(reward)

        new_state = {
            "game": g,
            "stack": stack,
            "last_action": action.astype(jnp.int32),
        }
        return EnvOut(
            state=new_state,
            obs=self._obs_dict(stack, g, info_reward, game_over),
            reward=reward.astype(jnp.float32),
            terminated=terminated,
            discount=discount,
        )
