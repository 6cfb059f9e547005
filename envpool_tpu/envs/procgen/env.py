"""Procgen env wrapper: game cores → the reference env surface.

Obs (64, 64, 3) uint8 RGB, 15 discrete actions, per-episode procedural
levels from the per-env PRNG stream (``level_seed`` semantics: the
``start_level``/``num_levels`` window maps to a bounded set of level
keys, procgen_env.h:39-80); ``info:level_seed`` and ``info:prev_level_
complete`` mirror the reference info surface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec
from .core import N_ACTIONS, RES
from . import grid_games, platform_games, scroll_games

GAMES = {
    "maze": (grid_games.MazeGame, 15),
    "heist": (grid_games.HeistGame, 15),
    "chaser": (grid_games.ChaserGame, 15),
    "miner": (grid_games.MinerGame, 15),
    "bigfish": (scroll_games.BigfishGame, 0),
    "starpilot": (scroll_games.StarpilotGame, 0),
    "fruitbot": (scroll_games.FruitbotGame, 0),
    "dodgeball": (scroll_games.DodgeballGame, 0),
    "bossfight": (scroll_games.BossfightGame, 0),
    "caveflyer": (scroll_games.CaveflyerGame, 0),
    "plunder": (scroll_games.PlunderGame, 0),
    "coinrun": (platform_games.CoinrunGame, 0),
    "ninja": (platform_games.NinjaGame, 0),
    "jumper": (platform_games.JumperGame, 0),
    "climber": (platform_games.ClimberGame, 0),
    "leaper": (platform_games.LeaperGame, 0),
}


class ProcgenEnv(TpuEnv):
    DEFAULT_CONFIG = {
        "env_name": "coinrun",
        "distribution_mode": "easy",
        "num_levels": 0,
        "start_level": 0,
    }

    def __init__(self, config):
        super().__init__(config)
        name = str(config["env_name"])
        mode = str(config["distribution_mode"])
        cls, size = GAMES[name]
        # Distribution modes scale world size for the grid games.
        if size:
            size = {
                "easy": 11, "hard": 15, "extreme": 19,
                "exploration": 19, "memory": 23,
            }.get(mode, 15)
            size = size | 1  # odd for the maze generator
        self.game = cls(size, mode)
        self.num_levels = int(config["num_levels"])
        self.start_level = int(config["start_level"])

    def state_spec(self):
        return {
            "obs": ArraySpec(jnp.uint8, (RES, RES, 3), 0, 255),
            "info:level_seed": ArraySpec(jnp.int32, ()),
            "info:prev_level_complete": ArraySpec(jnp.int32, (), 0, 1),
        }

    def action_spec(self):
        return {
            "action": ArraySpec(
                jnp.int32, (), 0, N_ACTIONS - 1, is_discrete=True
            )
        }

    def _level_key(self, key):
        """Bounded level window: fold the seed into [start, start+num)."""
        if self.num_levels > 0:
            lvl = self.start_level + jax.random.randint(
                key, (), 0, self.num_levels
            )
        else:
            lvl = jax.random.randint(key, (), 0, 2**31 - 1)
        return jax.random.PRNGKey(lvl.astype(jnp.uint32)), lvl

    def _obs(self, g, lvl, complete):
        return {
            "obs": self.game.render(g),
            "info:level_seed": lvl.astype(jnp.int32),
            "info:prev_level_complete": complete.astype(jnp.int32),
        }

    def reset_env(self, key):
        lk, lvl = self._level_key(key)
        g = self.game.init(lk)
        st = {"g": g, "lvl": lvl, "complete": jnp.int32(0)}
        return st, self._obs(g, lvl, jnp.int32(0))

    def step_env(self, state, action, key):
        a = jnp.clip(jnp.reshape(action, ()).astype(jnp.int32), 0,
                     N_ACTIONS - 1)
        g, reward, done = self.game.tick(state["g"], a, key)
        complete = jnp.where(
            done & (reward > 0), 1, state["complete"]
        ).astype(jnp.int32)
        st = {"g": g, "lvl": state["lvl"], "complete": complete}
        return EnvOut(
            state=st,
            obs=self._obs(g, state["lvl"], complete),
            reward=jnp.asarray(reward, jnp.float32),
            terminated=jnp.asarray(done, jnp.bool_),
        )
