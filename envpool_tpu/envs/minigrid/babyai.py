"""BabyAI-class tasks: mission-conditioned gridworlds.

Behavioral reference: ``envpool/minigrid/impl/babyai_*.cc`` (the reference
natively reimplements 96 BabyAI tasks with a mission language).  This round
opens the family with the two simplest instruction tasks:

* **GoToObj**: "go to the <color> <type>" — one random object; success when
  the agent faces it.
* **GoToDoor**: "go to the <color> door" — four doors in different colors
  on the room walls; success when the agent is next to the right door and
  issues ``done``.

The mission is exposed as ``info:mission_id`` (color*8 + object type),
standing in for the reference's tokenized ``obs:mission`` bytes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.env import EnvOut
from . import core as mg
from .minigrid_env import MiniGridEnv


class BabyAIGoToEnv(MiniGridEnv):
    """GoToObj / GoToDoor with mission ids."""

    DEFAULT_CONFIG = dict(MiniGridEnv.DEFAULT_CONFIG)
    DEFAULT_CONFIG.update({"env_name": "goto_obj", "size": 8})

    def _gen(self, key):
        name = str(self.config["env_name"])
        w, h = self._wh
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        grid = mg.empty_grid(w, h)

        if name == "goto_obj":
            # One random object of random color/type somewhere.
            obj_type = jax.random.choice(
                k1, jnp.asarray([mg.KEY, mg.BALL, mg.BOX], jnp.int8)
            )
            color = jax.random.randint(k2, (), 0, 6, jnp.int32).astype(
                jnp.int8
            )
            ox, oy = mg.place_random(k3, grid)
            grid = grid.at[oy, ox].set(
                jnp.stack([obj_type, color, jnp.int8(0)])
            )
            ax, ay = mg.place_random(k4, grid)
            d = jax.random.randint(k5, (), 0, 4, jnp.int32)
            self._target_from_state = ("obj", None)
            return grid, jnp.stack([ax, ay]), d

        if name == "goto_door":
            # Four doors in distinct colors, one per wall side.
            perm = jax.random.permutation(k1, 6)[:4].astype(jnp.int8)
            dy = jax.random.randint(k2, (2,), 1, h - 1, jnp.int32)
            dx = jax.random.randint(k3, (2,), 1, w - 1, jnp.int32)
            positions = [
                (0, dx[0]),          # top wall
                (h - 1, dx[1]),      # bottom wall
                (dy[0], 0),          # left wall
                (dy[1], w - 1),      # right wall
            ]
            for i, (ry, rx) in enumerate(positions):
                grid = grid.at[ry, rx].set(
                    jnp.stack([jnp.int8(mg.DOOR), perm[i], jnp.int8(mg.CLOSED)])
                )
            ax, ay = mg.place_random(k4, grid)
            d = jax.random.randint(k5, (), 0, 4, jnp.int32)
            return grid, jnp.stack([ax, ay]), d

        return super()._gen(key)

    # -- mission + success -------------------------------------------------

    def _mission_and_target(self, grid):
        """Mission id + target cell mask from the generated grid."""
        name = str(self.config["env_name"])
        obj = grid[:, :, 0]
        color = grid[:, :, 1]
        if name == "goto_obj":
            is_target = (
                (obj == mg.KEY) | (obj == mg.BALL) | (obj == mg.BOX)
            )
        else:
            is_target = obj == mg.DOOR
        return is_target

    def reset_env(self, key):
        k1, k2 = jax.random.split(key)
        st, obs = super().reset_env(k1)
        grid = st["grid"]
        is_target = self._mission_and_target(grid)
        name = str(self.config["env_name"])
        if name == "goto_door":
            # Pick one of the doors as the mission target.
            logits = jnp.where(is_target.reshape(-1), 0.0, -jnp.inf)
            idx = jax.random.categorical(k2, logits)
            w = grid.shape[1]
            ty, tx = idx // w, idx % w
        else:
            idx = jnp.argmax(is_target.reshape(-1))
            w = grid.shape[1]
            ty, tx = idx // w, idx % w
        tcolor = grid[ty, tx, 1].astype(jnp.int32)
        ttype = grid[ty, tx, 0].astype(jnp.int32)
        st = {**st, "target": jnp.stack([tx, ty]).astype(jnp.int32)}
        obs = dict(obs)
        obs["info:mission_id"] = tcolor * 8 + ttype
        self._last_mission = None
        return st, obs

    def _facing_target(self, st):
        fwd = st["pos"] + jnp.asarray(mg.DIR_VEC)[st["dir"]]
        return (fwd == st["target"]).all()

    def step_env(self, state, action, key):
        out = super().step_env(
            {k: v for k, v in state.items() if k != "target"}, action, key
        )
        st = {**out.state, "target": state["target"]}
        success = self._facing_target(st) & (
            (action == mg.DONE)
            if str(self.config["env_name"]) == "goto_door"
            else jnp.bool_(True)
        )
        t = st["t"]
        reward = jnp.where(
            success,
            1.0 - 0.9 * t.astype(jnp.float32) / self.max_episode_steps,
            out.reward,
        ).astype(jnp.float32)
        obs = dict(out.obs)
        tcolor = st["grid"][state["target"][1], state["target"][0], 1]
        ttype = st["grid"][state["target"][1], state["target"][0], 0]
        obs["info:mission_id"] = (
            tcolor.astype(jnp.int32) * 8 + ttype.astype(jnp.int32)
        )
        from ...core.env import EnvOut

        return EnvOut(
            state=st,
            obs=obs,
            reward=reward,
            terminated=out.terminated | success,
        )


class BabyAILocalEnv(MiniGridEnv):
    """Single-room BabyAI levels with desc-matched GoTo instructions.

    Behavioral reference: ``envpool/minigrid/impl/babyai_goto_tasks.cc``
    (GoToRedBall / GoToRedBallGrey / GoToRedBallNoDists / GoToRedBlueBall /
    GoToLocal) and ``babyai_instr.cc`` ``BabyAIGoToInstr::VerifyAction``:
    the episode succeeds when the agent's FRONT cell holds an object
    matching the instruction's (type, color) description — any matching
    object counts, not one specific cell.

    Distractors are uniform (type, color) draws like BabyAI's
    ``add_distractors`` (duplicates allowed); the Grey variant recolors
    them grey, and GoToRedBlueBall recolors conflicting red/blue ball
    distractors grey so the target color stays informative (the reference
    rejects-and-resamples — same support).  Mission id = color·8 + type.
    """

    DEFAULT_CONFIG = dict(MiniGridEnv.DEFAULT_CONFIG)
    DEFAULT_CONFIG.update(
        {"env_name": "goto_red_ball", "size": 8, "num_dists": 7}
    )

    def reset_env(self, key):
        name = str(self.config["env_name"])
        w, h = self._wh
        n = int(self.config["num_dists"])
        grid = mg.empty_grid(w, h)
        keys = jax.random.split(key, 2 * max(n, 1) + 6)

        if name in ("goto_red_ball", "goto_red_ball_grey"):
            ttype = jnp.int32(mg.BALL)
            tcolor = jnp.int32(mg.RED)
            ox, oy = mg.place_random(keys[-1], grid)
            grid = grid.at[oy, ox].set(
                jnp.asarray([mg.BALL, mg.RED, 0], jnp.int8)
            )
        elif name == "goto_red_blue_ball":
            ttype = jnp.int32(mg.BALL)
            tcolor = jnp.where(
                jax.random.bernoulli(keys[-2]), mg.RED, mg.BLUE
            ).astype(jnp.int32)
            ox, oy = mg.place_random(keys[-1], grid)
            grid = grid.at[oy, ox].set(
                jnp.stack(
                    [jnp.int8(mg.BALL), tcolor.astype(jnp.int8), jnp.int8(0)]
                )
            )
        else:  # goto_local: target picked among the distractors below
            ttype = None
            tcolor = None

        dist_types, dist_colors = [], []
        obj_table = jnp.asarray([mg.KEY, mg.BALL, mg.BOX], jnp.int8)
        for i in range(n):
            t = obj_table[jax.random.randint(keys[2 * i], (), 0, 3)]
            c = jax.random.randint(keys[2 * i + 1], (), 0, 6).astype(jnp.int8)
            if name == "goto_red_ball_grey":
                c = jnp.int8(mg.GREY)
            elif name == "goto_red_blue_ball":
                clash = (t == mg.BALL) & ((c == mg.RED) | (c == mg.BLUE))
                c = jnp.where(clash, mg.GREY, c).astype(jnp.int8)
            dx, dy = mg.place_random(
                jax.random.fold_in(keys[2 * i], 7), grid
            )
            grid = grid.at[dy, dx].set(jnp.stack([t, c, jnp.int8(0)]))
            dist_types.append(t)
            dist_colors.append(c)

        if name == "goto_local":
            idx = jax.random.randint(keys[-1], (), 0, n)
            ttype = jnp.stack(dist_types)[idx].astype(jnp.int32)
            tcolor = jnp.stack(dist_colors)[idx].astype(jnp.int32)

        ax, ay = mg.place_random(keys[-3], grid)
        d = jax.random.randint(keys[-4], (), 0, 4, jnp.int32)
        st = {
            "grid": grid,
            "pos": jnp.stack([ax, ay]).astype(jnp.int32),
            "dir": d.astype(jnp.int32),
            "carrying": jnp.asarray([mg.EMPTY, 0], jnp.int8),
            "t": jnp.int32(0),
            "target": jnp.stack([ttype, tcolor]).astype(jnp.int32),
        }
        return st, self._obs(st)

    def _obs(self, st):
        obs = MiniGridEnv._obs(self, st)
        if "target" in st:
            obs["info:mission_id"] = st["target"][1] * 8 + st["target"][0]
        return obs

    def step_env(self, state, action, key):
        out = MiniGridEnv.step_env(self, state, action, key)
        st = {**out.state, "target": state["target"]}
        w, h = self._wh
        fwd = st["pos"] + jnp.asarray(mg.DIR_VEC)[st["dir"]]
        fx = jnp.clip(fwd[0], 0, w - 1)
        fy = jnp.clip(fwd[1], 0, h - 1)
        cell = st["grid"][fy, fx]
        success = (
            (cell[0].astype(jnp.int32) == state["target"][0])
            & (cell[1].astype(jnp.int32) == state["target"][1])
        )
        t = st["t"]
        reward = jnp.where(
            success,
            1.0 - 0.9 * t.astype(jnp.float32) / self.max_episode_steps,
            out.reward,
        ).astype(jnp.float32)
        return EnvOut(
            state=st,
            obs=self._obs(st),
            reward=reward,
            terminated=out.terminated | success,
        )
