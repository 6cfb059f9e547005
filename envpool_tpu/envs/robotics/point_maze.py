"""PointMaze family — force-actuated ball in a maze (goal-conditioned).

Behavioral reference: ``envpool/mujoco/robotics/point_maze.h`` and the
gymnasium_robotics MazeEnv/PointEnv pair (``envs/maze/maze.py``,
``envs/maze/point.py``): a 2-dof slide-joint ball (sphere r=0.1,
density 1000 → m≈4.18879 kg, joint damping 1, motor gear 100,
dt=0.01, frame_skip=1) in a grid maze of unit boxes.  Each step clips
qvel to ±5 *before* integrating, applies MuJoCo's Euler-with-implicit-
damping update, then resolves wall contact.

TPU-native design: the maze is a static wall bitmap; wall collision is
resolved in closed form (project the ball out of the blocked cell's
expanded AABB, zero the normal velocity) instead of MuJoCo's soft
contact — condim=1 (frictionless) walls make this behaviorally
equivalent sliding.  Goal/reset cell tables are constant arrays; the
continuing-task goal resampling runs on-device with the per-step key.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec

# Cell legend (gymnasium_robotics envs/maze/maps.py).
R, G, C = "r", "g", "c"

MAZE_MAPS: dict[str, list[list[Any]]] = {
    "OPEN": [
        [1, 1, 1, 1, 1, 1, 1],
        [1, 0, 0, 0, 0, 0, 1],
        [1, 0, 0, 0, 0, 0, 1],
        [1, 0, 0, 0, 0, 0, 1],
        [1, 1, 1, 1, 1, 1, 1],
    ],
    "OPEN_DIVERSE_G": [
        [1, 1, 1, 1, 1, 1, 1],
        [1, R, G, G, G, G, 1],
        [1, G, G, G, G, G, 1],
        [1, G, G, G, G, G, 1],
        [1, 1, 1, 1, 1, 1, 1],
    ],
    "OPEN_DIVERSE_GR": [
        [1, 1, 1, 1, 1, 1, 1],
        [1, C, C, C, C, C, 1],
        [1, C, C, C, C, C, 1],
        [1, C, C, C, C, C, 1],
        [1, 1, 1, 1, 1, 1, 1],
    ],
    "U_MAZE": [
        [1, 1, 1, 1, 1],
        [1, 0, 0, 0, 1],
        [1, 1, 1, 0, 1],
        [1, 0, 0, 0, 1],
        [1, 1, 1, 1, 1],
    ],
    "MEDIUM_MAZE": [
        [1, 1, 1, 1, 1, 1, 1, 1],
        [1, 0, 0, 1, 1, 0, 0, 1],
        [1, 0, 0, 1, 0, 0, 0, 1],
        [1, 1, 0, 0, 0, 1, 1, 1],
        [1, 0, 0, 1, 0, 0, 0, 1],
        [1, 0, 1, 0, 0, 1, 0, 1],
        [1, 0, 0, 0, 1, 0, 0, 1],
        [1, 1, 1, 1, 1, 1, 1, 1],
    ],
    "MEDIUM_MAZE_DIVERSE_G": [
        [1, 1, 1, 1, 1, 1, 1, 1],
        [1, R, 0, 1, 1, 0, 0, 1],
        [1, 0, 0, 1, 0, 0, G, 1],
        [1, 1, 0, 0, 0, 1, 1, 1],
        [1, 0, 0, 1, 0, 0, 0, 1],
        [1, G, 1, 0, 0, 1, 0, 1],
        [1, 0, 0, 0, 1, G, 0, 1],
        [1, 1, 1, 1, 1, 1, 1, 1],
    ],
    "MEDIUM_MAZE_DIVERSE_GR": [
        [1, 1, 1, 1, 1, 1, 1, 1],
        [1, C, 0, 1, 1, 0, 0, 1],
        [1, 0, 0, 1, 0, 0, C, 1],
        [1, 1, 0, 0, 0, 1, 1, 1],
        [1, 0, 0, 1, 0, 0, 0, 1],
        [1, C, 1, 0, 0, 1, 0, 1],
        [1, 0, 0, 0, 1, C, 0, 1],
        [1, 1, 1, 1, 1, 1, 1, 1],
    ],
    "LARGE_MAZE": [
        [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
        [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 1],
        [1, 0, 1, 1, 0, 1, 0, 1, 0, 1, 0, 1],
        [1, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 1],
        [1, 0, 1, 1, 1, 1, 0, 1, 1, 1, 0, 1],
        [1, 0, 0, 1, 0, 1, 0, 0, 0, 0, 0, 1],
        [1, 1, 0, 1, 0, 1, 0, 1, 0, 1, 1, 1],
        [1, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 1],
        [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
    ],
    "LARGE_MAZE_DIVERSE_G": [
        [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
        [1, R, 0, 0, 0, 1, G, 0, 0, 0, 0, 1],
        [1, 0, 1, 1, 0, 1, 0, 1, 0, 1, 0, 1],
        [1, 0, 0, 0, 0, G, 0, 1, 0, 0, G, 1],
        [1, 0, 1, 1, 1, 1, 0, 1, 1, 1, 0, 1],
        [1, 0, G, 1, 0, 1, 0, 0, 0, 0, 0, 1],
        [1, 1, 0, 1, 0, 1, 0, 1, 0, 1, 1, 1],
        [1, 0, 0, 1, G, 0, G, 1, 0, G, 0, 1],
        [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
    ],
    "LARGE_MAZE_DIVERSE_GR": [
        [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
        [1, C, 0, 0, 0, 1, C, 0, 0, 0, 0, 1],
        [1, 0, 1, 1, 0, 1, 0, 1, 0, 1, 0, 1],
        [1, 0, 0, 0, 0, C, 0, 1, 0, 0, C, 1],
        [1, 0, 1, 1, 1, 1, 0, 1, 1, 1, 0, 1],
        [1, 0, C, 1, 0, 1, 0, 0, 0, 0, 0, 1],
        [1, 1, 0, 1, 0, 1, 0, 1, 0, 1, 1, 1],
        [1, 0, 0, 1, C, 0, C, 1, 0, C, 0, 1],
        [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
    ],
}

_BALL_MASS = 4000.0 / 3.0 * np.pi * 0.1**3  # sphere r=.1, density 1000
_GEAR = 100.0
_DAMPING = 1.0
_DT = 0.01
_RADIUS = 0.1
_SUCCESS_RADIUS = 0.45


def _maze_tables(maze_map, size_scaling):
    """(walls [H,W] bool, goal cells [Ng,2], reset cells [Nr,2]) in xy."""
    H, W = len(maze_map), len(maze_map[0])
    xc, yc = W / 2 * size_scaling, H / 2 * size_scaling
    walls = np.zeros((H, W), bool)
    goals, resets, combined, empties = [], [], [], []
    for i in range(H):
        for j in range(W):
            s = maze_map[i][j]
            x = (j + 0.5) * size_scaling - xc
            y = yc - (i + 0.5) * size_scaling
            if s == 1:
                walls[i, j] = True
            elif s == R:
                resets.append((x, y))
            elif s == G:
                goals.append((x, y))
            elif s == C:
                combined.append((x, y))
            else:
                empties.append((x, y))
    if not goals and not resets and not combined:
        combined = empties
    goals = goals + combined
    resets = resets + combined
    return (
        walls,
        np.asarray(goals, np.float32).reshape(-1, 2),
        np.asarray(resets, np.float32).reshape(-1, 2),
        (xc, yc),
    )


class PointMazeEnv(TpuEnv):
    """All PointMaze_* ids via the ``maze_map`` config."""

    DEFAULT_CONFIG = {
        "maze_map": "U_MAZE",
        "reward_type": "sparse",
        "continuing_task": True,
        "reset_target": False,
        "maze_size_scaling": 1.0,
        "maze_height": 0.4,
        "position_noise_range": 0.25,
    }

    def __init__(self, config):
        super().__init__(config)
        self.scale = float(config["maze_size_scaling"])
        walls, goals, resets, center = _maze_tables(
            MAZE_MAPS[str(config["maze_map"])], self.scale
        )
        self.walls = walls
        self.goal_cells = goals
        self.reset_cells = resets
        self.center = center
        self.noise = float(config["position_noise_range"]) * self.scale
        self.sparse = str(config["reward_type"]) == "sparse"
        self.continuing = bool(config["continuing_task"])
        self.reset_target = bool(config["reset_target"])

    # -- specs -------------------------------------------------------------

    def state_spec(self):
        inf = float("inf")
        return {
            "obs:observation": ArraySpec(jnp.float32, (4,), -inf, inf),
            "obs:achieved_goal": ArraySpec(jnp.float32, (2,), -inf, inf),
            "obs:desired_goal": ArraySpec(jnp.float32, (2,), -inf, inf),
            "info:success": ArraySpec(jnp.float32, (), 0.0, 1.0),
            "info:distance": ArraySpec(jnp.float32, (), 0.0, inf),
            "info:qpos0": ArraySpec(jnp.float32, (2,)),
            "info:qvel0": ArraySpec(jnp.float32, (2,)),
            "info:goal0": ArraySpec(jnp.float32, (2,)),
        }

    def action_spec(self):
        return {"action": ArraySpec(jnp.float32, (2,), -1.0, 1.0)}

    # -- helpers -----------------------------------------------------------

    def _cell_of(self, xy):
        """World xy → (row, col) cell indices."""
        xc, yc = self.center
        j = jnp.floor((xy[0] + xc) / self.scale).astype(jnp.int32)
        i = jnp.floor((yc - xy[1]) / self.scale).astype(jnp.int32)
        H, W = self.walls.shape
        return jnp.clip(i, 0, H - 1), jnp.clip(j, 0, W - 1)

    def _sample_goal(self, key):
        k1, k2 = jax.random.split(key)
        idx = jax.random.randint(k1, (), 0, len(self.goal_cells))
        goal = jnp.asarray(self.goal_cells)[idx]
        return goal + jax.random.uniform(
            k2, (2,), jnp.float32, -self.noise, self.noise
        )

    def _sample_reset(self, key, goal):
        """Rejection sampling: cell center > 0.5 from the (noisy) goal."""
        cells = jnp.asarray(self.reset_cells)

        def cond(carry):
            _, pos = carry
            return jnp.linalg.norm(pos - goal) <= 0.5

        def body(carry):
            k, _ = carry
            k = jax.random.fold_in(k, 7)
            idx = jax.random.randint(k, (), 0, len(cells))
            return k, cells[idx]

        _, pos = jax.lax.while_loop(
            cond, body, body((key, jnp.zeros(2, jnp.float32)))
        )
        k_noise = jax.random.fold_in(key, 11)
        return pos + jax.random.uniform(
            k_noise, (2,), jnp.float32, -self.noise, self.noise
        )

    def _resolve_walls(self, pos, vel):
        """Push the ball out of any blocked cell's expanded AABB.

        Checks the ball's own cell and 8 neighbors against the wall
        bitmap; for the nearest-penetrating wall, projects out along the
        minimal axis and zeroes that velocity component (inelastic,
        frictionless — MuJoCo condim=1).
        """
        xc, yc = self.center
        H, W = self.walls.shape
        walls = jnp.asarray(self.walls)
        ci, cj = self._cell_of(pos)
        half = 0.5 * self.scale

        def one_pass(carry, _):
            pos, vel = carry
            ci, cj = self._cell_of(pos)
            best_depth = jnp.float32(-1.0)
            best_push = jnp.zeros(2, jnp.float32)
            best_axis = jnp.int32(-1)
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    i = jnp.clip(ci + di, 0, H - 1)
                    j = jnp.clip(cj + dj, 0, W - 1)
                    is_wall = walls[i, j]
                    # Wall AABB center.
                    wx = (j.astype(jnp.float32) + 0.5) * self.scale - xc
                    wy = yc - (i.astype(jnp.float32) + 0.5) * self.scale
                    dx = pos[0] - wx
                    dy = pos[1] - wy
                    # Penetration depth along each axis (expanded box).
                    pen_x = half + _RADIUS - jnp.abs(dx)
                    pen_y = half + _RADIUS - jnp.abs(dy)
                    overlap = is_wall & (pen_x > 0) & (pen_y > 0)
                    # Separate along the smaller penetration.
                    use_x = pen_x < pen_y
                    depth = jnp.where(use_x, pen_x, pen_y)
                    push = jnp.where(
                        use_x,
                        jnp.stack([jnp.sign(dx) * pen_x, 0.0]),
                        jnp.stack([0.0, jnp.sign(dy) * pen_y]),
                    )
                    axis = jnp.where(use_x, 0, 1)
                    better = overlap & (depth > best_depth)
                    best_depth = jnp.where(better, depth, best_depth)
                    best_push = jnp.where(better, push, best_push)
                    best_axis = jnp.where(better, axis, best_axis)
            hit = best_depth > 0
            pos = jnp.where(hit, pos + best_push, pos)
            vel_x = jnp.where(hit & (best_axis == 0), 0.0, vel[0])
            vel_y = jnp.where(hit & (best_axis == 1), 0.0, vel[1])
            return (pos, jnp.stack([vel_x, vel_y])), None

        (pos, vel), _ = jax.lax.scan(one_pass, (pos, vel), None, length=2)
        return pos, vel

    # -- TpuEnv contract ---------------------------------------------------

    def _obs(self, st):
        pos, vel, goal = st["pos"], st["vel"], st["goal"]
        d = jnp.linalg.norm(pos - goal)
        return {
            "obs:observation": jnp.concatenate([pos, vel]),
            "obs:achieved_goal": pos,
            "obs:desired_goal": goal,
            "info:success": (d <= _SUCCESS_RADIUS).astype(jnp.float32),
            "info:distance": d,
            "info:qpos0": st["qpos0"],
            "info:qvel0": jnp.zeros(2, jnp.float32),
            "info:goal0": st["goal0"],
        }

    def reset_env(self, key):
        kg, kr = jax.random.split(key)
        goal = self._sample_goal(kg)
        pos = self._sample_reset(kr, goal)
        st = {
            "pos": pos,
            "vel": jnp.zeros(2, jnp.float32),
            "goal": goal,
            "qpos0": pos,
            "goal0": goal,
        }
        return st, self._obs(st)

    def step_env(self, state, action, key):
        action = jnp.clip(
            jnp.reshape(action, (2,)).astype(jnp.float32), -1.0, 1.0
        )
        pos, vel = state["pos"], state["vel"]
        # Velocity clip happens before the sim step (point.py:_clip_velocity).
        vel = jnp.clip(vel, -5.0, 5.0)
        # MuJoCo Euler with implicit joint damping:
        # (m + h d) v' = m v + h F.
        force = action * _GEAR
        vel = (_BALL_MASS * vel + _DT * force) / (_BALL_MASS + _DT * _DAMPING)
        pos = pos + _DT * vel
        pos, vel = self._resolve_walls(pos, vel)

        d = jnp.linalg.norm(pos - state["goal"])
        success = d <= _SUCCESS_RADIUS
        if self.sparse:
            reward = success.astype(jnp.float32)
        else:
            reward = jnp.exp(-d)

        goal = state["goal"]
        terminated = jnp.bool_(False)
        if self.continuing:
            # Resample the goal on success (unless reset_target or only
            # one goal location exists) — maze.py compute_terminated.
            if len(self.goal_cells) > 1 and not self.reset_target:
                new_goal = self._sample_goal(key)
                goal = jnp.where(success, new_goal, goal)
        else:
            terminated = success

        st = {
            "pos": pos,
            "vel": vel,
            "goal": goal,
            "qpos0": state["qpos0"],
            "goal0": state["goal0"],
        }
        return EnvOut(
            state=st,
            obs=self._obs(st),
            reward=jnp.asarray(reward, jnp.float32),
            terminated=terminated,
        )
