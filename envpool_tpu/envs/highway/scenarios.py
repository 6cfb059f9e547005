"""Highway scenario wave 2: Parking (goal-conditioned) and LaneKeeping.

Behavioral reference: ``envpool/highway/official_task.cc`` —
``MakeParkingRoad``/``ResetParkingVehicles`` (14 spots per side at
y = ±10..±18, ego spawned on the center aisle, goal = middle of a random
spot, optional 10 parked vehicles, surrounding walls) and
``MakeLaneKeepingRoad``/``ResetLaneKeepingVehicle``.  Vehicle dynamics are
the kinematic bicycle model used throughout highway-env
(``official_vehicle.cc``): β = atan(tan(δ)/2), ẋ = v·cos(ψ+β),
ẏ = v·sin(ψ+β), ψ̇ = v·sin(β)/(L/2), v̇ = a.

Parking reward (highway-env ParkingEnv): r = −Σᵢ wᵢ·|aᵢ − dᵢ|^p over the
scaled goal features [x/100, y/100, vx/5, vy/5, cos ψ, sin ψ] with
weights [1, 0.3, 0, 0, 0.02, 0.02] and p = 0.5; success when r > −0.12;
crashes (walls / parked cars) give −5 and terminate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec

_LENGTH = 5.0   # vehicle length [m]
_WIDTH = 2.0
_SPOTS = 14
_SPOT_W = 4.0
_Y_OFF = 10.0
_SPOT_LEN = 8.0
_WEIGHTS = np.asarray([1.0, 0.3, 0.0, 0.0, 0.02, 0.02], np.float32)
_SCALES = np.asarray([100.0, 100.0, 5.0, 5.0, 1.0, 1.0], np.float32)
_P = 0.5
_SUCCESS = -0.12


def _spot_centers():
    """(x, y, heading) of all 2 x 14 parking-spot centers."""
    xs = (np.arange(1, _SPOTS + 1) - _SPOTS / 2.0) * _SPOT_W - _SPOT_W / 2.0
    top = np.stack(
        [xs, np.full(_SPOTS, _Y_OFF + _SPOT_LEN / 2), np.full(_SPOTS, np.pi / 2)],
        1,
    )
    bot = np.stack(
        [xs, np.full(_SPOTS, -_Y_OFF - _SPOT_LEN / 2),
         np.full(_SPOTS, -np.pi / 2)],
        1,
    )
    return np.concatenate([top, bot], 0)  # [28, 3]


class ParkingEnv(TpuEnv):
    """Parking / ParkingActionRepeat / ParkingParked."""

    DEFAULT_CONFIG = {
        "duration": 100,
        "policy_frequency": 5,
        "simulation_frequency": 15,
        "add_parked_vehicles": False,
        "reward_threshold": 0.0,
    }

    def state_spec(self):
        inf = float("inf")
        spec = {
            "obs:observation": ArraySpec(jnp.float32, (6,), -inf, inf),
            "obs:achieved_goal": ArraySpec(jnp.float32, (6,), -inf, inf),
            "obs:desired_goal": ArraySpec(jnp.float32, (6,), -inf, inf),
            "info:is_success": ArraySpec(jnp.bool_, ()),
            "info:crashed": ArraySpec(jnp.bool_, ()),
        }
        return spec

    def action_spec(self):
        return {"action": ArraySpec(jnp.float32, (2,), -1.0, 1.0)}

    def _features(self, st):
        x, y, v, h = st["x"], st["y"], st["v"], st["h"]
        return jnp.stack(
            [
                x / _SCALES[0],
                y / _SCALES[1],
                v * jnp.cos(h) / _SCALES[2],
                v * jnp.sin(h) / _SCALES[3],
                jnp.cos(h),
                jnp.sin(h),
            ]
        ).astype(jnp.float32)

    def _goal_features(self, st):
        gx, gy, gh = st["goal"][0], st["goal"][1], st["goal"][2]
        return jnp.stack(
            [
                gx / _SCALES[0],
                gy / _SCALES[1],
                jnp.float32(0.0),
                jnp.float32(0.0),
                jnp.cos(gh),
                jnp.sin(gh),
            ]
        ).astype(jnp.float32)

    @staticmethod
    def goal_reward(achieved, desired):
        w = jnp.asarray(_WEIGHTS)
        return -jnp.sum(w * jnp.abs(achieved - desired) ** _P)

    def _obs(self, st, crashed, success):
        return {
            "obs:observation": self._features(st),
            "obs:achieved_goal": self._features(st),
            "obs:desired_goal": self._goal_features(st),
            "info:is_success": success,
            "info:crashed": crashed,
        }

    def reset_env(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        spots = jnp.asarray(_spot_centers(), jnp.float32)
        goal = spots[jax.random.randint(k1, (), 0, len(spots))]
        st = {
            "x": jax.random.uniform(k2, (), jnp.float32, -20.0, 20.0),
            "y": jnp.float32(0.0),
            "v": jnp.float32(0.0),
            "h": jax.random.uniform(k3, (), jnp.float32, 0, 2 * jnp.pi),
            "goal": goal,
        }
        return st, self._obs(st, jnp.bool_(False), jnp.bool_(False))

    def _parked_mask(self, goal):
        """Spot centers occupied by parked vehicles (first 10 non-goal)."""
        spots = jnp.asarray(_spot_centers(), jnp.float32)
        not_goal = jnp.linalg.norm(spots[:, :2] - goal[:2], axis=1) > 0.1
        order = jnp.cumsum(not_goal.astype(jnp.int32))
        return not_goal & (order <= 10), spots

    def step_env(self, state, action, key):
        a = jnp.clip(jnp.reshape(action, (2,)), -1.0, 1.0)
        acc = a[0] * 5.0
        steer = a[1] * jnp.pi / 4
        n_sub = max(
            1,
            round(
                int(self.config["simulation_frequency"])
                / int(self.config["policy_frequency"])
            ),
        )
        dt = 1.0 / float(self.config["simulation_frequency"])
        x, y, v, h = state["x"], state["y"], state["v"], state["h"]
        beta = jnp.arctan(0.5 * jnp.tan(steer))
        for _ in range(n_sub):
            x = x + v * jnp.cos(h + beta) * dt
            y = y + v * jnp.sin(h + beta) * dt
            h = h + v * jnp.sin(beta) / (_LENGTH / 2) * dt
            v = jnp.clip(v + acc * dt, -10.0, 10.0)
        st = {"x": x, "y": y, "v": v, "h": h, "goal": state["goal"]}

        # Collisions: lot walls and (optionally) parked vehicles.
        crashed = (jnp.abs(x) > (_SPOTS / 2 + 1) * _SPOT_W) | (
            jnp.abs(y) > _Y_OFF + _SPOT_LEN + 2
        )
        if bool(self.config["add_parked_vehicles"]):
            mask, spots = self._parked_mask(state["goal"])
            d = jnp.linalg.norm(
                spots[:, :2] - jnp.stack([x, y]), axis=1
            )
            crashed = crashed | jnp.any(mask & (d < 2.0))

        achieved = self._features(st)
        desired = self._goal_features(st)
        reward = self.goal_reward(achieved, desired)
        success = reward > _SUCCESS
        reward = jnp.where(crashed, -5.0, reward).astype(jnp.float32)
        return EnvOut(
            state=st,
            obs=self._obs(st, crashed, success),
            reward=reward,
            terminated=crashed | success,
        )


class LaneKeepingEnv(TpuEnv):
    """LaneKeeping-v0: steering-only control on a sinusoidal lane.

    Behavior-level port of ``MakeLaneKeepingRoad`` (sine centerline
    y = A·sin(ωx + φ)); constant speed, steering action, reward
    1 − (lateral error / half-width)², off-road terminates.
    """

    DEFAULT_CONFIG = {
        "duration": 20,
        "simulation_frequency": 10,
        "policy_frequency": 10,
        "amplitude": 4.0,
        "pulsation": 2 * np.pi / 100.0,
        "speed": 8.0,
        "reward_threshold": 0.0,
    }

    def state_spec(self):
        inf = float("inf")
        return {
            "obs": ArraySpec(jnp.float32, (5,), -inf, inf),
        }

    def action_spec(self):
        return {"action": ArraySpec(jnp.float32, (1,), -1.0, 1.0)}

    def _lane_y(self, x):
        A = float(self.config["amplitude"])
        w = float(self.config["pulsation"])
        return A * jnp.sin(w * x), A * w * jnp.cos(w * x)

    def _obs_vec(self, st):
        cy, slope = self._lane_y(st["x"])
        lane_h = jnp.arctan(slope)
        lat = st["y"] - cy
        herr = st["h"] - lane_h
        return jnp.stack(
            [
                lat,
                st["v"] * jnp.sin(herr),
                jnp.cos(herr),
                jnp.sin(herr),
                st["v"],
            ]
        ).astype(jnp.float32)

    def reset_env(self, key):
        k1, k2 = jax.random.split(key)
        st = {
            "x": jnp.float32(0.0),
            "y": jax.random.uniform(k1, (), jnp.float32, -1.0, 1.0),
            "v": jnp.float32(float(self.config["speed"])),
            "h": jax.random.uniform(k2, (), jnp.float32, -0.2, 0.2),
        }
        return st, {"obs": self._obs_vec(st)}

    def step_env(self, state, action, key):
        steer = jnp.clip(jnp.reshape(action, (1,))[0], -1.0, 1.0) * (
            jnp.pi / 3
        )
        dt = 1.0 / float(self.config["simulation_frequency"])
        x, y, v, h = state["x"], state["y"], state["v"], state["h"]
        beta = jnp.arctan(0.5 * jnp.tan(steer))
        x = x + v * jnp.cos(h + beta) * dt
        y = y + v * jnp.sin(h + beta) * dt
        h = h + v * jnp.sin(beta) / (_LENGTH / 2) * dt
        st = {"x": x, "y": y, "v": v, "h": h}
        cy, _ = self._lane_y(x)
        lat = y - cy
        off = jnp.abs(lat) > 2 * float(self.config["amplitude"])
        reward = jnp.maximum(0.0, 1.0 - (lat / 2.0) ** 2).astype(jnp.float32)
        return EnvOut(
            state=st,
            obs={"obs": self._obs_vec(st)},
            reward=reward,
            terminated=off,
        )
