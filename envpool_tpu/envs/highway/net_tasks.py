"""Concrete lane-network scenario envs (rewards/terminations/observations).

Reward/termination formulas mirror ``envpool/highway/native_task_env.h``
``OfficialReward`` (:1170-1264), ``OfficialIntersectionReward`` (:1266),
``OfficialRacetrackReward`` (:1292) and the per-scenario ``done_``
conditions (:918-925, :977-990).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.specs import ArraySpec
from .net_scenarios import NetworkScenarioEnv
from .network import K_IDM, K_OBSTACLE, lane_local, lmap, on_lane

_INF = float("inf")


def _kin_spec(rows, feats):
    return {
        "obs": ArraySpec(jnp.float32, (rows, feats), -_INF, _INF),
        "info:speed": ArraySpec(jnp.float32, ()),
        "info:crashed": ArraySpec(jnp.bool_, ()),
    }


class MergeEnv(NetworkScenarioEnv):
    """Merge-v0 (native_task_env.h:1245-1263)."""

    SCENARIO = "merge"
    ACTION_MODE = "discrete5"

    def state_spec(self):
        return _kin_spec(5, 5)

    def _obs(self, st):
        obs = self._kinematics(
            st, 5, ["presence", "x", "y", "vx", "vy"],
            y_rng=(-8.0, 8.0))
        return {"obs": obs, **self._common_info(st)}

    def _reward(self, T, veh, st):
        scaled = lmap(st["speed"][0], 20.0, 30.0, 0.0, 1.0)
        merge_lane = self._static[2]["merge_lane"]
        on_ramp = (st["lane"] == merge_lane) & (veh["kind"] != K_OBSTACLE)
        merging = jnp.sum(jnp.where(
            on_ramp,
            (st["target_speed"] - st["speed"])
            / jnp.where(st["target_speed"] != 0, st["target_speed"], 1.0),
            0.0))
        lc = (st["last_action"] == 0) | (st["last_action"] == 2)
        weighted = (-1.0 * st["crashed"][0]
                    + 0.1 * T["lane_id"][st["lane"][0]]
                    + 0.2 * scaled - 0.05 * lc - 0.5 * merging)
        return lmap(weighted, -1.5, 0.3, 0.0, 1.0)

    def _terminated(self, T, veh, st):
        return st["crashed"][0] | (st["pos"][0, 0] > 370.0)


class TwoWayEnv(NetworkScenarioEnv):
    """TwoWay-v0 — TTC observation (native_task_env.h:1191-1202)."""

    SCENARIO = "two_way"
    ACTION_MODE = "discrete5"
    HORIZON = 5

    def state_spec(self):
        return {
            "obs": ArraySpec(jnp.float32, (3, 3, self.HORIZON), 0.0, 1.0),
            "info:speed": ArraySpec(jnp.float32, ()),
            "info:crashed": ArraySpec(jnp.bool_, ()),
        }

    def _obs(self, st):
        return {"obs": self._ttc(st, self.HORIZON),
                **self._common_info(st)}

    def _reward(self, T, veh, st):
        n = jnp.maximum(T["seg_count"][st["lane"][0]] - 1, 1)
        hs = st["speed_index"].astype(jnp.float32) / 2.0
        ll = ((T["seg_count"][st["lane"][0]] - 1
               - T["lane_id"][st["target_lane"][0]]).astype(jnp.float32)
              / n.astype(jnp.float32))
        return 0.8 * hs + 0.2 * ll


class UTurnEnv(TwoWayEnv):
    """UTurn-v0 (native_task_env.h:1204-1218)."""

    SCENARIO = "u_turn"
    HORIZON = 16

    def _reward(self, T, veh, st):
        lane0 = st["lane"][0]
        n = jnp.maximum(T["seg_count"][lane0] - 1, 1).astype(jnp.float32)
        lane_r = T["lane_id"][lane0].astype(jnp.float32) / n
        speed_r = jnp.clip(lmap(st["speed"][0], 8.0, 24.0, 0.0, 1.0),
                           0.0, 1.0)
        weighted = (-1.0 * st["crashed"][0] + 0.1 * lane_r + 0.4 * speed_r)
        return lmap(weighted, -1.0, 0.5, 0.0, 1.0) * self._on_road(T, st)


class ExitEnv(NetworkScenarioEnv):
    """Exit-v0 (native_task_env.h:1236-1244)."""

    SCENARIO = "exit"
    ACTION_MODE = "discrete5"
    DEFAULT_CONFIG = dict(NetworkScenarioEnv.DEFAULT_CONFIG,
                          simulation_frequency=5, duration=18)

    def state_spec(self):
        return _kin_spec(15, 7)

    def _obs(self, st):
        obs = self._kinematics(
            st, 15,
            ["presence", "x", "y", "vx", "vy", "cos_h", "sin_h"],
            clip=False, y_rng=(-24.0, 24.0),
            ego_x_override=self._static[2]["exit_pre_lane"])
        return {"obs": obs, **self._common_info(st)}

    def _reward(self, T, veh, st):
        s0, s1 = self._static[2]["success_lanes"]
        tl = st["target_lane"][0]
        success = (tl == s0) | (tl == s1)
        scaled = jnp.clip(lmap(st["speed"][0], 20.0, 30.0, 0.0, 1.0),
                          0.0, 1.0)
        return jnp.clip(success + 0.1 * scaled, 0.0, 1.0)


class RoundaboutEnv(NetworkScenarioEnv):
    """Roundabout-v0 (native_task_env.h:1220-1233)."""

    SCENARIO = "roundabout"
    ACTION_MODE = "discrete5"

    def state_spec(self):
        return _kin_spec(5, 5)

    def _obs(self, st):
        obs = self._kinematics(
            st, 5, ["presence", "x", "y", "vx", "vy"], absolute=True,
            x_rng=(-100.0, 100.0), y_rng=(-100.0, 100.0),
            v_rng=(-15.0, 15.0))
        return {"obs": obs, **self._common_info(st)}

    def _reward(self, T, veh, st):
        hs = st["speed_index"].astype(jnp.float32) / 2.0
        lc = (st["last_action"] == 0) | (st["last_action"] == 2)
        weighted = -1.0 * st["crashed"][0] + 0.2 * hs - 0.05 * lc
        return lmap(weighted, -1.0, 0.2, 0.0, 1.0) * self._on_road(T, st)


class _IntersectionBase(NetworkScenarioEnv):
    SCENARIO = "intersection"

    def _arrived(self, T, st, row=0):
        lanes = jnp.asarray(self._static[2]["arrival_lanes"])
        s, _ = lane_local(T, st["lane"][row], st["pos"][row])
        return lanes[st["lane"][row]] & (s >= 25.0)

    def _reward(self, T, veh, st):
        speed_r = jnp.clip(lmap(st["speed"][0], 7.0, 9.0, 0.0, 1.0),
                           0.0, 1.0)
        base = (-5.0 * st["crashed"][0] + speed_r) * self._on_road(T, st)
        return jnp.where(self._arrived(T, st), 1.0, base)

    def _terminated(self, T, veh, st):
        return st["crashed"][0] | self._arrived(T, st)


class IntersectionEnv(_IntersectionBase):
    """Intersection-v0: longitudinal-only discrete control."""

    ACTION_MODE = "discrete3"

    def state_spec(self):
        return _kin_spec(15, 7)

    def _obs(self, st):
        obs = self._kinematics(
            st, 15,
            ["presence", "x", "y", "vx", "vy", "cos_h", "sin_h"],
            absolute=True, include_obstacles=False,
            x_rng=(-100.0, 100.0), y_rng=(-100.0, 100.0),
            v_rng=(-20.0, 20.0))
        return {"obs": obs, **self._common_info(st)}


class IntersectionContinuousEnv(_IntersectionBase):
    """Intersection-v1 (see the reference-quirk note in net_scenarios)."""

    ACTION_MODE = "continuous2"

    def state_spec(self):
        return _kin_spec(5, 8)

    def _obs(self, st):
        obs = self._kinematics(
            st, 5,
            ["presence", "x", "y", "vx", "vy",
             "long_off", "lat_off", "ang_off"])
        return {"obs": obs, **self._common_info(st)}


class IntersectionMultiAgentEnv(_IntersectionBase):
    """IntersectionMultiAgent-v0/v1: two MDP egos with per-player
    longitudinal actions/obs/rewards (native_task_env.h:446-466,
    929-956)."""

    SCENARIO = "intersection_multi"
    ACTION_MODE = "multi3"
    _KIN = ["presence", "x", "y", "vx", "vy"]

    def _ego_rows(self):
        return jnp.asarray([0, 1], jnp.int32)

    def state_spec(self):
        return {
            "obs:players.obs": ArraySpec(jnp.float32, (-1, 5, 5),
                                         -_INF, _INF),
            "info:players.speed": ArraySpec(jnp.float32, (-1,)),
            "info:players.crashed": ArraySpec(jnp.bool_, (-1,)),
        }

    def _obs(self, st):
        obs_p = jnp.stack(
            [self._kinematics(st, 5, self._KIN, observer=i)
             for i in range(2)])
        return {
            "obs:players.obs": obs_p,
            "info:players.speed": st["speed"][:2].astype(jnp.float32),
            "info:players.crashed": st["crashed"][:2],
        }

    def _reward(self, T, veh, st):
        rewards = []
        for p in range(2):
            speed_r = jnp.clip(lmap(st["speed"][p], 7.0, 9.0, 0.0, 1.0),
                               0.0, 1.0)
            onr = on_lane(T, st["lane"][p], st["pos"][p])
            base = (-5.0 * st["crashed"][p] + speed_r) * onr
            rewards.append(jnp.where(self._arrived(T, st, p), 1.0, base))
        return jnp.stack(rewards)

    def _terminated(self, T, veh, st):
        any_crashed = st["crashed"][0] | st["crashed"][1]
        all_arrived = self._arrived(T, st, 0) & self._arrived(T, st, 1)
        return any_crashed | all_arrived


class RacetrackEnv(NetworkScenarioEnv):
    """Racetrack-v0: continuous steering, occupancy-grid observation."""

    SCENARIO = "racetrack"
    ACTION_MODE = "steer"
    DEFAULT_CONFIG = dict(NetworkScenarioEnv.DEFAULT_CONFIG,
                          duration=300, policy_frequency=5)

    def state_spec(self):
        return {
            "obs": ArraySpec(jnp.float32, (2, 12, 12), -_INF, _INF),
            "info:speed": ArraySpec(jnp.float32, ()),
            "info:crashed": ArraySpec(jnp.bool_, ()),
        }

    def _obs(self, st):
        return {"obs": self._occupancy(st), **self._common_info(st)}

    def _reward(self, T, veh, st):
        _, lat = lane_local(T, st["lane"][0], st["pos"][0])
        centering = 1.0 / (1.0 + 4.0 * lat * lat)
        weighted = centering - 0.3 * st["last_steer"] - st["crashed"][0]
        return lmap(weighted, -1.0, 1.0, 0.0, 1.0) * self._on_road(T, st)

    def _terminated(self, T, veh, st):
        return st["crashed"][0] | ~self._on_road(T, st)


class RacetrackLargeEnv(RacetrackEnv):
    SCENARIO = "racetrack_large"


class RacetrackOvalEnv(RacetrackEnv):
    SCENARIO = "racetrack_oval"
