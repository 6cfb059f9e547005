"""Highway lane-network scenarios: Merge/Exit/TwoWay/UTurn/Roundabout/
Intersection(+Continuous,+MultiAgent)/Racetrack(+Large,+Oval).

Behavioral reference (road layouts, traffic seeds, rewards, obs specs):
``envpool/highway/official_task.cc`` (Make*Road / Reset*Vehicles),
``envpool/highway/native_task_env.h`` (OfficialReward, obs writers,
termination), ``envpool/highway/official_observation.cc``
(ObserveKinematics / ObserveTimeToCollision).

See ``network.py`` for the TPU-native design notes and documented
deviations.  One reference quirk replicated on purpose: for
``Intersection-v1`` the C++ applies the continuous low-level action and
then immediately overwrites it with the MDP autopilot inside
``Road::Act`` (native_task_env.h:1004-1023 + official_scene.cc:433-444),
so the ego effectively drives itself; we mirror that behavior.
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec
from .network import (
    CIRCULAR, K_IDM, K_MDP, K_OBSTACLE, K_PLAIN, LANE_W, MAX_SPEED,
    MIN_SPEED, PERCEPTION, RoadBuilder, VEH_LEN, VEH_WID, after_end,
    closest_lane, collide, is_reachable, lane_distance, lane_heading_at,
    lane_local, lane_position, lmap, on_lane, speed_to_index,
    steering_control, wrap_pi, _notzero,
)

_PI = math.pi


# ---------------------------------------------------------------------------
# Scenario builders (numpy; mirror official_task.cc)
# ---------------------------------------------------------------------------


def _veh(kind, lane, s, speed, target_speed=None, dest=None, enable_lc=True,
         dist_wanted=10.0, cmf_max=3.0, cmf_min=-5.0, length=VEH_LEN,
         width=VEH_WID, s_noise=(0.0, 0.0), v_noise=(0.0, 0.0), lat=0.0,
         heading=None, pos=None):
    return dict(kind=kind, lane=lane, s=s, speed=speed,
                target_speed=speed if target_speed is None else target_speed,
                dest=dest, enable_lc=enable_lc, dist_wanted=dist_wanted,
                cmf_max=cmf_max, cmf_min=cmf_min, length=length, width=width,
                s_noise=s_noise, v_noise=v_noise, lat=lat, heading=heading,
                pos=pos)


def _build_merge():
    """official_task.cc:126-192 (MakeMergeRoad / ResetMergeVehicles)."""
    b = RoadBuilder()
    ends = [150.0, 80.0, 80.0, 150.0]
    for lane in range(2):
        y = lane * LANE_W
        b.straight("a", "b", (0, y), (230, y))
        b.straight("b", "c", (230, y), (310, y))
        b.straight("c", "d", (310, y), (460, y))
    amp = 3.25
    b.straight("j", "k", (0, 14.5), (150, 14.5), forbidden=True)
    w = 2 * _PI / (2 * ends[1])
    # lkb: sine from ljk.Position(150,-amp) to ljk.Position(230,-amp)
    b.sine("k", "b", (150, 14.5 - amp), (230, 14.5 - amp), amp, w, _PI / 2,
           forbidden=True)
    lbc_start = b._np_position(len(b._lanes) - 1, 80.0, 0.0)
    b.straight("b", "c", tuple(lbc_start), (lbc_start[0] + 80, lbc_start[1]),
               forbidden=True)
    obstacle_pos = (lbc_start[0] + 80, lbc_start[1])
    lane_ab1 = b._edges[("a", "b")][1]
    lane_jk = b._edges[("j", "k")][0]
    vehicles = [
        _veh(K_MDP, lane_ab1, 30.0, 30.0, 30.0),
        _veh(K_IDM, lane_ab1, 90.0, 29.0, s_noise=(-5, 5), v_noise=(-1, 1)),
        _veh(K_IDM, lane_ab1, 70.0, 31.0, s_noise=(-5, 5), v_noise=(-1, 1)),
        _veh(K_IDM, lane_ab1, 5.0, 31.5, s_noise=(-5, 5), v_noise=(-1, 1)),
        _veh(K_IDM, lane_jk, 110.0, 20.0, 30.0),
        _veh(K_OBSTACLE, 0, 0.0, 0.0, length=2.0, width=2.0,
             pos=obstacle_pos),
    ]
    return b, vehicles, dict(ego_target_speeds=(20.0, 25.0, 30.0),
                             ego_speed_index=2,
                             merge_lane=b._edges[("b", "c")][2])


def _build_two_way():
    """official_task.cc:336-386."""
    b = RoadBuilder()
    b.straight("a", "b", (0, 0), (800, 0))
    b.straight("a", "b", (0, LANE_W), (800, LANE_W))
    b.straight("b", "a", (800, 0), (0, 0))
    ab1 = b._edges[("a", "b")][1]
    ba0 = b._edges[("b", "a")][0]
    vehicles = [_veh(K_MDP, ab1, 30.0, 30.0, 30.0)]
    for i in range(3):
        vehicles.append(_veh(K_IDM, ab1, 70.0 + 40.0 * i, 24.0,
                             enable_lc=False))
    for i in range(2):
        vehicles.append(_veh(K_IDM, ba0, 200.0 + 100.0 * i, 20.0,
                             enable_lc=False))
    return b, vehicles, dict(ego_target_speeds=(20.0, 25.0, 30.0),
                             ego_speed_index=2)


def _build_u_turn():
    """official_task.cc:388-466."""
    b = RoadBuilder()
    length, radius = 128.0, 20.0
    center = (length, LANE_W + 20.0)
    b.straight("c", "d", (length, LANE_W), (0, LANE_W))
    b.straight("c", "d", (length, 0), (0, 0))
    for lane in range(2):
        b.circular("b", "c", center, radius + lane * LANE_W, _PI / 2,
                   -_PI / 2, False)
    y0 = 2 * LANE_W + 2 * radius - LANE_W
    b.straight("a", "b", (0, y0), (length, y0))
    b.straight("a", "b", (0, y0 + LANE_W), (length, y0 + LANE_W))
    ab, bc, cd = b._edges[("a", "b")], b._edges[("b", "c")], b._edges[("c", "d")]
    vehicles = [
        _veh(K_MDP, ab[0], 0.0, 16.0, 16.0, dest="d"),
        _veh(K_IDM, ab[0], 25.0, 13.5, dest="d"),
        _veh(K_IDM, ab[1], 56.0, 14.5, dest="d"),
        _veh(K_IDM, bc[1], 0.5, 4.5, dest="d"),
        _veh(K_IDM, bc[0], 17.5, 5.5, dest="d"),
        _veh(K_IDM, cd[0], 1.0, 3.5, dest="d"),
        _veh(K_IDM, cd[1], 30.0, 5.5, dest="d"),
    ]
    return b, vehicles, dict(ego_target_speeds=(8.0, 16.0, 24.0),
                             ego_speed_index=1)


def _build_exit():
    """official_task.cc:533-611."""
    b = RoadBuilder()
    exit_pos, exit_len, road_len = 400.0, 100.0, 1000.0

    def slimit(lane):
        return 26.0 - 3.4 * lane

    for seg, (x0, x1, lanes) in (("01", (0.0, exit_pos, 6)),
                                 ("12", (exit_pos, exit_pos + exit_len, 7)),
                                 ("23", (exit_pos + exit_len, road_len, 6))):
        for lane in range(lanes):
            y = lane * LANE_W
            b.straight(seg[0], seg[1], (x0, y), (x1, y),
                       speed_limit=slimit(lane))
    radius = 150.0
    exit_start = (exit_pos + exit_len, 6 * LANE_W)
    b.circular("2", "exit", (exit_start[0], exit_start[1] + radius), radius,
               3 * _PI / 2, 2 * _PI, True, forbidden=True)
    l01 = b._edges[("0", "1")]
    vehicles = [_veh(K_MDP, l01[0], 30.0, 25.0, 24.0)]
    for i in range(20):
        lane = 1 + (i % 5)
        vehicles.append(_veh(K_IDM, l01[lane], 45.0 + 18.0 * i, slimit(lane),
                             enable_lc=False, dest="3"))
    return b, vehicles, dict(
        ego_target_speeds=(18.0, 24.0, 30.0), ego_speed_index=1,
        exit_pre_lane=b._edges[("1", "2")][6],
        success_lanes=(b._edges[("1", "2")][6], b._edges[("2", "exit")][0]))


def _build_roundabout():
    """official_task.cc:196-340."""
    b = RoadBuilder()
    radius, alpha = 20.0, 24.0 * _PI / 180.0
    ring = [("se", "ex", _PI / 2 - alpha, alpha),
            ("ex", "ee", alpha, -alpha),
            ("ee", "nx", -alpha, -_PI / 2 + alpha),
            ("nx", "ne", -_PI / 2 + alpha, -_PI / 2 - alpha),
            ("ne", "wx", -_PI / 2 - alpha, -_PI + alpha),
            ("wx", "we", -_PI + alpha, -_PI - alpha),
            ("we", "sx", _PI - alpha, _PI / 2 + alpha),
            ("sx", "se", _PI / 2 + alpha, _PI / 2 - alpha)]
    for lane in range(2):
        for f, t, p0, p1 in ring:
            b.circular(f, t, (0, 0), radius + 4.0 * lane, p0, p1, False)
    access, dev, a = 170.0, 85.0, 5.0
    d_st = 0.2 * dev
    d_en = dev - d_st
    w = 2 * _PI / dev
    for (pre, mid, node, xnode, post,
         entry_s, entry_e, exit_s, exit_e) in (
            ("ser", "ses", "se", "sx", "sxr",
             ((2, access), (2, dev / 2)),
             ((2 + a, dev / 2), (2 + a, dev / 2 - d_st)),
             ((-2 - a, -dev / 2 + d_en), (-2 - a, dev / 2)),
             ((-2, dev / 2), (-2, access))),
            ("eer", "ees", "ee", "ex", "exr",
             ((access, -2), (dev / 2, -2)),
             ((dev / 2, -2 - a), (dev / 2 - d_st, -2 - a)),
             ((-dev / 2 + d_en, 2 + a), (dev / 2, 2 + a)),
             ((dev / 2, 2), (access, 2))),
            ("ner", "nes", "ne", "nx", "nxr",
             ((-2, -access), (-2, -dev / 2)),
             ((-2 - a, -dev / 2), (-2 - a, -dev / 2 + d_st)),
             ((2 + a, dev / 2 - d_en), (2 + a, -dev / 2)),
             ((2, -dev / 2), (2, -access))),
            ("wer", "wes", "we", "wx", "wxr",
             ((-access, 2), (-dev / 2, 2)),
             ((-dev / 2, 2 + a), (-dev / 2 + d_st, 2 + a)),
             ((dev / 2 - d_en, -2 - a), (-dev / 2, -2 - a)),
             ((-dev / 2, -2), (-access, -2)))):
        b.straight(pre, mid, entry_s[0], entry_s[1])
        b.sine(mid, node, entry_e[0], entry_e[1], a, w, -_PI / 2)
        b.sine(xnode, xnode + "s", exit_s[0], exit_s[1], a, w,
               -_PI / 2 + w * d_en)
        b.straight(xnode + "s", post, exit_e[0], exit_e[1])
    ser = b._edges[("ser", "ses")][0]
    wesx = b._edges[("we", "sx")]
    eer = b._edges[("eer", "ees")][0]
    vehicles = [
        _veh(K_MDP, ser, 125.0, 8.0, 8.0, dest="nxs"),
        _veh(K_IDM, wesx[1], 5.0, 16.0, dest="nxr"),
        _veh(K_IDM, wesx[0], 20.0, 16.0, dest="sxr"),
        _veh(K_IDM, wesx[0], -20.0, 16.0, dest="exr"),
        _veh(K_IDM, eer, 50.0, 16.0, dest="nxr"),
    ]
    return b, vehicles, dict(ego_target_speeds=(0.0, 8.0, 16.0),
                             ego_speed_index=1)


def _rot(p, angle):
    c, s = math.cos(angle), math.sin(angle)
    return (c * p[0] + s * p[1], -s * p[0] + c * p[1])


def _build_intersection(multi=False):
    """official_task.cc:613-744 (MakeIntersectionRoad + resets)."""
    b = RoadBuilder()
    lw = LANE_W
    rtr = lw + 5.0
    ltr = rtr + lw
    outer = rtr + lw / 2.0
    access = 100.0
    for corner in range(4):
        angle = _PI / 2 * corner
        prio = 3 if corner % 2 else 1
        c, pc, lc, sc = (str(corner), str((corner + 3) % 4),
                         str((corner + 1) % 4), str((corner + 2) % 4))
        b.straight("o" + c, "ir" + c, _rot((lw / 2, access + outer), angle),
                   _rot((lw / 2, outer), angle), speed_limit=10.0,
                   priority=prio)
        b.circular("ir" + c, "il" + pc, _rot((outer, outer), angle), rtr,
                   angle + _PI, angle + 3 * _PI / 2, True, speed_limit=10.0,
                   priority=prio)
        b.circular("ir" + c, "il" + lc,
                   _rot((-ltr + lw / 2, ltr - lw / 2), angle), ltr, angle,
                   angle - _PI / 2, False, speed_limit=10.0,
                   priority=prio - 1)
        b.straight("ir" + c, "il" + sc, _rot((lw / 2, outer), angle),
                   _rot((lw / 2, -outer), angle), speed_limit=10.0,
                   priority=prio)
        b.straight("il" + pc, "o" + pc, _rot((outer, lw / 2), angle),
                   _rot((access + outer, lw / 2), angle), speed_limit=10.0,
                   priority=prio)

    def idm(incoming, s, speed, dest):
        lane = b._edges[("o%d" % incoming, "ir%d" % incoming)][0]
        return _veh(K_IDM, lane, s, speed, dest=dest, dist_wanted=7.0,
                    cmf_max=6.0, cmf_min=-3.0)

    if multi:
        e0 = b._edges[("o0", "ir0")][0]
        e1 = b._edges[("o1", "ir1")][0]
        vehicles = [
            _veh(K_MDP, e0, 65.0, 10.0, 20.0, dest="o1"),
            _veh(K_MDP, e1, 66.0, 10.0, 20.0, dest="o1"),
            idm(2, 55.0, 8.5, "o0"),
            idm(3, 70.0, 7.5, "o1"),
        ]
        extras = dict(ego_target_speeds=(0.0, 4.5, 9.0), ego_speed_index=0,
                      n_players=2)
    else:
        e0 = b._edges[("o0", "ir0")][0]
        vehicles = [
            _veh(K_MDP, e0, 65.0, 10.0, 9.0, dest="o1"),
            idm(1, 32.0, 8.0, "o3"),
            idm(2, 44.0, 8.5, "o0"),
            idm(3, 56.0, 7.5, "o1"),
            idm(0, 85.0, 8.0, "o2"),
            idm(1, 74.0, 8.0, "o2"),
        ]
        extras = dict(ego_target_speeds=(0.0, 4.5, 9.0), ego_speed_index=2)
    extras["regulated"] = True
    # arrival lanes: il* -> o*
    arrived = np.zeros(len(b._lanes), bool)
    for (f, t), ids in b._edges.items():
        if f.startswith("il") and t.startswith("o"):
            for k in ids:
                arrived[k] = True
    extras["arrival_lanes"] = arrived
    return b, vehicles, extras


def _build_racetrack(variant):
    """official_task.cc:776-893."""
    b = RoadBuilder()
    lanes = 3 if variant in ("racetrack_large", "racetrack_oval") else 2
    start_x = 0.0 if variant == "racetrack_oval" else 42.0
    end_x = {"racetrack": 100.0, "racetrack_large": 200.0,
             "racetrack_oval": 101.0}[variant]
    width = 5.0
    for lane in range(lanes):
        b.straight("a", "b", (start_x, lane * width), (end_x, lane * width),
                   width=width, speed_limit=10.0)
    c1 = (200.0, -20.0) if variant == "racetrack_large" else (100.0, -20.0)
    end_phase = 0.0 if variant == "racetrack_oval" else -_PI / 180.0
    for lane in range(lanes):
        b.circular("b", "c", c1, 20.0 + lane * width, _PI / 2, end_phase,
                   False, width=width, speed_limit=10.0)
    if variant == "racetrack":
        d = _PI / 180.0
        b.straight("c", "d", (120, -20), (120, -30), width=width,
                   speed_limit=10.0)
        b.straight("c", "d", (125, -20), (125, -30), width=width,
                   speed_limit=10.0)
        b.circular("d", "e", (105, -30), 15.0, 0.0, -181 * d, False,
                   width=width, speed_limit=10.0)
        b.circular("d", "e", (105, -30), 20.0, 0.0, -181 * d, False,
                   width=width, speed_limit=10.0)
        b.circular("e", "f", (70, -30), 20.0, 0.0, 136 * d, True,
                   width=width, speed_limit=10.0)
        b.circular("e", "f", (70, -30), 15.0, 0.0, 137 * d, True,
                   width=width, speed_limit=10.0)
        b.straight("f", "g", (55.7, -15.7), (35.7, -35.7), width=width,
                   speed_limit=10.0)
        b.straight("f", "g", (59.3934, -19.2), (39.3934, -39.2), width=width,
                   speed_limit=10.0)
        b.circular("g", "h", (18.1, -18.1), 25.0, 315 * d, 170 * d, False,
                   width=width, speed_limit=10.0)
        b.circular("g", "h", (18.1, -18.1), 30.0, 315 * d, 165 * d, False,
                   width=width, speed_limit=10.0)
        b.circular("h", "i", (18.1, -18.1), 25.0, 170 * d, 56 * d, False,
                   width=width, speed_limit=10.0)
        b.circular("h", "i", (18.1, -18.1), 30.0, 170 * d, 58 * d, False,
                   width=width, speed_limit=10.0)
        b.circular("i", "a", (43.2, 23.4), 23.5, 240 * d, 270 * d, True,
                   width=width, speed_limit=10.0)
        b.circular("i", "a", (43.2, 23.4), 18.5, 238 * d, 268 * d, True,
                   width=width, speed_limit=10.0)
    s0 = {"racetrack": 48.0, "racetrack_oval": 50.0,
          "racetrack_large": 80.0}[variant]
    vehicles = [_veh(K_PLAIN, b._edges[("a", "b")][0], s0, 10.0)]
    return b, vehicles, dict(ego_target_speeds=(20.0, 25.0, 30.0),
                             ego_speed_index=0)


_BUILDERS = {
    "merge": _build_merge,
    "two_way": _build_two_way,
    "u_turn": _build_u_turn,
    "exit": _build_exit,
    "roundabout": _build_roundabout,
    "intersection": _build_intersection,
    "intersection_multi": lambda: _build_intersection(multi=True),
    "racetrack": lambda: _build_racetrack("racetrack"),
    "racetrack_large": lambda: _build_racetrack("racetrack_large"),
    "racetrack_oval": lambda: _build_racetrack("racetrack_oval"),
}

_STATIC_CACHE: dict[str, tuple] = {}


def _pack_scenario(name):
    """Build lane + vehicle tables once per scenario (numpy → jnp)."""
    if name in _STATIC_CACHE:
        return _STATIC_CACHE[name]
    b, vehicles, extras = _BUILDERS[name]()
    T = b.lane_table()
    K = len(b._lanes)
    V = len(vehicles)
    veh = {
        "kind": np.array([v["kind"] for v in vehicles], np.int32),
        "lane": np.array([v["lane"] for v in vehicles], np.int32),
        "s": np.array([v["s"] for v in vehicles]),
        "speed": np.array([v["speed"] for v in vehicles]),
        "tspeed": np.array([v["target_speed"] for v in vehicles]),
        "enable_lc": np.array([v["enable_lc"] for v in vehicles], bool),
        "dist_wanted": np.array([v["dist_wanted"] for v in vehicles]),
        "cmf_max": np.array([v["cmf_max"] for v in vehicles]),
        "cmf_min": np.array([v["cmf_min"] for v in vehicles]),
        "length": np.array([v["length"] for v in vehicles]),
        "width": np.array([v["width"] for v in vehicles]),
        "s_noise": np.array([v["s_noise"] for v in vehicles]),
        "v_noise": np.array([v["v_noise"] for v in vehicles]),
    }
    # Initial poses.
    pos = np.zeros((V, 2))
    heading = np.zeros(V)
    for i, v in enumerate(vehicles):
        if v["pos"] is not None:
            pos[i] = v["pos"]
        else:
            pos[i] = b._np_position(v["lane"], v["s"], v["lat"])
            heading[i] = (v["heading"] if v["heading"] is not None
                          else b._np_heading(v["lane"], v["s"]))
    veh["pos0"] = pos
    veh["heading0"] = heading
    # Per-vehicle successor table next_of[V, K] (route-aware).
    next_of = np.zeros((V, K), np.int32)
    for i, v in enumerate(vehicles):
        for k in range(K):
            if v["dest"] is not None:
                next_of[i, k] = b.route_next(k, v["dest"])
            else:
                next_of[i, k] = b.default_next(k)
    veh["next_of"] = next_of
    # Cache NUMPY arrays (a jit trace may build this lazily; caching
    # tracers would leak).  ``_static`` converts to jnp constants.
    _STATIC_CACHE[name] = (T, veh, extras)
    return _STATIC_CACHE[name]


# ---------------------------------------------------------------------------
# The generic network env
# ---------------------------------------------------------------------------


class NetworkScenarioEnv(TpuEnv):
    """Base env driving one lane-network scenario (native_task_env.h:552)."""

    SCENARIO = "merge"
    ACTION_MODE = "discrete5"  # discrete5 | discrete3 | continuous2 | steer
    DEFAULT_CONFIG: dict[str, Any] = {
        "duration": 40,
        "simulation_frequency": 15,
        "policy_frequency": 1,
        "reward_threshold": 0.0,
    }

    # -- static tables --

    @property
    def _static(self):
        T, veh, extras = _pack_scenario(self.SCENARIO)
        as_f32 = lambda x: jnp.asarray(  # noqa: E731
            x, jnp.float32 if np.issubdtype(np.asarray(x).dtype, np.floating)
            else None)
        return (jax.tree.map(as_f32, T), jax.tree.map(as_f32, veh), extras)

    @property
    def _n_frames(self):
        return max(1, int(self.config["simulation_frequency"])
                   // int(self.config["policy_frequency"]))

    # -- specs --

    def action_spec(self):
        if self.ACTION_MODE == "discrete5":
            return {"action": ArraySpec(jnp.int32, (), 0, 4,
                                        is_discrete=True)}
        if self.ACTION_MODE == "discrete3":
            return {"action": ArraySpec(jnp.int32, (), 0, 2,
                                        is_discrete=True)}
        if self.ACTION_MODE == "multi3":
            # One action row per player (players.action, 0..2 long.).
            return {"action": ArraySpec(jnp.int32, (-1,), 0, 2,
                                        is_discrete=True)}
        if self.ACTION_MODE == "continuous2":
            return {"action": ArraySpec(jnp.float32, (2,), -1.0, 1.0)}
        return {"action": ArraySpec(jnp.float32, (1,), -1.0, 1.0)}

    # -- reset --

    def reset_env(self, key):
        T, veh, extras = self._static
        k_s, k_v = jax.random.split(key)
        V = veh["kind"].shape[0]
        u_s = jax.random.uniform(k_s, (V,))
        u_v = jax.random.uniform(k_v, (V,))
        ds = veh["s_noise"][:, 0] + u_s * (
            veh["s_noise"][:, 1] - veh["s_noise"][:, 0])
        dv = veh["v_noise"][:, 0] + u_v * (
            veh["v_noise"][:, 1] - veh["v_noise"][:, 0])
        noisy = (jnp.abs(veh["s_noise"]).sum(-1) > 0)
        s0 = veh["s"] + ds
        pos = jnp.where(
            noisy[:, None],
            lane_position(T, veh["lane"], s0, jnp.zeros(V)),
            veh["pos0"])
        speed = veh["speed"] + dv
        st = {
            "pos": pos.astype(jnp.float32),
            "heading": veh["heading0"].astype(jnp.float32),
            "speed": speed.astype(jnp.float32),
            "lane": veh["lane"],
            "target_lane": veh["lane"],
            "target_speed": veh["tspeed"].astype(jnp.float32),
            "speed_index": jnp.int32(extras["ego_speed_index"]),
            "timer": jnp.mod(
                (pos[:, 0] + pos[:, 1]).astype(jnp.float32) * _PI, 1.0),
            "crashed": jnp.zeros(V, bool),
            "yielding": jnp.zeros(V, bool),
            "last_action": jnp.int32(1),
            "last_steer": jnp.float32(0.0),
            "reg_count": jnp.int32(45 if extras.get("regulated") else 0),
            "act_lowlevel": jnp.zeros(2, jnp.float32),
        }
        return st, self._obs(st)

    # -- shared machinery --

    def _dirs(self, st):
        return jnp.stack([jnp.cos(st["heading"]), jnp.sin(st["heading"])],
                         -1)

    def _vel(self, st):
        return st["speed"][:, None] * self._dirs(st)

    def _neighbors(self, T, st, q_lane):
        """front/rear per row in query lane ``q_lane`` [V].

        Mirrors RoadNeighbors (official_scene.cc:287-326): every other
        vehicle/obstacle is projected into the query lane's frame.
        """
        V = q_lane.shape[0]
        s_all, lat_all = lane_local(
            T, q_lane[:, None], st["pos"][None, :, :])  # [V, V]
        s_self, _ = lane_local(T, q_lane, st["pos"])
        width = T["width"][q_lane][:, None]
        ln = T["length"][q_lane][:, None]
        ok = ((jnp.abs(lat_all) <= width / 2.0 + 1.0)
              & (s_all >= -VEH_LEN) & (s_all < ln + VEH_LEN)
              & ~jnp.eye(V, dtype=bool))
        front_mask = ok & (s_all >= s_self[:, None])
        front_key = jnp.where(front_mask, s_all, jnp.inf)
        front_idx = jnp.argmin(front_key, 1)
        front_valid = front_mask.any(1)
        rear_mask = ok & (s_all < s_self[:, None])
        rear_key = jnp.where(rear_mask, s_all, -jnp.inf)
        rear_idx = jnp.argmax(rear_key, 1)
        rear_valid = rear_mask.any(1)
        return front_idx, front_valid, rear_idx, rear_valid

    def _idm_pair(self, T, st, veh, ego, ego_valid, front, front_valid,
                  ego_lane):
        """IDM acceleration of row ``ego`` following row ``front``.

        official_scene.cc:335-362 (DesiredGap / IDMAcceleration); target
        speed is clipped to the ego's *current* lane speed limit.
        """
        tspd = jnp.clip(st["target_speed"][ego], 0.0,
                        T["speed_limit"][ego_lane])
        spd = st["speed"][ego]
        cmf_max = veh["cmf_max"][ego]
        acc = cmf_max * (1.0 - jnp.power(
            jnp.maximum(spd, 0.0) / jnp.abs(_notzero(tspd)), 4.0))
        s_f, _ = lane_local(T, ego_lane, st["pos"][front])
        s_e, _ = lane_local(T, ego_lane, st["pos"][ego])
        d = s_f - s_e
        vel = self._vel(st)
        dvel = vel[ego] - vel[front]
        proj_dv = jnp.sum(dvel * self._dirs(st)[ego], -1)
        ab = -cmf_max * veh["cmf_min"][ego]
        gap = (veh["dist_wanted"][ego] + spd * 1.5
               + spd * proj_dv / (2.0 * jnp.sqrt(ab)))
        acc = acc - jnp.where(
            front_valid, cmf_max * (gap / _notzero(d)) ** 2, 0.0)
        return jnp.where(ego_valid, acc, 0.0)

    def _mobil(self, T, st, veh, cand_lane):
        """MOBIL (politeness 0) for every row to ``cand_lane`` [V]."""
        rows = jnp.arange(cand_lane.shape[0])
        ones = jnp.ones_like(rows, bool)
        nf, nfv, nr, nrv = self._neighbors(T, st, cand_lane)
        of, ofv, _, _ = self._neighbors(T, st, st["lane"])
        # Safety: new follower braking behind me (its own lane frame is
        # the candidate lane).
        new_follow_pred = self._idm_pair(
            T, st, veh, nr, nrv, rows, ones, cand_lane)
        safe = ~nrv | (new_follow_pred >= -2.0)
        self_pred = self._idm_pair(
            T, st, veh, rows, ones, nf, nfv, cand_lane)
        self_now = self._idm_pair(
            T, st, veh, rows, ones, of, ofv, st["lane"])
        return safe & (self_pred - self_now >= 0.2)

    def _substep(self, T, veh, st, dt, first_frame, meta_action):
        """One simulation frame (Road::Act + Road::Step)."""
        V = st["pos"].shape[0]
        rows = jnp.arange(V)
        is_idm = (veh["kind"] == K_IDM) & ~st["crashed"]
        is_mdp = veh["kind"] == K_MDP
        moving = (veh["kind"] != K_OBSTACLE)

        tl = st["target_lane"]
        ts = st["target_speed"]
        si = st["speed_index"]

        # --- MDP meta-action at frame 0 (ActMDP) ---
        tspeeds = jnp.asarray(
            self._static[2]["ego_target_speeds"], jnp.float32)
        ego = self._ego_rows()
        if meta_action is not None:
            a = meta_action  # scalar or [P]
            spd_ego = st["speed"][ego]
            idx = speed_to_index(tspeeds, spd_ego)
            faster = a == 3
            slower = a == 4
            idx2 = jnp.clip(
                idx + jnp.where(faster, 1, 0) - jnp.where(slower, 1, 0),
                0, tspeeds.shape[0] - 1)
            new_ts = jnp.where(faster | slower, tspeeds[idx2], ts[ego])
            ts = ts.at[ego].set(jnp.where(first_frame, new_ts, ts[ego]))
            si = jnp.where(
                first_frame & jnp.any(faster | slower),
                idx2.reshape(-1)[0], si)
            # LANE_LEFT / LANE_RIGHT on the segment of the target lane.
            delta = jnp.where(a == 2, 1, jnp.where(a == 0, -1, 0))
            cur_id = T["lane_id"][tl[ego]]
            cand_id = jnp.clip(cur_id + delta, 0,
                               T["seg_count"][tl[ego]] - 1)
            cand = T["seg_lane"][tl[ego], cand_id]
            reach = is_reachable(T, cand, st["pos"][ego])
            new_tl = jnp.where(((a == 0) | (a == 2)) & reach, cand, tl[ego])
            tl = tl.at[ego].set(jnp.where(first_frame, new_tl, tl[ego]))

        # --- FollowRoad (MDP + IDM) ---
        fr = is_idm | is_mdp
        adv = fr & after_end(T, tl, st["pos"])
        tl = jnp.where(adv, veh["next_of"][rows, tl], tl)

        # --- IDM lane-change policy (ChangeLanePolicy) ---
        lane = st["lane"]
        same_seg = T["seg_idx"][lane] == T["seg_idx"][tl]
        changing = (lane != tl)
        # Abort: someone else is merging into my target lane too close
        # ahead (official_scene.cc:559-578).
        s_t, _ = lane_local(T, lane[:, None], st["pos"][None, :, :])
        s_self_t, _ = lane_local(T, lane, st["pos"])
        d_others = s_t - s_self_t[:, None]
        vel = self._vel(st)
        proj_dv = jnp.sum(
            (vel[:, None] - vel[None, :]) * self._dirs(st)[:, None], -1)
        ab = -veh["cmf_max"] * veh["cmf_min"]
        gap = (veh["dist_wanted"][:, None] + st["speed"][:, None] * 1.5
               + st["speed"][:, None] * proj_dv
               / (2.0 * jnp.sqrt(ab))[:, None])
        conflict = ((st["lane"][None, :] != tl[:, None])
                    & (st["target_lane"][None, :] == tl[:, None])
                    & ~jnp.eye(V, dtype=bool)
                    & (d_others > 0.0) & (d_others < gap)).any(1)
        abort = is_idm & changing & same_seg & conflict
        tl = jnp.where(abort, lane, tl)

        may = (is_idm & veh["enable_lc"] & ~changing
               & (st["timer"] > 1.0))
        timer = jnp.where(may, 0.0, st["timer"])
        lane_id = T["lane_id"][lane]
        left = T["seg_lane"][lane, jnp.maximum(lane_id - 1, 0)]
        right = T["seg_lane"][
            lane, jnp.minimum(lane_id + 1, T["seg_count"][lane] - 1)]
        okspeed = jnp.abs(st["speed"]) >= 1.0

        def cand_ok(cand):
            return (may & (cand != lane) & okspeed
                    & is_reachable(T, cand, st["pos"])
                    & self._mobil(T, {**st, "target_lane": tl,
                                      "target_speed": ts}, veh, cand))

        left_ok = cand_ok(left)
        right_ok = cand_ok(right)  # right wins if both (C++ loop order)
        tl = jnp.where(left_ok, left, tl)
        tl = jnp.where(right_ok, right, tl)

        st2 = {**st, "target_lane": tl, "target_speed": ts, "timer": timer}

        # --- controls ---
        steer_auto = steering_control(
            T, tl, st["pos"], st["heading"], st["speed"])
        front, front_v, _, _ = self._neighbors(T, st2, lane)
        ones = jnp.ones(V, bool)
        acc_idm = self._idm_pair(T, st2, veh, rows, ones, front, front_v,
                                 lane)
        tfront, tfront_v, _, _ = self._neighbors(T, st2, tl)
        acc_idm_t = self._idm_pair(T, st2, veh, rows, ones, tfront,
                                   tfront_v, tl)
        acc_idm = jnp.where(lane != tl, jnp.minimum(acc_idm, acc_idm_t),
                            acc_idm)
        acc_idm = jnp.clip(acc_idm, -6.0, 6.0)
        acc_mdp = (1.0 / 0.6) * (ts - st["speed"])
        acc = jnp.where(is_idm, acc_idm, acc_mdp)
        steer = steer_auto
        if self.ACTION_MODE == "steer":  # plain-vehicle ego (racetrack)
            steer = steer.at[0].set(st["act_lowlevel"][1])
            acc = acc.at[0].set(st["act_lowlevel"][0])

        # crashed: decelerate (Vehicle::Step)
        steer = jnp.where(st["crashed"], 0.0, steer)
        acc = jnp.where(st["crashed"], -st["speed"], acc)
        acc = jnp.where(st["speed"] > MAX_SPEED,
                        jnp.minimum(acc, MAX_SPEED - st["speed"]), acc)
        acc = jnp.where(st["speed"] < MIN_SPEED,
                        jnp.maximum(acc, MIN_SPEED - st["speed"]), acc)
        acc = jnp.where(moving, acc, 0.0)

        # --- bicycle step ---
        beta = jnp.arctan(0.5 * jnp.tan(steer))
        bh = st["heading"] + beta
        vx = st["speed"] * jnp.cos(bh)
        vy = st["speed"] * jnp.sin(bh)
        pos = st["pos"] + jnp.stack([vx, vy], -1) * dt * moving[:, None]
        heading = st["heading"] + (
            st["speed"] * jnp.sin(beta) / (VEH_LEN / 2.0) * dt) * moving
        speed = st["speed"] + acc * dt

        crashed_now = collide(
            pos[:, 0], pos[:, 1], heading, vx, vy,
            veh["length"], veh["width"], dt,
            jnp.ones((V, V), bool))
        crashed = st["crashed"] | (crashed_now & moving)

        new_lane = closest_lane(T, pos, heading)
        new_lane = jnp.where(moving, new_lane, st["lane"])
        timer = timer + dt * is_idm

        out = {**st2, "pos": pos, "heading": heading, "speed": speed,
               "lane": new_lane, "crashed": crashed, "timer": timer,
               "speed_index": si}

        # --- regulated intersection yielding ---
        if self._static[2].get("regulated"):
            out = self._enforce_rules(T, veh, out, dt)
        return out

    def _ego_rows(self):
        return jnp.asarray([0], jnp.int32)

    def _enforce_rules(self, T, veh, st, dt):
        """Priority yielding every 0.5 s (official_scene.cc:452-476).

        Deviation (documented): conflict prediction uses straight-line
        constant-velocity extrapolation instead of the 11-point route
        rollout.
        """
        V = st["pos"].shape[0]
        cnt = st["reg_count"] + 1
        fire = (cnt % 7) == 0
        vel = self._vel(st)
        times = jnp.arange(1, 12, dtype=jnp.float32)[:, None, None] * 0.25
        future = st["pos"][None, :, :] + vel[None, :, :] * times  # [T,V,2]
        d = jnp.linalg.norm(future[:, :, None] - future[:, None], axis=-1)
        conflict = (d < VEH_LEN).any(0) & ~jnp.eye(V, dtype=bool)
        prio = T["priority"][st["lane"]]
        dirs = self._dirs(st)
        fwd = jnp.sum(
            dirs[:, None] * (st["pos"][None, :] - st["pos"][:, None]), -1)
        # yields[i, j]: in conflict (i, j), does i yield?  Lower lane
        # priority yields; ties: the follower yields (RespectPriorities).
        i_yields = jnp.where(
            prio[:, None] != prio[None, :],
            prio[:, None] < prio[None, :],
            fwd > fwd.T)
        can_yield = (veh["kind"] == K_IDM)
        yield_now = (conflict & i_yields).any(1) & can_yield
        reset = st["yielding"] & ~yield_now
        ts = jnp.where(fire & reset,
                       T["speed_limit"][st["lane"]], st["target_speed"])
        ts = jnp.where(fire & yield_now, 0.0, ts)
        yielding = jnp.where(fire, yield_now, st["yielding"])
        return {**st, "reg_count": cnt, "target_speed": ts,
                "yielding": yielding}

    # -- step --

    def step_env(self, state, action, key):
        T, veh, extras = self._static
        dt = 1.0 / float(self.config["simulation_frequency"])
        meta, st = self._read_action(state, action)
        st = dict(st)

        def body(carry, i):
            s = self._substep(T, veh, carry, dt, i == 0, meta)
            return s, 0.0

        st, _ = jax.lax.scan(body, st, jnp.arange(self._n_frames))
        reward = self._reward(T, veh, st).astype(jnp.float32)
        terminated = self._terminated(T, veh, st)
        return EnvOut(state=st, obs=self._obs(st), reward=reward,
                      terminated=terminated)

    def _read_action(self, st, action):
        if self.ACTION_MODE == "discrete5":
            a = jnp.clip(jnp.reshape(action, ()).astype(jnp.int32), 0, 4)
            st = {**st, "last_action": a}
            return a[None], st
        if self.ACTION_MODE == "discrete3":
            a = jnp.clip(jnp.reshape(action, ()).astype(jnp.int32), 0, 2)
            # 0 -> SLOWER(4), 1 -> IDLE(1), 2 -> FASTER(3)
            a = jnp.where(a == 0, 4, jnp.where(a == 2, 3, 1))
            st = {**st, "last_action": a}
            return a[None], st
        if self.ACTION_MODE == "multi3":
            p = self.max_num_players
            a = jnp.clip(jnp.reshape(action, (p,)).astype(jnp.int32), 0, 2)
            a = jnp.where(a == 0, 4, jnp.where(a == 2, 3, 1))
            st = {**st, "last_action": a[0]}
            return a, st
        if self.ACTION_MODE == "continuous2":
            a = jnp.clip(jnp.reshape(action, (2,)), -1.0, 1.0)
            st = {**st, "act_lowlevel": a,
                  "last_steer": jnp.abs(a[1])}
            # Reference quirk: MDP autopilot overrides the continuous
            # action (see module docstring) -> IDLE meta-action.
            return jnp.asarray([1], jnp.int32), st
        a = jnp.clip(jnp.reshape(action, (1,))[0], -1.0, 1.0)
        steer = a * (_PI / 4.0)
        st = {**st, "act_lowlevel": jnp.stack([jnp.float32(0.0), steer]),
              "last_steer": jnp.abs(a)}
        return None, st

    # -- observations --

    def _obs(self, st):
        raise NotImplementedError

    def _common_info(self, st):
        return {
            "info:speed": st["speed"][0].astype(jnp.float32),
            "info:crashed": st["crashed"][0],
        }

    def _kinematics(self, st, rows, feats, absolute=False, normalize=True,
                    clip=True, include_obstacles=True, x_rng=(-200.0, 200.0),
                    y_rng=None, v_rng=(-80.0, 80.0), ego_x_override=None,
                    observer=0):
        """ObserveKinematics (official_observation.cc:218-256)."""
        T, veh, extras = self._static
        V = st["pos"].shape[0]
        obs_i = observer
        ego_lane = st["lane"][obs_i]
        s_all, _ = lane_local(T, ego_lane, st["pos"])
        lane_dist = s_all - s_all[obs_i]
        euclid = jnp.linalg.norm(st["pos"] - st["pos"][obs_i], axis=-1)
        valid = (euclid < PERCEPTION) & (lane_dist > -2.0 * VEH_LEN)
        valid = valid & (jnp.arange(V) != obs_i)
        if not include_obstacles:
            valid = valid & (veh["kind"] != K_OBSTACLE)
        key = jnp.where(valid, jnp.abs(lane_dist), jnp.inf)
        order = jnp.argsort(key)

        vel = self._vel(st)
        if y_rng is None:
            n_side = T["seg_count"][ego_lane].astype(jnp.float32)
            y_lo, y_hi = -LANE_W * n_side, LANE_W * n_side
        else:
            y_lo, y_hi = y_rng

        def feature_rows(idx, rel):
            x = st["pos"][idx, 0] - (st["pos"][obs_i, 0] if rel else 0.0)
            y = st["pos"][idx, 1] - (st["pos"][obs_i, 1] if rel else 0.0)
            vx = vel[idx, 0] - (vel[obs_i, 0] if rel else 0.0)
            vy = vel[idx, 1] - (vel[obs_i, 1] if rel else 0.0)
            own_lane = st["lane"][idx]
            lo_s, lo_lat = lane_local(T, own_lane, st["pos"][idx])
            ang = wrap_pi(st["heading"][idx]
                          - lane_heading_at(T, own_lane, lo_s))
            table = {
                "presence": jnp.ones_like(x),
                "x": x, "y": y, "vx": vx, "vy": vy,
                "cos_h": jnp.cos(st["heading"][idx]),
                "sin_h": jnp.sin(st["heading"][idx]),
                "long_off": lo_s, "lat_off": lo_lat, "ang_off": ang,
            }
            if normalize:
                table["x"] = lmap(table["x"], x_rng[0], x_rng[1], -1, 1)
                table["y"] = lmap(table["y"], y_lo, y_hi, -1, 1)
                table["vx"] = lmap(table["vx"], v_rng[0], v_rng[1], -1, 1)
                table["vy"] = lmap(table["vy"], v_rng[0], v_rng[1], -1, 1)
                if clip:
                    for f in ("x", "y", "vx", "vy"):
                        table[f] = jnp.clip(table[f], -1.0, 1.0)
            return jnp.stack([table[f] for f in feats], -1)

        ego_feat = feature_rows(jnp.asarray(obs_i), rel=False)
        if ego_x_override is not None:
            ovr_s, _ = lane_local(
                T, jnp.int32(ego_x_override), st["pos"][obs_i])
            x_n = lmap(ovr_s, x_rng[0], x_rng[1], -1, 1) if normalize \
                else ovr_s
            ego_feat = ego_feat.at[feats.index("x")].set(x_n)
        other_feat = feature_rows(order, rel=not absolute)  # [V, F]
        other_valid = jnp.take(valid, order)
        other_feat = jnp.where(other_valid[:, None], other_feat, 0.0)
        out = jnp.concatenate([ego_feat[None], other_feat[: rows - 1]], 0)
        pad = rows - out.shape[0]
        if pad > 0:
            out = jnp.concatenate(
                [out, jnp.zeros((pad, out.shape[1]))], 0)
        return out.astype(jnp.float32)

    def _ttc(self, st, horizon):
        """ObserveTimeToCollision (official_observation.cc:258-330)."""
        T, veh, extras = self._static
        tspeeds = jnp.asarray(extras["ego_target_speeds"], jnp.float32)
        V = st["pos"].shape[0]
        ego_lane = st["lane"][0]
        ego_dir = self._dirs(st)[0]
        s_all, _ = lane_local(T, ego_lane, st["pos"])
        lane_dist = s_all - s_all[0]
        vel = self._vel(st)
        proj_speed = jnp.sum(vel * ego_dir, -1)
        conn = T["conn_seg"][T["seg_idx"][ego_lane], T["seg_idx"][st["lane"]]]
        other = (jnp.arange(V) != 0) & (veh["kind"] != K_OBSTACLE) & conn
        ego_nlanes = T["seg_count"][ego_lane]
        same_count = T["seg_count"][st["lane"]] == ego_nlanes
        own_col = T["lane_id"][st["lane"]]

        grid = jnp.zeros((3, 3, horizon), jnp.float32)
        margins = jnp.asarray([0.0, -VEH_LEN, VEH_LEN])
        costs = jnp.asarray([1.0, 0.5, 0.5])
        # [speed, vehicle, margin]
        dists = lane_dist[None, :, None] + margins[None, None, :]
        rel_v = tspeeds[:, None, None] - proj_speed[None, :, None]
        tti = dists / _notzero(rel_v)
        ok = (tti >= 0.0) & other[None, :, None]
        lane_cols = jnp.arange(3)
        col_hit = jnp.where(
            same_count[None, :],
            lane_cols[:, None] == own_col[None, :],
            lane_cols[:, None] < ego_nlanes)  # [3, V]
        tq = 1.0 / float(self.config["policy_frequency"])
        for t_idx in (jnp.floor(tti / tq).astype(jnp.int32),
                      jnp.ceil(tti / tq).astype(jnp.int32)):
            inrange = ok & (t_idx >= 0) & (t_idx < horizon)
            onehot_t = jax.nn.one_hot(
                jnp.clip(t_idx, 0, horizon - 1), horizon)  # [s,V,m,H]
            # cell value [s, l, v, m, h]: cost where the (v, m) pair
            # lands in (l, h); reduce with max (grid_at = max(...)).
            val = (jnp.where(inrange, costs[None, None, :], 0.0)
                   [:, None, :, :, None]
                   * onehot_t[:, None]
                   * col_hit.astype(jnp.float32)[None, :, :, None, None])
            grid = jnp.maximum(grid, val.max((2, 3)))
        return grid

    def _occupancy(self, st):
        """Occupancy grid [2,12,12] (native_task_env.h:1831-1881)."""
        T, veh, extras = self._static
        ego_pos, ego_h = st["pos"][0], st["heading"][0]
        c, s = jnp.cos(ego_h), jnp.sin(ego_h)

        def cell(p):
            d = p - ego_pos
            ax = c * d[..., 0] + s * d[..., 1]
            ay = -s * d[..., 0] + c * d[..., 1]
            i = jnp.floor((ax + 18.0) / 3.0).astype(jnp.int32)
            j = jnp.floor((ay + 18.0) / 3.0).astype(jnp.int32)
            okc = (i >= 0) & (i < 12) & (j >= 0) & (j < 12)
            return jnp.clip(i, 0, 11), jnp.clip(j, 0, 11), okc

        grid = jnp.zeros((2, 12, 12), jnp.float32)
        i, j, okc = cell(st["pos"])
        okc = okc & (veh["kind"] != K_OBSTACLE)
        grid = grid.at[0, i, j].max(okc.astype(jnp.float32))
        K = T["kind"].shape[0]
        ks = jnp.arange(K)
        origin, _ = lane_local(T, ks, ego_pos[None, :])
        wps = origin[:, None] + jnp.arange(-100.0, 100.0, 3.0)[None, :]
        wps = jnp.clip(wps, 0.0, T["length"][ks][:, None])
        pts = lane_position(T, ks[:, None], wps, jnp.zeros_like(wps))
        i, j, okc = cell(pts)
        grid = grid.at[1, i, j].max(okc.astype(jnp.float32))
        return grid

    # -- per-scenario hooks --

    def _reward(self, T, veh, st):
        raise NotImplementedError

    def _terminated(self, T, veh, st):
        return st["crashed"][0]

    def _on_road(self, T, st, row=0):
        return on_lane(T, st["lane"][row], st["pos"][row])
