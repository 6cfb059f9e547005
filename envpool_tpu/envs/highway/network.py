"""Lane-network core for the highway family's curved-road scenarios.

Behavioral reference: EnvPool's native highway backend —
``envpool/highway/official_lane.cc`` (straight / circular / sine lane
geometry), ``official_road.cc`` (road network, closest-lane assignment,
route following), ``official_vehicle.cc`` (kinematic bicycle, MDP
meta-actions, steering/speed control), ``official_scene.cc`` (IDM,
MOBIL, collision handling, regulated-intersection yielding).

TPU-native design: the road network is a *static table of lanes* (struct
of arrays over a lane axis ``K``), built once per scenario in numpy and
closed over by the jitted step.  All geometry queries — position,
local coordinates, heading — are computed for every lane kind and
selected with ``jnp.where``, so per-vehicle lane lookups become gathers.
Vehicles are a fixed-shape array program over a vehicle axis ``V``
(row 0 [and 1 for multi-agent] = controlled; the rest IDM traffic or
static obstacles); neighbour queries project *all* vehicles into the
query lane's frame (a [V, V] reduction), exactly mirroring
``RoadNeighbors`` (official_scene.cc:287-326).

Documented deviations (same policy as ``straight.py``): traffic
decisions are evaluated synchronously from the pre-tick state rather
than sequentially over the vehicle list; the regulated-intersection
conflict test uses the constant-speed *current-lane* projection instead
of the 11-point route rollout (official_scene.cc:368-401); RNG is
counter-based ``jax.random``.
"""

from __future__ import annotations

import math
from collections import OrderedDict

import numpy as np
import jax
import jax.numpy as jnp

_PI = math.pi
LANE_W = 4.0
VEH_LEN = 5.0
VEH_WID = 2.0
MAX_SPEED = 40.0
MIN_SPEED = -40.0
PERCEPTION = 5.0 * MAX_SPEED

_KP_A = 1.0 / 0.6
_KP_HEADING = 1.0 / 0.2
_KP_LATERAL = 1.0 / 0.6
_TAU_PURSUIT = 0.5 * 0.2
_MAX_STEER = _PI / 3.0
_LC_DELAY = 1.0
_LC_MAX_BRAKING = 2.0
_LC_MIN_ACC_GAIN = 0.2

STRAIGHT, CIRCULAR, SINE = 0, 1, 2
K_MDP, K_IDM, K_OBSTACLE, K_PLAIN = 0, 1, 2, 3


def _notzero(x):
    return jnp.where(jnp.abs(x) > 1e-2, x, jnp.where(x >= 0, 1e-2, -1e-2))


def wrap_pi(x):
    return (x + _PI) % (2.0 * _PI) - _PI


def lmap(v, x0, x1, y0, y1):
    return y0 + (v - x0) * (y1 - y0) / (x1 - x0)


# ---------------------------------------------------------------------------
# Static road construction (numpy)
# ---------------------------------------------------------------------------


class RoadBuilder:
    """Builds the static lane table (``official_road.cc::AddLane``)."""

    def __init__(self):
        self._lanes = []          # list of per-lane param dicts
        self._edges = OrderedDict()   # (from,to) -> [lane indices]

    # -- lane constructors (official_lane.cc:45-95) --

    def straight(self, frm, to, start, end, width=LANE_W, forbidden=False,
                 speed_limit=20.0, priority=0):
        start = np.asarray(start, np.float64)
        end = np.asarray(end, np.float64)
        length = float(np.linalg.norm(end - start))
        d = (end - start) / length
        self._add(frm, to, dict(
            kind=STRAIGHT, start=start, direction=d,
            dirlat=np.array([-d[1], d[0]]), heading=math.atan2(d[1], d[0]),
            length=length, width=width, forbidden=forbidden,
            speed_limit=speed_limit, priority=priority,
            amp=0.0, puls=0.0, phase=0.0,
            center=np.zeros(2), radius=1.0, sphase=0.0, cdir=1.0))
        return self

    def sine(self, frm, to, start, end, amplitude, pulsation, phase,
             width=LANE_W, forbidden=False, speed_limit=20.0, priority=0):
        self.straight(frm, to, start, end, width, forbidden, speed_limit,
                      priority)
        self._lanes[-1].update(kind=SINE, amp=amplitude, puls=pulsation,
                               phase=phase)
        return self

    def circular(self, frm, to, center, radius, start_phase, end_phase,
                 clockwise, width=LANE_W, forbidden=False, speed_limit=20.0,
                 priority=0):
        cdir = 1.0 if clockwise else -1.0
        length = radius * (end_phase - start_phase) * cdir
        self._add(frm, to, dict(
            kind=CIRCULAR, start=np.zeros(2), direction=np.array([1.0, 0.0]),
            dirlat=np.array([0.0, 1.0]), heading=0.0, length=length,
            width=width, forbidden=forbidden, speed_limit=speed_limit,
            priority=priority, amp=0.0, puls=0.0, phase=0.0,
            center=np.asarray(center, np.float64), radius=radius,
            sphase=start_phase, cdir=cdir))
        return self

    def _add(self, frm, to, lane):
        self._edges.setdefault((frm, to), []).append(len(self._lanes))
        lane["edge"] = (frm, to)
        self._lanes.append(lane)

    # -- numpy geometry for build-time route resolution --

    def _np_position(self, k, s, lat=0.0):
        ln = self._lanes[k]
        if ln["kind"] == CIRCULAR:
            phi = ln["cdir"] * s / ln["radius"] + ln["sphase"]
            r = ln["radius"] - lat * ln["cdir"]
            return ln["center"] + r * np.array([math.cos(phi), math.sin(phi)])
        off = ln["amp"] * math.sin(ln["puls"] * s + ln["phase"]) \
            if ln["kind"] == SINE else 0.0
        return ln["start"] + s * ln["direction"] + (lat + off) * ln["dirlat"]

    def _np_heading(self, k, s):
        ln = self._lanes[k]
        if ln["kind"] == CIRCULAR:
            phi = ln["cdir"] * s / ln["radius"] + ln["sphase"]
            return phi + _PI / 2.0 * ln["cdir"]
        if ln["kind"] == SINE:
            return ln["heading"] + math.atan(
                ln["amp"] * ln["puls"]
                * math.cos(ln["puls"] * s + ln["phase"]))
        return ln["heading"]

    def _np_distance(self, k, pos):
        ln = self._lanes[k]
        if ln["kind"] == CIRCULAR:
            delta = pos - ln["center"]
            phi = math.atan2(delta[1], delta[0])
            phi = ln["sphase"] + float(wrap_pi(phi - ln["sphase"]))
            s = ln["cdir"] * (phi - ln["sphase"]) * ln["radius"]
            lat = ln["cdir"] * (ln["radius"] - np.linalg.norm(delta))
        else:
            delta = pos - ln["start"]
            s = float(delta @ ln["direction"])
            lat = float(delta @ ln["dirlat"])
            if ln["kind"] == SINE:
                lat -= ln["amp"] * math.sin(ln["puls"] * s + ln["phase"])
        return abs(lat) + max(s - ln["length"], 0.0) + max(-s, 0.0)

    def shortest_path(self, start, goal):
        """BFS over edge nodes (official_road.cc:228-251)."""
        queue = [[start]]
        while queue:
            path = queue.pop(0)
            for (f, t) in self._edges:
                if f != path[-1] or t in path:
                    continue
                if t == goal:
                    return path + [t]
                queue.append(path + [t])
        return []

    def default_next(self, k):
        """Geometric successor of lane k (official_road.cc:93-135)."""
        _, to = self._lanes[k]["edge"]
        end = self._np_position(k, self._lanes[k]["length"], 0.0)
        best, best_d = k, None
        for (f, t), ids in self._edges.items():
            if f != to:
                continue
            cur = self._edges[self._lanes[k]["edge"]]
            if len(ids) == len(cur):
                cand = [ids[cur.index(k)]]
            else:
                cand = ids
            for c in cand:
                d = self._np_distance(c, end)
                if best_d is None or d < best_d:
                    best, best_d = c, d
        return best

    def route_next(self, k, dest):
        """Successor of lane k on the shortest path to node ``dest``."""
        _, to = self._lanes[k]["edge"]
        path = self.shortest_path(to, dest)
        if len(path) < 2:
            return self.default_next(k)
        nxt_edge = (path[0], path[1])
        ids = self._edges[nxt_edge]
        cur = self._edges[self._lanes[k]["edge"]]
        if len(ids) == len(cur):
            return ids[cur.index(k)]
        end = self._np_position(k, self._lanes[k]["length"], 0.0)
        return min(ids, key=lambda c: self._np_distance(c, end))

    def lane_table(self):
        """Pack the lane list into a struct-of-arrays dict (numpy)."""
        K = len(self._lanes)
        tab = {
            "kind": np.array([l["kind"] for l in self._lanes], np.int32),
            "start": np.stack([l["start"] for l in self._lanes]),
            "dir": np.stack([l["direction"] for l in self._lanes]),
            "dirlat": np.stack([l["dirlat"] for l in self._lanes]),
            "heading": np.array([l["heading"] for l in self._lanes]),
            "length": np.array([l["length"] for l in self._lanes]),
            "width": np.array([l["width"] for l in self._lanes]),
            "speed_limit": np.array(
                [l["speed_limit"] for l in self._lanes]),
            "priority": np.array(
                [l["priority"] for l in self._lanes], np.int32),
            "forbidden": np.array(
                [l["forbidden"] for l in self._lanes], bool),
            "amp": np.array([l["amp"] for l in self._lanes]),
            "puls": np.array([l["puls"] for l in self._lanes]),
            "phase": np.array([l["phase"] for l in self._lanes]),
            "center": np.stack([l["center"] for l in self._lanes]),
            "radius": np.array([l["radius"] for l in self._lanes]),
            "sphase": np.array([l["sphase"] for l in self._lanes]),
            "cdir": np.array([l["cdir"] for l in self._lanes]),
        }
        # Segment (edge) grouping for side-lane moves / AllSideLanes.
        lane_id = np.zeros(K, np.int32)
        seg_count = np.zeros(K, np.int32)
        seg_idx = np.zeros(K, np.int32)
        # Lane index of id j in my segment (or -1): [K, max_ids]
        for si, ((f, t), ids) in enumerate(self._edges.items()):
            for j, k in enumerate(ids):
                lane_id[k] = j
                seg_count[k] = len(ids)
                seg_idx[k] = si
        max_ids = max(len(ids) for ids in self._edges.values())
        seg_lane = -np.ones((K, max_ids), np.int32)
        for (f, t), ids in self._edges.items():
            for k in ids:
                for j, kk in enumerate(ids):
                    seg_lane[k, j] = kk
        tab["lane_id"] = lane_id
        tab["seg_count"] = seg_count
        tab["seg_idx"] = seg_idx
        tab["seg_lane"] = seg_lane
        # Segment-level connectivity within 3 hops (IsConnectedRoad,
        # official_road.cc:170-196, route arg over-approximated by all
        # outgoing edges).
        S = len(self._edges)
        edges = list(self._edges)
        adj = np.zeros((S, S), bool)
        for i, (f1, t1) in enumerate(edges):
            for j, (f2, t2) in enumerate(edges):
                if t1 == f2:
                    adj[i, j] = True
        conn = np.eye(S, dtype=bool) | adj
        reach = conn.copy()
        for _ in range(2):
            reach = reach | (reach @ adj)
        conn_seg = reach | adj
        tab["conn_seg"] = conn_seg
        return tab


# ---------------------------------------------------------------------------
# Vectorized lane geometry (jnp; mirrors official_lane.cc:97-160)
# ---------------------------------------------------------------------------


def lane_position(T, lane, s, lat):
    kind = T["kind"][lane]
    off = T["amp"][lane] * jnp.sin(T["puls"][lane] * s + T["phase"][lane])
    lat_s = lat + jnp.where(kind == SINE, off, 0.0)
    p_str = (T["start"][lane] + s[..., None] * T["dir"][lane]
             + lat_s[..., None] * T["dirlat"][lane])
    phi = T["cdir"][lane] * s / T["radius"][lane] + T["sphase"][lane]
    r = T["radius"][lane] - lat * T["cdir"][lane]
    p_circ = T["center"][lane] + jnp.stack(
        [r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)
    return jnp.where((kind == CIRCULAR)[..., None], p_circ, p_str)


def lane_local(T, lane, pos):
    """(longitudinal, lateral) of ``pos`` in ``lane``'s frame."""
    kind = T["kind"][lane]
    delta = pos - T["start"][lane]
    s_str = jnp.sum(delta * T["dir"][lane], -1)
    lat_str = jnp.sum(delta * T["dirlat"][lane], -1)
    lat_str = lat_str - jnp.where(
        kind == SINE,
        T["amp"][lane] * jnp.sin(T["puls"][lane] * s_str + T["phase"][lane]),
        0.0)
    dc = pos - T["center"][lane]
    phi = jnp.arctan2(dc[..., 1], dc[..., 0])
    phi = T["sphase"][lane] + wrap_pi(phi - T["sphase"][lane])
    s_circ = T["cdir"][lane] * (phi - T["sphase"][lane]) * T["radius"][lane]
    lat_circ = T["cdir"][lane] * (
        T["radius"][lane] - jnp.linalg.norm(dc, axis=-1))
    s = jnp.where(kind == CIRCULAR, s_circ, s_str)
    lat = jnp.where(kind == CIRCULAR, lat_circ, lat_str)
    return s, lat


def lane_heading_at(T, lane, s):
    kind = T["kind"][lane]
    h_sine = T["heading"][lane] + jnp.arctan(
        T["amp"][lane] * T["puls"][lane]
        * jnp.cos(T["puls"][lane] * s + T["phase"][lane]))
    h_str = jnp.where(kind == SINE, h_sine, T["heading"][lane])
    phi = T["cdir"][lane] * s / T["radius"][lane] + T["sphase"][lane]
    h_circ = phi + _PI / 2.0 * T["cdir"][lane]
    return jnp.where(kind == CIRCULAR, h_circ, h_str)


def lane_distance(T, lane, pos, heading=None, heading_weight=1.0):
    s, lat = lane_local(T, lane, pos)
    d = (jnp.abs(lat) + jnp.maximum(s - T["length"][lane], 0.0)
         + jnp.maximum(-s, 0.0))
    if heading is not None:
        angle = jnp.abs(wrap_pi(heading - lane_heading_at(T, lane, s)))
        d = d + heading_weight * angle
    return d


def closest_lane(T, pos, heading):
    """argmin DistanceWithHeading over all K lanes (GetClosestLaneIndex)."""
    K = T["kind"].shape[0]
    ks = jnp.arange(K)
    d = lane_distance(T, ks, pos[..., None, :],
                      None if heading is None else heading[..., None])
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


def on_lane(T, lane, pos, margin=0.0):
    s, lat = lane_local(T, lane, pos)
    return ((jnp.abs(lat) <= T["width"][lane] / 2.0 + margin)
            & (s >= -VEH_LEN) & (s < T["length"][lane] + VEH_LEN))


def is_reachable(T, lane, pos):
    s, lat = lane_local(T, lane, pos)
    return (~T["forbidden"][lane]
            & (jnp.abs(lat) <= 2.0 * T["width"][lane])
            & (s >= 0.0) & (s < T["length"][lane] + VEH_LEN))


def after_end(T, lane, pos):
    s, _ = lane_local(T, lane, pos)
    return s > T["length"][lane] - VEH_LEN / 2.0


# ---------------------------------------------------------------------------
# Controls (official_vehicle.cc:229-263)
# ---------------------------------------------------------------------------


def steering_control(T, target_lane, pos, heading, speed):
    s, lat = lane_local(T, target_lane, pos)
    lane_future_heading = lane_heading_at(
        T, target_lane, s + speed * _TAU_PURSUIT)
    lat_cmd = -_KP_LATERAL * lat
    heading_cmd = jnp.arcsin(jnp.clip(lat_cmd / _notzero(speed), -1.0, 1.0))
    heading_ref = lane_future_heading + jnp.clip(
        heading_cmd, -_PI / 4.0, _PI / 4.0)
    rate_cmd = _KP_HEADING * wrap_pi(heading_ref - heading)
    slip = jnp.arcsin(jnp.clip(
        VEH_LEN / 2.0 / _notzero(speed) * rate_cmd, -1.0, 1.0))
    return jnp.clip(jnp.arctan(2.0 * jnp.tan(slip)), -_MAX_STEER, _MAX_STEER)


def speed_to_index(target_speeds, speed):
    span = target_speeds[-1] - target_speeds[0]
    x = (speed - target_speeds[0]) / span
    n = target_speeds.shape[0]
    return jnp.clip(jnp.round(x * (n - 1)).astype(jnp.int32), 0, n - 1)


# ---------------------------------------------------------------------------
# Collision (rotated-rect SAT, shared shape with straight.py::_collide)
# ---------------------------------------------------------------------------


def collide(x, y, heading, vx, vy, length, width, dt, pair_mask):
    """crashed_now [V] via batched SAT with velocity lookahead.

    Vectorizes ``BoxesCollide`` (official_scene.cc:150-220) over all
    pairs; per-row box dims support obstacle rows.
    """
    v = x.shape[0]
    c, s = jnp.cos(heading), jnp.sin(heading)
    hl, hw = length / 2.0, width / 2.0          # [V] per-row half-dims
    dispx, dispy = vx * dt, vy * dt
    # Closed-form OBB SAT (projection radii, no corner enumeration):
    # the corner-projection einsums materialized [B,V,V,4,4] tensors and
    # dominated TPU step time (see straight.py::_collide).
    dxm = x[None, :] - x[:, None]
    dym = y[None, :] - y[:, None]
    ddx = dispx[:, None] - dispx[None, :]
    ddy = dispy[:, None] - dispy[None, :]
    ci, si = c[:, None], s[:, None]
    cj, sj = c[None, :], s[None, :]
    acosd = jnp.abs(ci * cj + si * sj)
    asind = jnp.abs(si * cj - ci * sj)
    hli, hwi = hl[:, None], hw[:, None]
    hlj, hwj = hl[None, :], hw[None, :]
    axes_list = (
        (ci, si, hli, hlj * acosd + hwj * asind),   # dir_i
        (-si, ci, hwi, hlj * asind + hwj * acosd),  # perp_i
        (cj, sj, hli * acosd + hwi * asind, hlj),   # dir_j
        (-sj, cj, hli * asind + hwi * acosd, hwj),  # perp_j
    )
    will_intersect = jnp.ones((v, v), bool)
    for ux, uy, ri, rj in axes_list:
        p = ux * dxm + uy * dym
        vp = ux * ddx + uy * ddy
        al = -ri + jnp.minimum(vp, 0.0)
        ah = ri + jnp.maximum(vp, 0.0)
        dist_dyn = jnp.where(al < p - rj, p - rj - ah, al - (p + rj))
        will_intersect = will_intersect & (dist_dyn <= 0.0)
    diag = jnp.sqrt(length**2 + width**2)
    dist_centers = jnp.sqrt(dxm**2 + dym**2)
    near = (dist_centers
            <= (diag[:, None] + diag[None, :]) / 2.0
            + jnp.sqrt(dispx**2 + dispy**2)[:, None] + 1.0)
    pair = pair_mask & ~jnp.eye(v, dtype=bool) & near
    return (pair & will_intersect).any(1)
