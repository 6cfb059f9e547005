"""Scalar highway oracle — per-vehicle loop implementation of the
highway-v0 semantics (published highway-env behaviors: IDM longitudinal
control, MOBIL lane changes with politeness 0, kinematic bicycle,
rotated-rectangle collision with velocity lookahead; reference C++ at
``/root/reference/envpool/highway/highway_env.cc:312-958``).

Follows envpool_tpu's one documented semantic deviation (synchronous
traffic decisions from the pre-tick state, ``envs/highway/straight.py``
module docstring) but is otherwise written in the published package's
style: per-vehicle scans for neighbours, corner-enumeration SAT — which
independently cross-checks the repo's masked-reduction and closed-form
OBB formulations.
"""

from __future__ import annotations

import math

import numpy as np

PI = math.pi
LANE_WIDTH = 4.0
LANE_LENGTH = 10000.0
LENGTH = 5.0
WIDTH = 2.0
MAX_SPEED = 40.0
MIN_SPEED = -40.0
PERCEPTION = 5.0 * MAX_SPEED

KP_A = 1.0 / 0.6
KP_HEADING = 1.0 / 0.2
KP_LATERAL = 1.0 / 0.6
MAX_STEER = PI / 3.0

ACC_MAX = 6.0
COMFORT_ACC_MAX = 3.0
COMFORT_ACC_MIN = -5.0
DIST_WANTED = 5.0 + LENGTH
TIME_WANTED = 1.5
LC_MIN_ACC_GAIN = 0.2
LC_MAX_BRAKING = 2.0
LC_DELAY = 1.0
EGO_SPEEDS = [20.0, 25.0, 30.0]


def notzero(x):
    if abs(x) > 1e-2:
        return x
    return 1e-2 if x >= 0 else -1e-2


def lmap(v, x0, x1, y0, y1):
    return y0 + (v - x0) * (y1 - y0) / (x1 - x0)


def wrap_pi(x):
    return (x + PI) % (2.0 * PI) - PI


class Vehicle:
    __slots__ = ("x", "y", "heading", "speed", "target_lane", "target_speed",
                 "timer", "delta", "crashed", "impact")

    def __init__(self, x, y, heading, speed, target_lane, target_speed,
                 timer, delta, crashed=False, impact=None):
        self.x = float(x)
        self.y = float(y)
        self.heading = float(heading)
        self.speed = float(speed)
        self.target_lane = int(target_lane)
        self.target_speed = float(target_speed)
        self.timer = float(timer)
        self.delta = float(delta)
        self.crashed = bool(crashed)
        self.impact = impact  # None or (dx, dy) to apply next substep

    @property
    def vx(self):
        return self.speed * math.cos(self.heading)

    @property
    def vy(self):
        return self.speed * math.sin(self.heading)


class ScalarHighway:
    """Steps one highway-v0 episode from an injected initial state."""

    def __init__(self, vehicles, lanes_count, config):
        self.vehicles = vehicles  # row 0 = ego
        self.lanes = int(lanes_count)
        self.cfg = config

    @classmethod
    def from_state(cls, st, lanes_count, config):
        """Inject an envpool_tpu reset state (dict of [V] arrays)."""
        n = len(np.asarray(st["x"]))
        vehicles = []
        for i in range(n):
            imp = None
            if bool(np.asarray(st["has_impact"])[i]):
                imp = tuple(np.asarray(st["impact"])[i].tolist())
            vehicles.append(Vehicle(
                np.asarray(st["x"])[i], np.asarray(st["y"])[i],
                np.asarray(st["heading"])[i], np.asarray(st["speed"])[i],
                np.asarray(st["target_lane"])[i],
                np.asarray(st["target_speed"])[i],
                np.asarray(st["timer"])[i], np.asarray(st["idm_delta"])[i],
                bool(np.asarray(st["crashed"])[i]), imp,
            ))
        return cls(vehicles, lanes_count, config)

    # -- geometry -----------------------------------------------------------

    def lane_of(self, veh):
        return min(max(int(round(veh.y / LANE_WIDTH)), 0), self.lanes - 1)

    def on_road(self, veh):
        lane = self.lane_of(veh)
        lat = veh.y - LANE_WIDTH * lane
        return (abs(lat) <= LANE_WIDTH / 2.0 and
                -LENGTH <= veh.x < LANE_LENGTH + LENGTH)

    # -- neighbour scan (per-vehicle loop, NeighbourVehicles) ----------------

    def neighbours(self, i, lane_q):
        """(front_j, rear_j) of vehicle i in query lane; None if absent.
        Front = smallest x >= x_i (lowest index wins ties); rear = largest
        x < x_i."""
        me = self.vehicles[i]
        front, rear = None, None
        for j, v in enumerate(self.vehicles):
            if j == i:
                continue
            lat = v.y - LANE_WIDTH * lane_q
            if abs(lat) > LANE_WIDTH / 2.0 + 1.0:
                continue
            if not (-LENGTH <= v.x < LANE_LENGTH + LENGTH):
                continue
            if v.x >= me.x:
                if front is None or v.x < self.vehicles[front].x:
                    front = j
            else:
                if rear is None or v.x > self.vehicles[rear].x:
                    rear = j
        return front, rear

    # -- IDM ----------------------------------------------------------------

    def desired_gap(self, ego, front):
        ab = -COMFORT_ACC_MAX * COMFORT_ACC_MIN
        dv = ((ego.vx - front.vx) * math.cos(ego.heading)
              + (ego.vy - front.vy) * math.sin(ego.heading))
        return (DIST_WANTED + ego.speed * TIME_WANTED
                + ego.speed * dv / (2.0 * math.sqrt(ab)))

    def idm_acc(self, delta, ego, front):
        """IDM acceleration of ``ego`` behind ``front`` using the decider's
        delta exponent (None front → free road)."""
        ets = min(max(ego.target_speed, 0.0), 30.0)
        acc = COMFORT_ACC_MAX * (
            1.0 - (max(ego.speed, 0.0) / abs(notzero(ets))) ** delta
        )
        if front is not None:
            d = front.x - ego.x
            gap = self.desired_gap(ego, front)
            acc -= COMFORT_ACC_MAX * (gap / notzero(d)) ** 2
        return acc

    # -- MOBIL --------------------------------------------------------------

    def mobil_ok(self, i, cand_lane, cur_lane):
        me = self.vehicles[i]
        new_front, new_rear = self.neighbours(i, cand_lane)
        old_front, _ = self.neighbours(i, cur_lane)
        # Safety: the new follower, predicted with the decider's delta.
        if new_rear is not None:
            pred = self.idm_acc(me.delta, self.vehicles[new_rear], me)
            if pred < -LC_MAX_BRAKING:
                return False
        gain = (self.idm_acc(me.delta, me,
                             None if new_front is None
                             else self.vehicles[new_front])
                - self.idm_acc(me.delta, me,
                               None if old_front is None
                               else self.vehicles[old_front]))
        return gain >= LC_MIN_ACC_GAIN

    def reachable(self, veh, cand):
        lat = veh.y - LANE_WIDTH * cand
        return (0 <= cand < self.lanes and abs(lat) <= 2.0 * LANE_WIDTH
                and 0.0 <= veh.x < LANE_LENGTH + LENGTH)

    def change_lane_decision(self, i):
        """Synchronous (pre-tick) decision: returns (target_lane, timer)."""
        me = self.vehicles[i]
        lane = self.lane_of(me)
        target, timer = me.target_lane, me.timer
        changing = lane != target

        if changing:
            # Abort if someone else is already heading into our target lane
            # closer than the desired gap ahead of us.
            for j, v in enumerate(self.vehicles):
                if j == i:
                    continue
                if self.lane_of(v) != target and v.target_lane == target:
                    d = v.x - me.x
                    if 0.0 < d < self.desired_gap(me, v):
                        target = lane
                        break
            return target, timer

        if timer > LC_DELAY:
            timer = 0.0
            if abs(me.speed) >= 1.0:
                for cand in (lane - 1, lane + 1):  # left first
                    if self.reachable(me, cand) and self.mobil_ok(i, cand, lane):
                        target = cand
                        break
        return target, timer

    # -- collision (corner-enumeration SAT, highway_env.cc:312-391) ----------

    @staticmethod
    def _corners(x, y, heading):
        c, s = math.cos(heading), math.sin(heading)
        hl, hw = LENGTH / 2.0, WIDTH / 2.0
        return [(x + sx * hl * c + sy * hw * -s, y + sx * hl * s + sy * hw * c)
                for sx, sy in ((1, 1), (1, -1), (-1, -1), (-1, 1))]

    @staticmethod
    def _project(corners, ux, uy):
        vals = [cx * ux + cy * uy for cx, cy in corners]
        return min(vals), max(vals)

    @staticmethod
    def _interval_distance(al, ah, bl, bh):
        return bl - ah if al < bl else al - bh

    def collide_pair(self, a, b, dt):
        """(intersecting, will_intersect, translation-toward-a or None)."""
        ca = self._corners(a.x, a.y, a.heading)
        cb = self._corners(b.x, b.y, b.heading)
        # Relative displacement of a w.r.t. b over the lookahead.
        vpx = (a.vx - b.vx) * dt
        vpy = (a.vy - b.vy) * dt
        # Axis order matches the repo: dir_a, perp_a, dir_b, perp_b.
        axes = []
        for veh in (a, b):
            c, s = math.cos(veh.heading), math.sin(veh.heading)
            axes.append((c, s))
            axes.append((-s, c))
        intersecting = True
        will_intersect = True
        min_dist = float("inf")
        best = None
        for ux, uy in axes:
            alo, ahi = self._project(ca, ux, uy)
            blo, bhi = self._project(cb, ux, uy)
            ds = self._interval_distance(alo, ahi, blo, bhi)
            vp = ux * vpx + uy * vpy
            dd = self._interval_distance(
                alo + min(vp, 0.0), ahi + max(vp, 0.0), blo, bhi
            )
            if ds > 0.0:
                intersecting = False
            if dd > 0.0:
                will_intersect = False
            if abs(dd) < min_dist:
                min_dist = abs(dd)
                best = (ux, uy)
        translation = None
        if best is not None:
            ux, uy = best
            # Sign toward a: + if (c_a - c_b)·u > 0.
            sign = 1.0 if (a.x - b.x) * ux + (a.y - b.y) * uy > 0.0 else -1.0
            translation = (sign * min_dist * ux, sign * min_dist * uy)
        return intersecting, will_intersect, translation

    # -- substep -------------------------------------------------------------

    def substep(self, dt):
        vs = self.vehicles
        n = len(vs)
        lanes_now = [self.lane_of(v) for v in vs]

        # 1. Synchronous traffic lane decisions (rows >= 1, not crashed).
        decisions = {}
        for i in range(1, n):
            if not vs[i].crashed:
                decisions[i] = self.change_lane_decision(i)
        for i, (tl, tm) in decisions.items():
            vs[i].target_lane = tl
            vs[i].timer = tm

        # 2. Controls from the post-decision state.
        steer = [0.0] * n
        accel = [0.0] * n
        for i, v in enumerate(vs):
            # Steering toward the target lane (pure pursuit).
            lateral = v.y - LANE_WIDTH * v.target_lane
            lat_cmd = -KP_LATERAL * lateral
            heading_cmd = math.asin(
                min(max(lat_cmd / notzero(v.speed), -1.0), 1.0)
            )
            heading_ref = min(max(heading_cmd, -PI / 4), PI / 4)
            rate = KP_HEADING * wrap_pi(heading_ref - v.heading)
            slip = math.asin(
                min(max(LENGTH / 2.0 / notzero(v.speed) * rate, -1.0), 1.0)
            )
            steer[i] = min(max(math.atan(2.0 * math.tan(slip)),
                               -MAX_STEER), MAX_STEER)
            if i == 0:
                accel[i] = KP_A * (v.target_speed - v.speed)
            else:
                front, _ = self.neighbours(i, lanes_now[i])
                acc = self.idm_acc(
                    v.delta, v,
                    None if front is None else vs[front]
                )
                if lanes_now[i] != v.target_lane:
                    tfront, _ = self.neighbours(i, v.target_lane)
                    acc_t = self.idm_acc(
                        v.delta, v,
                        None if tfront is None else vs[tfront]
                    )
                    acc = min(acc, acc_t)
                accel[i] = min(max(acc, -ACC_MAX), ACC_MAX)

        # 3. Kinematic bicycle integration + deferred impacts.
        for i, v in enumerate(vs):
            st_i, ac_i = steer[i], accel[i]
            if v.crashed:
                st_i, ac_i = 0.0, -v.speed
            if v.speed > MAX_SPEED:
                ac_i = min(ac_i, MAX_SPEED - v.speed)
            elif v.speed < MIN_SPEED:
                ac_i = max(ac_i, MIN_SPEED - v.speed)
            beta = math.atan(0.5 * math.tan(st_i))
            v.x += v.speed * math.cos(v.heading + beta) * dt
            v.y += v.speed * math.sin(v.heading + beta) * dt
            if v.impact is not None:
                v.x += v.impact[0]
                v.y += v.impact[1]
                v.crashed = True
                v.impact = None
            v.heading += v.speed * math.sin(beta) / (LENGTH / 2.0) * dt
            v.speed += ac_i * dt
            if i >= 1:
                v.timer += dt

        # 4. Collisions on the post-move state; impacts apply next substep.
        check_other = bool(self.cfg.get("other_vehicles_check_collisions",
                                        True))
        diag = math.sqrt(LENGTH ** 2 + WIDTH ** 2)
        newly_crashed = [False] * n
        impacts = [None] * n
        for i in range(n):
            for j in range(n):
                if i == j:
                    continue
                if not (check_other or i == 0 or j == 0):
                    continue
                a, b = vs[i], vs[j]
                disp = math.hypot(a.vx * dt, a.vy * dt)
                if math.hypot(a.x - b.x, a.y - b.y) > diag + disp:
                    continue
                inter, will, trans = self.collide_pair(a, b, dt)
                if inter:
                    newly_crashed[i] = True
                if will and impacts[i] is None:
                    impacts[i] = (0.5 * trans[0], 0.5 * trans[1])
        for i in range(n):
            if newly_crashed[i]:
                vs[i].crashed = True
            vs[i].impact = impacts[i]

    # -- policy step ---------------------------------------------------------

    def apply_meta_action(self, action):
        ego = self.vehicles[0]
        a = min(max(int(action), 0), 4)
        span = EGO_SPEEDS[-1] - EGO_SPEEDS[0]
        idx = min(max(int(round((ego.speed - EGO_SPEEDS[0]) / span * 2.0)),
                      0), 2)
        if a == 3:
            idx = min(idx + 1, 2)
            ego.target_speed = EGO_SPEEDS[idx]
        elif a == 4:
            idx = max(idx - 1, 0)
            ego.target_speed = EGO_SPEEDS[idx]
        elif a in (0, 2):
            cand = min(max(ego.target_lane + (1 if a == 2 else -1), 0),
                       self.lanes - 1)
            if self.reachable(ego, cand):
                ego.target_lane = cand

    def step(self, action):
        """One policy step; returns (reward, terminated)."""
        cfg = self.cfg
        sim_freq = int(cfg.get("simulation_frequency", 15))
        pol_freq = int(cfg.get("policy_frequency", 1))
        frames = max(1, sim_freq // pol_freq)
        dt = 1.0 / sim_freq
        self.apply_meta_action(action)
        for _ in range(frames):
            self.substep(dt)
        return self.reward(), self.terminated()

    def terminated(self):
        ego = self.vehicles[0]
        off = bool(self.cfg.get("offroad_terminal", False))
        return ego.crashed or (off and not self.on_road(ego))

    def reward(self):
        cfg = self.cfg
        ego = self.vehicles[0]
        cr = float(cfg.get("collision_reward", -1.0))
        rl = float(cfg.get("right_lane_reward", 0.1))
        hs = float(cfg.get("high_speed_reward", 0.4))
        lo = float(cfg.get("reward_speed_low", 20.0))
        hi = float(cfg.get("reward_speed_high", 30.0))
        forward = ego.speed * math.cos(ego.heading)
        scaled = min(max(lmap(forward, lo, hi, 0.0, 1.0), 0.0), 1.0)
        r = (cr * (1.0 if ego.crashed else 0.0)
             + rl * ego.target_lane / max(self.lanes - 1, 1)
             + hs * scaled)
        if bool(cfg.get("normalize_reward", True)):
            r = lmap(r, cr, hs + rl, 0.0, 1.0)
        return r * (1.0 if self.on_road(ego) else 0.0)

    def observe(self, n_obs):
        """Kinematics observation [n_obs, 5] (presence, x, y, vx, vy)."""
        vs = self.vehicles
        ego = vs[0]
        rows = []
        cand = []
        for j in range(1, len(vs)):
            dx = vs[j].x - ego.x
            dy = vs[j].y - ego.y
            if math.hypot(dx, dy) < PERCEPTION and dx > -2.0 * LENGTH:
                cand.append((abs(dx), j))
        cand.sort(key=lambda t: (t[0], t[1]))

        def norm(px, py, pvx, pvy):
            nx = min(max(lmap(px, -PERCEPTION, PERCEPTION, -1, 1), -1), 1)
            ny = min(max(lmap(py, -LANE_WIDTH * self.lanes,
                              LANE_WIDTH * self.lanes, -1, 1), -1), 1)
            nvx = min(max(lmap(pvx, -2 * MAX_SPEED, 2 * MAX_SPEED, -1, 1),
                          -1), 1)
            nvy = min(max(lmap(pvy, -2 * MAX_SPEED, 2 * MAX_SPEED, -1, 1),
                          -1), 1)
            return nx, ny, nvx, nvy

        ex, ey, evx, evy = norm(ego.x, ego.y, ego.vx, ego.vy)
        rows.append([1.0, ex, ey, evx, evy])
        for _, j in cand[: n_obs - 1]:
            v = vs[j]
            nx, ny, nvx, nvy = norm(v.x - ego.x, v.y - ego.y,
                                    v.vx - ego.vx, v.vy - ego.vy)
            rows.append([1.0, nx, ny, nvx, nvy])
        while len(rows) < n_obs:
            rows.append([0.0] * 5)
        return np.asarray(rows, np.float32)
