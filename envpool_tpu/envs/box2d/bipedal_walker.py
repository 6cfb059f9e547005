"""BipedalWalker(-Hardcore) — TPU-native planar articulated dynamics.

Behavioral reference: ``envpool/box2d/bipedal_walker_env.{h,cc}`` (a port
of Gym's Box2D walker).  This build replaces the b2World with a 7-DOF
Lagrangian system (hull x/y/angle + 2x hip + 2x knee) whose mass matrix
and velocity bias are assembled by autodiff over the closed-form body
kinematics — the TPU-idiomatic equivalent of Box2D's sequential-impulse
solver.  Geometry, joint limits, motor model (velocity servo clamped at
``MOTORS_TORQUE * |a|``), terrain state machine (GRASS/STUMP/STAIRS/PIT),
lidar, observation layout, reward shaping and terminals follow the Gym
source constants exactly.

Documented approximations:
* contact is penalty-based (spring-damper at foot/knee/hull points vs a
  per-episode terrain heightmap) instead of rigid impulses;
* hardcore obstacles are folded into the heightmap (stumps raise it,
  pits/stairs already shape the polyline) — overhangs do not exist.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec

FPS = 50.0
DT = 1.0 / FPS
SCALE = 30.0
MOTORS_TORQUE = 80.0
SPEED_HIP = 4.0
SPEED_KNEE = 6.0
LIDAR_RANGE = 160.0 / SCALE
INITIAL_RANDOM = 5.0
LEG_DOWN = -8.0 / SCALE
LEG_W, LEG_H = 8.0 / SCALE, 34.0 / SCALE
VIEWPORT_W, VIEWPORT_H = 600.0, 400.0
TERRAIN_STEP = 14.0 / SCALE
TERRAIN_LENGTH = 200
TERRAIN_HEIGHT = VIEWPORT_H / SCALE / 4
TERRAIN_GRASS = 10
TERRAIN_STARTPAD = 20
FRICTION = 2.5
GRAVITY = -10.0

HULL_POLY = np.asarray(
    [(-30, 9), (6, 9), (34, 1), (34, -8), (-30, -8)], np.float64
) / SCALE


def _poly_props(pts, density):
    """(mass, inertia about centroid, centroid) of a polygon (Box2D)."""
    x, y = pts[:, 0], pts[:, 1]
    x1, y1 = np.roll(x, -1), np.roll(y, -1)
    cross = x * y1 - x1 * y
    A = 0.5 * cross.sum()
    cx = ((x + x1) * cross).sum() / (6 * A)
    cy = ((y + y1) * cross).sum() / (6 * A)
    # Orientation-independent (HULL_POLY is clockwise → signed A < 0).
    mass = density * abs(A)
    I0 = abs(
        density / 12.0
        * (cross * (x * x + x * x1 + x1 * x1 + y * y + y * y1 + y1 * y1)).sum()
    )
    I = I0 - mass * (cx * cx + cy * cy)
    return float(mass), float(I), np.asarray([cx, cy])


HULL_MASS, HULL_I, HULL_COM = _poly_props(HULL_POLY, 5.0)
_leg_box = np.asarray(
    [(-LEG_W / 2, -LEG_H / 2), (LEG_W / 2, -LEG_H / 2),
     (LEG_W / 2, LEG_H / 2), (-LEG_W / 2, LEG_H / 2)]
)
UP_MASS, UP_I, _ = _poly_props(_leg_box, 1.0)
_low_box = _leg_box * np.asarray([0.8, 1.0])
LO_MASS, LO_I, _ = _poly_props(_low_box, 1.0)

_NQ = 7  # x, y, hull angle, hip1, knee1, hip2, knee2
_KP = 3.0e4
_KD = 1.5e2
_SUBSTEPS = 16
_MOTOR_KV = 40.0  # velocity-servo stiffness (torque per rad/s error)
_LIMIT_K = 50.0
# Joint limits (revoluteJointDef lower/upper).
_HIP_RANGE = (-0.8, 1.1)
_KNEE_RANGE = (-1.6, -0.1)


def _rot(th):
    c, s = jnp.cos(th), jnp.sin(th)
    return jnp.array([[c, -s], [s, c]])


def _frames(q):
    """Body (angle, com) for hull, up1, lo1, up2, lo2, plus key points."""
    base = q[:2]
    th = q[2]
    hull_com = base + _rot(th) @ jnp.asarray(HULL_COM, q.dtype)
    hip_anchor = base + _rot(th) @ jnp.asarray([0.0, LEG_DOWN], q.dtype)
    out_angles = [th]
    out_coms = [hull_com]
    feet = []
    knees = []
    for i, (hip, knee) in enumerate(((q[3], q[4]), (q[5], q[6]))):
        up_th = th + hip
        up_com = hip_anchor - _rot(up_th) @ jnp.asarray([0.0, LEG_H / 2], q.dtype)
        knee_anchor = up_com - _rot(up_th) @ jnp.asarray(
            [0.0, LEG_H / 2], q.dtype
        )
        lo_th = up_th + knee
        lo_com = knee_anchor - _rot(lo_th) @ jnp.asarray(
            [0.0, LEG_H / 2], q.dtype
        )
        foot = lo_com - _rot(lo_th) @ jnp.asarray([0.0, LEG_H / 2], q.dtype)
        out_angles += [up_th, lo_th]
        out_coms += [up_com, lo_com]
        feet.append(foot)
        knees.append(knee_anchor)
    return (
        jnp.stack(out_angles),
        jnp.stack(out_coms),
        jnp.stack(feet),
        jnp.stack(knees),
    )


def _hull_points(q):
    """World positions of the hull polygon vertices (game-over probes)."""
    base = q[:2]
    R = _rot(q[2])
    pts = jnp.asarray(HULL_POLY, q.dtype)
    return base[None, :] + pts @ R.T


_MASSES = jnp.asarray([HULL_MASS, UP_MASS, LO_MASS, UP_MASS, LO_MASS])
_INERTIAS = jnp.asarray([HULL_I, UP_I, LO_I, UP_I, LO_I])


def _terrain_height_at(terrain_y, x):
    """Piecewise-linear heightmap lookup (TERRAIN_STEP grid)."""
    fi = jnp.clip(x / TERRAIN_STEP, 0.0, TERRAIN_LENGTH - 1.001)
    i0 = jnp.floor(fi).astype(jnp.int32)
    frac = fi - i0.astype(fi.dtype)
    return terrain_y[i0] * (1 - frac) + terrain_y[i0 + 1] * frac


class BipedalWalkerEnv(TpuEnv):
    DEFAULT_CONFIG = {
        "hardcore": False,
        "reward_threshold": 300.0,
    }

    def __init__(self, config):
        super().__init__(config)
        self.hardcore = bool(config["hardcore"])

    # -- specs -------------------------------------------------------------

    def state_spec(self):
        inf = float("inf")
        return {
            "obs": ArraySpec(jnp.float32, (24,), -inf, inf),
        }

    def action_spec(self):
        return {"action": ArraySpec(jnp.float32, (4,), -1.0, 1.0)}

    # -- terrain generation (gym _generate_terrain, lax.scan port) ---------

    def _generate_terrain(self, key):
        """GRASS/STUMP/STAIRS/PIT state machine as one lax.scan.

        All randomness is pre-drawn as [TERRAIN_LENGTH] vectors (a single
        split) — per-iteration jax.random tracing is prohibitively slow.
        """
        GRASS, STUMP, STAIRS, PIT = 0, 1, 2, 3
        ks = jax.random.split(key, 7)
        L = TERRAIN_LENGTH
        noise_v = jax.random.uniform(ks[0], (L,), jnp.float32, -1, 1) / SCALE
        pit_c_v = jax.random.randint(ks[1], (L,), 3, 5)
        stump_c_v = jax.random.randint(ks[2], (L,), 1, 3)
        stair_dir_v = jnp.where(
            jax.random.uniform(ks[3], (L,)) > 0.5, 1.0, -1.0
        ).astype(jnp.float32)
        stair_w_v = jax.random.randint(ks[4], (L,), 4, 5)
        stair_s_v = jax.random.randint(ks[5], (L,), 3, 5)
        new_counter_v = jax.random.randint(
            ks[6], (L,), TERRAIN_GRASS // 2, TERRAIN_GRASS
        )
        new_state_v = jax.random.randint(ks[3], (L,), 1, 4)
        idx = jnp.arange(L)

        def body(carry, xs):
            (state, velocity, y, counter, oneshot, original_y,
             stair_h, stair_w, stair_steps) = carry
            (i, noise, pit_c, stump_c, sdir, sw, sst, new_counter,
             new_state) = xs

            new_velocity = 0.8 * velocity + 0.01 * jnp.sign(
                TERRAIN_HEIGHT - y
            )
            nz = jnp.where(i > TERRAIN_STARTPAD, noise, 0.0)
            grass_now = (state == GRASS) & ~oneshot
            velocity = jnp.where(grass_now, new_velocity + nz, velocity)
            y = jnp.where(grass_now, y + velocity, y)

            pit_once = (state == PIT) & oneshot
            counter = jnp.where(pit_once, pit_c + 2, counter)
            original_y = jnp.where(pit_once, y, original_y)
            pit_now = (state == PIT) & ~oneshot
            y = jnp.where(
                pit_now,
                jnp.where(
                    counter > 1, original_y - 4 * TERRAIN_STEP, original_y
                ),
                y,
            )

            stump_once = (state == STUMP) & oneshot
            counter = jnp.where(stump_once, stump_c, counter)
            bump = jnp.where(
                state == STUMP,
                stump_c.astype(jnp.float32) * TERRAIN_STEP,
                0.0,
            )

            stairs_once = (state == STAIRS) & oneshot
            stair_h = jnp.where(stairs_once, sdir, stair_h)
            stair_w = jnp.where(stairs_once, sw, stair_w)
            stair_steps = jnp.where(stairs_once, sst, stair_steps)
            original_y = jnp.where(stairs_once, y, original_y)
            counter = jnp.where(stairs_once, sst * sw, counter)
            stairs_now = (state == STAIRS) & ~oneshot
            s = (
                (stair_steps * stair_w - counter).astype(jnp.float32)
                - stair_h
            )
            n = jnp.floor(
                s / jnp.maximum(stair_w.astype(jnp.float32), 1.0)
            )
            y = jnp.where(
                stairs_now, original_y + n * stair_h * TERRAIN_STEP, y
            )

            oneshot = jnp.bool_(False)
            out_y = y
            out_bump = bump
            counter = counter - 1
            switch = counter == 0
            counter = jnp.where(switch, new_counter, counter)
            if self.hardcore:
                ns = jnp.where(state == GRASS, new_state, GRASS)
            else:
                ns = jnp.int32(GRASS)
            state = jnp.where(switch, ns, state)
            oneshot = switch
            return (
                (state, velocity, y, counter, oneshot, original_y,
                 stair_h, stair_w, stair_steps),
                (out_y, out_bump),
            )

        init = (
            jnp.int32(GRASS),
            jnp.float32(0.0),
            jnp.float32(TERRAIN_HEIGHT),
            jnp.int32(TERRAIN_STARTPAD),
            jnp.bool_(False),
            jnp.float32(TERRAIN_HEIGHT),
            jnp.float32(0.0),
            jnp.int32(0),
            jnp.int32(0),
        )
        _, (ys, bumps) = jax.lax.scan(
            body,
            init,
            (idx, noise_v, pit_c_v, stump_c_v, stair_dir_v, stair_w_v,
             stair_s_v, new_counter_v, new_state_v),
        )
        return ys + bumps

    # -- dynamics ----------------------------------------------------------

    def _mass_matrix_and_bias(self, q, qd):
        def coms_fn(q_):
            angles, coms, _, _ = _frames(q_)
            return coms, angles

        coms, angles = coms_fn(q)
        Jc = jax.jacfwd(lambda q_: coms_fn(q_)[0])(q)      # [5, 2, 7]
        Jr = jax.jacfwd(lambda q_: coms_fn(q_)[1])(q)      # [5, 7]
        M = (
            jnp.einsum("b,bxi,bxj->ij", _MASSES, Jc, Jc)
            + jnp.einsum("b,bi,bj->ij", _INERTIAS, Jr, Jr)
        )
        # Velocity bias: Jdot @ qd via jvp of the Jacobian-vector product.
        def vel_fn(q_):
            angles_, coms_ = coms_fn(q_)[1], coms_fn(q_)[0]
            Jc_ = jax.jacfwd(lambda qq: coms_fn(qq)[0])(q_)
            return jnp.einsum("bxi,i->bx", Jc_, qd)

        _, a_bias = jax.jvp(vel_fn, (q,), (qd,))           # [5, 2]
        bias = jnp.einsum("b,bxi,bx->i", _MASSES, Jc, a_bias)
        # Gravity generalized force.
        g = jnp.asarray([0.0, GRAVITY], q.dtype)
        Qg = jnp.einsum("b,bxi,x->i", _MASSES, Jc, g)
        return M, bias, Qg, Jc, Jr

    def _contact_forces(self, q, qd, terrain_y):
        """Penalty forces at feet/knees/hull probe points."""
        def pts_fn(q_):
            _, _, feet, knees = _frames(q_)
            hull = _hull_points(q_)
            return jnp.concatenate([feet, knees, hull], axis=0)  # [9, 2]

        pts = pts_fn(q)
        Jp = jax.jacfwd(pts_fn)(q)                          # [9, 2, 7]
        vels = jnp.einsum("pxi,i->px", Jp, qd)
        h = jax.vmap(lambda p: _terrain_height_at(terrain_y, p[0]))(pts)
        pen = h - pts[:, 1]
        fn = jnp.where(pen > 0, _KP * pen - _KD * vels[:, 1], 0.0)
        # Cap the normal force (deep penetrations would otherwise inject
        # energy through the explicit integrator on the light feet).
        fn = jnp.clip(fn, 0.0, 400.0)
        # Coulomb-ish friction, smoothed wide enough to avoid chatter.
        ft = -FRICTION * fn * jnp.tanh(vels[:, 0] / 0.3)
        F = jnp.stack([ft, fn], axis=-1)                    # [9, 2]
        Q = jnp.einsum("pxi,px->i", Jp, F)
        contact = pen > 0
        return Q, contact

    def _motor_torques(self, q, qd, action):
        """Box2D velocity-servo motors + joint-limit springs."""
        a = jnp.clip(action, -1.0, 1.0)
        taus = []
        for j, (spd, rng_) in enumerate(
            (
                (SPEED_HIP, _HIP_RANGE),
                (SPEED_KNEE, _KNEE_RANGE),
                (SPEED_HIP, _HIP_RANGE),
                (SPEED_KNEE, _KNEE_RANGE),
            )
        ):
            target = spd * jnp.sign(a[j])
            max_t = MOTORS_TORQUE * jnp.abs(a[j])
            tau = jnp.clip(
                _MOTOR_KV * (target - qd[3 + j]), -max_t, max_t
            )
            lo, hi = rng_
            tau = tau - _LIMIT_K * jnp.maximum(q[3 + j] - hi, 0.0)
            tau = tau - _LIMIT_K * jnp.minimum(q[3 + j] - lo, 0.0)
            taus.append(tau)
        return jnp.concatenate(
            [jnp.zeros(3, q.dtype), jnp.stack(taus)]
        )

    def _physics_step(self, q, qd, action, terrain_y):
        h = DT / _SUBSTEPS
        def sub(carry, _):
            q, qd = carry
            M, bias, Qg, _, _ = self._mass_matrix_and_bias(q, qd)
            Qc, _ = self._contact_forces(q, qd, terrain_y)
            Qm = self._motor_torques(q, qd, action)
            rhs = Qm + Qg + Qc - bias
            qdd = jnp.linalg.solve(
                M + 1e-6 * jnp.eye(_NQ, dtype=q.dtype), rhs
            )
            qd = qd + h * qdd
            q = q + h * qd
            # Hard joint limits (Box2D enableLimit): positional clamp
            # with velocity zeroing on the clamped side.
            lo = jnp.asarray(
                [-jnp.inf, -jnp.inf, -jnp.inf,
                 _HIP_RANGE[0], _KNEE_RANGE[0],
                 _HIP_RANGE[0], _KNEE_RANGE[0]], q.dtype
            )
            hi = jnp.asarray(
                [jnp.inf, jnp.inf, jnp.inf,
                 _HIP_RANGE[1], _KNEE_RANGE[1],
                 _HIP_RANGE[1], _KNEE_RANGE[1]], q.dtype
            )
            clamped_q = jnp.clip(q, lo, hi)
            hit = clamped_q != q
            qd = jnp.where(hit, 0.0, qd)
            q = clamped_q
            return (q, qd), None

        (q, qd), _ = jax.lax.scan(sub, (q, qd), None, length=_SUBSTEPS)
        return q, qd

    # -- lidar -------------------------------------------------------------

    def _lidar(self, q, terrain_y):
        pos = q[:2]
        idx = jnp.arange(10, dtype=jnp.float32)
        ang = 1.5 * idx / 10.0
        d = jnp.stack([jnp.sin(ang), -jnp.cos(ang)], axis=-1) * LIDAR_RANGE
        # March along each ray, find first sample below terrain.
        ts = jnp.linspace(0.0, 1.0, 40)

        def ray(di):
            pts = pos[None, :] + ts[:, None] * di[None, :]
            h = jax.vmap(lambda p: _terrain_height_at(terrain_y, p[0]))(pts)
            below = pts[:, 1] <= h
            first = jnp.argmax(below)
            hit = below.any()
            return jnp.where(hit, ts[first], 1.0)

        return jax.vmap(ray)(d)

    # -- obs / reset / step ------------------------------------------------

    def _obs(self, q, qd, feet_contact, terrain_y):
        lidar = self._lidar(q, terrain_y)
        return {
            "obs": jnp.concatenate(
                [
                    jnp.stack(
                        [
                            q[2],
                            2.0 * qd[2] / FPS,
                            0.3 * qd[0] * (VIEWPORT_W / SCALE) / FPS,
                            0.3 * qd[1] * (VIEWPORT_H / SCALE) / FPS,
                            q[3],
                            qd[3] / SPEED_HIP,
                            q[4] + 1.0,
                            qd[4] / SPEED_KNEE,
                            feet_contact[0],
                            q[5],
                            qd[5] / SPEED_HIP,
                            q[6] + 1.0,
                            qd[6] / SPEED_KNEE,
                            feet_contact[1],
                        ]
                    ),
                    lidar,
                ]
            ).astype(jnp.float32)
        }

    def reset_env(self, key):
        kt, kf = jax.random.split(key)
        terrain_y = self._generate_terrain(kt)
        init_x = TERRAIN_STEP * TERRAIN_STARTPAD / 2
        # Start with straight legs just clearing the ground (the gym
        # init relies on Box2D snapping the joint anchors together; our
        # FK chain is already assembled, so offset by -LEG_DOWN).
        init_y = TERRAIN_HEIGHT + 2 * LEG_H - LEG_DOWN + 0.001
        q = jnp.asarray(
            [init_x, init_y, 0.0, 0.05, 0.0, -0.05, 0.0], jnp.float32
        )
        qd = jnp.zeros(_NQ, jnp.float32)
        # Initial random horizontal force on the hull for one frame.
        f = jax.random.uniform(
            kf, (), jnp.float32, -INITIAL_RANDOM, INITIAL_RANDOM
        )
        qd = qd.at[0].set(f / HULL_MASS * DT)
        st = {
            "q": q,
            "qd": qd,
            "terrain": terrain_y,
            "prev_shaping": jnp.float32(
                130 * init_x / SCALE  # matches gym's first step baseline
            ),
        }
        # Gym's reset performs one zero-action step to produce obs.
        out = self.step_env(st, jnp.zeros(4, jnp.float32), key)
        return out.state, out.obs

    def step_env(self, state, action, key):
        action = jnp.reshape(action, (4,)).astype(jnp.float32)
        q, qd = self._physics_step(
            state["q"], state["qd"], action, state["terrain"]
        )
        _, contact = self._contact_forces(q, qd, state["terrain"])
        feet_contact = jnp.stack(
            [contact[0].astype(jnp.float32), contact[1].astype(jnp.float32)]
        )
        hull_contact = contact[4:].any()

        shaping = 130 * q[0] / SCALE - 5.0 * jnp.abs(q[2])
        reward = shaping - state["prev_shaping"]
        reward = reward - jnp.sum(
            0.00035 * MOTORS_TORQUE * jnp.clip(jnp.abs(action), 0, 1)
        )
        game_over = hull_contact | (q[0] < 0)
        reached = q[0] > (TERRAIN_LENGTH - TERRAIN_GRASS) * TERRAIN_STEP
        reward = jnp.where(game_over, -100.0, reward)
        terminated = game_over | reached

        st = {
            "q": q,
            "qd": qd,
            "terrain": state["terrain"],
            "prev_shaping": shaping,
        }
        return EnvOut(
            state=st,
            obs=self._obs(q, qd, feet_contact, state["terrain"]),
            reward=jnp.asarray(reward, jnp.float32),
            terminated=jnp.asarray(terminated, jnp.bool_),
        )
