"""LunarLander(-Continuous) — TPU-native functional implementation.

Behavioral reference: ``envpool/box2d/lunar_lander_env.{h,cc}`` (a faithful
port of Gym's Box2D lander).  This build replaces the b2World with explicit
planar rigid-body dynamics: the lander is a single 3-DOF body (x, y, angle)
with leg-tip and hull contact points against a randomly generated
piecewise-linear terrain (flat helipad in the middle, as in the reference's
11-chunk terrain).  Exhaust particles are visual-only in the reference and
are omitted.  Engine powers, dispersion noise, initial random force, reward
shaping, and the -100/+100 crash/rest terminals follow the reference
constants (``lunar_lander_env.h:35-57``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec

_FPS = 50.0
_DT = 1.0 / _FPS
_SCALE = 30.0
_MAIN_POWER = 13.0
_SIDE_POWER = 0.6
_INITIAL_RANDOM = 1000.0
_GRAVITY = -10.0
_VIEW_W = 600 / _SCALE  # 20 world units
_VIEW_H = 400 / _SCALE
_CHUNKS = 11
_HELIPAD_Y = _VIEW_H / 4
_LEG_AWAY = 20 / _SCALE
_LEG_DOWN = 18 / _SCALE
_SIDE_ENGINE_H = 14.0 / _SCALE
_SIDE_ENGINE_AWAY = 12.0 / _SCALE
# Lander hull mass/inertia (approximating the b2 polygon with density 5).
_MASS = 4.82      # Box2D computes ~4.82 for the hull+legs at density 5/1
_INERTIA = 1.0    # effective rotational inertia (empirical Box2D scale)
_HULL_PTS = np.array(
    [[-14, 17], [-17, 0], [-17, -10], [17, -10], [17, 0], [14, 17]],
    np.float64,
) / _SCALE


class LunarLanderEnv(TpuEnv):
    DEFAULT_CONFIG = {"continuous": False, "reward_threshold": 200.0}

    @property
    def reward_threshold(self) -> float:
        return float(self.config["reward_threshold"])

    @property
    def _continuous(self) -> bool:
        return bool(self.config["continuous"])

    def state_spec(self):
        inf = float("inf")
        return {
            "obs": ArraySpec(jnp.float32, (8,), -inf, inf),
        }

    def action_spec(self):
        if self._continuous:
            return {"action": ArraySpec(jnp.float32, (2,), -1.0, 1.0)}
        return {"action": ArraySpec(jnp.int32, (), 0, 3, is_discrete=True)}

    # -- terrain -----------------------------------------------------------

    def _terrain(self, key):
        """Chunk heights with a flat helipad across the middle 3 chunks."""
        heights = jax.random.uniform(
            key, (_CHUNKS,), jnp.float32, 0.0, _HELIPAD_Y * 2
        )
        mid = _CHUNKS // 2
        heights = heights.at[mid - 1 : mid + 2].set(_HELIPAD_Y)
        return heights

    @staticmethod
    def _ground_height(heights, x):
        """Piecewise-linear terrain height at world x."""
        chunk_w = _VIEW_W / (_CHUNKS - 1)
        xi = jnp.clip(x / chunk_w, 0.0, _CHUNKS - 1 - 1e-5)
        i = jnp.int32(jnp.floor(xi))
        frac = xi - i
        return heights[i] * (1 - frac) + heights[i + 1] * frac

    # -- reset / step ------------------------------------------------------

    def _obs(self, st):
        x, y, vx, vy, angle, vang = (
            st["pos"][0],
            st["pos"][1],
            st["vel"][0],
            st["vel"][1],
            st["angle"],
            st["vang"],
        )
        half_w = _VIEW_W / 2
        half_h = _VIEW_H / 2
        return {
            "obs": jnp.stack(
                [
                    (x - half_w) / half_w,
                    (y - (_HELIPAD_Y + _LEG_DOWN)) / half_h,
                    vx * half_w / _FPS,
                    vy * half_h / _FPS,
                    angle,
                    20.0 * vang / _FPS,
                    st["leg1"].astype(jnp.float32),
                    st["leg2"].astype(jnp.float32),
                ]
            ).astype(jnp.float32)
        }

    def _shaping(self, st):
        o = self._obs(st)["obs"]
        return (
            -100.0 * jnp.sqrt(o[0] * o[0] + o[1] * o[1])
            - 100.0 * jnp.sqrt(o[2] * o[2] + o[3] * o[3])
            - 100.0 * jnp.abs(o[4])
            + 10.0 * o[6]
            + 10.0 * o[7]
        )

    def reset_env(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        heights = self._terrain(k1)
        force = jax.random.uniform(
            k2, (2,), jnp.float32, -_INITIAL_RANDOM, _INITIAL_RANDOM
        )
        pos = jnp.asarray([_VIEW_W / 2, _VIEW_H], jnp.float32)
        vel = force / (_MASS * _SCALE)  # initial impulse
        st = {
            "pos": pos,
            "vel": vel,
            "angle": jnp.float32(0.0),
            "vang": jnp.float32(0.0),
            "heights": heights,
            "leg1": jnp.bool_(False),
            "leg2": jnp.bool_(False),
            "prev_shaping": jnp.float32(0.0),
            "crashed": jnp.bool_(False),
            "rested": jnp.bool_(False),
            "rest_timer": jnp.int32(0),
        }
        st["prev_shaping"] = self._shaping(st)
        return st, self._obs(st)

    def step_env(self, state, action, key):
        k1, k2 = jax.random.split(key)
        if self._continuous:
            a = jnp.reshape(action, (2,)).astype(jnp.float32)
            a = jnp.clip(a, -1.0, 1.0)
            main_on = a[0] > 0.0
            m_power = jnp.where(main_on, (jnp.clip(a[0], 0, 1) + 1.0) * 0.5, 0.0)
            side_mag = jnp.abs(a[1])
            side_on = side_mag > 0.5
            s_power = jnp.where(side_on, jnp.clip(side_mag, 0.5, 1.0), 0.0)
            s_dir = jnp.sign(a[1])
        else:
            main_on = action == 2
            m_power = jnp.where(main_on, 1.0, 0.0)
            side_on = (action == 1) | (action == 3)
            s_power = jnp.where(side_on, 1.0, 0.0)
            s_dir = jnp.where(action == 1, -1.0, 1.0)

        angle = state["angle"]
        tip = jnp.stack([jnp.sin(angle), jnp.cos(angle)])
        side = jnp.stack([-tip[1], tip[0]])
        disp = jax.random.uniform(k1, (2,), jnp.float32, -1.0, 1.0) / _SCALE

        # Main engine: force along the body axis with dispersion.
        ox = tip[0] * (4 / _SCALE + 2 * disp[0]) + side[0] * disp[1]
        oy = -tip[1] * (4 / _SCALE + 2 * disp[0]) - side[1] * disp[1]
        f_main = (
            -jnp.stack([ox, oy]) * _MAIN_POWER * m_power * _SCALE / _MASS
        )
        # Side engines: lateral force + torque.
        f_side = (
            jnp.stack([-side[0], -side[1]])
            * s_dir
            * _SIDE_POWER
            * s_power
            * _SCALE
            / _MASS
        )
        torque = -s_dir * s_power * _SIDE_POWER * _SIDE_ENGINE_AWAY * _SCALE / (
            _INERTIA * _SCALE
        )

        vel = state["vel"] + _DT * (
            f_main + f_side + jnp.asarray([0.0, _GRAVITY], jnp.float32)
        )
        pos = state["pos"] + _DT * vel
        vang = state["vang"] + _DT * torque
        angle = angle + _DT * vang

        # Contact: leg tips and hull bottom vs terrain.
        heights = state["heights"]
        c, s = jnp.cos(angle), jnp.sin(angle)
        rot = jnp.asarray([[c, -s], [s, c]])

        def world(pt):
            return pos + rot @ jnp.asarray(pt, jnp.float32)

        leg1_pt = world([-_LEG_AWAY, -_LEG_DOWN])
        leg2_pt = world([_LEG_AWAY, -_LEG_DOWN])
        leg1 = leg1_pt[1] <= self._ground_height(heights, leg1_pt[0])
        leg2 = leg2_pt[1] <= self._ground_height(heights, leg2_pt[0])
        hull_pts = jnp.asarray(_HULL_PTS, jnp.float32)
        hull_w = pos[None, :] + hull_pts @ rot.T
        hull_g = jax.vmap(lambda p: self._ground_height(heights, p[0]))(
            hull_w
        )
        crashed = (hull_w[:, 1] <= hull_g).any()
        # Hard landings crash: in Box2D a fast impact compresses the legs
        # until the hull strikes; here it's an explicit impact-speed rule.
        impact = (leg1 | leg2) & ~(state["leg1"] | state["leg2"])
        crashed = crashed | (impact & (vel[1] < -1.5))
        # Tipped over on the ground → hull corner strike.
        crashed = crashed | (
            (leg1 | leg2) & (jnp.abs(angle) > 0.8)
        )
        off_screen = jnp.abs(self._obs(
            {**state, "pos": pos, "vel": vel, "angle": angle, "vang": vang}
        )["obs"][0]) >= 1.0

        # Ground response for legs: inelastic bounce + friction damping.
        touching = leg1 | leg2
        vy = jnp.where(touching & (vel[1] < 0), -0.2 * vel[1], vel[1])
        vx = vel[0] * jnp.where(touching, 0.8, 1.0)
        vel = jnp.stack([vx, vy])
        vang = vang * jnp.where(touching, 0.9, 1.0)
        # Clamp legs on the ground.
        pen = jnp.maximum(
            self._ground_height(heights, leg1_pt[0]) - leg1_pt[1],
            self._ground_height(heights, leg2_pt[0]) - leg2_pt[1],
        )
        pos = jnp.where(
            touching & (pen > 0),
            pos + jnp.asarray([0.0, 1.0], jnp.float32) * pen,
            pos,
        )

        # Box2D "sleep": rest only after ~0.4 s of stillness on the ground.
        still = (
            touching
            & (jnp.abs(vel[0]) < 0.03)
            & (jnp.abs(vel[1]) < 0.03)
            & (jnp.abs(vang) < 0.05)
        )
        rest_timer = jnp.where(still, state["rest_timer"] + 1, 0).astype(
            jnp.int32
        )
        rested = rest_timer >= 20

        st = {
            "pos": pos,
            "vel": vel,
            "angle": angle,
            "vang": vang,
            "heights": heights,
            "leg1": leg1,
            "leg2": leg2,
            "prev_shaping": state["prev_shaping"],
            "crashed": crashed,
            "rested": rested,
            "rest_timer": rest_timer,
        }
        shaping = self._shaping(st)
        reward = (
            shaping
            - state["prev_shaping"]
            - m_power * 0.30
            - s_power * 0.03
        )
        st["prev_shaping"] = shaping
        terminated = crashed | rested | off_screen
        reward = jnp.where(
            crashed | off_screen,
            -100.0,
            jnp.where(rested, 100.0, reward),
        ).astype(jnp.float32)
        return EnvOut(
            state=st,
            obs=self._obs(st),
            reward=reward,
            terminated=terminated,
        )
