"""dm_control suite tasks (pendulum, cartpole, cheetah, walker, hopper,
reacher, point_mass).

Behavioral reference: the dm_control suite task sources (exact reward and
observation definitions quoted per task) and
``envpool/mujoco/dmc/*`` for the reference's C++ ports.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...physics.dynamics import step as phys_step
from . import rewards
from ...physics.dynamics import site_positions
from .base import DmcEnv

_COSINE_BOUND = np.cos(np.deg2rad(8))  # pendulum.py


class PendulumEnv(DmcEnv):
    """pendulum:swingup."""

    DOMAIN = "pendulum"

    def init_state(self, key):
        qpos = jnp.asarray(self.model.qpos0, jnp.float32)
        qpos = qpos.at[0].set(
            jax.random.uniform(key, (), jnp.float32, -jnp.pi, jnp.pi)
        )
        return qpos, jnp.zeros(self.model.nv, jnp.float32), {}

    def _pole_zz_xz(self, qpos):
        R = self.xmat(qpos)[self.body_index("pole")]
        return R[2, 2], R[0, 2]

    def observe_dmc(self, qpos, qvel, extras):
        zz, xz = self._pole_zz_xz(qpos)
        return {
            "orientation": jnp.stack([zz, xz]),
            "velocity": qvel,
        }

    def reward_dmc(self, qpos, qvel, action, extras):
        zz, _ = self._pole_zz_xz(qpos)
        return rewards.tolerance(zz, (_COSINE_BOUND, 1))


class CartpoleEnv(DmcEnv):
    """cartpole:{balance,balance_sparse,swingup,swingup_sparse,
    two_poles,three_poles}.

    The n-pole variants build dm_control's procedurally generated model
    (``cartpole._make_model``) and run the swing-up (non-sparse) task, as
    in the suite (``dm_control/suite/cartpole.py`` two_poles/three_poles).
    """

    DOMAIN = "cartpole"
    _CART_RANGE = (-0.25, 0.25)
    _ANGLE_COSINE_RANGE = (0.995, 1)
    DEFAULT_CONFIG = dict(DmcEnv.DEFAULT_CONFIG)
    DEFAULT_CONFIG.update({"n_poles": 1})

    def _load_model(self):
        n = int(self.config["n_poles"])
        if n == 1:
            return super()._load_model()
        import mujoco
        from dm_control.suite import cartpole, common

        xml = cartpole._make_model(n)
        m = mujoco.MjModel.from_xml_string(xml.decode(), common.ASSETS)
        from ...physics import from_mj_model

        return from_mj_model(m), m

    @property
    def _swing_up(self) -> bool:
        return self.task.startswith("swingup") or self.task.endswith("poles")

    @property
    def _sparse(self) -> bool:
        return self.task.endswith("sparse")

    def init_state(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        nq, nv = self.model.nq, self.model.nv
        qpos0 = jnp.asarray(self.model.qpos0, jnp.float32)
        if self._swing_up:
            qpos = qpos0.at[0].set(0.01 * jax.random.normal(k1))
            qpos = qpos.at[1].set(
                jnp.pi + 0.01 * jax.random.normal(k2)
            )
            if nq > 2:
                qpos = qpos.at[2:].set(
                    0.1 * jax.random.normal(k4, (nq - 2,), jnp.float32)
                )
        else:
            qpos = qpos0.at[0].set(
                jax.random.uniform(k1, (), jnp.float32, -0.1, 0.1)
            )
            qpos = qpos.at[1:].set(
                jax.random.uniform(k2, (nq - 1,), jnp.float32, -0.034, 0.034)
            )
        qvel = 0.01 * jax.random.normal(k3, (nv,), jnp.float32)
        return qpos, qvel, {}

    def _pole_cosines(self, qpos):
        """xmat[2:, 'zz'] — pole body/bodies (skip world and cart)."""
        Rs = self.xmat(qpos)
        return Rs[2:, 2, 2], Rs[2:, 0, 2]

    def observe_dmc(self, qpos, qvel, extras):
        zz, xz = self._pole_cosines(qpos)
        position = jnp.concatenate(
            [qpos[:1], jnp.stack([zz, xz], axis=1).reshape(-1)]
        )
        return {"position": position, "velocity": qvel}

    def reward_dmc(self, qpos, qvel, action, extras):
        zz, _ = self._pole_cosines(qpos)
        cart = qpos[0]
        if self._sparse:
            cart_in = rewards.tolerance(cart, self._CART_RANGE)
            angle_in = jnp.prod(
                rewards.tolerance(zz, self._ANGLE_COSINE_RANGE)
            )
            return cart_in * angle_in
        upright = jnp.mean((zz + 1) / 2)
        centered = (1 + rewards.tolerance(cart, margin=2)) / 2
        small_control = (
            4
            + rewards.tolerance(
                action[0], margin=1, value_at_margin=0, sigmoid="quadratic"
            )
        ) / 5
        small_velocity = (
            1 + jnp.min(rewards.tolerance(qvel[1:], margin=5))
        ) / 2
        return upright * small_control * small_velocity * centered


class CheetahEnv(DmcEnv):
    """cheetah:run — init settles physics for 200 steps from random joints.

    The per-episode 200-step settle would dominate the fused auto-reset, so
    a bank of settled states is precomputed once (jitted, batched) at first
    use and resets draw uniformly from it — same distribution, sampled
    finitely (documented deviation).
    """

    DOMAIN = "cheetah"
    _RUN_SPEED = 10.0
    _BANK = 256

    def __init__(self, config):
        super().__init__(config)
        # Build the settled bank eagerly (host-side, once) — computing it
        # lazily inside a jit trace would leak tracers.
        self._settled_bank = self._build_settled_bank()

    def _build_settled_bank(self):
        keys = jax.random.split(jax.random.PRNGKey(0xC0FFEE), self._BANK)
        qpos0 = jax.vmap(self.randomize_joints)(keys)
        qvel0 = jnp.zeros((self._BANK, self.model.nv), jnp.float32)
        zero_ctrl = jnp.zeros((self._BANK, self.model.nu), jnp.float32)
        step_fn = lambda q, v, c: phys_step(
            self.model, q, v, c, self.substeps, self.contact, 200
        )
        qpos, qvel = jax.vmap(step_fn)(qpos0, qvel0, zero_ctrl)
        return jax.device_get(qpos), jax.device_get(qvel)

    def init_state(self, key):
        bank_q, bank_v = self._settled_bank
        idx = jax.random.randint(key, (), 0, self._BANK)
        qpos = jnp.asarray(bank_q, jnp.float32)[idx]
        qvel = jnp.asarray(bank_v, jnp.float32)[idx]
        return qpos, qvel, {}

    def observe_dmc(self, qpos, qvel, extras):
        return {"position": qpos[1:], "velocity": qvel}

    def reward_dmc(self, qpos, qvel, action, extras):
        speed = self.subtree_linvel_x(qpos, qvel)
        return rewards.tolerance(
            speed,
            bounds=(self._RUN_SPEED, float("inf")),
            margin=self._RUN_SPEED,
            value_at_margin=0,
            sigmoid="linear",
        )


class WalkerEnv(DmcEnv):
    """walker:{stand,walk,run}."""

    DOMAIN = "walker"
    CONTROL_TIMESTEP = 0.025
    _STAND_HEIGHT = 1.2
    _SPEEDS = {"stand": 0.0, "walk": 1.0, "run": 8.0}

    def observe_dmc(self, qpos, qvel, extras):
        Rs = self.xmat(qpos)
        orientations = jnp.stack(
            [Rs[1:, 0, 0], Rs[1:, 0, 2]], axis=1
        ).reshape(-1)
        height = self.xpos(qpos)[self.body_index("torso")][2]
        return {
            "orientations": orientations,
            "height": height[None],
            "velocity": qvel,
        }

    def reward_dmc(self, qpos, qvel, action, extras):
        torso = self.body_index("torso")
        height = self.xpos(qpos)[torso][2]
        upright = (1 + self.xmat(qpos)[torso][2, 2]) / 2
        standing = rewards.tolerance(
            height,
            bounds=(self._STAND_HEIGHT, float("inf")),
            margin=self._STAND_HEIGHT / 2,
        )
        stand_reward = (3 * standing + upright) / 4
        speed = self._SPEEDS[self.task]
        if speed == 0:
            return stand_reward
        move = rewards.tolerance(
            self.subtree_linvel_x(qpos, qvel),
            bounds=(speed, float("inf")),
            margin=speed / 2,
            value_at_margin=0.5,
            sigmoid="linear",
        )
        return stand_reward * (5 * move + 1) / 6


class HopperEnv(DmcEnv):
    """hopper:{stand,hop}.  Touch obs approximated from penalty normals."""

    DOMAIN = "hopper"
    CONTROL_TIMESTEP = 0.02
    _STAND_HEIGHT = 0.6
    _HOP_SPEED = 2.0

    def _height(self, qpos):
        from ...physics.dynamics import body_com_positions

        coms = body_com_positions(self.model, qpos)
        return (
            coms[self.body_index("torso")][2]
            - coms[self.body_index("foot")][2]
        )

    def _touch(self, qpos, qvel):
        """log1p of foot contact normal force (toe/heel spheres)."""
        from ...physics.dynamics import (
            _contact_points,
            _vel_observables,
        )
        from ...physics.kinematics import fk

        model = self.model
        foot = self.body_index("foot")
        Rs, ps = fk(model, qpos)
        centers = _contact_points(model, Rs, ps)
        _, _, v_con = _vel_observables(model, qpos, qvel)
        radius = jnp.asarray(model.con_radius, jnp.float32)
        pen = radius - centers[:, 2]
        fn = jnp.maximum(
            jnp.where(
                pen > 0,
                self.contact.kp * pen - self.contact.kd * v_con[:, 2],
                0.0,
            ),
            0.0,
        )
        is_foot = jnp.asarray(model.con_body) == foot
        foot_fn = jnp.where(is_foot, fn, 0.0)
        idx = np.nonzero(np.asarray(model.con_body) == foot)[0]
        if len(idx) >= 2:
            return jnp.log1p(jnp.stack([fn[idx[0]], fn[idx[-1]]]))
        total = jnp.sum(foot_fn)
        return jnp.log1p(jnp.stack([total, total]))

    def observe_dmc(self, qpos, qvel, extras):
        return {
            "position": qpos[1:],
            "velocity": qvel,
            "touch": self._touch(qpos, qvel),
        }

    def reward_dmc(self, qpos, qvel, action, extras):
        standing = rewards.tolerance(
            self._height(qpos), (self._STAND_HEIGHT, 2)
        )
        if self.task == "hop":
            hopping = rewards.tolerance(
                self.subtree_linvel_x(qpos, qvel),
                bounds=(self._HOP_SPEED, float("inf")),
                margin=self._HOP_SPEED / 2,
                value_at_margin=0.5,
                sigmoid="linear",
            )
            return standing * hopping
        small_control = (
            jnp.mean(
                rewards.tolerance(
                    action, margin=1, value_at_margin=0, sigmoid="quadratic"
                )
            )
            + 4
        ) / 5
        return standing * small_control


class DmcReacherEnv(DmcEnv):
    """reacher:{easy,hard} — per-episode random target in state extras."""

    DOMAIN = "reacher"
    _SIZES = {"easy": 0.05, "hard": 0.015}

    def _extras_spec(self):
        return {"target": (2,)}

    def init_state(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        qpos = self.randomize_joints(k1)
        angle = jax.random.uniform(k2, (), jnp.float32, 0, 2 * jnp.pi)
        radius = jax.random.uniform(k3, (), jnp.float32, 0.05, 0.20)
        target = jnp.stack(
            [radius * jnp.sin(angle), radius * jnp.cos(angle)]
        )
        return qpos, jnp.zeros(self.model.nv, jnp.float32), {"target": target}

    def _finger_to_target(self, qpos, extras):
        finger = self.xpos(qpos)[self.body_index("finger")][:2]
        return extras["target"] - finger

    def observe_dmc(self, qpos, qvel, extras):
        return {
            "position": qpos,
            "to_target": self._finger_to_target(qpos, extras),
            "velocity": qvel,
        }

    def reward_dmc(self, qpos, qvel, action, extras):
        radius = self._SIZES[self.task]
        dist = jnp.linalg.norm(self._finger_to_target(qpos, extras))
        return rewards.tolerance(dist, (0, radius), margin=radius)


class DmcAcrobotEnv(DmcEnv):
    """acrobot:{swingup,swingup_sparse}."""

    DOMAIN = "acrobot"

    def init_state(self, key):
        k1, k2 = jax.random.split(key)
        qpos = jnp.asarray(self.model.qpos0, jnp.float32)
        qpos = qpos.at[0].set(
            jax.random.uniform(k1, (), jnp.float32, -jnp.pi, jnp.pi)
        )
        qpos = qpos.at[1].set(
            jax.random.uniform(k2, (), jnp.float32, -jnp.pi, jnp.pi)
        )
        return qpos, jnp.zeros(self.model.nv, jnp.float32), {}

    def _arms(self, qpos):
        Rs = self.xmat(qpos)
        upper = self.body_index("upper_arm")
        lower = self.body_index("lower_arm")
        return Rs[upper], Rs[lower]

    def observe_dmc(self, qpos, qvel, extras):
        ru, rl = self._arms(qpos)
        orientations = jnp.stack(
            [ru[0, 2], rl[0, 2], ru[2, 2], rl[2, 2]]
        )
        return {"orientations": orientations, "velocity": qvel}

    def _to_target(self, qpos):
        tip = self.model.site_names.index("tip")
        target = self.model.site_names.index("target")
        sp = site_positions(self.model, qpos)
        return jnp.linalg.norm(sp[target] - sp[tip])

    def reward_dmc(self, qpos, qvel, action, extras):
        # target site radius from the model (site_size not extracted;
        # acrobot.xml target size = 0.1).
        radius = 0.1
        margin = 0.0 if self.task.endswith("sparse") else 1.0
        return rewards.tolerance(
            self._to_target(qpos), bounds=(0, radius), margin=margin
        )


class PointMassEnv(DmcEnv):
    """point_mass:{easy,hard}.

    ``hard`` randomizes the actuation per episode: each control channel
    drives a random linear combination of the two joints (dm_control sets
    the tendon ``wrap_prm`` to two random unit vectors with |cos| <= 0.9;
    here the 2x2 mix matrix lives in state extras and remaps the action).
    """

    DOMAIN = "point_mass"
    _TARGET_SIZE = 0.015

    def _extras_spec(self):
        if self.task == "hard":
            return {"gain": (2, 2)}
        return {}

    def init_state(self, key):
        k1, k2 = jax.random.split(key)
        qpos = self.randomize_joints(k1)
        extras = {}
        if self.task == "hard":
            def sample_dir(k):
                d = jax.random.normal(k, (2,), jnp.float32)
                return d / jnp.linalg.norm(d)

            ka, kb = jax.random.split(k2)
            dir1 = sample_dir(ka)

            def cond(carry):
                d2, _ = carry
                return jnp.abs(jnp.dot(dir1, d2)) > 0.9

            def body(carry):
                _, k = carry
                k, sub = jax.random.split(k)
                return sample_dir(sub), k

            kb, sub0 = jax.random.split(kb)
            dir2, _ = jax.lax.while_loop(
                cond, body, (sample_dir(sub0), kb)
            )
            # Columns are the actuation directions: qfrc = gain @ u.
            extras["gain"] = jnp.stack([dir1, dir2], axis=1)
        return qpos, jnp.zeros(self.model.nv, jnp.float32), extras

    def transform_action(self, action, extras):
        if self.task == "hard":
            return extras["gain"] @ action
        return action

    def observe_dmc(self, qpos, qvel, extras):
        return {"position": qpos, "velocity": qvel}

    def reward_dmc(self, qpos, qvel, action, extras):
        # Target geom sits at the origin (point_mass.xml).
        mass_pos = self.xpos(qpos)[self.body_index("pointmass")][:2]
        dist = jnp.linalg.norm(mass_pos)
        near = rewards.tolerance(
            dist, (0, self._TARGET_SIZE), margin=self._TARGET_SIZE
        )
        control = jnp.mean(
            rewards.tolerance(
                action, margin=1, value_at_margin=0, sigmoid="quadratic"
            )
        )
        return near * (control + 4) / 5


class SwimmerEnv(DmcEnv):
    """swimmer:{swimmer6,swimmer15} — procedurally generated n-link chain.

    Behavioral reference: ``dm_control/suite/swimmer.py`` (installed; also
    the alignment oracle) and ``envpool/mujoco/dmc`` which ports it.  The
    swimmer is propelled purely by the MuJoCo inertia-box fluid model
    (density 3000), which this build's physics implements term-exactly.
    Target position is a per-episode model edit in dm_control — here it
    lives in state extras.  Observations: joints ``qpos[3:]``, nose→target
    in the head frame (xy), and per-body local [vx, vy, ωz] at the body
    origins (the suite's velocimeter/gyro sites).
    """

    DOMAIN = "swimmer"
    CONTROL_TIMESTEP = 0.03
    DEFAULT_CONFIG = dict(DmcEnv.DEFAULT_CONFIG)
    DEFAULT_CONFIG.update({"n_links": 6})
    _TARGET_SIZE = 0.1

    def _load_model(self):
        import mujoco
        from dm_control.suite import common, swimmer

        xml = swimmer._make_model(int(self.config["n_links"]))
        m = mujoco.MjModel.from_xml_string(xml.decode(), common.ASSETS)
        from ...physics import from_mj_model

        return from_mj_model(m), m

    def __init__(self, config):
        super().__init__(config)
        import mujoco

        m = self._mj_model
        gid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_GEOM, "nose")
        self._nose_off = np.array(m.geom_pos[gid], np.float32)
        self._nose_body = int(m.geom_bodyid[gid])
        tid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_GEOM, "target")
        self._target_z = float(m.geom_pos[tid][2])

    def _extras_spec(self):
        return {"target": (2,)}

    def init_state(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        qpos = self.randomize_joints(k1)
        close = jax.random.uniform(k2) < 0.2
        box = jnp.where(close, 0.3, 2.0)
        target = jax.random.uniform(k3, (2,), jnp.float32, -1.0, 1.0) * box
        return qpos, jnp.zeros(self.model.nv, jnp.float32), {"target": target}

    def _nose_to_target(self, qpos, extras):
        Rs, ps = self._fk(qpos)
        head = self._nose_body
        nose = ps[head] + Rs[head] @ jnp.asarray(self._nose_off)
        target = jnp.concatenate(
            [extras["target"], jnp.asarray([self._target_z], jnp.float32)]
        )
        return ((target - nose) @ Rs[head])[:2]

    def _fk(self, qpos):
        from ...physics.kinematics import fk

        return fk(self.model, qpos)

    def _body_velocities(self, qpos, qvel):
        from ...physics.dynamics import _vel_observables, body_com_positions

        v_com, omega, _ = _vel_observables(self.model, qpos, qvel)
        Rs, ps = self._fk(qpos)
        coms = body_com_positions(self.model, qpos)
        out = []
        for b in range(1, len(self.model.body_names)):  # skip world
            v_origin = v_com[b] + jnp.cross(omega[b], ps[b] - coms[b])
            v_local = Rs[b].T @ v_origin
            w_local = Rs[b].T @ omega[b]
            out.append(jnp.stack([v_local[0], v_local[1], w_local[2]]))
        return jnp.concatenate(out)

    def observe_dmc(self, qpos, qvel, extras):
        return {
            "joints": qpos[3:],
            "to_target": self._nose_to_target(qpos, extras),
            "body_velocities": self._body_velocities(qpos, qvel),
        }

    def reward_dmc(self, qpos, qvel, action, extras):
        dist = jnp.linalg.norm(self._nose_to_target(qpos, extras))
        return rewards.tolerance(
            dist,
            bounds=(0, self._TARGET_SIZE),
            margin=5 * self._TARGET_SIZE,
            sigmoid="long_tail",
        )
