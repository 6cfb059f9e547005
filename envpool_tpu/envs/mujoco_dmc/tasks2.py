"""dm_control suite tasks, wave 2: ball_in_cup, fish, lqr, humanoid(+CMU).

Behavioral reference: the dm_control suite task sources (rewards and
observations mirrored exactly; initialization randomizers mirrored except
for collision-rejection loops, which the penalty-contact engine resolves
on the first steps instead) and ``envpool/mujoco/dmc/*`` for the
reference's C++ ports.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import rewards
from .base import DmcEnv
from ...physics import from_mj_model
from ...physics.dynamics import _vel_observables
from ...physics.kinematics import fk


class BallInCupEnv(DmcEnv):
    """ball_in_cup:catch — sparse reward when the ball sits in the cup.

    The string is the limited spatial tendon (penalty-range force in the
    physics engine); dm_control's collision-rejection initializer is
    replaced by resampling positions outside the cup interior.
    """

    DOMAIN = "ball_in_cup"
    CONTROL_TIMESTEP = 0.02

    def __init__(self, config):
        super().__init__(config)
        m = self._mj_model
        import mujoco

        sid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_SITE, "target")
        gid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_GEOM, "ball")
        self._target_site = sid
        self._target_size_xz = m.site_size[sid][[0, 2]].copy()
        self._ball_radius = float(m.geom_size[gid][0])
        self._ball_body = self.body_index("ball")
        self._target_body = int(m.site_bodyid[sid])
        self._target_local = m.site_pos[sid].copy()

    def init_state(self, key):
        kx, kz = jax.random.split(key)
        qpos = jnp.asarray(self.model.qpos0, jnp.float32)
        # qpos layout: cup_x, cup_z, ball_x, ball_z (slide joints).
        qpos = qpos.at[2].set(
            jax.random.uniform(kx, (), jnp.float32, -0.2, 0.2)
        )
        qpos = qpos.at[3].set(
            jax.random.uniform(kz, (), jnp.float32, 0.2, 0.5)
        )
        return qpos, jnp.zeros(self.model.nv, jnp.float32), {}

    def _ball_to_target_xz(self, qpos):
        Rs, ps = fk(self.model, qpos)
        target = ps[self._target_body] + Rs[self._target_body] @ jnp.asarray(
            self._target_local, jnp.float32
        )
        ball = ps[self._ball_body]
        return (target - ball)[jnp.asarray([0, 2])]

    def observe_dmc(self, qpos, qvel, extras):
        return {"position": qpos, "velocity": qvel}

    def reward_dmc(self, qpos, qvel, action, extras):
        d = jnp.abs(self._ball_to_target_xz(qpos))
        bound = (
            jnp.asarray(self._target_size_xz, jnp.float32)
            - self._ball_radius
        )
        return jnp.all(d < bound).astype(jnp.float32)


class FishEnv(DmcEnv):
    """fish:{upright,swim} — 3D swimming with the inertia-box fluid model."""

    DOMAIN = "fish"
    CONTROL_TIMESTEP = 0.04
    _JOINT_NAMES = [
        "tail1",
        "tail_twist",
        "tail2",
        "finright_roll",
        "finright_pitch",
        "finleft_roll",
        "finleft_pitch",
    ]

    def __init__(self, config):
        super().__init__(config)
        m = self._mj_model
        import mujoco

        jids = [
            mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, n)
            for n in self._JOINT_NAMES
        ]
        self._joint_qadr = np.asarray([m.jnt_qposadr[j] for j in jids])
        self._joint_dadr = np.asarray([m.jnt_dofadr[j] for j in jids])
        gm = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_GEOM, "mouth")
        gt = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_GEOM, "target")
        self._mouth_body = int(m.geom_bodyid[gm])
        self._mouth_local = m.geom_pos[gm].copy()
        self._mouth_quat = m.geom_quat[gm].copy()
        self._radii = float(m.geom_size[gm][0] + m.geom_size[gt][0])
        self._torso = self.body_index("torso")

    def _extras_spec(self):
        if self.task == "swim":
            return {"target": (3,)}
        return {}

    def init_state(self, key):
        kq, kj, kt = jax.random.split(key, 3)
        qpos = jnp.asarray(self.model.qpos0, jnp.float32)
        quat = jax.random.normal(kq, (4,), jnp.float32)
        quat = quat / jnp.linalg.norm(quat)
        qpos = qpos.at[3:7].set(quat)
        vals = jax.random.uniform(
            kj, (len(self._joint_qadr),), jnp.float32, -0.2, 0.2
        )
        qpos = qpos.at[jnp.asarray(self._joint_qadr)].set(vals)
        extras = {}
        if self.task == "swim":
            t = jax.random.uniform(
                kt, (3,), jnp.float32,
                jnp.asarray([-0.4, -0.4, 0.1]),
                jnp.asarray([0.4, 0.4, 0.3]),
            )
            extras["target"] = t
        return qpos, jnp.zeros(self.model.nv, jnp.float32), extras

    def _upright(self, qpos):
        return self.xmat(qpos)[self._torso][2, 2]

    def _mouth_to_target(self, qpos, extras):
        from ...physics.kinematics import quat2mat

        Rs, ps = fk(self.model, qpos)
        Rm = Rs[self._mouth_body] @ quat2mat(
            jnp.asarray(self._mouth_quat, jnp.float32)
        )
        mouth = ps[self._mouth_body] + Rs[self._mouth_body] @ jnp.asarray(
            self._mouth_local, jnp.float32
        )
        return (extras["target"] - mouth) @ Rm

    def observe_dmc(self, qpos, qvel, extras):
        obs = {
            "joint_angles": qpos[jnp.asarray(self._joint_qadr)],
            "upright": self._upright(qpos),
        }
        if self.task == "swim":
            obs["target"] = self._mouth_to_target(qpos, extras)
        obs["velocity"] = qvel
        return obs

    def reward_dmc(self, qpos, qvel, action, extras):
        if self.task == "upright":
            return rewards.tolerance(
                self._upright(qpos), bounds=(1.0, 1.0), margin=1.0
            )
        in_target = rewards.tolerance(
            jnp.linalg.norm(self._mouth_to_target(qpos, extras)),
            bounds=(0, self._radii),
            margin=2 * self._radii,
        )
        is_upright = 0.5 * (self._upright(qpos) + 1)
        return (7 * in_target + is_upright) / 8


@functools.lru_cache(maxsize=8)
def _lqr_model(n_bodies: int, n_actuators: int, gen_seed: int):
    import mujoco
    from dm_control.suite import common
    from dm_control.suite import lqr as dmc_lqr

    xml = dmc_lqr._make_model(
        n_bodies, n_actuators, np.random.RandomState(gen_seed)
    )
    m = mujoco.MjModel.from_xml_string(
        xml.decode() if isinstance(xml, bytes) else xml, common.ASSETS
    )
    return from_mj_model(m), m


class LqrEnv(DmcEnv):
    """lqr:{lqr_2_1,lqr_6_2} — procedurally generated linear system.

    reward = 1 − ½(|qpos|² + c·|u|²); terminates (discount 0) when the
    state norm falls below 1e-6 (dm_control ``LQRLevel``).
    """

    DOMAIN = "lqr"
    _COST_COEF = 0.1
    DEFAULT_CONFIG = dict(DmcEnv.DEFAULT_CONFIG, gen_seed=42)

    def _load_model(self):
        n_bodies, n_act = {
            "lqr_2_1": (2, 1),
            "lqr_6_2": (6, 2),
        }[str(self.config["task_name"])]
        return _lqr_model(n_bodies, n_act, int(self.config["gen_seed"]))

    def init_state(self, key):
        unit = jax.random.normal(key, (self.model.nq,), jnp.float32)
        qpos = jnp.sqrt(2.0) * unit / jnp.linalg.norm(unit)
        return qpos, jnp.zeros(self.model.nv, jnp.float32), {}

    def observe_dmc(self, qpos, qvel, extras):
        return {"position": qpos, "velocity": qvel}

    def reward_dmc(self, qpos, qvel, action, extras):
        state_cost = 0.5 * jnp.dot(qpos, qpos)
        ctrl_cost = 0.5 * jnp.dot(action, action)
        return 1.0 - (state_cost + ctrl_cost * self._COST_COEF)

    def terminated_dmc(self, qpos, qvel, extras):
        norm = jnp.sqrt(jnp.dot(qpos, qpos) + jnp.dot(qvel, qvel))
        return norm < 1e-6


class DmcHumanoidEnv(DmcEnv):
    """humanoid:{stand,walk,run,run_pure_state}."""

    DOMAIN = "humanoid"
    CONTROL_TIMESTEP = 0.025
    _STAND_HEIGHT = 1.4
    _SPEEDS = {"stand": 0.0, "walk": 1.0, "run": 10.0, "run_pure_state": 10.0}
    DEFAULT_CONFIG = dict(DmcEnv.DEFAULT_CONFIG, substeps=2)

    _TORSO = "torso"
    _HEAD = "head"
    _LIMBS = ("left_hand", "left_foot", "right_hand", "right_foot")
    _UPRIGHT_INDEX = (2, 2)  # xmat zz

    def __init__(self, config):
        super().__init__(config)
        self._torso = self.body_index(self._TORSO)
        self._head = self.body_index(self._HEAD)
        self._limbs = [self.body_index(n) for n in self._LIMBS]

    def _com_velocity(self, qpos, qvel):
        v_com, _, _ = _vel_observables(self.model, qpos, qvel)
        m = jnp.asarray(self.model.body_mass, jnp.float32)
        return (m @ v_com) / m.sum()

    def observe_dmc(self, qpos, qvel, extras):
        if self.task == "run_pure_state":
            return {"position": qpos, "velocity": qvel}
        Rs, ps = fk(self.model, qpos)
        torso_R = Rs[self._torso]
        torso_p = ps[self._torso]
        ext = jnp.concatenate(
            [(ps[b] - torso_p) @ torso_R for b in self._limbs]
        )
        return {
            "joint_angles": qpos[7:],
            "head_height": ps[self._head][2],
            "extremities": ext,
            "torso_vertical": torso_R[2, :],
            "com_velocity": self._com_velocity(qpos, qvel),
            "velocity": qvel,
        }

    def _upright(self, Rs):
        i, j = self._UPRIGHT_INDEX
        return Rs[self._torso][i, j]

    def reward_dmc(self, qpos, qvel, action, extras):
        Rs, ps = fk(self.model, qpos)
        standing = rewards.tolerance(
            ps[self._head][2],
            bounds=(self._STAND_HEIGHT, float("inf")),
            margin=self._STAND_HEIGHT / 4,
        )
        upright = rewards.tolerance(
            self._upright(Rs),
            bounds=(0.9, float("inf")),
            sigmoid="linear",
            margin=1.9,
            value_at_margin=0,
        )
        stand_reward = standing * upright
        small_control = jnp.mean(
            rewards.tolerance(
                action, margin=1, value_at_margin=0, sigmoid="quadratic"
            )
        )
        small_control = (4 + small_control) / 5
        com_v = self._com_velocity(qpos, qvel)[:2]
        speed = self._SPEEDS[self.task]
        if speed == 0.0:
            dont_move = jnp.mean(rewards.tolerance(com_v, margin=2))
            return small_control * stand_reward * dont_move
        move = rewards.tolerance(
            jnp.linalg.norm(com_v),
            bounds=(speed, float("inf")),
            margin=speed,
            value_at_margin=0,
            sigmoid="linear",
        )
        move = (5 * move + 1) / 6
        return small_control * stand_reward * move


class HumanoidCMUEnv(DmcHumanoidEnv):
    """humanoid_CMU:{stand,walk,run} — 56-actuator CMU skeleton.

    Same reward family as humanoid but upright = thorax ``zy`` projection
    (dm_control humanoid_CMU.Physics.thorax_upright).
    """

    DOMAIN = "humanoid_CMU"
    CONTROL_TIMESTEP = 0.02
    _SPEEDS = {"stand": 0.0, "walk": 1.0, "run": 10.0}

    _TORSO = "thorax"
    _HEAD = "head"
    _LIMBS = ("lhand", "lfoot", "rhand", "rfoot")
    _UPRIGHT_INDEX = (2, 1)  # xmat zy

    def init_state(self, key):
        qpos = self.randomize_joints(key)
        return qpos, jnp.zeros(self.model.nv, jnp.float32), {}


class FingerEnv(DmcEnv):
    """finger:{spin,turn_easy,turn_hard} — needs body-body contacts
    (fingertip capsule vs spinner capsules, ``physics.model`` pair list).

    Touch sensor approximation: MuJoCo's touch sensors integrate contact
    normal force inside the sensor site volume; here the two values are
    the penalty normal forces of the (fingertip, cap1/cap2) pairs,
    log1p-scaled like dm_control ``Physics.touch``.
    """

    DOMAIN = "finger"
    CONTROL_TIMESTEP = 0.02
    _EASY_RADIUS = 0.07
    _HARD_RADIUS = 0.03
    _SPIN_VELOCITY = 15.0
    DEFAULT_CONFIG = dict(DmcEnv.DEFAULT_CONFIG, substeps=2)

    def __init__(self, config):
        super().__init__(config)
        import dataclasses as _dc
        import mujoco

        m = self._mj_model
        # Spin sets hinge damping to 0.03 at episode init; static here.
        hinge = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, "hinge")
        self._hinge_dof = int(m.jnt_dofadr[hinge])
        self._hinge_qadr = int(m.jnt_qposadr[hinge])
        damping = np.asarray(self.model.dof_damping).copy()
        if self.task == "spin":
            damping[self._hinge_dof] = 0.03
        self.model = _dc.replace(self.model, dof_damping=damping)
        self.contact = self.contact._replace(pairs=True)
        # Geometry for tip/target relative to the spinner hinge anchor.
        self._spinner_body = self.body_index("spinner")
        tip = m.site("tip")
        self._tip_local = tip.pos.copy()
        cap1 = m.geom("cap1")
        self._turn_radius = float(cap1.size[0] + cap1.size[1])
        self._hinge_anchor_local = m.jnt_pos[hinge].copy()
        prox = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, "proximal")
        dist = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, "distal")
        self._prox_qadr = int(m.jnt_qposadr[prox])
        self._dist_qadr = int(m.jnt_qposadr[dist])
        self._prox_dof = int(m.jnt_dofadr[prox])
        self._dist_dof = int(m.jnt_dofadr[dist])
        # Touch channels: the (fingertip, cap1/cap2) pairs — fingertip is
        # on the distal body.  Order = (touchtop=cap1, touchbottom=cap2).
        distal_body = self.body_index("distal")
        self._touch_pairs = [
            i
            for i in range(len(self.model.pair_body))
            if int(self.model.pair_body[i][0]) == distal_body
        ][:2]

    def _extras_spec(self):
        if self.task != "spin":
            return {"target": (2,)}  # (x, z) relative to hinge anchor
        return {}

    def init_state(self, key):
        k1, k2 = jax.random.split(key)
        qpos = self.randomize_joints(k1)
        extras = {}
        if self.task != "spin":
            angle = jax.random.uniform(k2, (), jnp.float32, -jnp.pi, jnp.pi)
            extras["target"] = self._turn_radius * jnp.stack(
                [jnp.sin(angle), jnp.cos(angle)]
            )
        return qpos, jnp.zeros(self.model.nv, jnp.float32), extras

    def _hinge_anchor(self, qpos):
        Rs, ps = fk(self.model, qpos)
        b = self._spinner_body
        return ps[b] + Rs[b] @ jnp.asarray(
            self._hinge_anchor_local, jnp.float32
        ), (Rs, ps)

    def _tip_rel(self, qpos):
        """(x, z) of the tip site relative to the hinge anchor."""
        anchor, (Rs, ps) = self._hinge_anchor(qpos)
        b = self._spinner_body
        tip = ps[b] + Rs[b] @ jnp.asarray(self._tip_local, jnp.float32)
        rel = tip - anchor
        return rel[jnp.asarray([0, 2])]

    def _touch(self, qpos, qvel):
        """log1p normal forces of the fingertip/spinner pairs."""
        from ...physics.dynamics import _kin, _pair_fn

        forces = _pair_fn(self.model, qpos, qvel, self.contact)
        return jnp.log1p(forces[jnp.asarray(self._touch_pairs)])

    def observe_dmc(self, qpos, qvel, extras):
        pos = jnp.stack(
            [qpos[self._prox_qadr], qpos[self._dist_qadr]]
        )
        tip = self._tip_rel(qpos)
        obs = {
            "position": jnp.concatenate([pos, tip]),
            "velocity": jnp.stack(
                [
                    qvel[self._prox_dof],
                    qvel[self._dist_dof],
                    qvel[self._hinge_dof],
                ]
            ),
            "touch": self._touch(qpos, qvel),
        }
        if self.task != "spin":
            obs["target_position"] = extras["target"]
            obs["dist_to_target"] = self._dist_to_target(qpos, extras)
        return obs

    def _dist_to_target(self, qpos, extras):
        radius = (
            self._EASY_RADIUS if self.task == "turn_easy"
            else self._HARD_RADIUS
        )
        return (
            jnp.linalg.norm(extras["target"] - self._tip_rel(qpos)) - radius
        )

    def reward_dmc(self, qpos, qvel, action, extras):
        if self.task == "spin":
            return (
                qvel[self._hinge_dof] <= -self._SPIN_VELOCITY
            ).astype(jnp.float32)
        return (self._dist_to_target(qpos, extras) <= 0).astype(jnp.float32)
