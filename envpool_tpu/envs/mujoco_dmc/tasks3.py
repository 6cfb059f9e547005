"""dm_control suite wave 3: Quadruped, Manipulator, Stacker, Dog.

Behavioral reference: ``envpool/mujoco/dmc`` (C++ ports) and the
dm_control suite sources (the alignment oracle, installed in-image).
Models are built with dm_control's own XML generators
(``quadruped.make_model`` etc.) so geometry/actuator constants match the
oracle exactly; dynamics run on ``envpool_tpu.physics``.

Engine notes:
* Quadruped's position actuators are affine-bias servos with first-order
  activation filters (tau 0.1); the servo runs in-engine
  (``physics.dynamics._actuator_forces``), the filter is integrated
  analytically per control step (exact for piecewise-constant ctrl).
* Escape's procedural heightfield terrain is approximated as flat
  (documented) — rangefinder obs read the no-intersection value and the
  escape reward keeps its exact tolerance form on origin distance.
* Force/torque toe sensors are approximated from the penalty-contact
  normal forces (z-component only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...core.env import EnvOut
from ...physics import from_mj_model
from ...physics.dynamics import step as phys_step
from ...physics.kinematics import fk
from .base import DmcEnv
from .rewards import tolerance


@functools.lru_cache(maxsize=8)
def _quadruped_model(task: str):
    import mujoco
    from dm_control.suite import common, quadruped

    if task in ("walk", "run"):
        speed = 0.5 if task == "walk" else 5.0
        xml = quadruped.make_model(floor_size=20 * speed)
    elif task == "escape":
        xml = quadruped.make_model(
            floor_size=40, terrain=True, rangefinders=True
        )
    else:  # fetch
        xml = quadruped.make_model(walls_and_ball=True)
    m = mujoco.MjModel.from_xml_string(xml.decode(), common.ASSETS)
    return from_mj_model(m), m


class QuadrupedEnv(DmcEnv):
    """quadruped:{walk,run,escape,fetch}."""

    DOMAIN = "quadruped"
    CONTROL_TIMESTEP = 0.02
    DEFAULT_CONFIG = dict(DmcEnv.DEFAULT_CONFIG, substeps=2)

    _TOES = ("toe_front_left", "toe_back_left", "toe_back_right",
             "toe_front_right")

    def _load_model(self):
        return _quadruped_model(str(self.config["task_name"]) or "walk")

    def __init__(self, config):
        super().__init__(config)
        import mujoco

        m = self._mj_model
        hinges = [
            j for j in range(m.njnt)
            if int(m.jnt_type[j]) == 3  # hinge
        ]
        self._hinge_qadr = np.asarray([m.jnt_qposadr[j] for j in hinges])
        self._hinge_dadr = np.asarray([m.jnt_dofadr[j] for j in hinges])
        self._torso = self.body_index("torso")
        self._toe_bodies = [self.body_index(t) for t in self._TOES]
        # Activation filter constants (dyntype 2, tau = dynprm[0]).
        tau = float(self.model.act_dynprm[0])
        T = self.control_dt
        self._act_decay = float(np.exp(-T / tau))
        self._act_mean_w = float(tau / T * (1.0 - np.exp(-T / tau)))
        sid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_SITE, "workspace")
        self._workspace_body = int(m.site_bodyid[sid])
        self._workspace_local = m.site_pos[sid].copy()
        self._workspace_r = float(m.site_size[sid][0])
        if self.task == "escape":
            self._terrain_size = float(m.hfield_size[0][0])
            self._n_rf = int(
                np.sum(m.sensor_type == mujoco.mjtSensor.mjSENS_RANGEFINDER)
            )
        if self.task == "fetch":
            self._ball = self.body_index("ball")
            self._ball_qadr = int(
                m.jnt_qposadr[
                    mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, "ball_root")
                ]
            )
            self._ball_dadr = int(
                m.jnt_dofadr[
                    mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, "ball_root")
                ]
            )
            tsid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_SITE, "target")
            self._target_r = float(m.site_size[tsid][0])
            gf = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_GEOM, "floor")
            gb = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_GEOM, "ball")
            self._arena_radius = float(m.geom_size[gf][0]) * np.sqrt(2)
            self._ball_r = float(m.geom_size[gb][0])
            self._root_dadr = 0
        # Root free joint qpos address.
        self._root_qadr = 0
        from ...physics import ContactParams

        self.contact = ContactParams(
            kp=float(config["contact_kp"]),
            kd=float(config["contact_kd"]),
            pairs=(self.task == "fetch"),
        )

    # -- episode init ------------------------------------------------------

    def _drop_height(self, qpos):
        """Smallest root z with no floor contact (1 cm grid upward), the
        closed form of dm_control's _find_non_contacting_height."""
        from ...physics.dynamics import _contact_points

        Rs, ps = fk(self.model, qpos)
        centers = _contact_points(self.model, Rs, ps)
        radius = jnp.asarray(self.model.con_radius, jnp.float32)
        lowest = jnp.min(centers[:, 2] - radius)
        need = -lowest  # raise so the lowest sphere clears z=0
        return jnp.ceil(jnp.maximum(need, 0.0) / 0.01) * 0.01 + 0.01

    def init_state(self, key):
        kq, kb, ka = jax.random.split(key, 3)
        qpos = jnp.asarray(self.model.qpos0, jnp.float32)
        if self.task == "fetch":
            # Random azimuth + horizontal position (quadruped.Fetch).
            k1, k2, k3 = jax.random.split(kq, 3)
            az = jax.random.uniform(k1, (), jnp.float32, 0, 2 * jnp.pi)
            quat = jnp.stack(
                [jnp.cos(az / 2), 0.0 * az, 0.0 * az, jnp.sin(az / 2)]
            )
            spawn = 0.5 * self._terrain_or_floor()
            xy = jax.random.uniform(k2, (2,), jnp.float32, -spawn, spawn)
            qpos = qpos.at[0:2].set(xy)
        else:
            quat = jax.random.normal(kq, (4,), jnp.float32)
            quat = quat / jnp.linalg.norm(quat)
        qpos = qpos.at[3:7].set(quat)
        z = self._drop_height(qpos)
        qpos = qpos.at[2].set(z)
        extras = {"act": jnp.zeros(self.model.nu, jnp.float32),
                  "prev_v": jnp.zeros(3, jnp.float32)}
        if self.task == "fetch":
            # Ball: random position and velocity (quadruped.Fetch).
            k4, k5 = jax.random.split(kb)
            bxy = jax.random.uniform(
                k4, (2,), jnp.float32, -spawn, spawn
            )
            qpos = qpos.at[self._ball_qadr : self._ball_qadr + 2].set(bxy)
            qpos = qpos.at[self._ball_qadr + 2].set(2.0)
        return qpos, jnp.zeros(self.model.nv, jnp.float32), extras

    def _terrain_or_floor(self):
        if self.task == "fetch":
            return self._arena_radius / np.sqrt(2)
        return 10.0

    def _extras_spec(self):
        return {"act": (self.model.nu,), "prev_v": (3,)}

    # -- observables -------------------------------------------------------

    def _torso_R(self, qpos):
        return self.xmat(qpos)[self._torso]

    def observe_dmc(self, qpos, qvel, extras):
        from ...physics.kinematics import body_vel

        (Rs, ps), (omega, vels) = body_vel(self.model, qpos, qvel)
        R = Rs[self._torso]
        obs = {
            "egocentric_state": jnp.concatenate(
                [
                    qpos[jnp.asarray(self._hinge_qadr)],
                    qvel[jnp.asarray(self._hinge_dadr)],
                    extras["act"],
                ]
            ),
            "torso_velocity": vels[self._torso] @ R,
            "torso_upright": R[2, 2],
            "imu": jnp.concatenate(
                [
                    qvel[3:6],  # gyro: body-frame angular velocity
                    ((vels[self._torso] - extras["prev_v"]) / self.control_dt
                     - jnp.asarray([0.0, 0.0, -9.81])) @ R,
                ]
            ),
            "force_torque": self._force_torque(qpos, qvel, Rs, ps),
        }
        if self.task == "escape":
            obs["origin"] = -(ps[self._torso] @ R)
            obs["rangefinder"] = jnp.ones(self._n_rf, jnp.float32)
        if self.task == "fetch":
            ball_rel_pos = ps[self._ball] - ps[self._torso]
            ball_rel_vel = (
                qvel[self._ball_dadr : self._ball_dadr + 3] - qvel[0:3]
            )
            ball_rot_vel = qvel[self._ball_dadr + 3 : self._ball_dadr + 6]
            obs["ball_state"] = (
                jnp.stack([ball_rel_pos, ball_rel_vel, ball_rot_vel]) @ R
            ).reshape(-1)
            target = jnp.zeros(3, jnp.float32)  # target site at origin
            obs["target_position"] = (target - ps[self._torso]) @ R
        return obs

    def _force_torque(self, qpos, qvel, Rs, ps):
        """arcsinh-scaled toe force/torque: penalty normal force on z."""
        from ...physics.dynamics import _contact_points

        centers = _contact_points(self.model, Rs, ps)
        radius = jnp.asarray(self.model.con_radius, jnp.float32)
        pen = radius - centers[:, 2]
        fn = jnp.maximum(self.contact.kp * pen, 0.0)
        cb = np.asarray(self.model.con_body)
        out = []
        for tb in self._toe_bodies:
            idx = np.flatnonzero(cb == tb)
            f = fn[jnp.asarray(idx)].sum() if len(idx) else jnp.float32(0.0)
            out.append(jnp.stack([0.0 * f, 0.0 * f, f]))
            out.append(jnp.zeros(3, jnp.float32))  # torque
        return jnp.arcsinh(jnp.concatenate(out))

    # -- stepping with activation filter -----------------------------------

    def step_env(self, state, action, key):
        action = jnp.reshape(action, (self.model.nu,)).astype(jnp.float32)
        act = state["extras"]["act"]
        ctrl_eff = action + (act - action) * self._act_mean_w
        act_next = action + (act - action) * self._act_decay
        from ...physics.kinematics import body_vel

        qpos, qvel = phys_step(
            self.model,
            state["qpos"],
            state["qvel"],
            ctrl_eff,
            self.substeps,
            self.contact,
            self.n_sub_steps,
        )
        (_, _), (_, vels) = body_vel(self.model, qpos, qvel)
        extras = {
            "act": act_next,
            "prev_v": state["extras"].get("prev_v", jnp.zeros(3, jnp.float32)),
        }
        # prev_v for the accelerometer: velocity before this step.
        (_, _), (_, vels_prev) = body_vel(
            self.model, state["qpos"], state["qvel"]
        )
        extras["prev_v"] = vels_prev[self._torso]
        st = {"qpos": qpos, "qvel": qvel, "extras": extras}
        reward = self.reward_dmc(qpos, qvel, action, extras)
        return EnvOut(
            state=st,
            obs=self._obs_dict(st),
            reward=jnp.asarray(reward, jnp.float32),
            terminated=jnp.bool_(False),
            discount=jnp.float32(1.0),
        )

    # -- rewards -----------------------------------------------------------

    def _upright_reward(self, qpos, deviation_angle=0.0):
        deviation = float(np.cos(np.deg2rad(deviation_angle)))
        return tolerance(
            self._torso_R(qpos)[2, 2],
            bounds=(deviation, float("inf")),
            sigmoid="linear",
            margin=1 + deviation,
            value_at_margin=0.0,
        )

    def reward_dmc(self, qpos, qvel, action, extras):
        from ...physics.kinematics import body_vel

        (Rs, ps), (_, vels) = body_vel(self.model, qpos, qvel)
        R = Rs[self._torso]
        if self.task in ("walk", "run"):
            speed = 0.5 if self.task == "walk" else 5.0
            vx = (vels[self._torso] @ R)[0]
            move = tolerance(
                vx,
                bounds=(speed, float("inf")),
                margin=speed,
                value_at_margin=0.5,
                sigmoid="linear",
            )
            return self._upright_reward(qpos) * move
        if self.task == "escape":
            ws = ps[self._workspace_body] + Rs[
                self._workspace_body
            ] @ jnp.asarray(self._workspace_local, jnp.float32)
            escape = tolerance(
                jnp.linalg.norm(ws),
                bounds=(self._terrain_size, float("inf")),
                margin=self._terrain_size,
                value_at_margin=0.0,
                sigmoid="linear",
            )
            return self._upright_reward(qpos, 20.0) * escape
        # fetch
        ws = ps[self._workspace_body] + Rs[self._workspace_body] @ jnp.asarray(
            self._workspace_local, jnp.float32
        )
        ball = ps[self._ball]
        reach = tolerance(
            jnp.linalg.norm((ws - ball)[:2]),
            bounds=(0.0, self._workspace_r + self._ball_r),
            sigmoid="linear",
            margin=self._arena_radius,
            value_at_margin=0.0,
        )
        fetch_r = tolerance(
            jnp.linalg.norm(ball[:2]),  # target site at the origin
            bounds=(0.0, self._target_r),
            sigmoid="linear",
            margin=self._arena_radius,
            value_at_margin=0.0,
        )
        return self._upright_reward(qpos) * reach * (0.5 + 0.5 * fetch_r)
