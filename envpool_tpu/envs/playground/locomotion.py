"""Playground locomotion tasks: joystick tracking, getup, handstand.

Reference behavior: ``envpool/mujoco/playground/register_*.cc`` — the
standard mujoco_playground locomotion recipe:

* action = PD targets ``default_pose + action_scale * a`` on the
  actuated joints;
* observation = [gravity-projected orientation, gyro, joint pos - default,
  joint vel, previous action, command(3)] (joystick) or without the
  command (getup/handstand);
* reward = exp-tracking of commanded linear/angular velocity plus the
  registered penalty terms (z velocity, xy angular velocity, action
  rate, pose), or upright/height terms for getup/handstand.

Stand-in morphologies (see package docstring): quadruped tasks step the
dm_control quadruped model, humanoid tasks the dm_control humanoid —
actuator counts are padded/truncated to the real robot's action_dim so
the agent-facing spec matches the reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec
from ...physics import ContactParams, from_mj_model
from ...physics.dynamics import step as phys_step
from ...physics.kinematics import body_vel, fk

# Real robots' actuated-joint counts (agent-facing action_dim).
ROBOT_NU = {
    "go1": 12, "barkour": 12, "spot": 12,
    "g1": 23, "h1": 19, "apollo": 22, "berkeley_humanoid": 12,
    "op3": 20, "t1": 23,
}
_QUADRUPEDS = ("go1", "barkour", "spot")


@functools.lru_cache(maxsize=4)
def _base_model(kind: str):
    import mujoco

    if kind == "go1":
        from .go1_model import go1_xml

        m = mujoco.MjModel.from_xml_string(go1_xml())
        return from_mj_model(m), m
    if kind in ("spot", "h1", "g1"):
        from .robot_models import ROBOT_SPECS

        m = mujoco.MjModel.from_xml_string(ROBOT_SPECS[kind][0]())
        return from_mj_model(m), m
    if kind == "quadruped":
        from dm_control.suite import common, quadruped

        xml = quadruped.make_model(floor_size=20.0)
        m = mujoco.MjModel.from_xml_string(xml.decode(), common.ASSETS)
    else:
        import os

        import dm_control.suite as suite
        from dm_control.suite import common
        from dm_control.utils import io as dmc_io

        base = os.path.dirname(suite.__file__)
        xml = dmc_io.GetResource(os.path.join(base, "humanoid.xml"))
        m = mujoco.MjModel.from_xml_string(xml.decode(), common.ASSETS)
    return from_mj_model(m), m


class _LocomotionBase(TpuEnv):
    DEFAULT_CONFIG = {
        "robot": "go1",
        "ctrl_dt": 0.02,
        "sim_dt": 0.004,
        "action_repeat": 1,
        "action_scale": 0.5,
        "kp": 35.0,
        "kd": 0.5,
        "history_len": 1,
        "obs_noise_level": 0.0,
        "tracking_lin_vel_scale": 1.0,
        "tracking_ang_vel_scale": 0.5,
        "feet_phase_scale": 0.0,
        "ang_vel_xy_scale": -0.05,
        "lin_vel_z_scale": -0.5,
        "action_rate_scale": -0.01,
        "pose_scale": 0.0,
        "hip_splay_scale": 0.0,
        "energy_scale": 0.0,
        "orientation_scale": 0.0,
        "torso_height_scale": 0.0,
        "posture_scale": 0.0,
        "stand_still_scale": 0.0,
        "torques_scale": 0.0,
        "noise_joint_pos": 0.0,
        "noise_gyro": 0.0,
        "noise_gravity": 0.0,
        "lin_vel_x_min": -1.0,
        "lin_vel_x_max": 1.0,
        "lin_vel_y_min": -0.8,
        "lin_vel_y_max": 0.8,
        "ang_vel_max": 1.0,
        "gait_frequency_max": 0.0,
        "gait_count": 0,
        "success_reward": 0.0,
        "angvel_scale": 0.0,
        "rough_terrain": False,
    }

    def __init__(self, config):
        super().__init__(config)
        robot = str(config["robot"])
        # Go1/Spot/H1/G1 run REAL morphologies (go1_model.py /
        # robot_models.py); the others still use the documented
        # dm_control stand-ins.
        if robot in ("go1", "spot", "h1", "g1"):
            kind = robot
        elif robot in _QUADRUPEDS:
            kind = "quadruped"
        else:
            kind = "humanoid"
        self.real_morph = kind in ("go1", "spot", "h1", "g1")
        self.robot = robot
        self.model, self._mj = _base_model(kind)
        if kind == "go1":
            from .go1_model import DEFAULT_POSE, TORQUE_LIMIT

            self._pose_tab, self._lim_tab = DEFAULT_POSE, TORQUE_LIMIT
            self._fall_height = 0.15
            # Penalty-contact stiffness sized to the Go1's light feet
            # (~0.3 kg effective): sqrt(k/m)*dt must stay << 1 at
            # dt = 4 ms or the first touch explodes.
            self.contact_override = ContactParams(kp=2.0e3, kd=1.2e2)
        elif self.real_morph:
            from .robot_models import ROBOT_SPECS

            _, pose, lim, fall, (ckp, ckd) = ROBOT_SPECS[kind]
            self._pose_tab, self._lim_tab = pose, lim
            self._fall_height = fall
            self.contact_override = ContactParams(kp=ckp, kd=ckd)
        else:
            self._pose_tab = self._lim_tab = None
            self._fall_height = 0.15
        self.nu_agent = ROBOT_NU[robot]
        self.nu_sim = self.model.nu
        self.n_sub = max(
            1, round(float(config["ctrl_dt"]) / self.model.timestep)
        )
        self.contact = ContactParams(kp=2.0e4, kd=2.0e2)
        if getattr(self, "contact_override", None) is not None:
            self.contact = self.contact_override
        self.substeps = 2
        self._torso = self.model.body_names.index("torso")
        self._hinge_qadr = np.asarray(
            [
                self.model.jnt_qposadr[j]
                for j in range(len(self.model.jnt_type))
                if int(self.model.jnt_type[j]) == 3
            ]
        )
        self._hinge_dadr = np.asarray(
            [
                self.model.jnt_dofadr[j]
                for j in range(len(self.model.jnt_type))
                if int(self.model.jnt_type[j]) == 3
            ]
        )

    # -- agent action (nu_agent) → sim ctrl (nu_sim) -----------------------

    def _sim_ctrl(self, action):
        a = jnp.clip(action, -1.0, 1.0) * float(self.config["action_scale"])
        n = min(self.nu_agent, self.nu_sim)
        ctrl = jnp.zeros(self.nu_sim, jnp.float32)
        ctrl = ctrl.at[:n].set(a[:n])
        return ctrl

    def _pd_ctrl(self, action, qpos, qvel):
        """Playground PD recipe on a real morphology: torque =
        kp*(default_pose + action_scale*a - q) - kd*qd, clamped to the
        robot's published torque limits (go1_model / robot_models)."""
        a = jnp.clip(action, -1.0, 1.0) * float(self.config["action_scale"])
        target = jnp.asarray(self._pose_tab) + a
        jp = qpos[jnp.asarray(self._hinge_qadr)]
        jv = qvel[jnp.asarray(self._hinge_dadr)]
        torque = (
            float(self.config["kp"]) * (target - jp)
            - float(self.config["kd"]) * jv
        )
        lim = jnp.asarray(self._lim_tab)
        return jnp.clip(torque, -lim, lim)

    def _obs_vec(self, qpos, qvel, prev_action, command):
        Rs, _ = fk(self.model, qpos)
        R = Rs[self._torso]
        gravity = R.T @ jnp.asarray([0.0, 0.0, -1.0])
        gyro = qvel[3:6]
        jp = qpos[jnp.asarray(self._hinge_qadr)]
        jv = qvel[jnp.asarray(self._hinge_dadr)]
        parts = [gravity, gyro, jp, jv, prev_action]
        if command is not None:
            parts.append(command)
        return jnp.concatenate(parts).astype(jnp.float32)

    def _obs_dim(self):
        n_h = len(self._hinge_qadr)
        d = 3 + 3 + n_h + n_h + self.nu_agent
        if self._has_command():
            d += 3
        return d

    def _has_command(self):
        return True

    def state_spec(self):
        inf = float("inf")
        spec = {
            "obs": ArraySpec(jnp.float32, (self._obs_dim(),), -inf, inf),
            "info:command": ArraySpec(jnp.float32, (3,)),
        }
        return spec

    def action_spec(self):
        return {
            "action": ArraySpec(jnp.float32, (self.nu_agent,), -1.0, 1.0)
        }

    def _init_qpos(self, key):
        qpos = jnp.asarray(self.model.qpos0, jnp.float32)
        if self.real_morph:
            qpos = qpos.at[jnp.asarray(self._hinge_qadr)].set(
                jnp.asarray(self._pose_tab)
            )
        # Drop the base to rest height.
        from ...physics.dynamics import _contact_points

        Rs, ps = fk(self.model, qpos)
        centers = _contact_points(self.model, Rs, ps)
        radius = jnp.asarray(self.model.con_radius, jnp.float32)
        lowest = jnp.min(centers[:, 2] - radius)
        qpos = qpos.at[2].add(-lowest + 0.01)
        return qpos

    def _sample_command(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return jnp.stack(
            [
                jax.random.uniform(
                    k1, (), jnp.float32,
                    float(self.config["lin_vel_x_min"]),
                    float(self.config["lin_vel_x_max"]),
                ),
                jax.random.uniform(
                    k2, (), jnp.float32,
                    float(self.config["lin_vel_y_min"]),
                    float(self.config["lin_vel_y_max"]),
                ),
                jax.random.uniform(
                    k3, (), jnp.float32,
                    -float(self.config["ang_vel_max"]),
                    float(self.config["ang_vel_max"]),
                ),
            ]
        )

    def reset_env(self, key):
        kq, kc = jax.random.split(key)
        qpos = self._init_qpos(kq)
        st = {
            "qpos": qpos,
            "qvel": jnp.zeros(self.model.nv, jnp.float32),
            "prev_action": jnp.zeros(self.nu_agent, jnp.float32),
            "command": self._sample_command(kc),
        }
        return st, self._obs(st)

    def _obs(self, st):
        cmd = st["command"] if self._has_command() else None
        return {
            "obs": self._obs_vec(
                st["qpos"], st["qvel"], st["prev_action"], cmd
            ),
            "info:command": st["command"],
        }

    def _step_sim(self, st, action):
        n_steps = self.n_sub * max(1, int(self.config["action_repeat"]))
        if self.real_morph:
            # PD torques recomputed every SIM step (the playground's
            # motor model runs at sim dt): holding the derivative term
            # frozen across the 20 ms control step destabilizes the
            # roll/abduction mode (delayed rate feedback — observed
            # doubling per control step before this).
            def body(carry, _):
                qpos, qvel = carry
                ctrl = self._pd_ctrl(action, qpos, qvel)
                qpos, qvel = phys_step(
                    self.model, qpos, qvel, ctrl, self.substeps,
                    self.contact, 1,
                )
                return (qpos, qvel), None

            (qpos, qvel), _ = jax.lax.scan(
                body, (st["qpos"], st["qvel"]), None, length=n_steps
            )
            return qpos, qvel
        qpos, qvel = phys_step(
            self.model,
            st["qpos"],
            st["qvel"],
            self._sim_ctrl(action),
            self.substeps,
            self.contact,
            n_steps,
        )
        return qpos, qvel

    def step_env(self, state, action, key):
        action = jnp.reshape(action, (self.nu_agent,)).astype(jnp.float32)
        qpos, qvel = self._step_sim(state, action)
        st = {
            "qpos": qpos,
            "qvel": qvel,
            "prev_action": action,
            "command": state["command"],
        }
        reward, terminated = self._reward(state, st, action)
        return EnvOut(
            state=st,
            obs=self._obs(st),
            reward=jnp.asarray(reward, jnp.float32),
            terminated=jnp.asarray(terminated, jnp.bool_),
        )

    def _reward(self, prev, st, action):
        raise NotImplementedError


class JoystickEnv(_LocomotionBase):
    """Command-tracking locomotion (the playground joystick recipe)."""

    def _reward(self, prev, st, action):
        (Rs, ps), (omega, vels) = body_vel(
            self.model, st["qpos"], st["qvel"]
        )
        R = Rs[self._torso]
        v_local = R.T @ vels[self._torso]
        w_local = st["qvel"][3:6]
        cmd = st["command"]
        lin_err = jnp.sum((cmd[:2] - v_local[:2]) ** 2)
        ang_err = (cmd[2] - w_local[2]) ** 2
        c = self.config
        r = (
            float(c["tracking_lin_vel_scale"]) * jnp.exp(-4.0 * lin_err)
            + float(c["tracking_ang_vel_scale"]) * jnp.exp(-4.0 * ang_err)
            + float(c["lin_vel_z_scale"]) * v_local[2] ** 2
            + float(c["ang_vel_xy_scale"]) * jnp.sum(w_local[:2] ** 2)
            + float(c["action_rate_scale"])
            * jnp.sum((action - prev["prev_action"]) ** 2)
        )
        # Fall detection: torso below a fraction of nominal height or
        # flipped.
        upright = R[2, 2]
        fallen = (ps[self._torso][2] < self._fall_height) | (upright < 0.0)
        return r, fallen


class GetupEnv(_LocomotionBase):
    """Recover to standing from a fallen pose (Go1Getup/SpotGetup)."""

    def _has_command(self):
        return False

    def _init_qpos(self, key):
        qpos = super()._init_qpos(key)
        # Start lying on the side: roll the base 90° about x.
        quat = jnp.asarray([jnp.cos(jnp.pi / 4), jnp.sin(jnp.pi / 4), 0.0, 0.0])
        qpos = qpos.at[3:7].set(quat)
        qpos = qpos.at[2].set(0.3)
        return qpos

    def _reward(self, prev, st, action):
        Rs, ps = fk(self.model, st["qpos"])
        upright = Rs[self._torso][2, 2]
        height = ps[self._torso][2]
        c = self.config
        r = (
            max(float(c["orientation_scale"]), 1.0) * jnp.maximum(upright, 0.0)
            + max(float(c["torso_height_scale"]), 1.0)
            * jnp.clip(height / 0.5, 0.0, 1.0)
            + float(c["action_rate_scale"])
            * jnp.sum((action - prev["prev_action"]) ** 2)
        )
        return r, jnp.bool_(False)


class HandstandEnv(_LocomotionBase):
    """Go1 handstand/footstand: balance on two legs."""

    DEFAULT_CONFIG = dict(
        _LocomotionBase.DEFAULT_CONFIG, mode="handstand"
    )

    def _has_command(self):
        return False

    def _reward(self, prev, st, action):
        Rs, ps = fk(self.model, st["qpos"])
        R = Rs[self._torso]
        # Handstand: torso pitched vertical (x-axis pointing up or down).
        target = R[2, 0] if str(self.config["mode"]) == "handstand" else -R[2, 0]
        pitch_up = jnp.abs(target)
        height = ps[self._torso][2]
        r = (
            2.0 * pitch_up
            + jnp.clip(height / 0.5, 0.0, 1.0)
            + float(self.config["action_rate_scale"])
            * jnp.sum((action - prev["prev_action"]) ** 2)
        )
        return r, jnp.bool_(False)
