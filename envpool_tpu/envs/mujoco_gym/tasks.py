"""Gym-MuJoCo locomotion tasks (v4 semantics).

Behavioral references: the per-task headers under
``envpool/mujoco/gym/`` — ``half_cheetah.h:136-155`` (reward pipeline),
``hopper.h`` / ``walker2d.h`` (healthy termination), ``ant.h``,
``swimmer.h``, ``reacher.h``, ``inverted_pendulum.h``,
``inverted_double_pendulum.h`` — which themselves mirror Gymnasium v4.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...physics.dynamics import body_positions, site_positions
from .base import MujocoGymEnv


class HalfCheetahEnv(MujocoGymEnv):
    XML = "half_cheetah.xml"
    FRAME_SKIP = 5
    DEFAULT_CONFIG = {
        "reward_threshold": 4800.0,
        "ctrl_cost_weight": 0.1,
        "forward_reward_weight": 1.0,
        "reset_noise_scale": 0.1,
    }

    def observe(self, qpos, qvel):
        if self.config["exclude_current_positions_from_observation"]:
            qpos = qpos[1:]
        return jnp.concatenate([qpos, qvel]).astype(jnp.float32)

    def reward_done(self, before, after, action):
        xv = (after["qpos"][0] - before["qpos"][0]) / self.dt
        ctrl_cost = float(self.config["ctrl_cost_weight"]) * jnp.sum(
            action * action
        )
        run = float(self.config["forward_reward_weight"]) * xv
        return (
            run - ctrl_cost,
            jnp.bool_(False),
            {
                "reward_run": run,
                "reward_ctrl": -ctrl_cost,
                "x_position": after["qpos"][0],
                "x_velocity": xv,
            },
        )


class _HealthyLocomotionEnv(MujocoGymEnv):
    """Shared hopper/walker2d logic: healthy reward + termination."""

    HEALTHY_Z = (0.7, float("inf"))
    HEALTHY_ANGLE = (-0.2, 0.2)
    HEALTHY_STATE = (-100.0, 100.0)
    DEFAULT_CONFIG = {
        "ctrl_cost_weight": 1e-3,
        "forward_reward_weight": 1.0,
        "reset_noise_scale": 5e-3,
        "healthy_reward": 1.0,
        "terminate_when_unhealthy": True,
        # v4 pays the healthy bonus every step; v5 only while healthy.
        "legacy_healthy_reward": True,
    }

    def reset_qpos_qvel(self, key):
        s = float(self.config["reset_noise_scale"])
        k1, k2 = jax.random.split(key)
        qpos0 = jnp.asarray(self.model.qpos0, jnp.float32)
        qpos = qpos0 + jax.random.uniform(
            k1, (self.model.nq,), jnp.float32, -s, s
        )
        qvel = jax.random.uniform(k2, (self.model.nv,), jnp.float32, -s, s)
        return qpos, qvel

    def observe(self, qpos, qvel):
        if self.config["exclude_current_positions_from_observation"]:
            qpos = qpos[1:]
        return jnp.concatenate(
            [qpos, jnp.clip(qvel, -10.0, 10.0)]
        ).astype(jnp.float32)

    def _healthy(self, qpos, qvel):
        z, angle = qpos[1], qpos[2]
        state = jnp.concatenate([qpos[2:], qvel])
        ok_state = jnp.all(
            (state > self.HEALTHY_STATE[0]) & (state < self.HEALTHY_STATE[1])
        )
        ok_z = (z > self.HEALTHY_Z[0]) & (z < self.HEALTHY_Z[1])
        ok_angle = (angle > self.HEALTHY_ANGLE[0]) & (
            angle < self.HEALTHY_ANGLE[1]
        )
        return ok_state & ok_z & ok_angle

    def reward_done(self, before, after, action):
        xv = (after["qpos"][0] - before["qpos"][0]) / self.dt
        healthy = self._healthy(after["qpos"], after["qvel"])
        healthy_reward = float(self.config["healthy_reward"])
        if not bool(self.config["legacy_healthy_reward"]):
            healthy_reward = healthy_reward * healthy.astype(jnp.float32)
        ctrl_cost = float(self.config["ctrl_cost_weight"]) * jnp.sum(
            action * action
        )
        run = float(self.config["forward_reward_weight"]) * xv
        reward = run + healthy_reward - ctrl_cost
        terminated = (
            ~healthy
            if bool(self.config["terminate_when_unhealthy"])
            else jnp.bool_(False)
        )
        return (
            reward,
            terminated,
            {
                "reward_run": run,
                "reward_ctrl": -ctrl_cost,
                "x_position": after["qpos"][0],
                "x_velocity": xv,
            },
        )


class HopperEnv(_HealthyLocomotionEnv):
    XML = "hopper.xml"
    FRAME_SKIP = 4
    HEALTHY_Z = (0.7, float("inf"))
    HEALTHY_ANGLE = (-0.2, 0.2)
    DEFAULT_CONFIG = dict(_HealthyLocomotionEnv.DEFAULT_CONFIG)


class Walker2dEnv(_HealthyLocomotionEnv):
    XML = "walker2d.xml"
    FRAME_SKIP = 4
    HEALTHY_Z = (0.8, 2.0)
    HEALTHY_ANGLE = (-1.0, 1.0)
    HEALTHY_STATE = (-float("inf"), float("inf"))
    DEFAULT_CONFIG = dict(_HealthyLocomotionEnv.DEFAULT_CONFIG)


class AntEnv(MujocoGymEnv):
    XML = "ant.xml"
    FRAME_SKIP = 5
    DEFAULT_CONFIG = {
        "reward_threshold": 6000.0,
        "ctrl_cost_weight": 0.5,
        "forward_reward_weight": 1.0,
        "reset_noise_scale": 0.1,
        "healthy_reward": 1.0,
        "terminate_when_unhealthy": True,
        "legacy_healthy_reward": True,
        "substeps": 1,
        # ant.xml declares RK4; Euler with implicit contact damping at a
        # full model timestep is the standard MJX/Brax tradeoff (8x fewer
        # forward evaluations, behaviorally equivalent for penalty
        # contacts — the contact-damping/friction-slope term joins the
        # implicit LHS in dynamics._contact_forces_shared, which is what
        # makes h=10ms stable).  Pass integrator="model" for RK4.
        "integrator": "euler",
    }

    def observe(self, qpos, qvel):
        if self.config["exclude_current_positions_from_observation"]:
            qpos = qpos[2:]
        return jnp.concatenate([qpos, qvel]).astype(jnp.float32)

    def reward_done(self, before, after, action):
        xv = (after["qpos"][0] - before["qpos"][0]) / self.dt
        z = after["qpos"][2]
        healthy = (z > 0.2) & (z < 1.0)
        healthy_reward = float(self.config["healthy_reward"])
        if not bool(self.config["legacy_healthy_reward"]):
            healthy_reward = healthy_reward * healthy.astype(jnp.float32)
        ctrl_cost = float(self.config["ctrl_cost_weight"]) * jnp.sum(
            action * action
        )
        run = float(self.config["forward_reward_weight"]) * xv
        reward = run + healthy_reward - ctrl_cost
        terminated = (
            ~healthy
            if bool(self.config["terminate_when_unhealthy"])
            else jnp.bool_(False)
        )
        return (
            reward,
            terminated,
            {
                "reward_run": run,
                "reward_ctrl": -ctrl_cost,
                "x_position": after["qpos"][0],
                "x_velocity": xv,
            },
        )


class SwimmerEnv(MujocoGymEnv):
    XML = "swimmer.xml"
    FRAME_SKIP = 4
    DEFAULT_CONFIG = {
        "reward_threshold": 360.0,
        "ctrl_cost_weight": 1e-4,
        "forward_reward_weight": 1.0,
        "reset_noise_scale": 0.1,
    }

    def reset_qpos_qvel(self, key):
        s = float(self.config["reset_noise_scale"])
        k1, k2 = jax.random.split(key)
        qpos0 = jnp.asarray(self.model.qpos0, jnp.float32)
        qpos = qpos0 + jax.random.uniform(
            k1, (self.model.nq,), jnp.float32, -s, s
        )
        qvel = jax.random.uniform(k2, (self.model.nv,), jnp.float32, -s, s)
        return qpos, qvel

    def observe(self, qpos, qvel):
        if self.config["exclude_current_positions_from_observation"]:
            qpos = qpos[2:]
        return jnp.concatenate([qpos, qvel]).astype(jnp.float32)

    def reward_done(self, before, after, action):
        xv = (after["qpos"][0] - before["qpos"][0]) / self.dt
        ctrl_cost = float(self.config["ctrl_cost_weight"]) * jnp.sum(
            action * action
        )
        run = float(self.config["forward_reward_weight"]) * xv
        return (
            run - ctrl_cost,
            jnp.bool_(False),
            {
                "reward_run": run,
                "reward_ctrl": -ctrl_cost,
                "x_position": after["qpos"][0],
                "x_velocity": xv,
            },
        )


class ReacherEnv(MujocoGymEnv):
    XML = "reacher.xml"
    FRAME_SKIP = 2
    DEFAULT_CONFIG = {
        "reward_threshold": -3.75,
        "reset_noise_scale": 0.1,
        # v5: distance measured after the step (registration.py:69-72)
        # and the constant z of the fingertip-target vec dropped (10-dim).
        "reward_after_step": False,
        "v5_obs": False,
    }

    def __init__(self, config):
        super().__init__(config)
        self._fingertip = self.model.body_names.index("fingertip")
        self._target = self.model.body_names.index("target")

    def reset_qpos_qvel(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        qpos0 = jnp.asarray(self.model.qpos0, jnp.float32)
        arm = qpos0[:2] + jax.random.uniform(
            k1, (2,), jnp.float32, -0.1, 0.1
        )
        # Goal: uniform on the radius-0.2 disk (gym rejection-samples the
        # square; the accepted region is the disk, so this is the same law).
        r = 0.2 * jnp.sqrt(jax.random.uniform(k2, (), jnp.float32))
        theta = jax.random.uniform(
            k3, (), jnp.float32, 0.0, 2.0 * jnp.pi
        )
        goal = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)])
        qpos = jnp.concatenate([arm, goal])
        qvel = jnp.concatenate(
            [
                jax.random.uniform(k4, (2,), jnp.float32, -0.005, 0.005),
                jnp.zeros(2, jnp.float32),
            ]
        )
        return qpos, qvel

    def _vec(self, qpos):
        # gym's get_body_com is data.body(name).xpos — the body frame
        # origin, not the inertial com (they coincide for fingertip).
        ps = body_positions(self.model, qpos)
        return ps[self._fingertip] - ps[self._target]

    def observe(self, qpos, qvel):
        vec = self._vec(qpos)
        if bool(self.config["v5_obs"]):
            vec = vec[:2]
        return jnp.concatenate(
            [
                jnp.cos(qpos[:2]),
                jnp.sin(qpos[:2]),
                qpos[2:4],
                qvel[:2],
                vec,
            ]
        ).astype(jnp.float32)

    def extra_info_spec(self):
        from ...core.specs import ArraySpec

        return {
            "info:reward_dist": ArraySpec(jnp.float32, ()),
            "info:reward_ctrl": ArraySpec(jnp.float32, ()),
        }

    def reward_done(self, before, after, action):
        which = (
            after if bool(self.config["reward_after_step"]) else before
        )
        vec = self._vec(which["qpos"])
        reward_dist = -jnp.linalg.norm(vec)
        reward_ctrl = -jnp.sum(action * action)
        return (
            reward_dist + reward_ctrl,
            jnp.bool_(False),
            {"reward_dist": reward_dist, "reward_ctrl": reward_ctrl},
        )


class InvertedPendulumEnv(MujocoGymEnv):
    XML = "inverted_pendulum.xml"
    FRAME_SKIP = 2
    DEFAULT_CONFIG = {
        "reward_threshold": 950.0,
        "reset_noise_scale": 0.01,
        # v5: no reward on the terminating step (registration.py:60-61).
        "reward_if_not_terminated": False,
    }

    def reset_qpos_qvel(self, key):
        s = float(self.config["reset_noise_scale"])
        k1, k2 = jax.random.split(key)
        qpos0 = jnp.asarray(self.model.qpos0, jnp.float32)
        qpos = qpos0 + jax.random.uniform(
            k1, (self.model.nq,), jnp.float32, -s, s
        )
        qvel = jax.random.uniform(k2, (self.model.nv,), jnp.float32, -s, s)
        return qpos, qvel

    def observe(self, qpos, qvel):
        return jnp.concatenate([qpos, qvel]).astype(jnp.float32)

    def extra_info_spec(self):
        return {}

    def reward_done(self, before, after, action):
        terminated = jnp.abs(after["qpos"][1]) > 0.2
        reward = jnp.float32(1.0)
        if bool(self.config["reward_if_not_terminated"]):
            reward = jnp.where(terminated, 0.0, 1.0).astype(jnp.float32)
        return reward, terminated, {}


class InvertedDoublePendulumEnv(MujocoGymEnv):
    XML = "inverted_double_pendulum.xml"
    FRAME_SKIP = 5
    DEFAULT_CONFIG = {
        "reward_threshold": 9100.0,
        "reset_noise_scale": 0.1,
        "reward_if_not_terminated": False,
    }

    def __init__(self, config):
        super().__init__(config)
        self._tip = self.model.site_names.index("tip")

    def observe(self, qpos, qvel):
        # qfrc_constraint is zero in the penalty engine; keep the obs slots
        # for layout parity with the reference (11-dim).
        return jnp.concatenate(
            [
                qpos[:1],
                jnp.sin(qpos[1:]),
                jnp.cos(qpos[1:]),
                jnp.clip(qvel, -10.0, 10.0),
                jnp.zeros(3, jnp.float32),
            ]
        ).astype(jnp.float32)

    def extra_info_spec(self):
        return {}

    def reward_done(self, before, after, action):
        tip = site_positions(self.model, after["qpos"])[self._tip]
        x, y = tip[0], tip[2]
        dist_penalty = 0.01 * x * x + (y - 2.0) ** 2
        v1, v2 = after["qvel"][1], after["qvel"][2]
        vel_penalty = 1e-3 * v1 * v1 + 5e-3 * v2 * v2
        alive_bonus = 10.0
        reward = alive_bonus - dist_penalty - vel_penalty
        terminated = y <= 1.0
        if bool(self.config["reward_if_not_terminated"]):
            reward = jnp.where(terminated, 0.0, reward)
        return reward, terminated, {}


class PusherEnv(MujocoGymEnv):
    """Pusher (7-dof arm pushes a cylinder to a goal).

    Behavioral reference: ``envpool/mujoco/gym/pusher.h`` / gymnasium
    pusher_v4/v5: obs = [qpos[:7], qvel[:7], com(tips_arm), com(object),
    com(goal)] (23,); reward = -|obj-goal| - 0.1*|a|^2 - 0.5*|obj-tip|,
    measured before the step in v4 and after in v5
    (``reward_after_step``).  Reset rejection-samples the cylinder
    until it is >0.17 from the goal at the origin.
    """

    XML = "pusher.xml"
    FRAME_SKIP = 5
    DEFAULT_CONFIG = {
        "reward_threshold": 0.0,
        # v5 measures distances after stepping and uses pusher_v5.xml.
        "reward_after_step": False,
        "reward_near_weight": 0.5,
        "reward_dist_weight": 1.0,
        "reward_control_weight": 0.1,
    }

    def __init__(self, config):
        super().__init__(config)
        names = self.model.body_names
        self._tips = names.index("tips_arm")
        self._object = names.index("object")
        self._goal = names.index("goal")

    def reset_qpos_qvel(self, key):
        qpos0 = jnp.asarray(self.model.qpos0, jnp.float32)
        k_cyl, k_vel = jax.random.split(key)

        # Rejection sampling: x~U(-0.3,0), y~U(-0.2,0.2), |pos|>0.17.
        def cond(carry):
            _, pos = carry
            return jnp.linalg.norm(pos) <= 0.17

        def body(carry):
            k, _ = carry
            k = jax.random.fold_in(k, 1)
            kx, ky = jax.random.split(k)
            pos = jnp.stack([
                jax.random.uniform(kx, (), jnp.float32, -0.3, 0.0),
                jax.random.uniform(ky, (), jnp.float32, -0.2, 0.2),
            ])
            return k, pos

        init = body((k_cyl, jnp.zeros(2, jnp.float32)))
        _, cyl = jax.lax.while_loop(cond, body, init)
        qpos = qpos0.at[-4:-2].set(cyl).at[-2:].set(0.0)
        qvel = jax.random.uniform(
            k_vel, (self.model.nv,), jnp.float32, -0.005, 0.005
        )
        qvel = qvel.at[-4:].set(0.0)
        return qpos, qvel

    def _coms(self, qpos):
        # gym's get_body_com is data.body(name).xpos (frame origin).
        ps = body_positions(self.model, qpos)
        return ps[self._tips], ps[self._object], ps[self._goal]

    def observe(self, qpos, qvel):
        tips, obj, goal = self._coms(qpos)
        return jnp.concatenate(
            [qpos[:7], qvel[:7], tips, obj, goal]
        ).astype(jnp.float32)

    def extra_info_spec(self):
        from ...core.specs import ArraySpec

        return {
            "info:reward_dist": ArraySpec(jnp.float32, ()),
            "info:reward_ctrl": ArraySpec(jnp.float32, ()),
            "info:reward_near": ArraySpec(jnp.float32, ()),
        }

    def reward_done(self, before, after, action):
        which = (
            after if bool(self.config["reward_after_step"]) else before
        )
        tips, obj, goal = self._coms(which["qpos"])
        near = -jnp.linalg.norm(obj - tips) * float(
            self.config["reward_near_weight"]
        )
        dist = -jnp.linalg.norm(obj - goal) * float(
            self.config["reward_dist_weight"]
        )
        ctrl = -jnp.sum(action * action) * float(
            self.config["reward_control_weight"]
        )
        return (
            dist + ctrl + near,
            jnp.bool_(False),
            {"reward_dist": dist, "reward_ctrl": ctrl, "reward_near": near},
        )
