"""Playground manipulation tasks: Panda/Aloha arms, Leap-hand cubes.

Reference behavior: ``envpool/mujoco/playground/register_panda.cc`` /
``register_aloha.cc`` / ``register_hand.cc``.  The arms are modelled at
the end-effector level (as for Fetch, envs/robotics/fetch.py); the cube
reorientation tasks reuse the Shadow-hand servo-bank + quaternion goal
machinery (envs/robotics/hand.py).  Reward structure and the registered
per-task weights (action_scale, success_reward, orientation/position
scales, action_rate/energy penalties) follow the reference registration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec
from ..robotics.hand import (
    quat_from_angle_axis,
    quat_mul,
    quat_conj,
)

_WORKSPACE_LO = np.asarray([-0.35, -0.35, 0.02], np.float32)
_WORKSPACE_HI = np.asarray([0.35, 0.35, 0.5], np.float32)


class ArmPickEnv(TpuEnv):
    """PandaPickCube* / PandaOpenCabinet / PandaRobotiqPushCube /
    AlohaHandOver / AlohaSinglePegInsertion via config."""

    DEFAULT_CONFIG = {
        "task": "pick",          # pick | cabinet | push | handover | insert
        "n_arms": 1,
        "ctrl_dt": 0.02,
        "sim_dt": 0.005,
        "action_repeat": 1,
        "action_scale": 0.04,
        "robot_target_qpos_scale": 1.0,
        "success_threshold": 0.05,
    }

    def __init__(self, config):
        super().__init__(config)
        self.task = str(config["task"])
        self.n_arms = int(config["n_arms"])
        self.scale = float(config["action_scale"])
        # Per arm: xyz + gripper.
        self.na = 4 * self.n_arms
        self.obs_dim = self.n_arms * 8 + 10  # ee(3)+grip(1)+vel(3)+g(1);obj7+goal3

    def state_spec(self):
        inf = float("inf")
        return {
            "obs": ArraySpec(jnp.float32, (self.obs_dim,), -inf, inf),
            "info:success": ArraySpec(jnp.float32, (), 0.0, 1.0),
        }

    def action_spec(self):
        return {"action": ArraySpec(jnp.float32, (self.na,), -1.0, 1.0)}

    def _obs(self, st):
        parts = []
        for i in range(self.n_arms):
            parts += [st["ee"][i], st["grip"][i][None],
                      st["ee_vel"][i], st["grip"][i][None]]
        parts += [st["obj"], st["obj_quat"], st["goal"]]
        obs = jnp.concatenate(parts)[: self.obs_dim]
        pad = self.obs_dim - obs.shape[0]
        if pad > 0:
            obs = jnp.concatenate([obs, jnp.zeros(pad, jnp.float32)])
        d = jnp.linalg.norm(st["obj"] - st["goal"])
        return {
            "obs": obs.astype(jnp.float32),
            "info:success": (
                d < float(self.config["success_threshold"])
            ).astype(jnp.float32),
        }

    def reset_env(self, key):
        ko, kg = jax.random.split(key)
        obj = jnp.concatenate(
            [
                jax.random.uniform(ko, (2,), jnp.float32, -0.15, 0.15),
                jnp.full((1,), 0.03, jnp.float32),
            ]
        )
        if self.task in ("pick", "handover"):
            goal = jnp.concatenate(
                [
                    jax.random.uniform(kg, (2,), jnp.float32, -0.2, 0.2),
                    jax.random.uniform(kg, (1,), jnp.float32, 0.15, 0.35),
                ]
            )
        else:  # push / cabinet / insert: on-surface targets
            goal = jnp.concatenate(
                [
                    jax.random.uniform(kg, (2,), jnp.float32, -0.25, 0.25),
                    jnp.full((1,), 0.03, jnp.float32),
                ]
            )
        ee0 = jnp.asarray([[0.0, -0.2, 0.25], [0.0, 0.2, 0.25]], jnp.float32)
        st = {
            "ee": ee0[: self.n_arms],
            "ee_vel": jnp.zeros((self.n_arms, 3), jnp.float32),
            "grip": jnp.ones(self.n_arms, jnp.float32),
            "obj": obj,
            "obj_quat": jnp.asarray([1.0, 0.0, 0.0, 0.0]),
            "grasped": jnp.int32(-1),  # which arm holds the object
            "goal": goal,
        }
        return st, self._obs(st)

    def step_env(self, state, action, key):
        a = jnp.clip(
            jnp.reshape(action, (self.n_arms, 4)).astype(jnp.float32), -1, 1
        )
        ee = jnp.clip(
            state["ee"] + a[:, :3] * self.scale,
            jnp.asarray(_WORKSPACE_LO),
            jnp.asarray(_WORKSPACE_HI),
        )
        ee_vel = (ee - state["ee"]) / float(self.config["ctrl_dt"])
        grip = jnp.clip(state["grip"] - 0.4 * a[:, 3], 0.0, 1.0)

        obj = state["obj"]
        grasped = state["grasped"]
        # Grasp: nearest closing arm within range takes the object.
        d_arm = jnp.linalg.norm(ee - obj[None, :], axis=-1)
        closing = (a[:, 3] > 0) & (grip < 0.5)
        can = (d_arm < 0.06) & closing
        new_holder = jnp.argmax(can)
        grasped = jnp.where(
            (grasped < 0) & can.any(), new_holder, grasped
        )
        # Release when the holding arm opens.
        open_now = grip > 0.7
        grasped = jnp.where(
            (grasped >= 0) & open_now[jnp.clip(grasped, 0, self.n_arms - 1)],
            -1,
            grasped,
        )
        held = grasped >= 0
        obj = jnp.where(
            held, ee[jnp.clip(grasped, 0, self.n_arms - 1)], obj
        )
        # Push contact for the push task.
        if self.task == "push":
            rel = obj[:2] - ee[0, :2]
            dist = jnp.linalg.norm(rel) + 1e-8
            pen = 0.05 - dist
            touch = (pen > 0) & (jnp.abs(ee[0, 2] - obj[2]) < 0.05)
            obj = obj.at[:2].add(
                jnp.where(touch, rel / dist * jnp.maximum(pen, 0), 0.0)
            )
        # Gravity: free objects fall to the surface.
        obj = jnp.where(
            held, obj, obj.at[2].set(jnp.maximum(obj[2] - 0.05, 0.03))
        )

        d = jnp.linalg.norm(obj - state["goal"])
        reach = jnp.exp(-10.0 * jnp.min(d_arm))
        place = jnp.exp(-10.0 * d)
        success = d < float(self.config["success_threshold"])
        reward = (
            0.3 * reach
            + place
            + jnp.where(success, 5.0, 0.0)
        )
        st = {
            "ee": ee,
            "ee_vel": ee_vel,
            "grip": grip,
            "obj": obj,
            "obj_quat": state["obj_quat"],
            "grasped": grasped,
            "goal": state["goal"],
        }
        return EnvOut(
            state=st,
            obs=self._obs(st),
            reward=jnp.asarray(reward, jnp.float32),
            terminated=jnp.bool_(False),
        )


class CubeRotateEnv(TpuEnv):
    """LeapCubeReorient / LeapCubeRotateZAxis / AeroCubeRotateZAxis."""

    DEFAULT_CONFIG = {
        "mode": "reorient",      # reorient | z_axis
        "action_scale": 0.5,
        "success_reward": 100.0,
        "angvel_scale": 0.0,
        "orientation_scale": 5.0,
        "position_scale": 0.5,
        "hand_pose_scale": -0.5,
        "action_rate_scale": -0.001,
        "energy_scale": -0.001,
        "rotation_threshold": 0.2,
    }

    _NJ = 16  # Leap hand: 16 actuated joints

    def __init__(self, config):
        super().__init__(config)
        self.mode = str(config["mode"])
        rng = np.random.default_rng(3)
        W = np.zeros((3, self._NJ), np.float32)
        W[0, 0:5] = 0.25
        W[1, 5:10] = 0.25
        W[2, 10:16] = 0.3
        W += 0.02 * rng.standard_normal(W.shape).astype(np.float32)
        self.W = W
        self.obs_dim = self._NJ * 2 + 7 + 4  # joints, obj pose, goal quat

    def state_spec(self):
        inf = float("inf")
        return {
            "obs": ArraySpec(jnp.float32, (self.obs_dim,), -inf, inf),
            "info:success": ArraySpec(jnp.float32, (), 0.0, 1.0),
        }

    def action_spec(self):
        return {"action": ArraySpec(jnp.float32, (self._NJ,), -1.0, 1.0)}

    def _goal_quat(self, key):
        if self.mode == "z_axis":
            angle = jax.random.uniform(key, (), jnp.float32, -np.pi, np.pi)
            return quat_from_angle_axis(angle, jnp.asarray([0.0, 0.0, 1.0]))
        k1, k2 = jax.random.split(key)
        angle = jax.random.uniform(k1, (), jnp.float32, -np.pi, np.pi)
        axis = jax.random.uniform(k2, (3,), jnp.float32, -1.0, 1.0)
        q = quat_from_angle_axis(angle, axis)
        return q / jnp.linalg.norm(q)

    def _obs(self, st):
        d_rot = self._rot_dist(st["quat"], st["goal"])
        return {
            "obs": jnp.concatenate(
                [
                    st["q"],
                    st["qd"],
                    jnp.asarray([0.0, 0.0, 0.05]),
                    st["quat"],
                    st["goal"],
                ]
            ).astype(jnp.float32),
            "info:success": (
                d_rot < float(self.config["rotation_threshold"])
            ).astype(jnp.float32),
        }

    @staticmethod
    def _rot_dist(qa, qb):
        qd = quat_mul(qa, quat_conj(qb))
        return 2 * jnp.arccos(jnp.clip(jnp.abs(qd[0]), -1.0, 1.0))

    def reset_env(self, key):
        kq, kg = jax.random.split(key)
        quat = self._goal_quat(kq)  # random start orientation
        st = {
            "q": jnp.zeros(self._NJ, jnp.float32),
            "qd": jnp.zeros(self._NJ, jnp.float32),
            "quat": quat,
            "goal": self._goal_quat(kg),
        }
        return st, self._obs(st)

    def step_env(self, state, action, key):
        a = jnp.clip(
            jnp.reshape(action, (self._NJ,)).astype(jnp.float32), -1, 1
        )
        target = a * float(self.config["action_scale"]) * 1.5
        delta = jnp.clip(0.3 * (target - state["q"]), -0.3, 0.3)
        q = state["q"] + delta
        qd = delta / 0.02
        omega = jnp.asarray(self.W) @ qd * 0.02
        angle = jnp.linalg.norm(omega) + 1e-12
        dq = quat_from_angle_axis(angle, omega / angle)
        quat = quat_mul(dq, state["quat"])
        quat = quat / jnp.linalg.norm(quat)
        d_rot = self._rot_dist(quat, state["goal"])
        success = d_rot < float(self.config["rotation_threshold"])
        c = self.config
        reward = (
            float(c["orientation_scale"]) * jnp.exp(-d_rot)
            + jnp.where(success, float(c["success_reward"]), 0.0)
            + float(c["action_rate_scale"]) * jnp.sum(delta**2)
            + float(c["energy_scale"]) * jnp.sum(qd**2)
        )
        # Resample the goal on success (continuing reorientation).
        goal = jnp.where(success, self._goal_quat(key), state["goal"])
        st = {"q": q, "qd": qd, "quat": quat, "goal": goal}
        return EnvOut(
            state=st,
            obs=self._obs(st),
            reward=jnp.asarray(reward, jnp.float32),
            terminated=jnp.bool_(False),
        )
