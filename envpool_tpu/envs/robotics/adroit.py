"""AdroitHand family — Door / Hammer / Pen / Relocate (dense + sparse).

Behavioral reference: ``envpool/mujoco/robotics/adroit.h`` and
gymnasium_robotics ``envs/adroit_hand/adroit_{door,hammer,pen,relocate}.py``
(pip 1.4.1 semantics — note its dense-reward quirks, e.g. the *positive*
``0.1 * |palm - handle|`` term, are replicated as-is).

TPU-native design: the 24-dof hand + arm is a rate-limited servo bank
(as in ``hand.py``); palm/object/target world quantities come from a
calibrated linear surrogate of the arm kinematics, and the task objects
(door hinge+latch, nail, pen, ball) follow deterministic interaction
rules driven by hand state (documented approximation — not MuJoCo
contact physics).  Observation layouts, reset distributions, success
predicates and reward formulas are exact ports given those quantities.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec
from .hand import quat2euler

_DT = 0.04
_SERVO_GAIN = 0.3
_SERVO_CAP = 0.4


class AdroitEnv(TpuEnv):
    """All 4 Adroit tasks via the ``adroit_task`` config key."""

    DEFAULT_CONFIG = {
        "reward_threshold": 0.0,
        "xml_file": "adroit_hand/adroit_door.xml",
        "adroit_task": "door",
        "reward_type": "dense",
        "obs_dim": 39,
        "action_dim": 28,
        "qpos_dim": 30,
        "qvel_dim": 30,
        "reset_dim": 3,
    }

    def __init__(self, config):
        super().__init__(config)
        self.task = str(config["adroit_task"])
        self.sparse = str(config["reward_type"]) == "sparse"
        self.obs_dim = int(config["obs_dim"])
        self.na = int(config["action_dim"])
        self.nq = int(config["qpos_dim"])
        # Arm translation joints (first 2-6 dofs) move the palm; a fixed
        # linear map stands in for the arm FK.
        rng = np.random.default_rng(7)
        J = np.zeros((3, self.na), np.float32)
        J[0, 0] = 0.25
        J[1, 1] = 0.25
        J[2, 2 % self.na] = 0.2
        J += 0.01 * rng.standard_normal(J.shape).astype(np.float32)
        self._palm_jac = J
        self._palm0 = np.asarray([0.0, 0.0, 0.2], np.float32)

    # -- specs -------------------------------------------------------------

    def state_spec(self):
        inf = float("inf")
        return {
            "obs": ArraySpec(jnp.float32, (self.obs_dim,), -inf, inf),
            "info:success": ArraySpec(jnp.float32, (), 0.0, 1.0),
            "info:qpos0": ArraySpec(jnp.float32, (self.nq,)),
        }

    def action_spec(self):
        return {"action": ArraySpec(jnp.float32, (self.na,), -1.0, 1.0)}

    # -- shared hand servo -------------------------------------------------

    def _servo(self, qpos_hand, action):
        target = jnp.clip(action, -1.0, 1.0) * 1.5
        delta = jnp.clip(
            _SERVO_GAIN * (target - qpos_hand), -_SERVO_CAP, _SERVO_CAP
        )
        new = jnp.clip(qpos_hand + delta, -1.6, 1.6)
        return new, (new - qpos_hand) / _DT

    def _palm(self, qpos_hand):
        return jnp.asarray(self._palm0) + jnp.asarray(self._palm_jac) @ qpos_hand

    def _curl(self, qpos_hand):
        """Mean finger flexion in [0, 1] (grasp proxy)."""
        return jnp.clip(jnp.mean(qpos_hand[6:18]), 0.0, 1.5) / 1.5

    # -- per-task logic ----------------------------------------------------

    def reset_env(self, key):
        ks = jax.random.split(key, 6)
        qh = jnp.zeros(self.na, jnp.float32)
        st = {"qh": qh, "qvh": jnp.zeros(self.na, jnp.float32)}
        if self.task == "door":
            st["door_xyz"] = jnp.stack([
                jax.random.uniform(ks[0], (), jnp.float32, -0.3, -0.2),
                jax.random.uniform(ks[1], (), jnp.float32, 0.25, 0.35),
                jax.random.uniform(ks[2], (), jnp.float32, 0.252, 0.35),
            ])
            st["hinge"] = jnp.float32(0.0)
            st["latch"] = jnp.float32(0.0)
        elif self.task == "hammer":
            st["board_z"] = jax.random.uniform(ks[0], (), jnp.float32, 0.1, 0.25)
            st["nail_depth"] = jnp.float32(0.0)
            st["hamm_pos"] = jnp.asarray([0.0, -0.2, 0.035])
            st["held"] = jnp.bool_(False)
        elif self.task == "pen":
            e = jnp.stack([
                jax.random.uniform(ks[0], (), jnp.float32, -1.0, 1.0),
                jax.random.uniform(ks[1], (), jnp.float32, -1.0, 1.0),
                jnp.float32(0.0),
            ])
            tar = jnp.stack([
                jnp.cos(e[1]) * jnp.cos(e[2]),
                jnp.cos(e[1]) * jnp.sin(e[2]) + jnp.sin(e[0]) * 0.0,
                -jnp.sin(e[1]),
            ])
            st["tar_orien"] = tar / jnp.linalg.norm(tar)
            st["obj_orien"] = jnp.asarray([1.0, 0.0, 0.0])
            st["obj_pos"] = jnp.asarray([0.0, 0.0, 0.15])
        elif self.task == "relocate":
            st["obj_pos"] = jnp.stack([
                jax.random.uniform(ks[0], (), jnp.float32, -0.15, 0.15),
                jax.random.uniform(ks[1], (), jnp.float32, -0.15, 0.3),
                jnp.float32(0.035),
            ])
            st["target"] = jnp.stack([
                jax.random.uniform(ks[2], (), jnp.float32, -0.2, 0.2),
                jax.random.uniform(ks[3], (), jnp.float32, -0.2, 0.2),
                jax.random.uniform(ks[4], (), jnp.float32, 0.15, 0.35),
            ])
            st["held"] = jnp.bool_(False)
        return st, self._obs(st)

    def _world(self, st):
        palm = self._palm(st["qh"])
        if self.task == "door":
            door = st["door_xyz"] + jnp.asarray([0.1, 0.2, 0.05])
            # Handle swings with the hinge about the door frame.
            handle = door + jnp.stack(
                [-0.3 * jnp.sin(st["hinge"]), -0.3 * (1 - jnp.cos(st["hinge"])),
                 jnp.float32(0.0)]
            )
            return palm, handle, door
        if self.task == "hammer":
            nail = jnp.asarray([0.0, 0.18, 0.0]) + jnp.asarray(
                [0.0, 0.0, 1.0]
            ) * st["board_z"]
            goal = nail + jnp.asarray([0.0, st["nail_depth"] - 0.09, 0.0])
            head = st["hamm_pos"] + jnp.asarray([0.0, 0.08, 0.0])
            return palm, nail, goal, head
        if self.task == "pen":
            desired_loc = jnp.asarray([0.0, -0.2, 0.25])
            return palm, desired_loc
        # relocate
        return palm, st["obj_pos"], st["target"]

    def _qmid(self, qh, width):
        """The qpos slice the oracle obs starts with (width entries)."""
        if self.na >= width:
            return qh[self.na - width:]
        return jnp.concatenate(
            [qh, jnp.zeros(width - self.na, jnp.float32)]
        )

    def _obs(self, st):
        palm = self._palm(st["qh"])
        qh, qvh = st["qh"], st["qvh"]
        if self.task == "door":
            _, handle, _ = self._world(st)
            # qpos layout: [unused(1), hand(na), door(1), latch(1)]; obs
            # drops qpos[0] and the last two, then re-appends them.
            qpos_mid = self._qmid(qh, self.nq - 3)
            door_open = jnp.where(st["hinge"] > 1.0, 1.0, -1.0)
            obs = jnp.concatenate([
                qpos_mid,
                st["latch"][None],
                st["hinge"][None],
                palm,
                handle,
                palm - handle,
                door_open[None],
            ])
        elif self.task == "hammer":
            _, nail, goal, head = self._world(st)
            qv6 = jnp.concatenate([qvh[:2], jnp.zeros(4, jnp.float32)])
            obs = jnp.concatenate([
                self._qmid(qh, self.nq - 6),
                jnp.clip(qv6, -1.0, 1.0),
                palm,
                st["hamm_pos"],
                quat2euler(jnp.asarray([1.0, 0.0, 0.0, 0.0])),
                nail,
                jnp.zeros(1, jnp.float32),  # nail impact sensor
            ])
        elif self.task == "pen":
            _, desired_loc = self._world(st)
            obs = jnp.concatenate([
                self._qmid(qh, self.nq - 6),
                st["obj_pos"],
                jnp.zeros(6, jnp.float32),
                st["obj_orien"],
                st["tar_orien"],
                st["obj_pos"] - desired_loc,
                st["obj_orien"] - st["tar_orien"],
            ])
        else:  # relocate
            obs = jnp.concatenate([
                self._qmid(qh, self.nq - 6),
                palm - st["obj_pos"],
                palm - st["target"],
                st["obj_pos"] - st["target"],
            ])
        obs = obs[: self.obs_dim]
        pad = self.obs_dim - obs.shape[0]
        if pad > 0:
            obs = jnp.concatenate([obs, jnp.zeros(pad, jnp.float32)])
        succ = self._success(st)
        return {
            "obs": obs.astype(jnp.float32),
            "info:success": succ.astype(jnp.float32),
            "info:qpos0": jnp.zeros(self.nq, jnp.float32),
        }

    def _success(self, st):
        if self.task == "door":
            return st["hinge"] >= 1.35
        if self.task == "hammer":
            return jnp.abs(0.09 - st["nail_depth"]) < 0.01
        if self.task == "pen":
            _, desired_loc = self._world(st)
            d = jnp.linalg.norm(st["obj_pos"] - desired_loc)
            sim = jnp.dot(st["obj_orien"], st["tar_orien"])
            return (d < 0.075) & (sim > 0.95)
        return jnp.linalg.norm(st["obj_pos"] - st["target"]) < 0.1

    def step_env(self, state, action, key):
        action = jnp.reshape(action, (self.na,)).astype(jnp.float32)
        qh, qvh = self._servo(state["qh"], action)
        st = dict(state)
        st["qh"], st["qvh"] = qh, qvh
        palm = self._palm(qh)
        curl = self._curl(qh)

        if self.task == "door":
            _, handle, _ = self._world(st)
            near = jnp.linalg.norm(palm - handle) < 0.12
            # Latch turns while grasped; hinge follows palm pull.
            st["latch"] = jnp.clip(
                st["latch"] + jnp.where(near, 1.2 * curl * _DT * 25.0, 0.0),
                0.0,
                1.8,
            )
            pull = -(jnp.asarray(self._palm_jac)[0] @ qvh) * _DT
            unlocked = st["latch"] > 1.0
            st["hinge"] = jnp.clip(
                st["hinge"]
                + jnp.where(near & unlocked, jnp.maximum(pull, 0.0) * 20.0, 0.0),
                0.0,
                1.57,
            )
            dense = (
                0.1 * jnp.linalg.norm(palm - handle)
                - 0.1 * (st["hinge"] - 1.57) ** 2
                - 1e-5 * jnp.sum(qvh**2)
                + jnp.where(st["hinge"] > 0.2, 2.0, 0.0)
                + jnp.where(st["hinge"] > 1.0, 8.0, 0.0)
                + jnp.where(st["hinge"] > 1.35, 10.0, 0.0)
            )
        elif self.task == "hammer":
            near = jnp.linalg.norm(palm - st["hamm_pos"]) < 0.1
            grab = near & (curl > 0.3)
            st["held"] = state["held"] | grab
            st["hamm_pos"] = jnp.where(
                st["held"], palm + jnp.asarray([0.0, 0.05, -0.02]),
                state["hamm_pos"],
            )
            _, nail, goal, head = self._world(st)
            strike = (jnp.linalg.norm(head - nail) < 0.05) & st["held"]
            speed = jnp.linalg.norm(jnp.asarray(self._palm_jac) @ qvh)
            st["nail_depth"] = jnp.clip(
                state["nail_depth"]
                + jnp.where(strike, 0.02 * speed, 0.0),
                0.0,
                0.09,
            )
            gd = jnp.abs(0.09 - st["nail_depth"])
            dense = (
                0.1 * jnp.linalg.norm(palm - st["hamm_pos"])
                - jnp.linalg.norm(head - nail)
                - 10.0 * gd
                - 1e-2 * jnp.linalg.norm(qvh)
                + jnp.where(
                    (st["hamm_pos"][2] > 0.04) & (head[2] > 0.04), 2.0, 0.0
                )
                + jnp.where(gd < 0.02, 25.0, 0.0)
                + jnp.where(gd < 0.01, 75.0, 0.0)
            )
        elif self.task == "pen":
            # Pen orientation follows finger-driven twist.
            w = jnp.stack([
                jnp.mean(qvh[6:12]),
                jnp.mean(qvh[12:18]),
                jnp.mean(qvh[2:6]),
            ]) * 0.3 * _DT
            o = st["obj_orien"] + jnp.cross(w, st["obj_orien"])
            st["obj_orien"] = o / (jnp.linalg.norm(o) + 1e-8)
            drop = curl < 0.05
            st["obj_pos"] = jnp.where(
                drop,
                state["obj_pos"] + jnp.asarray([0.0, 0.0, -0.04]),
                state["obj_pos"],
            )
            _, desired_loc = self._world(st)
            gd = jnp.linalg.norm(st["obj_pos"] - desired_loc)
            sim = jnp.dot(st["obj_orien"], st["tar_orien"])
            dense = (
                -gd
                + sim
                + jnp.where((gd < 0.075) & (sim > 0.9), 10.0, 0.0)
                + jnp.where((gd < 0.075) & (sim > 0.95), 50.0, 0.0)
                - jnp.where(st["obj_pos"][2] < 0.075, 5.0, 0.0)
            )
        else:  # relocate
            near = jnp.linalg.norm(palm - state["obj_pos"]) < 0.08
            grab = near & (curl > 0.3)
            st["held"] = state["held"] | grab
            st["held"] = st["held"] & (curl > 0.1)
            st["obj_pos"] = jnp.where(
                st["held"], palm + jnp.asarray([0.0, 0.0, -0.04]),
                state["obj_pos"],
            )
            gd = jnp.linalg.norm(st["obj_pos"] - st["target"])
            lifted = st["obj_pos"][2] > 0.04
            dense = (
                0.1 * jnp.linalg.norm(palm - st["obj_pos"])
                + jnp.where(
                    lifted,
                    1.0
                    - 0.5 * jnp.linalg.norm(palm - st["target"])
                    - 0.5 * gd,
                    0.0,
                )
                + jnp.where(gd < 0.1, 10.0, 0.0)
                + jnp.where(gd < 0.05, 20.0, 0.0)
            )

        succ = self._success(st)
        sparse = jnp.where(succ, 10.0, -0.1)
        reward = sparse if self.sparse else dense
        return EnvOut(
            state=st,
            obs=self._obs(st),
            reward=jnp.asarray(reward, jnp.float32),
            terminated=jnp.bool_(False),
        )
