"""Sawyer arm core for the MetaWorld v3 family.

Behavioral reference: ``envpool/mujoco/metaworld/metaworld_env.h`` — the
reference steps real MuJoCo with a mocap-welded Sawyer end effector.
TPU-native design (as for Fetch, envs/robotics/fetch.py): the arm is
modelled at the end-effector level.

Exact-surface parts (mirroring the reference):
* action = 4 floats in [-1, 1]: xyz mocap delta of 0.01 m/step clamped
  to the per-task hand box (``SetXYZAction``, metaworld_env.h:702-711)
  plus gripper effort;
* obs (39,) = [curr(18) = tcp(3), gripper open fraction(1), obj1 pos(3)
  + quat(4), obj2 pos(3) + quat(4); prev(18); goal(3)] with the goal
  zeroed when ``partially_observable`` (metaworld's hidden-goal mode);
* info keys: success, near_object, grasp_success, grasp_reward,
  in_place_reward, obj_to_target, unscaled_reward.

Interaction dynamics per task category (tasks.py) are a documented
surrogate (quasi-static push / grasp attach / 1-dof articulation driven
by tcp engagement); the reward keeps the reference's structure —
reach/caging term composed with an in-place tolerance term via a
hamacher product, scaled to [0, 10].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec
from .tasks import TASKS

_STEP = 0.01
_HAND_LOW = np.asarray([-0.525, 0.348, -0.0525], np.float32)
_HAND_HIGH = np.asarray([0.525, 1.025, 0.7], np.float32)
_HAND_INIT = np.asarray([0.0, 0.6, 0.2], np.float32)
_GRASP_DIST = 0.05
_PUSH_RADIUS = 0.04
_ENGAGE_DIST = 0.06


def _hamacher(a, b):
    """metaworld reward_utils.hamacher_product."""
    denom = a + b - a * b
    return jnp.where(denom > 0, a * b / denom, 0.0)


def _tolerance(d, margin):
    """Long-tail closeness in [0, 1] (metaworld's tolerance flavor)."""
    return 1.0 / (1.0 + (d / margin) ** 2)


def _tolerance_exact(d, bound, margin, value_at_margin=0.1):
    """metaworld reward_utils.tolerance with sigmoid="long_tail".

    Exactly dm_control's long_tail: 1 inside [0, bound]; outside,
    1 / ((x·scale)² + 1) with x = (d − bound)/margin and scale chosen so
    the value at x = 1 equals ``value_at_margin`` (default 0.1).
    """
    scale = jnp.sqrt(1.0 / value_at_margin - 1.0)
    x = (d - bound) / jnp.maximum(margin, 1e-8)
    out = 1.0 / ((x * scale) ** 2 + 1.0)
    return jnp.where(d <= bound, 1.0, out)


class SawyerEnv(TpuEnv):
    """All 50 MetaWorld tasks via the ``task_name`` config key."""

    DEFAULT_CONFIG = {
        "reward_threshold": 10.0,
        "task_name": "reach-v3",
        "partially_observable": True,
    }

    def __init__(self, config):
        super().__init__(config)
        name = str(config["task_name"])
        (self.category, obj_lo, obj_hi, goal_lo, goal_hi, self.thr,
         axis) = TASKS[name]
        self.obj_lo = np.asarray(obj_lo, np.float32)
        self.obj_hi = np.asarray(obj_hi, np.float32)
        # 1-dof tasks: the goal is the articulated displacement target.
        self.goal_lo = np.asarray(
            goal_lo if goal_lo is not None else obj_lo, np.float32
        )
        self.goal_hi = np.asarray(
            goal_hi if goal_hi is not None else obj_hi, np.float32
        )
        self.axis = (
            np.asarray(axis, np.float32) if axis is not None else None
        )
        self.partially_observable = bool(config["partially_observable"])

    # -- specs -------------------------------------------------------------

    def state_spec(self):
        inf = float("inf")
        return {
            "obs": ArraySpec(jnp.float32, (39,), -inf, inf),
            "info:success": ArraySpec(jnp.float32, (), 0.0, 1.0),
            "info:near_object": ArraySpec(jnp.float32, ()),
            "info:grasp_success": ArraySpec(jnp.float32, (), 0.0, 1.0),
            "info:grasp_reward": ArraySpec(jnp.float32, ()),
            "info:in_place_reward": ArraySpec(jnp.float32, ()),
            "info:obj_to_target": ArraySpec(jnp.float32, ()),
            "info:unscaled_reward": ArraySpec(jnp.float32, ()),
        }

    def action_spec(self):
        return {"action": ArraySpec(jnp.float32, (4,), -1.0, 1.0)}

    # -- helpers -----------------------------------------------------------

    def _articulated_target(self, obj0):
        """Target position for press/turn/slide: displaced along axis."""
        mag = {
            "press": 0.05,
            "slide": 0.12,
            "turn": 0.15,
        }[self.category]
        return obj0 + jnp.asarray(self.axis) * mag

    def _curr_frame(self, st):
        return jnp.concatenate(
            [
                st["tcp"],
                st["grip"][None],
                st["obj_pos"],
                st["obj_quat"],
                jnp.zeros(7, jnp.float32),  # second object slot unused
            ]
        )

    def _obs(self, st):
        curr = self._curr_frame(st)
        goal = (
            jnp.zeros(3, jnp.float32)
            if self.partially_observable
            else st["goal"]
        )
        d = jnp.linalg.norm(st["obj_pos"] - st["goal"])
        if self.category == "reach":
            d = jnp.linalg.norm(st["tcp"] - st["goal"])
        success = d < self.thr
        near = jnp.linalg.norm(st["tcp"] - st["obj_pos"]) < _ENGAGE_DIST
        return {
            "obs": jnp.concatenate([curr, st["prev"], goal]).astype(
                jnp.float32
            ),
            "info:success": success.astype(jnp.float32),
            "info:near_object": near.astype(jnp.float32),
            "info:grasp_success": st["grasped"].astype(jnp.float32),
            "info:grasp_reward": st["grasp_reward"],
            "info:in_place_reward": st["in_place_reward"],
            "info:obj_to_target": d,
            "info:unscaled_reward": st["unscaled_reward"],
        }

    # -- reset / step ------------------------------------------------------

    def reset_env(self, key):
        ko, kg = jax.random.split(key)
        obj = jax.random.uniform(
            ko, (3,), jnp.float32, jnp.asarray(self.obj_lo),
            jnp.asarray(self.obj_hi),
        )
        if self.category in ("press", "turn", "slide"):
            goal = self._articulated_target(obj)
        else:
            goal = jax.random.uniform(
                kg, (3,), jnp.float32, jnp.asarray(self.goal_lo),
                jnp.asarray(self.goal_hi),
            )
        st = {
            "tcp": jnp.asarray(_HAND_INIT),
            "grip": jnp.float32(1.0),  # open fraction
            "obj_pos": obj,
            "obj_quat": jnp.asarray([1.0, 0.0, 0.0, 0.0]),
            "obj0": obj,
            "goal": goal,
            "grasped": jnp.bool_(False),
            "prev": jnp.zeros(18, jnp.float32),
            "grasp_reward": jnp.float32(0.0),
            "in_place_reward": jnp.float32(0.0),
            "unscaled_reward": jnp.float32(0.0),
        }
        st["prev"] = self._curr_frame(st)
        return st, self._obs(st)

    def step_env(self, state, action, key):
        a = jnp.clip(jnp.reshape(action, (4,)).astype(jnp.float32), -1, 1)
        prev_curr = self._curr_frame(state)
        tcp = jnp.clip(
            state["tcp"] + a[:3] * _STEP,
            jnp.asarray(_HAND_LOW),
            jnp.asarray(_HAND_HIGH),
        )
        # Gripper: effort in [-1, 1] → open fraction servo.
        grip = jnp.clip(state["grip"] - 0.4 * a[3], 0.0, 1.0)

        obj = state["obj_pos"]
        obj0 = state["obj0"]
        grasped = state["grasped"]
        near = jnp.linalg.norm(obj - tcp) < _GRASP_DIST

        if self.category == "reach":
            pass
        elif self.category == "pick":
            closing = (a[3] > 0.0) & (grip < 0.6)
            keep = grasped & (grip < 0.7)
            grasped = (near & closing) | keep
            obj = jnp.where(grasped, tcp, obj)
        elif self.category == "push":
            # Quasi-static horizontal push (object stays at table height).
            rel = obj[:2] - tcp[:2]
            dist = jnp.linalg.norm(rel) + 1e-8
            z_touch = jnp.abs(tcp[2] - obj[2]) < 0.05
            pen = _PUSH_RADIUS - dist
            pushed = (pen > 0) & z_touch
            new_xy = obj[:2] + jnp.where(pushed, rel / dist * pen, 0.0)
            obj = jnp.concatenate([new_xy, obj[2:3]])
        else:
            # 1-dof articulation: displacement along the task axis tracks
            # the tcp's motion while engaged near the handle.
            engaged = jnp.linalg.norm(obj - tcp) < _ENGAGE_DIST
            ax = jnp.asarray(self.axis)
            tcp_d = (tcp - state["tcp"]) @ ax
            # Press: pushing past the face also moves it.
            drive = jnp.where(
                engaged, jnp.maximum(tcp_d, 0.0) if self.category == "press"
                else tcp_d, 0.0,
            )
            disp = (obj - obj0) @ ax
            max_disp = jnp.linalg.norm(
                self._articulated_target(obj0) - obj0
            )
            disp = jnp.clip(disp + drive, 0.0, max_disp)
            obj = obj0 + ax * disp

        # Reward: reach/caging ⊗ in-place (reference structure).
        tcp_to_obj = jnp.linalg.norm(tcp - obj)
        if self.category == "reach":
            # Exact metaworld SawyerReachEnvV2.compute_reward: reward =
            # 10 · tolerance(|tcp − target|, bounds=(0, 0.05),
            # margin=|hand_init − target|, long_tail) — crosschecked by
            # the independent scalar oracle in tests/test_metaworld.py.
            target_d = jnp.linalg.norm(tcp - state["goal"])
            in_place = _tolerance_exact(
                target_d, 0.05,
                jnp.linalg.norm(jnp.asarray(_HAND_INIT) - state["goal"]),
            )
            unscaled = in_place
            grasp_reward = jnp.float32(0.0)
        else:
            target_d = jnp.linalg.norm(obj - state["goal"])
            reach = _tolerance(tcp_to_obj, 0.08)
            if self.category == "pick":
                closed = 1.0 - grip
                grasp_reward = jnp.where(
                    near, reach * (0.5 + 0.5 * closed), reach * 0.5
                )
            else:
                grasp_reward = reach
            in_place = _tolerance(target_d, 0.1)
            unscaled = _hamacher(grasp_reward, in_place)
        success = target_d < self.thr
        if self.category == "reach":
            reward = unscaled * 10.0  # metaworld reach has no override
        else:
            reward = jnp.where(success, 10.0, unscaled * 10.0)

        st = {
            "tcp": tcp,
            "grip": grip,
            "obj_pos": obj,
            "obj_quat": state["obj_quat"],
            "obj0": obj0,
            "goal": state["goal"],
            "grasped": grasped,
            "prev": prev_curr,
            "grasp_reward": jnp.asarray(grasp_reward, jnp.float32),
            "in_place_reward": jnp.asarray(in_place, jnp.float32),
            "unscaled_reward": jnp.asarray(unscaled, jnp.float32),
        }
        return EnvOut(
            state=st,
            obs=self._obs(st),
            reward=jnp.asarray(reward, jnp.float32),
            terminated=jnp.bool_(False),
        )
