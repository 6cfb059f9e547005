"""Fetch family — goal-conditioned 7-dof arm tasks (Reach/Push/Slide/PickAndPlace).

Behavioral reference: ``envpool/mujoco/robotics/fetch.h`` and
gymnasium_robotics ``envs/fetch/fetch_env.py``.  The reference steps real
MuJoCo with a mocap-welded end effector; the action is a relative ee move
(``pos_ctrl * 0.05``) plus a symmetric gripper command, applied over 20
substeps (dt = 0.04 s).

TPU-native design — operational-space abstraction: the arm is modelled
directly at the end-effector level (the mocap weld makes joint dynamics
unobservable from the task's point of view):

* ee position: first-order tracking of the mocap target,
  ``pos' = clip(pos + TRACK_GAIN * 0.05 * a[:3], workspace)`` with
  TRACK_GAIN = 0.63 and the workspace box calibrated against the real
  gymnasium_robotics rollouts (see tests/test_robotics_oracle.py).
* fingers: rate-limited position servo on the 0..0.05 m joint range.
* object: quasi-static push contact + grasp attachment + sliding with
  Coulomb decay (Slide); rotation held fixed (documented approximation —
  the flat block/puck barely rotates under planar pushes).

Goal sampling, success predicate, reward (``compute_reward``) and the
observation layout are *exact* ports of the oracle semantics and are
lockstep-tested against the installed gymnasium_robotics package.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec

_DT = 0.04            # n_substeps(20) * timestep(0.002)
_TRACK_GAIN = 0.63    # fraction of the 0.05 m command realised per step
_VELP_SCALE = 0.7     # end-of-step site velocity vs mean displacement
_FINGER_MAX = 0.05
_FINGER_GAIN = 0.7
_GRASP_DIST = 0.05    # ee-object distance that allows a grasp
_PUSH_RADIUS = 0.048  # gripper/object contact distance (block half 0.025)

# Per-xml constants measured from the oracle at reset (see module docstring).
_INIT = {
    "fetch/reach.xml": ((1.34183, 0.7491, 0.53473), 0.0),
    "fetch/push.xml": ((1.36313, 0.7491, 0.41601), 0.42489),
    "fetch/slide.xml": ((1.01327, 0.74915, 0.4155), 0.42),
    "fetch/pick_and_place.xml": ((1.34193, 0.7491, 0.53473), 0.42489),
}
_WORKSPACE_LO = (0.63, -0.31)
_WORKSPACE_HI = (1.80, 1.01)
_Z_CEIL = 1.34


class FetchEnv(TpuEnv):
    """FetchReach/Push/Slide/PickAndPlace (+Dense, v1/v4) via config."""

    DEFAULT_CONFIG = {
        "reward_threshold": 0.0,
        "xml_file": "fetch/reach.xml",
        "reward_type": "sparse",
        "has_object": False,
        "block_gripper": True,
        "target_in_the_air": True,
        "gripper_extra_height": 0.2,
        "target_offset_x": 0.0,
        "target_offset_y": 0.0,
        "target_offset_z": 0.0,
        "obj_range": 0.15,
        "target_range": 0.15,
        "distance_threshold": 0.05,
        "initial_slide0": 0.4049,
        "initial_slide1": 0.48,
        "initial_slide2": 0.0,
        "initial_object_x": 1.25,
        "initial_object_y": 0.53,
        "initial_object_z": 0.4,
        # Slide pucks keep momentum; everything else is quasi-static.
        "object_friction_decel": 1.0,
    }

    def __init__(self, config):
        super().__init__(config)
        self.has_object = bool(config["has_object"])
        self.block_gripper = bool(config["block_gripper"])
        self.sparse = str(config["reward_type"]) == "sparse"
        self.thr = float(config["distance_threshold"])
        init_grip, height = _INIT[str(config["xml_file"])]
        self.init_grip = np.asarray(init_grip, np.float32)
        self.height_offset = float(height)
        self.target_offset = np.asarray(
            [
                float(config["target_offset_x"]),
                float(config["target_offset_y"]),
                float(config["target_offset_z"]),
            ],
            np.float32,
        )
        self.obj_range = float(config["obj_range"])
        self.target_range = float(config["target_range"])
        self.in_air = bool(config["target_in_the_air"])
        self.obs_dim = 25 if self.has_object else 10
        # ee z floor: touching the table (object tasks) or free (reach).
        self.z_floor = 0.41 if self.height_offset else 0.417

    # -- specs -------------------------------------------------------------

    def state_spec(self):
        inf = float("inf")
        return {
            "obs:observation": ArraySpec(jnp.float32, (self.obs_dim,), -inf, inf),
            "obs:achieved_goal": ArraySpec(jnp.float32, (3,), -inf, inf),
            "obs:desired_goal": ArraySpec(jnp.float32, (3,), -inf, inf),
            "info:is_success": ArraySpec(jnp.float32, (), 0.0, 1.0),
            "info:distance": ArraySpec(jnp.float32, (), 0.0, inf),
            "info:goal0": ArraySpec(jnp.float32, (3,)),
        }

    def action_spec(self):
        return {"action": ArraySpec(jnp.float32, (4,), -1.0, 1.0)}

    # -- oracle-semantics pure functions (lockstep-tested) -----------------

    def compute_reward(self, achieved, desired):
        """fetch_env.py BaseFetchEnv.compute_reward — exact."""
        d = jnp.linalg.norm(achieved - desired, axis=-1)
        if self.sparse:
            return -(d > self.thr).astype(jnp.float32)
        return -d

    def sample_goal(self, key):
        """fetch_env.py _sample_goal — same sampling law."""
        k1, k2, k3 = jax.random.split(key, 3)
        base = jnp.asarray(self.init_grip)
        noise = jax.random.uniform(
            k1, (3,), jnp.float32, -self.target_range, self.target_range
        )
        if not self.has_object:
            return base + noise
        goal = base + noise + jnp.asarray(self.target_offset)
        goal = goal.at[2].set(self.height_offset)
        if self.in_air:
            lift = jax.random.uniform(k3, (), jnp.float32, 0.0, 0.45)
            goal = goal.at[2].add(
                jnp.where(jax.random.uniform(k2, ()) < 0.5, lift, 0.0)
            )
        return goal

    def sample_object_xy(self, key):
        """_reset_sim object placement: ≥0.1 from the gripper xy."""
        grip_xy = jnp.asarray(self.init_grip[:2])

        def cond(carry):
            _, xy = carry
            return jnp.linalg.norm(xy - grip_xy) < 0.1

        def body(carry):
            k, _ = carry
            k = jax.random.fold_in(k, 3)
            xy = grip_xy + jax.random.uniform(
                k, (2,), jnp.float32, -self.obj_range, self.obj_range
            )
            return k, xy

        _, xy = jax.lax.while_loop(cond, body, (key, grip_xy))
        return xy

    @staticmethod
    def assemble_obs(
        grip_pos,
        object_pos,
        gripper_state,
        object_rot,
        object_velp,
        object_velr,
        grip_velp,
        gripper_vel,
        has_object,
    ):
        """fetch_env.py _get_obs concatenation order — exact."""
        if not has_object:
            return jnp.concatenate([grip_pos, gripper_state, grip_velp, gripper_vel])
        object_rel_pos = object_pos - grip_pos
        return jnp.concatenate(
            [
                grip_pos,
                object_pos,
                object_rel_pos,
                gripper_state,
                object_rot,
                object_velp,
                object_velr,
                grip_velp,
                gripper_vel,
            ]
        )

    # -- dynamics ----------------------------------------------------------

    def _clip_workspace(self, pos):
        lo = jnp.asarray(
            [_WORKSPACE_LO[0], _WORKSPACE_LO[1], self.z_floor], jnp.float32
        )
        hi = jnp.asarray(
            [_WORKSPACE_HI[0], _WORKSPACE_HI[1], _Z_CEIL], jnp.float32
        )
        return jnp.clip(pos, lo, hi)

    def _obs(self, st):
        grip_pos = st["grip_pos"]
        fingers = st["fingers"]
        grip_velp = st["grip_velp"]
        gripper_vel = st["finger_vel"]
        if self.has_object:
            # Oracle: object site velocity * dt, minus grip_velp.
            obj_velp = st["obj_velp"] * _DT - grip_velp
            obs = self.assemble_obs(
                grip_pos,
                st["obj_pos"],
                fingers,
                st["obj_rot"],
                obj_velp,
                jnp.zeros(3, jnp.float32),
                grip_velp,
                gripper_vel,
                True,
            )
            achieved = st["obj_pos"]
        else:
            obs = self.assemble_obs(
                grip_pos, None, fingers, None, None, None, grip_velp,
                gripper_vel, False,
            )
            achieved = grip_pos
        d = jnp.linalg.norm(achieved - st["goal"])
        return {
            "obs:observation": obs.astype(jnp.float32),
            "obs:achieved_goal": achieved,
            "obs:desired_goal": st["goal"],
            "info:is_success": (d < self.thr).astype(jnp.float32),
            "info:distance": d,
            "info:goal0": st["goal"],
        }

    def reset_env(self, key):
        kg, ko = jax.random.split(key)
        goal = self.sample_goal(kg)
        if self.has_object:
            obj_xy = self.sample_object_xy(ko)
            obj_pos = jnp.concatenate(
                [obj_xy, jnp.full((1,), self.height_offset, jnp.float32)]
            )
        else:
            obj_pos = jnp.zeros(3, jnp.float32)
        st = {
            "grip_pos": jnp.asarray(self.init_grip),
            "grip_velp": jnp.zeros(3, jnp.float32),
            "fingers": jnp.zeros(2, jnp.float32),
            "finger_vel": jnp.zeros(2, jnp.float32),
            "obj_pos": obj_pos,
            "obj_rot": jnp.zeros(3, jnp.float32),
            "obj_velp": jnp.zeros(3, jnp.float32),
            "grasped": jnp.bool_(False),
            "goal": goal,
        }
        return st, self._obs(st)

    def step_env(self, state, action, key):
        a = jnp.clip(jnp.reshape(action, (4,)).astype(jnp.float32), -1.0, 1.0)
        pos_ctrl, grip_ctrl = a[:3], a[3]

        grip_pos = state["grip_pos"]
        new_grip = self._clip_workspace(
            grip_pos + _TRACK_GAIN * 0.05 * pos_ctrl
        )
        disp = new_grip - grip_pos
        grip_velp = _VELP_SCALE * disp  # site velocity * dt convention

        # Fingers: rate-limited servo toward qpos + ctrl (relative
        # position actuator, mujoco_utils.ctrl_set_action).
        fingers = state["fingers"]
        if self.block_gripper:
            new_fingers = jnp.zeros(2, jnp.float32)
        else:
            target = jnp.clip(fingers + grip_ctrl * _FINGER_MAX, 0.0, _FINGER_MAX)
            new_fingers = fingers + _FINGER_GAIN * (target - fingers)
        finger_vel = new_fingers - fingers

        obj_pos = state["obj_pos"]
        obj_velp = state["obj_velp"]
        grasped = state["grasped"]
        if self.has_object:
            # Grasp: fingers closing around a near object (PickAndPlace).
            if self.block_gripper:
                grasped = jnp.bool_(False)
            else:
                near = jnp.linalg.norm(obj_pos - new_grip) < _GRASP_DIST
                closing = (grip_ctrl < 0.0) & (new_fingers[0] < 0.03)
                keep = grasped & (new_fingers[0] < 0.04)
                grasped = (near & closing) | keep
            held_pos = new_grip
            # Push: project the object out of the gripper's contact disk.
            rel = obj_pos[:2] - new_grip[:2]
            dist_xy = jnp.linalg.norm(rel) + 1e-8
            z_touch = jnp.abs(new_grip[2] - obj_pos[2]) < 0.06
            pen = _PUSH_RADIUS - dist_xy
            # Open fingers straddle the object (no push) — only a blocked
            # or closed gripper acts as a pusher.
            if self.block_gripper:
                solid = jnp.bool_(True)
            else:
                solid = new_fingers[0] < 0.02
            pushed = (pen > 0) & z_touch & ~grasped & solid
            push_vec = rel / dist_xy * jnp.maximum(pen, 0.0)
            free_xy = obj_pos[:2] + jnp.where(pushed, push_vec, 0.0)
            # Sliding with Coulomb decay (Slide puck momentum).
            decel = float(self.config["object_friction_decel"]) * _DT
            speed = jnp.linalg.norm(obj_velp[:2]) + 1e-8
            new_speed = jnp.maximum(speed - decel, 0.0)
            slide_vel = obj_velp[:2] * (new_speed / speed)
            free_xy = free_xy + _DT * slide_vel
            push_impulse = jnp.where(pushed, push_vec / _DT, 0.0)
            new_velp_xy = slide_vel + push_impulse
            free_pos = jnp.concatenate(
                [free_xy, jnp.full((1,), self.height_offset, jnp.float32)]
            )
            obj_pos = jnp.where(grasped, held_pos, free_pos)
            obj_velp3 = jnp.where(
                grasped,
                disp / _DT,
                jnp.concatenate([new_velp_xy, jnp.zeros(1, jnp.float32)]),
            )
            obj_velp = obj_velp3

        st = {
            "grip_pos": new_grip,
            "grip_velp": grip_velp,
            "fingers": new_fingers,
            "finger_vel": finger_vel,
            "obj_pos": obj_pos,
            "obj_rot": state["obj_rot"],
            "obj_velp": obj_velp,
            "grasped": grasped,
            "goal": state["goal"],
        }
        achieved = obj_pos if self.has_object else new_grip
        reward = self.compute_reward(achieved, state["goal"])
        return EnvOut(
            state=st,
            obs=self._obs(st),
            reward=jnp.asarray(reward, jnp.float32),
            terminated=jnp.bool_(False),
        )
