"""FrankaKitchen-v1 — multitask kitchen manipulation.

Behavioral reference: ``envpool/mujoco/robotics/kitchen.h`` and
gymnasium_robotics ``envs/franka_kitchen/kitchen_env.py``: a 9-dof Franka
arm in a kitchen with 7 interactable elements (burners, light switch,
cabinets, microwave, kettle).  qpos = 9 robot + 21 object dofs (kettle is
a free body), qvel = 9 + 20; observation = [robot qpos(9), robot qvel(9),
obj qpos(21), obj qvel(20)] = 59 with per-task achieved/desired goal
sub-dicts; reward = number of tasks newly completed this step
(element within BONUS_THRESH=0.3 of its goal config); completed tasks
are removed from ``tasks_to_complete``; terminate when all done.

TPU-native design: arm joints are a rate-limited servo bank; the end
effector is a fixed linear map of arm qpos, and each element's dofs move
toward their goal while the ee is within that element's interaction
radius (deterministic surrogate, not MuJoCo contacts — documented).
Goal configs, completion predicate, reward accounting and obs layout are
exact ports.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec

_DT = 0.08  # frame_skip 40 * 0.002
BONUS_THRESH = 0.3

TASKS = (
    "bottom burner",
    "top burner",
    "light switch",
    "slide cabinet",
    "hinge cabinet",
    "microwave",
    "kettle",
)
# Object-dof slices within qpos (OBS_ELEMENT_INDICES, kitchen_env.py:27-35).
ELEMENT_INDICES = {
    "bottom burner": (11, 12),
    "top burner": (15, 16),
    "light switch": (17, 18),
    "slide cabinet": (19,),
    "hinge cabinet": (20, 21),
    "microwave": (22,),
    "kettle": (23, 24, 25, 26, 27, 28, 29),
}
ELEMENT_GOALS = {
    "bottom burner": (-0.88, -0.01),
    "top burner": (-0.92, -0.01),
    "light switch": (-0.69, -0.05),
    "slide cabinet": (0.37,),
    "hinge cabinet": (0.0, 1.45),
    "microwave": (-0.75,),
    "kettle": (-0.23, 0.75, 1.62, 0.99, 0.0, 0.0, -0.06),
}
# Element handle locations in the (surrogate) workspace.
ELEMENT_POS = {
    "bottom burner": (-0.3, 0.5, 0.6),
    "top burner": (-0.3, 0.5, 1.0),
    "light switch": (-0.2, 0.6, 1.4),
    "slide cabinet": (0.3, 0.5, 1.2),
    "hinge cabinet": (0.5, 0.5, 1.2),
    "microwave": (-0.6, 0.4, 0.8),
    "kettle": (0.0, 0.4, 0.8),
}
INIT_QPOS = np.zeros(30, np.float32)
INIT_QPOS[:9] = [
    0.148388, -1.768486, 1.843903, -2.476858, 0.260252, 0.712533,
    1.595154, 0.047927, 0.037756,
]
INIT_QPOS[23:30] = [-0.269, 0.35, 1.62, 0.99, 0.0, 0.0, 0.0]


class FrankaKitchenEnv(TpuEnv):
    DEFAULT_CONFIG = {
        "reward_threshold": 0.0,
        "xml_file": "kitchen_franka/kitchen_assets/kitchen_env_model.xml",
        "frame_skip": 40,
        "tasks_to_complete": list(TASKS),
        "terminate_on_tasks_completed": True,
        "remove_task_when_completed": True,
        "robot_noise_ratio": 0.01,
        "object_noise_ratio": 0.0005,
    }

    def __init__(self, config):
        super().__init__(config)
        self.tasks = [str(t) for t in config["tasks_to_complete"]]
        self.terminate_on_completed = bool(
            config["terminate_on_tasks_completed"]
        )
        rng = np.random.default_rng(11)
        J = np.zeros((3, 9), np.float32)
        J[0, 0], J[1, 1], J[2, 3] = 0.5, 0.5, 0.4
        J += 0.02 * rng.standard_normal(J.shape).astype(np.float32)
        self._ee_jac = J
        self._ee0 = np.asarray([0.0, 0.3, 1.0], np.float32)

    def state_spec(self):
        inf = float("inf")
        spec = {
            "obs:observation": ArraySpec(jnp.float32, (59,), -inf, inf),
            "info:tasks_to_complete": ArraySpec(jnp.float32, (7,), 0.0, 1.0),
            "info:step_task_completions": ArraySpec(
                jnp.float32, (7,), 0.0, 1.0
            ),
            "info:episode_task_completions": ArraySpec(
                jnp.float32, (7,), 0.0, 1.0
            ),
            "info:qpos0": ArraySpec(jnp.float32, (30,)),
            "info:qvel0": ArraySpec(jnp.float32, (29,)),
        }
        for t in TASKS:
            n = len(ELEMENT_GOALS[t])
            spec[f"obs:desired_goal:{t}"] = ArraySpec(jnp.float32, (n,), -inf, inf)
            spec[f"obs:achieved_goal:{t}"] = ArraySpec(jnp.float32, (n,), -inf, inf)
        return spec

    def action_spec(self):
        return {"action": ArraySpec(jnp.float32, (9,), -1.0, 1.0)}

    def _ee(self, arm):
        return jnp.asarray(self._ee0) + jnp.asarray(self._ee_jac) @ arm

    def _obs(self, st):
        qpos, qvel = st["qpos"], st["qvel"]
        out = {
            "obs:observation": jnp.concatenate(
                [qpos[:9], qvel[:9], qpos[9:30], qvel[9:29]]
            ).astype(jnp.float32),
            "info:tasks_to_complete": st["todo"].astype(jnp.float32),
            "info:step_task_completions": st["step_done"].astype(jnp.float32),
            "info:episode_task_completions": st["episode_done"].astype(
                jnp.float32
            ),
            "info:qpos0": jnp.asarray(INIT_QPOS),
            "info:qvel0": jnp.zeros(29, jnp.float32),
        }
        for t in TASKS:
            idx = jnp.asarray(ELEMENT_INDICES[t])
            out[f"obs:achieved_goal:{t}"] = qpos[idx].astype(jnp.float32)
            out[f"obs:desired_goal:{t}"] = jnp.asarray(
                ELEMENT_GOALS[t], jnp.float32
            )
        return out

    def reset_env(self, key):
        todo = jnp.asarray(
            [1.0 if t in self.tasks else 0.0 for t in TASKS], jnp.float32
        )
        st = {
            "qpos": jnp.asarray(INIT_QPOS),
            "qvel": jnp.zeros(29, jnp.float32),
            "todo": todo,
            "step_done": jnp.zeros(7, jnp.float32),
            "episode_done": jnp.zeros(7, jnp.float32),
        }
        return st, self._obs(st)

    def step_env(self, state, action, key):
        a = jnp.clip(jnp.reshape(action, (9,)).astype(jnp.float32), -1.0, 1.0)
        qpos, qvel = state["qpos"], state["qvel"]
        arm = qpos[:9]
        target = a * 2.5
        delta = jnp.clip(0.3 * (target - arm), -0.3, 0.3)
        new_arm = arm + delta
        arm_vel = delta / _DT
        ee = self._ee(new_arm)
        ee_speed = jnp.linalg.norm(jnp.asarray(self._ee_jac) @ arm_vel)

        new_qpos = qpos.at[:9].set(new_arm)
        new_qvel = qvel.at[:9].set(arm_vel)
        # Elements progress toward their goal config while the ee dwells
        # near their handle (surrogate interaction).
        for t in TASKS:
            idx = jnp.asarray(ELEMENT_INDICES[t])
            handle = jnp.asarray(ELEMENT_POS[t], jnp.float32)
            near = jnp.linalg.norm(ee - handle) < 0.35
            goal = jnp.asarray(ELEMENT_GOALS[t], jnp.float32)
            cur = new_qpos[idx]
            rate = jnp.where(near, jnp.minimum(0.08 * ee_speed, 0.5), 0.0)
            nxt = cur + rate * (goal - cur)
            new_qpos = new_qpos.at[idx].set(nxt)

        # Completion bookkeeping (kitchen_env.step).
        step_done = jnp.zeros(7, jnp.float32)
        todo = state["todo"]
        episode_done = state["episode_done"]
        for i, t in enumerate(TASKS):
            idx = jnp.asarray(ELEMENT_INDICES[t])
            goal = jnp.asarray(ELEMENT_GOALS[t], jnp.float32)
            d = jnp.linalg.norm(new_qpos[idx] - goal)
            complete = (d < BONUS_THRESH) & (todo[i] > 0)
            step_done = step_done.at[i].set(complete.astype(jnp.float32))
            todo = todo.at[i].add(-complete.astype(jnp.float32))
            episode_done = episode_done.at[i].max(
                complete.astype(jnp.float32)
            )

        reward = jnp.sum(step_done)
        n_goal = jnp.float32(len(self.tasks))
        terminated = (
            (jnp.sum(episode_done) >= n_goal)
            if self.terminate_on_completed
            else jnp.bool_(False)
        )
        st = {
            "qpos": new_qpos,
            "qvel": new_qvel,
            "todo": todo,
            "step_done": step_done,
            "episode_done": episode_done,
        }
        return EnvOut(
            state=st,
            obs=self._obs(st),
            reward=jnp.asarray(reward, jnp.float32),
            terminated=jnp.asarray(terminated, jnp.bool_),
        )
