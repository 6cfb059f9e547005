"""MyoSuite core tasks as one configurable muscle-control env.

MyoSuite's common structure (public myosuite BaseV0/env_base):

* action: muscle activations a ∈ [-1, 1], normalized to [0, 1] and
  passed through a first-order activation filter (tau ~ 10 ms);
* observation: [qpos, qvel, activations, task terms (pose error /
  target position / object state)];
* reward: weighted dense terms — pose/reach distance, activation effort
  penalty, and a "solved" bonus when within threshold;
* Fixed variants use a constant target; Random resample per episode.

Joint/muscle counts follow the real models (finger 4 joints / 5
muscles, elbow 1/6, hand 23/39, leg 14/80); the muscle-to-joint moment
mapping is a fixed surrogate matrix (documented — the real
musculoskeletal geometry needs the MyoSuite assets).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec

# (n_joints, n_muscles) per body part.
_BODIES = {
    "finger": (4, 5),
    "elbow": (1, 6),
    "hand": (23, 39),
    "leg": (14, 80),
}
# MuJoCo muscle activation dynamics (mjDYN_MUSCLE, Millard et al.):
# activation and deactivation time constants are asymmetric and scale
# with the current activation level.
_TAU_ACT = 0.01
_TAU_DEACT = 0.04
_DT = 0.02


class MyoEnv(TpuEnv):
    """All registered MyoSuite ids via (body, task, variant) config."""

    DEFAULT_CONFIG = {
        "body": "finger",
        "task": "pose",      # pose | reach | key | hold | twirl | walk
        "variant": "random",  # fixed | random
        "pose_thd": 0.35,
        "solved_bonus": 1.0,
    }

    def __init__(self, config):
        super().__init__(config)
        self.body = str(config["body"])
        self.task = str(config["task"])
        self.random_target = str(config["variant"]) == "random"
        self.nj, self.nm = _BODIES[self.body]
        rng = np.random.default_rng(hash(self.body) % 2**31)
        # Surrogate muscle→joint moment arms: each muscle pulls 1-3
        # joints with mixed signs (antagonist pairs).
        M = rng.normal(0, 0.5, (self.nj, self.nm)).astype(np.float32)
        keep = rng.random((self.nj, self.nm)) < min(1.0, 3.0 / self.nj)
        self.moment = np.where(keep, M, 0.0).astype(np.float32)
        extra = {
            "pose": self.nj,       # target pose
            "reach": 3,            # target tip position
            "key": 1,              # key angle
            "hold": 4,             # object pos + drop flag
            "twirl": 4,            # pen orientation + err
            "walk": 3,             # torso height/vel terms
        }[self.task]
        self.obs_dim = self.nj * 2 + self.nm + extra

    def state_spec(self):
        inf = float("inf")
        return {
            "obs": ArraySpec(jnp.float32, (self.obs_dim,), -inf, inf),
            "info:solved": ArraySpec(jnp.float32, (), 0.0, 1.0),
        }

    def action_spec(self):
        return {"action": ArraySpec(jnp.float32, (self.nm,), -1.0, 1.0)}

    def _tip(self, q):
        """Surrogate fingertip/end-point: fixed linear map of qpos."""
        W = jnp.asarray(self.moment[: min(3, self.nj), :].T[: self.nj, :3].T
                        if False else self.moment[:3, : self.nj]
                        if self.nj >= 3 else self.moment[:, : self.nj])
        # Simple stable map: first three joint angles → xyz.
        pad = jnp.zeros(3, jnp.float32)
        n = min(3, self.nj)
        return pad.at[:n].set(0.1 * q[:n])

    def _sample_target(self, key):
        if self.task == "pose":
            lo, hi = -1.0, 1.0
            t = jax.random.uniform(key, (self.nj,), jnp.float32, lo, hi)
            return jnp.where(self.random_target, t, jnp.zeros(self.nj) + 0.5)
        if self.task == "reach":
            t = jax.random.uniform(key, (3,), jnp.float32, -0.2, 0.2)
            return jnp.where(
                self.random_target, t, jnp.asarray([0.1, 0.1, 0.0])
            )
        if self.task == "key":
            t = jax.random.uniform(key, (1,), jnp.float32, 0.5, 1.5)
            return jnp.where(self.random_target, t, jnp.full((1,), 1.0))
        if self.task == "twirl":
            t = jax.random.uniform(key, (1,), jnp.float32, -jnp.pi, jnp.pi)
            return jnp.where(self.random_target, t, jnp.full((1,), 1.0))
        return jnp.zeros(1, jnp.float32)

    def _obs(self, st):
        parts = [st["q"], st["qd"], st["act"]]
        if self.task == "pose":
            parts.append(st["target"] - st["q"])
        elif self.task == "reach":
            parts.append(st["target"] - self._tip(st["q"]))
        elif self.task == "key":
            parts.append(st["target"] - st["obj"][:1])
        elif self.task == "hold":
            parts.append(
                jnp.concatenate([st["obj"][:3], st["obj"][3:4]])
            )
        elif self.task == "twirl":
            parts.append(
                jnp.concatenate(
                    [
                        jnp.sin(st["obj"][:1]),
                        jnp.cos(st["obj"][:1]),
                        st["target"] - st["obj"][:1],
                        st["obj"][1:2],
                    ]
                )
            )
        else:  # walk
            parts.append(st["obj"][:3])
        obs = jnp.concatenate(parts)[: self.obs_dim]
        pad = self.obs_dim - obs.shape[0]
        if pad > 0:
            obs = jnp.concatenate([obs, jnp.zeros(pad, jnp.float32)])
        return {
            "obs": obs.astype(jnp.float32),
            "info:solved": st["solved"].astype(jnp.float32),
        }

    def reset_env(self, key):
        kq, kt = jax.random.split(key)
        q = 0.1 * jax.random.normal(kq, (self.nj,), jnp.float32)
        st = {
            "q": q,
            "qd": jnp.zeros(self.nj, jnp.float32),
            "act": jnp.zeros(self.nm, jnp.float32),
            "target": self._sample_target(kt),
            "obj": jnp.zeros(4, jnp.float32),
            "solved": jnp.bool_(False),
        }
        return st, self._obs(st)

    def step_env(self, state, action, key):
        a = jnp.clip(jnp.reshape(action, (self.nm,)), -1.0, 1.0)
        ctrl = 0.5 * (a + 1.0)  # muscle activations in [0, 1]
        # Asymmetric activation dynamics (MuJoCo muscle model):
        # tau = tau_act·(0.5+1.5·act) rising, tau_deact/(0.5+1.5·act)
        # falling; integrated exactly over the control step (the Euler
        # form is unstable at dt/tau = 2).
        act0 = state["act"]
        scale = 0.5 + 1.5 * act0
        tau_eff = jnp.where(
            ctrl > act0, _TAU_ACT * scale, _TAU_DEACT / scale
        )
        act = ctrl + (act0 - ctrl) * jnp.exp(-_DT / tau_eff)
        # Joint dynamics: muscle torques through the moment matrix with
        # passive stiffness/damping (critically damped surrogate).
        tau = jnp.asarray(self.moment) @ act
        qd = 0.9 * state["qd"] + _DT * (tau * 8.0 - 4.0 * state["q"])
        q = jnp.clip(state["q"] + _DT * qd, -2.0, 2.0)

        obj = state["obj"]
        if self.task == "key":
            # Key turns with the mean flexion velocity while engaged.
            obj = obj.at[0].add(
                _DT * jnp.clip(jnp.mean(qd), -2.0, 2.0)
            )
        elif self.task == "twirl":
            obj = obj.at[0].add(_DT * jnp.mean(qd[: self.nj]))
            obj = obj.at[1].set(jnp.mean(act))
        elif self.task == "hold":
            grip = jnp.mean(act)
            falling = grip < 0.2
            obj = obj.at[2].add(jnp.where(falling, -0.02, 0.0))
            obj = obj.at[3].set(falling.astype(jnp.float32))
        elif self.task == "walk":
            speed = jnp.clip(jnp.mean(jnp.abs(qd)) * 0.5, 0.0, 2.0)
            obj = obj.at[0].add(_DT * speed)  # distance
            obj = obj.at[1].set(speed)
            obj = obj.at[2].set(1.0 - jnp.clip(jnp.abs(jnp.mean(q)), 0, 1))

        # Rewards (myosuite weighted dense structure).
        effort = jnp.mean(act**2)
        thd = float(self.config["pose_thd"])
        if self.task == "pose":
            err = jnp.linalg.norm(q - state["target"]) / np.sqrt(self.nj)
            solved = err < thd
            reward = -err - 0.1 * effort + jnp.where(
                solved, float(self.config["solved_bonus"]), 0.0
            )
        elif self.task == "reach":
            err = jnp.linalg.norm(self._tip(q) - state["target"])
            solved = err < 0.05
            reward = -5.0 * err - 0.1 * effort + jnp.where(solved, 1.0, 0.0)
        elif self.task == "key":
            err = jnp.abs(obj[0] - state["target"][0])
            solved = err < 0.1
            reward = -err - 0.1 * effort + jnp.where(solved, 1.0, 0.0)
        elif self.task == "hold":
            solved = obj[2] > -0.05
            reward = jnp.where(solved, 1.0, -1.0) - 0.1 * effort
        elif self.task == "twirl":
            err = jnp.abs(
                jnp.mod(obj[0] - state["target"][0] + jnp.pi, 2 * jnp.pi)
                - jnp.pi
            )
            solved = err < 0.3
            reward = -err - 0.1 * effort + jnp.where(solved, 1.0, 0.0)
        else:  # walk
            solved = obj[1] > 0.8
            reward = obj[1] + obj[2] - 0.1 * effort
        st = {
            "q": q,
            "qd": qd,
            "act": act,
            "target": state["target"],
            "obj": obj,
            "solved": jnp.asarray(solved, jnp.bool_),
        }
        return EnvOut(
            state=st,
            obs=self._obs(st),
            reward=jnp.asarray(reward, jnp.float32),
            terminated=jnp.bool_(False),
        )
