"""Gym-MuJoCo env family base over the TPU physics engine.

Behavioral reference: ``envpool/mujoco/gym/mujoco_env.h:45-267`` and the
per-task headers (e.g. ``half_cheetah.h:31-191``).  The reference wraps
real MuJoCo on CPU; here the model constants are extracted from the *same
MJCF XMLs* (shipped with gymnasium) and stepping runs on TPU via
``envpool_tpu.physics``.  Dynamics fidelity: exact (float32) vs MuJoCo for
contact-free models, behavior-level for contact-rich ones (penalty contacts
replace the LCP solver — SURVEY.md §7 hard part 1).

Config mirrors the reference env surface: ``frame_skip``, ``xml_file``,
``reset_noise_scale``, ``ctrl_cost_weight``, ``forward_reward_weight``,
``exclude_current_positions_from_observation``, plus engine extensions
``substeps`` / ``contact_kp`` / ``contact_kd`` for the penalty solver.
"""

from __future__ import annotations

import functools
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec
from ...physics import ContactParams, PhysModel, from_mjcf
from ...physics.dynamics import step as phys_step


@functools.lru_cache(maxsize=32)
def _load_model(xml_file: str) -> PhysModel:
    if not os.path.isabs(xml_file):
        import gymnasium

        xml_file = os.path.join(
            os.path.dirname(gymnasium.__file__),
            "envs",
            "mujoco",
            "assets",
            xml_file,
        )
    return from_mjcf(xml_file)


class MujocoGymEnv(TpuEnv):
    """Base for Gym-style locomotion tasks."""

    XML = ""
    FRAME_SKIP = 5
    EXTRA_CONFIG: dict[str, Any] = {}

    def __init__(self, config):
        super().__init__(config)
        self.model = _load_model(config["xml_file"] or self.XML)
        integ = str(config["integrator"])
        if integ != "model":
            # Fast mode: Euler with implicit damping (the MJX/Brax
            # tradeoff) is ~10x cheaper than the XML's RK4; "model" keeps
            # the MuJoCo-faithful integrator.
            import dataclasses as _dc

            self.model = _dc.replace(
                self.model, integrator={"euler": 0, "rk4": 1}[integ]
            )
        fs = config["frame_skip"]
        self.frame_skip = int(type(self).FRAME_SKIP if fs is None else fs)
        self.dt = self.model.timestep * self.frame_skip
        self.contact = ContactParams(
            kp=float(config["contact_kp"]),
            kd=float(config["contact_kd"]),
            solver=str(config["contact_solver"]),
            sol_iters=int(config["contact_sol_iters"]),
        )
        self.substeps = int(config["substeps"])

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        base = {
            "frame_skip": cls.FRAME_SKIP,
            "frame_stack": 1,
            "post_constraint": True,
            "xml_file": "",
            "reset_noise_scale": 0.1,
            "ctrl_cost_weight": 0.1,
            "forward_reward_weight": 1.0,
            "exclude_current_positions_from_observation": True,
            "reward_threshold": 0.0,
            # engine extensions
            "substeps": 1,
            "contact_kp": 1.0e4,
            "contact_kd": 1.0e2,
            # "penalty" (default, fastest) | "mujoco" — the constraint-
            # solver path (physics/solver.py): MuJoCo-faithful soft
            # pyramidal contacts + joint limits, drift-bounded vs mj_step
            # (tests/test_contact_solver.py).
            "contact_solver": "penalty",
            "contact_sol_iters": 40,
            "integrator": "model",  # "model" (faithful) | "euler" | "rk4"
        }
        base.update(cls.EXTRA_CONFIG)
        merged = dict(base)
        merged.update(cls.DEFAULT_CONFIG)
        # FRAME_SKIP on the final class is authoritative: DEFAULT_CONFIG
        # dicts copied from a parent class used to carry the parent's
        # baked-in frame_skip (this silently ran Hopper/Walker2d at skip
        # 5).  None = "resolve from cls.FRAME_SKIP at init".
        if merged["frame_skip"] == cls.FRAME_SKIP:
            merged["frame_skip"] = None
        cls.DEFAULT_CONFIG = merged

    # -- per-task hooks ----------------------------------------------------

    def reset_qpos_qvel(self, key):
        """Default: cheetah-style uniform qpos noise + normal qvel noise."""
        s = float(self.config["reset_noise_scale"])
        k1, k2 = jax.random.split(key)
        qpos0 = jnp.asarray(self.model.qpos0, jnp.float32)
        qpos = qpos0 + jax.random.uniform(
            k1, (self.model.nq,), jnp.float32, -s, s
        )
        qvel = s * jax.random.normal(k2, (self.model.nv,), jnp.float32)
        return qpos, qvel

    def observe(self, qpos, qvel):
        raise NotImplementedError

    def reward_done(self, state_before, state_after, action):
        """-> (reward, terminated, info_dict)."""
        raise NotImplementedError

    # -- TpuEnv contract ---------------------------------------------------

    def state_spec(self):
        obs_dim = int(
            jax.eval_shape(
                self.observe,
                jax.ShapeDtypeStruct((self.model.nq,), jnp.float32),
                jax.ShapeDtypeStruct((self.model.nv,), jnp.float32),
            ).shape[0]
        )
        inf = float("inf")
        spec = {
            "obs": ArraySpec(jnp.float32, (obs_dim,), -inf, inf),
            "info:qpos0": ArraySpec(jnp.float32, (self.model.nq,)),
            "info:qvel0": ArraySpec(jnp.float32, (self.model.nv,)),
        }
        spec.update(self.extra_info_spec())
        return spec

    def extra_info_spec(self):
        return {
            "info:reward_run": ArraySpec(jnp.float32, ()),
            "info:reward_ctrl": ArraySpec(jnp.float32, ()),
            "info:x_position": ArraySpec(jnp.float32, ()),
            "info:x_velocity": ArraySpec(jnp.float32, ()),
        }

    def action_spec(self):
        # Per-dim bounds from the model's ctrlrange (gymnasium uses the
        # same source for its Box action space); ±1 for unlimited
        # actuators.  Kept element-wise so models with mixed per-actuator
        # ranges don't silently widen the tighter actuators; collapsed to
        # scalars only when provably lossless (uniform range).
        if not self.model.nu:
            return {"action": ArraySpec(jnp.float32, (0,), -1.0, 1.0)}
        cr = np.asarray(self.model.act_ctrlrange, np.float64)
        lim = np.asarray(self.model.act_ctrllimited, bool)
        low = np.where(lim, cr[:, 0], -1.0).astype(np.float32)
        high = np.where(lim, cr[:, 1], 1.0).astype(np.float32)
        if np.all(low == low[0]) and np.all(high == high[0]):
            return {
                "action": ArraySpec(
                    jnp.float32, (self.model.nu,), float(low[0]), float(high[0])
                )
            }
        return {
            "action": ArraySpec(jnp.float32, (self.model.nu,), low, high)
        }

    def _zero_info(self):
        return {
            k.replace("info:", ""): jnp.float32(0.0)
            for k in self.extra_info_spec()
        }

    def _obs_dict(self, st, info):
        out = {
            "obs": self.observe(st["qpos"], st["qvel"]),
            "info:qpos0": st["qpos0"],
            "info:qvel0": st["qvel0"],
        }
        for k, v in info.items():
            out[f"info:{k}"] = jnp.asarray(v, jnp.float32)
        return out

    def reset_env(self, key):
        qpos, qvel = self.reset_qpos_qvel(key)
        st = {"qpos": qpos, "qvel": qvel, "qpos0": qpos, "qvel0": qvel}
        return st, self._obs_dict(st, self._zero_info())

    def step_env(self, state, action, key):
        action = jnp.reshape(action, (self.model.nu,)).astype(jnp.float32)
        qpos, qvel = state["qpos"], state["qvel"]
        new_qpos, new_qvel = phys_step(
            self.model,
            qpos,
            qvel,
            action,
            self.substeps,
            self.contact,
            self.frame_skip,
        )
        before = {"qpos": qpos, "qvel": qvel}
        after = {"qpos": new_qpos, "qvel": new_qvel}
        reward, terminated, info = self.reward_done(before, after, action)
        st = {
            "qpos": new_qpos,
            "qvel": new_qvel,
            "qpos0": state["qpos0"],
            "qvel0": state["qvel0"],
        }
        return EnvOut(
            state=st,
            obs=self._obs_dict(st, info),
            reward=jnp.asarray(reward, jnp.float32),
            terminated=jnp.asarray(terminated, jnp.bool_),
        )
