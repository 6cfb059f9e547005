"""dm_control-suite env family base over the TPU physics engine.

Behavioral reference: ``envpool/mujoco/dmc/mujoco_env.h:90-127`` (the
Task/Physics split with ``ControlReset/ControlStep``) and the dm_control
suite task sources (installed in this image — also the alignment oracle).
Models load from dm_control's own XMLs; dynamics run on
``envpool_tpu.physics``.

dm_control episode semantics: episodes end only by time limit for these
tasks, with discount 1.0 (we override the engine's ``1 - done`` default).
Each control step runs ``n_sub_steps`` physics steps
(``control_timestep / physics_timestep``).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec
from ...physics import ContactParams, PhysModel, from_mj_model
from ...physics.dynamics import step as phys_step
from ...physics.kinematics import fk


@functools.lru_cache(maxsize=32)
def _load_dmc_model(domain: str) -> PhysModel:
    import mujoco
    from dm_control.suite import common
    from dm_control.utils import io as dmc_io
    import os
    import dm_control.suite as suite

    base = os.path.dirname(suite.__file__)
    xml = dmc_io.GetResource(os.path.join(base, f"{domain}.xml"))
    assets = common.ASSETS
    m = mujoco.MjModel.from_xml_string(xml.decode(), assets)
    return from_mj_model(m), m


class DmcEnv(TpuEnv):
    """Base for dm_control suite tasks."""

    DOMAIN = ""
    CONTROL_TIMESTEP: float | None = None  # None → physics timestep
    DEFAULT_CONFIG: dict[str, Any] = {
        "task_name": "",
        "substeps": 1,
        "contact_kp": 2.0e4,
        "contact_kd": 2.0e2,
        # "penalty" (default) | "mujoco": constraint-solver contacts
        # (physics/solver.py), drift-bounded vs mj_step.
        "contact_solver": "penalty",
        "contact_sol_iters": 40,
    }

    def __init__(self, config):
        super().__init__(config)
        self.model, self._mj_model = self._load_model()
        ct = self.CONTROL_TIMESTEP or self.model.timestep
        self.n_sub_steps = max(1, round(ct / self.model.timestep))
        self.control_dt = self.model.timestep * self.n_sub_steps
        self.contact = ContactParams(
            kp=float(config["contact_kp"]),
            kd=float(config["contact_kd"]),
            solver=str(config["contact_solver"]),
            sol_iters=int(config["contact_sol_iters"]),
        )
        self.substeps = int(config["substeps"])
        self.task = str(config["task_name"])

    def _load_model(self):
        """Model hook; procedural domains (swimmer, n-pole cartpole)
        override this to build dm_control's generated XMLs."""
        return _load_dmc_model(self.DOMAIN)

    # -- randomizers -------------------------------------------------------

    def randomize_joints(self, key):
        """``randomizers.randomize_limited_and_rotational_joints``.

        Limited hinge/slide joints → U(range); unlimited hinges → U(-π, π);
        unlimited slides / free joints untouched.
        """
        model = self.model
        qpos = jnp.asarray(model.qpos0, jnp.float32)
        nj = len(model.jnt_type)
        keys = jax.random.split(key, max(nj, 1))
        for j in range(nj):
            jtype = int(model.jnt_type[j])
            qadr = int(model.jnt_qposadr[j])
            if jtype in (2, 3):  # slide, hinge
                if bool(model.jnt_limited[j]):
                    lo, hi = model.jnt_range[j]
                    val = jax.random.uniform(
                        keys[j], (), jnp.float32, float(lo), float(hi)
                    )
                    qpos = qpos.at[qadr].set(val)
                elif jtype == 3:  # unlimited hinge
                    val = jax.random.uniform(
                        keys[j], (), jnp.float32, -jnp.pi, jnp.pi
                    )
                    qpos = qpos.at[qadr].set(val)
        return qpos

    # -- kinematic helpers -------------------------------------------------

    def body_index(self, name: str) -> int:
        return self.model.body_names.index(name)

    def xmat(self, qpos):
        """Body rotation matrices [nb, 3, 3] (MuJoCo xmat)."""
        Rs, _ = fk(self.model, qpos)
        return Rs

    def xpos(self, qpos):
        _, ps = fk(self.model, qpos)
        return ps

    def subtree_linvel_x(self, qpos, qvel):
        """x component of whole-robot CoM velocity (subtreelinvel sensor)."""
        from ...physics.dynamics import _vel_observables

        v_com, _, _ = _vel_observables(self.model, qpos, qvel)
        m = jnp.asarray(self.model.body_mass, jnp.float32)
        return (m @ v_com[:, 0]) / m.sum()

    # -- task hooks --------------------------------------------------------

    def init_state(self, key):
        """-> (qpos, qvel, extras dict) at episode start."""
        qpos = self.randomize_joints(key)
        return qpos, jnp.zeros(self.model.nv, jnp.float32), {}

    def observe_dmc(self, qpos, qvel, extras):
        """-> ordered dict of obs arrays (keys become ``obs:<key>``)."""
        raise NotImplementedError

    def reward_dmc(self, qpos, qvel, action, extras):
        raise NotImplementedError

    # -- TpuEnv contract ---------------------------------------------------

    def _extras_spec(self) -> dict[str, tuple]:
        """Shapes of extra per-episode state (e.g. target positions)."""
        return {}

    def state_spec(self):
        extras = {
            k: jnp.zeros(shape, jnp.float32)
            for k, shape in self._extras_spec().items()
        }
        obs_shapes = jax.eval_shape(
            lambda q, v: self.observe_dmc(q, v, extras),
            jax.ShapeDtypeStruct((self.model.nq,), jnp.float32),
            jax.ShapeDtypeStruct((self.model.nv,), jnp.float32),
        )
        spec = {
            f"obs:{k}": ArraySpec(jnp.float32, s.shape)
            for k, s in obs_shapes.items()
        }
        return spec

    def action_spec(self):
        return {
            "action": ArraySpec(jnp.float32, (self.model.nu,), -1.0, 1.0)
        }

    def _obs_dict(self, st):
        obs = self.observe_dmc(st["qpos"], st["qvel"], st["extras"])
        return {f"obs:{k}": v.astype(jnp.float32) for k, v in obs.items()}

    def reset_env(self, key):
        qpos, qvel, extras = self.init_state(key)
        st = {"qpos": qpos, "qvel": qvel, "extras": extras}
        return st, self._obs_dict(st)

    def transform_action(self, action, extras):
        """Hook for per-episode actuation remaps (point_mass:hard)."""
        del extras
        return action

    def step_env(self, state, action, key):
        action = jnp.reshape(action, (self.model.nu,)).astype(jnp.float32)
        ctrl = self.transform_action(action, state["extras"])
        qpos, qvel = phys_step(
            self.model,
            state["qpos"],
            state["qvel"],
            ctrl,
            self.substeps,
            self.contact,
            self.n_sub_steps,
        )
        st = {"qpos": qpos, "qvel": qvel, "extras": state["extras"]}
        reward = self.reward_dmc(qpos, qvel, action, state["extras"])
        term = self.terminated_dmc(qpos, qvel, state["extras"])
        if term is None:
            terminated = jnp.bool_(False)
            discount = jnp.float32(1.0)
        else:
            # Tasks with real termination (lqr) end with discount 0;
            # time-limit-only tasks keep discount 1.0.
            terminated = jnp.asarray(term, jnp.bool_)
            discount = jnp.where(terminated, 0.0, 1.0).astype(jnp.float32)
        return EnvOut(
            state=st,
            obs=self._obs_dict(st),
            reward=jnp.asarray(reward, jnp.float32),
            terminated=terminated,
            discount=discount,
        )

    def terminated_dmc(self, qpos, qvel, extras):
        """Hook: return a bool for task termination, or None (time-limit
        only, dm_control's default for the benchmarking suite)."""
        del qpos, qvel, extras
        return None
