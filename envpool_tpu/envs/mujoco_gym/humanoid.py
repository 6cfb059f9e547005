"""Humanoid and HumanoidStandup (gym v4 semantics).

Behavioral reference: ``envpool/mujoco/gym/humanoid.h`` /
``humanoid_standup.h``.  The com-based observation blocks (``cinert``,
``cvel``, ``cfrc_ext``) are computed from the engine's own quantities:
world-frame body inertia/mass/com offsets, body com 6D velocities, and the
penalty-contact forces aggregated per body.  They match MuJoCo's layout
and scale but not its exact subtree-com convention (documented
approximation — the LCP-vs-penalty contact difference dominates anyway).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...physics.dynamics import (
    _contact_points,
    _jacobians,
    _vel_observables,
    _world_inertia,
)
from ...physics.kinematics import fk
from .base import MujocoGymEnv


class _HumanoidBase(MujocoGymEnv):
    FRAME_SKIP = 5

    def _com_obs(self, qpos, qvel):
        """(cinert [nb-1,10], cvel [nb-1,6], cfrc [nb-1,6]) world-frame."""
        model = self.model
        Rs, ps = fk(model, qpos)
        Iw = _world_inertia(model, Rs)
        mass = jnp.asarray(model.body_mass, jnp.float32)
        ipos = jnp.asarray(model.body_ipos, jnp.float32)
        com = ps + jnp.einsum("bij,bj->bi", Rs, ipos)
        robot_com = (mass @ com) / mass.sum()
        r = com - robot_com[None, :]
        # cinert: 6 inertia entries (xx, yy, zz, xy, xz, yz), 3 mass*offset,
        # mass — per body, about the robot com.
        cinert = jnp.concatenate(
            [
                Iw[:, [0, 1, 2, 0, 0, 1], [0, 1, 2, 1, 2, 2]],
                mass[:, None] * r,
                mass[:, None],
            ],
            axis=1,
        )
        v_com, omega, v_con = _vel_observables(model, qpos, qvel)
        cvel = jnp.concatenate([omega, v_com], axis=1)
        # Per-body contact force (normal-direction penalty forces).
        cfrc = jnp.zeros((model.nbody, 6), jnp.float32)
        if len(model.con_body) > 0:
            centers = _contact_points(model, Rs, ps)
            radius = jnp.asarray(model.con_radius, jnp.float32)
            pen = radius - centers[:, 2]
            fn = jnp.maximum(
                jnp.where(
                    pen > 0,
                    self.contact.kp * pen - self.contact.kd * v_con[:, 2],
                    0.0,
                ),
                0.0,
            )
            cb = jnp.asarray(model.con_body)
            cfrc = cfrc.at[cb, 5].add(fn)  # world z force
        # Gym v4 keeps the worldbody's (zero) rows → 376-dim obs.
        cinert = cinert.at[0].set(0.0)
        cvel = cvel.at[0].set(0.0)
        return cinert, cvel, cfrc

    def observe(self, qpos, qvel):
        cinert, cvel, cfrc = self._com_obs(qpos, qvel)
        if bool(self.config.get("v5_obs", False)):
            # v5 (gymnasium humanoid_v5._get_obs): drop the worldbody row
            # of cinert/cvel/cfrc_ext and the 6 root dofs of
            # qfrc_actuator → 348-dim obs (vs 376 in v4).
            cinert, cvel, cfrc = cinert[1:], cvel[1:], cfrc[1:]
            qfrc = self._qfrc_placeholder()[6:]
        else:
            qfrc = self._qfrc_placeholder()
        return jnp.concatenate(
            [
                qpos[2:],
                qvel,
                cinert.reshape(-1),
                cvel.reshape(-1),
                qfrc,
                cfrc.reshape(-1),
            ]
        ).astype(jnp.float32)

    def _qfrc_placeholder(self):
        # qfrc_actuator slot (gym includes actuator forces of the last
        # step; zero at obs time here — near-zero-mean features).
        return jnp.zeros(self.model.nv, jnp.float32)


class HumanoidEnv(_HumanoidBase):
    XML = "humanoid.xml"
    DEFAULT_CONFIG = {
        "reward_threshold": 0.0,
        "ctrl_cost_weight": 0.1,
        "forward_reward_weight": 1.25,
        "healthy_reward": 5.0,
        "terminate_when_unhealthy": True,
        "reset_noise_scale": 1e-2,
        "substeps": 1,  # stable at h=3ms with implicit contact damping
        "integrator": "euler",  # RK4 x frame_skip 5 x nv=23 is punitive
        # v5 toggles (gymnasium humanoid_v5): 348-dim obs, healthy_reward
        # only while healthy, contact cost included in the reward.
        "v5_obs": False,
        "legacy_healthy_reward": True,
        "contact_cost_weight": 0.0,  # v5: 5e-7
        "contact_cost_max": 10.0,
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

    def _mass_center_x(self, qpos):
        """gym's mass_center: mass-weighted mean of body xipos (x)."""
        from ...physics.dynamics import body_com_positions

        mass = jnp.asarray(self.model.body_mass, jnp.float32)
        coms = body_com_positions(self.model, qpos)
        return (mass @ coms[:, 0]) / mass.sum()

    def reward_done(self, before, after, action):
        xv = (
            self._mass_center_x(after["qpos"])
            - self._mass_center_x(before["qpos"])
        ) / self.dt
        z = after["qpos"][2]
        healthy = (z > 1.0) & (z < 2.0)
        ctrl_cost = float(self.config["ctrl_cost_weight"]) * jnp.sum(
            action * action
        )
        run = float(self.config["forward_reward_weight"]) * xv
        healthy_reward = float(self.config["healthy_reward"])
        if not bool(self.config["legacy_healthy_reward"]):
            # v5: the alive bonus is paid only while actually healthy.
            healthy_reward = healthy_reward * healthy.astype(jnp.float32)
        contact_cost = jnp.float32(0.0)
        ccw = float(self.config["contact_cost_weight"])
        if ccw > 0.0:
            _, _, cfrc = self._com_obs(after["qpos"], after["qvel"])
            contact_cost = jnp.minimum(
                ccw * jnp.sum(cfrc * cfrc),
                float(self.config["contact_cost_max"]),
            )
        reward = run + healthy_reward - ctrl_cost - contact_cost
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


class HumanoidStandupEnv(_HumanoidBase):
    XML = "humanoidstandup.xml"
    DEFAULT_CONFIG = {
        "reward_threshold": 0.0,
        "ctrl_cost_weight": 0.1,
        "reset_noise_scale": 1e-2,
        "substeps": 1,
        "integrator": "euler",
        "v5_obs": False,
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

    def extra_info_spec(self):
        from ...core.specs import ArraySpec

        return {
            "info:reward_linup": ArraySpec(jnp.float32, ()),
            "info:reward_quadctrl": ArraySpec(jnp.float32, ()),
        }

    def reward_done(self, before, after, action):
        uph_cost = after["qpos"][2] / self.model.timestep
        quad_ctrl = float(self.config["ctrl_cost_weight"]) * jnp.sum(
            action * action
        )
        reward = uph_cost - quad_ctrl + 1.0
        return (
            reward,
            jnp.bool_(False),
            {"reward_linup": uph_cost, "reward_quadctrl": -quad_ctrl},
        )
