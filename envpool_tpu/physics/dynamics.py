"""Articulated rigid-body dynamics via autodiff Newton-Euler (pure JAX).

Equations of motion in generalized coordinates:

    M(q) qdd = τ_applied + τ_passive + τ_contact − c(q, qd)

* ``M`` — joint-space inertia, assembled as ``Σ_b m JpᵀJp + Jrᵀ I_w Jr``
  from body Jacobians (one vmapped ``jvp`` over the nv unit tangents; on
  TPU the per-env matrices are tiny but the env batch makes these MXU
  matmuls).  Armature inertia added on the diagonal.
* ``c`` — Coriolis/centrifugal + gravity by projected Newton-Euler: body
  accelerations at ``qdd = 0`` come from a second ``jvp`` through the
  velocity kinematics; then ``c_i = Σ_b f_b·Jp_i + t_b·Jr_i`` with
  ``f = m(a−g)``, ``t = I ω̇ + ω×Iω``.
* Contacts — penalty springs between geom spheres and the ground plane
  (normal Kelvin–Voigt + smooth Coulomb friction), mapped through point
  Jacobians.  This replaces MuJoCo's LCP solver; behavior-level fidelity
  is validated by the oracle tests, bit-level contact equality is out of
  scope (SURVEY.md §7 hard part 1).
* Integration — MuJoCo-style semi-implicit Euler with implicit joint
  damping: ``(M + h·diag(damping)) qacc = rhs``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .kinematics import body_vel, fk, integrate_qpos, tangent
from .model import PhysModel

__all__ = ["step", "ContactParams", "mass_matrix", "bias_forces"]


class ContactParams(NamedTuple):
    """Penalty-contact constants (per model, tunable)."""

    kp: float = 1.0e4    # normal stiffness
    kd: float = 1.0e2    # normal damping
    mu_scale: float = 1.0  # scales geom friction
    vs: float = 0.05     # friction velocity smoothing (m/s)


def _contact_points(model: PhysModel, Rs, ps):
    """World positions of the contact spheres' centers: [nc, 3]."""
    if len(model.con_body) == 0:
        return jnp.zeros((0, 3), Rs.dtype)
    R = Rs[jnp.asarray(model.con_body)]
    p = ps[jnp.asarray(model.con_body)]
    local = jnp.asarray(model.con_pos, Rs.dtype)
    return p + jnp.einsum("cij,cj->ci", R, local)


def _vel_observables(model: PhysModel, q, qd):
    """All velocity-level quantities in one pass.

    Returns (com_vel [nb,3], omega [nb,3], contact_vel [nc,3]) — each linear
    in qd.
    """
    (Rs, ps), (omega, v0) = body_vel(model, q, qd)
    ipos = jnp.asarray(model.body_ipos, q.dtype)
    # CoM world offset r = R @ ipos; v_com = v_origin + ω × r.
    r = jnp.einsum("bij,bj->bi", Rs, ipos)
    v_com = v0 + jnp.cross(omega, r)
    # Contact point velocities.
    if len(model.con_body) == 0:
        v_con = jnp.zeros((0, 3), q.dtype)
    else:
        cb = jnp.asarray(model.con_body)
        rc = _contact_points(model, Rs, ps) - ps[cb]
        v_con = v0[cb] + jnp.cross(omega[cb], rc)
    return v_com, omega, v_con


def _jacobians(model: PhysModel, q):
    """Stacked Jacobians of (com_vel, omega, contact_vel) wrt qd.

    Shapes: Jp [nv, nb, 3], Jr [nv, nb, 3], Jc [nv, nc, 3].
    """
    eye = jnp.eye(model.nv, dtype=q.dtype)
    return jax.vmap(lambda e: _vel_observables(model, q, e))(eye)


def _world_inertia(model: PhysModel, Rs):
    """Body inertia tensors in the world frame: [nb, 3, 3]."""
    from .kinematics import quat2mat

    iquats = jnp.asarray(model.body_iquat, Rs.dtype)
    Ri = jax.vmap(quat2mat)(iquats)  # inertial frame in body frame
    Rw = jnp.einsum("bij,bjk->bik", Rs, Ri)
    diag = jnp.asarray(model.body_inertia, Rs.dtype)
    return jnp.einsum("bij,bj,bkj->bik", Rw, diag, Rw)


def mass_matrix(model: PhysModel, q: jax.Array) -> jax.Array:
    """Joint-space inertia matrix [nv, nv] (incl. armature)."""
    Jp, Jr, _ = _jacobians(model, q)
    Rs, _ = fk(model, q)
    Iw = _world_inertia(model, Rs)
    m = jnp.asarray(model.body_mass, q.dtype)
    M = jnp.einsum("b,ibk,jbk->ij", m, Jp, Jp)
    M = M + jnp.einsum("ibk,bkl,jbl->ij", Jr, Iw, Jr)
    return M + jnp.diag(jnp.asarray(model.dof_armature, q.dtype))


def bias_forces(model: PhysModel, q: jax.Array, qd: jax.Array) -> jax.Array:
    """c(q, qd): Coriolis + centrifugal + gravity, [nv]."""
    qdot = tangent(model, q, qd)
    (v_com, omega, _), (a_com, omega_dot, _) = jax.jvp(
        lambda q_: _vel_observables(model, q_, qd), (q,), (qdot,)
    )
    Rs, _ = fk(model, q)
    Iw = _world_inertia(model, Rs)
    m = jnp.asarray(model.body_mass, q.dtype)
    g = jnp.asarray(model.gravity, q.dtype)
    f = m[:, None] * (a_com - g[None, :])                    # [nb, 3]
    Iω = jnp.einsum("bij,bj->bi", Iw, omega)
    t = jnp.einsum("bij,bj->bi", Iw, omega_dot) + jnp.cross(omega, Iω)
    Jp, Jr, _ = _jacobians(model, q)
    return jnp.einsum("bk,ibk->i", f, Jp) + jnp.einsum("bk,ibk->i", t, Jr)


def _contact_forces(
    model: PhysModel, q, qd, params: ContactParams
):
    """Generalized contact force from ground-plane penalty springs."""
    if len(model.con_body) == 0:
        return jnp.zeros(model.nv, q.dtype)
    Rs, ps = fk(model, q)
    centers = _contact_points(model, Rs, ps)           # [nc, 3]
    radius = jnp.asarray(model.con_radius, q.dtype)
    pen = radius - centers[:, 2]                       # >0 → penetrating
    _, _, v_con = _vel_observables(model, q, qd)       # [nc, 3]
    active = pen > 0
    fn = jnp.where(
        active, params.kp * pen - params.kd * v_con[:, 2], 0.0
    )
    fn = jnp.maximum(fn, 0.0)
    # Smooth Coulomb friction on the tangential velocity.
    vt = v_con[:, :2]
    mu = jnp.asarray(model.con_friction, q.dtype) * params.mu_scale
    scale = jnp.tanh(jnp.linalg.norm(vt, axis=1) / params.vs)
    vt_dir = vt / (jnp.linalg.norm(vt, axis=1, keepdims=True) + 1e-9)
    ft = -(mu * fn * scale)[:, None] * vt_dir
    forces = jnp.concatenate([ft, fn[:, None]], axis=1)  # [nc, 3]
    _, _, Jc = _jacobians(model, q)                      # [nv, nc, 3]
    return jnp.einsum("ck,ick->i", forces, Jc)


def _passive_forces(model: PhysModel, q, qd):
    """Joint springs and soft limits (damping handled implicitly)."""
    tau = jnp.zeros(model.nv, q.dtype)
    stiffness = jnp.asarray(model.jnt_stiffness, q.dtype)
    for j in range(len(model.jnt_type)):
        if model.jnt_type[j] >= 2:  # slide/hinge
            qadr = int(model.jnt_qposadr[j])
            dadr = int(model.jnt_dofadr[j])
            spring = -stiffness[j] * (
                q[qadr] - jnp.asarray(model.qpos_spring, q.dtype)[qadr]
            )
            tau = tau.at[dadr].add(spring)
            if model.jnt_limited[j]:
                lo, hi = model.jnt_range[j]
                klim = 300.0
                below = jnp.minimum(q[qadr] - lo, 0.0)
                above = jnp.maximum(q[qadr] - hi, 0.0)
                tau = tau.at[dadr].add(-klim * (below + above))
    return tau


def _actuator_forces(model: PhysModel, ctrl):
    """Motor actuators on joints: τ[dof] = gear · ctrl (clipped)."""
    tau = jnp.zeros(model.nv, ctrl.dtype)
    for a in range(model.nu):
        c = ctrl[a]
        if model.act_ctrllimited[a]:
            lo, hi = model.act_ctrlrange[a]
            c = jnp.clip(c, lo, hi)
        j = int(model.act_trnid[a])
        dadr = int(model.jnt_dofadr[j])
        tau = tau.at[dadr].add(float(model.act_gear[a]) * c)
    return tau


@functools.partial(jax.jit, static_argnums=(0, 4, 5))
def step(
    model: PhysModel,
    qpos: jax.Array,
    qvel: jax.Array,
    ctrl: jax.Array,
    substeps: int = 1,
    contact: ContactParams = ContactParams(),
):
    """Advance one model timestep (optionally split into substeps)."""
    h = model.timestep / substeps
    damping = jnp.asarray(model.dof_damping, qpos.dtype)

    def sub(_, carry):
        q, qd = carry
        M = mass_matrix(model, q)
        c = bias_forces(model, q, qd)
        tau = (
            _actuator_forces(model, ctrl)
            + _passive_forces(model, q, qd)
            + _contact_forces(model, q, qd, contact)
            - c
            - damping * qd
        )
        # Implicit damping: (M + h·D) qacc = rhs.
        M_imp = M + h * jnp.diag(damping)
        qacc = jnp.linalg.solve(M_imp, tau)
        qd_new = qd + h * qacc
        q_new = integrate_qpos(model, q, qd_new, h)
        return q_new, qd_new

    qpos, qvel = jax.lax.fori_loop(0, substeps, sub, (qpos, qvel))
    return qpos, qvel
