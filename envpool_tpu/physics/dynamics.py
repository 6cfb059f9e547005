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
from .linalg import spd_solve
from .model import PhysModel

__all__ = [
    "step",
    "forward",
    "ContactParams",
    "mass_matrix",
    "bias_forces",
    "site_positions",
    "body_positions",
]


def site_positions(model: PhysModel, q: jax.Array) -> jax.Array:
    """World positions of all sites: [ns, 3]."""
    Rs, ps = fk(model, q)
    if len(model.site_body) == 0:
        return jnp.zeros((0, 3), q.dtype)
    sb = jnp.asarray(model.site_body)
    local = jnp.asarray(model.site_pos, q.dtype)
    return ps[sb] + jnp.einsum("sij,sj->si", Rs[sb], local)


def body_positions(model: PhysModel, q: jax.Array) -> jax.Array:
    """World positions of body frame origins: [nb, 3]."""
    _, ps = fk(model, q)
    return ps


def body_com_positions(model: PhysModel, q: jax.Array) -> jax.Array:
    """World positions of body CoMs (MuJoCo xipos): [nb, 3]."""
    Rs, ps = fk(model, q)
    ipos = jnp.asarray(model.body_ipos, q.dtype)
    return ps + jnp.einsum("bij,bj->bi", Rs, ipos)


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


def _contact_forces_shared(
    model: PhysModel, params: ContactParams, centers, v_con, Jc, dtype
):
    """Generalized contact force from ground-plane penalty springs."""
    if len(model.con_body) == 0:
        return jnp.zeros(model.nv, dtype)
    radius = jnp.asarray(model.con_radius, dtype)
    pen = radius - centers[:, 2]                       # >0 → penetrating
    active = pen > 0
    fn = jnp.where(
        active, params.kp * pen - params.kd * v_con[:, 2], 0.0
    )
    fn = jnp.maximum(fn, 0.0)
    # Smooth Coulomb friction on the tangential velocity.
    vt = v_con[:, :2]
    mu = jnp.asarray(model.con_friction, dtype) * params.mu_scale
    scale = jnp.tanh(jnp.linalg.norm(vt, axis=1) / params.vs)
    vt_dir = vt / (jnp.linalg.norm(vt, axis=1, keepdims=True) + 1e-9)
    ft = -(mu * fn * scale)[:, None] * vt_dir
    forces = jnp.concatenate([ft, fn[:, None]], axis=1)  # [nc, 3]
    return jnp.einsum("ck,ick->i", forces, Jc)


def _fluid_forces(model: PhysModel, q, qd):
    """Standalone wrapper (tests); the step path uses ``_fluid_shared``."""
    v_com, omega, _ = _vel_observables(model, q, qd)
    Rs, _ = fk(model, q)
    Jp, Jr, _ = _jacobians(model, q)
    return _fluid_shared(model, v_com, omega, Rs, Jp, Jr)


def _fluid_shared(model: PhysModel, v_com, omega, Rs, Jp, Jr):
    """MuJoCo's legacy inertia-box fluid drag (engine_passive.c semantics).

    Each body is approximated by its equivalent inertia box; quadratic
    density drag and linear viscous drag act on the 6D velocity of the body
    at its CoM, expressed in the inertial (ximat) frame.  Verified
    term-for-term against MuJoCo's ``qfrc_passive`` on the swimmer model.
    """
    from .kinematics import quat2mat

    dtype = v_com.dtype
    iquats = jnp.asarray(model.body_iquat, dtype)
    Ri = jnp.einsum(
        "bij,bjk->bik", Rs, jax.vmap(quat2mat)(iquats)
    )  # ximat: inertial frame in world
    lin = jnp.einsum("bji,bj->bi", Ri, v_com)   # local linear velocity
    ang = jnp.einsum("bji,bj->bi", Ri, omega)   # local angular velocity

    inertia = jnp.asarray(model.body_inertia, dtype)
    mass = jnp.asarray(model.body_mass, dtype)
    s = inertia.sum(axis=1, keepdims=True) - 2 * inertia
    box = jnp.sqrt(
        jnp.maximum(1e-10, s / jnp.maximum(mass[:, None], 1e-12) * 6.0)
    )  # [nb, 3] full box dims

    f_l = jnp.zeros_like(lin)
    t_l = jnp.zeros_like(ang)
    if model.viscosity > 0:
        diam = box.mean(axis=1, keepdims=True)
        t_l = t_l - jnp.pi * diam**3 * model.viscosity * ang
        f_l = f_l - 3 * jnp.pi * diam * model.viscosity * lin
    if model.density > 0:
        box1 = jnp.roll(box, -1, axis=1)
        box2 = jnp.roll(box, -2, axis=1)
        f_l = f_l - 0.5 * model.density * box1 * box2 * jnp.abs(lin) * lin
        t_l = t_l - model.density * box * (box1**4 + box2**4) * jnp.abs(
            ang
        ) * ang / 64.0

    f_w = jnp.einsum("bij,bj->bi", Ri, f_l)
    t_w = jnp.einsum("bij,bj->bi", Ri, t_l)
    return jnp.einsum("bk,ibk->i", f_w, Jp) + jnp.einsum(
        "bk,ibk->i", t_w, Jr
    )


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


def _limit_violation(model: PhysModel, q):
    """Per-dof bool-ish mask of joints outside their range."""
    v = jnp.zeros(model.nv, q.dtype)
    for j in range(len(model.jnt_type)):
        if model.jnt_type[j] >= 2 and model.jnt_limited[j]:
            qadr = int(model.jnt_qposadr[j])
            dadr = int(model.jnt_dofadr[j])
            lo, hi = model.jnt_range[j]
            out = (q[qadr] < lo) | (q[qadr] > hi)
            v = v.at[dadr].set(out.astype(q.dtype))
    return v


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


def _smooth(model: PhysModel, q, qd, ctrl, contact: ContactParams):
    """One shared pass: (M, rhs) with every force term computed once.

    All Jacobian-consuming terms (mass matrix, Newton-Euler bias, contacts,
    fluid drag) reuse a single vmapped-jvp Jacobian stack — this is what
    keeps both runtime and compiled-program size down.
    """
    damping = jnp.asarray(model.dof_damping, q.dtype)
    qdot = tangent(model, q, qd)
    (v_com, omega, v_con), (a_com, omega_dot, _) = jax.jvp(
        lambda q_: _vel_observables(model, q_, qd), (q,), (qdot,)
    )
    Rs, ps = fk(model, q)
    Iw = _world_inertia(model, Rs)
    Jp, Jr, Jc = _jacobians(model, q)
    m = jnp.asarray(model.body_mass, q.dtype)
    # Mass matrix.
    M = jnp.einsum("b,ibk,jbk->ij", m, Jp, Jp)
    M = M + jnp.einsum("ibk,bkl,jbl->ij", Jr, Iw, Jr)
    M = M + jnp.diag(jnp.asarray(model.dof_armature, q.dtype))
    # Bias (projected Newton-Euler at qdd = 0).
    g = jnp.asarray(model.gravity, q.dtype)
    f = m[:, None] * (a_com - g[None, :])
    Iom = jnp.einsum("bij,bj->bi", Iw, omega)
    t = jnp.einsum("bij,bj->bi", Iw, omega_dot) + jnp.cross(omega, Iom)
    c = jnp.einsum("bk,ibk->i", f, Jp) + jnp.einsum("bk,ibk->i", t, Jr)
    # Applied / passive / contact / fluid.
    centers = _contact_points(model, Rs, ps)
    tau = (
        _actuator_forces(model, ctrl)
        + _passive_forces(model, q, qd)
        + _contact_forces_shared(model, contact, centers, v_con, Jc, q.dtype)
        - c
        - damping * qd
    )
    if model.density > 0 or model.viscosity > 0:
        tau = tau + _fluid_shared(model, v_com, omega, Rs, Jp, Jr)
    return M, tau


def forward(
    model: PhysModel,
    q: jax.Array,
    qd: jax.Array,
    ctrl: jax.Array,
    contact: ContactParams = ContactParams(),
) -> jax.Array:
    """Forward dynamics: qacc with explicit damping (for RK4)."""
    M, tau = _smooth(model, q, qd, ctrl, contact)
    return spd_solve(M, tau)


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6))
def step(
    model: PhysModel,
    qpos: jax.Array,
    qvel: jax.Array,
    ctrl: jax.Array,
    substeps: int = 1,
    contact: ContactParams = ContactParams(),
    nsteps: int = 1,
):
    """Advance ``nsteps`` model timesteps, each split into ``substeps``.

    Matches the model's integrator: Euler with implicit joint damping
    (MuJoCo ``mj_Euler``) or RK4 (``mj_RungeKutta``) — the Gym locomotion
    XMLs use RK4.  ``nsteps`` is the frame-skip loop (mj_step called
    repeatedly, ``mujoco_env.h`` MujocoStep); ``substeps`` subdivides the
    timestep for penalty-contact stability.
    """
    h = model.timestep / substeps
    damping = jnp.asarray(model.dof_damping, qpos.dtype)

    def euler(q, qd):
        M, tau = _smooth(model, q, qd, ctrl, contact)
        # Implicit damping: (M + h·D) qacc = rhs.  The joint-limit penalty
        # spring (klim=300 in _passive_forces) is critically damped against
        # the dof's own inertia while violated — an undamped explicit
        # penalty blows up for light links (swimmer) at h = 2 ms.
        d_lim = (
            2.0 * jnp.sqrt(300.0 * jnp.diag(M)) * _limit_violation(model, q)
        )
        M_imp = M + h * jnp.diag(damping + d_lim)
        qacc = spd_solve(M_imp, tau - d_lim * qd)
        qd_new = qd + h * qacc
        q_new = integrate_qpos(model, q, qd_new, h)
        return q_new, qd_new

    def rk4(q, qd):
        a1 = forward(model, q, qd, ctrl, contact)
        q2 = integrate_qpos(model, q, qd, h / 2)
        qd2 = qd + (h / 2) * a1
        a2 = forward(model, q2, qd2, ctrl, contact)
        q3 = integrate_qpos(model, q, qd2, h / 2)
        qd3 = qd + (h / 2) * a2
        a3 = forward(model, q3, qd3, ctrl, contact)
        q4 = integrate_qpos(model, q, qd3, h)
        qd4 = qd + h * a3
        a4 = forward(model, q4, qd4, ctrl, contact)
        qd_avg = (qd + 2 * qd2 + 2 * qd3 + qd4) / 6
        qacc = (a1 + 2 * a2 + 2 * a3 + a4) / 6
        q_new = integrate_qpos(model, q, qd_avg, h)
        qd_new = qd + h * qacc
        return q_new, qd_new

    stepper = rk4 if model.integrator == 1 else euler

    def sub(_, carry):
        return stepper(*carry)

    # TPU MXU matmuls default to bf16 for f32 inputs; the mass-matrix /
    # Cholesky path needs full f32 or long kinematic chains blow up
    # (observed: swimmer6 NaNs under the default precision).
    with jax.default_matmul_precision("float32"):
        qpos, qvel = jax.lax.fori_loop(
            0, nsteps * substeps, sub, (qpos, qvel)
        )
    return qpos, qvel
