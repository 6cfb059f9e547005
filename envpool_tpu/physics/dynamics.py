"""Articulated rigid-body dynamics in closed form (pure JAX, one FK pass).

Equations of motion in generalized coordinates:

    M(q) qdd = τ_applied + τ_passive + τ_contact − c(q, qd)

Design (the TPU-speed rewrite of the round-1 autodiff Newton–Euler):
every dof is a world-frame *screw* ``(t_k, w_k, c_k)`` — linear direction,
rotation axis, anchor — emitted by a **single** FK tree pass
(``kinematics.fk_dof``).  With the static masks from
``structure.dof_structure`` (``M[k,b]`` dof-moves-body, ``P[k2,k]`` dof
precedence) everything else is closed-form batched linear algebra:

* Jacobians  ``Jp[k,b] = M[k,b] (t_k + w_k × (x_b − c_k))``, ``Jr = M w``;
* velocities ``ω = Mᵀ(qd·w)``, ``v(x) = Mᵀ(qd·t) + ω×x − Mᵀ(qd·w×c)``;
* bias accelerations at qdd = 0 by the product rule through the screw
  time-derivatives ``ṫ = ω_pre×t``, ``ẇ = ω_pre×w``, ``ċ = v_pre(c)``
  (ω_pre/v_pre over the precedence mask) — exactly MuJoCo's RNE terms;
* mass matrix ``Σ_b m JpᵀJp + Jrᵀ I_w Jr`` (+ armature diagonal).

Per dynamics evaluation this is ONE tree traversal plus ~20 fused batched
einsums — vs ~nv+2 jvp tree passes before (the round-1 bottleneck flagged
in VERDICT.md).  Contacts stay penalty springs vs the ground plane (normal
Kelvin–Voigt + smooth Coulomb), replacing MuJoCo's LCP solver; fidelity is
pinned by the oracle tests in ``tests/test_physics.py`` against real MuJoCo
(the reference steps real MuJoCo on CPU threads,
``envpool/mujoco/gym/mujoco_env.h:45-267``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .kinematics import fk, fk_dof, integrate_qpos, quat2mat
from .linalg import spd_solve
from .model import PhysModel
from .structure import dof_structure

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
    ten_kp: float = 2.0e3  # spatial-tendon limit penalty stiffness
    ten_kd: float = 2.0e1  # spatial-tendon limit penalty damping
    # Body-body (sphere/capsule pair) contacts: opt-in per env so the
    # ground-contact-only locomotion models keep their aligned dynamics.
    pairs: bool = False
    pair_kp: float = 1.0e4
    pair_kd: float = 1.0e2
    # Contact model selection: "penalty" (default, fastest) or "mujoco" —
    # the constraint-solver path (physics/solver.py) reproducing MuJoCo's
    # soft pyramidal contacts + joint limits via PGS on the regularized
    # dual.  Selectable per model (VERDICT r3 task 3).
    solver: str = "penalty"
    sol_iters: int = 40


def _contact_points(model: PhysModel, Rs, ps):
    """World positions of the contact spheres' centers: [nc, 3]."""
    if len(model.con_body) == 0:
        return jnp.zeros((0, 3), Rs.dtype)
    R = Rs[jnp.asarray(model.con_body)]
    p = ps[jnp.asarray(model.con_body)]
    local = jnp.asarray(model.con_pos, Rs.dtype)
    return p + jnp.einsum("cij,cj->ci", R, local)


class _Kin(NamedTuple):
    """Everything the dynamics needs from one FK pass."""

    Rs: jax.Array      # [nb, 3, 3]
    ps: jax.Array      # [nb, 3]
    t: jax.Array       # [nv, 3] screw linear directions
    w: jax.Array       # [nv, 3] screw rotation axes
    c: jax.Array       # [nv, 3] screw anchors
    x_com: jax.Array   # [nb, 3] world CoM positions
    centers: jax.Array  # [nc, 3] contact sphere centers


def _kin(model: PhysModel, q: jax.Array) -> _Kin:
    Rs, ps, t, w, c = fk_dof(model, q)
    ipos = jnp.asarray(model.body_ipos, q.dtype)
    x_com = ps + jnp.einsum("bij,bj->bi", Rs, ipos)
    centers = _contact_points(model, Rs, ps)
    return _Kin(Rs, ps, t, w, c, x_com, centers)


def _point_vel(mask_T, tv, wv, wxc, x):
    """Velocity of mask-selected material points x: [n, 3].

    v(x) = Σ_k mask[k] (tv_k + wv_k × (x − c_k))
         = maskᵀ tv + (maskᵀ wv) × x − maskᵀ (wv × c)
    (valid because every point's mask selects a single kinematic chain).
    """
    om = mask_T @ wv
    return mask_T @ tv + jnp.cross(om, x) - mask_T @ wxc, om


def _jacobians(model: PhysModel, q):
    """Stacked Jacobians of (com_vel, omega, contact_vel) wrt qd.

    Shapes: Jp [nv, nb, 3], Jr [nv, nb, 3], Jc [nv, nc, 3].
    """
    k = _kin(model, q)
    return _jac_from_kin(model, k, q.dtype)


def _jac_from_kin(model: PhysModel, k: _Kin, dtype):
    s = dof_structure(model)
    Mf = jnp.asarray(s.body_mask, dtype)                 # [nv, nb]
    rel = k.x_com[None, :, :] - k.c[:, None, :]          # [nv, nb, 3]
    Jp = Mf[:, :, None] * (k.t[:, None, :] + jnp.cross(k.w[:, None, :], rel))
    Jr = Mf[:, :, None] * jnp.broadcast_to(k.w[:, None, :], rel.shape)
    if len(model.con_body):
        Cf = jnp.asarray(s.con_mask, dtype)              # [nv, nc]
        relc = k.centers[None, :, :] - k.c[:, None, :]
        Jc = Cf[:, :, None] * (
            k.t[:, None, :] + jnp.cross(k.w[:, None, :], relc)
        )
    else:
        Jc = jnp.zeros((model.nv, 0, 3), dtype)
    return Jp, Jr, Jc


def _vel_observables(model: PhysModel, q, qd):
    """All velocity-level quantities in one pass.

    Returns (com_vel [nb,3], omega [nb,3], contact_vel [nc,3]) — each linear
    in qd.
    """
    k = _kin(model, q)
    s = dof_structure(model)
    dtype = q.dtype
    tv = qd[:, None] * k.t
    wv = qd[:, None] * k.w
    wxc = jnp.cross(wv, k.c)
    v_com, omega = _point_vel(
        jnp.asarray(s.body_mask, dtype).T, tv, wv, wxc, k.x_com
    )
    if len(model.con_body):
        v_con, _ = _point_vel(
            jnp.asarray(s.con_mask, dtype).T, tv, wv, wxc, k.centers
        )
    else:
        v_con = jnp.zeros((0, 3), dtype)
    return v_com, omega, v_con


def _world_inertia(model: PhysModel, Rs):
    """Body inertia tensors in the world frame: [nb, 3, 3]."""
    iquats = jnp.asarray(model.body_iquat, Rs.dtype)
    Ri = jax.vmap(quat2mat)(iquats)  # inertial frame in body frame
    Rw = jnp.einsum("bij,bjk->bik", Rs, Ri)
    diag = jnp.asarray(model.body_inertia, Rs.dtype)
    return jnp.einsum("bij,bj,bkj->bik", Rw, diag, Rw)


def mass_matrix(model: PhysModel, q: jax.Array) -> jax.Array:
    """Joint-space inertia matrix [nv, nv] (incl. armature)."""
    k = _kin(model, q)
    Jp, Jr, _ = _jac_from_kin(model, k, q.dtype)
    Iw = _world_inertia(model, k.Rs)
    return _mass_from_jac(model, Jp, Jr, Iw, q.dtype)


def _mass_from_jac(model: PhysModel, Jp, Jr, Iw, dtype):
    m = jnp.asarray(model.body_mass, dtype)
    M = jnp.einsum("b,ibk,jbk->ij", m, Jp, Jp)
    M = M + jnp.einsum("ibk,bkl,jbl->ij", Jr, Iw, Jr)
    return M + jnp.diag(jnp.asarray(model.dof_armature, dtype))


def _bias_accels(model: PhysModel, k: _Kin, qd):
    """Body CoM accelerations and ω̇ at qdd = 0 (the RNE velocity products).

    Product rule through the screw derivatives: with qd fixed,
      ṫ = ω_pre × t,  ẇ = ω_pre × w,  ċ = v_pre(c),
    where ω_pre/v_pre sum strictly-preceding dofs (precedence mask P), and
      a(x) = Σ_k M[k,b] qd_k [ṫ_k + ẇ_k × (x − c_k) + w_k × (v(x) − ċ_k)].
    """
    s = dof_structure(model)
    dtype = qd.dtype
    Mf_T = jnp.asarray(s.body_mask, dtype).T             # [nb, nv]
    P_T = jnp.asarray(s.prec, dtype).T                   # [nv, nv]
    tv = qd[:, None] * k.t
    wv = qd[:, None] * k.w
    wxc = jnp.cross(wv, k.c)
    # Velocities of body CoMs and of the screw anchors themselves.
    v_com, omega = _point_vel(Mf_T, tv, wv, wxc, k.x_com)
    omega_pre = P_T @ wv                                 # [nv, 3]
    vc = P_T @ tv + jnp.cross(omega_pre, k.c) - P_T @ wxc
    # Screw time-derivatives (scaled by qd).
    tdv = jnp.cross(omega_pre, tv)
    wdv = jnp.cross(omega_pre, wv)
    omega_dot = Mf_T @ wdv
    a_com = (
        Mf_T @ tdv
        + jnp.cross(omega_dot, k.x_com)
        - Mf_T @ jnp.cross(wdv, k.c)
        + jnp.cross(omega, v_com)
        - Mf_T @ jnp.cross(wv, vc)
    )
    return v_com, omega, a_com, omega_dot


def bias_forces(model: PhysModel, q: jax.Array, qd: jax.Array) -> jax.Array:
    """c(q, qd): Coriolis + centrifugal + gravity, [nv]."""
    k = _kin(model, q)
    v_com, omega, a_com, omega_dot = _bias_accels(model, k, qd)
    Iw = _world_inertia(model, k.Rs)
    Jp, Jr, _ = _jac_from_kin(model, k, q.dtype)
    return _bias_from_accels(
        model, a_com, omega, omega_dot, Iw, Jp, Jr, q.dtype
    )


def _bias_from_accels(model, a_com, omega, omega_dot, Iw, Jp, Jr, dtype):
    m = jnp.asarray(model.body_mass, dtype)
    g = jnp.asarray(model.gravity, dtype)
    f = m[:, None] * (a_com - g[None, :])                # [nb, 3]
    Iom = jnp.einsum("bij,bj->bi", Iw, omega)
    t = jnp.einsum("bij,bj->bi", Iw, omega_dot) + jnp.cross(omega, Iom)
    return jnp.einsum("bk,ibk->i", f, Jp) + jnp.einsum("bk,ibk->i", t, Jr)


def _contact_forces_shared(
    model: PhysModel, params: ContactParams, centers, v_con, Jc, dtype
):
    """Generalized contact force from ground-plane penalty springs.

    Returns ``(tau_con, D_con)``: the generalized force and the
    velocity-derivative matrix ``−∂tau/∂qd`` of the contact model
    (normal damping ``kd`` plus the tanh-friction slope ``μ·fn/vs``),
    projected to joint space.  The Euler integrator folds ``h·D_con``
    into the implicit LHS, which keeps stiff foot contacts stable at a
    full model timestep (``substeps=1``) — the same implicit-damping
    treatment MuJoCo's Euler applies to joint damping.
    """
    if len(model.con_body) == 0:
        z = jnp.zeros(model.nv, dtype)
        return z, jnp.zeros((model.nv, model.nv), dtype)
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
    # Implicit-damping weights per contact axis: tangential slope at
    # v→0 is μ·fn/vs (the stiff part of the tanh), normal is kd.
    w_t = mu * fn / params.vs
    w_n = jnp.where(active, params.kd, 0.0)
    w = jnp.stack([w_t, w_t, w_n], axis=1)             # [nc, 3]
    d_con = jnp.einsum("ick,ck,jck->ij", Jc, w, Jc)
    return jnp.einsum("ck,ick->i", forces, Jc), d_con


def _fluid_forces(model: PhysModel, q, qd):
    """Standalone wrapper (tests); the step path uses ``_fluid_shared``."""
    k = _kin(model, q)
    v_com, omega, _ = _vel_observables(model, q, qd)
    Jp, Jr, _ = _jac_from_kin(model, k, q.dtype)
    return _fluid_shared(model, v_com, omega, k.Rs, Jp, Jr)


def _fluid_shared(model: PhysModel, v_com, omega, Rs, Jp, Jr):
    """MuJoCo's legacy inertia-box fluid drag (engine_passive.c semantics).

    Each body is approximated by its equivalent inertia box; quadratic
    density drag and linear viscous drag act on the 6D velocity of the body
    at its CoM, expressed in the inertial (ximat) frame.  Verified
    term-for-term against MuJoCo's ``qfrc_passive`` on the swimmer model.
    """
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


def _passive_forces(model: PhysModel, q, qd, limit_penalty: bool = True):
    """Joint/tendon springs and soft joint limits (damping implicit).

    ``limit_penalty=False`` (solver mode) drops the klim spring — limits
    are constraint rows in ``physics/solver.py`` there, as in MuJoCo.
    """
    s = dof_structure(model)
    tau = jnp.zeros(model.nv, q.dtype)
    if len(s.hs_qadr):
        qs = q[jnp.asarray(s.hs_qadr)]
        spring = -jnp.asarray(s.hs_stiffness, q.dtype) * (
            qs - jnp.asarray(s.hs_springref, q.dtype)
        )
        if limit_penalty:
            # Soft limit penalty (klim=300); unlimited joints have ±inf
            # bounds so both terms vanish.
            below = jnp.minimum(qs - jnp.asarray(s.hs_lo, q.dtype), 0.0)
            above = jnp.maximum(qs - jnp.asarray(s.hs_hi, q.dtype), 0.0)
            spring = spring - 300.0 * (below + above)
        tau = tau.at[jnp.asarray(s.hs_dadr)].add(spring)
    # Fixed-tendon springs/dampers: len = Σ coef·q, force mapped back
    # through the coefs (MuJoCo engine_passive.c tendon branch).
    for t, triples in enumerate(model.ten_fixed):
        k = float(model.ten_fixed_stiffness[t])
        d = float(model.ten_fixed_damping[t])
        if k == 0.0 and d == 0.0:
            continue
        length = sum(coef * q[qadr] for qadr, _, coef in triples)
        vel = sum(coef * qd[dadr] for _, dadr, coef in triples)
        f = -k * (length - float(model.ten_fixed_springlen[t])) - d * vel
        for _, dadr, coef in triples:
            tau = tau.at[dadr].add(coef * f)
    return tau


def _limit_violation(model: PhysModel, q):
    """Per-dof bool-ish mask of joints outside their range."""
    s = dof_structure(model)
    v = jnp.zeros(model.nv, q.dtype)
    if len(s.hs_qadr) == 0:
        return v
    qs = q[jnp.asarray(s.hs_qadr)]
    out = (qs < jnp.asarray(s.hs_lo, q.dtype)) | (
        qs > jnp.asarray(s.hs_hi, q.dtype)
    )
    return v.at[jnp.asarray(s.hs_dadr)].set(out.astype(q.dtype))


def _actuator_forces(model: PhysModel, ctrl, q=None, qd=None):
    """Actuators: τ[dof] += moment · force over the transmission rows.

    Constant-gain motors: force = gain·clip(ctrl) folded into the moment
    coefs.  Affine-bias servos (mjBIAS_AFFINE, e.g. dm_control quadruped
    position actuators): force = gain·ctrl + b1·length + b2·velocity with
    the transmission length/velocity computed from the same rows — this
    position feedback runs every substep, as in MuJoCo.
    """
    tau = jnp.zeros(model.nv, ctrl.dtype)
    if model.nu == 0:
        return tau
    s = dof_structure(model)
    c = jnp.clip(
        ctrl,
        jnp.asarray(s.act_lo, ctrl.dtype),
        jnp.asarray(s.act_hi, ctrl.dtype),
    )
    for a, row in enumerate(s.act_moments):
        for dadr, coef in row:
            tau = tau.at[dadr].add(coef * c[a])
    for a, gain, b1, b2, rows in getattr(s, "act_affine", ()):
        length = 0.0
        vel = 0.0
        for qadr, dadr, coef in rows:
            length = length + coef * q[qadr]
            vel = vel + coef * qd[dadr]
        f = gain * c[a] + b1 * length + b2 * vel
        for _, dadr, coef in rows:
            tau = tau.at[dadr].add(coef * f)
    return tau


def _smooth(model: PhysModel, q, qd, ctrl, contact: ContactParams):
    """One shared pass: (M, rhs) with every force term computed once.

    One FK pass emits the dof screws; Jacobians, velocities and RNE bias
    terms are closed-form masked products off it (module docstring).

    In ``solver="mujoco"`` mode the contact and joint-limit penalty terms
    are omitted — they are handled by the constraint solver
    (``physics/solver.py``) — and the kin pass is returned for reuse.
    """
    dtype = q.dtype
    use_solver = contact.solver == "mujoco"
    damping = jnp.asarray(model.dof_damping, dtype)
    k = _kin(model, q)
    s = dof_structure(model)
    Iw = _world_inertia(model, k.Rs)
    Jp, Jr, Jc = _jac_from_kin(model, k, dtype)
    v_com, omega, a_com, omega_dot = _bias_accels(model, k, qd)
    M = _mass_from_jac(model, Jp, Jr, Iw, dtype)
    c = _bias_from_accels(
        model, a_com, omega, omega_dot, Iw, Jp, Jr, dtype
    )
    if use_solver:
        tau_con = jnp.zeros(model.nv, dtype)
        d_con = jnp.zeros((model.nv, model.nv), dtype)
    else:
        # Contact point velocities.
        if len(model.con_body):
            tv = qd[:, None] * k.t
            wv = qd[:, None] * k.w
            v_con, _ = _point_vel(
                jnp.asarray(s.con_mask, dtype).T,
                tv,
                wv,
                jnp.cross(wv, k.c),
                k.centers,
            )
        else:
            v_con = jnp.zeros((0, 3), dtype)
        tau_con, d_con = _contact_forces_shared(
            model, contact, k.centers, v_con, Jc, dtype
        )
    tau = (
        _actuator_forces(model, ctrl, q, qd)
        + _passive_forces(model, q, qd, limit_penalty=not use_solver)
        + tau_con
        - c
        - damping * qd
    )
    if model.density > 0 or model.viscosity > 0:
        tau = tau + _fluid_shared(model, v_com, omega, k.Rs, Jp, Jr)
    if _has_spatial_tendons(model):
        tau = tau + _spatial_tendon_tau(model, k, qd, contact, dtype)
    if (
        contact.pairs
        and model.pair_body is not None
        and len(model.pair_body)
    ):
        tau = tau + _pair_contact_tau(model, k, qd, contact, dtype)
    return M, tau, d_con, k


def _seg_closest(p1, q1, p2, q2):
    """Closest points between segments [p1,q1], [p2,q2] (Ericson 5.1.9)."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = jnp.dot(d1, d1) + 1e-12
    e = jnp.dot(d2, d2) + 1e-12
    f = jnp.dot(d2, r)
    c = jnp.dot(d1, r)
    b = jnp.dot(d1, d2)
    denom = a * e - b * b
    s = jnp.where(
        denom > 1e-12, jnp.clip((b * f - c * e) / denom, 0.0, 1.0), 0.0
    )
    t = (b * s + f) / e
    s = jnp.where(
        t < 0.0,
        jnp.clip(-c / a, 0.0, 1.0),
        jnp.where(t > 1.0, jnp.clip((b - c) / a, 0.0, 1.0), s),
    )
    t = jnp.clip(t, 0.0, 1.0)
    return p1 + s * d1, p2 + t * d2


def _pair_fn(model: PhysModel, q, qd, contact):
    """Per-pair contact normal forces [n_pairs] (touch-sensor observable)."""
    k = _kin(model, q)
    s = dof_structure(model)
    dtype = q.dtype
    bm = jnp.asarray(s.body_mask, dtype)
    tv = qd[:, None] * k.t
    wv = qd[:, None] * k.w
    wxc = jnp.cross(wv, k.c)
    out = []
    for p in range(len(model.pair_body)):
        ba, bb = (int(v) for v in model.pair_body[p])
        sa = jnp.asarray(model.pair_seg_a[p], dtype)
        sb = jnp.asarray(model.pair_seg_b[p], dtype)
        ra, rb = (float(v) for v in model.pair_radius[p])
        a0 = k.ps[ba] + k.Rs[ba] @ sa[0]
        a1 = k.ps[ba] + k.Rs[ba] @ sa[1]
        b0 = k.ps[bb] + k.Rs[bb] @ sb[0]
        b1 = k.ps[bb] + k.Rs[bb] @ sb[1]
        pa, pb = _seg_closest(a0, a1, b0, b1)
        delta = pa - pb
        dist = jnp.linalg.norm(delta) + 1e-9
        n = delta / dist
        pen = (ra + rb) - dist

        def pv(b, x):
            col = bm[:, b]
            om = col @ wv
            return col @ tv + jnp.cross(om, x) - col @ wxc

        vn = jnp.dot(pv(ba, pa) - pv(bb, pb), n)
        fn = jnp.where(
            pen > 0, contact.pair_kp * pen - contact.pair_kd * vn, 0.0
        )
        out.append(jnp.maximum(fn, 0.0))
    return jnp.stack(out) if out else jnp.zeros(0, q.dtype)


def _pair_contact_tau(model: PhysModel, k: _Kin, qd, contact, dtype):
    """Sphere/capsule pair penalty contacts (body-body).

    Mirrors the ground-plane penalty model: one-sided normal spring +
    damping at the closest points, smooth Coulomb friction on the
    tangential relative velocity.  Replaces MuJoCo's LCP contacts at
    behavior level (SURVEY.md §7 hard part 1).
    """
    s = dof_structure(model)
    bm = jnp.asarray(s.body_mask, dtype)
    tv = qd[:, None] * k.t
    wv = qd[:, None] * k.w
    wxc = jnp.cross(wv, k.c)
    tau = jnp.zeros(model.nv, dtype)

    def point_vel(b, x):
        col = bm[:, b]
        om = col @ wv
        return col @ tv + jnp.cross(om, x) - col @ wxc

    for p in range(len(model.pair_body)):
        ba, bb = (int(v) for v in model.pair_body[p])
        sa = jnp.asarray(model.pair_seg_a[p], dtype)
        sb = jnp.asarray(model.pair_seg_b[p], dtype)
        ra, rb = (float(v) for v in model.pair_radius[p])
        a0 = k.ps[ba] + k.Rs[ba] @ sa[0]
        a1 = k.ps[ba] + k.Rs[ba] @ sa[1]
        b0 = k.ps[bb] + k.Rs[bb] @ sb[0]
        b1 = k.ps[bb] + k.Rs[bb] @ sb[1]
        pa, pb = _seg_closest(a0, a1, b0, b1)
        delta = pa - pb
        dist = jnp.linalg.norm(delta) + 1e-9
        n = delta / dist
        pen = (ra + rb) - dist
        v_rel = point_vel(ba, pa) - point_vel(bb, pb)
        vn = jnp.dot(v_rel, n)
        fn = jnp.where(
            pen > 0, contact.pair_kp * pen - contact.pair_kd * vn, 0.0
        )
        fn = jnp.maximum(fn, 0.0)
        vt = v_rel - vn * n
        vt_norm = jnp.linalg.norm(vt) + 1e-9
        mu = float(model.pair_friction[p]) * contact.mu_scale
        ft = -mu * fn * jnp.tanh(vt_norm / contact.vs) * vt / vt_norm
        F_a = fn * n + ft
        for b, x, F in ((ba, pa, F_a), (bb, pb, -F_a)):
            jp = k.t + jnp.cross(k.w, x[None, :] - k.c)
            tau = tau + bm[:, b] * (jp @ F)
    return tau


def _has_spatial_tendons(model: PhysModel) -> bool:
    return (
        model.ten_spatial_sites is not None
        and len(model.ten_spatial_sites) > 0
        and bool(model.ten_spatial_limited.any())
    )


def _spatial_tendon_tau(model: PhysModel, k: _Kin, qd, contact, dtype):
    """Limit-range penalty for site-to-site tendons (ball_in_cup string).

    MuJoCo enforces tendon limits in the constraint solver; the penalty
    spring mirrors the ground-contact approximation (one-sided spring +
    damping along the string while outside the range).
    """
    s = dof_structure(model)
    bm = jnp.asarray(s.body_mask, dtype)  # [nv, nb]
    tv = qd[:, None] * k.t
    wv = qd[:, None] * k.w
    wxc = jnp.cross(wv, k.c)
    tau = jnp.zeros(model.nv, dtype)

    def site_pos(sid):
        b = int(model.site_body[sid])
        local = jnp.asarray(model.site_pos[sid], dtype)
        return b, k.ps[b] + k.Rs[b] @ local

    def point_vel(b, x):
        col = bm[:, b]
        om = col @ wv
        return col @ tv + jnp.cross(om, x) - col @ wxc

    for t in range(len(model.ten_spatial_sites)):
        if not bool(model.ten_spatial_limited[t]):
            continue
        sa, sb = (int(v) for v in model.ten_spatial_sites[t])
        ba, xa = site_pos(sa)
        bb, xb = site_pos(sb)
        diff = xa - xb
        length = jnp.linalg.norm(diff) + 1e-9
        u = diff / length
        lo, hi = (float(v) for v in model.ten_spatial_range[t])
        over = jnp.maximum(length - hi, 0.0)
        under = jnp.maximum(lo - length, 0.0)
        active = (over > 0) | (under > 0)
        ldot = jnp.dot(u, point_vel(ba, xa) - point_vel(bb, xb))
        f_mag = jnp.where(
            active,
            -contact.ten_kp * (over - under) - contact.ten_kd * ldot,
            0.0,
        )
        # One-sided: a string can only pull (no pushing when slack).
        F_a = f_mag * u
        for b, x, F in ((ba, xa, F_a), (bb, xb, -F_a)):
            jp = k.t + jnp.cross(k.w, x[None, :] - k.c)  # [nv, 3]
            tau = tau + bm[:, b] * (jp @ F)
    return tau


def forward(
    model: PhysModel,
    q: jax.Array,
    qd: jax.Array,
    ctrl: jax.Array,
    contact: ContactParams = ContactParams(),
) -> jax.Array:
    """Forward dynamics: qacc with explicit damping (for RK4)."""
    M, tau, _, k = _smooth(model, q, qd, ctrl, contact)
    if contact.solver == "mujoco":
        from .solver import constraint_force

        qfrc_con, qacc_smooth = constraint_force(
            model, k, q, qd, M, tau, model.timestep, contact.sol_iters
        )
        return qacc_smooth + spd_solve(M, qfrc_con)
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

    Under ``vmap`` (the pool's env axis) this dispatches to the
    lane-parallel scalar backend (``physics.scalar``) when the model's
    unroll cost permits — a ``custom_vmap`` rule, so per-env semantics are
    unchanged.
    """
    return _dispatching_step(model, substeps, contact, nsteps)(
        qpos, qvel, ctrl
    )


def _scalar_mode() -> str:
    import os

    return os.environ.get("ENVPOOL_TPU_PHYSICS", "auto")


# Unroll-cost ceiling for the scalar backend: above this the emitted HLO
# gets large enough that compile time dominates (humanoid-class models sit
# around ~60k; they still benefit, so the ceiling is generous).
_SCALAR_COST_CEILING = 400_000


@functools.lru_cache(maxsize=256)
def _dispatching_step(model, substeps, contact, nsteps):
    """Build the custom_vmap-wrapped stepper for one static config."""

    def base(qpos, qvel, ctrl):
        return _step_impl(
            model, qpos, qvel, ctrl, substeps, contact, nsteps
        )

    wrapped = jax.custom_batching.custom_vmap(base)

    @wrapped.def_vmap
    def _rule(axis_size, in_batched, qpos, qvel, ctrl):
        del axis_size
        all_batched = all(jax.tree_util.tree_leaves(in_batched))
        mode = _scalar_mode()
        from .scalar import step_batched, unroll_cost

        # "auto" picks the scalar backend only off-CPU: XLA:CPU compiles
        # the big unrolled graphs 10-100x slower than the TPU compiler and
        # the einsum path is fast enough for CPU test runs.
        use_scalar = all_batched and contact.solver != "mujoco" and (
            mode == "scalar"
            or (
                mode == "auto"
                and jax.default_backend() != "cpu"
                and unroll_cost(model) <= _SCALAR_COST_CEILING
            )
        )
        if use_scalar:
            out = step_batched(
                model, qpos, qvel, ctrl, substeps, contact, nsteps
            )
        else:
            axes = tuple(
                0 if b else None for b in jax.tree_util.tree_leaves(in_batched)
            )
            out = jax.vmap(base, in_axes=axes)(qpos, qvel, ctrl)
        return out, (True, True)

    return wrapped


def _step_impl(
    model: PhysModel,
    qpos: jax.Array,
    qvel: jax.Array,
    ctrl: jax.Array,
    substeps: int,
    contact: ContactParams,
    nsteps: int,
):
    """Single-env (unbatched) reference implementation — einsum path."""
    h = model.timestep / substeps
    damping = jnp.asarray(model.dof_damping, qpos.dtype)

    def euler(q, qd):
        M, tau, d_con, k = _smooth(model, q, qd, ctrl, contact)
        if contact.solver == "mujoco":
            # mj_Euler semantics: the solver computes f against plain M
            # (qacc_smooth = M⁻¹ tau); integration then solves
            # (M + h·diag(damping)) qacc = tau + Jᵀf.
            from .solver import constraint_force

            qfrc_con, _ = constraint_force(
                model, k, q, qd, M, tau, h, contact.sol_iters
            )
            M_imp = M + h * jnp.diag(damping)
            qacc = spd_solve(M_imp, tau + qfrc_con)
            qd_new = qd + h * qacc
            return integrate_qpos(model, q, qd_new, h), qd_new
        # Implicit damping: (M + h·D) qacc = rhs.  The joint-limit penalty
        # spring (klim=300 in _passive_forces) is critically damped against
        # the dof's own inertia while violated — an undamped explicit
        # penalty blows up for light links (swimmer) at h = 2 ms.
        # d_con (contact normal damping + friction slope, projected to
        # joint space) joins the LHS so stiff foot contacts stay stable
        # at a full model timestep.
        d_lim = (
            2.0 * jnp.sqrt(300.0 * jnp.diag(M)) * _limit_violation(model, q)
        )
        M_imp = M + h * (jnp.diag(damping + d_lim) + d_con)
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
