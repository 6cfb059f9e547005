"""MuJoCo-faithful constraint solver: pyramidal contacts + joint limits.

The ``solver="mujoco"`` alternative to the penalty contact model
(``dynamics._contact_forces_shared``): it reproduces MuJoCo's soft
constraint machinery — impedance d(r) from solimp, reference acceleration
``aref = -B·(J qvel) - d·K·pos`` from solref, diagonal regularizer
``R = (1-d)/d · diagApprox`` — and solves the regularized dual

    min_f  ½ fᵀ(A + R)f + fᵀ(J qacc_smooth − aref),   f ≥ 0
    A = J M⁻¹ Jᵀ

by projected Gauss–Seidel over the pyramid facet / limit forces.  MuJoCo's
Newton solver minimizes the same strictly-convex objective (pyramidal cone
= nonnegative facet forces), so at convergence the two agree; fidelity is
pinned quantitatively by ``tests/test_contact_solver.py`` (N-step drift vs
``mj_step`` from shared states, per-task tolerance table) — replacing the
reference's in-thread MuJoCo stepping
(``/root/reference/envpool/mujoco/gym/mujoco_env.h:128-136``).

Every formula here was verified numerically against live MuJoCo 3.10 efc_*
internals (aref/R/KBIP/J rows) on plane-sphere and hinge-limit probes:

* pyramid facets per contact: ``n ± μ₁t₁, n ± μ₂t₂`` (unnormalized),
  plane frame t₁=(0,1,0), t₂=(−1,0,0);
* K = 1/(dmax² · tc² · dr²), B = 2/(dmax · tc), tc clamped to ≥ 2·h;
* contact diagApprox = 2(condim−1) · Σ body translational invweight0;
  limit diagApprox = dof_invweight0;
* limit rows: J = +e (lower) / −e (upper), pos = signed distance.

Scope: world-plane contacts at z = 0 (the Gym/dm_control locomotion
convention — same plane the extraction in ``model.from_mj_model`` uses)
and hinge/slide joint limits.  Body-body pair contacts keep the penalty
path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .linalg import spd_solve
from .model import PhysModel
from .structure import dof_structure

__all__ = ["constraint_force", "has_solver_params"]

_MINVAL = 1e-10


def has_solver_params(model: PhysModel) -> bool:
    return model.con_solref is not None and model.dof_invweight is not None


def _impedance(solimp: jax.Array, r: jax.Array) -> jax.Array:
    """MuJoCo impedance d(r): dmin→dmax over |r| ∈ [0, width]."""
    dmin, dmax, width, mid, power = (solimp[..., i] for i in range(5))
    x = jnp.clip(jnp.abs(r) / jnp.maximum(width, _MINVAL), 0.0, 1.0)
    # Sigmoid: y = a·x^p for x ≤ mid, 1 − b·(1−x)^p above, C1 at mid.
    a = 1.0 / jnp.maximum(mid, _MINVAL) ** (power - 1.0)
    b = 1.0 / jnp.maximum(1.0 - mid, _MINVAL) ** (power - 1.0)
    y = jnp.where(
        x <= mid, a * x**power, 1.0 - b * (1.0 - x) ** power
    )
    return jnp.clip(dmin + y * (dmax - dmin), _MINVAL, 1.0 - _MINVAL)


def _kbi(solref, solimp, d, h):
    """(K, B) per row; solref timeconst clamped to ≥ 2h (mj_assignRef)."""
    tc = jnp.maximum(solref[..., 0], 2.0 * h)
    dr = solref[..., 1]
    dmax = solimp[..., 1]
    K = 1.0 / jnp.maximum(dmax**2 * tc**2 * dr**2, _MINVAL)
    B = 2.0 / jnp.maximum(dmax * tc, _MINVAL)
    del d
    return K, B


def _contact_rows(model: PhysModel, k, qd, dtype, h):
    """Pyramid facet rows for all ground-plane contact spheres.

    Returns (J [4nc, nv], aref, R, active) — inactive rows (dist ≥ margin)
    get R = 1 and force clamped to 0 by the PGS mask.
    """
    nc = len(model.con_body)
    nv = model.nv
    if nc == 0:
        z = jnp.zeros((0,), dtype)
        return jnp.zeros((0, nv), dtype), z, z, jnp.zeros((0,), bool)
    s = dof_structure(model)
    radius = jnp.asarray(model.con_radius, dtype)
    margin = jnp.asarray(model.con_margin, dtype)
    solref = jnp.asarray(model.con_solref, dtype)
    solimp = jnp.asarray(model.con_solimp, dtype)
    mu = jnp.asarray(model.con_friction, dtype)
    invw = jnp.asarray(model.con_invw, dtype)

    dist = k.centers[:, 2] - radius          # plane z=0; <0 → penetrating
    active = dist < margin
    # Contact point: plane/sphere surface midpoint (mjContact.pos).
    x_c = k.centers.at[:, 2].set(dist / 2.0)
    # Point Jacobian at x_c (same closed form as _jac_from_kin).
    Cf = jnp.asarray(s.con_mask, dtype)      # [nv, nc]
    relc = x_c[None, :, :] - k.c[:, None, :]
    Jpt = Cf[:, :, None] * (
        k.t[:, None, :] + jnp.cross(k.w[:, None, :], relc)
    )                                        # [nv, nc, 3]
    # Tangent frame per contact: MuJoCo's plane-capsule aligns tangent 1
    # with the capsule axis projected onto the plane; sphere/box contacts
    # use the plane's default frame t1=(0,1,0), t2=(-1,0,0).
    axis_local = jnp.asarray(model.con_axis, dtype)      # [nc, 3] body frame
    Rb = k.Rs[jnp.asarray(model.con_body)]               # [nc, 3, 3]
    axis_w = jnp.einsum("cij,cj->ci", Rb, axis_local)
    in_plane = axis_w.at[:, 2].set(0.0)
    nrm = jnp.linalg.norm(in_plane, axis=1)
    has_axis = (jnp.linalg.norm(axis_local, axis=1) > 0.5) & (nrm > 1e-9)
    default_t1 = jnp.broadcast_to(
        jnp.asarray([0.0, 1.0, 0.0], dtype), in_plane.shape
    )
    t1 = jnp.where(
        has_axis[:, None], in_plane / jnp.maximum(nrm, 1e-12)[:, None],
        default_t1,
    )                                        # [nc, 3] in-plane unit
    # t2 = n × t1 with n = (0,0,1).
    t2 = jnp.stack(
        [-t1[:, 1], t1[:, 0], jnp.zeros_like(t1[:, 0])], axis=1
    )
    Jn = Jpt[:, :, 2].T                      # [nc, nv] normal (0,0,1)
    Jt1 = jnp.einsum("vci,ci->cv", Jpt, t1)
    Jt2 = jnp.einsum("vci,ci->cv", Jpt, t2)
    # Facets: n+μt1, n−μt1, n+μt2, n−μt2  (MuJoCo row order).
    m1 = mu[:, None]
    J = jnp.stack(
        [Jn + m1 * Jt1, Jn - m1 * Jt1, Jn + m1 * Jt2, Jn - m1 * Jt2],
        axis=1,
    ).reshape(4 * nc, nv)

    r = dist - margin
    d = _impedance(solimp, r)
    K, B = _kbi(solref, solimp, d, h)
    vel = J @ qd                             # [4nc]
    pos4 = jnp.repeat(r, 4)
    d4 = jnp.repeat(d, 4)
    aref = -jnp.repeat(B, 4) * vel - d4 * jnp.repeat(K, 4) * pos4
    R = jnp.maximum(_MINVAL, (1.0 - d4) / d4 * jnp.repeat(invw, 4))
    return J, aref, R, jnp.repeat(active, 4)


def _limit_rows(model: PhysModel, q, qd, dtype, h):
    """Joint-limit rows for limited hinge/slide joints (one row each)."""
    s = dof_structure(model)
    nv = model.nv
    if len(s.hs_qadr) == 0 or model.jnt_solref_lim is None:
        z = jnp.zeros((0,), dtype)
        return jnp.zeros((0, nv), dtype), z, z, jnp.zeros((0,), bool)
    qadr = jnp.asarray(s.hs_qadr)
    dadr = jnp.asarray(s.hs_dadr)
    lo = jnp.asarray(s.hs_lo, dtype)
    hi = jnp.asarray(s.hs_hi, dtype)
    limited = jnp.isfinite(lo) & jnp.isfinite(hi)
    jids = s.hs_jnt  # numpy: static gather at trace time
    solref = jnp.asarray(model.jnt_solref_lim[jids], dtype)
    solimp = jnp.asarray(model.jnt_solimp_lim[jids], dtype)
    margin = jnp.asarray(model.jnt_margin[jids].reshape(-1), dtype)
    qs = q[qadr]
    dist_lo = qs - lo
    dist_hi = hi - qs
    lo_side = dist_lo <= dist_hi
    dist = jnp.where(lo_side, dist_lo, dist_hi)
    # Unlimited joints have ±inf bounds: zero their distance so no inf/nan
    # leaks through aref into the (masked-out) PGS rows — inf · 0 = nan.
    dist = jnp.where(limited, dist, 0.0)
    sign = jnp.where(lo_side, 1.0, -1.0)
    active = limited & (dist < margin)
    nl = qs.shape[0]
    J = jnp.zeros((nl, nv), dtype)
    J = J.at[jnp.arange(nl), dadr].set(sign)
    r = dist - margin
    d = _impedance(solimp, r)
    K, B = _kbi(solref, solimp, d, h)
    vel = sign * qd[dadr]
    aref = -B * vel - d * K * r
    invw = jnp.asarray(model.dof_invweight, dtype)[dadr]
    R = jnp.maximum(_MINVAL, (1.0 - d) / d * invw)
    return J, aref, R, active


def constraint_force(
    model: PhysModel,
    k,
    q: jax.Array,
    qd: jax.Array,
    M: jax.Array,
    tau_smooth: jax.Array,
    h: float,
    iterations: int = 40,
):
    """Solve for qfrc_constraint = Jᵀf via projected Gauss–Seidel.

    ``k`` is the dynamics ``_Kin`` pass for (model, q).  Returns
    (qfrc_constraint [nv], qacc_smooth [nv]).
    """
    dtype = q.dtype
    Jc, aref_c, R_c, act_c = _contact_rows(model, k, qd, dtype, h)
    Jl, aref_l, R_l, act_l = _limit_rows(model, q, qd, dtype, h)
    J = jnp.concatenate([Jc, Jl], axis=0)
    aref = jnp.concatenate([aref_c, aref_l])
    R = jnp.concatenate([R_c, R_l])
    active = jnp.concatenate([act_c, act_l])
    nr = J.shape[0]
    qacc_smooth = spd_solve(M, tau_smooth)
    if nr == 0:
        return jnp.zeros(model.nv, dtype), qacc_smooth

    MinvJt = spd_solve(M, J.T)               # [nv, nr]
    A = J @ MinvJt                           # [nr, nr]
    b = J @ qacc_smooth - aref
    diag = jnp.clip(jnp.diag(A) + R, _MINVAL, None)
    act_f = active.astype(dtype)

    def sweep(_, f):
        def row(i, f):
            # One-hot row extraction: dynamic row gathers lower to
            # per-element dynamic-slices on TPU (~ms each); the one-hot
            # contraction rides the MXU instead.
            e = jax.nn.one_hot(i, nr, dtype=dtype)
            g = jnp.dot(e @ A, f) + (e @ b) + (e @ R) * jnp.dot(e, f)
            fi = jnp.maximum(0.0, jnp.dot(e, f) - g / jnp.dot(e, diag))
            fi = fi * jnp.dot(e, act_f)
            return f + (fi - jnp.dot(e, f)) * e

        return jax.lax.fori_loop(0, nr, row, f)

    f = jax.lax.fori_loop(
        0, iterations, sweep, jnp.zeros(nr, dtype)
    )
    return J.T @ f, qacc_smooth
