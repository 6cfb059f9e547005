"""Forward kinematics and velocity kinematics (pure JAX, autodiff-friendly).

Design: instead of hand-writing Featherstone spatial-algebra recursions
(what MuJoCo's C core does), we write only *position* kinematics explicitly
and derive every velocity/Jacobian via ``jax.jvp``:

  * ``fk(model, q)`` — body rotations/origins + contact-point positions,
    a small unrolled loop over the kinematic tree (nbody ≤ ~15: negligible).
  * ``tangent(model, q, qd)`` — maps a generalized velocity to a coordinate
    tangent ``q̇`` (identity for hinge/slide; quaternion kinematics
    ``q̇ = ½ q ⊗ [0, ω_body]`` for free joints, matching MuJoCo's
    convention that free-joint angular velocity lives in the body frame).
  * body/point velocities = ``jvp(fk, q, tangent(q, qd))``; angular
    velocity from ``ω̂ = Ṙ Rᵀ``.

Correctness is pinned by oracle tests against real MuJoCo (CPU bindings)
in ``tests/test_physics.py`` — the same strategy the reference uses for its
alignment suites (SURVEY.md §4.5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .model import BALL, FREE, HINGE, SLIDE, PhysModel

__all__ = [
    "quat2mat",
    "fk",
    "fk_dof",
    "tangent",
    "body_vel",
    "integrate_qpos",
]


def quat2mat(q: jax.Array) -> jax.Array:
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def _axis_angle(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Rotation matrix about a unit axis (Rodrigues)."""
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    x, y, z = axis[0], axis[1], axis[2]
    k = jnp.array([[0.0, -z, y], [z, 0.0, -x], [-y, x, 0.0]])
    return jnp.eye(3) + s * k + (1 - c) * (k @ k)


def _quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return jnp.array(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ]
    )


def _joints_of_body(model: PhysModel) -> list[list[int]]:
    out: list[list[int]] = [[] for _ in range(model.nbody)]
    for j in range(len(model.jnt_type)):
        out[int(model.jnt_body[j])].append(j)
    return out


def fk(model: PhysModel, q: jax.Array):
    """Body world frames: (R [nb,3,3], p [nb,3]).

    Joints of a body apply in model order within the body frame, mirroring
    MuJoCo ``mj_kinematics``: a hinge rotates the current frame about the
    axis through its anchor; a slide translates along its axis; a free
    joint *sets* the frame from qpos.  Hinge/slide transforms are relative
    to the joint's reference value ``qpos0[adr]`` (MJCF ``ref`` attribute;
    engine_core_smooth.c uses ``qpos[qadr] - m->qpos0[qadr]``).
    """
    dtype = q.dtype
    joints = _joints_of_body(model)
    q0 = model.qpos0
    Rs = [jnp.eye(3, dtype=dtype)]
    ps = [jnp.zeros(3, dtype=dtype)]
    for b in range(1, model.nbody):
        parent = int(model.body_parent[b])
        R = Rs[parent] @ quat2mat(jnp.asarray(model.body_quat[b], dtype))
        p = ps[parent] + Rs[parent] @ jnp.asarray(model.body_pos[b], dtype)
        for j in joints[b]:
            jtype = int(model.jnt_type[j])
            adr = int(model.jnt_qposadr[j])
            if jtype == FREE:
                p = q[adr : adr + 3]
                quat = q[adr + 3 : adr + 7]
                # mj_forward normalizes qpos quaternions in place
                # (mj_normalizeQuat); match it so a perturbed reset
                # quat doesn't skew the rotation matrix.
                R = quat2mat(quat / jnp.linalg.norm(quat))
            elif jtype == SLIDE:
                axis_w = R @ jnp.asarray(model.jnt_axis[j], dtype)
                p = p + axis_w * (q[adr] - float(q0[adr]))
            elif jtype == HINGE:
                axis_w = R @ jnp.asarray(model.jnt_axis[j], dtype)
                anchor_w = p + R @ jnp.asarray(model.jnt_pos[j], dtype)
                rot = _axis_angle(axis_w, q[adr] - float(q0[adr]))
                R = rot @ R
                p = anchor_w + rot @ (p - anchor_w)
            elif jtype == BALL:
                # mj_kinematics: xquat = xquat * qloc (local rotation in
                # the CHILD frame) about the joint anchor; the anchor
                # point stays fixed.
                anchor_w = p + R @ jnp.asarray(model.jnt_pos[j], dtype)
                quat = q[adr : adr + 4]
                R = R @ quat2mat(quat / jnp.linalg.norm(quat))
                p = anchor_w - R @ jnp.asarray(model.jnt_pos[j], dtype)
            else:
                raise NotImplementedError(f"joint type {jtype}")
        Rs.append(R)
        ps.append(p)
    return jnp.stack(Rs), jnp.stack(ps)


def fk_dof(model: PhysModel, q: jax.Array):
    """One FK pass that also emits every dof's world-frame screw.

    Returns ``(Rs [nb,3,3], ps [nb,3], t [nv,3], w [nv,3], c [nv,3])`` where
    dof k contributes point velocity ``qd_k * (t_k + w_k x (x - c_k))`` and
    angular velocity ``qd_k * w_k`` to every body it moves (mask in
    ``structure.dof_structure``).  This is the single tree traversal the
    analytic dynamics path (``dynamics._smooth``) builds everything from.
    """
    dtype = q.dtype
    joints = _joints_of_body(model)
    Rs = [jnp.eye(3, dtype=dtype)]
    ps = [jnp.zeros(3, dtype=dtype)]
    zero3 = jnp.zeros(3, dtype)
    nv = model.nv
    t: list = [zero3] * nv
    w: list = [zero3] * nv
    c: list = [zero3] * nv
    for b in range(1, model.nbody):
        parent = int(model.body_parent[b])
        R = Rs[parent] @ quat2mat(jnp.asarray(model.body_quat[b], dtype))
        p = ps[parent] + Rs[parent] @ jnp.asarray(model.body_pos[b], dtype)
        for j in joints[b]:
            jtype = int(model.jnt_type[j])
            adr = int(model.jnt_qposadr[j])
            d = int(model.jnt_dofadr[j])
            if jtype == FREE:
                p = q[adr : adr + 3]
                quat = q[adr + 3 : adr + 7]
                # mj_forward normalizes qpos quaternions in place
                # (mj_normalizeQuat); match it so a perturbed reset
                # quat doesn't skew the rotation matrix.
                R = quat2mat(quat / jnp.linalg.norm(quat))
                for i in range(3):
                    t[d + i] = (
                        jnp.zeros(3, dtype).at[i].set(jnp.asarray(1.0, dtype))
                    )
                    w[d + 3 + i] = R[:, i]
                    c[d + 3 + i] = p
            elif jtype == SLIDE:
                axis_w = R @ jnp.asarray(model.jnt_axis[j], dtype)
                t[d] = axis_w
                p = p + axis_w * (q[adr] - float(model.qpos0[adr]))
            elif jtype == HINGE:
                axis_w = R @ jnp.asarray(model.jnt_axis[j], dtype)
                anchor_w = p + R @ jnp.asarray(model.jnt_pos[j], dtype)
                w[d] = axis_w
                c[d] = anchor_w
                rot = _axis_angle(axis_w, q[adr] - float(model.qpos0[adr]))
                R = rot @ R
                p = anchor_w + rot @ (p - anchor_w)
            elif jtype == BALL:
                anchor_w = p + R @ jnp.asarray(model.jnt_pos[j], dtype)
                quat = q[adr : adr + 4]
                R = R @ quat2mat(quat / jnp.linalg.norm(quat))
                p = anchor_w - R @ jnp.asarray(model.jnt_pos[j], dtype)
                # Angular velocity lives in the post-joint child frame
                # (MuJoCo cdof for balls), anchored at the joint.
                for i in range(3):
                    w[d + i] = R[:, i]
                    c[d + i] = anchor_w
            else:
                raise NotImplementedError(f"joint type {jtype}")
        Rs.append(R)
        ps.append(p)
    return (
        jnp.stack(Rs),
        jnp.stack(ps),
        jnp.stack(t),
        jnp.stack(w),
        jnp.stack(c),
    )


def tangent(model: PhysModel, q: jax.Array, qd: jax.Array) -> jax.Array:
    """Coordinate tangent q̇ for generalized velocity qd (nq ≥ nv)."""
    if model.nq == model.nv:
        # Only hinge/slide joints: identity.
        return qd
    from .structure import dof_structure

    s = dof_structure(model)
    qdot = jnp.zeros_like(q)
    if len(s.nonfree_qadr):
        qdot = qdot.at[jnp.asarray(s.nonfree_qadr)].set(
            qd[jnp.asarray(s.nonfree_dadr)]
        )
    for qadr, dadr in s.free_jnts:
        qdot = qdot.at[qadr : qadr + 3].set(qd[dadr : dadr + 3])
    for qadr, dadr in s.quat_jnts:
        quat = q[qadr : qadr + 4]
        omega_body = qd[dadr : dadr + 3]
        dq = 0.5 * _quat_mul(
            quat, jnp.concatenate([jnp.zeros(1, q.dtype), omega_body])
        )
        qdot = qdot.at[qadr : qadr + 4].set(dq)
    return qdot


def body_vel(model: PhysModel, q: jax.Array, qd: jax.Array):
    """((R, p), (ω [nb,3], v [nb,3])) — world-frame body twists."""
    qdot = tangent(model, q, qd)
    (Rs, ps), (Rds, pds) = jax.jvp(lambda q_: fk(model, q_), (q,), (qdot,))
    # ω̂ = Ṙ Rᵀ → vee.
    what = jnp.einsum("bij,bkj->bik", Rds, Rs)
    omega = jnp.stack(
        [what[:, 2, 1], what[:, 0, 2], what[:, 1, 0]], axis=-1
    )
    return (Rs, ps), (omega, pds)


def integrate_qpos(
    model: PhysModel, q: jax.Array, qd: jax.Array, h: float
) -> jax.Array:
    """qpos ← qpos ⊕ h·qd (quaternion joints via exponential map)."""
    if model.nq == model.nv:
        return q + h * qd
    from .structure import dof_structure

    s = dof_structure(model)
    out = q
    if len(s.nonfree_qadr):
        qadr = jnp.asarray(s.nonfree_qadr)
        out = out.at[qadr].set(q[qadr] + h * qd[jnp.asarray(s.nonfree_dadr)])
    for qadr, dadr in s.free_jnts:
        out = out.at[qadr : qadr + 3].set(
            q[qadr : qadr + 3] + h * qd[dadr : dadr + 3]
        )
    for qadr, dadr in s.quat_jnts:
        quat = q[qadr : qadr + 4]
        omega = qd[dadr : dadr + 3]
        angle = jnp.linalg.norm(omega) * h
        axis = omega / (jnp.linalg.norm(omega) + 1e-12)
        dq = jnp.concatenate(
            [jnp.cos(angle / 2)[None], jnp.sin(angle / 2) * axis]
        )
        new_quat = _quat_mul(quat, dq)
        new_quat = new_quat / jnp.linalg.norm(new_quat)
        out = out.at[qadr : qadr + 4].set(new_quat)
    return out
