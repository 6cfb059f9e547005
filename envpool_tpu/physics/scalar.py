"""Lane-parallel ("scalarized") physics backend for the vectorized pool.

The einsum path in ``dynamics.py`` is correct but maps poorly onto TPU
tiling when vmapped: intermediates like ``[N, nv, nb, 3]`` put size-3 axes
on the 128-wide lane dimension (42x padding waste) and lower the masked
contractions to tiny batched dots the MXU cannot use.  This module is the
same closed-form screw dynamics *unrolled over the model structure at trace
time*: every per-env quantity is a plain ``[N]`` vector, 3-vectors are
tuples of three ``[N]`` arrays, and the static masks from
``structure.dof_structure`` select which terms exist at all (pruned terms
cost zero ops).  XLA fuses the resulting elementwise DAG into a handful of
full-lane VPU kernels — the layout that makes CartPole run at 500M+
steps/s here.

Model constants enter as Python floats, so identity rotations, zero
offsets, and mask zeros constant-fold during tracing (the ``_add``/``_mul``
helpers below).  Math and semantics mirror ``dynamics.py`` term for term;
equivalence is pinned by ``tests/test_physics.py`` against both the einsum
path and real MuJoCo.  (Behavioral reference: the C++ EnvPool steps real
MuJoCo on CPU threads, ``envpool/mujoco/gym/mujoco_env.h:45-267``.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .model import FREE, HINGE, SLIDE, PhysModel
from .structure import dof_structure

__all__ = ["step_batched", "unroll_cost"]

# ---------------------------------------------------------------------------
# Folding scalar helpers: operands are Python floats (model constants) or
# traced [N] arrays.  Folding keeps the emitted HLO proportional to the
# *dynamic* structure of the model, not the dense masked form.
# ---------------------------------------------------------------------------


def _isconst(a) -> bool:
    return isinstance(a, (int, float))


def _add(a, b):
    if _isconst(a) and a == 0.0:
        return b
    if _isconst(b) and b == 0.0:
        return a
    return a + b


def _sub(a, b):
    if _isconst(b) and b == 0.0:
        return a
    if _isconst(a) and a == 0.0:
        return -b
    return a - b


def _mul(a, b):
    if (_isconst(a) and a == 0.0) or (_isconst(b) and b == 0.0):
        return 0.0
    if _isconst(a) and a == 1.0:
        return b
    if _isconst(b) and b == 1.0:
        return a
    return a * b


def _fma(acc, a, b):
    return _add(acc, _mul(a, b))


# vec3 = (x, y, z); mat3 = ((..),(..),(..)); each element float | [N] array.
V0 = (0.0, 0.0, 0.0)
EYE3 = ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0))


def _vadd(a, b):
    return tuple(_add(x, y) for x, y in zip(a, b))


def _vsub(a, b):
    return tuple(_sub(x, y) for x, y in zip(a, b))


def _vscale(s, v):
    return tuple(_mul(s, x) for x in v)


def _dot(a, b):
    return _fma(_fma(_mul(a[0], b[0]), a[1], b[1]), a[2], b[2])


def _cross(a, b):
    return (
        _sub(_mul(a[1], b[2]), _mul(a[2], b[1])),
        _sub(_mul(a[2], b[0]), _mul(a[0], b[2])),
        _sub(_mul(a[0], b[1]), _mul(a[1], b[0])),
    )


def _mv(m, v):
    return tuple(_dot(row, v) for row in m)


def _mtv(m, v):
    """mᵀ v."""
    return tuple(
        _fma(_fma(_mul(m[0][i], v[0]), m[1][i], v[1]), m[2][i], v[2])
        for i in range(3)
    )


def _mm(a, b):
    return tuple(
        tuple(
            _fma(_fma(_mul(a[i][0], b[0][j]), a[i][1], b[1][j]), a[i][2], b[2][j])
            for j in range(3)
        )
        for i in range(3)
    )


def _quat2mat(q):
    w, x, y, z = q
    xx, yy, zz = _mul(x, x), _mul(y, y), _mul(z, z)
    xy, xz, yz = _mul(x, y), _mul(x, z), _mul(y, z)
    wx, wy, wz = _mul(w, x), _mul(w, y), _mul(w, z)
    two = 2.0
    return (
        (
            _sub(1.0, _mul(two, _add(yy, zz))),
            _mul(two, _sub(xy, wz)),
            _mul(two, _add(xz, wy)),
        ),
        (
            _mul(two, _add(xy, wz)),
            _sub(1.0, _mul(two, _add(xx, zz))),
            _mul(two, _sub(yz, wx)),
        ),
        (
            _mul(two, _sub(xz, wy)),
            _mul(two, _add(yz, wx)),
            _sub(1.0, _mul(two, _add(xx, yy))),
        ),
    )


def _quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (
        _sub(_sub(_sub(_mul(aw, bw), _mul(ax, bx)), _mul(ay, by)), _mul(az, bz)),
        _sub(_add(_add(_mul(aw, bx), _mul(ax, bw)), _mul(ay, bz)), _mul(az, by)),
        _add(_sub(_add(_mul(aw, by), _mul(ay, bw)), _mul(ax, bz)), _mul(az, bx)),
        _add(_add(_sub(_mul(aw, bz), _mul(ay, bx)), _mul(ax, by)), _mul(az, bw)),
    )


def _axis_angle_rot(axis, angle):
    """Rodrigues rotation about a (possibly traced) unit axis."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    one_c = 1.0 - c
    x, y, z = axis
    return (
        (
            _add(c, _mul(_mul(x, x), one_c)),
            _sub(_mul(_mul(x, y), one_c), _mul(z, s)),
            _add(_mul(_mul(x, z), one_c), _mul(y, s)),
        ),
        (
            _add(_mul(_mul(x, y), one_c), _mul(z, s)),
            _add(c, _mul(_mul(y, y), one_c)),
            _sub(_mul(_mul(y, z), one_c), _mul(x, s)),
        ),
        (
            _sub(_mul(_mul(x, z), one_c), _mul(y, s)),
            _add(_mul(_mul(y, z), one_c), _mul(x, s)),
            _add(c, _mul(_mul(z, z), one_c)),
        ),
    )


# ---------------------------------------------------------------------------
# Structure-unrolled kinematics and dynamics.
# ---------------------------------------------------------------------------


def _joints_of_body(model: PhysModel):
    out = [[] for _ in range(model.nbody)]
    for j in range(len(model.jnt_type)):
        out[int(model.jnt_body[j])].append(j)
    return out


def _fk_scalar(model: PhysModel, q):
    """FK + dof screws, all scalars.  Mirrors ``kinematics.fk_dof``."""
    joints = _joints_of_body(model)
    Rs = [EYE3]
    ps = [V0]
    t = [V0] * model.nv
    w = [V0] * model.nv
    c = [V0] * model.nv
    for b in range(1, model.nbody):
        parent = int(model.body_parent[b])
        bq = tuple(float(v) for v in model.body_quat[b])
        bp = tuple(float(v) for v in model.body_pos[b])
        R = _mm(Rs[parent], _quat2mat(bq))
        p = _vadd(ps[parent], _mv(Rs[parent], bp))
        for j in joints[b]:
            jtype = int(model.jnt_type[j])
            adr = int(model.jnt_qposadr[j])
            d = int(model.jnt_dofadr[j])
            if jtype == FREE:
                p = (q[adr], q[adr + 1], q[adr + 2])
                R = _quat2mat((q[adr + 3], q[adr + 4], q[adr + 5], q[adr + 6]))
                for i in range(3):
                    t[d + i] = tuple(1.0 if k == i else 0.0 for k in range(3))
                    w[d + 3 + i] = (R[0][i], R[1][i], R[2][i])
                    c[d + 3 + i] = p
            elif jtype == SLIDE:
                axis = tuple(float(v) for v in model.jnt_axis[j])
                axis_w = _mv(R, axis)
                t[d] = axis_w
                # Relative to the joint ref (qpos0), as in mj_kinematics.
                p = _vadd(p, _vscale(q[adr] - float(model.qpos0[adr]), axis_w))
            elif jtype == HINGE:
                axis = tuple(float(v) for v in model.jnt_axis[j])
                anchor = tuple(float(v) for v in model.jnt_pos[j])
                axis_w = _mv(R, axis)
                anchor_w = _vadd(p, _mv(R, anchor))
                w[d] = axis_w
                c[d] = anchor_w
                rot = _axis_angle_rot(axis_w, q[adr] - float(model.qpos0[adr]))
                R = _mm(rot, R)
                p = _vadd(anchor_w, _mv(rot, _vsub(p, anchor_w)))
            else:  # pragma: no cover - guarded at model load
                raise NotImplementedError(f"joint type {jtype}")
        Rs.append(R)
        ps.append(p)
    return Rs, ps, t, w, c


def _chol_solve(M, b):
    """Unrolled scalar Cholesky solve; M = list-of-lists (lower triangle)."""
    n = len(b)
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        s = M[i][i]
        for k in range(i):
            s = s - L[i][k] * L[i][k]
        L[i][i] = jnp.sqrt(jnp.maximum(s, 1e-12))
        inv_d = 1.0 / L[i][i]
        for jj in range(i + 1, n):
            s = M[jj][i]
            for k in range(i):
                s = s - L[jj][k] * L[i][k]
            L[jj][i] = s * inv_d
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def _smooth_scalar(model: PhysModel, q, qd, ctrl, contact):
    """(M lower-triangle list-of-lists, tau list) — mirrors dynamics._smooth."""
    s = dof_structure(model)
    nv, nb = model.nv, model.nbody
    bm = s.body_mask.astype(bool)       # [nv, nb]
    prec = s.prec.astype(bool)          # [nv, nv]

    Rs, ps, t, w, c = _fk_scalar(model, q)

    # World CoM positions.
    x_com = [
        _vadd(ps[b], _mv(Rs[b], tuple(float(v) for v in model.body_ipos[b])))
        for b in range(nb)
    ]

    # World inertia (R ximat diag ximatᵀ): symmetric mat3 per body.
    Iw = [None] * nb
    for b in range(nb):
        if b == 0 or float(model.body_mass[b]) == 0.0:
            continue
        Ri = _quat2mat(tuple(float(v) for v in model.body_iquat[b]))
        Rw = _mm(Rs[b], Ri)
        d = tuple(float(v) for v in model.body_inertia[b])
        Iw[b] = tuple(
            tuple(
                _fma(
                    _fma(
                        _mul(_mul(Rw[i][0], d[0]), Rw[j][0]),
                        _mul(Rw[i][1], d[1]),
                        Rw[j][1],
                    ),
                    _mul(Rw[i][2], d[2]),
                    Rw[j][2],
                )
                for j in range(3)
            )
            for i in range(3)
        )

    # Per-dof velocity screws.
    tv = [_vscale(qd[k], t[k]) for k in range(nv)]
    wv = [_vscale(qd[k], w[k]) for k in range(nv)]
    wxc = [_cross(wv[k], c[k]) for k in range(nv)]

    # Body twists (ω_b, v_com_b) over the body mask.  The translational
    # sums (tvs, wxs) are kept per body: the velocity of ANY material point
    # x on body b is  tvs_b + ω_b × x − wxs_b  (used again for contacts).
    omega = [V0] * nb
    v_com = [V0] * nb
    tvs_b = [V0] * nb
    wxs_b = [V0] * nb
    for b in range(1, nb):
        om, tvs, wxs = V0, V0, V0
        for k in range(nv):
            if bm[k, b]:
                om = _vadd(om, wv[k])
                tvs = _vadd(tvs, tv[k])
                wxs = _vadd(wxs, wxc[k])
        omega[b] = om
        tvs_b[b] = tvs
        wxs_b[b] = wxs
        v_com[b] = _vadd(tvs, _vsub(_cross(om, x_com[b]), wxs))

    # Per-dof predecessor twists (precedence mask) → screw derivatives.
    tdv = [V0] * nv
    wdv = [V0] * nv
    wv_x_vc = [V0] * nv  # w_k × v_pre(c_k), the transport term
    for k in range(nv):
        om, tvs, wxs = V0, V0, V0
        any_pre = False
        for k2 in range(nv):
            if prec[k2, k]:
                any_pre = True
                om = _vadd(om, wv[k2])
                tvs = _vadd(tvs, tv[k2])
                wxs = _vadd(wxs, wxc[k2])
        if not any_pre:
            continue
        vc = _vadd(tvs, _vsub(_cross(om, c[k]), wxs))
        tdv[k] = _cross(om, tv[k])
        wdv[k] = _cross(om, wv[k])
        wv_x_vc[k] = _cross(wv[k], vc)

    # Bias accelerations per body (qdd = 0).
    a_com = [V0] * nb
    omega_dot = [V0] * nb
    for b in range(1, nb):
        td_s, wd_s, wdxc_s, wvc_s = V0, V0, V0, V0
        for k in range(nv):
            if bm[k, b]:
                td_s = _vadd(td_s, tdv[k])
                wd_s = _vadd(wd_s, wdv[k])
                wdxc_s = _vadd(wdxc_s, _cross(wdv[k], c[k]))
                wvc_s = _vadd(wvc_s, wv_x_vc[k])
        omega_dot[b] = wd_s
        a_com[b] = _vadd(
            _vadd(td_s, _vsub(_cross(wd_s, x_com[b]), wdxc_s)),
            _vsub(_cross(omega[b], v_com[b]), wvc_s),
        )

    # Jacobian columns for masked (dof, body) pairs (Jr[(k,b)] is just
    # w[k]; used directly below).
    Jp = {}
    for k in range(nv):
        for b in range(1, nb):
            if not bm[k, b]:
                continue
            Jp[(k, b)] = _vadd(t[k], _cross(w[k], _vsub(x_com[b], c[k])))

    g = tuple(float(v) for v in model.gravity)

    # Net wrench per body about its CoM: bias forces f = m(a−g),
    # t = Iω̇ + ω×Iω MINUS applied (contact, fluid) forces.  Everything is
    # projected to joint space in ONE masked loop at the end — applied
    # point forces fold in as (f, (p − x_com)×f) resultants, so contacts
    # cost O(nc) instead of O(nc · nv).
    f_b = [None] * nb
    t_b = [None] * nb
    for b in range(1, nb):
        m_b = float(model.body_mass[b])
        if m_b == 0.0:
            continue
        f_b[b] = _vscale(m_b, _vsub(a_com[b], g))
        Iom = _mv(Iw[b], omega[b])
        t_b[b] = _vadd(_mv(Iw[b], omega_dot[b]), _cross(omega[b], Iom))

    # Mass matrix (lower triangle; bm rows share a chain so the pair mask
    # is the elementwise AND).  I_w·w_j is hoisted per (dof, body).
    Iww = {}
    for j in range(nv):
        for b in range(1, nb):
            if bm[j, b] and Iw[b] is not None:
                Iww[(j, b)] = _mv(Iw[b], w[j])
    M = [[None] * nv for _ in range(nv)]
    for i in range(nv):
        for j in range(i + 1):
            acc = 0.0
            for b in range(1, nb):
                if bm[i, b] and bm[j, b] and f_b[b] is not None:
                    m_b = float(model.body_mass[b])
                    acc = _add(acc, _mul(m_b, _dot(Jp[(i, b)], Jp[(j, b)])))
                    acc = _add(acc, _dot(w[i], Iww[(j, b)]))
            if i == j:
                acc = _add(acc, float(model.dof_armature[i]))
                # Keep the diagonal traced even for massless chains.
                if _isconst(acc):
                    acc = acc + jnp.zeros_like(qd[i])
            elif _isconst(acc):
                acc = 0.0 if acc == 0.0 else float(acc)
            M[i][j] = acc

    # Contact penalty forces (ground plane) → per-body resultants.
    for ci in range(len(model.con_body)):
        b = int(model.con_body[ci])
        local = tuple(float(v) for v in model.con_pos[ci])
        center = _vadd(ps[b], _mv(Rs[b], local))
        # Contact point velocity from the body twist (the contact mask
        # column equals the body-mask column of its body).
        v_con = _vadd(
            tvs_b[b], _vsub(_cross(omega[b], center), wxs_b[b])
        )
        pen = _sub(float(model.con_radius[ci]), center[2])
        fn = jnp.where(
            pen > 0, _sub(_mul(contact.kp, pen), _mul(contact.kd, v_con[2])), 0.0
        )
        fn = jnp.maximum(fn, 0.0)
        mu = float(model.con_friction[ci]) * contact.mu_scale
        vt_norm = jnp.sqrt(_add(_mul(v_con[0], v_con[0]), _mul(v_con[1], v_con[1])))
        scale = jnp.tanh(vt_norm / contact.vs)
        coef = _mul(_mul(mu, fn), scale) / (vt_norm + 1e-9)
        force = (_mul(-coef, v_con[0]), _mul(-coef, v_con[1]), fn)
        if f_b[b] is None:  # massless body carrying a contact geom
            f_b[b], t_b[b] = V0, V0
        f_b[b] = _vsub(f_b[b], force)
        t_b[b] = _vsub(
            t_b[b], _cross(_vsub(center, x_com[b]), force)
        )

    # Passive joint springs + soft limits (klim = 300, as dynamics.py).
    tau_pas = [0.0] * nv
    st = dof_structure(model)
    for idx in range(len(st.hs_qadr)):
        qa, da = int(st.hs_qadr[idx]), int(st.hs_dadr[idx])
        stiff = float(st.hs_stiffness[idx])
        term = 0.0
        if stiff != 0.0:
            term = _mul(-stiff, _sub(q[qa], float(st.hs_springref[idx])))
        if bool(st.hs_limited[idx]):
            below = jnp.minimum(_sub(q[qa], float(st.hs_lo[idx])), 0.0)
            above = jnp.maximum(_sub(q[qa], float(st.hs_hi[idx])), 0.0)
            term = _add(term, _mul(-300.0, _add(below, above)))
        tau_pas[da] = _add(tau_pas[da], term)

    # Actuators (moment rows: joint motors and fixed-tendon transmission).
    tau_act = [0.0] * nv
    for a in range(model.nu):
        lo, hi = float(st.act_lo[a]), float(st.act_hi[a])
        u = ctrl[a]
        if np.isfinite(lo):
            u = jnp.maximum(u, lo)
        if np.isfinite(hi):
            u = jnp.minimum(u, hi)
        for dadr, coef in st.act_moments[a]:
            tau_act[dadr] = _add(tau_act[dadr], _mul(coef, u))
    # Affine-bias servos: force = gain·ctrl + b1·len + b2·vel.
    for a, gain, b1, b2, rows in getattr(st, "act_affine", ()):
        lo, hi = float(st.act_lo[a]), float(st.act_hi[a])
        u = ctrl[a]
        if np.isfinite(lo):
            u = jnp.maximum(u, lo)
        if np.isfinite(hi):
            u = jnp.minimum(u, hi)
        length = 0.0
        vel = 0.0
        for qadr, dadr, coef in rows:
            length = _add(length, _mul(coef, q[qadr]))
            vel = _add(vel, _mul(coef, qd[dadr]))
        f = _add(_mul(gain, u), _add(_mul(b1, length), _mul(b2, vel)))
        for _qadr, dadr, coef in rows:
            tau_act[dadr] = _add(tau_act[dadr], _mul(coef, f))

    # Fixed-tendon springs/dampers.
    for ti, triples in enumerate(model.ten_fixed):
        kk = float(model.ten_fixed_stiffness[ti])
        dd = float(model.ten_fixed_damping[ti])
        if kk == 0.0 and dd == 0.0:
            continue
        length = 0.0
        vel = 0.0
        for qadr, dadr, coef in triples:
            length = _add(length, _mul(coef, q[qadr]))
            vel = _add(vel, _mul(coef, qd[dadr]))
        f = _sub(
            _mul(-kk, _sub(length, float(model.ten_fixed_springlen[ti]))),
            _mul(dd, vel),
        )
        for qadr, dadr, coef in triples:
            tau_pas[dadr] = _add(tau_pas[dadr], _mul(coef, f))

    # Spatial tendon limits (site-to-site strings) → body resultants.
    if (
        model.ten_spatial_sites is not None
        and len(model.ten_spatial_sites)
        and bool(model.ten_spatial_limited.any())
    ):
        for ti in range(len(model.ten_spatial_sites)):
            if not bool(model.ten_spatial_limited[ti]):
                continue
            sa, sb_ = (int(v) for v in model.ten_spatial_sites[ti])
            ba = int(model.site_body[sa])
            bb = int(model.site_body[sb_])
            xa = _vadd(
                ps[ba],
                _mv(Rs[ba], tuple(float(v) for v in model.site_pos[sa])),
            )
            xb = _vadd(
                ps[bb],
                _mv(Rs[bb], tuple(float(v) for v in model.site_pos[sb_])),
            )
            diff = _vsub(xa, xb)
            length = jnp.sqrt(_dot(diff, diff)) + 1e-9
            u_dir = tuple(d / length for d in diff)
            lo, hi = (float(v) for v in model.ten_spatial_range[ti])
            over = jnp.maximum(length - hi, 0.0)
            under = jnp.maximum(lo - length, 0.0)
            active = (over > 0) | (under > 0)
            va = _vadd(
                tvs_b[ba], _vsub(_cross(omega[ba], xa), wxs_b[ba])
            )
            vb = _vadd(
                tvs_b[bb], _vsub(_cross(omega[bb], xb), wxs_b[bb])
            )
            ldot = _dot(u_dir, _vsub(va, vb))
            f_mag = jnp.where(
                active,
                -contact.ten_kp * (over - under) - contact.ten_kd * ldot,
                0.0,
            )
            F_a = _vscale(f_mag, u_dir)
            for b_, x_, F_ in ((ba, xa, F_a), (bb, xb, _vscale(-1.0, F_a))):
                if f_b[b_] is None:
                    f_b[b_], t_b[b_] = V0, V0
                f_b[b_] = _vsub(f_b[b_], F_)
                t_b[b_] = _vsub(t_b[b_], _cross(_vsub(x_, x_com[b_]), F_))

    # Body-body pair contacts (opt-in; mirrors dynamics._pair_contact_tau).
    if (
        getattr(contact, "pairs", False)
        and model.pair_body is not None
        and len(model.pair_body)
    ):
        for p in range(len(model.pair_body)):
            ba, bb = (int(v) for v in model.pair_body[p])
            ra, rb = (float(v) for v in model.pair_radius[p])
            sa = model.pair_seg_a[p]
            sb = model.pair_seg_b[p]
            a0 = _vadd(ps[ba], _mv(Rs[ba], tuple(float(v) for v in sa[0])))
            a1 = _vadd(ps[ba], _mv(Rs[ba], tuple(float(v) for v in sa[1])))
            b0 = _vadd(ps[bb], _mv(Rs[bb], tuple(float(v) for v in sb[0])))
            b1 = _vadd(ps[bb], _mv(Rs[bb], tuple(float(v) for v in sb[1])))
            d1v = _vsub(a1, a0)
            d2v = _vsub(b1, b0)
            rv = _vsub(a0, b0)
            a_ = _add(_dot(d1v, d1v), 1e-12)
            e_ = _add(_dot(d2v, d2v), 1e-12)
            f_ = _dot(d2v, rv)
            c_ = _dot(d1v, rv)
            b_ = _dot(d1v, d2v)
            denom = _sub(_mul(a_, e_), _mul(b_, b_))
            s_par = jnp.where(
                denom > 1e-12,
                jnp.clip((_sub(_mul(b_, f_), _mul(c_, e_))) / denom, 0.0, 1.0),
                0.0,
            )
            t_par = (_add(_mul(b_, s_par), f_)) / e_
            s_par = jnp.where(
                t_par < 0.0,
                jnp.clip(-c_ / a_, 0.0, 1.0),
                jnp.where(
                    t_par > 1.0,
                    jnp.clip((_sub(b_, c_)) / a_, 0.0, 1.0),
                    s_par,
                ),
            )
            t_par = jnp.clip(t_par, 0.0, 1.0)
            pa = _vadd(a0, _vscale(s_par, d1v))
            pb = _vadd(b0, _vscale(t_par, d2v))
            delta = _vsub(pa, pb)
            dist = jnp.sqrt(_dot(delta, delta)) + 1e-9
            n_dir = tuple(d / dist for d in delta)
            pen = _sub(ra + rb, dist)
            va = _vadd(tvs_b[ba], _vsub(_cross(omega[ba], pa), wxs_b[ba]))
            vb = _vadd(tvs_b[bb], _vsub(_cross(omega[bb], pb), wxs_b[bb]))
            v_rel = _vsub(va, vb)
            vn = _dot(v_rel, n_dir)
            fn = jnp.where(
                pen > 0, contact.pair_kp * pen - contact.pair_kd * vn, 0.0
            )
            fn = jnp.maximum(fn, 0.0)
            vt = _vsub(v_rel, _vscale(vn, n_dir))
            vt_norm = jnp.sqrt(_dot(vt, vt)) + 1e-9
            mu = float(model.pair_friction[p]) * contact.mu_scale
            coef = mu * fn * jnp.tanh(vt_norm / contact.vs) / vt_norm
            F_a = tuple(
                _add(_mul(fn, n_dir[i]), _mul(-coef, vt[i])) for i in range(3)
            )
            for b2, x2, F2 in ((ba, pa, F_a), (bb, pb, _vscale(-1.0, F_a))):
                if f_b[b2] is None:
                    f_b[b2], t_b[b2] = V0, V0
                f_b[b2] = _vsub(f_b[b2], F2)
                t_b[b2] = _vsub(t_b[b2], _cross(_vsub(x2, x_com[b2]), F2))

    # Fluid drag (swimmer models) folds into the body wrenches too.
    if model.density > 0 or model.viscosity > 0:
        _fluid_scalar(model, Rs, v_com, omega, f_b, t_b)

    # Single joint-space projection of the net body wrenches.
    tau = [0.0] * nv
    for k in range(nv):
        acc = _add(tau_act[k], tau_pas[k])
        acc = _sub(acc, _mul(float(model.dof_damping[k]), qd[k]))
        for b in range(1, nb):
            if bm[k, b] and f_b[b] is not None:
                acc = _sub(acc, _dot(f_b[b], Jp[(k, b)]))
                acc = _sub(acc, _dot(t_b[b], w[k]))
        tau[k] = acc

    return M, tau


def _fluid_scalar(model, Rs, v_com, omega, f_b, t_b):
    """MuJoCo legacy inertia-box fluid drag; mirrors dynamics._fluid_shared.

    Accumulates the drag wrench (about each body CoM) into the net body
    wrenches ``f_b``/``t_b`` (sign: f_b holds bias − applied forces).
    """
    nb = model.nbody
    inertia = np.asarray(model.body_inertia, np.float64)
    mass = np.asarray(model.body_mass, np.float64)
    s_np = inertia.sum(axis=1, keepdims=True) - 2 * inertia
    box = np.sqrt(
        np.maximum(1e-10, s_np / np.maximum(mass[:, None], 1e-12) * 6.0)
    )
    for b in range(1, nb):
        if mass[b] == 0.0:
            continue
        Ri_l = _quat2mat(tuple(float(v) for v in model.body_iquat[b]))
        Rw = _mm(Rs[b], Ri_l)  # ximat
        lin = _mtv(Rw, v_com[b])
        ang = _mtv(Rw, omega[b])
        f_l, t_l = [0.0] * 3, [0.0] * 3
        bx = box[b]
        if model.viscosity > 0:
            diam = float(bx.mean())
            kf = -3.0 * np.pi * diam * model.viscosity
            kt = -np.pi * diam**3 * model.viscosity
            for i in range(3):
                f_l[i] = _add(f_l[i], _mul(kf, lin[i]))
                t_l[i] = _add(t_l[i], _mul(kt, ang[i]))
        if model.density > 0:
            for i in range(3):
                b1, b2 = float(bx[(i + 1) % 3]), float(bx[(i + 2) % 3])
                kf = -0.5 * model.density * b1 * b2
                kt = -model.density * float(bx[i]) * (b1**4 + b2**4) / 64.0
                f_l[i] = _add(f_l[i], _mul(kf, _mul(jnp.abs(lin[i]), lin[i])))
                t_l[i] = _add(t_l[i], _mul(kt, _mul(jnp.abs(ang[i]), ang[i])))
        f_w = _mv(Rw, tuple(f_l))
        t_w = _mv(Rw, tuple(t_l))
        f_b[b] = _vsub(f_b[b], f_w)
        t_b[b] = _vsub(t_b[b], t_w)


def _limit_damping(model, q, M):
    """Critical damping of the joint-limit spring while violated (Euler)."""
    st = dof_structure(model)
    d_lim = [0.0] * model.nv
    for idx in range(len(st.hs_qadr)):
        if not bool(st.hs_limited[idx]):
            continue
        qa, da = int(st.hs_qadr[idx]), int(st.hs_dadr[idx])
        out = (q[qa] < float(st.hs_lo[idx])) | (q[qa] > float(st.hs_hi[idx]))
        d_lim[da] = jnp.where(
            out, 2.0 * jnp.sqrt(300.0 * M[da][da]), 0.0
        )
    return d_lim


def _integrate_qpos_scalar(model, q, qd, h):
    """q ⊕ h·qd with quaternion exponential map for free joints."""
    s = dof_structure(model)
    out = list(q)
    for i in range(len(s.nonfree_qadr)):
        qa, da = int(s.nonfree_qadr[i]), int(s.nonfree_dadr[i])
        out[qa] = q[qa] + h * qd[da]
    for qadr, dadr in s.free_jnts:
        for i in range(3):
            out[qadr + i] = q[qadr + i] + h * qd[dadr + i]
        om = (qd[dadr + 3], qd[dadr + 4], qd[dadr + 5])
        nrm = jnp.sqrt(
            _add(_add(_mul(om[0], om[0]), _mul(om[1], om[1])), _mul(om[2], om[2]))
        )
        angle = nrm * h
        half = angle / 2
        sc = jnp.sin(half) / (nrm + 1e-12)
        dq = (jnp.cos(half), om[0] * sc, om[1] * sc, om[2] * sc)
        quat = (q[qadr + 3], q[qadr + 4], q[qadr + 5], q[qadr + 6])
        new = _quat_mul(quat, dq)
        qn = jnp.sqrt(
            _add(
                _add(_mul(new[0], new[0]), _mul(new[1], new[1])),
                _add(_mul(new[2], new[2]), _mul(new[3], new[3])),
            )
        )
        for i in range(4):
            out[qadr + 3 + i] = new[i] / qn
    return out


def _forward_scalar(model, q, qd, ctrl, contact):
    M, tau = _smooth_scalar(model, q, qd, ctrl, contact)
    return _chol_solve(M, tau)


def unroll_cost(model: PhysModel) -> int:
    """Rough emitted-op proxy deciding whether unrolling is sane.

    RK4 compiles a single dynamics eval (4-stage ``lax.scan``), so the
    integrator no longer multiplies the cost.  Dominant terms: mass-matrix
    pairs, the Cholesky (nv³/3), masked projections, and per-contact force
    assembly.
    """
    s = dof_structure(model)
    pairs = int((s.body_mask[:, None, :] * s.body_mask[None, :, :]).sum())
    return (
        pairs * 6
        + model.nv**3 // 3
        + model.nv * model.nbody * 12
        + len(model.con_body) * 60
    )


def step_batched(
    model: PhysModel,
    qpos: jax.Array,
    qvel: jax.Array,
    ctrl: jax.Array,
    substeps: int = 1,
    contact=None,
    nsteps: int = 1,
):
    """Batched [N, ·] physics step, lane-parallel scalar form.

    Drop-in batched equivalent of ``dynamics.step`` (same integrator
    selection, implicit joint damping, RK4) for use under the pool's vmap.
    """
    from .dynamics import ContactParams

    if contact is None:
        contact = ContactParams()
    h = model.timestep / substeps
    nv, nq = model.nv, model.nq
    q0 = [qpos[:, i] for i in range(nq)]
    qd0 = [qvel[:, i] for i in range(nv)]
    u = [ctrl[:, i] for i in range(model.nu)]

    def euler(q, qd):
        M, tau = _smooth_scalar(model, q, qd, u, contact)
        d_lim = _limit_damping(model, q, M)
        for k in range(nv):
            damp = float(model.dof_damping[k])
            M[k][k] = M[k][k] + h * (damp + d_lim[k])
            if not _isconst(d_lim[k]):
                tau[k] = tau[k] - d_lim[k] * qd[k]
        qacc = _chol_solve(M, tau)
        qd_new = [qd[k] + h * qacc[k] for k in range(nv)]
        q_new = _integrate_qpos_scalar(model, q, qd_new, h)
        return q_new, qd_new

    def rk4(q, qd):
        # Classic RK4, rolled into a 4-stage lax.scan so the compiled
        # graph contains ONE dynamics evaluation (compile time for
        # contact-rich models would otherwise quadruple).  Stage i uses
        # q_i = q ⊕ h·c_i·qd_{i−1},  qd_i = qd + h·c_i·a_{i−1} — identical
        # math to the unrolled form in dynamics._step_impl.
        zeros = jnp.zeros_like(qd[0])
        zero_v = tuple(zeros for _ in range(nv))
        cs = jnp.asarray([0.0, 0.5, 0.5, 1.0], qpos.dtype)
        wts = jnp.asarray([1.0, 2.0, 2.0, 1.0], qpos.dtype)

        def stage(carry, cw):
            qd_prev, a_prev, acc_qd, acc_a = carry
            ci, wi = cw
            hc = h * ci
            q_i = _integrate_qpos_scalar(model, q, qd_prev, hc)
            qd_i = tuple(qd[k] + hc * a_prev[k] for k in range(nv))
            a_i = tuple(_forward_scalar(model, q_i, qd_i, u, contact))
            acc_qd = tuple(acc_qd[k] + wi * qd_i[k] for k in range(nv))
            acc_a = tuple(acc_a[k] + wi * a_i[k] for k in range(nv))
            return (qd_i, a_i, acc_qd, acc_a), None

        (_, _, acc_qd, acc_a), _ = jax.lax.scan(
            stage, (tuple(qd), zero_v, zero_v, zero_v), (cs, wts)
        )
        qd_avg = [acc_qd[k] / 6 for k in range(nv)]
        qacc = [acc_a[k] / 6 for k in range(nv)]
        q_new = _integrate_qpos_scalar(model, q, qd_avg, h)
        qd_new = [qd[k] + h * qacc[k] for k in range(nv)]
        return q_new, qd_new

    stepper = rk4 if model.integrator == 1 else euler

    def body(_, carry):
        q = list(carry[:nq])
        qd = list(carry[nq:])
        q_new, qd_new = stepper(q, qd)
        return tuple(q_new) + tuple(qd_new)

    carry = jax.lax.fori_loop(
        0, nsteps * substeps, body, tuple(q0) + tuple(qd0)
    )
    qpos_out = jnp.stack(carry[:nq], axis=1)
    qvel_out = jnp.stack(carry[nq:], axis=1)
    return qpos_out, qvel_out
