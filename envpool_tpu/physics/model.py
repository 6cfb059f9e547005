"""Physics model: static description extracted from an MJCF model.

The reference steps real MuJoCo on CPU worker threads
(``envpool/mujoco/gym/mujoco_env.h:45-267``).  The TPU-native engine
(``envpool_tpu/physics``) re-implements rigid-body dynamics as pure JAX over
generalized coordinates; this module only *extracts the constants* (masses,
joint tree, geoms, actuators) from the MJCF XML using the host-side
``mujoco`` bindings — the simulation itself never calls MuJoCo.

Supported joint types: free (3 translation + quaternion), hinge, slide —
enough for the Gym locomotion suite.  Contacts are geom-vs-ground-plane
(sphere and capsule geoms contribute endpoint spheres).
"""

from __future__ import annotations

import dataclasses

import numpy as np

# MuJoCo joint type enum values (mjtJoint).
FREE, BALL, SLIDE, HINGE = 0, 1, 2, 3


@dataclasses.dataclass(frozen=True)
class PhysModel:
    """Static (numpy) model constants; hashable by id for jit closures."""

    nq: int
    nv: int
    nu: int
    nbody: int

    # Per body (index 0 is the world).
    body_parent: np.ndarray    # [nb] int
    body_pos: np.ndarray       # [nb, 3] frame offset in parent frame
    body_quat: np.ndarray      # [nb, 4] frame rotation in parent frame
    body_mass: np.ndarray      # [nb]
    body_inertia: np.ndarray   # [nb, 3] diagonal inertia in inertial frame
    body_ipos: np.ndarray      # [nb, 3] CoM offset in body frame
    body_iquat: np.ndarray     # [nb, 4] inertial frame rotation

    # Per joint, in model order (joints of a body apply in sequence).
    jnt_type: np.ndarray       # [nj] int
    jnt_body: np.ndarray       # [nj] body the joint moves
    jnt_axis: np.ndarray       # [nj, 3]
    jnt_pos: np.ndarray        # [nj, 3] anchor in body frame
    jnt_qposadr: np.ndarray    # [nj]
    jnt_dofadr: np.ndarray     # [nj]
    jnt_range: np.ndarray      # [nj, 2]
    jnt_limited: np.ndarray    # [nj] bool
    jnt_stiffness: np.ndarray  # [nj]
    qpos_spring: np.ndarray    # [nq] spring reference

    # Per dof.
    dof_damping: np.ndarray    # [nv]
    dof_armature: np.ndarray   # [nv]

    # Actuators (motor/general on joints).
    act_trnid: np.ndarray      # [nu] joint id
    act_gear: np.ndarray       # [nu]
    act_ctrlrange: np.ndarray  # [nu, 2]
    act_ctrllimited: np.ndarray  # [nu] bool

    # Contact geoms vs ground plane: contributing spheres.
    con_body: np.ndarray       # [nc] body id
    con_pos: np.ndarray        # [nc, 3] sphere center in body frame
    con_radius: np.ndarray     # [nc]
    con_friction: np.ndarray   # [nc] sliding friction coefficient

    # Sites (for fingertip/tip observations).
    site_body: np.ndarray      # [ns] body id
    site_pos: np.ndarray       # [ns, 3] offset in body frame
    site_names: tuple          # [ns] str
    body_names: tuple          # [nb] str

    # Options.
    timestep: float
    gravity: np.ndarray        # [3]
    density: float             # fluid density (inertia-box drag model)
    viscosity: float           # fluid viscosity
    qpos0: np.ndarray          # [nq] default pose
    integrator: int            # 0 = Euler (implicit damping), 1 = RK4

    # Actuator gain (MuJoCo gainprm[0]; force = gear · gain · ctrl for
    # fixed-gain motors/general actuators) and transmission type
    # (0 = joint, 3 = tendon; mjtTrn).
    act_gain: np.ndarray = None       # [nu]
    act_trntype: np.ndarray = None    # [nu]
    # Affine bias (mjBIAS_AFFINE, position servos):
    # force = gain·ctrl + biasprm[1]·length + biasprm[2]·velocity.
    act_biastype: np.ndarray = None   # [nu] (0 none, 1 affine)
    act_biasprm: np.ndarray = None    # [nu, 3]
    # First-order activation filter (mjDYN_FILTER/FILTEREXACT/MUSCLE):
    # act' = (ctrl - act)/tau.  Integrated analytically per control step
    # at the env layer (documented approximation).
    act_dyntype: np.ndarray = None    # [nu] (0 none, 2/3 filter, 4 muscle)
    act_dynprm: np.ndarray = None     # [nu] tau

    # Raw geom tables (for the device rasterizer / from_pixels path).
    geom_body: np.ndarray = None   # [ng] body id
    geom_type: np.ndarray = None   # [ng] mjtGeom
    geom_size: np.ndarray = None   # [ng, 3]
    geom_pos: np.ndarray = None    # [ng, 3] body-frame offset
    geom_quat: np.ndarray = None   # [ng, 4]
    geom_rgba: np.ndarray = None   # [ng, 4]

    # Fixed tendons: length = Σ coef_j · qpos[j] over hinge/slide joints.
    # Per tendon: tuple of (qposadr, dofadr, coef) triples, plus passive
    # spring/damping constants (MuJoCo tendon_stiffness/damping applied to
    # the tendon length/velocity, mapped back through the coefs).
    ten_fixed: tuple = ()             # ((qadr, dadr, coef), ...) per tendon
    ten_fixed_stiffness: np.ndarray = None  # [nt_fixed]
    ten_fixed_damping: np.ndarray = None    # [nt_fixed]
    ten_fixed_springlen: np.ndarray = None  # [nt_fixed]

    # Spatial tendons (site-to-site strings): limit-range penalty only
    # (MuJoCo routes these through the constraint solver; the penalty
    # mirrors the ground-contact approximation).
    ten_spatial_sites: np.ndarray = None    # [nt_sp, 2] site ids
    ten_spatial_range: np.ndarray = None    # [nt_sp, 2]
    ten_spatial_limited: np.ndarray = None  # [nt_sp] bool
    ten_spatial_stiffness: np.ndarray = None  # [nt_sp]
    ten_spatial_damping: np.ndarray = None    # [nt_sp]

    # Body-body contact pairs: sphere/capsule geoms on different bodies
    # that pass MuJoCo's collision filter.  Each geom is a segment
    # (p0 == p1 for spheres) + radius in its body frame.
    pair_body: np.ndarray = None      # [np, 2] body ids (a, b)
    pair_seg_a: np.ndarray = None     # [np, 2, 3] local endpoints of a
    pair_seg_b: np.ndarray = None     # [np, 2, 3]
    pair_radius: np.ndarray = None    # [np, 2] radii (a, b)
    pair_friction: np.ndarray = None  # [np] sliding friction

    # Constraint-solver parameters (the ``solver="mujoco"`` contact path):
    # per-contact solref/solimp mixed per mj_contactParam (geom ⊕ plane),
    # MuJoCo's diagApprox row weight, contact margin; per-joint limit
    # solref/solimp; per-dof inverse weight (dof_invweight0).
    con_solref: np.ndarray = None     # [nc, 2] (timeconst, dampratio)
    con_solimp: np.ndarray = None     # [nc, 5] (dmin,dmax,width,mid,power)
    con_invw: np.ndarray = None       # [nc] diagApprox of the facet rows
    con_margin: np.ndarray = None     # [nc]
    con_axis: np.ndarray = None       # [nc, 3] capsule axis (0 = none)
    jnt_solref_lim: np.ndarray = None  # [nj, 2]
    jnt_solimp_lim: np.ndarray = None  # [nj, 5]
    jnt_margin: np.ndarray = None     # [nj]
    dof_invweight: np.ndarray = None  # [nv] dof_invweight0

    def __hash__(self) -> int:  # jit static-arg friendliness
        return id(self)

    def __eq__(self, other) -> bool:
        return self is other


def from_mjcf(xml_path: str) -> PhysModel:
    """Extract a PhysModel from an MJCF file via host-side mujoco."""
    import mujoco

    m = mujoco.MjModel.from_xml_path(xml_path)
    return from_mj_model(m)


def from_mj_model(m) -> PhysModel:
    """Extract from a loaded ``mujoco.MjModel``."""
    import mujoco

    for j in range(m.njnt):
        if m.jnt_type[j] == BALL and m.jnt_limited[j]:
            raise NotImplementedError(
                "ball-joint limits not supported (cone limits need the "
                "rotation-angle constraint row)"
            )

    # Ground-contact spheres from sphere/capsule geoms on moving bodies.
    # Contacts exist only against a world-attached plane geom, honoring
    # contype/conaffinity masks and the global contact-disable flag
    # (e.g. inverted_pendulum.xml has no floor: no contacts at all).
    contacts_enabled = not (
        m.opt.disableflags & mujoco.mjtDisableBit.mjDSBL_CONTACT
    )
    planes = [
        g
        for g in range(m.ngeom)
        if m.geom_bodyid[g] == 0
        and m.geom_type[g] == int(mujoco.mjtGeom.mjGEOM_PLANE)
    ]
    plane_contype = int(m.geom_contype[planes[0]]) if planes else 0
    plane_conaffinity = int(m.geom_conaffinity[planes[0]]) if planes else 0

    con_body, con_pos, con_radius, con_fric = [], [], [], []
    con_solref, con_solimp, con_invw, con_margin = [], [], [], []
    con_axis = []

    def _mix_solparams(g, p):
        """mj_contactParam: priority override, else solmix-weighted mix;
        friction/margin combine elementwise-max."""
        pr_g, pr_p = int(m.geom_priority[g]), int(m.geom_priority[p])
        if pr_g != pr_p:
            src = g if pr_g > pr_p else p
            return m.geom_solref[src].copy(), m.geom_solimp[src].copy()
        s1, s2 = float(m.geom_solmix[g]), float(m.geom_solmix[p])
        if s1 > 0 and s2 > 0:
            w1 = s1 / (s1 + s2)
        elif s1 == 0 and s2 == 0:
            w1 = 0.5
        else:
            w1 = 0.0 if s1 == 0 else 1.0
        solref = w1 * m.geom_solref[g] + (1 - w1) * m.geom_solref[p]
        solimp = w1 * m.geom_solimp[g] + (1 - w1) * m.geom_solimp[p]
        return solref, solimp

    for g in range(m.ngeom):
        b = int(m.geom_bodyid[g])
        if b == 0 or not planes or not contacts_enabled:
            continue
        compatible = (int(m.geom_contype[g]) & plane_conaffinity) or (
            plane_contype & int(m.geom_conaffinity[g])
        )
        if not compatible:
            continue
        gtype = int(m.geom_type[g])
        size = m.geom_size[g]
        pos = m.geom_pos[g]
        quat = m.geom_quat[g]
        # Contact friction combines per mj_contactParam: the higher-
        # priority geom wins outright, else elementwise max.
        pr_g = int(m.geom_priority[g])
        pr_p = int(m.geom_priority[planes[0]])
        if pr_g != pr_p:
            fric = float(
                m.geom_friction[g if pr_g > pr_p else planes[0]][0]
            )
        else:
            fric = max(
                float(m.geom_friction[g][0]),
                float(m.geom_friction[planes[0]][0]),
            )
        solref, solimp = _mix_solparams(g, planes[0])
        # Contact margin is the SUM of the two geoms' margins (observed:
        # ant.xml margin 0.01+0.01 → includemargin 0.02).
        margin = (
            float(m.geom_margin[g]) + float(m.geom_margin[planes[0]])
        )
        # diagApprox of one pyramid facet row:
        #   Σ body translational invweight0 · 2μ²(1+μ²) / impratio
        # with μ the combined contact friction — identified numerically
        # against efc_diagA over (μ, impratio) sweeps of plane-sphere
        # probes and confirmed on the articulated gym models.
        invw = (
            float(m.body_invweight0[b][0])
            * 2.0 * fric**2 * (1.0 + fric**2)
            / max(float(m.opt.impratio), 1e-12)
        )

        def _add(p_local, radius, axis=None, b=b, fric=fric, solref=solref,
                 solimp=solimp, margin=margin, invw=invw):
            con_body.append(b)
            con_pos.append(np.asarray(p_local, np.float64))
            con_radius.append(float(radius))
            con_fric.append(fric)
            con_solref.append(np.asarray(solref, np.float64))
            con_solimp.append(np.asarray(solimp, np.float64))
            con_margin.append(margin)
            con_invw.append(invw)
            con_axis.append(
                np.zeros(3) if axis is None else np.asarray(axis, np.float64)
            )

        if gtype == int(mujoco.mjtGeom.mjGEOM_SPHERE):
            _add(pos.copy(), size[0])
        elif gtype == int(mujoco.mjtGeom.mjGEOM_CAPSULE):
            # Endpoint spheres at ±half-length along the local z axis.
            # The capsule's body-frame axis is kept: MuJoCo's plane-capsule
            # contact frame aligns tangent 1 with the capsule axis
            # projected onto the plane (anisotropic friction pyramid).
            half = float(size[1])
            zdir = _quat_rotate_np(quat, np.array([0.0, 0.0, 1.0]))
            for sgn in (-1.0, 1.0):
                _add(pos + sgn * half * zdir, size[0], axis=zdir)
        elif gtype == int(mujoco.mjtGeom.mjGEOM_BOX):
            # Corner point contacts (radius 0): the standard
            # corner-sphere approximation of box-plane contact (so
            # stacker/manipulator boxes rest stably on the floor).
            for sx in (-1.0, 1.0):
                for sy in (-1.0, 1.0):
                    for sz in (-1.0, 1.0):
                        corner = np.array(
                            [sx * size[0], sy * size[1], sz * size[2]]
                        )
                        _add(pos + _quat_rotate_np(quat, corner), 0.0)
        # Ellipsoids/planes/other types: skipped (not needed for the suite).

    # Body-body contact pairs (sphere/capsule only), following MuJoCo's
    # default broadphase filter: contype/conaffinity compatibility,
    # different bodies, parent-child excluded unless the parent is the
    # world (engine_collision_driver.c mj_collision filterparent).
    def _segment(g):
        gtype = int(m.geom_type[g])
        pos = m.geom_pos[g].copy()
        if gtype == int(mujoco.mjtGeom.mjGEOM_SPHERE):
            return np.stack([pos, pos]), float(m.geom_size[g][0])
        if gtype == int(mujoco.mjtGeom.mjGEOM_CAPSULE):
            half = float(m.geom_size[g][1])
            zdir = _quat_rotate_np(m.geom_quat[g], np.array([0.0, 0.0, 1.0]))
            return (
                np.stack([pos - half * zdir, pos + half * zdir]),
                float(m.geom_size[g][0]),
            )
        return None, None

    pair_body, pair_sa, pair_sb, pair_rad, pair_fric = [], [], [], [], []
    if contacts_enabled:
        for g1 in range(m.ngeom):
            s1, r1 = _segment(g1)
            if s1 is None:
                continue
            b1 = int(m.geom_bodyid[g1])
            if b1 == 0:
                continue
            for g2 in range(g1 + 1, m.ngeom):
                s2, r2 = _segment(g2)
                if s2 is None:
                    continue
                b2 = int(m.geom_bodyid[g2])
                if b2 == 0 or b1 == b2:
                    continue
                compat = (
                    int(m.geom_contype[g1]) & int(m.geom_conaffinity[g2])
                ) or (int(m.geom_contype[g2]) & int(m.geom_conaffinity[g1]))
                if not compat:
                    continue
                # filterparent: skip parent-child body pairs.
                if (
                    int(m.body_parentid[b1]) == b2
                    or int(m.body_parentid[b2]) == b1
                ):
                    continue
                pair_body.append([b1, b2])
                pair_sa.append(s1)
                pair_sb.append(s2)
                pair_rad.append([r1, r2])
                pair_fric.append(
                    max(float(m.geom_friction[g1][0]),
                        float(m.geom_friction[g2][0]))
                )

    act_trnid = (
        m.actuator_trnid[:, 0].copy()
        if m.nu
        else np.zeros(0, np.int32)
    )
    act_gear = m.actuator_gear[:, 0].copy() if m.nu else np.zeros(0)
    act_gain = (
        m.actuator_gainprm[:, 0].copy() if m.nu else np.zeros(0)
    )
    act_trntype = (
        m.actuator_trntype.copy() if m.nu else np.zeros(0, np.int32)
    )
    act_biastype = (
        m.actuator_biastype.copy() if m.nu else np.zeros(0, np.int32)
    )
    act_biasprm = (
        m.actuator_biasprm[:, :3].copy() if m.nu else np.zeros((0, 3))
    )
    act_dyntype = (
        m.actuator_dyntype.copy() if m.nu else np.zeros(0, np.int32)
    )
    act_dynprm = (
        m.actuator_dynprm[:, 0].copy() if m.nu else np.zeros(0)
    )

    # Tendons.  Fixed tendons (mjWRAP_JOINT wraps) become joint-coef
    # lists; spatial ones (mjWRAP_SITE) become site pairs.
    ten_fixed, tf_k, tf_d, tf_l = [], [], [], []
    ts_sites, ts_range, ts_lim, ts_k, ts_d = [], [], [], [], []
    for t in range(m.ntendon):
        adr, num = int(m.tendon_adr[t]), int(m.tendon_num[t])
        wraps = [
            (int(m.wrap_type[i]), int(m.wrap_objid[i]), float(m.wrap_prm[i]))
            for i in range(adr, adr + num)
        ]
        if all(wt == int(mujoco.mjtWrap.mjWRAP_JOINT) for wt, _, _ in wraps):
            triples = tuple(
                (
                    int(m.jnt_qposadr[j]),
                    int(m.jnt_dofadr[j]),
                    coef,
                )
                for _, j, coef in wraps
            )
            ten_fixed.append(triples)
            tf_k.append(float(m.tendon_stiffness[t]))
            tf_d.append(float(m.tendon_damping[t]))
            # lengthspring is [lo, hi] in mujoco >= 2.3; use the midpoint.
            ls = np.atleast_1d(m.tendon_lengthspring[t])
            tf_l.append(float(ls.mean()))
        elif all(wt == int(mujoco.mjtWrap.mjWRAP_SITE) for wt, _, _ in wraps):
            if num != 2:
                continue  # multi-site routing unsupported (vis-only in dmc)
            ts_sites.append([wraps[0][1], wraps[1][1]])
            ts_range.append(m.tendon_range[t].copy())
            ts_lim.append(bool(m.tendon_limited[t]))
            ts_k.append(float(m.tendon_stiffness[t]))
            ts_d.append(float(m.tendon_damping[t]))

    return PhysModel(
        nq=int(m.nq),
        nv=int(m.nv),
        nu=int(m.nu),
        nbody=int(m.nbody),
        body_parent=m.body_parentid.copy(),
        body_pos=m.body_pos.copy(),
        body_quat=m.body_quat.copy(),
        body_mass=m.body_mass.copy(),
        body_inertia=m.body_inertia.copy(),
        body_ipos=m.body_ipos.copy(),
        body_iquat=m.body_iquat.copy(),
        jnt_type=m.jnt_type.copy(),
        jnt_body=m.jnt_bodyid.copy(),
        jnt_axis=m.jnt_axis.copy(),
        jnt_pos=m.jnt_pos.copy(),
        jnt_qposadr=m.jnt_qposadr.copy(),
        jnt_dofadr=m.jnt_dofadr.copy(),
        jnt_range=m.jnt_range.copy(),
        jnt_limited=m.jnt_limited.astype(bool).copy(),
        jnt_stiffness=m.jnt_stiffness.copy(),
        qpos_spring=m.qpos_spring.copy(),
        dof_damping=m.dof_damping.copy(),
        dof_armature=m.dof_armature.copy(),
        act_trnid=act_trnid,
        act_gear=act_gear,
        act_ctrlrange=m.actuator_ctrlrange.copy()
        if m.nu
        else np.zeros((0, 2)),
        act_ctrllimited=m.actuator_ctrllimited.astype(bool).copy()
        if m.nu
        else np.zeros(0, bool),
        con_body=np.asarray(con_body, np.int32),
        con_pos=np.asarray(con_pos, np.float64).reshape(-1, 3),
        con_radius=np.asarray(con_radius, np.float64),
        con_friction=np.asarray(con_fric, np.float64),
        con_solref=np.asarray(con_solref, np.float64).reshape(-1, 2),
        con_solimp=np.asarray(con_solimp, np.float64).reshape(-1, 5),
        con_invw=np.asarray(con_invw, np.float64),
        con_margin=np.asarray(con_margin, np.float64),
        con_axis=np.asarray(con_axis, np.float64).reshape(-1, 3),
        jnt_solref_lim=m.jnt_solref.copy(),
        jnt_solimp_lim=m.jnt_solimp.copy(),
        jnt_margin=m.jnt_margin.copy(),
        dof_invweight=m.dof_invweight0.copy(),
        site_body=m.site_bodyid.copy()
        if m.nsite
        else np.zeros(0, np.int32),
        site_pos=m.site_pos.copy() if m.nsite else np.zeros((0, 3)),
        site_names=tuple(m.site(i).name for i in range(m.nsite)),
        geom_body=m.geom_bodyid.copy(),
        geom_type=m.geom_type.copy(),
        geom_size=m.geom_size.copy(),
        geom_pos=m.geom_pos.copy(),
        geom_quat=m.geom_quat.copy(),
        geom_rgba=m.geom_rgba.copy(),
        body_names=tuple(m.body(i).name for i in range(m.nbody)),
        timestep=float(m.opt.timestep),
        gravity=m.opt.gravity.copy(),
        density=float(m.opt.density),
        viscosity=float(m.opt.viscosity),
        qpos0=m.qpos0.copy(),
        integrator=int(m.opt.integrator),
        act_gain=act_gain,
        act_trntype=act_trntype,
        act_biastype=act_biastype,
        act_biasprm=act_biasprm,
        act_dyntype=act_dyntype,
        act_dynprm=act_dynprm,
        ten_fixed=tuple(ten_fixed),
        ten_fixed_stiffness=np.asarray(tf_k),
        ten_fixed_damping=np.asarray(tf_d),
        ten_fixed_springlen=np.asarray(tf_l),
        ten_spatial_sites=np.asarray(ts_sites, np.int32).reshape(-1, 2),
        ten_spatial_range=np.asarray(ts_range, np.float64).reshape(-1, 2),
        ten_spatial_limited=np.asarray(ts_lim, bool),
        ten_spatial_stiffness=np.asarray(ts_k),
        ten_spatial_damping=np.asarray(ts_d),
        pair_body=np.asarray(pair_body, np.int32).reshape(-1, 2),
        pair_seg_a=np.asarray(pair_sa, np.float64).reshape(-1, 2, 3),
        pair_seg_b=np.asarray(pair_sb, np.float64).reshape(-1, 2, 3),
        pair_radius=np.asarray(pair_rad, np.float64).reshape(-1, 2),
        pair_friction=np.asarray(pair_fric, np.float64),
    )


def _quat_rotate_np(q: np.ndarray, v: np.ndarray) -> np.ndarray:
    w, x, y, z = q
    r = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    return r @ v
