"""Device rasterizer for physics scenes (the from_pixels path).

Behavioral reference: ``envpool/mujoco/frame_stack.h:182-303`` — the
reference renders MuJoCo offscreen on the worker thread during
``WriteState``.  TPU-native replacement: an orthographic side-view
painter over the model's geom table; spheres become discs, capsules
become stadium shapes (distance-to-segment), boxes are drawn as their
axis stadium, the floor plane fills everything below ground.  Nearest
(camera-depth) geom wins per pixel; shading = per-geom luma from
``geom_rgba`` modulated by depth.  This is a schematic render (no
lighting/meshes), sufficient for pixel-based control experiments.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..physics.kinematics import fk, quat2mat

_SPHERE, _CAPSULE, _ELLIPSOID, _CYLINDER, _BOX = 2, 3, 4, 5, 6
_PLANE = 0


def _luma(rgba):
    return 255.0 * (
        0.299 * rgba[:, 0] + 0.587 * rgba[:, 1] + 0.114 * rgba[:, 2]
    )


def render_scene(
    model,
    qpos,
    height: int = 84,
    width: int = 84,
    track_body: int = 1,
    view_size: float = 2.0,
    cam_height: float = 0.6,
):
    """→ [height, width] float32 luma in [0, 255].

    Camera: orthographic, looking along +y, centred on ``track_body``'s
    x (and a fixed z height), spanning ``view_size`` world units.
    """
    Rs, ps = fk(model, qpos)
    ng = len(model.geom_body)
    gb = jnp.asarray(model.geom_body)
    gR = jnp.einsum(
        "gij,gjk->gik",
        Rs[gb],
        jax.vmap(quat2mat)(jnp.asarray(model.geom_quat, qpos.dtype)),
    )
    gp = ps[gb] + jnp.einsum(
        "gij,gj->gi", Rs[gb], jnp.asarray(model.geom_pos, qpos.dtype)
    )

    cx = ps[track_body][0]
    cz = cam_height
    xs = cx + jnp.linspace(-view_size / 2, view_size / 2, width)
    zs = cz + jnp.linspace(view_size / 2, -view_size / 2, height)
    px = jnp.broadcast_to(xs[None, :], (height, width))
    pz = jnp.broadcast_to(zs[:, None], (height, width))

    depth = jnp.full((height, width), jnp.inf)
    luma_img = jnp.full((height, width), 168.0)  # sky
    lumas = _luma(np.asarray(model.geom_rgba))

    gtype = np.asarray(model.geom_type)
    gsize = np.asarray(model.geom_size)
    for g in range(ng):
        t = int(gtype[g])
        lum = float(lumas[g]) if np.isfinite(lumas[g]) else 128.0
        if t == _PLANE:
            # Ground: fill below z=0 (world planes are floors here).
            mask = pz <= 0.0
            d = jnp.full((height, width), 1e3)
            better = mask & (d < depth)
            # Checker pattern for motion cues.
            check = (
                jnp.floor(px / 0.5).astype(jnp.int32)
                + jnp.floor(pz / 0.5).astype(jnp.int32)
            ) % 2 == 0
            lum_plane = jnp.where(check, 90.0, 110.0)
            luma_img = jnp.where(better, lum_plane, luma_img)
            depth = jnp.where(better, d, depth)
            continue
        center = gp[g]
        if t == _SPHERE:
            r = float(gsize[g][0])
            a = center
            b = center
        elif t in (_CAPSULE, _CYLINDER):
            half = float(gsize[g][1])
            axis = gR[g][:, 2]
            a = center - half * axis
            b = center + half * axis
            r = float(gsize[g][0])
        elif t == _BOX:
            # Stadium along the longest local axis.
            sz = gsize[g]
            main = int(np.argmax(sz))
            axis = gR[g][:, main]
            half = float(sz[main])
            a = center - half * axis
            b = center + half * axis
            others = [sz[i] for i in range(3) if i != main]
            r = float(np.mean(others))
        elif t == _ELLIPSOID:
            r = float(np.mean(gsize[g]))
            a = center
            b = center
        else:  # meshes/hfields: small marker at the body origin
            r = 0.05
            a = center
            b = center
        # 2D distance to the segment (x, z projection).
        ax, az = a[0], a[2]
        bx, bz = b[0], b[2]
        abx, abz = bx - ax, bz - az
        ab2 = abx * abx + abz * abz + 1e-9
        tpar = jnp.clip(
            ((px - ax) * abx + (pz - az) * abz) / ab2, 0.0, 1.0
        )
        qx = ax + tpar * abx
        qz = az + tpar * abz
        dist = jnp.sqrt((px - qx) ** 2 + (pz - qz) ** 2)
        cover = dist <= r
        d = (a[1] + b[1]) / 2.0  # camera depth = y
        better = cover & (d < depth)
        # Simple shading: edge darkening by normalized distance.
        shade = lum * (1.0 - 0.35 * (dist / (r + 1e-9)))
        luma_img = jnp.where(better, shade, luma_img)
        depth = jnp.where(better, jnp.full_like(depth, d), depth)
    return luma_img.astype(jnp.float32)
