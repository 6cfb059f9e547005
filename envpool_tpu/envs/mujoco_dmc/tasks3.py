"""dm_control suite wave 3: Quadruped, Manipulator, Stacker, Dog.

Behavioral reference: ``envpool/mujoco/dmc`` (C++ ports) and the
dm_control suite sources (the alignment oracle, installed in-image).
Models are built with dm_control's own XML generators
(``quadruped.make_model`` etc.) so geometry/actuator constants match the
oracle exactly; dynamics run on ``envpool_tpu.physics``.

Engine notes:
* Quadruped's position actuators are affine-bias servos with first-order
  activation filters (tau 0.1); the servo runs in-engine
  (``physics.dynamics._actuator_forces``), the filter is integrated
  analytically per control step (exact for piecewise-constant ctrl).
* Escape's procedural heightfield terrain is approximated as flat
  (documented) — rangefinder obs read the no-intersection value and the
  escape reward keeps its exact tolerance form on origin distance.
* Force/torque toe sensors are approximated from the penalty-contact
  normal forces (z-component only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...core.env import EnvOut
from ...physics import from_mj_model
from ...physics.dynamics import step as phys_step
from ...physics.kinematics import fk
from .base import DmcEnv
from .rewards import tolerance


@functools.lru_cache(maxsize=8)
def _quadruped_model(task: str):
    import mujoco
    from dm_control.suite import common, quadruped

    if task in ("walk", "run"):
        speed = 0.5 if task == "walk" else 5.0
        xml = quadruped.make_model(floor_size=20 * speed)
    elif task == "escape":
        xml = quadruped.make_model(
            floor_size=40, terrain=True, rangefinders=True
        )
    else:  # fetch
        xml = quadruped.make_model(walls_and_ball=True)
    m = mujoco.MjModel.from_xml_string(xml.decode(), common.ASSETS)
    return from_mj_model(m), m


class QuadrupedEnv(DmcEnv):
    """quadruped:{walk,run,escape,fetch}."""

    DOMAIN = "quadruped"
    CONTROL_TIMESTEP = 0.02
    DEFAULT_CONFIG = dict(DmcEnv.DEFAULT_CONFIG, substeps=2)

    _TOES = ("toe_front_left", "toe_back_left", "toe_back_right",
             "toe_front_right")

    def _load_model(self):
        return _quadruped_model(str(self.config["task_name"]) or "walk")

    def __init__(self, config):
        super().__init__(config)
        import mujoco

        m = self._mj_model
        hinges = [
            j for j in range(m.njnt)
            if int(m.jnt_type[j]) == 3  # hinge
        ]
        self._hinge_qadr = np.asarray([m.jnt_qposadr[j] for j in hinges])
        self._hinge_dadr = np.asarray([m.jnt_dofadr[j] for j in hinges])
        self._torso = self.body_index("torso")
        self._toe_bodies = [self.body_index(t) for t in self._TOES]
        # Activation filter constants (dyntype 2, tau = dynprm[0]).
        tau = float(self.model.act_dynprm[0])
        T = self.control_dt
        self._act_decay = float(np.exp(-T / tau))
        self._act_mean_w = float(tau / T * (1.0 - np.exp(-T / tau)))
        sid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_SITE, "workspace")
        self._workspace_body = int(m.site_bodyid[sid])
        self._workspace_local = m.site_pos[sid].copy()
        self._workspace_r = float(m.site_size[sid][0])
        if self.task == "escape":
            self._terrain_size = float(m.hfield_size[0][0])
            self._n_rf = int(
                np.sum(m.sensor_type == mujoco.mjtSensor.mjSENS_RANGEFINDER)
            )
        if self.task == "fetch":
            self._ball = self.body_index("ball")
            self._ball_qadr = int(
                m.jnt_qposadr[
                    mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, "ball_root")
                ]
            )
            self._ball_dadr = int(
                m.jnt_dofadr[
                    mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, "ball_root")
                ]
            )
            tsid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_SITE, "target")
            self._target_r = float(m.site_size[tsid][0])
            gf = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_GEOM, "floor")
            gb = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_GEOM, "ball")
            self._arena_radius = float(m.geom_size[gf][0]) * np.sqrt(2)
            self._ball_r = float(m.geom_size[gb][0])
            self._root_dadr = 0
        # Root free joint qpos address.
        self._root_qadr = 0
        from ...physics import ContactParams

        self.contact = ContactParams(
            kp=float(config["contact_kp"]),
            kd=float(config["contact_kd"]),
            pairs=(self.task == "fetch"),
        )

    # -- episode init ------------------------------------------------------

    def _drop_height(self, qpos):
        """Smallest root z with no floor contact (1 cm grid upward), the
        closed form of dm_control's _find_non_contacting_height."""
        from ...physics.dynamics import _contact_points

        Rs, ps = fk(self.model, qpos)
        centers = _contact_points(self.model, Rs, ps)
        radius = jnp.asarray(self.model.con_radius, jnp.float32)
        lowest = jnp.min(centers[:, 2] - radius)
        need = -lowest  # raise so the lowest sphere clears z=0
        return jnp.ceil(jnp.maximum(need, 0.0) / 0.01) * 0.01 + 0.01

    def init_state(self, key):
        kq, kb, ka = jax.random.split(key, 3)
        qpos = jnp.asarray(self.model.qpos0, jnp.float32)
        if self.task == "fetch":
            # Random azimuth + horizontal position (quadruped.Fetch).
            k1, k2, k3 = jax.random.split(kq, 3)
            az = jax.random.uniform(k1, (), jnp.float32, 0, 2 * jnp.pi)
            quat = jnp.stack(
                [jnp.cos(az / 2), 0.0 * az, 0.0 * az, jnp.sin(az / 2)]
            )
            spawn = 0.5 * self._terrain_or_floor()
            xy = jax.random.uniform(k2, (2,), jnp.float32, -spawn, spawn)
            qpos = qpos.at[0:2].set(xy)
        else:
            quat = jax.random.normal(kq, (4,), jnp.float32)
            quat = quat / jnp.linalg.norm(quat)
        qpos = qpos.at[3:7].set(quat)
        z = self._drop_height(qpos)
        qpos = qpos.at[2].set(z)
        extras = {"act": jnp.zeros(self.model.nu, jnp.float32),
                  "prev_v": jnp.zeros(3, jnp.float32)}
        if self.task == "fetch":
            # Ball: random position and velocity (quadruped.Fetch).
            k4, k5 = jax.random.split(kb)
            bxy = jax.random.uniform(
                k4, (2,), jnp.float32, -spawn, spawn
            )
            qpos = qpos.at[self._ball_qadr : self._ball_qadr + 2].set(bxy)
            qpos = qpos.at[self._ball_qadr + 2].set(2.0)
        return qpos, jnp.zeros(self.model.nv, jnp.float32), extras

    def _terrain_or_floor(self):
        if self.task == "fetch":
            return self._arena_radius / np.sqrt(2)
        return 10.0

    def _extras_spec(self):
        return {"act": (self.model.nu,), "prev_v": (3,)}

    # -- observables -------------------------------------------------------

    def _torso_R(self, qpos):
        return self.xmat(qpos)[self._torso]

    def observe_dmc(self, qpos, qvel, extras):
        from ...physics.kinematics import body_vel

        (Rs, ps), (omega, vels) = body_vel(self.model, qpos, qvel)
        R = Rs[self._torso]
        obs = {
            "egocentric_state": jnp.concatenate(
                [
                    qpos[jnp.asarray(self._hinge_qadr)],
                    qvel[jnp.asarray(self._hinge_dadr)],
                    extras["act"],
                ]
            ),
            "torso_velocity": vels[self._torso] @ R,
            "torso_upright": R[2, 2],
            "imu": jnp.concatenate(
                [
                    qvel[3:6],  # gyro: body-frame angular velocity
                    ((vels[self._torso] - extras["prev_v"]) / self.control_dt
                     - jnp.asarray([0.0, 0.0, -9.81])) @ R,
                ]
            ),
            "force_torque": self._force_torque(qpos, qvel, Rs, ps),
        }
        if self.task == "escape":
            obs["origin"] = -(ps[self._torso] @ R)
            obs["rangefinder"] = jnp.ones(self._n_rf, jnp.float32)
        if self.task == "fetch":
            ball_rel_pos = ps[self._ball] - ps[self._torso]
            ball_rel_vel = (
                qvel[self._ball_dadr : self._ball_dadr + 3] - qvel[0:3]
            )
            ball_rot_vel = qvel[self._ball_dadr + 3 : self._ball_dadr + 6]
            obs["ball_state"] = (
                jnp.stack([ball_rel_pos, ball_rel_vel, ball_rot_vel]) @ R
            ).reshape(-1)
            target = jnp.zeros(3, jnp.float32)  # target site at origin
            obs["target_position"] = (target - ps[self._torso]) @ R
        return obs

    def _force_torque(self, qpos, qvel, Rs, ps):
        """arcsinh-scaled toe force/torque: penalty normal force on z."""
        from ...physics.dynamics import _contact_points

        centers = _contact_points(self.model, Rs, ps)
        radius = jnp.asarray(self.model.con_radius, jnp.float32)
        pen = radius - centers[:, 2]
        fn = jnp.maximum(self.contact.kp * pen, 0.0)
        cb = np.asarray(self.model.con_body)
        out = []
        for tb in self._toe_bodies:
            idx = np.flatnonzero(cb == tb)
            f = fn[jnp.asarray(idx)].sum() if len(idx) else jnp.float32(0.0)
            out.append(jnp.stack([0.0 * f, 0.0 * f, f]))
            out.append(jnp.zeros(3, jnp.float32))  # torque
        return jnp.arcsinh(jnp.concatenate(out))

    # -- stepping with activation filter -----------------------------------

    def step_env(self, state, action, key):
        action = jnp.reshape(action, (self.model.nu,)).astype(jnp.float32)
        act = state["extras"]["act"]
        ctrl_eff = action + (act - action) * self._act_mean_w
        act_next = action + (act - action) * self._act_decay
        from ...physics.kinematics import body_vel

        qpos, qvel = phys_step(
            self.model,
            state["qpos"],
            state["qvel"],
            ctrl_eff,
            self.substeps,
            self.contact,
            self.n_sub_steps,
        )
        (_, _), (_, vels) = body_vel(self.model, qpos, qvel)
        extras = {
            "act": act_next,
            "prev_v": state["extras"].get("prev_v", jnp.zeros(3, jnp.float32)),
        }
        # prev_v for the accelerometer: velocity before this step.
        (_, _), (_, vels_prev) = body_vel(
            self.model, state["qpos"], state["qvel"]
        )
        extras["prev_v"] = vels_prev[self._torso]
        st = {"qpos": qpos, "qvel": qvel, "extras": extras}
        reward = self.reward_dmc(qpos, qvel, action, extras)
        return EnvOut(
            state=st,
            obs=self._obs_dict(st),
            reward=jnp.asarray(reward, jnp.float32),
            terminated=jnp.bool_(False),
            discount=jnp.float32(1.0),
        )

    # -- rewards -----------------------------------------------------------

    def _upright_reward(self, qpos, deviation_angle=0.0):
        deviation = float(np.cos(np.deg2rad(deviation_angle)))
        return tolerance(
            self._torso_R(qpos)[2, 2],
            bounds=(deviation, float("inf")),
            sigmoid="linear",
            margin=1 + deviation,
            value_at_margin=0.0,
        )

    def reward_dmc(self, qpos, qvel, action, extras):
        from ...physics.kinematics import body_vel

        (Rs, ps), (_, vels) = body_vel(self.model, qpos, qvel)
        R = Rs[self._torso]
        if self.task in ("walk", "run"):
            speed = 0.5 if self.task == "walk" else 5.0
            vx = (vels[self._torso] @ R)[0]
            move = tolerance(
                vx,
                bounds=(speed, float("inf")),
                margin=speed,
                value_at_margin=0.5,
                sigmoid="linear",
            )
            return self._upright_reward(qpos) * move
        if self.task == "escape":
            ws = ps[self._workspace_body] + Rs[
                self._workspace_body
            ] @ jnp.asarray(self._workspace_local, jnp.float32)
            escape = tolerance(
                jnp.linalg.norm(ws),
                bounds=(self._terrain_size, float("inf")),
                margin=self._terrain_size,
                value_at_margin=0.0,
                sigmoid="linear",
            )
            return self._upright_reward(qpos, 20.0) * escape
        # fetch
        ws = ps[self._workspace_body] + Rs[self._workspace_body] @ jnp.asarray(
            self._workspace_local, jnp.float32
        )
        ball = ps[self._ball]
        reach = tolerance(
            jnp.linalg.norm((ws - ball)[:2]),
            bounds=(0.0, self._workspace_r + self._ball_r),
            sigmoid="linear",
            margin=self._arena_radius,
            value_at_margin=0.0,
        )
        fetch_r = tolerance(
            jnp.linalg.norm(ball[:2]),  # target site at the origin
            bounds=(0.0, self._target_r),
            sigmoid="linear",
            margin=self._arena_radius,
            value_at_margin=0.0,
        )
        return self._upright_reward(qpos) * reach * (0.5 + 0.5 * fetch_r)


@functools.lru_cache(maxsize=8)
def _manipulator_model(use_peg: bool, insert: bool):
    import mujoco
    from dm_control.suite import manipulator

    xml, assets = manipulator.make_model(use_peg, insert)
    m = mujoco.MjModel.from_xml_string(xml.decode(), assets)
    return from_mj_model(m), m


@functools.lru_cache(maxsize=8)
def _stacker_model(n_boxes: int):
    import mujoco
    from dm_control.suite import stacker

    xml, assets = stacker.make_model(n_boxes)
    m = mujoco.MjModel.from_xml_string(xml.decode(), assets)
    return from_mj_model(m), m


_ARM_JOINTS = (
    "arm_root", "arm_shoulder", "arm_elbow", "arm_wrist",
    "finger", "fingertip", "thumb", "thumbtip",
)
_TOUCH_SITES = (
    "palm_touch", "finger_touch", "thumb_touch",
    "fingertip_touch", "thumbtip_touch",
)


class _PlanarArmEnv(DmcEnv):
    """Shared manipulator/stacker machinery (planar 8-joint arm)."""

    CONTROL_TIMESTEP = 0.01
    DEFAULT_CONFIG = dict(DmcEnv.DEFAULT_CONFIG, substeps=2)

    def _setup_arm(self):
        import mujoco

        m = self._mj_model
        jids = [
            mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, n)
            for n in _ARM_JOINTS
        ]
        self._arm_qadr = np.asarray([m.jnt_qposadr[j] for j in jids])
        self._arm_dadr = np.asarray([m.jnt_dofadr[j] for j in jids])
        self._arm_lo = np.asarray(
            [
                m.jnt_range[j][0] if m.jnt_limited[j] else -np.pi
                for j in jids
            ],
            np.float32,
        )
        self._arm_hi = np.asarray(
            [
                m.jnt_range[j][1] if m.jnt_limited[j] else np.pi
                for j in jids
            ],
            np.float32,
        )
        self._finger_j = _ARM_JOINTS.index("finger")
        self._thumb_j = _ARM_JOINTS.index("thumb")
        self._hand_body = self.body_index("hand")
        self._grasp_site = self.model.site_names.index("grasp")
        if "pinch" in self.model.site_names:
            self._pinch_site = self.model.site_names.index("pinch")
        self._touch_sites = [
            self.model.site_names.index(s)
            for s in _TOUCH_SITES
            if s in self.model.site_names
        ]
        from ...physics import ContactParams

        self.contact = ContactParams(
            kp=float(self.config["contact_kp"]),
            kd=float(self.config["contact_kd"]),
            pairs=True,
        )

    def _site_pos(self, qpos):
        from ...physics.dynamics import site_positions

        return site_positions(self.model, qpos)

    def _body_2d_pose(self, qpos, body, orientation=True):
        """[x, z, qw, qy] of a body (manipulator.Physics.body_2d_pose)."""
        Rs, ps = fk(self.model, qpos)
        p = ps[body]
        out = jnp.stack([p[0], p[2]])
        if orientation:
            # Planar rotation about y: R = [[c,0,s],[0,1,0],[-s,0,c]];
            # quaternion (qw, qy) with angle θ: qw=cos(θ/2), qy=sin(θ/2).
            c = Rs[body][0, 0]
            s = Rs[body][0, 2]
            theta = jnp.arctan2(s, c)
            out = jnp.concatenate(
                [out, jnp.stack([jnp.cos(theta / 2), jnp.sin(theta / 2)])]
            )
        return out

    def _touch(self, qpos, obj_centers, obj_radius):
        """log1p pseudo-touch: penalty force of touch sites vs objects."""
        sites = self._site_pos(qpos)
        vals = []
        for si in self._touch_sites:
            p = sites[si]
            d = jnp.min(
                jnp.linalg.norm(obj_centers - p[None, :], axis=-1)
            )
            f = jnp.maximum(obj_radius + 0.02 - d, 0.0) * 1e3
            vals.append(jnp.log1p(f))
        return jnp.stack(vals)

    def _arm_obs(self, qpos, qvel):
        ang = qpos[jnp.asarray(self._arm_qadr)]
        return {
            "arm_pos": jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1),
            "arm_vel": qvel[jnp.asarray(self._arm_dadr)],
        }

    def _random_arm(self, key):
        vals = jax.random.uniform(
            key, (len(_ARM_JOINTS),), jnp.float32,
            jnp.asarray(self._arm_lo), jnp.asarray(self._arm_hi),
        )
        # Symmetrize hand: finger = thumb.
        vals = vals.at[self._finger_j].set(vals[self._thumb_j])
        return vals


class ManipulatorEnv(_PlanarArmEnv):
    """manipulator:{bring_ball,bring_peg,insert_ball,insert_peg}.

    Init omits dm_control's collision-rejection loop (documented); the
    receptacle (cup/slot) is reward-only — no contact (documented).
    """

    DOMAIN = "manipulator"

    def _load_model(self):
        t = str(self.config["task_name"]) or "bring_ball"
        self._use_peg = "peg" in t
        self._insert = t.startswith("insert")
        return _manipulator_model(self._use_peg, self._insert)

    def __init__(self, config):
        super().__init__(config)
        import mujoco

        self._setup_arm()
        m = self._mj_model
        obj = "peg" if self._use_peg else "ball"
        self._object_body = self.body_index(obj)
        jids = [
            mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_JOINT, f"{obj}_{d}")
            for d in "xzy"
        ]
        self._obj_qadr = np.asarray([m.jnt_qposadr[j] for j in jids])
        self._obj_dadr = np.asarray([m.jnt_dofadr[j] for j in jids])
        # Object body origin offset (joints act in the body frame of the
        # prop's parent at its body_pos).
        self._obj_body_pos = m.body_pos[self._object_body].copy()
        gid = mujoco.mj_name2id(
            m, mujoco.mjtObj.mjOBJ_GEOM,
            obj if not self._use_peg else "peg",
        )
        self._obj_r = float(m.geom_size[gid][0])
        # Local site offsets on the target body (for peg sites).
        tname = "target_peg" if self._use_peg else "target_ball"
        self._target_sites = {}
        for s in ("target_peg", "target_peg_tip", "target_ball"):
            try:
                sid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_SITE, s)
                if sid >= 0:
                    self._target_sites[s] = m.site_pos[sid].copy()
            except Exception:
                pass
        self._obj_sites = {
            s: self.model.site_names.index(s)
            for s in ("peg", "peg_grasp", "peg_pinch", "peg_tip", "ball")
            if s in self.model.site_names
        }

    def _extras_spec(self):
        return {"target": (3,)}  # (x, z, angle)

    def init_state(self, key):
        ka, kt1, kt2, kc, ko1, ko2, kv = jax.random.split(key, 7)
        qpos = jnp.asarray(self.model.qpos0, jnp.float32)
        arm = self._random_arm(ka)
        qpos = qpos.at[jnp.asarray(self._arm_qadr)].set(arm)
        target_x = jax.random.uniform(kt1, (), jnp.float32, -0.4, 0.4)
        target_z = jax.random.uniform(kt2, (), jnp.float32, 0.1, 0.4)
        if self._insert:
            target_angle = jax.random.uniform(
                kt1, (), jnp.float32, -jnp.pi / 3, jnp.pi / 3
            )
        else:
            target_angle = jax.random.uniform(
                kt2, (), jnp.float32, -jnp.pi, jnp.pi
            )
        # Object init: in_hand (.1) / in_target (.1) / uniform (.8).
        u = jax.random.uniform(kc, ())
        grasp = self._site_pos(qpos)[self._grasp_site]
        uni = jnp.stack(
            [
                jax.random.uniform(ko1, (), jnp.float32, -0.5, 0.5),
                jax.random.uniform(ko2, (), jnp.float32, 0.0, 0.7),
                jax.random.uniform(kv, (), jnp.float32, 0, 2 * jnp.pi),
            ]
        )
        in_target = jnp.stack([target_x, target_z, target_angle])
        in_hand = jnp.stack(
            [grasp[0], grasp[2], jnp.float32(0.0)]
        )
        obj = jnp.where(
            u < 0.1, in_hand, jnp.where(u < 0.2, in_target, uni)
        )
        # Object joints are relative to the prop root body position.
        rel = obj.at[0].add(-float(self._obj_body_pos[0])).at[1].add(
            -float(self._obj_body_pos[2])
        )
        qpos = qpos.at[jnp.asarray(self._obj_qadr)].set(rel)
        qvel = jnp.zeros(self.model.nv, jnp.float32)
        vx = jax.random.uniform(kv, (), jnp.float32, -5.0, 5.0)
        qvel = qvel.at[self._obj_dadr[0]].set(
            jnp.where(u >= 0.2, vx, 0.0)
        )
        extras = {"target": jnp.stack([target_x, target_z, target_angle])}
        return qpos, qvel, extras

    def _target_site_pos(self, extras, local):
        """World position of a site on the (static, posed) target body."""
        t = extras["target"]
        c, s = jnp.cos(t[2]), jnp.sin(t[2])
        lx, lz = float(local[0]), float(local[2])
        x = t[0] + c * lx + s * lz
        z = t[1] - s * lx + c * lz
        return jnp.stack([x, jnp.float32(0.0), z])

    def observe_dmc(self, qpos, qvel, extras):
        obs = self._arm_obs(qpos, qvel)
        Rs, ps = fk(self.model, qpos)
        obj_center = ps[self._object_body]
        obs["touch"] = self._touch(qpos, obj_center[None, :], self._obj_r)
        obs["hand_pos"] = self._body_2d_pose(qpos, self._hand_body)
        obs["object_pos"] = self._body_2d_pose(qpos, self._object_body)
        obs["object_vel"] = qvel[jnp.asarray(self._obj_dadr)]
        t = extras["target"]
        obs["target_pos"] = jnp.stack(
            [t[0], t[1], jnp.cos(t[2] / 2), jnp.sin(t[2] / 2)]
        )
        return obs

    def reward_dmc(self, qpos, qvel, action, extras):
        sites = self._site_pos(qpos)

        def close(d):
            return tolerance(d, (0.0, 0.01), margin=0.02)

        if self._use_peg:
            grasp = close(
                jnp.linalg.norm(
                    sites[self._obj_sites["peg_grasp"]]
                    - sites[self._grasp_site]
                )
            )
            pinch = close(
                jnp.linalg.norm(
                    sites[self._obj_sites["peg_pinch"]]
                    - sites[self._pinch_site]
                )
            )
            grasping = (grasp + pinch) / 2
            target_peg = self._target_site_pos(
                extras, self._target_sites.get("target_peg", np.zeros(3))
            )
            bring = close(
                jnp.linalg.norm(sites[self._obj_sites["peg"]] - target_peg)
            )
            tip_local = self._target_sites.get(
                "target_peg_tip", np.zeros(3)
            )
            target_tip = self._target_site_pos(extras, tip_local)
            bring_tip = close(
                jnp.linalg.norm(
                    sites[self._obj_sites["peg_tip"]] - target_tip
                )
            )
            bringing = (bring + bring_tip) / 2
            return jnp.maximum(bringing, grasping / 3)
        target_ball = self._target_site_pos(
            extras, self._target_sites.get("target_ball", np.zeros(3))
        )
        return close(
            jnp.linalg.norm(sites[self._obj_sites["ball"]] - target_ball)
        )


class StackerEnv(_PlanarArmEnv):
    """stacker:{stack_2,stack_4}."""

    DOMAIN = "stacker"

    def _load_model(self):
        t = str(self.config["task_name"]) or "stack_2"
        self._n_boxes = int(t.split("_")[1])
        return _stacker_model(self._n_boxes)

    def __init__(self, config):
        super().__init__(config)
        import mujoco

        self._setup_arm()
        m = self._mj_model
        self._box_bodies = [
            self.body_index(f"box{b}") for b in range(self._n_boxes)
        ]
        self._box_qadr, self._box_dadr = [], []
        self._box_body_pos = []
        for b in range(self._n_boxes):
            jids = [
                mujoco.mj_name2id(
                    m, mujoco.mjtObj.mjOBJ_JOINT, f"box{b}_{d}"
                )
                for d in "xzy"
            ]
            self._box_qadr.append([m.jnt_qposadr[j] for j in jids])
            self._box_dadr.append([m.jnt_dofadr[j] for j in jids])
            self._box_body_pos.append(
                m.body_pos[self._box_bodies[b]].copy()
            )
        gid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_GEOM, "target")
        self._box_size = float(m.geom_size[gid][0])
        self._box_sites = [
            self.model.site_names.index(f"box{b}")
            for b in range(self._n_boxes)
        ]

    def _extras_spec(self):
        return {"target": (2,)}  # (x, z)

    def init_state(self, key):
        ka, kh, kx, kb = jax.random.split(key, 4)
        qpos = jnp.asarray(self.model.qpos0, jnp.float32)
        arm = self._random_arm(ka)
        qpos = qpos.at[jnp.asarray(self._arm_qadr)].set(arm)
        height = 2 * jax.random.randint(kh, (), 0, self._n_boxes) + 1
        target_z = self._box_size * height.astype(jnp.float32)
        target_x = jax.random.uniform(kx, (), jnp.float32, -0.37, 0.37)
        kbs = jax.random.split(kb, self._n_boxes)
        for b in range(self._n_boxes):
            k1, k2, k3 = jax.random.split(kbs[b], 3)
            bx = jax.random.uniform(k1, (), jnp.float32, 0.1, 0.3)
            bz = jax.random.uniform(k2, (), jnp.float32, 0.0, 0.7)
            by = jax.random.uniform(k3, (), jnp.float32, 0, 2 * jnp.pi)
            bp = self._box_body_pos[b]
            qpos = qpos.at[self._box_qadr[b][0]].set(bx - float(bp[0]))
            qpos = qpos.at[self._box_qadr[b][1]].set(bz - float(bp[2]))
            qpos = qpos.at[self._box_qadr[b][2]].set(by)
        extras = {"target": jnp.stack([target_x, target_z])}
        return qpos, jnp.zeros(self.model.nv, jnp.float32), extras

    def observe_dmc(self, qpos, qvel, extras):
        obs = self._arm_obs(qpos, qvel)
        Rs, ps = fk(self.model, qpos)
        centers = ps[jnp.asarray(self._box_bodies)]
        obs["touch"] = self._touch(qpos, centers, self._box_size)
        obs["hand_pos"] = self._body_2d_pose(qpos, self._hand_body)
        obs["box_pos"] = jnp.concatenate(
            [
                self._body_2d_pose(qpos, b)
                for b in self._box_bodies
            ]
        )
        dadr = jnp.asarray(
            [d for row in self._box_dadr for d in row]
        )
        obs["box_vel"] = qvel[dadr]
        obs["target_pos"] = extras["target"]
        return obs

    def reward_dmc(self, qpos, qvel, action, extras):
        sites = self._site_pos(qpos)
        t = extras["target"]
        target = jnp.stack([t[0], jnp.float32(0.0), t[1]])
        dists = jnp.stack(
            [
                jnp.linalg.norm(sites[s] - target)
                for s in self._box_sites
            ]
        )
        box_is_close = tolerance(jnp.min(dists), margin=2 * self._box_size)
        hand_to_target = jnp.linalg.norm(
            sites[self._grasp_site] - target
        )
        hand_is_far = tolerance(
            hand_to_target, bounds=(0.1, float("inf")), margin=0.01
        )
        return box_is_close * hand_is_far


@functools.lru_cache(maxsize=8)
def _dog_model(task: str):
    import mujoco
    from dm_control.suite import dog

    speeds = {"stand": 1.0, "walk": 1.0, "trot": 3.0, "run": 9.0}
    if task == "fetch":
        xml, assets = dog.get_model_and_assets(remove_ball=False)
    else:
        xml, assets = dog.get_model_and_assets(
            floor_size=speeds[task] * 15
        )
    m = mujoco.MjModel.from_xml_string(xml.decode(), assets)
    return from_mj_model(m), m


class DogEnv(DmcEnv):
    """dog:{stand,walk,trot,run,fetch}.

    85-dof dog with tendon-driven filtered actuators (tau 0.05; the
    filter is integrated analytically per control step).  Feet/palm touch
    and force sensors are approximated from the penalty-contact normal
    forces; ball-mouth contact (fetch) is not modelled — the fetch reward
    keeps its exact factored form on ball/mouth/target distances
    (documented approximation).
    """

    DOMAIN = "dog"
    CONTROL_TIMESTEP = 0.015
    DEFAULT_CONFIG = dict(DmcEnv.DEFAULT_CONFIG, substeps=2)

    def _load_model(self):
        return _dog_model(str(self.config["task_name"]) or "stand")

    def __init__(self, config):
        super().__init__(config)
        import mujoco

        m = self._mj_model
        hinges = [j for j in range(m.njnt) if int(m.jnt_type[j]) == 3]
        self._hinge_qadr = np.asarray([m.jnt_qposadr[j] for j in hinges])
        self._hinge_dadr = np.asarray([m.jnt_dofadr[j] for j in hinges])
        self._torso = self.body_index("torso")
        self._pelvis = self.body_index("pelvis")
        self._skull = self.body_index("skull")
        # Foot bodies for the touch/force approximations.
        self._foot_bodies = {}
        for name in ("foot_L", "foot_R", "hand_L", "hand_R"):
            # force/touch sensor sites sit on these bodies (or nearest).
            for cand in (name, name.replace("foot", "sole").replace(
                    "hand", "palm")):
                if cand in self.model.body_names:
                    self._foot_bodies[name] = self.body_index(cand)
                    break
            else:
                self._foot_bodies[name] = self._torso
        tau = float(self.model.act_dynprm[0])
        T = self.control_dt
        self._act_decay = float(np.exp(-T / tau))
        self._act_mean_w = float(tau / T * (1.0 - np.exp(-T / tau)))
        self._act_lo = m.actuator_ctrlrange[:, 0].astype(np.float32)
        self._act_hi = m.actuator_ctrlrange[:, 1].astype(np.float32)
        # Stand-height targets from the default pose.
        Rs, ps = fk(self.model, jnp.asarray(self.model.qpos0, jnp.float32))
        h = np.asarray(ps)[[self._torso, self._pelvis], 2]
        self._stand_height = 0.9 * h
        mass = np.asarray(self.model.body_mass)
        # torso subtree = everything attached below the root (skip world
        # and the free ball).
        sub = np.ones(len(mass), bool)
        sub[0] = False
        if "ball" in self.model.body_names:
            sub[self.model.body_names.index("ball")] = False
        self._body_weight = 9.81 * float(mass[sub].sum())
        if self.task == "fetch":
            self._ball = self.body_index("ball")
            jid = mujoco.mj_name2id(
                m, mujoco.mjtObj.mjOBJ_JOINT, "ball_root"
            )
            self._ball_qadr = int(m.jnt_qposadr[jid])
            self._ball_dadr = int(m.jnt_dofadr[jid])
            gfl = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_GEOM, "floor")
            gt = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_GEOM, "target")
            self._floor_r = float(m.geom_size[gfl][0])
            self._target_r = float(m.geom_size[gt][0])
            self._target_pos = m.geom_pos[gt].copy()
            sh = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_SITE, "head")
            self._head_body = int(m.site_bodyid[sh])
            self._head_local = m.site_pos[sh].copy()
            self._bite_r = float(
                m.site_size[
                    mujoco.mj_name2id(
                        m, mujoco.mjtObj.mjOBJ_SITE, "upper_bite"
                    )
                ][0]
            )
            self._bite_sites = [
                self.model.site_names.index(s)
                for s in ("upper_bite", "lower_bite")
            ]

    def _extras_spec(self):
        return {"act": (self.model.nu,), "prev_v": (3,)}

    def init_state(self, key):
        ka, kv, kact, kb = jax.random.split(key, 4)
        qpos = jnp.asarray(self.model.qpos0, jnp.float32)
        az = jax.random.uniform(ka, (), jnp.float32, 0, 2 * jnp.pi)
        quat = jnp.stack(
            [jnp.cos(az / 2), 0.0 * az, 0.0 * az, jnp.sin(az / 2)]
        )
        qpos = qpos.at[3:7].set(quat)
        qvel = jnp.zeros(self.model.nv, jnp.float32)
        v = 2.0 * jax.random.normal(kv, (3,), jnp.float32)
        qvel = qvel.at[0].set(v[0]).at[1].set(v[1]).at[5].set(v[2])
        act = jax.random.uniform(
            kact, (self.model.nu,), jnp.float32,
            jnp.asarray(self._act_lo), jnp.asarray(self._act_hi),
        )
        if self.task == "fetch":
            k1, k2, k3, k4 = jax.random.split(kb, 4)
            radius = 0.75 * self._floor_r
            baz = jax.random.uniform(k1, (), jnp.float32, 0, 2 * jnp.pi)
            pos = jnp.stack(
                [radius * jnp.sin(baz), radius * jnp.cos(baz),
                 jnp.float32(0.05)]
            )
            qpos = qpos.at[self._ball_qadr : self._ball_qadr + 3].set(pos)
            h = jax.random.uniform(k2, (), jnp.float32, 0.0, 3.0)
            vz = jnp.sqrt(2 * 9.81 * h)
            sp = jax.random.uniform(k3, (), jnp.float32, 0.0, 5.0)
            noise = 0.05 * jax.random.normal(k4, (2,), jnp.float32)
            d = jnp.stack([-jnp.sin(baz) + noise[0], -jnp.cos(baz) + noise[1]])
            qvel = qvel.at[self._ball_dadr : self._ball_dadr + 2].set(sp * d)
            qvel = qvel.at[self._ball_dadr + 2].set(vz)
        return qpos, qvel, {"act": act, "prev_v": jnp.zeros(3, jnp.float32)}

    # -- observables -------------------------------------------------------

    def _com_velocity(self, qpos, qvel):
        from ...physics.dynamics import _vel_observables

        v_com, _, _ = _vel_observables(self.model, qpos, qvel)
        mass = jnp.asarray(self.model.body_mass, jnp.float32)
        return (mass[:, None] * v_com).sum(0) / mass.sum()

    def _foot_force_normals(self, qpos):
        from ...physics.dynamics import _contact_points

        Rs, ps = fk(self.model, qpos)
        centers = _contact_points(self.model, Rs, ps)
        radius = jnp.asarray(self.model.con_radius, jnp.float32)
        pen = radius - centers[:, 2]
        fn = jnp.maximum(self.contact.kp * pen, 0.0)
        cb = np.asarray(self.model.con_body)
        out = {}
        for name, body in self._foot_bodies.items():
            idx = np.flatnonzero(cb == body)
            out[name] = (
                fn[jnp.asarray(idx)].sum() if len(idx) else jnp.float32(0.0)
            )
        return out

    def observe_dmc(self, qpos, qvel, extras):
        from ...physics.kinematics import body_vel

        (Rs, ps), (_, vels) = body_vel(self.model, qpos, qvel)
        R = Rs[self._torso]
        zproj = jnp.stack(
            [Rs[b][:, 2] for b in (self._skull, self._torso, self._pelvis)]
        )
        com_v = self._com_velocity(qpos, qvel)
        forces = self._foot_force_normals(qpos)
        acc = (
            (vels[self._torso] - extras["prev_v"]) / self.control_dt
            - jnp.asarray([0.0, 0.0, -9.81])
        ) @ R
        obs = {
            "joint_angles": qpos[jnp.asarray(self._hinge_qadr)],
            "joint_velocites": qvel[jnp.asarray(self._hinge_dadr)],
            "torso_pelvis_height": jnp.stack(
                [ps[self._torso][2], ps[self._pelvis][2]]
            ),
            "z_projection": zproj.reshape(-1),
            "torso_com_velocity": com_v @ R,
            "inertial_sensors": jnp.concatenate(
                [acc, vels[self._torso] @ R, qvel[3:6]]
            ),
            "foot_forces": jnp.concatenate(
                [
                    jnp.stack([0.0 * forces[n], 0.0 * forces[n], forces[n]])
                    for n in ("foot_L", "foot_R", "hand_L", "hand_R")
                ]
            ),
            "touch_sensors": jnp.stack(
                [
                    forces[n]
                    for n in ("hand_L", "hand_R", "foot_L", "foot_R")
                ]
            ),
            "actuator_state": extras["act"],
        }
        if self.task == "fetch":
            Rh = Rs[self._head_body]
            head = ps[self._head_body] + Rh @ jnp.asarray(
                self._head_local, jnp.float32
            )
            ball = ps[self._ball]
            ball_v = qvel[self._ball_dadr : self._ball_dadr + 3]
            obs["ball_state"] = jnp.concatenate(
                [(ball - head) @ Rh, (ball_v - vels[self._head_body]) @ Rh]
            )
            obs["target_position"] = (
                jnp.asarray(self._target_pos, jnp.float32) - head
            ) @ Rh
        return obs

    # -- stepping with activation filter -----------------------------------

    def step_env(self, state, action, key):
        action = jnp.reshape(action, (self.model.nu,)).astype(jnp.float32)
        act = state["extras"]["act"]
        ctrl_eff = action + (act - action) * self._act_mean_w
        act_next = action + (act - action) * self._act_decay
        from ...physics.kinematics import body_vel

        (_, _), (_, vels_prev) = body_vel(
            self.model, state["qpos"], state["qvel"]
        )
        qpos, qvel = phys_step(
            self.model,
            state["qpos"],
            state["qvel"],
            ctrl_eff,
            self.substeps,
            self.contact,
            self.n_sub_steps,
        )
        extras = {"act": act_next, "prev_v": vels_prev[self._torso]}
        st = {"qpos": qpos, "qvel": qvel, "extras": extras}
        reward = self.reward_dmc(qpos, qvel, action, extras)
        return EnvOut(
            state=st,
            obs=self._obs_dict(st),
            reward=jnp.asarray(reward, jnp.float32),
            terminated=jnp.bool_(False),
            discount=jnp.float32(1.0),
        )

    # -- rewards -----------------------------------------------------------

    def _stand_factors(self, qpos, qvel):
        Rs, ps = fk(self.model, qpos)
        torso = tolerance(
            ps[self._torso][2],
            bounds=(float(self._stand_height[0]), float("inf")),
            margin=float(self._stand_height[0]),
        )
        pelvis = tolerance(
            ps[self._pelvis][2],
            bounds=(float(self._stand_height[1]), float("inf")),
            margin=float(self._stand_height[1]),
        )
        min_cos = float(np.cos(np.deg2rad(30)))
        upright_vals = jnp.stack(
            [
                Rs[b][2, 2]
                for b in (self._skull, self._torso, self._pelvis)
            ]
        )
        upright = tolerance(
            upright_vals,
            bounds=(min_cos, float("inf")),
            sigmoid="linear",
            margin=min_cos + 1,
            value_at_margin=0.0,
        )
        forces = self._foot_force_normals(qpos)
        touch_sum = sum(forces.values())
        touch = tolerance(
            touch_sum,
            bounds=(self._body_weight, float("inf")),
            margin=self._body_weight,
            sigmoid="linear",
            value_at_margin=0.9,
        )
        return jnp.concatenate(
            [torso[None], pelvis[None], upright, touch[None]]
        )

    def reward_dmc(self, qpos, qvel, action, extras):
        factors = self._stand_factors(qpos, qvel)
        if self.task in ("walk", "trot", "run"):
            speed = {"walk": 1.0, "trot": 3.0, "run": 9.0}[self.task]
            from ...physics.kinematics import fk as _fk

            R = self.xmat(qpos)[self._torso]
            fwd = (self._com_velocity(qpos, qvel) @ R)[0]
            forward = tolerance(
                fwd,
                bounds=(speed, 2 * speed),
                margin=max(1.0, speed),
                value_at_margin=0.0,
                sigmoid="linear",
            )
            forward = (4 * forward + 1) / 5
            factors = jnp.concatenate([factors, forward[None]])
        elif self.task == "fetch":
            from ...physics.dynamics import site_positions

            Rs, ps = fk(self.model, qpos)
            sites = site_positions(self.model, qpos)
            ball = ps[self._ball]
            mouth_d = 0.5 * (
                jnp.linalg.norm(ball - sites[self._bite_sites[0]])
                + jnp.linalg.norm(ball - sites[self._bite_sites[1]])
            )
            reach = tolerance(
                mouth_d,
                bounds=(0.0, self._bite_r),
                sigmoid="reciprocal",
                margin=2.0,
            )
            reach = (6 * reach + 1) / 7
            ball_target = jnp.linalg.norm(
                ball - jnp.asarray(self._target_pos, jnp.float32)
            )
            near = tolerance(
                ball_target,
                bounds=(0.0, self._target_r),
                sigmoid="reciprocal",
                margin=self._floor_r,
            )
            fetch_ball = (near + 1) / 2
            reach = jnp.where(ball_target < 2 * self._target_r, 1.0, reach)
            factors = jnp.concatenate(
                [factors, reach[None], fetch_ball[None]]
            )
        return jnp.prod(factors)
