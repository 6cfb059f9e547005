"""Shadow Dexterous Hand family — HandReach + HandManipulate{Block,Egg,Pen}.

Behavioral reference: ``envpool/mujoco/robotics/hand.h`` and
gymnasium_robotics ``envs/shadow_dexterous_hand/{reach,manipulate}.py``.
24 hinge joints, 20 position actuators (the four finger distal joints are
tendon-coupled to their PIP neighbour), dt = 0.04 s (20 substeps).

TPU-native design:

* Hand kinematics are *real*: the MJCF (with the mujoco-3-incompatible
  ``apirate`` attribute stripped) is loaded through ``physics.from_mjcf``
  and fingertip sites come from actual FK — HandReach is therefore a
  faithful kinematic task (achieved_goal responds exactly to joint
  motion).
* Joint dynamics: rate-limited position servo toward the absolute
  actuation target ``center + a * range`` (hand_env._set_action with
  ``relative_control=False``), tracking fraction calibrated against the
  oracle's step response (~0.25/step, cap 0.35 rad).
* HandManipulate object: surrogate contact dynamics — a deterministic
  finger-to-object twist coupling (object angular velocity = fixed mixing
  of joint velocities; position anchored to the palm with drift, dropped
  when the grasp opens).  This is NOT MuJoCo contact physics (documented
  approximation); goal sampling, quaternion goal distance, reward and
  success predicates are exact ports, lockstep-tested vs the pip oracle.
"""

from __future__ import annotations

import functools
import os
import re
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec

_DT = 0.04
_SERVO_GAIN = 0.25
_SERVO_CAP = 0.35

# 20 actuators → 24 joints (order: WRJ1..THJ0); the four distal J0 joints
# (FF/MF/RF/LF) are tendon-coupled to their J1 neighbour.
ACT_TO_JOINT = np.asarray(
    [0, 1, 2, 3, 4, 6, 7, 8, 10, 11, 12, 14, 15, 16, 17, 19, 20, 21, 22, 23]
)
COUPLED = np.asarray([(5, 4), (9, 8), (13, 12), (18, 17)])  # (J0, J1)

FINGERTIP_SITES = (
    "robot0:S_fftip",
    "robot0:S_mftip",
    "robot0:S_rftip",
    "robot0:S_lftip",
    "robot0:S_thtip",
)

# HandReach constants measured from the oracle (reach.py _env_setup).
PALM_XPOS = np.asarray([1.00558936, 0.96046261, 0.13999892], np.float32)
REACH_INIT_QPOS = np.asarray(
    [-0.1651, -0.3197, 0.1434, 0.3203, 0.7126, 0.6705, 0.0002, 0.3153,
     0.766, 0.7323, 0.0004, 0.3674, 0.712, 0.6699, 0.0525, -0.1362,
     0.3987, 0.7416, 0.7041, 0.0037, 0.5506, -0.0145, -0.0015, -0.7895],
    np.float32,
)
# Base (pre-randomization) object pose per manipulate model.
OBJ_INIT = {
    "hand/manipulate_block.xml": (1.005, 0.869, 0.1715),
    "hand/manipulate_egg.xml": (1.005, 0.87, 0.17),
    "hand/manipulate_pen.xml": (1.0056, 0.8752, 0.1466),
}
TARGET_POS_RANGE = np.asarray(
    [[-0.04, 0.04], [-0.06, 0.02], [0.0, 0.06]], np.float32
)


def patched_assets_dir() -> str:
    """Copy of gymnasium_robotics/envs/assets with mujoco<3-only XML
    attributes (``apirate``) stripped, cached under the temp dir."""
    import shutil

    import gymnasium_robotics

    base = os.path.join(
        os.path.dirname(gymnasium_robotics.__file__), "envs", "assets"
    )
    cache = os.path.join(tempfile.gettempdir(), "envpool_tpu_gr_assets")
    if not os.path.isdir(cache):
        tmp = cache + ".partial"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        shutil.copytree(base, tmp)
        for root, _, files in os.walk(tmp):
            for f in files:
                if f.endswith(".xml"):
                    p = os.path.join(root, f)
                    s = open(p).read()
                    s2 = re.sub(r'\sapirate="[^"]*"', "", s)
                    if s2 != s:
                        open(p, "w").write(s2)
        os.replace(tmp, cache)
    return cache


@functools.lru_cache(maxsize=8)
def _load_hand_model(xml_rel: str):
    """Load a gymnasium_robotics hand MJCF through the physics engine."""
    from ...physics import from_mjcf

    try:
        return from_mjcf(os.path.join(patched_assets_dir(), xml_rel))
    except (NotImplementedError, ValueError):
        return None


# -- quaternion helpers (wxyz, matching gymnasium_robotics.utils.rotations)


def quat_mul(a, b):
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_from_angle_axis(angle, axis):
    axis = axis / (jnp.linalg.norm(axis) + 1e-12)
    return jnp.concatenate(
        [jnp.cos(angle / 2)[None], jnp.sin(angle / 2) * axis]
    )


def _quat2mat(q):
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = jnp.sum(q * q, axis=-1)
    s = 2.0 / jnp.maximum(n, 1e-12)
    X, Y, Z = x * s, y * s, z * s
    wX, wY, wZ = w * X, w * Y, w * Z
    xX, xY, xZ = x * X, x * Y, x * Z
    yY, yZ, zZ = y * Y, y * Z, z * Z
    return jnp.stack(
        [
            jnp.stack([1.0 - (yY + zZ), xY - wZ, xZ + wY], axis=-1),
            jnp.stack([xY + wZ, 1.0 - (xX + zZ), yZ - wX], axis=-1),
            jnp.stack([xZ - wY, yZ + wX, 1.0 - (xX + yY)], axis=-1),
        ],
        axis=-2,
    )


def quat2euler(q):
    """Exact port of gymnasium_robotics rotations.quat2euler
    (mat2euler(quat2mat(q)) with its sign/axis conventions)."""
    m = _quat2mat(q)
    cy = jnp.sqrt(m[..., 2, 2] ** 2 + m[..., 1, 2] ** 2)
    cond = cy > 1e-6
    e2 = jnp.where(
        cond,
        -jnp.arctan2(m[..., 0, 1], m[..., 0, 0]),
        -jnp.arctan2(-m[..., 1, 0], m[..., 1, 1]),
    )
    e1 = -jnp.arctan2(-m[..., 0, 2], cy)
    e0 = jnp.where(cond, -jnp.arctan2(m[..., 1, 2], m[..., 2, 2]), 0.0)
    return jnp.stack([e0, e1, e2], axis=-1)


def euler2quat(e):
    """Exact port of rotations.euler2quat."""
    ai, aj, ak = e[..., 2] / 2, -e[..., 1] / 2, e[..., 0] / 2
    si, sj, sk = jnp.sin(ai), jnp.sin(aj), jnp.sin(ak)
    ci, cj, ck = jnp.cos(ai), jnp.cos(aj), jnp.cos(ak)
    cc, cs = ci * ck, ci * sk
    sc, ss = si * ck, si * sk
    return jnp.stack(
        [
            cj * cc + sj * ss,
            cj * cs - sj * sc,
            -(cj * ss + sj * cc),
            cj * sc - sj * cs,
        ],
        axis=-1,
    )


def _parallel_quats() -> np.ndarray:
    """The 24 cube-symmetry quaternions (rotations.get_parallel_rotations)."""
    import itertools

    def euler2mat_np(e):
        r, p, y = e
        Rx = np.array(
            [[1, 0, 0], [0, np.cos(r), -np.sin(r)], [0, np.sin(r), np.cos(r)]]
        )
        Ry = np.array(
            [[np.cos(p), 0, np.sin(p)], [0, 1, 0], [-np.sin(p), 0, np.cos(p)]]
        )
        Rz = np.array(
            [[np.cos(y), -np.sin(y), 0], [np.sin(y), np.cos(y), 0], [0, 0, 1]]
        )
        return Rz @ Ry @ Rx

    def mat2euler_np(m):
        sy = np.sqrt(m[0, 0] ** 2 + m[1, 0] ** 2)
        if sy > 1e-6:
            return np.array(
                [np.arctan2(m[2, 1], m[2, 2]), np.arctan2(-m[2, 0], sy),
                 np.arctan2(m[1, 0], m[0, 0])]
            )
        return np.array(
            [np.arctan2(-m[1, 2], m[1, 1]), np.arctan2(-m[2, 0], sy), 0.0]
        )

    mult90 = [0, np.pi / 2, -np.pi / 2, np.pi]
    out = []
    for euler in itertools.product(mult90, repeat=3):
        canonical = mat2euler_np(euler2mat_np(euler))
        canonical = np.round(canonical / (np.pi / 2))
        if canonical[0] == -2:
            canonical[0] = 2
        if canonical[2] == -2:
            canonical[2] = 2
        canonical *= np.pi / 2
        if all((canonical != rot).any() for rot in out):
            out.append(canonical)
    quats = []
    for e in out:
        r, p, y = e / 2
        quats.append(
            [
                np.cos(r) * np.cos(p) * np.cos(y)
                + np.sin(r) * np.sin(p) * np.sin(y),
                np.sin(r) * np.cos(p) * np.cos(y)
                - np.cos(r) * np.sin(p) * np.sin(y),
                np.cos(r) * np.sin(p) * np.cos(y)
                + np.sin(r) * np.cos(p) * np.sin(y),
                np.cos(r) * np.cos(p) * np.sin(y)
                - np.sin(r) * np.sin(p) * np.cos(y),
            ]
        )
    return np.asarray(quats, np.float32)


PARALLEL_QUATS = _parallel_quats()


class _HandBase(TpuEnv):
    """Shared 24-joint servo dynamics."""

    XML = "hand/reach.xml"

    def __init__(self, config):
        super().__init__(config)
        self.model = _load_hand_model(str(config["xml_file"]) or self.XML)
        # Hand joint ranges: from the loaded model's hinge joints when
        # available, else the known Shadow Hand ranges.
        self.jnt_lo, self.jnt_hi = self._hand_ranges()
        # Actuation center/range (absolute control, hand_env.py:66-90).
        a2j = ACT_TO_JOINT
        self.act_lo = self.jnt_lo[a2j]
        self.act_hi = self.jnt_hi[a2j]

    def _hand_ranges(self):
        lo = np.asarray(
            [-0.489, -0.698, -0.349, 0.0, 0.0, 0.0, -0.349, 0.0, 0.0, 0.0,
             -0.349, 0.0, 0.0, 0.0, 0.0, -0.349, 0.0, 0.0, 0.0, -1.047,
             0.0, -0.209, -0.524, -1.571],
            np.float32,
        )
        hi = np.asarray(
            [0.14, 0.489, 0.349, 1.571, 1.571, 1.571, 0.349, 1.571, 1.571,
             1.571, 0.349, 1.571, 1.571, 1.571, 0.785, 0.349, 1.571, 1.571,
             1.571, 1.047, 1.222, 0.209, 0.524, 0.0],
            np.float32,
        )
        return lo, hi

    def action_spec(self):
        return {"action": ArraySpec(jnp.float32, (20,), -1.0, 1.0)}

    def servo_step(self, qpos, qvel, action):
        """One 0.04 s control step of the 24-joint servo bank."""
        a = jnp.clip(action, -1.0, 1.0)
        center = jnp.asarray((self.act_lo + self.act_hi) / 2)
        rng = jnp.asarray((self.act_hi - self.act_lo) / 2)
        target20 = jnp.clip(
            center + a * rng, jnp.asarray(self.act_lo), jnp.asarray(self.act_hi)
        )
        target = jnp.zeros(24, jnp.float32).at[jnp.asarray(ACT_TO_JOINT)].set(
            target20
        )
        # Coupled distal joints share their PIP target.
        target = target.at[jnp.asarray(COUPLED[:, 0])].set(
            target[jnp.asarray(COUPLED[:, 1])]
        )
        delta = jnp.clip(_SERVO_GAIN * (target - qpos), -_SERVO_CAP, _SERVO_CAP)
        new_qpos = jnp.clip(
            qpos + delta, jnp.asarray(self.jnt_lo), jnp.asarray(self.jnt_hi)
        )
        new_qvel = (new_qpos - qpos) / _DT
        return new_qpos, new_qvel


class HandReachEnv(_HandBase):
    """HandReach — fingertips to target positions (faithful kinematics)."""

    DEFAULT_CONFIG = {
        "reward_threshold": 0.0,
        "xml_file": "hand/reach.xml",
        "reward_type": "sparse",
        "distance_threshold": 0.01,
    }

    def __init__(self, config):
        super().__init__(config)
        self.sparse = str(config["reward_type"]) == "sparse"
        self.thr = float(config["distance_threshold"])
        if self.model is not None:
            self._site_idx = [
                self.model.site_names.index(s) for s in FINGERTIP_SITES
            ]
        else:
            self._site_idx = None
        self.initial_goal = np.asarray(
            self._fingertips(jnp.asarray(REACH_INIT_QPOS))
        ).reshape(5, 3)

    def _fingertips(self, qpos):
        if self._site_idx is not None:
            from ...physics.dynamics import site_positions

            sites = site_positions(self.model, qpos)
            return sites[jnp.asarray(self._site_idx)].reshape(-1)
        # Fallback: linear surrogate around the initial pose.
        return jnp.asarray(self.initial_goal).reshape(-1)

    def state_spec(self):
        inf = float("inf")
        return {
            "obs:observation": ArraySpec(jnp.float32, (63,), -inf, inf),
            "obs:achieved_goal": ArraySpec(jnp.float32, (15,), -inf, inf),
            "obs:desired_goal": ArraySpec(jnp.float32, (15,), -inf, inf),
            "info:is_success": ArraySpec(jnp.float32, (), 0.0, 1.0),
            "info:distance": ArraySpec(jnp.float32, (), 0.0, inf),
        }

    def compute_reward(self, achieved, desired):
        d = jnp.linalg.norm(achieved - desired, axis=-1)
        if self.sparse:
            return -(d > self.thr).astype(jnp.float32)
        return -d

    def sample_goal(self, key):
        """reach.py _sample_goal — same law."""
        k1, k2, k3, k4 = jax.random.split(key, 4)
        finger_idx = jax.random.randint(k1, (), 0, 4)  # non-thumb
        thumb_idx = 4
        meeting = jnp.asarray(PALM_XPOS) + jnp.asarray([0.0, -0.09, 0.05])
        meeting = meeting + 0.005 * jax.random.normal(k2, (3,))
        goal = jnp.asarray(self.initial_goal)

        # Move thumb and the chosen finger toward the meeting point.
        def move(goal, idx):
            d = meeting - goal[idx]
            d = d / (jnp.linalg.norm(d) + 1e-12)
            return goal.at[idx].set(meeting - 0.005 * d)

        goal = move(goal, thumb_idx)
        # finger_idx indexes the 4 non-thumb fingers (order ff, mf, rf, lf).
        goal = jax.lax.switch(
            finger_idx,
            [lambda g: move(g, 0), lambda g: move(g, 1),
             lambda g: move(g, 2), lambda g: move(g, 3)],
            goal,
        )
        goal = jnp.where(
            jax.random.uniform(k4, ()) < 0.1,
            jnp.asarray(self.initial_goal),
            goal,
        )
        return goal.reshape(-1)

    def _obs(self, st):
        tips = self._fingertips(st["qpos"])
        d = jnp.linalg.norm(tips - st["goal"])
        return {
            "obs:observation": jnp.concatenate(
                [st["qpos"], st["qvel"], tips]
            ).astype(jnp.float32),
            "obs:achieved_goal": tips.astype(jnp.float32),
            "obs:desired_goal": st["goal"],
            "info:is_success": (d < self.thr).astype(jnp.float32),
            "info:distance": d,
        }

    def reset_env(self, key):
        st = {
            "qpos": jnp.asarray(REACH_INIT_QPOS),
            "qvel": jnp.zeros(24, jnp.float32),
            "goal": self.sample_goal(key).astype(jnp.float32),
        }
        return st, self._obs(st)

    def step_env(self, state, action, key):
        action = jnp.reshape(action, (20,)).astype(jnp.float32)
        qpos, qvel = self.servo_step(state["qpos"], state["qvel"], action)
        st = {"qpos": qpos, "qvel": qvel, "goal": state["goal"]}
        tips = self._fingertips(qpos)
        reward = self.compute_reward(tips, state["goal"])
        return EnvOut(
            state=st,
            obs=self._obs(st),
            reward=jnp.asarray(reward, jnp.float32),
            terminated=jnp.bool_(False),
        )


class HandManipulateEnv(_HandBase):
    """HandManipulate{Block,Egg,Pen} (+TouchSensors) via config."""

    DEFAULT_CONFIG = {
        "reward_threshold": 0.0,
        "xml_file": "hand/manipulate_block.xml",
        "reward_type": "sparse",
        "target_position": "random",    # random | ignore | fixed
        "target_rotation": "xyz",       # xyz | z | parallel | ignore | fixed
        "distance_threshold": 0.01,
        "rotation_threshold": 0.1,
        "randomize_initial_position": True,
        "randomize_initial_rotation": True,
        "ignore_z_target_rotation": False,
        "touch_get_obs": "off",         # off | boolean | sensordata
        "n_touch": 92,
    }

    def __init__(self, config):
        super().__init__(config)
        self.sparse = str(config["reward_type"]) == "sparse"
        self.pos_mode = str(config["target_position"])
        self.rot_mode = str(config["target_rotation"])
        self.d_thr = float(config["distance_threshold"])
        self.r_thr = float(config["rotation_threshold"])
        self.ignore_z = bool(config["ignore_z_target_rotation"])
        self.touch = str(config["touch_get_obs"])
        self.n_touch = int(config["n_touch"])
        xml = str(config["xml_file"])
        base_xml = xml.replace("_touch_sensors", "")
        self.obj_init = np.asarray(
            OBJ_INIT.get(base_xml, OBJ_INIT["hand/manipulate_block.xml"]),
            np.float32,
        )
        self.obs_dim = 61 + (self.n_touch if self.touch != "off" else 0)
        # Fixed finger→object twist coupling (surrogate dynamics): rows =
        # object ω_xyz, cols = hand qvel.  Wrist drives x/y tilt; finger
        # curls (FF..LF) drive rolling about x; thumb + abductions spin z.
        rng = np.random.default_rng(12345)
        W = np.zeros((3, 24), np.float32)
        W[0, [3, 4, 5, 7, 8, 9]] = 0.25      # curls → roll
        W[1, [0, 1]] = (0.6, 0.4)            # wrist → pitch
        W[1, [11, 12, 13]] = 0.2
        W[2, [2, 6, 10, 15, 19, 20]] = 0.3   # abduction + thumb → yaw
        W += 0.02 * rng.standard_normal((3, 24)).astype(np.float32)
        self.W = W

    # -- oracle-exact pure functions ---------------------------------------

    def goal_distance(self, a, b):
        """manipulate.py _goal_distance — exact (7-dim pose goals)."""
        d_pos = jnp.zeros(a.shape[:-1], jnp.float32)
        d_rot = jnp.zeros(a.shape[:-1], jnp.float32)
        if self.pos_mode != "ignore":
            d_pos = jnp.linalg.norm(a[..., :3] - b[..., :3], axis=-1)
        if self.rot_mode != "ignore":
            quat_a, quat_b = a[..., 3:], b[..., 3:]
            if self.ignore_z:
                ea = quat2euler(quat_a)
                eb = quat2euler(quat_b)
                ea = ea.at[..., 2].set(eb[..., 2])
                quat_a = euler2quat(ea)
            quat_diff = quat_mul(quat_a, quat_conj(quat_b))
            d_rot = 2 * jnp.arccos(jnp.clip(quat_diff[..., 0], -1.0, 1.0))
        return d_pos, d_rot

    def is_success(self, achieved, desired):
        d_pos, d_rot = self.goal_distance(achieved, desired)
        return (
            (d_pos < self.d_thr).astype(jnp.float32)
            * (d_rot < self.r_thr).astype(jnp.float32)
        )

    def compute_reward(self, achieved, desired):
        if self.sparse:
            return self.is_success(achieved, desired) - 1.0
        d_pos, d_rot = self.goal_distance(achieved, desired)
        return -(10.0 * d_pos + d_rot)

    def sample_goal(self, key, obj_pos):
        """manipulate.py _sample_goal — same law."""
        kp, kr1, kr2, kr3 = jax.random.split(key, 4)
        if self.pos_mode == "random":
            offset = jax.random.uniform(
                kp, (3,), jnp.float32,
                jnp.asarray(TARGET_POS_RANGE[:, 0]),
                jnp.asarray(TARGET_POS_RANGE[:, 1]),
            )
            target_pos = obj_pos + offset
        else:
            target_pos = obj_pos
        if self.rot_mode == "z":
            angle = jax.random.uniform(kr1, (), jnp.float32, -jnp.pi, jnp.pi)
            target_quat = quat_from_angle_axis(
                angle, jnp.asarray([0.0, 0.0, 1.0])
            )
        elif self.rot_mode == "parallel":
            angle = jax.random.uniform(kr1, (), jnp.float32, -jnp.pi, jnp.pi)
            zq = quat_from_angle_axis(angle, jnp.asarray([0.0, 0.0, 1.0]))
            idx = jax.random.randint(kr2, (), 0, len(PARALLEL_QUATS))
            target_quat = quat_mul(zq, jnp.asarray(PARALLEL_QUATS)[idx])
        elif self.rot_mode == "xyz":
            angle = jax.random.uniform(kr1, (), jnp.float32, -jnp.pi, jnp.pi)
            axis = jax.random.uniform(kr3, (3,), jnp.float32, -1.0, 1.0)
            target_quat = quat_from_angle_axis(angle, axis)
        else:
            target_quat = jnp.asarray([1.0, 0.0, 0.0, 0.0])
        target_quat = target_quat / jnp.linalg.norm(target_quat)
        return jnp.concatenate([target_pos, target_quat])

    # -- specs + dynamics --------------------------------------------------

    def state_spec(self):
        inf = float("inf")
        return {
            "obs:observation": ArraySpec(
                jnp.float32, (self.obs_dim,), -inf, inf
            ),
            "obs:achieved_goal": ArraySpec(jnp.float32, (7,), -inf, inf),
            "obs:desired_goal": ArraySpec(jnp.float32, (7,), -inf, inf),
            "info:is_success": ArraySpec(jnp.float32, (), 0.0, 1.0),
            "info:d_pos": ArraySpec(jnp.float32, (), 0.0, inf),
            "info:d_rot": ArraySpec(jnp.float32, (), 0.0, inf),
        }

    def _touch_obs(self, qpos, held):
        """Surrogate touch: segments report contact while flexed + held."""
        curl = jnp.clip(qpos[3:24], 0.0, 1.571) / 1.571
        base = jnp.tile(curl, 5)[: self.n_touch]
        val = base * held.astype(jnp.float32)
        if self.touch == "boolean":
            return (val > 0.3).astype(jnp.float32)
        return val * 5.0  # sensordata-scale

    def _obs(self, st):
        achieved = jnp.concatenate([st["obj_pos"], st["obj_quat"]])
        parts = [st["qpos"], st["qvel"], st["obj_vel"], achieved]
        if self.touch != "off":
            parts.insert(3, self._touch_obs(st["qpos"], st["held"]))
        d_pos, d_rot = self.goal_distance(achieved, st["goal"])
        return {
            "obs:observation": jnp.concatenate(parts).astype(jnp.float32),
            "obs:achieved_goal": achieved.astype(jnp.float32),
            "obs:desired_goal": st["goal"],
            "info:is_success": self.is_success(achieved, st["goal"]),
            "info:d_pos": d_pos,
            "info:d_rot": d_rot,
        }

    def reset_env(self, key):
        k_rot, k_pos, k_goal = jax.random.split(key, 3)
        quat = jnp.asarray([1.0, 0.0, 0.0, 0.0])
        if bool(self.config["randomize_initial_rotation"]):
            if self.rot_mode == "z":
                angle = jax.random.uniform(k_rot, (), jnp.float32, -jnp.pi, jnp.pi)
                off = quat_from_angle_axis(angle, jnp.asarray([0.0, 0.0, 1.0]))
                quat = quat_mul(quat, off)
            elif self.rot_mode == "parallel":
                k1, k2 = jax.random.split(k_rot)
                angle = jax.random.uniform(k1, (), jnp.float32, -jnp.pi, jnp.pi)
                zq = quat_from_angle_axis(angle, jnp.asarray([0.0, 0.0, 1.0]))
                idx = jax.random.randint(k2, (), 0, len(PARALLEL_QUATS))
                quat = quat_mul(
                    quat, quat_mul(zq, jnp.asarray(PARALLEL_QUATS)[idx])
                )
            elif self.rot_mode in ("xyz", "ignore"):
                k1, k2 = jax.random.split(k_rot)
                angle = jax.random.uniform(k1, (), jnp.float32, -jnp.pi, jnp.pi)
                axis = jax.random.uniform(k2, (3,), jnp.float32, -1.0, 1.0)
                quat = quat_mul(quat, quat_from_angle_axis(angle, axis))
        pos = jnp.asarray(self.obj_init)
        if (
            bool(self.config["randomize_initial_position"])
            and self.pos_mode != "fixed"
        ):
            pos = pos + 0.005 * jax.random.normal(k_pos, (3,))
        quat = quat / jnp.linalg.norm(quat)
        goal = self.sample_goal(k_goal, pos)
        st = {
            "qpos": jnp.zeros(24, jnp.float32),
            "qvel": jnp.zeros(24, jnp.float32),
            "obj_pos": pos.astype(jnp.float32),
            "obj_quat": quat.astype(jnp.float32),
            "obj_vel": jnp.zeros(6, jnp.float32),
            "held": jnp.bool_(True),
            "goal": goal.astype(jnp.float32),
        }
        return st, self._obs(st)

    def step_env(self, state, action, key):
        action = jnp.reshape(action, (20,)).astype(jnp.float32)
        qpos, qvel = self.servo_step(state["qpos"], state["qvel"], action)

        # Surrogate object dynamics: twist coupling from joint velocities.
        omega = jnp.asarray(self.W) @ qvel * _DT
        angle = jnp.linalg.norm(omega) + 1e-12
        dq = quat_from_angle_axis(angle, omega / angle)
        quat = quat_mul(dq, state["obj_quat"])
        quat = quat / jnp.linalg.norm(quat)

        # Grasp state: average curl of the four fingers holds the object.
        curl = jnp.mean(qpos[jnp.asarray([3, 4, 7, 8, 11, 12])])
        held = state["held"] & (curl > -0.2)
        # Anchored to the palm with small drift; drops when released.
        drift = 0.002 * jnp.tanh(jnp.asarray(self.W[0]) @ qvel)
        pos = state["obj_pos"] + jnp.asarray([0.0, 0.0, -0.0])
        pos = pos.at[0].add(jnp.where(held, drift, 0.0))
        pos = pos.at[2].add(jnp.where(held, 0.0, -0.05))  # falling
        obj_vel = jnp.concatenate(
            [(pos - state["obj_pos"]) / _DT, omega / _DT]
        )

        st = {
            "qpos": qpos,
            "qvel": qvel,
            "obj_pos": pos,
            "obj_quat": quat,
            "obj_vel": obj_vel,
            "held": held,
            "goal": state["goal"],
        }
        achieved = jnp.concatenate([pos, quat])
        reward = self.compute_reward(achieved, state["goal"])
        return EnvOut(
            state=st,
            obs=self._obs(st),
            reward=jnp.asarray(reward, jnp.float32),
            terminated=jnp.bool_(False),
        )
