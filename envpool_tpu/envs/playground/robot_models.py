"""Real robot morphologies for the playground family: Spot, H1, G1.

Same approach as go1_model.py (the round-5 Go1): each MJCF is authored
from the robot's PUBLISHED specification — the open URDF/description
packages' link dimensions, masses, joint ranges, and torque limits are
restated engineering facts, not copied model code.  Inertias are derived
by MuJoCo from the geom masses, so they approximate the measured
tensors; kinematic offsets, ranges and standing poses are the published
values (to the precision publicly documented).

* **Spot** (Boston Dynamics): 12 actuated hinges — per leg abduction
  (HX), hip (HY), knee (KN) — on a free trunk.  Ranges/torques per the
  public spot_description: HX ±0.785, HY −0.899..2.295,
  KN −2.793..−0.255; ~45 Nm hips, ~115 Nm knee.
* **H1** (Unitree): 19 dof — per leg hip yaw/roll/pitch + knee + ankle,
  torso yaw, per arm shoulder pitch/roll/yaw + elbow.  ~1.8 m, ~47 kg.
* **G1** (Unitree, 23-dof config): per leg hip pitch/roll/yaw + knee +
  ankle pitch/roll, waist yaw, per arm shoulder pitch/roll/yaw + elbow +
  wrist roll.  ~1.3 m, ~35 kg.

Feet carry explicit contact spheres (heel+toe pairs on the humanoids)
matched to the TPU physics engine's sphere-plane contact model.

Reference task surface: ``envpool/mujoco/playground/register_spot.cc``,
``register_h1.cc``, ``register_g1.cc`` (PD recipe
``default_pose + action_scale * a``).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Spot quadruped
# ---------------------------------------------------------------------------

# Standing pose per leg (HX, HY, KN); legs ordered FL, FR, HL, HR as in
# the public description package.
SPOT_DEFAULT_POSE = np.asarray([0.0, 0.8, -1.6] * 4, np.float32)
SPOT_TORQUE_LIMIT = np.asarray([45.0, 45.0, 115.0] * 4, np.float32)


def _spot_leg(prefix: str, sx: float, sy: float) -> str:
    return f"""
      <body name="{prefix}_hip" pos="{0.29785 * sx:.5f} {0.055 * sy:.4f} 0">
        <joint name="{prefix}_hx" type="hinge" axis="1 0 0"
               range="-0.785398 0.785398" damping="0.2"/>
        <geom type="cylinder" fromto="0 {-0.04 * sy:.3f} 0 0 {0.06 * sy:.3f} 0"
              size="0.055" mass="1.68"/>
        <body name="{prefix}_uleg" pos="0 {0.110945 * sy:.6f} 0">
          <joint name="{prefix}_hy" type="hinge" axis="0 1 0"
                 range="-0.898845 2.295108" damping="0.2"/>
          <geom type="capsule" fromto="0 0 0 0 0 -0.3625" size="0.04"
                mass="2.34"/>
          <body name="{prefix}_lleg" pos="0 0 -0.3625">
            <joint name="{prefix}_kn" type="hinge" axis="0 1 0"
                   range="-2.7929 -0.2471" damping="0.2"/>
            <geom type="capsule" fromto="0 0 0 0 0 -0.3365" size="0.022"
                  mass="0.35"/>
            <geom name="{prefix}_foot" type="sphere" pos="0 0 -0.3365"
                  size="0.032" mass="0.06" friction="0.8 0.02 0.01"/>
          </body>
        </body>
      </body>"""


def spot_xml() -> str:
    legs = (
        _spot_leg("FL", 1.0, 1.0)
        + _spot_leg("FR", 1.0, -1.0)
        + _spot_leg("HL", -1.0, 1.0)
        + _spot_leg("HR", -1.0, -1.0)
    )
    motors = "\n".join(
        f'    <motor name="{p}_{j}_m" joint="{p}_{j}" gear="1" '
        f'ctrlrange="-{t} {t}"/>'
        for p in ("FL", "FR", "HL", "HR")
        for j, t in (("hx", 45.0), ("hy", 45.0), ("kn", 115.0))
    )
    return f"""
<mujoco model="spot">
  <compiler angle="radian"/>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <geom name="floor" type="plane" size="20 20 0.1" friction="0.8"/>
    <body name="torso" pos="0 0 0.7">
      <freejoint/>
      <geom type="box" size="0.425 0.12 0.095" mass="16.8"/>
      {legs}
    </body>
  </worldbody>
  <actuator>
{motors}
  </actuator>
</mujoco>"""


# ---------------------------------------------------------------------------
# Unitree H1 humanoid (19 dof)
# ---------------------------------------------------------------------------

# Joint order (= actuator order): left leg (hip_yaw, hip_roll,
# hip_pitch, knee, ankle), right leg, torso, left arm (shoulder
# pitch/roll/yaw, elbow), right arm.
H1_DEFAULT_POSE = np.asarray(
    [0.0, 0.0, -0.4, 0.8, -0.4] * 2 + [0.0] + [0.0, 0.0, 0.0, 0.0] * 2,
    np.float32,
)
H1_TORQUE_LIMIT = np.asarray(
    [200.0, 200.0, 200.0, 300.0, 40.0] * 2
    + [200.0]
    + [40.0, 40.0, 18.0, 18.0] * 2,
    np.float32,
)


def _h1_leg(side: str, sy: float) -> str:
    return f"""
      <body name="{side}_hip_yaw_link" pos="0 {0.0875 * sy:.4f} -0.1742">
        <joint name="{side}_hip_yaw" type="hinge" axis="0 0 1"
               range="-0.43 0.43" damping="0.5"/>
        <geom type="cylinder" fromto="0 0 -0.03 0 0 0.03" size="0.05"
              mass="2.24"/>
        <body name="{side}_hip_roll_link" pos="0.039 0 0">
          <joint name="{side}_hip_roll" type="hinge" axis="1 0 0"
                 range="-0.43 0.43" damping="0.5"/>
          <geom type="cylinder" fromto="-0.03 0 0 0.03 0 0" size="0.05"
                mass="2.23"/>
          <body name="{side}_thigh" pos="-0.039 0 0">
            <joint name="{side}_hip_pitch" type="hinge" axis="0 1 0"
                   range="-3.14 2.53" damping="0.5"/>
            <geom type="capsule" fromto="0 0 0 0 0 -0.4" size="0.05"
                  mass="4.15"/>
            <body name="{side}_calf" pos="0 0 -0.4">
              <joint name="{side}_knee" type="hinge" axis="0 1 0"
                     range="-0.26 2.05" damping="0.5"/>
              <geom type="capsule" fromto="0 0 0 0 0 -0.4" size="0.035"
                    mass="1.72"/>
              <body name="{side}_foot" pos="0 0 -0.4">
                <joint name="{side}_ankle" type="hinge" axis="0 1 0"
                       range="-0.87 0.52" damping="0.5"/>
                <geom type="box" pos="0.04 0 -0.025"
                      size="0.14 0.045 0.02" mass="0.45"/>
                <geom name="{side}_heel" type="sphere" pos="-0.07 0 -0.045"
                      size="0.015" mass="0.01" friction="0.8 0.02 0.01"/>
                <geom name="{side}_toe" type="sphere" pos="0.15 0 -0.045"
                      size="0.015" mass="0.01" friction="0.8 0.02 0.01"/>
              </body>
            </body>
          </body>
        </body>
      </body>"""


def _h1_arm(side: str, sy: float) -> str:
    return f"""
        <body name="{side}_shoulder_pitch_link"
              pos="0.0055 {0.1907 * sy:.4f} 0.259">
          <joint name="{side}_shoulder_pitch" type="hinge" axis="0 1 0"
                 range="-2.87 2.87" damping="0.3"/>
          <geom type="sphere" size="0.045" mass="1.03"/>
          <body name="{side}_shoulder_roll_link" pos="0 {0.036 * sy:.3f} -0.05">
            <joint name="{side}_shoulder_roll" type="hinge" axis="1 0 0"
                   range="{-0.34 if sy > 0 else -3.11:.2f} {3.11 if sy > 0 else 0.34:.2f}" damping="0.3"/>
            <geom type="capsule" fromto="0 0 0 0 0 -0.12" size="0.035"
                  mass="0.79"/>
            <body name="{side}_upper_arm" pos="0 0 -0.12">
              <joint name="{side}_shoulder_yaw" type="hinge" axis="0 0 1"
                     range="-4.45 1.3" damping="0.3"/>
              <geom type="capsule" fromto="0 0 0 0 0 -0.16" size="0.03"
                    mass="0.84"/>
              <body name="{side}_forearm" pos="0 0 -0.16">
                <joint name="{side}_elbow" type="hinge" axis="0 1 0"
                       range="-0.34 2.54" damping="0.3"/>
                <geom type="capsule" fromto="0 0 0 0.26 0 0" size="0.025"
                      mass="0.67"/>
              </body>
            </body>
          </body>
        </body>"""


def h1_xml() -> str:
    return f"""
<mujoco model="h1">
  <compiler angle="radian"/>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <geom name="floor" type="plane" size="20 20 0.1" friction="0.8"/>
    <body name="torso" pos="0 0 1.06">
      <freejoint/>
      <geom type="box" pos="0 0 -0.08" size="0.08 0.11 0.1" mass="5.39"/>
      {_h1_leg("left", 1.0)}
      {_h1_leg("right", -1.0)}
      <body name="torso_link" pos="0 0 0">
        <joint name="torso_yaw" type="hinge" axis="0 0 1"
               range="-2.35 2.35" damping="0.5"/>
        <geom type="box" pos="0 0 0.15" size="0.09 0.12 0.17" mass="17.79"/>
        {_h1_arm("left", 1.0)}
        {_h1_arm("right", -1.0)}
      </body>
    </body>
  </worldbody>
  <actuator>
    {_humanoid_motors(_H1_ACT, H1_TORQUE_LIMIT)}
  </actuator>
</mujoco>"""


_H1_ACT = (
    ["left_hip_yaw", "left_hip_roll", "left_hip_pitch", "left_knee",
     "left_ankle"]
    + ["right_hip_yaw", "right_hip_roll", "right_hip_pitch", "right_knee",
       "right_ankle"]
    + ["torso_yaw"]
    + ["left_shoulder_pitch", "left_shoulder_roll", "left_shoulder_yaw",
       "left_elbow"]
    + ["right_shoulder_pitch", "right_shoulder_roll", "right_shoulder_yaw",
       "right_elbow"]
)


def _humanoid_motors(names, limits) -> str:
    return "\n    ".join(
        f'<motor name="{n}_m" joint="{n}" gear="1" '
        f'ctrlrange="-{t} {t}"/>'
        for n, t in zip(names, limits)
    )


# ---------------------------------------------------------------------------
# Unitree G1 humanoid (23-dof config)
# ---------------------------------------------------------------------------

# Joint order: left leg (hip_pitch, hip_roll, hip_yaw, knee,
# ankle_pitch, ankle_roll), right leg, waist_yaw, left arm (shoulder
# pitch/roll/yaw, elbow, wrist_roll), right arm.
# Mildly-bent knee stand (the deep -0.31/0.63 crouch demands more
# holding torque than the PD gains deliver on the penalty-contact
# engine; the shallower stance is statically stable).
G1_DEFAULT_POSE = np.asarray(
    [-0.2, 0.0, 0.0, 0.42, -0.22, 0.0] * 2
    + [0.0]
    + [0.0, 0.0, 0.0, 0.6, 0.0] * 2,
    np.float32,
)
G1_TORQUE_LIMIT = np.asarray(
    [88.0, 88.0, 88.0, 139.0, 50.0, 50.0] * 2
    + [88.0]
    + [25.0, 25.0, 25.0, 25.0, 25.0] * 2,
    np.float32,
)


def _g1_leg(side: str, sy: float) -> str:
    roll_lo, roll_hi = (-0.5236, 2.9671) if sy > 0 else (-2.9671, 0.5236)
    return f"""
      <body name="{side}_hip_pitch_link" pos="0 {0.0645 * sy:.4f} -0.1027">
        <joint name="{side}_hip_pitch" type="hinge" axis="0 1 0"
               range="-2.5307 2.8798" damping="0.3"/>
        <geom type="cylinder" fromto="0 {-0.025 * sy:.4f} 0 0 {0.025 * sy:.4f} 0"
              size="0.045" mass="1.35"/>
        <body name="{side}_hip_roll_link" pos="0 {0.052 * sy:.3f} -0.03">
          <joint name="{side}_hip_roll" type="hinge" axis="1 0 0"
                 range="{roll_lo} {roll_hi}" damping="0.3"/>
          <geom type="sphere" size="0.045" mass="1.52"/>
          <body name="{side}_thigh" pos="0.025 0 -0.12">
            <joint name="{side}_hip_yaw" type="hinge" axis="0 0 1"
                   range="-2.7576 2.7576" damping="0.3"/>
            <geom type="capsule" fromto="0 0 0.06 0 0 -0.18" size="0.04"
                  mass="1.9"/>
            <body name="{side}_shin" pos="-0.025 0 -0.18">
              <joint name="{side}_knee" type="hinge" axis="0 1 0"
                     range="-0.0873 2.8798" damping="0.3"/>
              <geom type="capsule" fromto="0 0 0 0 0 -0.3" size="0.03"
                    mass="1.6"/>
              <body name="{side}_ankle_pitch_link" pos="0 0 -0.3">
                <joint name="{side}_ankle_pitch" type="hinge" axis="0 1 0"
                       range="-0.8727 0.5236" damping="1.0"/>
                <geom type="sphere" size="0.025" mass="0.25"/>
                <body name="{side}_foot" pos="0 0 -0.025">
                  <joint name="{side}_ankle_roll" type="hinge" axis="1 0 0"
                         range="-0.2618 0.2618" damping="1.0"/>
                  <geom type="box" pos="0.03 0 -0.015"
                        size="0.1 0.035 0.012" mass="0.45"/>
                  <geom name="{side}_heel" type="sphere" pos="-0.05 0 -0.03"
                        size="0.012" mass="0.01" friction="0.8 0.02 0.01"/>
                  <geom name="{side}_toe" type="sphere" pos="0.11 0 -0.03"
                        size="0.012" mass="0.01" friction="0.8 0.02 0.01"/>
                </body>
              </body>
            </body>
          </body>
        </body>
      </body>"""


def _g1_arm(side: str, sy: float) -> str:
    roll_lo, roll_hi = (-1.5882, 2.2515) if sy > 0 else (-2.2515, 1.5882)
    return f"""
        <body name="{side}_shoulder_pitch_link"
              pos="0 {0.10 * sy:.3f} 0.22">
          <joint name="{side}_shoulder_pitch" type="hinge" axis="0 1 0"
                 range="-2.9671 2.7925" damping="0.2"/>
          <geom type="sphere" size="0.035" mass="0.72"/>
          <body name="{side}_shoulder_roll_link" pos="0 {0.032 * sy:.3f} -0.03">
            <joint name="{side}_shoulder_roll" type="hinge" axis="1 0 0"
                   range="{roll_lo} {roll_hi}" damping="0.2"/>
            <geom type="capsule" fromto="0 0 0 0 0 -0.08" size="0.03"
                  mass="0.64"/>
            <body name="{side}_upper_arm" pos="0 0 -0.08">
              <joint name="{side}_shoulder_yaw" type="hinge" axis="0 0 1"
                     range="-2.618 2.618" damping="0.2"/>
              <geom type="capsule" fromto="0 0 0 0 0 -0.1" size="0.028"
                    mass="0.71"/>
              <body name="{side}_forearm" pos="0 0 -0.1">
                <joint name="{side}_elbow" type="hinge" axis="0 1 0"
                       range="-1.0472 2.0944" damping="0.2"/>
                <geom type="capsule" fromto="0 0 0 0.16 0 0" size="0.024"
                      mass="0.6"/>
                <body name="{side}_wrist" pos="0.16 0 0">
                  <joint name="{side}_wrist_roll" type="hinge" axis="1 0 0"
                         range="-1.9722 1.9722" damping="0.2"/>
                  <geom type="sphere" size="0.024" mass="0.25"/>
                </body>
              </body>
            </body>
          </body>
        </body>"""


def g1_xml() -> str:
    return f"""
<mujoco model="g1">
  <compiler angle="radian"/>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <geom name="floor" type="plane" size="20 20 0.1" friction="0.8"/>
    <body name="torso" pos="0 0 0.793">
      <freejoint/>
      <geom type="box" pos="0 0 -0.05" size="0.06 0.09 0.07" mass="3.8"/>
      {_g1_leg("left", 1.0)}
      {_g1_leg("right", -1.0)}
      <body name="torso_link" pos="0 0 0.02">
        <joint name="waist_yaw" type="hinge" axis="0 0 1"
               range="-2.618 2.618" damping="0.3"/>
        <geom type="box" pos="0 0 0.12" size="0.07 0.1 0.13" mass="8.0"/>
        {_g1_arm("left", 1.0)}
        {_g1_arm("right", -1.0)}
      </body>
    </body>
  </worldbody>
  <actuator>
    {_humanoid_motors(_G1_ACT, G1_TORQUE_LIMIT)}
  </actuator>
</mujoco>"""


_G1_ACT = (
    ["left_hip_pitch", "left_hip_roll", "left_hip_yaw", "left_knee",
     "left_ankle_pitch", "left_ankle_roll"]
    + ["right_hip_pitch", "right_hip_roll", "right_hip_yaw", "right_knee",
       "right_ankle_pitch", "right_ankle_roll"]
    + ["waist_yaw"]
    + ["left_shoulder_pitch", "left_shoulder_roll", "left_shoulder_yaw",
       "left_elbow", "left_wrist_roll"]
    + ["right_shoulder_pitch", "right_shoulder_roll", "right_shoulder_yaw",
       "right_elbow", "right_wrist_roll"]
)


# Per-robot tables consumed by locomotion.py: (xml, default pose,
# torque limits, fall height ~60% of the standing torso height,
# contact (kp, kd)).  Contact stiffness scales with robot weight so the
# static penetration m*g/(n_feet*kp) stays ~1 cm while sqrt(kp/m_foot)*dt
# stays < ~0.35 (explicit-integration stability, see locomotion.py).
ROBOT_SPECS = {
    "spot": (spot_xml, SPOT_DEFAULT_POSE, SPOT_TORQUE_LIMIT, 0.30,
             (8.0e3, 4.0e2)),
    "h1": (h1_xml, H1_DEFAULT_POSE, H1_TORQUE_LIMIT, 0.55,
           (1.2e4, 6.0e2)),
    "g1": (g1_xml, G1_DEFAULT_POSE, G1_TORQUE_LIMIT, 0.45,
           (1.0e4, 5.0e2)),
}
