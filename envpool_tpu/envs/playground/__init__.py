"""MuJoCo Playground env family (27 robot-suite tasks).

Reference surface: ``envpool/mujoco/playground/registration.py`` — 27
``{Task}-v1`` ids (+ ``MuJoCoPlayground/`` aliases) across Aloha,
Apollo, Barkour, BerkeleyHumanoid, G1, Go1, H1, Leap/Aero hand, Op3,
Panda(+Robotiq), Spot and T1.

TPU-native design note: the upstream tasks run MuJoCo Menagerie robot
models (not installed in this image, no egress).  Each task family here
keeps the reference's RL structure exactly — command sampling, PD
action interface (``action_scale`` around the default pose), tracking /
getup / pose reward terms with the registered per-task weights,
episode lengths — while the rigid-body dynamics run on
``envpool_tpu.physics`` with stand-in morphologies of matching actuator
counts (dm_control quadruped for Go1/Barkour/Spot-class, dm_control
humanoid for G1/H1/Apollo-class, operational-space arms for
Panda/Aloha, the Shadow-hand servo bank for Leap).  Documented
approximation: joint layouts differ from the Menagerie models."""

from .._lazy import lazy_exports

_EXPORTS = {
    "ArmPickEnv": "manipulation",
    "CubeRotateEnv": "manipulation",
    "GetupEnv": "locomotion",
    "HandstandEnv": "locomotion",
    "JoystickEnv": "locomotion",
}

__getattr__, __dir__, __all__ = lazy_exports(__name__, _EXPORTS)
