"""MetaWorld v3 Sawyer env family (50 tasks).

Reference surface: ``envpool/mujoco/metaworld/`` — obs (39,), action
(4,) = xyz mocap delta (0.01 m/step, clamped to the hand box) + gripper
effort, info keys success/near_object/grasp_success/grasp_reward/
in_place_reward/obj_to_target/unscaled_reward
(``metaworld_env.h:49-88``)."""

from .._lazy import lazy_exports

_EXPORTS = {
    "SawyerEnv": "sawyer",
}

__getattr__, __dir__, __all__ = lazy_exports(__name__, _EXPORTS)
