"""Import all env family registrations (``envpool/entry.py:16-32`` analog)."""

import envpool_tpu.envs.atari.registration  # noqa: F401
import envpool_tpu.envs.board.registration  # noqa: F401
import envpool_tpu.envs.box2d.registration  # noqa: F401
import envpool_tpu.envs.classic_control.registration  # noqa: F401
import envpool_tpu.envs.gfootball.registration  # noqa: F401
import envpool_tpu.envs.highway.registration  # noqa: F401
import envpool_tpu.envs.jumanji.registration  # noqa: F401
import envpool_tpu.envs.metaworld.registration  # noqa: F401
import envpool_tpu.envs.minigrid.registration  # noqa: F401
import envpool_tpu.envs.myosuite.registration  # noqa: F401
import envpool_tpu.envs.mujoco_dmc.registration  # noqa: F401
import envpool_tpu.envs.mujoco_gym.registration  # noqa: F401
import envpool_tpu.envs.playground.registration  # noqa: F401
import envpool_tpu.envs.procgen.registration  # noqa: F401
import envpool_tpu.envs.robotics.registration  # noqa: F401
import envpool_tpu.envs.toy_text.registration  # noqa: F401
import envpool_tpu.envs.vizdoom.registration  # noqa: F401
from envpool_tpu.core.registry import register as _register

_register(
    task_id="HostCartPole-v1",
    import_path="envpool_tpu.runtime.host_env",
    env_cls="HostCartPolePool",
    max_episode_steps=500,
)

_register(
    task_id="Dummy-v0",
    import_path="envpool_tpu.envs.dummy",
    env_cls="DummyEnv",
)
