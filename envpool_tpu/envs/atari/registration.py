"""Atari-class registration.

The reference registers ~104 ALE ROMs as ``Xxx-v5``
(``envpool/atari/registration.py:21-35``) with ``max_episode_steps=108000``
raw frames / frame_skip = 27000 agent steps.  We register the games with
on-device cores; the same pipeline config surface applies.
"""

from ...core.registry import register

_PATH = "envpool_tpu.envs.atari"

register(
    task_id="Pong-v5",
    import_path=_PATH,
    env_cls="PongEnv",
    max_episode_steps=27000,
    task="pong",
)

register(
    task_id="Breakout-v5",
    import_path=_PATH,
    env_cls="BreakoutEnv",
    max_episode_steps=27000,
    task="breakout",
)

register(
    task_id="Freeway-v5",
    import_path=_PATH,
    env_cls="FreewayEnv",
    max_episode_steps=27000,
    task="freeway",
)

register(
    task_id="SpaceInvaders-v5",
    import_path=_PATH,
    env_cls="SpaceInvadersEnv",
    max_episode_steps=27000,
    task="space_invaders",
)
