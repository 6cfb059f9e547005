"""Box2D registration (``envpool/box2d/registration.py``)."""

from ...core.registry import register

_PATH = "envpool_tpu.envs.box2d"

for version in ("v2", "v3"):
    register(
        task_id=f"LunarLander-{version}",
        import_path=_PATH,
        env_cls="LunarLanderEnv",
        continuous=False,
        max_episode_steps=1000,
        reward_threshold=200.0,
    )
    register(
        task_id=f"LunarLanderContinuous-{version}",
        import_path=_PATH,
        env_cls="LunarLanderEnv",
        continuous=True,
        max_episode_steps=1000,
        reward_threshold=200.0,
    )

register(
    task_id="BipedalWalker-v3",
    import_path=_PATH,
    env_cls="BipedalWalkerEnv",
    hardcore=False,
    max_episode_steps=1600,
    reward_threshold=300.0,
)
register(
    task_id="BipedalWalkerHardcore-v3",
    import_path=_PATH,
    env_cls="BipedalWalkerEnv",
    hardcore=True,
    max_episode_steps=2000,
    reward_threshold=300.0,
)

for version in ("v2", "v3"):
    register(
        task_id=f"CarRacing-{version}",
        import_path=_PATH,
        env_cls="CarRacingEnv",
        continuous=True,
        max_episode_steps=1000,
        reward_threshold=900.0,
        # v2 completes a lap at every tile; v3 at 95% (gym default).
        lap_complete_percent=0.95 if version == "v3" else 1.0,
    )
