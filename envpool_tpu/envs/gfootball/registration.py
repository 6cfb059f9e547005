"""gfootball registration — 18 scenarios
(``envpool/gfootball/registration.py:17-47``)."""

from ...core.registry import register

_PATH = "envpool_tpu.envs.gfootball"

_SCENARIOS = (
    ("11_vs_11_competition", 3000),
    ("11_vs_11_easy_stochastic", 3000),
    ("11_vs_11_hard_stochastic", 3000),
    ("11_vs_11_kaggle", 3000),
    ("11_vs_11_stochastic", 3000),
    ("1_vs_1_easy", 500),
    ("5_vs_5", 3000),
    ("academy_3_vs_1_with_keeper", 400),
    ("academy_corner", 400),
    ("academy_counterattack_easy", 400),
    ("academy_counterattack_hard", 400),
    ("academy_empty_goal", 400),
    ("academy_empty_goal_close", 400),
    ("academy_pass_and_shoot_with_keeper", 400),
    ("academy_run_pass_and_shoot_with_keeper", 400),
    ("academy_run_to_score", 400),
    ("academy_run_to_score_with_keeper", 400),
    ("academy_single_goal_versus_lazy", 3000),
)

for _name, _steps in _SCENARIOS:
    register(
        task_id=f"gfootball/{_name}-v1",
        import_path=_PATH,
        env_cls="FootballEnv",
        env_name=_name,
        max_episode_steps=_steps,
    )
