"""Using envpool_tpu as a drop-in Gymnasium vector env (SB3-style loop).

The reference ships SB3/Tianshou/ACME adapters
(``examples/sb3_examples/ppo.py``); envpool_tpu's Gymnasium pools
already satisfy the ``gymnasium.vector.VectorEnv`` surface (NEXT_STEP
autoreset metadata, ``single_observation_space``/``single_action_space``),
so classic CPU RL libraries can consume them unchanged — this example
shows the generic collect loop those libraries run.

Run: ``python examples/sb3_style_vector_env.py``
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import envpool_tpu


def main() -> None:
    env = envpool_tpu.make(
        "HalfCheetah-v4", env_type="gymnasium", num_envs=64, seed=0,
        max_episode_steps=100
    )
    print("observation space:", env.observation_space)
    print("action space:", env.action_space)
    print("num_envs:", env.num_envs)
    print("autoreset mode:", env.metadata.get("autoreset_mode"))

    obs, info = env.reset()
    episode_returns = np.zeros(env.num_envs)
    finished: list[float] = []
    rng = np.random.default_rng(0)
    for step in range(500):
        actions = rng.uniform(-1, 1, (env.num_envs, 6)).astype(np.float32)
        obs, rewards, terminated, truncated, info = env.step(actions)
        episode_returns += rewards
        done = terminated | truncated
        if done.any():
            finished.extend(episode_returns[done].tolist())
            episode_returns[done] = 0.0
    print(
        f"collected {len(finished)} episodes; "
        f"mean return {np.mean(finished) if finished else float('nan'):.1f}"
    )


if __name__ == "__main__":
    main()
