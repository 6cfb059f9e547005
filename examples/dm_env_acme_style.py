"""dm_env TimeStep loop (ACME-style) on envpool_tpu pools.

The reference exposes a dm_env flavor consumed by ACME
(``examples/acme_examples/``); envpool_tpu's ``make_dm`` returns pools
speaking the same ``TimeStep(step_type, reward, discount, observation)``
protocol with a namedtuple observation merging obs and info fields.

Run: ``python examples/dm_env_acme_style.py``
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import envpool_tpu


def main() -> None:
    env = envpool_tpu.make_dm("WalkerWalk-v1", num_envs=32, seed=0)
    print("observation spec:", type(env.observation_spec()).__name__)
    print("action spec:", env.action_spec())

    ts = env.reset()
    total = np.zeros(32)
    rng = np.random.default_rng(0)
    for _ in range(200):
        action = rng.uniform(-1, 1, (32, 6)).astype(np.float32)
        ts = env.step(action)
        total += np.asarray(ts.reward)
        # dm_control-style: discount stays 1.0 on time-limit-only tasks.
        assert np.all(np.asarray(ts.discount) == 1.0)
    print(f"mean 200-step return: {total.mean():.2f}")


if __name__ == "__main__":
    main()
