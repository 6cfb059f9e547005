"""Throughput benchmark: env-steps/s on the local chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology mirrors the reference's FPS accounting
(``benchmark/test_envpool.py:99-107``): total env frames / wall time, with
the policy-side work excluded (random actions).  The headline metric is
aggregate env-steps/s on CartPole-v1 with 16384 envs stepped through a
jitted ``lax.scan`` rollout — the TPU-native equivalent of the reference's
async mode at full saturation.

``vs_baseline`` compares against the BASELINE.json north star of 3M
env-steps/s aggregate (the reference's own best TPU-VM numbers are
359,559 FPS Atari async / 887,540 FPS MuJoCo async, ``BASELINE.md``).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

NUM_ENVS = 16384
STEPS = 1024
BASELINE = 3_000_000.0  # north-star target, env-steps/s


def bench_cartpole() -> float:
    from envpool_tpu.core.engine import Engine
    import envpool_tpu

    env = envpool_tpu.make_spec(
        "CartPole-v1", num_envs=NUM_ENVS, seed=0
    ).env
    engine = Engine.shared(env)

    def policy(ts, key):
        return {
            "action": jax.random.bernoulli(key, 0.5, (NUM_ENVS,)).astype(
                jnp.int32
            )
        }

    run = engine.make_rollout(policy, STEPS, collect=False)
    ps = engine.init()
    # Warmup / compile.
    ps, last = run(ps, jax.random.PRNGKey(0))
    jax.block_until_ready(last)
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        ps, last = run(ps, jax.random.PRNGKey(i + 1))
    jax.block_until_ready(last)
    dt = time.perf_counter() - t0
    return NUM_ENVS * STEPS * reps / dt


def main() -> None:
    fps = bench_cartpole()
    print(
        json.dumps(
            {
                "metric": "cartpole_env_steps_per_s",
                "value": round(fps, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(fps / BASELINE, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
