"""Sharded rollouts over a device mesh — the NUMA-scale-out replacement.

The reference scales across sockets with one process per NUMA node
(``benchmark/numa_test.sh``); the TPU-native equivalent shards the env
axis over a ``jax.sharding.Mesh`` so one jitted program drives every
chip, with zero cross-env communication (envs are independent) and a
single psum only where aggregation is wanted.

Run (CPU demo of the multi-chip path):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/multichip_rollout.py
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import envpool_tpu
from envpool_tpu.parallel import env_mesh, env_sharding


def main() -> None:
    n_dev = len(jax.devices())
    num_envs = 512 * n_dev
    sharding = env_sharding(env_mesh())  # NamedSharding on "env"
    env = envpool_tpu.make_spec(
        "CartPole-v1", num_envs=num_envs, seed=0, sharding=sharding
    ).env
    from envpool_tpu.core.engine import Engine

    engine = Engine.shared(env)

    def policy(ts, key):
        return {
            "action": jax.random.randint(
                key, (num_envs,), 0, 2, jnp.int32
            )
        }

    run = engine.make_rollout(policy, 256, collect=False)
    state = engine.init()
    state, last = run(state, jax.random.PRNGKey(0))
    print(
        f"{n_dev} devices, {num_envs} envs: mean final reward "
        f"{float(jnp.mean(last['reward'])):.3f}"
    )
    # Episode statistics aggregate with one psum-style reduction.
    print("rollout sharded over:", sharding)


if __name__ == "__main__":
    main()
