"""Sharded-pool tests on the 8-device virtual CPU mesh.

The TPU answer to the reference's NUMA process sharding
(SURVEY.md §2.4): the env axis of the pool shards over a Mesh and the
engine step partitions with zero collectives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import envpool_tpu
from envpool_tpu.core.engine import Engine
from envpool_tpu.parallel import env_mesh, env_sharding


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    return env_mesh()


def test_sharded_pool_step(mesh) -> None:
    sharding = env_sharding(mesh)
    n = 64  # divisible by 8 devices
    env = envpool_tpu.make_spec(
        "CartPole-v1", num_envs=n, seed=0, sharding=sharding
    ).env
    engine = Engine.shared(env, sharding)
    ps = engine.init()
    # The pool state is actually laid out across all devices.
    devs = {d for leaf in jax.tree_util.tree_leaves(ps) for d in leaf.devices()}
    assert len(devs) == len(mesh.devices.flatten())
    ps, ts = engine.reset(ps, jnp.ones(n, jnp.bool_))
    ps, ts = engine.step(ps, {"action": jnp.ones(n, jnp.int32)})
    assert np.isfinite(np.asarray(ts["obs"])).all()
    # Output inherits the sharding (propagated, no resharding inserted).
    assert len(set(ts["obs"].devices())) == len(mesh.devices.flatten())


def test_sharded_rollout_matches_unsharded(mesh) -> None:
    """Sharding must not change results (same program, partitioned)."""
    n = 32

    def run(sharding):
        env = envpool_tpu.make_spec(
            "CartPole-v1", num_envs=n, seed=5, sharding=sharding
        ).env
        engine = Engine(env, sharding)

        def policy(ts, key):
            return {
                "action": jax.random.bernoulli(key, 0.5, (n,)).astype(
                    jnp.int32
                )
            }

        roll = engine.make_rollout(policy, 20)
        ps = engine.init()
        _, traj = roll(ps, jax.random.PRNGKey(0))
        return np.asarray(traj["reward"])

    np.testing.assert_allclose(
        run(None), run(env_sharding(mesh)), rtol=1e-6
    )


def test_sharded_mujoco_pool(mesh) -> None:
    sharding = env_sharding(mesh)
    env = envpool_tpu.make_spec(
        "HalfCheetah-v4", num_envs=16, seed=0, sharding=sharding
    ).env
    engine = Engine.shared(env, sharding)
    ps = engine.init()
    ps, ts = engine.step(
        ps, {"action": jnp.zeros((16, 6), jnp.float32)}
    )
    assert np.isfinite(np.asarray(ts["obs"])).all()
