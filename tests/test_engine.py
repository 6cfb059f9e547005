"""Engine semantics: determinism, auto-reset, truncation, async, xla."""

import jax
import jax.numpy as jnp
import numpy as np

import envpool_tpu


def _rollout_gym(env, steps, rng):
    obs, info = env.reset()
    traj = [obs]
    for _ in range(steps):
        act = rng.integers(0, 2, size=len(env)).astype(np.int32)
        obs, rew, term, trunc, info = env.step(act)
        traj.append(obs)
    return np.stack(traj)


def test_determinism_same_seed() -> None:
    """Same seed → bitwise identical trajectories (reference §4.4 analog)."""
    e1 = envpool_tpu.make("CartPole-v1", env_type="gymnasium", num_envs=8, seed=5)
    e2 = envpool_tpu.make("CartPole-v1", env_type="gymnasium", num_envs=8, seed=5)
    t1 = _rollout_gym(e1, 50, np.random.default_rng(0))
    t2 = _rollout_gym(e2, 50, np.random.default_rng(0))
    np.testing.assert_array_equal(t1, t2)

    e3 = envpool_tpu.make("CartPole-v1", env_type="gymnasium", num_envs=8, seed=6)
    t3 = _rollout_gym(e3, 50, np.random.default_rng(0))
    assert not np.array_equal(t1, t3)


def test_env_seed_list() -> None:
    """Per-env seed list overrides seed+env_id (core/env.h:101-110)."""
    e1 = envpool_tpu.make(
        "CartPole-v1", env_type="gymnasium", num_envs=4, env_seed=[9, 8, 7, 6]
    )
    e2 = envpool_tpu.make(
        "CartPole-v1", env_type="gymnasium", num_envs=4, env_seed=[9, 8, 7, 6]
    )
    o1, _ = e1.reset()
    o2, _ = e2.reset()
    np.testing.assert_array_equal(o1, o2)


def test_truncation_at_max_episode_steps() -> None:
    env = envpool_tpu.make(
        "Pendulum-v1", env_type="gymnasium", num_envs=2, max_episode_steps=5
    )
    env.reset()
    act = np.zeros((2, 1), dtype=np.float32)
    for t in range(1, 6):
        obs, rew, term, trunc, info = env.step(act)
        if t < 5:
            assert not trunc.any() and not term.any()
        else:
            assert trunc.all()
            # terminated = done & ~trunc → False on pure time-limit end.
            assert not term.any()
            assert (info["elapsed_step"] == 5).all()


def test_auto_reset_next_step() -> None:
    """After done, the next step returns a FIRST timestep of a new episode."""
    env = envpool_tpu.make_dm("CartPole-v1", num_envs=2, max_episode_steps=3)
    ts = env.reset()
    assert (ts.step_type == 0).all()
    act = np.ones(2, dtype=np.int32)
    for t in range(3):
        ts = env.step(act)
    assert (ts.step_type == 2).all()
    assert (ts.discount == 0.0).all()
    ts = env.step(act)  # auto-reset step
    assert (ts.step_type == 0).all()
    assert (ts.reward == 0.0).all()
    assert (ts.discount == 1.0).all()


def test_partial_reset() -> None:
    env = envpool_tpu.make("CartPole-v1", env_type="gymnasium", num_envs=4)
    env.reset()
    env.step(np.ones(4, dtype=np.int32))
    obs, info = env.reset(np.array([1, 3], dtype=np.int32))
    assert obs.shape == (2, 4)
    np.testing.assert_array_equal(info["env_id"], [1, 3])
    assert (info["elapsed_step"] == 0).all()
    # Un-reset envs keep their elapsed count.
    obs, rew, term, trunc, info = env.step(np.ones(4, dtype=np.int32))
    np.testing.assert_array_equal(info["elapsed_step"], [2, 1, 2, 1])


def test_reset_mask_option() -> None:
    env = envpool_tpu.make("CartPole-v1", env_type="gymnasium", num_envs=4)
    env.reset()
    obs, info = env.reset(
        options={"reset_mask": np.array([True, False, False, True])}
    )
    np.testing.assert_array_equal(info["env_id"], [0, 3])


def test_async_send_recv() -> None:
    """batch_size < num_envs: env_id routing through partial steps."""
    env = envpool_tpu.make(
        "CartPole-v1", env_type="gymnasium", num_envs=8, batch_size=4
    )
    assert env.is_async
    env.async_reset()
    seen = set()
    # 2 reset batches of 4 envs each, then 2 step batches.
    for _ in range(2):
        obs, rew, term, trunc, info = env.recv()
        env_id = info["env_id"]
        assert obs.shape == (4, 4)
        seen.update(env_id.tolist())
        env.send(np.ones(4, dtype=np.int32), env_id)
    assert seen == set(range(8))
    for _ in range(2):
        obs, rew, term, trunc, info = env.recv()
        assert (info["elapsed_step"] == 1).all()
        env.send(np.ones(4, dtype=np.int32), info["env_id"])
    for _ in range(2):
        obs, rew, term, trunc, info = env.recv()
        assert (info["elapsed_step"] == 2).all()


def test_xla_interface_scan() -> None:
    """Jitted rollout via the functional handle (examples/xla_step.py analog)."""
    env = envpool_tpu.make_dm("CartPole-v1", num_envs=16, seed=0)
    handle, recv, send, step = env.xla()

    def actor_step(carry, _):
        handle, _ = carry
        action = jnp.ones(16, dtype=jnp.int32)
        handle, ts = step(handle, action)
        return (handle, ts.reward), ts.reward

    @jax.jit
    def run(handle):
        (handle, _), rewards = jax.lax.scan(
            actor_step, (handle, jnp.zeros(16)), length=20
        )
        return rewards

    rewards = run(handle)
    assert rewards.shape == (20, 16)
    # First step after init is an auto-reset (reward 0), rest are 1.0 until
    # an episode ends.
    assert rewards[0].max() == 0.0
    assert rewards[1].min() == 1.0


def test_engine_rollout_helper() -> None:
    env = envpool_tpu.make_dm("CartPole-v1", num_envs=8, seed=0)
    engine = env.engine

    def policy(ts, key):
        return {"action": jax.random.bernoulli(key, 0.5, (8,)).astype(jnp.int32)}

    run = engine.make_rollout(policy, 100)
    ps, traj = run(env.pool_state, jax.random.PRNGKey(0))
    assert traj["reward"].shape == (100, 8)
    assert traj["done"].any()  # CartPole fails within 100 random steps


def test_numpy_output_false_returns_jax() -> None:
    env = envpool_tpu.make(
        "CartPole-v1", env_type="gymnasium", num_envs=2, numpy_output=False
    )
    obs, info = env.reset()
    assert isinstance(obs, jax.Array)


def test_save_load_state_roundtrip(tmp_path) -> None:
    """Checkpoint/resume (absent in the reference — SURVEY.md §5)."""
    env = envpool_tpu.make("CartPole-v1", env_type="gymnasium", num_envs=4, seed=9)
    env.reset()
    acts = np.ones(4, np.int32)
    for _ in range(3):
        env.step(acts)
    path = str(tmp_path / "pool.npz")
    env.save_state(path)
    obs_a, *_ = env.step(acts)
    # Diverge the live pool, then restore.
    for _ in range(5):
        env.step(acts)
    env.load_state(path)
    obs_b, *_ = env.step(acts)
    np.testing.assert_array_equal(obs_a, obs_b)


def test_xla_gymnasium_flavor() -> None:
    """xla() on the gymnasium adapter returns the 5-tuple inside jit."""
    env = envpool_tpu.make(
        "CartPole-v1", env_type="gymnasium", num_envs=8, seed=0,
        numpy_output=False,
    )
    handle, recv, send, step = env.xla()

    @jax.jit
    def two_steps(handle):
        handle, (obs, rew, term, trunc, info) = step(
            handle, jnp.ones(8, jnp.int32)
        )
        handle, (obs, rew, term, trunc, info) = step(
            handle, jnp.zeros(8, jnp.int32)
        )
        return obs, rew, info["elapsed_step"]

    obs, rew, elapsed = two_steps(handle)
    assert obs.shape == (8, 4)
    assert (np.asarray(elapsed) == 1).all()  # first step was the autoreset


def test_reset_partial_only_touches_addressed_rows():
    """engine.reset_partial must leave unaddressed envs' state and RNG
    untouched (the options={"reset_mask"} fast path)."""
    import jax.numpy as jnp
    import numpy as np

    import envpool_tpu
    from envpool_tpu.core.engine import Engine

    env = envpool_tpu.make_spec("CartPole-v1", num_envs=8, seed=5).env
    engine = Engine.shared(env)
    ps = engine.init()
    # Step twice so states diverge from reset.
    for i in range(3):
        ps, ts = engine.step(
            ps, {"action": jnp.zeros(8, jnp.int32)}
        )
    before = jax.tree_util.tree_map(lambda x: np.asarray(x), ps.env_state)
    keys_before = np.asarray(ps.key)
    ids = jnp.asarray([1, 4], jnp.int32)
    ps2, ts = engine.reset_partial(ps, ids)
    after = jax.tree_util.tree_map(lambda x: np.asarray(x), ps2.env_state)
    untouched = [i for i in range(8) if i not in (1, 4)]
    for leaf_b, leaf_a in zip(
        jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)
    ):
        np.testing.assert_array_equal(
            leaf_b[untouched], leaf_a[untouched]
        )
    np.testing.assert_array_equal(
        keys_before[untouched], np.asarray(ps2.key)[untouched]
    )
    # Addressed rows were re-keyed and timestep rows are FIRST.
    assert (np.asarray(ts["step_type"]) == 0).all()
    assert np.asarray(ts["info:env_id"]).tolist() == [1, 4]
    assert not np.array_equal(keys_before[[1, 4]], np.asarray(ps2.key)[[1, 4]])
