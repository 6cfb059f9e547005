"""Native host async executor tests (C++ runtime via ctypes).

The analog of the reference's C++ engine unit tests
(``core/action_buffer_queue_test.cc``, ``core/state_buffer_queue_test.cc``,
``dummy/dummy_envpool_test.cc``) — exercised through the ctypes surface.
"""

import numpy as np
import pytest

from envpool_tpu.runtime import HostAsyncPool


def test_sync_reset_and_step() -> None:
    pool = HostAsyncPool(num_envs=32, seed=0)
    try:
        states, env_ids, dones = pool.reset()
        assert states.shape == (32, 5)
        np.testing.assert_array_equal(env_ids, np.arange(32))
        assert np.abs(states[:, :4]).max() <= 0.05
        assert not dones.any()
        rng = np.random.default_rng(0)
        done_count = 0
        for _ in range(100):
            states, env_ids, dones = pool.step(
                rng.integers(0, 2, (32, 1)).astype(np.float32)
            )
            done_count += int(dones.sum())
        assert done_count > 0  # random CartPole fails
    finally:
        pool.close()


def test_sync_determinism() -> None:
    def run():
        pool = HostAsyncPool(num_envs=8, seed=7)
        try:
            pool.reset()
            acts = np.ones((8, 1), np.float32)
            for _ in range(5):
                states, _, _ = pool.step(acts)
            return states
        finally:
            pool.close()

    np.testing.assert_array_equal(run(), run())


def test_async_env_id_routing() -> None:
    pool = HostAsyncPool(num_envs=64, batch_size=16, seed=0)
    try:
        # Drain all in-flight batches BEFORE re-sending: once an env is
        # re-sent it can race back into a later batch ahead of slower
        # originals (completion-order semantics, as in the reference's
        # async mode), so interleaving send/recv here would be flaky.
        pool.send(np.zeros((64, 1), np.float32), force_reset=True)
        seen = set()
        batches = []
        for _ in range(4):
            states, env_ids, dones = pool.recv()
            assert states.shape == (16, 5)
            seen.update(env_ids.tolist())
            batches.append(env_ids)
        assert seen == set(range(64))
        for env_ids in batches:
            pool.send(np.ones((16, 1), np.float32), env_ids)
        for _ in range(4):
            states, env_ids, dones = pool.recv()
            assert len(set(env_ids.tolist())) == 16
    finally:
        pool.close()


def test_pipelined_batches_in_flight() -> None:
    """Multiple batches can be enqueued before any recv (buffer queue)."""
    pool = HostAsyncPool(num_envs=16, batch_size=4, seed=0)
    try:
        pool.send(np.zeros((16, 1), np.float32), force_reset=True)
        # 4 batches are now in flight; drain them all.
        ids = []
        for _ in range(4):
            _, env_ids, _ = pool.recv()
            ids.extend(env_ids.tolist())
        assert sorted(ids) == list(range(16))
    finally:
        pool.close()


def test_custom_step_fn_callback() -> None:
    """Python-callback env: state = env_id + action, done every step."""

    def step_fn(ctx, env_id, reset, action, state):
        state[0] = float(env_id) + (0.0 if reset else action[0])
        return 0

    pool = HostAsyncPool(
        num_envs=4, state_dim=1, action_dim=1, seed=0, step_fn=step_fn
    )
    try:
        states, env_ids, dones = pool.reset()
        np.testing.assert_allclose(states[:, 0], [0, 1, 2, 3])
        states, env_ids, dones = pool.step(
            np.full((4, 1), 10.0, np.float32)
        )
        np.testing.assert_allclose(states[:, 0], [10, 11, 12, 13])
    finally:
        pool.close()


def test_host_env_error_reporting() -> None:
    """A crashing env surfaces as HostEnvError (with traceback), does not
    hang recv, and leaves the pool usable."""
    from envpool_tpu.runtime.host_pool import HostEnvError

    def bad_step(ctx, env_id, reset, act, state):
        if env_id == 2 and not reset:
            raise ValueError("exploded")
        for i in range(5):
            state[i] = float(env_id)
        return 0

    pool = HostAsyncPool(num_envs=4, batch_size=4, step_fn=bad_step)
    try:
        pool.reset()
        with pytest.raises(HostEnvError) as ei:
            pool.step(np.zeros((4, 1), np.float32))
        assert 2 in ei.value.failures
        assert "exploded" in ei.value.failures[2]
        # executor still alive: full reset + step round-trips
        states, ids, dones = pool.reset()
        assert states.shape == (4, 5)
    finally:
        pool.close()
