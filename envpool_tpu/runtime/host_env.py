"""Host-env pools behind the registry: the reference execution model.

``make("HostCartPole-v1", env_type="gymnasium")`` returns a pool whose
stepping runs on the native C++ async executor (worker threads + pipelined
state buffers) instead of the TPU — the exact execution model of the
reference engine, for envs that cannot be expressed as JAX programs.  The
built-in C++ CartPole demonstrates the path end-to-end and serves as a
host-CPU comparator in benchmarks.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from .host_pool import HostAsyncPool


class HostCartPolePool:
    """Gymnasium-flavor pool over the native executor's CartPole."""

    def __init__(
        self,
        num_envs: int = 1,
        batch_size: int = 0,
        num_threads: int = 0,
        seed: int = 42,
        max_episode_steps: int = 500,
        **_: Any,
    ):
        self.num_envs = num_envs
        self.batch_size = batch_size or num_envs
        self._pool = HostAsyncPool(
            num_envs=num_envs,
            batch_size=self.batch_size,
            num_threads=num_threads,
            state_dim=5,
            action_dim=1,
            max_episode_steps=max_episode_steps,
            seed=seed,
        )
        self.all_env_ids = np.arange(num_envs, dtype=np.int32)

    @classmethod
    def make_pool(cls, env_type: str, **kwargs: Any) -> "HostCartPolePool":
        if env_type not in ("gym", "gymnasium"):
            raise ValueError(
                "host pools currently expose the gymnasium API only"
            )
        return cls(**kwargs)

    # -- gymnasium-style surface ------------------------------------------

    def reset(self, env_id: np.ndarray | None = None):
        states, env_ids, dones = self._pool.reset()
        obs = states[:, :4]
        return obs, {"env_id": env_ids}

    def step(
        self, action: np.ndarray, env_id: np.ndarray | None = None
    ):
        states, env_ids, dones = self._pool.step(
            np.asarray(action, np.float32).reshape(-1, 1), env_id
        )
        obs = states[:, :4]
        rew = states[:, 4]
        term = dones
        trunc = np.zeros_like(dones)
        return obs, rew, term, trunc, {"env_id": env_ids}

    def send(self, action, env_id=None):
        self._pool.send(
            np.asarray(action, np.float32).reshape(-1, 1), env_id
        )

    def recv(self):
        states, env_ids, dones = self._pool.recv()
        return (
            states[:, :4],
            states[:, 4],
            dones,
            np.zeros_like(dones),
            {"env_id": env_ids},
        )

    def async_reset(self):
        self._pool.send(
            np.zeros((self.num_envs, 1), np.float32), force_reset=True
        )

    def close(self, **kwargs):
        self._pool.close()
