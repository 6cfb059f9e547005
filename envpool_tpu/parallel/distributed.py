"""Multi-host distribution helpers.

The reference has no multi-host story (SURVEY.md §2.4 — NUMA scale-out is
manual ``numactl`` processes).  The TPU-native answer:

* ``initialize()`` — ``jax.distributed.initialize`` on every host of the
  pod slice.
* ``pod_pool_sharding()`` — env axis over *all* devices (ICI within a
  slice, DCN across slices); stepping stays collective-free because envs
  are independent.
* ``host_local_actions`` / ``global_timestep`` — per-host feeding and
  collection through ``jax.make_array_from_process_local_data`` and
  process-local slicing.
* ``episode_stats`` — the one place a collective is wanted: ``psum`` of
  returns/lengths across the mesh for logging/eval.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def initialize(**kwargs: Any) -> None:
    """Initialize multi-host JAX (no-op for single process)."""
    if jax.process_count() > 1 or kwargs:
        jax.distributed.initialize(**kwargs)


def pod_pool_sharding(axis_name: str = "env") -> NamedSharding:
    mesh = Mesh(np.asarray(jax.devices()), (axis_name,))
    return NamedSharding(mesh, PartitionSpec(axis_name))


def host_local_actions(
    global_shape: tuple[int, ...],
    local_actions: np.ndarray,
    sharding: NamedSharding,
) -> jax.Array:
    """Assemble a global sharded action array from per-host numpy rows."""
    return jax.make_array_from_process_local_data(
        sharding, local_actions, global_shape
    )


def local_rows(arr: jax.Array) -> np.ndarray:
    """This host's rows of a sharded [num_envs, ...] array."""
    shards = [
        s.data for s in arr.addressable_shards
    ]
    return np.concatenate([np.asarray(s) for s in shards], axis=0)


def episode_stats(rewards: jax.Array, dones: jax.Array, axis_name: str):
    """psum'd (total_reward, episodes) inside a shard_map/pmap context."""
    total = jax.lax.psum(jnp.sum(rewards), axis_name)
    episodes = jax.lax.psum(jnp.sum(dones.astype(jnp.int32)), axis_name)
    return total, episodes
