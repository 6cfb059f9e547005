"""Mesh and sharding helpers for the env-batch axis.

The reference scales across NUMA nodes by launching independent processes
(``benchmark/numa_test.sh``, ``benchmark/README.md:154-163``) and has no
multi-host story.  The TPU-native answer: shard the env axis of every pool
over a ``jax.sharding.Mesh``.  Envs are independent, so stepping requires
*zero* collectives — the sharded step is embarrassingly parallel along
``env`` and XLA partitions it for free; collectives appear only where the
user aggregates (e.g. ``psum`` of returns into the learner).

Multi-host: call :func:`pod_mesh` after ``jax.distributed.initialize``; the
env axis then spans all hosts' devices and per-host feeding goes through
``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["env_mesh", "env_sharding", "local_env_slice", "pod_mesh"]


def env_mesh(
    num_devices: int | None = None, axis_name: str = "env"
) -> Mesh:
    """1-D mesh over the local devices, env axis across all of them."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def pod_mesh(axis_name: str = "env") -> Mesh:
    """1-D mesh over *all* devices of the (multi-host) pod slice.

    Requires ``jax.distributed.initialize()`` to have run on every host.
    """
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def env_sharding(mesh: Mesh, axis_name: str = "env") -> NamedSharding:
    """Shard leading (env) dim over the mesh; trailing dims replicated."""
    return NamedSharding(mesh, PartitionSpec(axis_name))


def local_env_slice(num_envs: int) -> tuple[int, int]:
    """[start, end) of this process's env shard for per-host data feeding."""
    n_proc = jax.process_count()
    per = num_envs // n_proc
    idx = jax.process_index()
    return idx * per, (idx + 1) * per if idx + 1 < n_proc else num_envs
