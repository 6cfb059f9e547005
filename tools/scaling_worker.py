#!/usr/bin/env python
"""One process of the multi-process scaling benchmark (bench.py --scaling).

Usage: scaling_worker.py <port> <pid> <nproc> <out_dir> <task> \
           <envs_per_proc> <steps> <reps>

Each process owns 2 virtual CPU devices; together the processes form one
env-axis mesh (weak scaling: total envs = envs_per_proc * nproc).  The
engine's step is collective-free — this measures the framework's
multi-host dispatch/compile path, the analog of the reference's NUMA
process scaling (benchmark/numa_test.sh) with jax.distributed instead of
numactl.
"""

from __future__ import annotations

import json
import os
import sys
import time

port, pid, nproc, out_dir, task, envs_pp, steps, reps = (
    sys.argv[1],
    int(sys.argv[2]),
    int(sys.argv[3]),
    sys.argv[4],
    sys.argv[5],
    int(sys.argv[6]),
    int(sys.argv[7]),
    int(sys.argv[8]),
)

# One virtual device and one compute core per process: efficiency should
# measure the framework's multi-process dispatch overhead, not host-core
# contention (this image has few cores; an unpinned 1-process baseline
# would use them all and deflate the reported efficiency).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=1"
    + " --xla_cpu_multi_thread_eigen=false"
).strip()
os.environ.setdefault("OMP_NUM_THREADS", "1")
try:
    ncpu = os.cpu_count() or 1
    os.sched_setaffinity(0, {pid % ncpu})
except (AttributeError, OSError):
    pass

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if nproc > 1:
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import envpool_tpu  # noqa: E402
from envpool_tpu.core.engine import Engine  # noqa: E402
from envpool_tpu.parallel import env_sharding, pod_mesh  # noqa: E402

num_envs = envs_pp * nproc
mesh = pod_mesh()
shard = env_sharding(mesh)
env = envpool_tpu.make_spec(
    task, num_envs=num_envs, seed=0, sharding=shard
).env
engine = Engine.shared(env, shard)

spec = env.action_spec()["action"]
shape = (num_envs, *spec.static_shape(env.max_num_players))
if spec.is_discrete:
    hi = int(np.asarray(spec.maximum).max()) + 1

    def policy(ts, key):
        return {"action": jax.random.randint(key, shape, 0, hi, jnp.int32)}
else:

    def policy(ts, key):
        return {
            "action": jax.random.uniform(key, shape, jnp.float32, -1.0, 1.0)
        }


run = engine.make_rollout(policy, steps, collect=False)
ps = engine.init()


def _barrier(tag):
    if nproc > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def _local_block(x):
    for s in x.addressable_shards:
        s.data.block_until_ready()


ps, last = run(ps, jax.random.PRNGKey(0))  # compile + warmup
_local_block(last["reward"])
_barrier("warm")
t0 = time.perf_counter()
for i in range(reps):
    ps, last = run(ps, jax.random.PRNGKey(i + 1))
_local_block(last["reward"])
_barrier("done")
dt = time.perf_counter() - t0

if pid == 0:
    result = {
        "task": task,
        "nproc": nproc,
        "num_envs": num_envs,
        "steps_per_s": num_envs * steps * reps / dt,
        "wall_s": dt,
    }
    with open(os.path.join(out_dir, f"scaling_{task}_{nproc}.json"), "w") as f:
        json.dump(result, f)
    print(json.dumps(result), flush=True)
