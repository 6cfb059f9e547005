"""Worker process for the multi-process distributed test.

Usage: python distributed_worker.py <port> <process_id> <num_processes>
       <out_dir>

Each process owns 2 virtual CPU devices; together they form one env-axis
mesh.  The pool steps CartPole with deterministic actions; each process
writes its local observation rows per step to ``out_dir``.
"""

import os
import sys

port, pid, nproc, out_dir = (
    sys.argv[1],
    int(sys.argv[2]),
    int(sys.argv[3]),
    sys.argv[4],
)

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nproc,
    process_id=pid,
)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import envpool_tpu  # noqa: E402
from envpool_tpu.core.engine import Engine  # noqa: E402
from envpool_tpu.parallel import pod_mesh, env_sharding  # noqa: E402
from envpool_tpu.parallel.distributed import (  # noqa: E402
    host_local_actions,
    local_rows,
)
from envpool_tpu.parallel.mesh import local_env_slice  # noqa: E402

NUM_ENVS = 8
STEPS = 20

mesh = pod_mesh()
assert len(mesh.devices.flat) == 2 * nproc
sharding = env_sharding(mesh)

env = envpool_tpu.make_spec(
    "CartPole-v1", num_envs=NUM_ENVS, seed=123, sharding=sharding
).env
engine = Engine.shared(env, sharding)

ps = engine.init()
lo, hi = local_env_slice(NUM_ENVS)
assert hi - lo == NUM_ENVS // nproc

obs_rows = []
for t in range(STEPS):
    # Deterministic actions: env_id parity xor step parity, fed per host.
    local_act = (
        (np.arange(lo, hi) + t) % 2
    ).astype(np.int32)
    action = host_local_actions((NUM_ENVS,), local_act, sharding)
    ps, ts = engine.step(ps, {"action": action})
    obs_rows.append(local_rows(ts["obs"]))

np.save(
    os.path.join(out_dir, f"obs_p{pid}.npy"), np.stack(obs_rows)
)
print(f"worker {pid} done", flush=True)
