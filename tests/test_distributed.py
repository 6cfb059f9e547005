"""Multi-process distributed pool test (SURVEY.md §4 strategy).

Two OS processes × 2 virtual CPU devices form a 4-device env-axis mesh via
``jax.distributed.initialize``; the pool steps with per-host action
feeding (``host_local_actions``) and per-host collection (``local_rows``).
The assembled global trajectory must equal a single-process run of the
same pool — envs are independent, so sharding cannot change the math.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import envpool_tpu
from envpool_tpu.core.engine import Engine

NUM_ENVS = 8
STEPS = 20


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_reference():
    env = envpool_tpu.make_spec(
        "CartPole-v1", num_envs=NUM_ENVS, seed=123
    ).env
    engine = Engine.shared(env)
    ps = engine.init()
    rows = []
    for t in range(STEPS):
        act = ((np.arange(NUM_ENVS) + t) % 2).astype(np.int32)
        ps, ts = engine.step(ps, {"action": jnp.asarray(act)})
        rows.append(np.asarray(ts["obs"]))
    return np.stack(rows)


def test_two_process_pool_matches_single_process(tmp_path) -> None:
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    clean_env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("JAX_", "PALLAS_", "AXON_"))
    }
    clean_env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(i), "2", str(tmp_path)],
            env=clean_env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=240)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    got = np.concatenate(
        [np.load(tmp_path / f"obs_p{i}.npy") for i in range(2)], axis=1
    )  # [steps, num_envs, obs]
    want = _single_process_reference()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
