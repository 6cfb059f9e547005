"""Throughput benchmark on the local chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for the
headline metric (HalfCheetah env-steps/s per chip vs the BASELINE.json
north star of 375k/chip = 3M per 8-chip host); ant/pong/cartpole metrics
go to stderr.

Methodology mirrors the reference's FPS accounting
(``benchmark/test_envpool.py:99-107``): FPS counts env *frames* — agent
steps × frame_skip (4 for Atari) — over wall time, random actions, rollouts
compiled as one ``lax.scan`` program (the TPU-native analog of async mode at
full saturation).

``vs_baseline`` = HalfCheetah steps/s divided by the north-star 375k
steps/s/chip (BASELINE.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# Persistent compile cache: physics programs take ~1-2 min through the
# remote-compile tunnel; cache them across bench invocations.
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

ATARI_BASELINE = 359_559.0  # EnvPool async Atari FPS, TPU-VM (BASELINE.md)
CARTPOLE_BASELINE = 3_000_000.0  # BASELINE.json north star, env-steps/s


def _bench(task: str, num_envs: int, steps: int, n_actions: int, reps: int = 3,
           **kwargs):
    import envpool_tpu
    from envpool_tpu.core.engine import Engine

    env = envpool_tpu.make_spec(task, num_envs=num_envs, seed=0, **kwargs).env
    engine = Engine.shared(env)

    def policy(ts, key):
        return {
            "action": jax.random.randint(
                key, (num_envs,), 0, n_actions, jnp.int32
            )
        }

    run = engine.make_rollout(policy, steps, collect=False)
    ps = engine.init()
    ps, last = run(ps, jax.random.PRNGKey(0))  # compile + warmup
    jax.device_get(last["reward"])
    # NOTE: device_get of a result array is the completion barrier —
    # block_until_ready through the axon relay reports optimistically.
    t0 = time.perf_counter()
    for i in range(reps):
        ps, last = run(ps, jax.random.PRNGKey(i + 1))
    jax.device_get(last["reward"])
    dt = time.perf_counter() - t0
    return num_envs * steps * reps / dt


def _bench_continuous(task: str, num_envs: int, steps: int, act_dim: int,
                      reps: int = 2, **kwargs):
    import envpool_tpu
    from envpool_tpu.core.engine import Engine

    env = envpool_tpu.make_spec(
        task, num_envs=num_envs, seed=0, **kwargs
    ).env
    engine = Engine.shared(env)

    def policy(ts, key):
        return {
            "action": jax.random.uniform(
                key, (num_envs, act_dim), jnp.float32, -1, 1
            )
        }

    run = engine.make_rollout(policy, steps, collect=False)
    ps = engine.init()
    ps, last = run(ps, jax.random.PRNGKey(0))
    jax.device_get(last["reward"])
    t0 = time.perf_counter()
    for i in range(reps):
        ps, last = run(ps, jax.random.PRNGKey(i + 1))
    jax.device_get(last["reward"])
    return num_envs * steps * reps / (time.perf_counter() - t0)


MUJOCO_STEPS_BASELINE = 375_000.0  # BASELINE.json: 3M steps/s per 8-chip host


def main() -> None:
    # Headline first (MuJoCo-class throughput, the north star BASELINE.json
    # sets: >=3M env-steps/s per v5e host = 375k per chip), so a tight
    # harness timeout still records it; secondary metrics go to stderr.
    cheetah = _bench_continuous("HalfCheetah-v4", 8192, 128, 6)
    print(
        f"halfcheetah: {cheetah:,.0f} env-steps/s = {cheetah * 5:,.0f} FPS "
        f"(north star 375k steps/s/chip; ref TPU-VM async 887,540 FPS)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "halfcheetah_env_steps_per_s_per_chip",
                "value": round(cheetah, 1),
                "unit": "steps/s",
                "vs_baseline": round(cheetah / MUJOCO_STEPS_BASELINE, 3),
            }
        ),
        flush=True,
    )
    ant = _bench_continuous("Ant-v4", 8192, 128, 8)
    print(
        f"ant: {ant:,.0f} env-steps/s = {ant * 5:,.0f} FPS "
        f"(ref DGX-A100 numa+async best 3,134,287 FPS)",
        file=sys.stderr,
    )
    pong_steps = _bench("PongLite-v5", 2048, 256, 6)
    pong_fps = pong_steps * 4  # frame_skip=4, reference FPS counts frames
    print(
        f"pong: {pong_steps:,.0f} env-steps/s = {pong_fps:,.0f} FPS "
        f"({pong_fps / ATARI_BASELINE:.1f}x ref TPU-VM async Atari)",
        file=sys.stderr,
    )
    cartpole = _bench("CartPole-v1", 16384, 1024, 2)
    print(
        f"cartpole: {cartpole:,.0f} env-steps/s "
        f"({cartpole / CARTPOLE_BASELINE:.1f}x north star)",
        file=sys.stderr,
    )
    machine = _bench_machine2600()
    print(
        f"machine2600: {machine:,.0f} emulated frames/s at B=1024 "
        "(real 6502+TIA, Pallas frame kernel; r4 baseline 4.6k)",
        file=sys.stderr,
    )


def _bench_machine2600(batch: int = 1024, reps: int = 20) -> float:
    """Raw emulated-frame throughput of the 2600 Pallas frame kernel on
    the playable pong test cartridge (no ROM assets ship in-image)."""

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "tests")
    )
    sys.path.insert(
        0,
        os.path.join(os.path.dirname(__file__), "tests", "oracle_fixtures"),
    )
    from test_machine_game import _pong_rom

    from envpool_tpu.envs.atari import cpu6502, machine_kernel, tia

    rom_np = _pong_rom()
    m = tia.attach_tia(cpu6502.make_machine(rom_np))
    m = jax.tree_util.tree_map(
        lambda x: jnp.stack([x] * batch), m
    )
    step = jax.jit(
        jax.vmap(lambda mm: machine_kernel.run_frame_fast(mm, rom_np))
    )
    m = step(m)
    # Warm past the short power-on frames into steady full frames, and
    # use device_get as the completion barrier (block_until_ready
    # through the axon relay reports optimistically — observed 200x
    # phantom rates without a host read).
    for _ in range(6):
        m = step(m)
    jax.device_get(m["cycles"])
    t0 = time.perf_counter()
    for _ in range(reps):
        m = step(m)
    jax.device_get(m["cycles"])
    return reps * batch / (time.perf_counter() - t0)


def sweep() -> None:
    """`bench.py --sweep`: num_envs scaling + per-family peaks (stderr).

    The reference's benchmark sweeps num_envs/batch/threads per system
    (``benchmark/test_envpool.py:25-48``); the TPU analog is a single
    saturation axis — env-batch width — since there is no thread grid.
    """
    print("-- num_envs scaling (HalfCheetah-v4, steps/s) --", file=sys.stderr)
    for n in (1024, 2048, 4096, 8192, 16384):
        v = _bench_continuous("HalfCheetah-v4", n, 128, 6)
        print(f"  {n:>6}: {v:>13,.0f}  ({v / n:,.0f} /env)", file=sys.stderr)
    print("-- per-family peaks (steps/s) --", file=sys.stderr)
    fams = [
        ("CartPole-v1", "classic", 16384, 1024, 2, None),
        ("FrozenLake8x8-v1", "toy_text", 16384, 512, 4, None),
        ("PongLite-v5", "atari", 2048, 256, 6, None),
        ("Ant-v4", "mujoco_gym", 8192, 128, None, 8),
        ("CheetahRun-v1", "dmc", 4096, 128, None, 6),
        ("MazeEasy-v0", "procgen", 2048, 128, 15, None),
        ("Basic-v1", "vizdoom", 1024, 64, 6, None),
        ("MiniGrid-Empty-8x8-v0", "minigrid", 8192, 256, 7, None),
        ("TicTacToe-v1", "pgx", 8192, 256, 9, None),
        ("highway-v0", "highway", 2048, 128, 5, None),
    ]
    import envpool_tpu

    ids = set(envpool_tpu.list_all_envs())
    for task, fam, n, steps, n_act, act_dim in fams:
        if task not in ids:
            print(f"  {fam:<12} {task}: (not registered)", file=sys.stderr)
            continue
        try:
            kw = {"use_combined_action": True} if fam == "vizdoom" else {}
            if act_dim is None:
                v = _bench(task, n, steps, n_act, reps=2, **kw)
            else:
                v = _bench_continuous(task, n, steps, act_dim)
            print(
                f"  {fam:<12} {task:<24} n={n:<6} {v:>13,.0f}",
                file=sys.stderr,
            )
        except Exception as e:  # noqa: BLE001 — keep sweeping
            print(f"  {fam:<12} {task}: FAILED {e}", file=sys.stderr)


def scaling() -> None:
    """`bench.py --scaling`: multi-process weak-scaling efficiency.

    Launches 1/2/4 jax.distributed CPU processes (2 virtual devices each)
    stepping one sharded pool via tools/scaling_worker.py, and reports
    aggregate steps/s + efficiency vs the 1-process run — the measured
    analog of the reference's NUMA process scaling
    (``benchmark/numa_test.sh``, ``benchmark/README.md:154-163``) and the
    BASELINE.md ">=80% efficiency at >=2 hosts" north star, validated
    host-side (no multi-host TPU hardware in this image).
    """
    import json as _json
    import subprocess
    import tempfile

    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "tools", "scaling_worker.py")
    ncpu = os.cpu_count() or 1
    sizes = [(1, 12421), (2, 12422), (4, 12424)]
    sizes = [(n, p) for n, p in sizes if n <= max(2, ncpu)]
    configs = [("CartPole-v1", 8192, 2048, 2), ("HalfCheetah-v4", 1024, 128, 2)]
    for task, envs_pp, steps, reps in configs:
        base = None
        print(f"-- weak scaling: {task} ({envs_pp} envs/proc, "
              f"1 pinned core/proc, {ncpu} cores) --",
              file=sys.stderr)
        for nproc, port in sizes:
            with tempfile.TemporaryDirectory() as td:
                procs = []
                env_vars = dict(
                    os.environ,
                    JAX_PLATFORMS="cpu",
                    JAX_COMPILATION_CACHE_DIR="",
                )
                env_vars.pop("PALLAS_AXON_POOL_IPS", None)
                for pid in range(nproc):
                    procs.append(subprocess.Popen(
                        [sys.executable, worker, str(port), str(pid),
                         str(nproc), td, task, str(envs_pp), str(steps),
                         str(reps)],
                        env=env_vars,
                        stdout=subprocess.DEVNULL if pid else None,
                    ))
                rc = [p.wait() for p in procs]
                if any(rc):
                    print(f"  nproc={nproc}: FAILED rc={rc}", file=sys.stderr)
                    continue
                with open(os.path.join(
                    td, f"scaling_{task}_{nproc}.json"
                )) as f:
                    r = _json.load(f)
            if nproc == 1:
                base = r["steps_per_s"]
            eff = r["steps_per_s"] / (base * nproc) if base else float("nan")
            print(
                f"  nproc={nproc}: {r['num_envs']:>6} envs "
                f"{r['steps_per_s']:>12,.0f} steps/s  "
                f"efficiency={eff:.1%}",
                file=sys.stderr,
            )


if __name__ == "__main__":
    if "--sweep" in sys.argv:
        sweep()
    elif "--scaling" in sys.argv:
        scaling()
    else:
        main()
