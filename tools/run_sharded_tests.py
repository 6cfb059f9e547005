#!/usr/bin/env python
"""Run the test suite in N parallel pytest shards.

The serial suite exceeds a 12-minute budget (jumanji/highway/minigrid are
compile-heavy); sharding by test *file* keeps per-shard compile caches
coherent while cutting wall-clock ~4-5x.  Files are assigned to shards by
descending historical weight (greedy longest-processing-time).
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys
import time

# Rough relative costs (seconds, serial, from round-2/3 measurements).
# Unlisted files get weight 20.
WEIGHTS = {
    "test_jumanji.py": 260,
    "test_highway.py": 170,
    "test_highway_net.py": 120,
    "test_minigrid.py": 150,
    "test_roomgrid.py": 90,
    "test_dmc.py": 150,
    "test_physics.py": 90,
    "test_mujoco_gym.py": 80,
    "test_board.py": 80,
    "test_gym_oracle.py": 70,
    "test_atari.py": 60,
    "test_robotics.py": 120,
    "test_box2d.py": 60,
    "test_engine.py": 50,
    "test_distributed.py": 50,
    "test_chess.py": 220,
    "test_shogi.py": 200,
    "test_gardner_chess.py": 60,
    "test_car_racing.py": 240,
    "test_bipedal_walker.py": 190,
    "test_dmc_wave3.py": 150,
    "test_robotics_oracle.py": 30,
    "test_metaworld.py": 40,
    "test_playground.py": 60,
    "test_mujoco_gym_oracle.py": 30,
    "test_pixels.py": 40,
    "test_sparrow_mahjong.py": 40,
    "test_atari_wave2.py": 30,
    "test_atari_wave3.py": 30,
    "test_atari_wave4.py": 30,
    "test_atari_wave5.py": 35,
    "test_atari_wave6.py": 30,
    "test_atari_wave7.py": 35,
    "test_atari_wave8.py": 45,
    "test_atari_wave9.py": 30,
    "test_record.py": 20,
    "test_learning.py": 20,
    "test_vizdoom.py": 45,
    "test_procgen.py": 40,
    "test_gfootball.py": 25,
    # round 4 additions
    "test_golden_lockstep.py": 420,  # Go9x9 compile dominates
    "test_contact_solver.py": 180,
    "test_cpu6502.py": 30,
    "test_atari_wave10.py": 45,
    "test_atari_config.py": 30,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=5)
    ap.add_argument("--tests-dir", default="tests")
    args = ap.parse_args()

    files = sorted(glob.glob(os.path.join(args.tests_dir, "test_*.py")))
    if not files:
        print("no test files found", file=sys.stderr)
        return 2

    # Greedy LPT bin packing.
    files.sort(key=lambda f: -WEIGHTS.get(os.path.basename(f), 20))
    bins: list[tuple[int, list[str]]] = [(0, []) for _ in range(args.shards)]
    for f in files:
        w = WEIGHTS.get(os.path.basename(f), 20)
        i = min(range(len(bins)), key=lambda j: bins[j][0])
        bins[i] = (bins[i][0] + w, bins[i][1] + [f])

    procs = []
    t0 = time.time()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__))) or "."
    for i, (_, shard) in enumerate(bins):
        if not shard:
            continue
        # Per-shard compile-cache dir (see tests/conftest.py): concurrent
        # writers to one cache dir can corrupt it when a run is
        # interrupted.  A sentinel marks in-progress runs; if one is
        # still present, the previous run died mid-write and the cache
        # may hold truncated entries that SEGFAULT jax's cache reader —
        # quarantine by wiping the dir.
        cache = os.path.join(root, f".jax_cache_shard{i}")
        sentinel = os.path.join(cache, ".running")
        if os.path.exists(sentinel):
            import shutil

            print(f"[shard {i}] stale cache sentinel — wiping {cache}")
            shutil.rmtree(cache, ignore_errors=True)
        os.makedirs(cache, exist_ok=True)
        with open(sentinel, "w") as f:
            f.write(str(os.getpid()))
        cmd = [sys.executable, "-m", "pytest", "-q", *shard]
        env = dict(os.environ, ENVPOOL_TPU_CACHE_SHARD=str(i))
        procs.append((i, shard, subprocess.Popen(cmd, env=env)))
    rc = 0
    for i, shard, p in procs:
        r = p.wait()
        status = "ok" if r in (0, 5) else f"FAILED rc={r}"
        print(f"[shard {i}] {status}: {[os.path.basename(s) for s in shard]}")
        if r in (0, 5):  # clean exit → cache is coherent, keep it
            sentinel = os.path.join(
                root, f".jax_cache_shard{i}", ".running"
            )
            if os.path.exists(sentinel):
                os.remove(sentinel)
        else:  # 5 = no tests collected
            rc = 1
    print(f"total wall-clock: {time.time() - t0:.0f}s")
    return rc


if __name__ == "__main__":
    sys.exit(main())
