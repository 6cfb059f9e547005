#!/usr/bin/env python
"""Generate golden fixtures from the independent scalar oracles.

Protocol (see independent/__init__.py): the envpool_tpu env produces only
the episode's initial layout; the scalar oracle steps the whole episode
by itself; its outputs are committed as the golden.  The lockstep test
then replays the envpool_tpu env over the same actions and asserts exact
equality — two independently-written implementations in agreement.

Run in-repo (CPU): ``python tests/oracle_fixtures/generate_independent_goldens.py``
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))
sys.path.insert(0, HERE)

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from independent.scalar_minigrid import (  # noqa: E402
    DONE, DROP, FORWARD, LEFT, PICKUP, RIGHT, TOGGLE, ScalarMiniGrid,
)

MINIGRID_EPISODES = [
    # (env_id, seed, steps, action_weights)
    ("MiniGrid-Empty-8x8-v0", 0, 60, None),
    ("MiniGrid-Empty-8x8-v0", 1, 60, None),
    ("MiniGrid-Empty-Random-6x6-v0", 2, 60, None),
    ("MiniGrid-DoorKey-8x8-v0", 3, 120, "doorkey"),
    ("MiniGrid-DoorKey-6x6-v0", 4, 120, "doorkey"),
    ("MiniGrid-FourRooms-v0", 5, 100, None),
    ("MiniGrid-LavaGapS7-v0", 6, 60, None),
    ("MiniGrid-DistShift1-v0", 7, 60, None),
    ("MiniGrid-SimpleCrossingS9N2-v0", 8, 80, None),
    ("MiniGrid-LavaCrossingS9N1-v0", 9, 80, None),
]


def _pick_action(rng, weights):
    if weights == "doorkey":
        # Bias toward interactions so doors/keys get exercised.
        return int(
            rng.choice(
                [LEFT, RIGHT, FORWARD, PICKUP, DROP, TOGGLE, DONE],
                p=[0.15, 0.15, 0.40, 0.12, 0.04, 0.12, 0.02],
            )
        )
    return int(
        rng.choice(
            [LEFT, RIGHT, FORWARD, PICKUP, DROP, TOGGLE, DONE],
            p=[0.20, 0.20, 0.50, 0.03, 0.02, 0.03, 0.02],
        )
    )


def gen_minigrid(out_path):
    from envpool_tpu.core.registry import registry

    payload = {}
    for env_id, seed, steps, weights in MINIGRID_EPISODES:
        env = registry._env(env_id, num_envs=1)
        st, _ = env.reset_env(jax.random.PRNGKey(seed))
        oracle = ScalarMiniGrid.from_arrays(
            np.asarray(st["grid"]),
            np.asarray(st["pos"]),
            int(st["dir"]),
            np.asarray(st["carrying"]),
            env.max_episode_steps,
            int(env.config["agent_view_size"]),
        )
        rng = np.random.default_rng(seed)
        images = [oracle.gen_obs()]
        actions, rewards, terms = [], [], []
        for _ in range(steps):
            a = _pick_action(rng, weights)
            r, term, trunc = oracle.step(a)
            actions.append(a)
            rewards.append(r)
            terms.append(term)
            images.append(oracle.gen_obs())
            if term or trunc:
                break
        base = f"{env_id}|{seed}"
        payload[f"{base}|images"] = np.stack(images)
        payload[f"{base}|actions"] = np.asarray(actions, np.int32)
        payload[f"{base}|rewards"] = np.asarray(rewards, np.float32)
        payload[f"{base}|terminated"] = np.asarray(terms, np.bool_)
        print(f"{env_id} seed={seed}: {len(actions)} steps, "
              f"return={sum(rewards):.3f}, terminated={any(terms)}")
    np.savez_compressed(out_path, **payload)
    print(f"wrote {out_path}")


BOARD_EPISODES = [
    # (oracle_name, env_id, seed, max_steps)
    ("tic_tac_toe", "TicTacToe-v1", 0, 9),
    ("tic_tac_toe", "TicTacToe-v1", 1, 9),
    ("tic_tac_toe", "TicTacToe-v1", 2, 9),
    ("connect_four", "ConnectFour-v1", 0, 42),
    ("connect_four", "ConnectFour-v1", 1, 42),
    ("connect_four", "ConnectFour-v1", 2, 42),
    ("othello", "Othello-v1", 0, 70),
    ("othello", "Othello-v1", 1, 70),
    ("go_9x9", "Go9x9-v1", 0, 120),
    ("go_9x9", "Go9x9-v1", 1, 120),
]


def _make_oracle(name):
    from independent.scalar_board import (
        ScalarConnect4, ScalarGo, ScalarOthello, ScalarTicTacToe,
    )

    if name == "tic_tac_toe":
        return ScalarTicTacToe()
    if name == "connect_four":
        return ScalarConnect4()
    if name == "othello":
        return ScalarOthello()
    if name == "go_9x9":
        return ScalarGo(9, 7.5)
    raise ValueError(name)


def gen_board(out_path):
    """Scalar oracle plays random-legal self-play; goldens record boards,
    legal masks, mover rewards.  For Go, the episode is ended by two
    forced passes so area scoring is exercised."""
    payload = {}
    for name, env_id, seed, max_steps in BOARD_EPISODES:
        oracle = _make_oracle(name)
        rng = np.random.default_rng(seed)
        boards = [oracle.board_array()]
        masks = [np.asarray(oracle.legal_moves(), np.bool_)]
        players = [oracle.player]
        actions, rewards, terms = [], [], []

        def do(a):
            r, t = oracle.step(a)
            actions.append(int(a))
            rewards.append(r)
            terms.append(t)
            boards.append(oracle.board_array())
            masks.append(np.asarray(oracle.legal_moves(), np.bool_))
            players.append(oracle.player)
            return t

        done = False
        for t in range(max_steps):
            legal = np.flatnonzero(masks[-1])
            if name == "go_9x9":
                # Keep games flowing: exclude pass until the tail, then
                # force a double pass to exercise Tromp-Taylor scoring.
                play_pts = legal[legal < 81]
                if t >= max_steps - 2 or len(play_pts) == 0:
                    done = do(81)
                else:
                    done = do(rng.choice(play_pts))
            else:
                done = do(rng.choice(legal))
            if done:
                break
        base = f"{name}|{seed}"
        payload[f"{base}|boards"] = np.stack(boards)
        payload[f"{base}|masks"] = np.stack(masks)
        payload[f"{base}|players"] = np.asarray(players, np.int32)
        payload[f"{base}|actions"] = np.asarray(actions, np.int32)
        payload[f"{base}|rewards"] = np.asarray(rewards, np.float32)
        payload[f"{base}|terminated"] = np.asarray(terms, np.bool_)
        print(f"{name} seed={seed}: {len(actions)} moves, "
              f"final_r={rewards[-1] if rewards else 0}, done={done}")
    np.savez_compressed(out_path, **payload)
    print(f"wrote {out_path}")


HIGHWAY_EPISODES = [
    # (env_id, seed, steps, action script seed)
    ("highway-fast-v0", 0, 12),
    ("highway-fast-v0", 1, 12),
    ("highway-v0", 0, 8),
    ("highway-v0", 1, 8),
]


def gen_highway(out_path):
    """Scalar IDM/MOBIL/bicycle/SAT oracle stepped from the repo env's
    reset state over a scripted action sequence."""
    from envpool_tpu.core.registry import registry
    from independent.scalar_highway import ScalarHighway

    payload = {}
    for env_id, seed, steps in HIGHWAY_EPISODES:
        env = registry._env(env_id, num_envs=1)
        st, _ = env.reset_env(jax.random.PRNGKey(seed))
        host = {k: np.asarray(v) for k, v in st.items()}
        oracle = ScalarHighway.from_state(
            host, int(env.config["lanes_count"]), dict(env.config)
        )
        f = int(env.config["observation_vehicles_count"])
        rng = np.random.default_rng(seed + 1000)
        obs = [oracle.observe(f)]
        xs = [np.asarray([v.x for v in oracle.vehicles], np.float64)]
        ys = [np.asarray([v.y for v in oracle.vehicles], np.float64)]
        actions, rewards, terms, crashed = [], [], [], []
        for _ in range(steps):
            # Mostly IDLE with occasional lane/speed commands.
            a = int(rng.choice([0, 1, 2, 3, 4],
                               p=[0.1, 0.5, 0.1, 0.2, 0.1]))
            r, term = oracle.step(a)
            actions.append(a)
            rewards.append(r)
            terms.append(term)
            crashed.append(oracle.vehicles[0].crashed)
            obs.append(oracle.observe(f))
            xs.append(np.asarray([v.x for v in oracle.vehicles], np.float64))
            ys.append(np.asarray([v.y for v in oracle.vehicles], np.float64))
            if term:
                break
        base = f"{env_id}|{seed}"
        payload[f"{base}|obs"] = np.stack(obs)
        payload[f"{base}|x"] = np.stack(xs)
        payload[f"{base}|y"] = np.stack(ys)
        payload[f"{base}|actions"] = np.asarray(actions, np.int32)
        payload[f"{base}|rewards"] = np.asarray(rewards, np.float32)
        payload[f"{base}|terminated"] = np.asarray(terms, np.bool_)
        payload[f"{base}|crashed"] = np.asarray(crashed, np.bool_)
        print(f"{env_id} seed={seed}: {len(actions)} steps, "
              f"return={sum(rewards):.3f}, crashed={crashed[-1]}")
    np.savez_compressed(out_path, **payload)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    gen_minigrid(os.path.join(HERE, "minigrid_golden.npz"))
    gen_board(os.path.join(HERE, "pgx_golden.npz"))
    gen_highway(os.path.join(HERE, "highway_golden.npz"))
