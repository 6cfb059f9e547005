"""Jumanji-class family tests."""

import numpy as np

import envpool_tpu


def _masked_random(rng, mask):
    return np.array(
        [rng.choice(np.flatnonzero(m)) if m.any() else 0 for m in mask],
        np.int32,
    )


def test_snake_mechanics() -> None:
    env = envpool_tpu.make("Snake-v1", env_type="gymnasium", num_envs=8, seed=0)
    obs, info = env.reset()
    assert obs.shape == (8, 12, 12, 5)
    # Exactly one head, one tail, one fruit plane cell at reset.
    assert (obs[:, :, :, 1].sum(axis=(1, 2)) == 1).all()
    assert (obs[:, :, :, 3].sum(axis=(1, 2)) == 1).all()
    rng = np.random.default_rng(0)
    fruit, deaths = 0, 0
    for _ in range(200):
        obs, rew, term, trunc, info = env.step(
            rng.integers(0, 4, 8).astype(np.int32)
        )
        fruit += int(rew.sum())
        deaths += int(term.sum())
    assert deaths > 0 and fruit > 0


def test_knapsack_budget_respected() -> None:
    env = envpool_tpu.make(
        "Knapsack-v1", env_type="gymnasium", num_envs=4, seed=0
    )
    obs, info = env.reset()
    rng = np.random.default_rng(1)
    for _ in range(30):
        acts = _masked_random(rng, info["action_mask"])
        obs, rew, term, trunc, info = env.step(acts)
        assert (obs["remaining_budget"] >= -1e-5).all()
        # Mask excludes packed items.
        assert not (info["action_mask"] & obs["packed"]).any()


def test_tsp_tour_completes() -> None:
    env = envpool_tpu.make("TSP-v1", env_type="gymnasium", num_envs=4, seed=0)
    obs, info = env.reset()
    assert (obs["visited"].sum(axis=1) == 1).all()
    rng = np.random.default_rng(2)
    done = np.zeros(4, bool)
    tour = np.zeros(4)
    for _ in range(19):
        acts = _masked_random(rng, info["action_mask"])
        obs, rew, term, trunc, info = env.step(acts)
        tour += rew * ~done
        done |= term
    assert done.all()
    # Random 20-city tours are ~8-13 units long.
    assert (-tour > 4).all() and (-tour < 16).all()


def test_maze_is_perfect_and_solvable() -> None:
    """Binary-tree mazes are perfect: a wall-follower reaches any cell."""
    env = envpool_tpu.make("Maze-v1", env_type="gymnasium", num_envs=2, seed=3)
    obs, info = env.reset()
    walls = obs["walls"]
    # Top row has no north openings except the implicit border; row 0 cells
    # keep their north wall.
    assert walls[:, 0, :, 0].all()
    # Column 0 keeps west walls.
    assert walls[:, :, 0, 1].all()
    # Every non-origin cell has at least one opening (N or W) → connected.
    openings = ~walls[:, 1:, 1:, 0] | ~walls[:, 1:, 1:, 1]
    assert openings.all()


def test_registration() -> None:
    for t in ["Snake-v1", "Knapsack-v1", "TSP-v1", "Maze-v1"]:
        assert t in envpool_tpu.list_all_envs()
