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


# ---------------------------------------------------------------------------
# Minesweeper / SlidingTilePuzzle / RubiksCube / Cleaner
# ---------------------------------------------------------------------------


def test_minesweeper_flood_reveal_and_win() -> None:
    import jax
    import jax.numpy as jnp

    from envpool_tpu.envs.jumanji import MinesweeperEnv

    # One mine in the corner: revealing any zero-count cell floods the
    # whole safe area at once -> instant win with reward 1.
    env = MinesweeperEnv.from_config(num_envs=1, mine_locations=(0,))
    st, obs = env.reset_env(jax.random.PRNGKey(0))
    assert int(obs["obs:num_mines"]) == 1
    assert bool(obs["obs:action_mask"].all())
    out = env.step_env(st, jnp.asarray([9, 9], jnp.int32), jax.random.PRNGKey(0))
    board = np.asarray(out.state["board"])
    assert bool(out.terminated)
    assert float(out.reward) == 1.0
    assert board[0, 0] == -1  # the mine stays hidden
    assert board[0, 1] == 1 and board[1, 1] == 1  # adjacency counts
    assert (board[2:, :] == 0).all()

    # Hitting the mine terminates with reward 0 and reveals its count.
    st, obs = env.reset_env(jax.random.PRNGKey(0))
    out = env.step_env(st, jnp.asarray([0, 0], jnp.int32), jax.random.PRNGKey(0))
    assert bool(out.terminated)
    assert float(out.reward) == 0.0
    assert np.asarray(out.state["board"])[0, 0] == 0  # no adjacent mines

    # Revealing an already-revealed square is invalid -> terminate, 0.
    # Mine at (4,4): cell (5,5) shows count 1 and does NOT flood.
    env2 = MinesweeperEnv.from_config(num_envs=1, mine_locations=(44,))
    st, obs = env2.reset_env(jax.random.PRNGKey(0))
    out = env2.step_env(st, jnp.asarray([5, 5], jnp.int32), jax.random.PRNGKey(0))
    assert np.asarray(out.state["board"])[5, 5] == 1
    assert (np.asarray(out.state["board"]) == -1).sum() == 99
    assert not bool(out.terminated)
    out2 = env2.step_env(out.state, jnp.asarray([5, 5], jnp.int32), jax.random.PRNGKey(0))
    assert bool(out2.terminated) and float(out2.reward) == 0.0


def test_sliding_tile_moves_and_reward() -> None:
    import jax
    import jax.numpy as jnp

    from envpool_tpu.envs.jumanji import SlidingTilePuzzleEnv

    env = SlidingTilePuzzleEnv.from_config(num_envs=1, scramble_moves=1)
    key = jax.random.PRNGKey(3)
    st, obs = env.reset_env(key)
    # One scramble move from solved: exactly one tile out of place; the
    # dense reward for undoing it is +2 (tile AND empty slot both correct).
    puzzle = np.asarray(st["puzzle"])
    solved = (np.arange(25) + 1).reshape(5, 5) % 25
    assert (puzzle != solved).sum() == 2
    mask = np.asarray(obs["obs:action_mask"])
    # Find the undo move and check reward/termination.
    for a in np.flatnonzero(mask):
        out = env.step_env(st, jnp.int32(a), key)
        if bool(out.terminated):
            assert float(out.reward) == 2.0
            assert (np.asarray(out.state["puzzle"]) == solved).all()
            break
    else:
        raise AssertionError("no undo move solved the puzzle")
    # Off-grid move is a no-op with reward 0.
    env2 = SlidingTilePuzzleEnv.from_config(num_envs=1, scramble_moves=0)
    st2, obs2 = env2.reset_env(key)
    bad = int(np.flatnonzero(~np.asarray(obs2["obs:action_mask"]))[0])
    out2 = env2.step_env(st2, jnp.int32(bad), key)
    assert float(out2.reward) == 0.0
    assert (np.asarray(out2.state["puzzle"]) == solved).all()


def test_rubiks_cube_permutation_invariants() -> None:
    from envpool_tpu.envs.jumanji.puzzles import _build_perms

    perms = _build_perms()
    ident = np.arange(54)
    for f in range(6):
        cw, ccw, half = perms[f, 0], perms[f, 1], perms[f, 2]
        assert sorted(cw) == list(ident)  # a permutation
        np.testing.assert_array_equal(cw[ccw], ident)  # CW then CCW
        np.testing.assert_array_equal(cw[cw[cw[cw]]], ident)  # 4 turns
        np.testing.assert_array_equal(cw[cw], half)  # 2 turns = half
        # A turn displaces exactly 8 face + 12 ring stickers.
        assert (cw != ident).sum() == 20


def test_rubiks_cube_env() -> None:
    import jax
    import jax.numpy as jnp

    from envpool_tpu.envs.jumanji import RubiksCubeEnv

    # One scramble: the inverse move solves it (reward 1, terminated).
    env = RubiksCubeEnv.from_config(num_envs=1, num_scrambles=1, time_limit=20)
    key = jax.random.PRNGKey(0)
    st, obs = env.reset_env(key)
    assert not env._is_solved(st["cube"])
    solved_any = False
    for f in range(6):
        for a in range(3):
            out = env.step_env(st, jnp.asarray([f, 0, a], jnp.int32), key)
            if bool(out.terminated) and float(out.reward) == 1.0:
                solved_any = True
    assert solved_any
    # Scrambled cube keeps sticker counts balanced (9 of each color).
    env2 = RubiksCubeEnv.from_config(num_envs=1, num_scrambles=100)
    st2, _ = env2.reset_env(jax.random.PRNGKey(7))
    counts = np.bincount(np.asarray(st2["cube"]), minlength=6)
    np.testing.assert_array_equal(counts, [9] * 6)


def test_cleaner_env() -> None:
    import jax
    import jax.numpy as jnp

    from envpool_tpu.envs.jumanji import CleanerEnv

    env = CleanerEnv.from_config(num_envs=1, wall_prob=0.0)
    key = jax.random.PRNGKey(0)
    st, obs = env.reset_env(key)
    grid = np.asarray(st["grid"])
    assert grid[0, 0] == 1 and (grid.reshape(-1)[1:] == 0).all()
    # All agents move right together onto one dirty cell: 1 cleaned - 0.5.
    out = env.step_env(st, jnp.asarray([1, 1, 1], jnp.int32), key)
    assert float(out.reward) == 0.5
    np.testing.assert_array_equal(
        np.asarray(out.obs["obs:agents_locations"]), [[0, 1]] * 3
    )
    # Agents split: down, right, right -> two distinct new dirty cells.
    out2 = env.step_env(out.state, jnp.asarray([2, 1, 1], jnp.int32), key)
    assert float(out2.reward) == 1.5
    # An off-grid move (up from row 0) ends the episode.
    out3 = env.step_env(out2.state, jnp.asarray([0, 0, 0], jnp.int32), key)
    assert bool(out3.terminated)


def test_new_jumanji_pools() -> None:
    rng = np.random.default_rng(0)
    for task, n_act in [
        ("Minesweeper-v0", None),
        ("SlidingTilePuzzle-v0", 4),
        ("RubiksCube-partly-scrambled-v0", None),
        ("Cleaner-v0", 4),
        ("Maze-v0", None),
    ]:
        assert f"Jumanji/{task}" in envpool_tpu.list_all_envs() or task == "Maze-v0"
        env = envpool_tpu.make(task, env_type="gymnasium", num_envs=4, seed=0)
        obs, info = env.reset()
        space = env.action_space
        for _ in range(3):
            if task == "Minesweeper-v0":
                acts = rng.integers(0, 10, (4, 2)).astype(np.int32)
            elif task == "RubiksCube-partly-scrambled-v0":
                acts = np.stack(
                    [rng.integers(0, 6, 4), np.zeros(4), rng.integers(0, 3, 4)],
                    axis=1,
                ).astype(np.int32)
            elif task == "Cleaner-v0":
                acts = rng.integers(0, 4, (4, 3)).astype(np.int32)
            elif task == "Maze-v0":
                acts = rng.integers(0, 4, 4).astype(np.int32)
            else:
                acts = rng.integers(0, n_act, 4).astype(np.int32)
            obs, rew, term, trunc, info = env.step(acts)


# ---------------------------------------------------------------------------
# CVRP / GraphColoring / Sudoku / Game2048 (jumanji flavor)
# ---------------------------------------------------------------------------


def test_cvrp_route_and_capacity() -> None:
    import jax
    import jax.numpy as jnp

    from envpool_tpu.envs.jumanji import CVRPEnv

    # 2 customers + depot on a unit line; demands 0.6 each: after serving
    # one customer the other exceeds capacity -> must return to the depot.
    env = CVRPEnv.from_config(
        num_envs=1,
        num_nodes=3,
        coordinates=(0.0, 0.0, 1.0, 0.0, 0.0, 1.0),
        demands=(0.0, 0.6, 0.6),
    )
    key = jax.random.PRNGKey(0)
    st, obs = env.reset_env(key)
    mask = np.asarray(obs["obs:action_mask"])
    np.testing.assert_array_equal(mask, [False, True, True])  # depot blocked
    out = env.step_env(st, jnp.int32(1), key)
    assert float(out.reward) == -1.0  # distance depot->node1
    mask = np.asarray(out.obs["obs:action_mask"])
    np.testing.assert_array_equal(mask, [True, False, False])  # over capacity
    out = env.step_env(out.state, jnp.int32(0), key)  # refill at depot
    assert not bool(out.terminated)
    assert float(out.obs["obs:capacity"]) == 1.0
    out = env.step_env(out.state, jnp.int32(2), key)
    assert bool(out.terminated)  # all customers served
    assert float(out.reward) == -1.0
    # Invalid choice (revisit) -> -1 reward and done.
    st2, _ = env.reset_env(key)
    out2 = env.step_env(st2, jnp.int32(1), key)
    out2 = env.step_env(out2.state, jnp.int32(1), key)
    assert bool(out2.terminated) and float(out2.reward) == -1.0


def test_graph_coloring_rewards() -> None:
    import jax
    import jax.numpy as jnp

    from envpool_tpu.envs.jumanji import GraphColoringEnv

    # Path graph 0-1-2 on 3 nodes: 2 colors suffice.
    env = GraphColoringEnv.from_config(
        num_envs=1, num_nodes=3, edges=((0, 1), (1, 2))
    )
    key = jax.random.PRNGKey(0)
    st, obs = env.reset_env(key)
    assert bool(np.asarray(obs["obs:action_mask"]).all())
    out = env.step_env(st, jnp.int32(0), key)       # node0 <- color0
    mask = np.asarray(out.obs["obs:action_mask"])
    np.testing.assert_array_equal(mask, [False, True, True])
    out = env.step_env(out.state, jnp.int32(1), key)  # node1 <- color1
    out = env.step_env(out.state, jnp.int32(0), key)  # node2 <- color0
    assert bool(out.terminated)
    assert float(out.reward) == -2.0  # two unique colors
    # Conflicting color: reward -num_nodes and done.
    st, _ = env.reset_env(key)
    out = env.step_env(st, jnp.int32(0), key)
    out = env.step_env(out.state, jnp.int32(0), key)  # neighbor same color
    assert bool(out.terminated) and float(out.reward) == -3.0


def test_sudoku_placement_and_solve() -> None:
    import jax
    import jax.numpy as jnp

    from envpool_tpu.envs.jumanji import SudokuEnv

    # Canonical grid with one hole at (0, 0): the only valid action there
    # restores the missing digit and solves the board.
    r = np.arange(9)
    grid = (3 * (r[:, None] % 3) + r[:, None] // 3 + r[None, :]) % 9
    missing = int(grid[0, 0])
    puzzle = grid.copy()
    puzzle[0, 0] = -1
    env = SudokuEnv.from_config(
        num_envs=1, initial_board=tuple(puzzle.reshape(-1))
    )
    key = jax.random.PRNGKey(0)
    st, obs = env.reset_env(key)
    mask = np.asarray(obs["obs:action_mask"])
    assert mask.sum() == 1 and mask[0, 0, missing]
    out = env.step_env(
        st, jnp.asarray([0, 0, missing], jnp.int32), key
    )
    assert bool(out.terminated) and float(out.reward) == 1.0
    # A conflicting digit ends the episode with reward 0.
    st, _ = env.reset_env(key)
    wrong = (missing + 1) % 9
    out = env.step_env(st, jnp.asarray([0, 0, wrong], jnp.int32), key)
    assert bool(out.terminated) and float(out.reward) == 0.0
    # Random generated puzzles expose a consistent mask.
    env2 = SudokuEnv.from_config(num_envs=1)
    st2, obs2 = env2.reset_env(jax.random.PRNGKey(5))
    assert (np.asarray(st2["board"]) == -1).sum() == 50
    assert np.asarray(obs2["obs:action_mask"]).any()


def test_jumanji_game2048() -> None:
    import jax
    import jax.numpy as jnp

    from envpool_tpu.envs.jumanji import JumanjiGame2048Env

    env = JumanjiGame2048Env.from_config(num_envs=1)
    key = jax.random.PRNGKey(0)
    st, obs = env.reset_env(key)
    assert int(obs["info:highest_tile"]) in (2, 4)
    mask = np.asarray(obs["obs:action_mask"])
    assert mask.any()
    a = int(np.flatnonzero(mask)[0])
    out = env.step_env(st, jnp.int32(a), key)
    assert (np.asarray(out.state) > 0).sum() >= 2


def test_jumanji_wave3_pools() -> None:
    rng = np.random.default_rng(1)
    for task in (
        "CVRP-v1",
        "GraphColoring-v1",
        "Sudoku-v0",
        "Sudoku-very-easy-v0",
        "Game2048-v1",
    ):
        assert f"Jumanji/{task}" in envpool_tpu.list_all_envs()
        env = envpool_tpu.make(task, env_type="gymnasium", num_envs=4, seed=0)
        obs, info = env.reset()
        for _ in range(3):
            if task == "Sudoku-v0" or task == "Sudoku-very-easy-v0":
                acts = rng.integers(0, 9, (4, 3)).astype(np.int32)
            elif task == "CVRP-v1":
                acts = rng.integers(0, 21, 4).astype(np.int32)
            elif task == "GraphColoring-v1":
                acts = rng.integers(0, 20, 4).astype(np.int32)
            else:
                acts = rng.integers(0, 4, 4).astype(np.int32)
            obs, rew, term, trunc, info = env.step(acts)
