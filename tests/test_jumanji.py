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


def test_tetris_line_clear() -> None:
    env = envpool_tpu.make("Tetris-v0", env_type="gymnasium", num_envs=1, seed=0)
    obs, info = env.reset()
    assert obs["grid"].shape == (1, 10, 10)
    assert obs["action_mask"].shape == (1, 4, 10)
    # Column 9 is never placeable (the square needs two columns).
    assert not obs["action_mask"][0, :, 9].any()
    # Five squares across columns 0,2,4,6,8 fill the bottom two rows.
    for i, col in enumerate([0, 2, 4, 6, 8]):
        acts = np.array([[0, col]], np.int32)
        obs, rew, term, trunc, info = env.step(acts)
        if i < 4:
            assert rew[0] == 0.0 and not term[0]
            assert obs["grid"][0, 8:, col : col + 2].all()
        else:
            assert rew[0] == 2.0  # both rows cleared
            assert obs["grid"][0].sum() == 0


def test_flatpack_placement() -> None:
    env = envpool_tpu.make(
        "FlatPack-v0", env_type="gymnasium", num_envs=1, seed=0
    )
    obs, info = env.reset()
    assert obs["blocks"].shape == (1, 25, 3, 3)
    assert obs["action_mask"].shape == (1, 25, 4, 9, 9)
    assert obs["action_mask"][0].all()  # empty grid, nothing placed
    obs, rew, term, trunc, info = env.step(np.array([[0, 0, 0, 0]], np.int32))
    np.testing.assert_allclose(rew[0], 4.0 / 121.0, rtol=1e-6)
    assert obs["grid"][0, :2, :2].all()
    assert not obs["action_mask"][0, 0].any()  # block 0 now placed
    # Placing block 0 again is invalid -> -1 and terminal.
    obs, rew, term, trunc, info = env.step(np.array([[0, 0, 5, 5]], np.int32))
    assert rew[0] == -1.0 and term[0]


def test_connector_straight_lines() -> None:
    env = envpool_tpu.make(
        "Connector-v2", env_type="gymnasium", num_envs=1, seed=0
    )
    obs, info = env.reset()
    assert obs["grid"].shape == (1, 10, 10)
    # Starts at column 0 (position values 2+3a), targets at column 9.
    starts = obs["grid"][0, :, 0]
    assert (starts == 2 + 3 * np.arange(10)).all()
    acts = np.full((1, 10), 2, np.int32)  # everyone moves right
    for step in range(9):
        obs, rew, term, trunc, info = env.step(acts)
        if step < 8:
            np.testing.assert_allclose(rew[0], -0.03, rtol=1e-5)
            assert not term[0]
        else:
            assert rew[0] == 1.0 and term[0]
    assert info["num_connections"][0] == 10
    np.testing.assert_allclose(info["ratio_connections"][0], 1.0)
    assert info["total_path_length"][0] == 100


def test_lbf_cooperative_eat() -> None:
    env = envpool_tpu.make(
        "LevelBasedForaging-v0", env_type="gymnasium", num_envs=1, seed=0
    )
    obs, info = env.reset()
    assert obs["agents_view"].shape == (1, 2, 12)
    # Agent 1 steps down next to the level-2 food, then both load.
    obs, rew, term, trunc, info = env.step(np.array([[0, 2]], np.int32))
    assert rew[0] == 0.0
    obs, rew, term, trunc, info = env.step(np.array([[5, 5]], np.int32))
    np.testing.assert_allclose(rew[0], 0.5)
    np.testing.assert_allclose(info["percent_eaten"][0], 50.0)
    # Eaten food is masked to (-1, -1, 0) in every agent's view.
    assert (obs["agents_view"][0, :, 0] == -1).all()


def test_robot_warehouse_collision_ends_episode() -> None:
    env = envpool_tpu.make(
        "RobotWarehouse-v0", env_type="gymnasium", num_envs=1, seed=0
    )
    obs, info = env.reset()
    assert obs["agents_view"].shape == (1, 4, 66)
    obs, rew, term, trunc, info = env.step(np.zeros((1, 4), np.int32))
    assert rew[0] == 0.0 and not term[0]
    # Agent 0 moving down collides with agent 1 -> whole step invalid.
    obs, rew, term, trunc, info = env.step(np.array([[3, 0, 0, 0]], np.int32))
    assert rew[0] == -1.0 and term[0]


def test_jumanji_wave4_pools() -> None:
    rng = np.random.default_rng(3)
    specs = {
        "Tetris-v0": lambda: rng.integers(0, [4, 10], (4, 2)),
        "Connector-v2": lambda: rng.integers(0, 5, (4, 10)),
        "FlatPack-v0": lambda: rng.integers(0, [25, 4, 9, 9], (4, 4)),
        "LevelBasedForaging-v0": lambda: rng.integers(0, 6, (4, 2)),
        "RobotWarehouse-v0": lambda: rng.integers(0, 5, (4, 4)),
    }
    for task, sample in specs.items():
        assert f"Jumanji/{task}" in envpool_tpu.list_all_envs()
        env = envpool_tpu.make(task, env_type="gymnasium", num_envs=4, seed=0)
        obs, info = env.reset()
        for _ in range(3):
            obs, rew, term, trunc, info = env.step(sample().astype(np.int32))


def test_jobshop_schedule_completes() -> None:
    env = envpool_tpu.make("JobShop-v0", env_type="gymnasium", num_envs=1, seed=0)
    obs, info = env.reset()
    # Machine 0 can start job 0, machine 1 job 1; noop (20) always legal.
    assert obs["action_mask"][0, 0, 0] and obs["action_mask"][0, 1, 1]
    assert obs["action_mask"][0, :, 20].all()
    assert not obs["action_mask"][0, 0, 1]
    acts = np.full((1, 10), 20, np.int32)
    acts[0, 0] = 0
    acts[0, 1] = 1
    obs, rew, term, trunc, info = env.step(acts)
    assert rew[0] == -1.0 and not term[0]
    assert obs["machines_remaining_times"][0, 0] == 1
    noop = np.full((1, 10), 20, np.int32)
    obs, rew, term, trunc, info = env.step(noop)  # job 0 finishes (dur 2)
    assert not term[0]
    obs, rew, term, trunc, info = env.step(noop)  # job 1 finishes (dur 3)
    assert term[0] and rew[0] == -1.0
    # Scheduling an unstartable job is -10 and terminal.
    env2 = envpool_tpu.make("JobShop-v0", env_type="gymnasium", num_envs=1, seed=0)
    env2.reset()
    bad = np.full((1, 10), 20, np.int32)
    bad[0, 0] = 1  # job 1's op runs on machine 1, not 0
    obs, rew, term, trunc, info = env2.step(bad)
    assert rew[0] == -10.0 and term[0]


def test_multicvrp_serves_and_refills() -> None:
    env = envpool_tpu.make("MultiCVRP-v0", env_type="gymnasium", num_envs=1, seed=0)
    obs, info = env.reset()
    assert (obs["vehicles"]["capacities"][0] == 60).all()
    # Vehicle 0 -> node 1 (0.5, 0), vehicle 1 -> node 2 (1.0, 0).
    obs, rew, term, trunc, info = env.step(np.array([[1, 2]], np.int32))
    np.testing.assert_allclose(rew[0], -(0.5 + 1.0), rtol=1e-6)
    assert obs["nodes"]["demands"][0, 1] == 0 and obs["nodes"]["demands"][0, 2] == 0
    assert (obs["vehicles"]["capacities"][0] == 50).all()
    # Depot visit refills.
    obs, rew, term, trunc, info = env.step(np.array([[0, 0]], np.int32))
    assert obs["vehicles"]["capacities"][0, 0] == 60
    # Both vehicles to the same node: second one finds demand 0 -> invalid.
    obs, rew, term, trunc, info = env.step(np.array([[3, 3]], np.int32))
    assert rew[0] == -100.0 and term[0]


def test_binpack_split_and_volume() -> None:
    env = envpool_tpu.make("BinPack-v2", env_type="gymnasium", num_envs=1, seed=0)
    obs, info = env.reset()
    assert obs["ems_mask"][0].sum() == 1
    assert obs["items_mask"][0].sum() == 2
    assert obs["action_mask"][0, 0, :2].all()
    obs, rew, term, trunc, info = env.step(np.array([[0, 0]], np.int32))
    np.testing.assert_allclose(rew[0], 0.125, rtol=1e-6)  # 0.5^3
    assert obs["items_placed"][0, 0] and not term[0]
    assert obs["ems_mask"][0].sum() == 3  # three children EMSs
    obs, rew, term, trunc, info = env.step(np.array([[0, 1]], np.int32))
    np.testing.assert_allclose(rew[0], 0.125, rtol=1e-6)
    assert term[0]  # no items left -> no valid action


def test_sokoban_fallback_level() -> None:
    env = envpool_tpu.make("Sokoban-v0", env_type="gymnasium", num_envs=1, seed=0)
    obs, info = env.reset()
    grid = obs["grid"]
    assert grid.shape == (1, 10, 10, 2)
    # Agent at (4, 2); four boxes on row 3, targets row 2.
    assert grid[0, 4, 2, 0] == 3
    assert (grid[0, 3, 2:6, 0] == 4).all()
    assert (grid[0, 2, 2:6, 1] == 2).all()
    # Push the box at (3,2) up onto the target at (2,2).
    obs, rew, term, trunc, info = env.step(np.array([0], np.int32))
    np.testing.assert_allclose(rew[0], 1.0 - 0.1, rtol=1e-5)
    grid = obs["grid"]
    assert grid[0, 2, 2, 0] == 4 and grid[0, 3, 2, 0] == 3
    np.testing.assert_allclose(info["prop_correct_boxes"][0], 0.25)
    # Pushing again moves the box off the target: -1 plus step penalty.
    obs, rew, term, trunc, info = env.step(np.array([0], np.int32))
    np.testing.assert_allclose(rew[0], -1.1, rtol=1e-5)
    assert obs["grid"][0, 1, 2, 0] == 4
    np.testing.assert_allclose(info["prop_correct_boxes"][0], 0.0)
    # Pushing into the wall behind it is now a noop.
    obs, rew, term, trunc, info = env.step(np.array([0], np.int32))
    np.testing.assert_allclose(rew[0], -0.1, rtol=1e-5)
    assert obs["grid"][0, 1, 2, 0] == 4 and obs["grid"][0, 2, 2, 0] == 3


def test_pacman_pellets() -> None:
    env = envpool_tpu.make("PacMan-v1", env_type="gymnasium", num_envs=1, seed=0)
    obs, info = env.reset()
    assert obs["grid"].shape == (1, 31, 28)
    assert not obs["action_mask"][0, 1]  # wall above (1,1)
    # Walk right over the three pellets at (1, 2..4).
    total = 0.0
    for _ in range(3):
        obs, rew, term, trunc, info = env.step(np.array([2], np.int32))
        total += float(rew[0])
    assert total == 30.0 and term[0]  # all pellets eaten
    assert obs["score"][0] == 30
    # Walking into a wall is -1 and terminal.
    env2 = envpool_tpu.make("PacMan-v1", env_type="gymnasium", num_envs=1, seed=0)
    env2.reset()
    obs, rew, term, trunc, info = env2.step(np.array([1], np.int32))
    assert rew[0] == -1.0 and term[0]


def test_mmst_path_walk() -> None:
    env = envpool_tpu.make("MMST-v0", env_type="gymnasium", num_envs=1, seed=0)
    obs, info = env.reset()
    assert (obs["positions"][0] == [0, 12, 24]).all()
    assert obs["node_types"][0, 0] == 5 and obs["node_types"][0, 1] == 0
    # Each agent hops to its right neighbor: +3.
    obs, rew, term, trunc, info = env.step(np.array([[1, 13, 25]], np.int32))
    assert rew[0] == 3.0 and not term[0]
    # Hopping to a visited node is invalid: -1 and terminal.
    obs, rew, term, trunc, info = env.step(np.array([[0, 14, 26]], np.int32))
    assert rew[0] == -1.0 and term[0]


def test_search_and_rescue_detection() -> None:
    env = envpool_tpu.make(
        "SearchAndRescue-v0", env_type="gymnasium", num_envs=1, seed=0
    )
    obs, info = env.reset()
    assert obs["searcher_views"].shape == (1, 2, 3, 128)
    np.testing.assert_allclose(obs["searcher_views"][0, 0, 0, 0], 0.1)
    assert obs["targets_remaining"][0] == 1.0
    # Searcher 0 moves +x toward the target at (0.1, 0).
    acts = np.zeros((1, 2, 2), np.float32)
    acts[0, 0, 0] = 1.0
    obs, rew, term, trunc, info = env.step(acts)
    assert rew[0] == 1.0 and term[0]  # lands exactly on the target
    assert obs["targets_remaining"][0] == 0.0


def test_jumanji_wave5_pools() -> None:
    rng = np.random.default_rng(5)
    specs = {
        "JobShop-v0": lambda: rng.integers(0, 21, (4, 10)),
        "MultiCVRP-v0": lambda: rng.integers(0, 21, (4, 2)),
        "BinPack-v2": lambda: rng.integers(0, [40, 20], (4, 2)),
        "Sokoban-v0": lambda: rng.integers(0, 4, 4),
        "PacMan-v1": lambda: rng.integers(0, 5, 4),
        "MMST-v0": lambda: rng.integers(0, 36, (4, 3)),
    }
    for task, sample in specs.items():
        assert f"Jumanji/{task}" in envpool_tpu.list_all_envs()
        env = envpool_tpu.make(task, env_type="gymnasium", num_envs=4, seed=0)
        obs, info = env.reset()
        for _ in range(3):
            obs, rew, term, trunc, info = env.step(sample().astype(np.int32))
    env = envpool_tpu.make(
        "SearchAndRescue-v0", env_type="gymnasium", num_envs=4, seed=0
    )
    env.reset()
    for _ in range(3):
        env.step(rng.uniform(-1, 1, (4, 2, 2)).astype(np.float32))
