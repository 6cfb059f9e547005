"""MiniGrid family tests."""

import numpy as np
import pytest

import envpool_tpu
from envpool_tpu.envs.minigrid import core as mg

import jax
import jax.numpy as jnp


def test_empty_scripted_walk() -> None:
    env = envpool_tpu.make(
        "MiniGrid-Empty-5x5-v0", env_type="gymnasium", num_envs=2, seed=0
    )
    obs, info = env.reset()
    assert obs["image"].shape == (2, 7, 7, 3)
    assert (obs["direction"] == 0).all()
    np.testing.assert_array_equal(info["agent_pos"][0], [1, 1])
    # forward x2, turn right, forward x2 → goal at (3,3).
    for a in [2, 2, 1, 2, 2]:
        obs, rew, term, trunc, info = env.step(np.full(2, a, np.int32))
    assert term.all()
    np.testing.assert_allclose(rew, 1.0 - 0.9 * 5 / 100, rtol=1e-6)


def test_view_shows_walls_and_visibility() -> None:
    env_cls = envpool_tpu.make_spec(
        "MiniGrid-Empty-5x5-v0", num_envs=1
    ).env
    key = jax.random.PRNGKey(0)
    st, obs = env_cls.reset_env(key)
    img = np.asarray(obs["obs:image"])
    # Agent cell (3, 6) is its own floor (empty).
    assert img[3, 6, 0] in (mg.EMPTY, 0)
    # In a 5x5 grid from (1,1) facing right, walls are visible ahead.
    assert (img[:, :, 0] == mg.WALL).any()
    # Goal (green) somewhere in view.
    assert (img[:, :, 0] == mg.GOAL).any()


def test_turn_semantics() -> None:
    env = envpool_tpu.make(
        "MiniGrid-Empty-5x5-v0", env_type="gymnasium", num_envs=1, seed=0
    )
    obs, _ = env.reset()
    obs, *_ = env.step(np.array([1], np.int32))  # right
    assert obs["direction"][0] == 1
    obs, *_ = env.step(np.array([0], np.int32))  # left
    assert obs["direction"][0] == 0
    obs, *_ = env.step(np.array([0], np.int32))  # left wraps
    assert obs["direction"][0] == 3


def test_lava_terminates_with_zero() -> None:
    env = envpool_tpu.make(
        "MiniGrid-DistShift1-v0", env_type="gymnasium", num_envs=1, seed=0
    )
    env.reset()
    # DistShift1: lava at row 2, cols 3-5; agent (1,1) facing right.
    # forward x2 → (3,1); turn right (dir=down); forward → lava at (3,2).
    rew = None
    for a in [2, 2, 1, 2]:
        obs, rew, term, trunc, info = env.step(np.array([a], np.int32))
    assert term[0]
    assert rew[0] == 0.0


def test_doorkey_pickup_and_unlock() -> None:
    """Key pickup → toggle locked door → opens."""
    from envpool_tpu.envs.minigrid import core

    grid = core.empty_grid(6, 6)
    grid = core.set_cell(grid, 3, 1, core.DOOR, core.YELLOW, core.LOCKED)
    grid = core.set_cell(grid, 2, 1, core.KEY, core.YELLOW)
    pos = jnp.asarray([1, 1], jnp.int32)
    d = jnp.int32(0)  # facing right at the key
    carrying = jnp.asarray([core.EMPTY, 0], jnp.int8)
    # Pickup key.
    grid, pos, d, carrying, goal, lava = core.step_agent(
        grid, pos, d, carrying, jnp.int32(core.PICKUP)
    )
    assert int(carrying[0]) == core.KEY
    assert int(grid[1, 2, 0]) == core.EMPTY
    # Move forward to (2,1), door now in front at (3,1).
    grid, pos, d, carrying, *_ = core.step_agent(
        grid, pos, d, carrying, jnp.int32(core.FORWARD)
    )
    # Toggle → unlocks.
    grid, pos, d, carrying, *_ = core.step_agent(
        grid, pos, d, carrying, jnp.int32(core.TOGGLE)
    )
    assert int(grid[1, 3, 2]) == core.OPEN
    # Walk through.
    grid, pos, d, carrying, *_ = core.step_agent(
        grid, pos, d, carrying, jnp.int32(core.FORWARD)
    )
    np.testing.assert_array_equal(np.asarray(pos), [3, 1])


def test_registration_count() -> None:
    tasks = [t for t in envpool_tpu.list_all_envs() if t.startswith("MiniGrid")]
    assert len(tasks) == 81  # id-count parity with the reference
    babyai = [t for t in envpool_tpu.list_all_envs() if t.startswith("BabyAI")]
    assert len(babyai) == 96


def test_determinism_random_tasks() -> None:
    def run(task):
        env = envpool_tpu.make(task, env_type="gymnasium", num_envs=4, seed=3)
        obs, info = env.reset()
        return np.asarray(obs["image"])

    for task in ["MiniGrid-DoorKey-5x5-v0", "MiniGrid-FourRooms-v0"]:
        np.testing.assert_array_equal(run(task), run(task))


def test_babyai_goto_obj() -> None:
    env = envpool_tpu.make(
        "BabyAI-GoToObj-v0", env_type="gymnasium", num_envs=8, seed=0
    )
    obs, info = env.reset()
    # Mission id encodes color*8 + object type (key/ball/box = 5/6/7).
    assert all(m % 8 in (5, 6, 7) for m in info["mission_id"].tolist())
    rng = np.random.default_rng(0)
    succ = 0
    for _ in range(200):
        obs, rew, term, trunc, info = env.step(
            rng.integers(0, 3, 8).astype(np.int32)
        )
        succ += int((rew > 0).sum())
    assert succ > 0  # random walk eventually faces the object


def test_babyai_goto_door_missions() -> None:
    env = envpool_tpu.make(
        "BabyAI-GoToDoor-v0", env_type="gymnasium", num_envs=8, seed=1
    )
    obs, info = env.reset()
    assert all(m % 8 == mg.DOOR for m in info["mission_id"].tolist())


# ---------------------------------------------------------------------------
# Wave 2 tasks (tasks2.py)
# ---------------------------------------------------------------------------


def _base_state(grid, x, y, d, extra=None):
    st = {
        "grid": grid,
        "pos": jnp.asarray([x, y], jnp.int32),
        "dir": jnp.int32(d),
        "carrying": jnp.asarray([mg.EMPTY, 0], jnp.int8),
        "t": jnp.int32(0),
    }
    if extra:
        st.update(extra)
    return st


def test_dynamic_obstacles_collision() -> None:
    from envpool_tpu.envs.minigrid import DynamicObstaclesEnv

    env = DynamicObstaclesEnv.from_config(num_envs=1, size=5, n_obstacles=1)
    key = jax.random.PRNGKey(0)
    grid = mg.empty_grid(5, 5)
    grid = mg.set_cell(grid, 3, 3, mg.GOAL, mg.GREEN)
    grid = mg.set_cell(grid, 2, 1, mg.BALL, mg.BLUE)  # directly ahead
    st = _base_state(
        grid, 1, 1, 0, {"obstacles": jnp.asarray([[2, 1]], jnp.int32)}
    )
    out = env.step_env(st, jnp.int32(mg.FORWARD), key)
    assert bool(out.terminated)
    assert float(out.reward) == -1.0
    # Turning is always safe.
    out = env.step_env(st, jnp.int32(mg.LEFT), key)
    assert not bool(out.terminated)


def test_fetch_pickup_right_and_wrong() -> None:
    from envpool_tpu.envs.minigrid import FetchEnv

    env = FetchEnv.from_config(num_envs=1, size=8, num_objs=2)
    key = jax.random.PRNGKey(0)
    grid = mg.empty_grid(8, 8)
    grid = mg.set_cell(grid, 2, 1, mg.KEY, mg.RED)
    # Target = red key, syntax 0 -> mission id 0*12 + RED*2 + 0.
    target = jnp.asarray([mg.KEY, mg.RED, 0], jnp.int32)
    st = _base_state(grid, 1, 1, 0, {"target": target})
    out = env.step_env(st, jnp.int32(mg.PICKUP), key)
    assert bool(out.terminated)
    assert float(out.reward) > 0.8
    # Wrong color: terminates with 0.
    grid2 = mg.empty_grid(8, 8)
    grid2 = mg.set_cell(grid2, 2, 1, mg.KEY, mg.BLUE)
    st2 = _base_state(grid2, 1, 1, 0, {"target": target})
    out2 = env.step_env(st2, jnp.int32(mg.PICKUP), key)
    assert bool(out2.terminated) and float(out2.reward) == 0.0


def test_goto_done_semantics() -> None:
    from envpool_tpu.envs.minigrid import GoToEnv

    env = GoToEnv.from_config(num_envs=1, env_name="goto_door", size=6)
    key = jax.random.PRNGKey(0)
    grid = mg.empty_grid(6, 6)
    grid = mg.set_cell(grid, 0, 2, mg.DOOR, mg.PURPLE, mg.CLOSED)
    target = jnp.asarray([0, 2, mg.PURPLE], jnp.int32)  # (x, y, mission)
    st = _base_state(grid, 1, 2, 2, {"target": target})  # next to the door
    out = env.step_env(st, jnp.int32(mg.DONE), key)
    assert bool(out.terminated) and float(out.reward) > 0.8
    # done far away: terminated, no reward.
    st2 = _base_state(grid, 3, 3, 0, {"target": target})
    out2 = env.step_env(st2, jnp.int32(mg.DONE), key)
    assert bool(out2.terminated) and float(out2.reward) == 0.0
    # toggle terminates without reward.
    out3 = env.step_env(st, jnp.int32(mg.TOGGLE), key)
    assert bool(out3.terminated) and float(out3.reward) == 0.0


def test_red_blue_doors_order() -> None:
    from envpool_tpu.envs.minigrid import RedBlueDoorsEnv

    env = RedBlueDoorsEnv.from_config(num_envs=1, size=6)
    key = jax.random.PRNGKey(3)
    st, obs = env.reset_env(key)
    doors = np.asarray(st["doors"])
    grid = st["grid"]
    # Teleport agent next to the red door and open it.
    rx, ry = doors[0]
    st1 = {**st, "pos": jnp.asarray([rx + 1, ry], jnp.int32), "dir": jnp.int32(2)}
    out = env.step_env(st1, jnp.int32(mg.TOGGLE), key)
    assert not bool(out.terminated)
    assert int(out.state["grid"][ry, rx, 2]) == mg.OPEN
    # Now open the blue door -> success.
    bx, by = doors[1]
    st2 = {**out.state, "pos": jnp.asarray([bx - 1, by], jnp.int32), "dir": jnp.int32(0)}
    out2 = env.step_env(st2, jnp.int32(mg.TOGGLE), key)
    assert bool(out2.terminated) and float(out2.reward) > 0.5
    # Opening blue first fails.
    st3 = {**st, "pos": jnp.asarray([bx - 1, by], jnp.int32), "dir": jnp.int32(0)}
    out3 = env.step_env(st3, jnp.int32(mg.TOGGLE), key)
    assert bool(out3.terminated) and float(out3.reward) == 0.0


def test_unlock_and_unlock_pickup() -> None:
    from envpool_tpu.envs.minigrid import UnlockEnv

    env = UnlockEnv.from_config(num_envs=1, env_name="unlock")
    key = jax.random.PRNGKey(0)
    st, obs = env.reset_env(key)
    door = np.asarray(st["door"])
    color = int(st["grid"][door[1], door[0], 1])
    # Give the agent the key and put it in front of the door.
    st1 = {
        **st,
        "pos": jnp.asarray([door[0] - 1, door[1]], jnp.int32),
        "dir": jnp.int32(0),
        "carrying": jnp.asarray([mg.KEY, color], jnp.int8),
    }
    out = env.step_env(st1, jnp.int32(mg.TOGGLE), key)
    assert bool(out.terminated) and float(out.reward) > 0.5

    env2 = UnlockEnv.from_config(num_envs=1, env_name="unlock_pickup")
    st2, _ = env2.reset_env(key)
    g = np.asarray(st2["grid"])
    ys, xs = np.where(g[:, :, 0] == mg.BOX)
    assert len(xs) == 1  # the box exists in the right room
    assert xs[0] > int(st2["door"][0])


def test_memory_success_and_failure() -> None:
    from envpool_tpu.envs.minigrid import MemoryEnv

    env = MemoryEnv.from_config(num_envs=1, size=9)
    key = jax.random.PRNGKey(1)
    st, obs = env.reset_env(key)
    cells = np.asarray(st["goal_cells"])
    g = np.asarray(st["grid"])
    # The two candidate objects are a key and a ball in green.
    mid = 9 // 2
    def obj_row(y):  # the object sits one beyond the approach cell
        return y - 1 if y < mid else y + 1
    objs = {
        int(g[obj_row(cells[0][1]), cells[0][0], 0]),
        int(g[obj_row(cells[1][1]), cells[1][0], 0]),
    }
    assert objs == {mg.KEY, mg.BALL}
    # Teleport one cell before success and walk in.
    sx, sy = cells[0]
    st1 = {**st, "pos": jnp.asarray([sx, sy + 1], jnp.int32), "dir": jnp.int32(3)}
    out = env.step_env(st1, jnp.int32(mg.FORWARD), key)
    if not bool(out.terminated):  # facing may be off; try from the other side
        st1 = {**st, "pos": jnp.asarray([sx, sy - 1], jnp.int32), "dir": jnp.int32(1)}
        out = env.step_env(st1, jnp.int32(mg.FORWARD), key)
    assert bool(out.terminated) and float(out.reward) > 0.5
    # Failure cell gives 0.
    fx, fy = cells[1]
    stf = {**st, "pos": jnp.asarray([fx, fy + 1] if fy < 5 else [fx, fy - 1], jnp.int32),
           "dir": jnp.int32(3 if fy < 5 else 1)}
    outf = env.step_env(stf, jnp.int32(mg.FORWARD), key)
    assert bool(outf.terminated) and float(outf.reward) == 0.0


def test_wave2_pools_and_ids() -> None:
    ids = envpool_tpu.list_all_envs()
    for t in (
        "MiniGrid-Dynamic-Obstacles-8x8-v0",
        "MiniGrid-Fetch-6x6-N2-v0",
        "MiniGrid-GoToObject-8x8-N2-v0",
        "MiniGrid-RedBlueDoors-8x8-v0",
        "MiniGrid-MemoryS17Random-v0",
        "MiniGrid-Unlock-v0",
        "MiniGrid-SimpleCrossingS11N5-v0",
    ):
        assert t in ids
    rng = np.random.default_rng(0)
    env = envpool_tpu.make(
        "MiniGrid-Dynamic-Obstacles-8x8-v0", env_type="gymnasium",
        num_envs=8, seed=0,
    )
    obs, info = env.reset()
    crashes = 0
    for _ in range(30):
        obs, rew, term, trunc, info = env.step(
            rng.integers(0, 3, 8).astype(np.int32)
        )
        crashes += int((rew < 0).sum())
    assert crashes > 0  # random walks hit the moving balls


def test_babyai_local_desc_matching() -> None:
    from envpool_tpu.envs.minigrid import BabyAILocalEnv

    env = BabyAILocalEnv.from_config(
        num_envs=1, env_name="goto_red_ball", num_dists=0, size=8
    )
    key = jax.random.PRNGKey(0)
    grid = mg.empty_grid(8, 8)
    grid = mg.set_cell(grid, 2, 1, mg.BALL, mg.RED)
    target = jnp.asarray([mg.BALL, mg.RED], jnp.int32)
    st = _base_state(grid, 1, 1, 0, {"target": target})
    # Facing a matching red ball after any action -> success.
    out = env.step_env(st, jnp.int32(mg.DONE), key)
    assert bool(out.terminated) and float(out.reward) > 0.8
    # A blue ball in front does not match.
    grid2 = mg.empty_grid(8, 8)
    grid2 = mg.set_cell(grid2, 2, 1, mg.BALL, mg.BLUE)
    st2 = _base_state(grid2, 1, 1, 0, {"target": target})
    out2 = env.step_env(st2, jnp.int32(mg.DONE), key)
    assert not bool(out2.terminated)


def test_babyai_grey_distractors() -> None:
    from envpool_tpu.envs.minigrid import BabyAILocalEnv

    env = BabyAILocalEnv.from_config(
        num_envs=1, env_name="goto_red_ball_grey", num_dists=7, size=8
    )
    st, obs = env.reset_env(jax.random.PRNGKey(4))
    g = np.asarray(st["grid"])
    objs = (g[:, :, 0] == mg.KEY) | (g[:, :, 0] == mg.BOX)
    assert (g[objs, 1] == mg.GREY).all()  # all non-ball dists are grey
    balls = g[:, :, 0] == mg.BALL
    colors = set(g[balls, 1].tolist())
    assert mg.RED in colors  # the target ball
    assert colors <= {mg.RED, mg.GREY}
    assert int(obs["info:mission_id"]) == mg.RED * 8 + mg.BALL


def test_babyai_ids_registered() -> None:
    ids = envpool_tpu.list_all_envs()
    for t in (
        "BabyAI-GoToRedBall-v0",
        "BabyAI-GoToRedBallNoDists-v0",
        "BabyAI-GoToRedBlueBall-v0",
        "BabyAI-GoToLocal-v0",
        "BabyAI-GoToLocalS8N7-v0",
        "BabyAI-GoToObjS4-v0",
    ):
        assert t in ids
