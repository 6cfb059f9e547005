"""RoomGrid level-machinery semantics (BabyAI wave).

Unit-level checks of the mission success detectors, box contents, and a
full scripted episode on a deterministic-enough level.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import envpool_tpu
from envpool_tpu.envs.minigrid import core as mg
from envpool_tpu.envs.minigrid.roomgrid import (
    GOTO,
    OPEN,
    PICKUP,
    PUTNEXT,
    PutNextEnv,
    RoomGridEnv,
)


def _env(cls=PutNextEnv, **kw):
    base = dict(num_envs=1, room_size=6, num_rows=1, num_cols=1, num_dists=2)
    base.update(kw)
    return cls.from_config(**base)


def _blank_state(env, **kw):
    w, h = env._wh
    grid = mg.empty_grid(w, h)
    st = {
        "grid": grid,
        "pos": jnp.asarray([1, 1], jnp.int32),
        "dir": jnp.int32(0),
        "carrying": jnp.asarray([mg.EMPTY, 0], jnp.int8),
        "t": jnp.int32(0),
        "mission": env.mission(GOTO, mg.BALL, mg.RED),
    }
    st.update(kw)
    return st


def test_goto_detector_front_cell() -> None:
    env = _env()
    st = _blank_state(env)
    st["grid"] = mg.set_cell(st["grid"], 2, 1, mg.BALL, mg.RED)
    # Agent at (1,1) facing +x → front cell (2,1) holds the red ball.
    assert bool(env._desc_done(st, GOTO, mg.BALL, mg.RED, -1, -1))
    assert not bool(env._desc_done(st, GOTO, mg.BALL, mg.BLUE, -1, -1))
    # Wildcard type matches any object.
    assert bool(env._desc_done(st, GOTO, -1, mg.RED, -1, -1))


def test_open_detector_and_wrong_open() -> None:
    env = _env()
    st = _blank_state(env)
    st["grid"] = mg.set_cell(st["grid"], 3, 3, mg.DOOR, mg.BLUE, mg.OPEN)
    assert bool(env._desc_done(st, OPEN, mg.DOOR, mg.BLUE, -1, -1))
    assert not bool(env._desc_done(st, OPEN, mg.DOOR, mg.RED, -1, -1))
    assert bool(env._wrong_open(st, jnp.int32(mg.RED)))
    assert not bool(env._wrong_open(st, jnp.int32(mg.BLUE)))


def test_putnext_detector_adjacency() -> None:
    env = _env()
    st = _blank_state(env)
    st["grid"] = mg.set_cell(st["grid"], 2, 2, mg.BALL, mg.RED)
    st["grid"] = mg.set_cell(st["grid"], 3, 2, mg.BOX, mg.GREEN)
    ok = env._desc_done(st, PUTNEXT, mg.BALL, mg.RED, mg.BOX, mg.GREEN)
    assert bool(ok)
    # Diagonal is NOT adjacent.
    st2 = _blank_state(env)
    st2["grid"] = mg.set_cell(st2["grid"], 2, 2, mg.BALL, mg.RED)
    st2["grid"] = mg.set_cell(st2["grid"], 3, 3, mg.BOX, mg.GREEN)
    assert not bool(
        env._desc_done(st2, PUTNEXT, mg.BALL, mg.RED, mg.BOX, mg.GREEN)
    )


def test_pickup_detector_carrying() -> None:
    env = _env()
    st = _blank_state(env, carrying=jnp.asarray([mg.KEY, mg.YELLOW], jnp.int8))
    assert bool(env._desc_done(st, PICKUP, mg.KEY, mg.YELLOW, -1, -1))
    assert not bool(env._desc_done(st, PICKUP, mg.BALL, mg.YELLOW, -1, -1))


def test_box_toggle_reveals_contents() -> None:
    grid = mg.empty_grid(6, 6)
    grid = mg.set_cell(
        grid, 2, 1, mg.BOX, mg.GREY, mg.box_contents(mg.KEY, mg.BLUE)
    )
    pos = jnp.asarray([1, 1], jnp.int32)
    carrying = jnp.asarray([mg.EMPTY, 0], jnp.int8)
    grid2, *_ = mg.step_agent(grid, pos, jnp.int32(0), carrying,
                              jnp.int32(mg.TOGGLE))
    assert int(grid2[1, 2, 0]) == mg.KEY
    assert int(grid2[1, 2, 1]) == mg.BLUE


def test_one_room_scripted_solution() -> None:
    """Walk straight at the red ball in OneRoomS8 → success reward."""
    env = envpool_tpu.make_spec("BabyAI-OneRoomS8-v0", num_envs=1).env
    key = jax.random.PRNGKey(4)
    st, obs = env.reset_env(key)
    # Navigate greedily toward the ball using full state access.
    for t in range(60):
        grid = np.asarray(st["grid"])
        ball = np.argwhere(grid[:, :, 0] == mg.BALL)
        (by, bx) = ball[0]
        ax, ay = int(st["pos"][0]), int(st["pos"][1])
        d = int(st["dir"])
        dx, dy = bx - ax, by - ay
        # Desired direction (prefer the larger displacement axis).
        if abs(dx) >= abs(dy) and dx != 0:
            want = 0 if dx > 0 else 2
        else:
            want = 1 if dy > 0 else 3
        if d == want:
            act = mg.FORWARD
        elif (want - d) % 4 == 1:
            act = mg.RIGHT
        else:
            act = mg.LEFT
        out = env.step_env(st, jnp.int32(act), key)
        st = out.state
        if bool(out.terminated):
            assert float(out.reward) > 0.0
            return
    pytest.fail("scripted policy did not reach the ball")


def test_mission_ids_stable_within_episode() -> None:
    env = envpool_tpu.make(
        "BabyAI-GoTo-v0", env_type="gymnasium", num_envs=2, seed=0
    )
    obs, info = env.reset()
    m0 = info["mission_id"].copy()
    for _ in range(3):
        obs, r, te, tr, info = env.step(np.zeros(2, np.int32))
        assert (info["mission_id"] == m0).all()


def test_connect_all_door_topology():
    """Doors follow BabyAI's connect_all: connected, but NOT on every
    wall (a random spanning tree plus extras on a 3x3 lattice)."""
    from collections import deque

    from envpool_tpu.core.registry import registry

    env = registry._env("BabyAI-GoTo-v0", num_envs=1)
    counts = []
    for seed in range(6):
        st, _ = env.reset_env(jax.random.PRNGKey(seed))
        grid = np.asarray(st["grid"])
        counts.append(int((grid[:, :, 0] == mg.DOOR).sum()))
        passable = grid[:, :, 0] != mg.WALL
        start = tuple(np.argwhere(passable)[0])
        seen = {start}
        q = deque([start])
        h, w = passable.shape
        while q:
            y, x = q.popleft()
            for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                ny, nx = y + dy, x + dx
                if (
                    0 <= ny < h and 0 <= nx < w and passable[ny, nx]
                    and (ny, nx) not in seen
                ):
                    seen.add((ny, nx))
                    q.append((ny, nx))
        assert len(seen) == passable.sum(), f"seed {seed} disconnected"
    # spanning tree needs 8 doors on 3x3; all-walls would be 12 every time
    assert min(counts) >= 8 and min(counts) < 12
