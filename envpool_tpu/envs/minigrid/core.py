"""MiniGrid core mechanics — TPU-native int-array implementation.

Behavioral reference: ``envpool/minigrid/impl/minigrid_core.cc`` (itself a
native reimplementation of Farama MiniGrid).  World state is an int8
``[H, W, 3]`` grid of (object, color, state) plus agent pose; the 7x7
egocentric observation with MiniGrid's shadow-casting visibility mask is
computed by pure array ops (static unrolled sweeps — the view is tiny).

Object / color / action encodings follow MiniGrid exactly so observations
are drop-in compatible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# OBJECT_TO_IDX
UNSEEN, EMPTY, WALL, FLOOR, DOOR, KEY, BALL, BOX, GOAL, LAVA, AGENT = range(11)
# Door states.
OPEN, CLOSED, LOCKED = 0, 1, 2
# Colors.
RED, GREEN, BLUE, PURPLE, YELLOW, GREY = range(6)
# Actions.
LEFT, RIGHT, FORWARD, PICKUP, DROP, TOGGLE, DONE = range(7)

# DIR_TO_VEC: 0 → +x (right), 1 → +y (down), 2 → -x, 3 → -y.
DIR_VEC = np.array([[1, 0], [0, 1], [-1, 0], [0, -1]], np.int32)


def empty_grid(width: int, height: int) -> jnp.ndarray:
    """Walled-border grid of empty cells: [H, W, 3] int8."""
    grid = np.zeros((height, width, 3), np.int8)
    grid[:, :, 0] = EMPTY
    grid[0, :, 0] = WALL
    grid[-1, :, 0] = WALL
    grid[:, 0, 0] = WALL
    grid[:, -1, 0] = WALL
    grid[grid[:, :, 0] == WALL, 1] = GREY
    return jnp.asarray(grid)


def set_cell(grid, x, y, obj, color=0, state=0):
    return grid.at[y, x].set(
        jnp.asarray([obj, color, state], jnp.int8)
    )


def place_random(key, grid, occupied_extra=None):
    """Uniform random free cell (MiniGrid place_obj rejection ≡ uniform).

    Returns (x, y).  ``occupied_extra`` is an optional [H, W] bool mask of
    additionally forbidden cells.
    """
    free = grid[:, :, 0] == EMPTY
    if occupied_extra is not None:
        free = free & ~occupied_extra
    logits = jnp.where(free, 0.0, -jnp.inf).reshape(-1)
    idx = jax.random.categorical(key, logits)
    w = grid.shape[1]
    return (idx % w).astype(jnp.int32), (idx // w).astype(jnp.int32)


def can_enter(cell):
    obj, _, state = cell[0], cell[1], cell[2]
    return (
        (obj == EMPTY)
        | (obj == FLOOR)
        | (obj == GOAL)
        | (obj == LAVA)
        | ((obj == DOOR) & (state == OPEN))
    )


def see_behind(obj, state):
    blocked = (obj == WALL) | ((obj == DOOR) & (state != OPEN))
    return ~blocked


def step_agent(grid, agent_pos, agent_dir, carrying, action):
    """One MiniGrid action; returns (grid, pos, dir, carrying, reached_goal,
    stepped_lava)."""
    x, y = agent_pos[0], agent_pos[1]
    dirs = jnp.asarray(DIR_VEC)
    fwd = agent_pos + dirs[agent_dir]
    h, w = grid.shape[0], grid.shape[1]
    fx = jnp.clip(fwd[0], 0, w - 1)
    fy = jnp.clip(fwd[1], 0, h - 1)
    fwd_cell = grid[fy, fx]

    new_dir = jnp.where(
        action == LEFT,
        jnp.mod(agent_dir - 1, 4),
        jnp.where(action == RIGHT, jnp.mod(agent_dir + 1, 4), agent_dir),
    )

    # Forward.
    move = (action == FORWARD) & can_enter(fwd_cell)
    new_pos = jnp.where(move, jnp.stack([fx, fy]), agent_pos)
    reached_goal = move & (fwd_cell[0] == GOAL)
    stepped_lava = move & (fwd_cell[0] == LAVA)

    # Pickup: key/ball/box in front, hands free.
    can_pick = (
        (fwd_cell[0] == KEY) | (fwd_cell[0] == BALL) | (fwd_cell[0] == BOX)
    )
    do_pick = (action == PICKUP) & can_pick & (carrying[0] == EMPTY)
    new_carrying = jnp.where(do_pick, fwd_cell[:2], carrying)
    grid = grid.at[fy, fx].set(
        jnp.where(
            do_pick, jnp.asarray([EMPTY, 0, 0], jnp.int8), grid[fy, fx]
        )
    )

    # Drop.
    do_drop = (
        (action == DROP) & (carrying[0] != EMPTY) & (fwd_cell[0] == EMPTY)
    )
    grid = grid.at[fy, fx].set(
        jnp.where(
            do_drop,
            jnp.concatenate([carrying, jnp.zeros(1, jnp.int8)]).astype(
                jnp.int8
            ),
            grid[fy, fx],
        )
    )
    new_carrying = jnp.where(
        do_drop, jnp.asarray([EMPTY, 0], jnp.int8), new_carrying
    )

    # Toggle doors.
    is_door = fwd_cell[0] == DOOR
    door_state = fwd_cell[2]
    has_key = (carrying[0] == KEY) & (carrying[1] == fwd_cell[1])
    opens = (door_state == CLOSED) | ((door_state == LOCKED) & has_key)
    closes = door_state == OPEN
    new_door_state = jnp.where(
        opens, OPEN, jnp.where(closes, CLOSED, door_state)
    ).astype(jnp.int8)
    do_toggle = (action == TOGGLE) & is_door
    grid = grid.at[fy, fx, 2].set(
        jnp.where(do_toggle, new_door_state, grid[fy, fx, 2])
    )

    # Toggle boxes: the box is replaced by its contents (MiniGrid
    # Box.toggle).  Contents are encoded in the state channel as
    # ``1 + type*8 + color`` (0 = empty box) — see ``box_contents``.
    do_box = (action == TOGGLE) & (fwd_cell[0] == BOX)
    enc = fwd_cell[2].astype(jnp.int32)
    c_type = ((enc - 1) // 8).astype(jnp.int8)
    c_color = ((enc - 1) % 8).astype(jnp.int8)
    revealed = jnp.where(
        enc > 0,
        jnp.stack([c_type, c_color, jnp.int8(0)]),
        jnp.asarray([EMPTY, 0, 0], jnp.int8),
    )
    grid = grid.at[fy, fx].set(
        jnp.where(do_box, revealed, grid[fy, fx])
    )

    return grid, new_pos, new_dir, new_carrying, reached_goal, stepped_lava


def box_contents(obj_type, color):
    """State-channel encoding for an object hidden inside a box."""
    return 1 + obj_type * 8 + color


def egocentric_view(grid, agent_pos, agent_dir, carrying, view: int = 7):
    """MiniGrid ``gen_obs``: rotated partial view + shadow-cast visibility.

    Agent sits at (view//2, view-1) facing up.  Out-of-grid cells are walls
    (Grid.slice semantics); invisible cells are zeroed (unseen).
    """
    half = view // 2
    # View coords (i=col 0..6, j=row 0..6); world offsets depend on dir.
    vi = jax.lax.broadcasted_iota(jnp.int32, (view, view), 1)  # col
    vj = jax.lax.broadcasted_iota(jnp.int32, (view, view), 0)  # row
    # In view frame: forward f = (view-1) - j, right r = i - half.
    f = (view - 1) - vj
    r = vi - half
    dirs = jnp.asarray(DIR_VEC)
    fvec = dirs[agent_dir]
    rvec = dirs[jnp.mod(agent_dir + 1, 4)]
    wx = agent_pos[0] + f * fvec[0] + r * rvec[0]
    wy = agent_pos[1] + f * fvec[1] + r * rvec[1]
    h, w = grid.shape[0], grid.shape[1]
    inside = (wx >= 0) & (wx < w) & (wy >= 0) & (wy < h)
    cx = jnp.clip(wx, 0, w - 1)
    cy = jnp.clip(wy, 0, h - 1)
    cells = grid[cy, cx]  # [view, view, 3]
    wall_cell = jnp.asarray([WALL, GREY, 0], jnp.int8)
    cells = jnp.where(inside[..., None], cells, wall_cell)

    # Agent cell shows the carried object, or EMPTY when hands are free —
    # NOT the underlying cell (gen_obs_grid sets the agent cell to None when
    # not carrying; reference minigrid_render.cc:357-358 does the same).
    agent_cell = jnp.where(
        carrying[0] != EMPTY,
        jnp.concatenate([carrying, jnp.zeros(1, jnp.int8)]).astype(jnp.int8),
        jnp.asarray([EMPTY, 0, 0], jnp.int8),
    )
    cells = cells.at[view - 1, half].set(agent_cell)

    # Shadow casting (Grid.process_vis): two sweeps per row, bottom-up.
    seeb = see_behind(cells[:, :, 0], cells[:, :, 2])
    mask = jnp.zeros((view, view), jnp.bool_)
    mask = mask.at[view - 1, half].set(True)
    for j in range(view - 1, -1, -1):
        # Left-to-right sweep.
        for i in range(0, view - 1):
            prop = mask[j, i] & seeb[j, i]
            mask = mask.at[j, i + 1].set(mask[j, i + 1] | prop)
            if j > 0:
                mask = mask.at[j - 1, i + 1].set(mask[j - 1, i + 1] | prop)
                mask = mask.at[j - 1, i].set(mask[j - 1, i] | prop)
        # Right-to-left sweep.
        for i in range(view - 1, 0, -1):
            prop = mask[j, i] & seeb[j, i]
            mask = mask.at[j, i - 1].set(mask[j, i - 1] | prop)
            if j > 0:
                mask = mask.at[j - 1, i - 1].set(mask[j - 1, i - 1] | prop)
                mask = mask.at[j - 1, i].set(mask[j - 1, i] | prop)
    cells = jnp.where(mask[..., None], cells, 0)
    # MiniGrid image layout is [x(col), y(row), 3].
    return jnp.transpose(cells, (1, 0, 2)).astype(jnp.uint8)
