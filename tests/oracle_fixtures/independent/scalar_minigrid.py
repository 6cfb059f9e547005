"""Scalar MiniGrid oracle — written from the published Farama MiniGrid
semantics (minigrid/minigrid_env.py ``step``/``gen_obs_grid``,
minigrid/core/grid.py ``slice``/``rotate_left``/``process_vis``/``encode``),
matching the reference C++ reimplementation at
``/root/reference/envpool/minigrid/impl/minigrid_render.cc:276-370`` and
``minigrid_core.cc:80-140``.

Deliberately plain Python: list-of-lists grid, (x, y) coordinates, loops.
No JAX, no numpy vectorization — structurally independent from
``envpool_tpu/envs/minigrid``.
"""

from __future__ import annotations

import numpy as np

# OBJECT_TO_IDX (published MiniGrid constants).
UNSEEN, EMPTY, WALL, FLOOR, DOOR, KEY, BALL, BOX, GOAL, LAVA, AGENT = range(11)
OPEN, CLOSED, LOCKED = 0, 1, 2
LEFT, RIGHT, FORWARD, PICKUP, DROP, TOGGLE, DONE = range(7)
DIR_TO_VEC = [(1, 0), (0, 1), (-1, 0), (0, -1)]


class Cell:
    """One world cell: (type, color, state).  ``contains`` is the object
    hidden inside a box (MiniGrid Box.contains)."""

    __slots__ = ("type", "color", "state", "contains")

    def __init__(self, type_=EMPTY, color=0, state=0, contains=None):
        self.type = int(type_)
        self.color = int(color)
        self.state = int(state)
        self.contains = contains

    # -- published WorldObj predicates --------------------------------------

    def can_overlap(self):
        if self.type == DOOR:
            return self.state == OPEN
        return self.type in (EMPTY, FLOOR, GOAL, LAVA)

    def can_pickup(self):
        return self.type in (KEY, BALL, BOX)

    def see_behind(self):
        if self.type == WALL:
            return False
        if self.type == DOOR and self.state != OPEN:
            return False
        return True

    def encode(self):
        if self.type == EMPTY:
            return (EMPTY, 0, 0)
        return (self.type, self.color, self.state)


class ScalarMiniGrid:
    """Steps one MiniGrid episode from an injected initial layout."""

    def __init__(self, grid, agent_pos, agent_dir, carrying, max_steps,
                 view_size=7):
        self.grid = grid  # [y][x] -> Cell
        self.height = len(grid)
        self.width = len(grid[0])
        self.agent_pos = tuple(int(v) for v in agent_pos)  # (x, y)
        self.agent_dir = int(agent_dir)
        self.carrying = carrying  # Cell or None
        self.max_steps = int(max_steps)
        self.view_size = int(view_size)
        self.step_count = 0

    # -- construction from an envpool_tpu reset state -----------------------

    @classmethod
    def from_arrays(cls, grid_hw3, pos_xy, agent_dir, carrying_tc, max_steps,
                    view_size=7):
        """Inject an initial layout.

        ``grid_hw3`` is [H, W, 3] int (type, color, state) indexed [y, x];
        box contents use envpool_tpu's state-channel packing
        ``1 + type*8 + color`` (0 = empty box) — decoded here into a real
        ``contains`` object so toggle semantics follow published MiniGrid.
        """
        g = np.asarray(grid_hw3)
        grid = []
        for y in range(g.shape[0]):
            row = []
            for x in range(g.shape[1]):
                t, c, s = (int(v) for v in g[y, x])
                contains = None
                if t == BOX and s > 0:
                    contains = Cell((s - 1) // 8, (s - 1) % 8, 0)
                    s = 0
                row.append(Cell(t, c, s, contains))
            grid.append(row)
        carrying = None
        if carrying_tc is not None and int(carrying_tc[0]) != EMPTY:
            carrying = Cell(int(carrying_tc[0]), int(carrying_tc[1]), 0)
        return cls(grid, pos_xy, agent_dir, carrying, max_steps, view_size)

    # -- step (published MiniGridEnv.step) ----------------------------------

    def step(self, action):
        """Returns (reward, terminated, truncated)."""
        self.step_count += 1
        reward = 0.0
        terminated = False

        dx, dy = DIR_TO_VEC[self.agent_dir]
        fx, fy = self.agent_pos[0] + dx, self.agent_pos[1] + dy
        in_bounds = 0 <= fx < self.width and 0 <= fy < self.height
        fwd = self.grid[fy][fx] if in_bounds else Cell(WALL, 5)

        if action == LEFT:
            self.agent_dir = (self.agent_dir - 1) % 4
        elif action == RIGHT:
            self.agent_dir = (self.agent_dir + 1) % 4
        elif action == FORWARD:
            if fwd.can_overlap():
                self.agent_pos = (fx, fy)
                if fwd.type == GOAL:
                    terminated = True
                    reward = 1.0 - 0.9 * (self.step_count / self.max_steps)
                elif fwd.type == LAVA:
                    terminated = True
        elif action == PICKUP:
            if fwd.can_pickup() and self.carrying is None:
                self.carrying = fwd
                self.grid[fy][fx] = Cell(EMPTY)
        elif action == DROP:
            if fwd.type == EMPTY and self.carrying is not None:
                self.grid[fy][fx] = self.carrying
                self.carrying = None
        elif action == TOGGLE:
            self._toggle(fwd, fx, fy)
        elif action == DONE:
            pass

        truncated = self.step_count >= self.max_steps
        return reward, terminated, truncated

    def _toggle(self, cell, x, y):
        """Published Door.toggle / Box.toggle."""
        if cell.type == DOOR:
            if cell.state == LOCKED:
                if (
                    self.carrying is not None
                    and self.carrying.type == KEY
                    and self.carrying.color == cell.color
                ):
                    cell.state = OPEN
            elif cell.state == CLOSED:
                cell.state = OPEN
            elif cell.state == OPEN:
                cell.state = CLOSED
        elif cell.type == BOX:
            # Box is replaced by its contents.
            self.grid[y][x] = cell.contains if cell.contains else Cell(EMPTY)

    # -- observation (published gen_obs_grid + Grid.encode) -----------------

    def gen_obs(self):
        """[view, view, 3] uint8 image, MiniGrid [x, y] layout."""
        v = self.view_size
        # get_view_exts: top-left of the view in world coords per direction.
        ax, ay = self.agent_pos
        if self.agent_dir == 0:
            top_x, top_y = ax, ay - v // 2
        elif self.agent_dir == 1:
            top_x, top_y = ax - v // 2, ay
        elif self.agent_dir == 2:
            top_x, top_y = ax - v + 1, ay - v // 2
        else:
            top_x, top_y = ax - v // 2, ay - v + 1

        # Grid.slice: out-of-bounds cells become walls.
        view = [[None] * v for _ in range(v)]  # view[y][x]
        for y in range(v):
            for x in range(v):
                gx, gy = top_x + x, top_y + y
                if 0 <= gx < self.width and 0 <= gy < self.height:
                    c = self.grid[gy][gx]
                    view[y][x] = Cell(c.type, c.color, c.state, c.contains)
                else:
                    view[y][x] = Cell(WALL, 5)

        # Grid.rotate_left, agent_dir + 1 times.
        for _ in range(self.agent_dir + 1):
            rotated = [[None] * v for _ in range(v)]
            for y in range(v):
                for x in range(v):
                    rotated[v - 1 - x][y] = view[y][x]
            view = rotated

        # Grid.process_vis from the agent cell (x = v//2, y = v-1).
        mask = [[False] * v for _ in range(v)]  # mask[x][y]
        mask[v // 2][v - 1] = True
        for y in range(v - 1, -1, -1):
            for x in range(0, v - 1):
                if not mask[x][y] or not view[y][x].see_behind():
                    continue
                mask[x + 1][y] = True
                if y > 0:
                    mask[x + 1][y - 1] = True
                    mask[x][y - 1] = True
            for x in range(v - 1, 0, -1):
                if not mask[x][y] or not view[y][x].see_behind():
                    continue
                mask[x - 1][y] = True
                if y > 0:
                    mask[x - 1][y - 1] = True
                    mask[x][y - 1] = True

        # Agent cell: carried object, else empty (gen_obs_grid sets None).
        view[v - 1][v // 2] = (
            self.carrying if self.carrying is not None else Cell(EMPTY)
        )

        img = np.zeros((v, v, 3), np.uint8)  # [x, y, 3] MiniGrid layout
        for y in range(v):
            for x in range(v):
                if mask[x][y]:
                    img[x, y] = view[y][x].encode()
        return img
