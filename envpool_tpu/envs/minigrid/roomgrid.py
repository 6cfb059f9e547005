"""RoomGrid levels: the BabyAI level suite + multi-room MiniGrid tasks.

Behavioral reference: ``envpool/minigrid/impl/babyai_*.cc`` and the Farama
minigrid/BabyAI level definitions.  A RoomGrid is ``num_rows x num_cols``
rooms of ``room_size``; doors sit on shared walls; missions are
(kind, type, color) descriptors with an optional second instruction for
"then"-sequenced levels.

Documented deviations from BabyAI generation (behavior-level, not
observation-level — the obs encoding is exact):

* Door topology now MATCHES BabyAI's ``connect_all``: a random
  add-doors-until-connected process (≈ random spanning tree plus
  extras), run as a fixed-iteration masked scan
  (``_connect_doors_mask``).  Positions along each wall and all colors
  stay random.
* ``loc`` descriptors ("on your left") match by type/color only.
* Mission text is exposed as ``info:mission_id`` (packed descriptor ints)
  rather than tokenized bytes.
* Boxes can be carried but their hidden contents are dropped (BabyAI
  keeps contents; no level's success depends on this).

Success/reward semantics follow BabyAI exactly: reward
``1 - 0.9 * t / max_steps`` on instruction completion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.env import EnvOut
from ...core.specs import ArraySpec
from . import core as mg
from .minigrid_env import MiniGridEnv

# Mission kinds.
GOTO, OPEN, PICKUP, PUTNEXT, REACH_GOAL, NONE = range(6)

_OBJ_TYPES = (mg.KEY, mg.BALL, mg.BOX)


def _iota2(h, w):
    return (
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0),
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 1),
    )


class RoomGridEnv(MiniGridEnv):
    """Base for room-grid levels with descriptor missions."""

    DEFAULT_CONFIG = dict(MiniGridEnv.DEFAULT_CONFIG)
    DEFAULT_CONFIG.update(
        {
            "room_size": 8,
            "num_rows": 3,
            "num_cols": 3,
            "num_dists": 18,
            "doors_open": False,
            "debug": False,
        }
    )

    # -- geometry ----------------------------------------------------------

    @property
    def _rs(self) -> int:
        return int(self.config["room_size"])

    @property
    def _rows(self) -> int:
        return int(self.config["num_rows"])

    @property
    def _cols(self) -> int:
        return int(self.config["num_cols"])

    @property
    def _wh(self):
        rs = self._rs
        return self._cols * (rs - 1) + 1, self._rows * (rs - 1) + 1

    def _grid_with_walls(self):
        """Walls on all room boundaries (numpy, static)."""
        w, h = self._wh
        rs = self._rs
        grid = np.zeros((h, w, 3), np.int8)
        grid[:, :, 0] = mg.EMPTY
        for c in range(self._cols + 1):
            grid[:, c * (rs - 1), 0] = mg.WALL
        for r in range(self._rows + 1):
            grid[r * (rs - 1), :, 0] = mg.WALL
        grid[grid[:, :, 0] == mg.WALL, 1] = mg.GREY
        return jnp.asarray(grid)

    def _door_slots(self):
        """Static list of (r, c, horizontal?) adjacent-room wall slots."""
        slots = []
        for r in range(self._rows):
            for c in range(self._cols - 1):
                slots.append((r, c, True))   # wall right of room (r, c)
        for r in range(self._rows - 1):
            for c in range(self._cols):
                slots.append((r, c, False))  # wall below room (r, c)
        return slots

    def _slot_xy(self, key, slot):
        """Random door position on a wall slot → traced (x, y)."""
        r, c, horiz = slot
        rs = self._rs
        if horiz:
            x = jnp.int32((c + 1) * (rs - 1))
            y = r * (rs - 1) + 1 + jax.random.randint(key, (), 0, rs - 2)
        else:
            y = jnp.int32((r + 1) * (rs - 1))
            x = c * (rs - 1) + 1 + jax.random.randint(key, (), 0, rs - 2)
        return x, jnp.asarray(y, jnp.int32)

    def _connect_doors_mask(self, key):
        """Which wall slots get a door: BabyAI's ``connect_all`` process.

        BabyAI repeatedly picks a random room/wall and adds a door there
        until every room is reachable (minigrid ``RoomGrid.connect_all``)
        — a random graph process stopped at connectivity, i.e. roughly a
        random spanning tree plus a few extras.  Same process here as a
        fixed-iteration masked scan: each step picks a random slot and
        opens it only while the room graph is still disconnected.
        Connectivity via min-label propagation on the (≤3×3) room
        lattice.  Replaces the earlier door-on-every-wall deviation.
        """
        slots = self._door_slots()
        n = len(slots)
        rooms = self._rows * self._cols
        ea, eb = [], []
        for r, c, horiz in slots:
            ea.append(r * self._cols + c)
            eb.append(r * self._cols + (c + 1) if horiz
                      else (r + 1) * self._cols + c)
        ea = jnp.asarray(ea)
        eb = jnp.asarray(eb)
        eye = jnp.eye(rooms, dtype=bool)

        def connected(present):
            A = jnp.zeros((rooms, rooms), bool)
            A = A.at[ea, eb].max(present).at[eb, ea].max(present) | eye
            lab = jnp.arange(rooms)
            for _ in range(rooms):
                lab = jnp.min(jnp.where(A, lab[None, :], rooms), axis=1)
            return jnp.all(lab == 0)

        def body(present, k):
            j = jax.random.randint(k, (), 0, n)
            done = connected(present)
            present = present.at[j].set(present[j] | ~done)
            return present, None

        present, _ = jax.lax.scan(
            body, jnp.zeros((n,), bool), jax.random.split(key, 4 * n)
        )
        # Vanishingly unlikely fallback: if 4n draws never connected the
        # lattice, open every wall rather than ship an unsolvable level.
        return jnp.where(connected(present), present, jnp.ones((n,), bool))

    def _add_all_doors(self, key, grid, open_=False, state=None,
                       connect=True):
        """Doors on the ``connect_all`` slot subset (random pos/color).

        Returns ``(grid, placed)`` with ``placed`` entries
        ``(x, y, color, present)`` — ``present`` is traced; target
        selection must sample present doors only (see ``_pick_door``).
        """
        slots = self._door_slots()
        if not slots:
            return grid, []
        kmask, key = jax.random.split(key)
        if connect and len(slots) > 1:
            present = self._connect_doors_mask(kmask)
        else:
            present = jnp.ones((len(slots),), bool)
        keys = jax.random.split(key, 2 * len(slots))
        st = mg.OPEN if open_ else mg.CLOSED
        if state is not None:
            st = state
        placed = []
        for i, slot in enumerate(slots):
            x, y = self._slot_xy(keys[2 * i], slot)
            color = jax.random.randint(keys[2 * i + 1], (), 0, 6).astype(
                jnp.int8
            )
            cell = jnp.stack([jnp.int8(mg.DOOR), color, jnp.int8(st)])
            grid = grid.at[y, x].set(
                jnp.where(present[i], cell, grid[y, x])
            )
            placed.append((x, y, color, present[i]))
        return grid, placed

    @staticmethod
    def _pick_door(key, placed):
        """Uniform index over the *present* doors in ``placed``."""
        pres = jnp.stack([p for _, _, _, p in placed])
        logits = jnp.where(pres, 0.0, -1e9)
        return jax.random.categorical(key, logits)

    def _room_mask(self, room_r, room_c):
        """[H, W] bool mask of a room interior; traced indices allowed."""
        w, h = self._wh
        rs = self._rs
        Y, X = _iota2(h, w)
        x0 = room_c * (rs - 1)
        y0 = room_r * (rs - 1)
        return (X > x0) & (X < x0 + rs - 1) & (Y > y0) & (Y < y0 + rs - 1)

    def _place_in_room(self, key, grid, room_r, room_c, obj, color, state=0):
        mask = self._room_mask(room_r, room_c)
        x, y = mg.place_random(key, grid, ~mask)
        grid = grid.at[y, x].set(
            jnp.stack(
                [
                    jnp.asarray(obj, jnp.int8),
                    jnp.asarray(color, jnp.int8),
                    jnp.asarray(state, jnp.int8),
                ]
            )
        )
        return grid, x, y

    def _add_distractors(self, key, grid, n, forbid_mask=None):
        """n random objects anywhere; returns grid + (types, colors)."""
        types, colors = [], []
        keys = jax.random.split(key, 3 * max(n, 1))
        for i in range(n):
            t = jnp.asarray(_OBJ_TYPES, jnp.int8)[
                jax.random.randint(keys[3 * i], (), 0, 3)
            ]
            c = jax.random.randint(keys[3 * i + 1], (), 0, 6).astype(jnp.int8)
            x, y = mg.place_random(keys[3 * i + 2], grid, forbid_mask)
            grid = grid.at[y, x].set(jnp.stack([t, c, jnp.int8(0)]))
            types.append(t)
            colors.append(c)
        return (
            grid,
            jnp.stack(types) if types else jnp.zeros(0, jnp.int8),
            jnp.stack(colors) if colors else jnp.zeros(0, jnp.int8),
        )

    # -- mission machinery -------------------------------------------------

    def state_spec(self):
        spec = dict(super().state_spec())
        spec["info:mission_id"] = ArraySpec(
            jnp.int32, (), -1, 2**20, is_discrete=True
        )
        return spec

    @staticmethod
    def mission(k1, t1, c1, k2=-1, t2=-1, c2=-1):
        return jnp.stack(
            [
                jnp.asarray(v, jnp.int32)
                for v in (k1, t1, c1, k2, t2, c2, 0)
            ]
        )

    def _mission_id(self, m):
        return (
            ((m[0] * 8 + jnp.maximum(m[1], 0)) * 8 + jnp.maximum(m[2], 0))
            * 512
            + (jnp.maximum(m[3], 0) * 8 + jnp.maximum(m[4], 0)) * 8
            + jnp.maximum(m[5], 0)
        )

    def _obs(self, st):
        obs = MiniGridEnv._obs(self, st)
        if "mission" in st:
            obs["info:mission_id"] = self._mission_id(st["mission"])
        return obs

    def _match(self, obj, color, t, c):
        """Cell matches descriptor; -1 is a wildcard over KEY/BALL/BOX."""
        obj = obj.astype(jnp.int32)
        color = color.astype(jnp.int32)
        t_ok = jnp.where(
            t < 0,
            (obj == mg.KEY) | (obj == mg.BALL) | (obj == mg.BOX),
            obj == t,
        )
        return t_ok & jnp.where(c < 0, True, color == c)

    def _desc_done(self, st, kind, t, c, t2, c2):
        """Instruction satisfied in the current state (any-match)."""
        grid = st["grid"]
        obj = grid[:, :, 0].astype(jnp.int32)
        col = grid[:, :, 1].astype(jnp.int32)
        dstate = grid[:, :, 2].astype(jnp.int32)
        w, h = self._wh
        fwd = st["pos"] + jnp.asarray(mg.DIR_VEC)[st["dir"]]
        fx = jnp.clip(fwd[0], 0, w - 1)
        fy = jnp.clip(fwd[1], 0, h - 1)
        goto_ok = self._match(
            grid[fy, fx, 0], grid[fy, fx, 1], t, c
        ) | (
            (t == mg.DOOR) & (grid[fy, fx, 0] == mg.DOOR)
            & jnp.where(c < 0, True, grid[fy, fx, 1].astype(jnp.int32) == c)
        )
        open_ok = jnp.any(
            (obj == mg.DOOR)
            & (dstate == mg.OPEN)
            & jnp.where(c < 0, True, col == c)
        )
        pickup_ok = self._match(st["carrying"][0], st["carrying"][1], t, c)
        a_mask = self._match(obj, col, t, c)
        b_mask = self._match(obj, col, t2, c2)
        near = (
            jnp.roll(b_mask, 1, 0)
            | jnp.roll(b_mask, -1, 0)
            | jnp.roll(b_mask, 1, 1)
            | jnp.roll(b_mask, -1, 1)
        )
        putnext_ok = jnp.any(a_mask & near)
        goal_ok = st.get("_reached_goal", jnp.bool_(False))
        return jnp.select(
            [
                kind == GOTO,
                kind == OPEN,
                kind == PICKUP,
                kind == PUTNEXT,
                kind == REACH_GOAL,
            ],
            [goto_ok, open_ok, pickup_ok, putnext_ok, goal_ok],
            jnp.bool_(False),
        )

    def _wrong_open(self, st, c_ok):
        """Debug levels: any open door NOT matching color ``c_ok``."""
        grid = st["grid"]
        return jnp.any(
            (grid[:, :, 0] == mg.DOOR)
            & (grid[:, :, 2] == mg.OPEN)
            & (grid[:, :, 1].astype(jnp.int32) != c_ok)
        )

    # -- env contract ------------------------------------------------------

    def generate(self, key):
        """-> (grid, agent_pos, agent_dir, mission[7]).  Override."""
        raise NotImplementedError

    def reset_env(self, key):
        grid, pos, d, mission = self.generate(key)
        st = {
            "grid": grid,
            "pos": pos.astype(jnp.int32),
            "dir": d.astype(jnp.int32),
            "carrying": jnp.asarray([mg.EMPTY, 0], jnp.int8),
            "t": jnp.int32(0),
            "mission": mission.astype(jnp.int32),
        }
        st.update(self.extra_state(key, st))
        return st, self._obs(st)

    def extra_state(self, key, st):
        """Hook for levels that start carrying an object, etc."""
        del key, st
        return {}

    def step_env(self, state, action, key):
        grid, pos, d, carrying, goal, lava = mg.step_agent(
            state["grid"],
            state["pos"],
            state["dir"],
            state["carrying"],
            action,
        )
        t = state["t"] + 1
        m = state["mission"]
        st = {
            "grid": grid,
            "pos": pos,
            "dir": d,
            "carrying": carrying,
            "t": t,
            "mission": m,
            "_reached_goal": goal,
        }
        d1 = self._desc_done(st, m[0], m[1], m[2], m[4], m[5])
        has_second = m[3] >= 0
        d2 = self._desc_done(st, m[3], m[4], m[5], -1, -1)
        stage = m[6]
        new_stage = jnp.where((stage == 0) & d1, 1, stage)
        success = jnp.where(has_second, (new_stage == 1) & d2, d1)
        fail = jnp.bool_(False)
        if bool(self.config["debug"]):
            # Opening any door outside the current sub-goal fails.
            cur_c = jnp.where(stage == 0, m[2], m[5])
            fail = (
                (m[0] == OPEN)
                & self._wrong_open(st, cur_c)
                & ~success
            )
        m = m.at[6].set(new_stage.astype(jnp.int32))
        st["mission"] = m
        del st["_reached_goal"]
        reward = jnp.where(
            success,
            1.0 - 0.9 * t.astype(jnp.float32) / self.max_episode_steps,
            0.0,
        ).astype(jnp.float32)
        return EnvOut(
            state=st,
            obs=self._obs(st),
            reward=reward,
            terminated=success | lava | fail,
        )


# ---------------------------------------------------------------------------
# Level generators
# ---------------------------------------------------------------------------


class OneRoomEnv(RoomGridEnv):
    """BabyAI OneRoomS{8,12,16,20}: go to the red ball in one room."""

    def generate(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        grid = self._grid_with_walls()
        grid, _, _ = self._place_in_room(k1, grid, 0, 0, mg.BALL, mg.RED)
        ax, ay = mg.place_random(k2, grid)
        d = jax.random.randint(k3, (), 0, 4, jnp.int32)
        return (
            grid,
            jnp.stack([ax, ay]),
            d,
            self.mission(GOTO, mg.BALL, mg.RED),
        )


class FindObjEnv(RoomGridEnv):
    """BabyAI FindObjS{5,6,7}: one object in a random room; go to it."""

    def generate(self, key):
        ks = jax.random.split(key, 6)
        grid = self._grid_with_walls()
        grid, _ = self._add_all_doors(ks[0], grid, open_=False)
        rr = jax.random.randint(ks[1], (), 0, self._rows)
        rc = jax.random.randint(ks[2], (), 0, self._cols)
        t = jnp.asarray(_OBJ_TYPES, jnp.int8)[
            jax.random.randint(ks[3], (), 0, 3)
        ]
        c = jax.random.randint(ks[3], (), 0, 6).astype(jnp.int8)
        grid, _, _ = self._place_in_room(ks[4], grid, rr, rc, t, c)
        # Agent in the center room.
        amask = self._room_mask(self._rows // 2, self._cols // 2)
        ax, ay = mg.place_random(ks[5], grid, ~amask)
        d = jax.random.randint(ks[4], (), 0, 4, jnp.int32)
        # Mission names the type only ("find the <type>").
        return (
            grid,
            jnp.stack([ax, ay]),
            d,
            self.mission(GOTO, t.astype(jnp.int32), -1),
        )


class GoToMazeEnv(RoomGridEnv):
    """BabyAI GoTo / GoToOpen / GoToObjMaze* — maze GoTo with dists."""

    def generate(self, key):
        ks = jax.random.split(key, 5)
        grid = self._grid_with_walls()
        grid, _ = self._add_all_doors(
            ks[0], grid, open_=bool(self.config["doors_open"])
        )
        n = int(self.config["num_dists"])
        grid, types, colors = self._add_distractors(ks[1], grid, max(n, 1))
        idx = jax.random.randint(ks[2], (), 0, max(n, 1))
        t = types[idx].astype(jnp.int32)
        c = colors[idx].astype(jnp.int32)
        ax, ay = mg.place_random(ks[3], grid)
        d = jax.random.randint(ks[4], (), 0, 4, jnp.int32)
        return grid, jnp.stack([ax, ay]), d, self.mission(GOTO, t, c)


class GoToSeqEnv(GoToMazeEnv):
    """BabyAI GoToSeq(S5R2): go to A, then go to B."""

    def generate(self, key):
        k1, k2 = jax.random.split(key)
        grid, pos, d, m1 = super().generate(k1)
        ks = jax.random.split(k2, 2)
        n = int(self.config["num_dists"])
        # Second target drawn independently from the object/color support.
        t2 = jnp.asarray(_OBJ_TYPES, jnp.int8)[
            jax.random.randint(ks[0], (), 0, 3)
        ].astype(jnp.int32)
        c2 = jax.random.randint(ks[1], (), 0, 6)
        del n
        return grid, pos, d, self.mission(
            GOTO, m1[1], m1[2], GOTO, t2, c2
        )


class WallDoorRoomEnv(RoomGridEnv):
    """Single room with doors on the outer walls (GoToObjDoor,
    ActionObjDoor, OpenDoor* families)."""

    N_DOORS = 4

    def _outer_doors(self, key, grid, distinct_colors=False, state=mg.CLOSED):
        w, h = self._wh
        ks = jax.random.split(key, 5)
        if distinct_colors:
            perm = jax.random.permutation(ks[4], 6)[: self.N_DOORS].astype(
                jnp.int8
            )
            colors = [perm[i] for i in range(self.N_DOORS)]
        else:
            colors = [
                jax.random.randint(ks[4], (), 0, 6).astype(jnp.int8)
                for _ in range(self.N_DOORS)
            ]
        dy = jax.random.randint(ks[0], (2,), 1, h - 1)
        dx = jax.random.randint(ks[1], (2,), 1, w - 1)
        slots = [(0, dx[0]), (h - 1, dx[1]), (dy[0], 0), (dy[1], w - 1)]
        placed = []
        for i, (ry, rx) in enumerate(slots[: self.N_DOORS]):
            grid = grid.at[ry, rx].set(
                jnp.stack(
                    [jnp.int8(mg.DOOR), colors[i], jnp.int8(state)]
                )
            )
            placed.append(colors[i])
        return grid, placed


class GoToObjDoorEnv(WallDoorRoomEnv):
    """BabyAI GoToObjDoor: go to an object or door in a single room."""

    def generate(self, key):
        ks = jax.random.split(key, 5)
        grid = self._grid_with_walls()
        grid, door_colors = self._outer_doors(ks[0], grid)
        n = int(self.config["num_dists"])
        grid, types, colors = self._add_distractors(ks[1], grid, max(n, 1))
        pick_door = jax.random.bernoulli(ks[2])
        idx = jax.random.randint(ks[2], (), 0, max(n, 1))
        di = jax.random.randint(ks[2], (), 0, 4)
        t = jnp.where(
            pick_door, mg.DOOR, types[idx].astype(jnp.int32)
        )
        c = jnp.where(
            pick_door,
            jnp.stack(door_colors)[di].astype(jnp.int32),
            colors[idx].astype(jnp.int32),
        )
        ax, ay = mg.place_random(ks[3], grid)
        d = jax.random.randint(ks[4], (), 0, 4, jnp.int32)
        return grid, jnp.stack([ax, ay]), d, self.mission(GOTO, t, c)


class ActionObjDoorEnv(GoToObjDoorEnv):
    """BabyAI ActionObjDoor: goto/pickup/open on objects or doors."""

    def generate(self, key):
        k1, k2 = jax.random.split(key)
        grid, pos, d, m = super().generate(k1)
        is_door = m[1] == mg.DOOR
        kind = jnp.where(
            is_door,
            jnp.where(jax.random.bernoulli(k2), OPEN, GOTO),
            jnp.where(jax.random.bernoulli(jax.random.fold_in(k2, 1)),
                      PICKUP, GOTO),
        )
        return grid, pos, d, self.mission(kind, m[1], m[2])


class OpenDoorEnv(WallDoorRoomEnv):
    """BabyAI OpenDoor{,Color,Loc,Debug} + OpenRedDoor: open the described
    door (single room, 4 distinctly colored doors)."""

    DEFAULT_CONFIG = dict(WallDoorRoomEnv.DEFAULT_CONFIG)
    DEFAULT_CONFIG.update({"fixed_color": -1})

    def generate(self, key):
        ks = jax.random.split(key, 4)
        grid = self._grid_with_walls()
        grid, door_colors = self._outer_doors(
            ks[0], grid, distinct_colors=True
        )
        fixed = int(self.config["fixed_color"])
        if fixed >= 0:
            # OpenRedDoor: force one door red and target it.
            grid = jnp.where(
                (grid[:, :, 0] == mg.DOOR)[..., None]
                & (grid[:, :, 1] == door_colors[0])[..., None],
                jnp.stack(
                    [
                        grid[:, :, 0],
                        jnp.full_like(grid[:, :, 1], fixed),
                        grid[:, :, 2],
                    ],
                    -1,
                ),
                grid,
            )
            c = jnp.int32(fixed)
        else:
            di = jax.random.randint(ks[1], (), 0, self.N_DOORS)
            c = jnp.stack(door_colors)[di].astype(jnp.int32)
        ax, ay = mg.place_random(ks[2], grid)
        d = jax.random.randint(ks[3], (), 0, 4, jnp.int32)
        return grid, jnp.stack([ax, ay]), d, self.mission(OPEN, mg.DOOR, c)


class OpenTwoDoorsEnv(WallDoorRoomEnv):
    """BabyAI OpenTwoDoors / OpenDoorsOrderN{2,4} / OpenRedBlueDoors:
    open door A, then door B (order enforced in debug mode)."""

    DEFAULT_CONFIG = dict(WallDoorRoomEnv.DEFAULT_CONFIG)
    DEFAULT_CONFIG.update({"n_doors": 2, "fixed_pair": False})

    @property
    def N_DOORS(self):  # type: ignore[override]
        return int(self.config["n_doors"])

    def generate(self, key):
        ks = jax.random.split(key, 4)
        grid = self._grid_with_walls()
        grid, door_colors = self._outer_doors(
            ks[0], grid, distinct_colors=True
        )
        if bool(self.config["fixed_pair"]):
            # OpenRedBlueDoors: recolor the first two doors red/blue.
            cs = jnp.stack(door_colors)
            obj = grid[:, :, 0]
            col = grid[:, :, 1]
            col = jnp.where(
                (obj == mg.DOOR) & (col == cs[0]), mg.RED, col
            )
            col = jnp.where(
                (obj == mg.DOOR) & (col == cs[1]), mg.BLUE, col
            )
            grid = jnp.stack([obj, col.astype(jnp.int8), grid[:, :, 2]], -1)
            c1, c2 = jnp.int32(mg.RED), jnp.int32(mg.BLUE)
        else:
            perm = jax.random.permutation(ks[1], self.N_DOORS)
            cs = jnp.stack(door_colors)
            c1 = cs[perm[0]].astype(jnp.int32)
            c2 = cs[perm[1]].astype(jnp.int32)
        ax, ay = mg.place_random(ks[2], grid)
        d = jax.random.randint(ks[3], (), 0, 4, jnp.int32)
        return grid, jnp.stack([ax, ay]), d, self.mission(
            OPEN, mg.DOOR, c1, OPEN, mg.DOOR, c2
        )


class OpenMazeEnv(RoomGridEnv):
    """BabyAI Open: open the <color> door in a 3x3 maze."""

    def generate(self, key):
        ks = jax.random.split(key, 4)
        grid = self._grid_with_walls()
        grid, placed = self._add_all_doors(ks[0], grid)
        di = self._pick_door(ks[1], placed)
        colors = jnp.stack([c for _, _, c, _ in placed])
        c = colors[di].astype(jnp.int32)
        ax, ay = mg.place_random(ks[2], grid)
        d = jax.random.randint(ks[3], (), 0, 4, jnp.int32)
        return grid, jnp.stack([ax, ay]), d, self.mission(OPEN, mg.DOOR, c)


class PickupEnv(GoToMazeEnv):
    """BabyAI Pickup / PickupDist / PickupLoc / UnblockPickup."""

    def generate(self, key):
        grid, pos, d, m = super().generate(key)
        return grid, pos, d, self.mission(PICKUP, m[1], m[2])


class PickupAboveEnv(RoomGridEnv):
    """BabyAI PickupAbove: object in the room above the center."""

    def generate(self, key):
        ks = jax.random.split(key, 5)
        grid = self._grid_with_walls()
        grid, _ = self._add_all_doors(ks[0], grid)
        t = jnp.asarray(_OBJ_TYPES, jnp.int8)[
            jax.random.randint(ks[1], (), 0, 3)
        ]
        c = jax.random.randint(ks[1], (), 0, 6).astype(jnp.int8)
        mid_r, mid_c = self._rows // 2, self._cols // 2
        grid, _, _ = self._place_in_room(ks[2], grid, mid_r - 1, mid_c, t, c)
        amask = self._room_mask(mid_r, mid_c)
        ax, ay = mg.place_random(ks[3], grid, ~amask)
        d = jax.random.randint(ks[4], (), 0, 4, jnp.int32)
        return grid, jnp.stack([ax, ay]), d, self.mission(
            PICKUP, t.astype(jnp.int32), c.astype(jnp.int32)
        )


class PutNextEnv(RoomGridEnv):
    """BabyAI PutNext* (+ MiniGrid PutNear): put A next to B."""

    DEFAULT_CONFIG = dict(RoomGridEnv.DEFAULT_CONFIG)
    DEFAULT_CONFIG.update({"carrying": False})

    def generate(self, key):
        ks = jax.random.split(key, 6)
        grid = self._grid_with_walls()
        if self._rows * self._cols > 1:
            grid, _ = self._add_all_doors(ks[0], grid)
        n = max(int(self.config["num_dists"]), 2)
        grid, types, colors = self._add_distractors(ks[1], grid, n)
        ia = jax.random.randint(ks[2], (), 0, n)
        ib = jnp.mod(
            ia + 1 + jax.random.randint(ks[3], (), 0, n - 1), n
        )
        ax, ay = mg.place_random(ks[4], grid)
        d = jax.random.randint(ks[5], (), 0, 4, jnp.int32)
        self._carry_idx = ia
        return (
            grid,
            jnp.stack([ax, ay]),
            d,
            self.mission(
                PUTNEXT,
                types[ia].astype(jnp.int32),
                colors[ia].astype(jnp.int32),
                -1,
                types[ib].astype(jnp.int32),
                colors[ib].astype(jnp.int32),
            ),
        )

    def extra_state(self, key, st):
        if not bool(self.config["carrying"]):
            return {}
        # Carrying variant: start with object A in hand; remove one
        # matching cell from the grid.
        m = st["mission"]
        grid = st["grid"]
        match = self._match(
            grid[:, :, 0].astype(jnp.int32),
            grid[:, :, 1].astype(jnp.int32),
            m[1],
            m[2],
        )
        idx = jnp.argmax(match.reshape(-1))
        w = grid.shape[1]
        gy, gx = idx // w, idx % w
        grid = grid.at[gy, gx].set(jnp.asarray([mg.EMPTY, 0, 0], jnp.int8))
        st["grid"] = grid
        return {
            "grid": grid,
            "carrying": jnp.stack(
                [m[1].astype(jnp.int8), m[2].astype(jnp.int8)]
            ),
        }


class UnlockRGEnv(RoomGridEnv):
    """BabyAI Unlock-class levels: locked door, key somewhere.

    Config: ``hidden_key`` (key inside a box), ``blocked`` (ball in front
    of the locked door), ``target`` ("open" | "pickup_box" | "pickup_ball"
    | "goto_ball"), ``key_in_other_room`` (UnlockToUnlock-ish chains are
    approximated with a single lock).
    """

    DEFAULT_CONFIG = dict(RoomGridEnv.DEFAULT_CONFIG)
    DEFAULT_CONFIG.update(
        {
            "hidden_key": False,
            "blocked": False,
            "target": "open",
            "num_rows": 1,
            "num_cols": 2,
            "room_size": 6,
            "num_dists": 0,
        }
    )

    def generate(self, key):
        ks = jax.random.split(key, 9)
        grid = self._grid_with_walls()
        slots = self._door_slots()
        # Lock the first slot's door (between rooms (0,0)-(0,1)); other
        # slots get ordinary closed doors.
        lock_slot = slots[0]
        grid, _ = (
            self._add_all_doors(ks[0], grid) if len(slots) > 1
            else (grid, [])
        )
        dx, dy = self._slot_xy(ks[1], lock_slot)
        lock_c = jax.random.randint(ks[2], (), 0, 6).astype(jnp.int8)
        grid = grid.at[dy, dx].set(
            jnp.stack([jnp.int8(mg.DOOR), lock_c, jnp.int8(mg.LOCKED)])
        )
        # Key in the first room (hidden in a box if configured).
        if bool(self.config["hidden_key"]):
            grid, _, _ = self._place_in_room(
                ks[3], grid, 0, 0, mg.BOX,
                jax.random.randint(ks[3], (), 0, 6).astype(jnp.int8),
                mg.box_contents(mg.KEY, lock_c),
            )
        else:
            grid, _, _ = self._place_in_room(
                ks[3], grid, 0, 0, mg.KEY, lock_c
            )
        # Blocking ball directly left of the locked door.
        if bool(self.config["blocked"]):
            grid = grid.at[dy, dx - 1].set(
                jnp.asarray([mg.BALL, mg.GREY, 0], jnp.int8)
            )
        # Target object in the locked room.
        target = str(self.config["target"])
        if target == "pickup_box":
            grid, _, _ = self._place_in_room(
                ks[4], grid, 0, 1, mg.BOX,
                jax.random.randint(ks[4], (), 0, 6).astype(jnp.int8),
            )
            mission = self.mission(PICKUP, mg.BOX, -1)
        elif target == "pickup_ball":
            grid, _, _ = self._place_in_room(
                ks[4], grid, 0, 1, mg.BALL, mg.BLUE
            )
            mission = self.mission(PICKUP, mg.BALL, mg.BLUE)
        elif target == "goto_ball":
            grid, _, _ = self._place_in_room(
                ks[4], grid, 0, 1, mg.BALL, mg.BLUE
            )
            mission = self.mission(GOTO, mg.BALL, mg.BLUE)
        else:
            mission = self.mission(OPEN, mg.DOOR, lock_c.astype(jnp.int32))
        # Distractors outside the locked room.
        n = int(self.config["num_dists"])
        if n:
            locked_mask = self._room_mask(0, 1)
            grid, _, _ = self._add_distractors(ks[5], grid, n, locked_mask)
        amask = self._room_mask(0, 0)
        ax, ay = mg.place_random(ks[6], grid, ~amask)
        d = jax.random.randint(ks[7], (), 0, 4, jnp.int32)
        return grid, jnp.stack([ax, ay]), d, mission


class KeyCorridorEnv(RoomGridEnv):
    """KeyCorridorS{n}R{m} (MiniGrid + BabyAI): ball behind a locked door
    off a corridor; the key hangs in another room."""

    DEFAULT_CONFIG = dict(RoomGridEnv.DEFAULT_CONFIG)
    DEFAULT_CONFIG.update({"num_cols": 3, "num_dists": 0})

    def generate(self, key):
        rows = self._rows
        ks = jax.random.split(key, 8 + 2 * rows)
        grid = self._grid_with_walls()
        rs = self._rs
        # Corridor: middle column rooms vertically connected by removing
        # wall cells; left/right rooms behind closed doors.
        for r in range(rows - 1):
            y = (r + 1) * (rs - 1)
            x = 1 * (rs - 1) + 1 + jax.random.randint(
                ks[8 + 2 * r], (), 0, rs - 2
            )
            grid = grid.at[y, x].set(jnp.asarray([mg.EMPTY, 0, 0], jnp.int8))
        # Doors from the corridor into each side room.
        door_xy = []
        for r in range(rows):
            for side_c, horiz_c in ((0, 0), (2, 1)):
                yk = jax.random.fold_in(ks[0], r * 4 + side_c)
                x = jnp.int32((horiz_c + 1) * (rs - 1))
                y = r * (rs - 1) + 1 + jax.random.randint(
                    yk, (), 0, rs - 2
                )
                c = jax.random.randint(
                    jax.random.fold_in(ks[1], r * 4 + side_c), (), 0, 6
                ).astype(jnp.int8)
                grid = grid.at[y, x].set(
                    jnp.stack([jnp.int8(mg.DOOR), c, jnp.int8(mg.CLOSED)])
                )
                door_xy.append((x, y, c, r, side_c))
        # Lock a random right-side door; ball inside; key in a random
        # left room.
        ri = jax.random.randint(ks[2], (), 0, rows)
        right = [(x, y, c) for (x, y, c, r, s) in door_xy if s == 2]
        xs = jnp.stack([x for x, _, _ in right])
        ys = jnp.stack([y for _, y, _ in right])
        cs = jnp.stack([c for _, _, c in right])
        lx, ly, lc = xs[ri], ys[ri], cs[ri]
        grid = grid.at[ly, lx, 2].set(jnp.int8(mg.LOCKED))
        ball_mask = self._room_mask(ri, 2)
        bx, by = mg.place_random(ks[3], grid, ~ball_mask)
        grid = grid.at[by, bx].set(
            jnp.asarray([mg.BALL, mg.BLUE, 0], jnp.int8)
        )
        ki = jax.random.randint(ks[4], (), 0, rows)
        key_mask = self._room_mask(ki, 0)
        kx, ky2 = mg.place_random(ks[5], grid, ~key_mask)
        grid = grid.at[ky2, kx].set(
            jnp.stack([jnp.int8(mg.KEY), lc, jnp.int8(0)])
        )
        # Agent in the corridor.
        amask = jnp.zeros_like(grid[:, :, 0], jnp.bool_)
        for r in range(rows):
            amask = amask | self._room_mask(r, 1)
        ax, ay = mg.place_random(ks[6], grid, ~amask)
        d = jax.random.randint(ks[7], (), 0, 4, jnp.int32)
        return grid, jnp.stack([ax, ay]), d, self.mission(
            PICKUP, mg.BALL, mg.BLUE
        )


class ObstructedMazeEnv(RoomGridEnv):
    """MiniGrid ObstructedMaze family: locked doors, keys in boxes,
    blocking balls; target is the blue ball."""

    DEFAULT_CONFIG = dict(RoomGridEnv.DEFAULT_CONFIG)
    DEFAULT_CONFIG.update(
        {
            "room_size": 6,
            "num_rows": 1,
            "num_cols": 2,
            "hidden_key": True,
            "blocked": True,
            "num_dists": 0,
        }
    )

    def generate(self, key):
        ks = jax.random.split(key, 8)
        grid = self._grid_with_walls()
        slots = self._door_slots()
        # All non-target doors: ordinary closed doors.
        if len(slots) > 1:
            grid, _ = self._add_all_doors(ks[0], grid)
        # The target room is the last room; lock its first wall slot.
        lock_slot = slots[0]
        dx, dy = self._slot_xy(ks[1], lock_slot)
        lock_c = jax.random.randint(ks[2], (), 0, 6).astype(jnp.int8)
        grid = grid.at[dy, dx].set(
            jnp.stack([jnp.int8(mg.DOOR), lock_c, jnp.int8(mg.LOCKED)])
        )
        if bool(self.config["blocked"]):
            grid = grid.at[dy, dx - 1].set(
                jnp.asarray([mg.BALL, mg.GREY, 0], jnp.int8)
            )
        if bool(self.config["hidden_key"]):
            grid, _, _ = self._place_in_room(
                ks[3], grid, 0, 0, mg.BOX,
                jax.random.randint(ks[3], (), 0, 6).astype(jnp.int8),
                mg.box_contents(mg.KEY, lock_c),
            )
        else:
            grid, _, _ = self._place_in_room(
                ks[3], grid, 0, 0, mg.KEY, lock_c
            )
        grid, _, _ = self._place_in_room(
            ks[4], grid, self._rows - 1, self._cols - 1, mg.BALL, mg.BLUE
        )
        amask = self._room_mask(0, 0)
        ax, ay = mg.place_random(ks[5], grid, ~amask)
        d = jax.random.randint(ks[6], (), 0, 4, jnp.int32)
        return grid, jnp.stack([ax, ay]), d, self.mission(
            PICKUP, mg.BALL, mg.BLUE
        )


class MultiRoomEnv(RoomGridEnv):
    """MiniGrid MultiRoom-N{n}: a chain of rooms ending at a goal.

    Deviation: rooms are a fixed-size snake chain on a room grid (the
    original samples variable-size rectangles); door colors/positions and
    the agent start remain random.
    """

    def generate(self, key):
        rows, cols = self._rows, self._cols
        ks = jax.random.split(key, 4 + rows * cols)
        grid = self._grid_with_walls()
        # Snake path: left-to-right on even rows, right-to-left on odd.
        path = []
        for r in range(rows):
            cs = range(cols) if r % 2 == 0 else range(cols - 1, -1, -1)
            path.extend((r, c) for c in cs)
        for i in range(len(path) - 1):
            (r0, c0), (r1, c1) = path[i], path[i + 1]
            if r0 == r1:
                slot = (r0, min(c0, c1), True)
            else:
                slot = (min(r0, r1), c0, False)
            x, y = self._slot_xy(ks[4 + i], slot)
            c = jax.random.randint(
                jax.random.fold_in(ks[0], i), (), 0, 6
            ).astype(jnp.int8)
            grid = grid.at[y, x].set(
                jnp.stack([jnp.int8(mg.DOOR), c, jnp.int8(mg.CLOSED)])
            )
        # Goal in the last room, agent in the first.
        gr, gc = path[-1]
        grid, _, _ = self._place_in_room(ks[1], grid, gr, gc, mg.GOAL,
                                         mg.GREEN)
        amask = self._room_mask(path[0][0], path[0][1])
        ax, ay = mg.place_random(ks[2], grid, ~amask)
        d = jax.random.randint(ks[3], (), 0, 4, jnp.int32)
        return grid, jnp.stack([ax, ay]), d, self.mission(REACH_GOAL, -1, -1)


class LockedRoomEnv(RoomGridEnv):
    """MiniGrid LockedRoom: six rooms off a corridor; the goal sits in a
    locked room, the matching key in another room."""

    DEFAULT_CONFIG = dict(RoomGridEnv.DEFAULT_CONFIG)
    DEFAULT_CONFIG.update({"num_rows": 3, "num_cols": 3, "room_size": 7})

    def generate(self, key):
        rows = self._rows
        ks = jax.random.split(key, 10)
        grid = self._grid_with_walls()
        rs = self._rs
        # Middle column is the corridor: knock out internal horizontal
        # walls inside column 1.
        w, h = self._wh
        Y, X = _iota2(h, w)
        corridor = (X > rs - 1) & (X < 2 * (rs - 1))
        horiz_wall = (Y % (rs - 1) == 0) & (Y > 0) & (Y < h - 1)
        clear = corridor & horiz_wall
        grid = jnp.where(
            clear[..., None],
            jnp.asarray([mg.EMPTY, 0, 0], jnp.int8),
            grid,
        )
        # A door from the corridor into each side room.
        door_info = []
        for r in range(rows):
            for side_c, wall_c in ((0, 0), (2, 1)):
                x = jnp.int32((wall_c + 1) * (rs - 1))
                y = r * (rs - 1) + 1 + jax.random.randint(
                    jax.random.fold_in(ks[0], r * 4 + side_c), (), 0, rs - 2
                )
                c = jax.random.randint(
                    jax.random.fold_in(ks[1], r * 4 + side_c), (), 0, 6
                ).astype(jnp.int8)
                grid = grid.at[y, x].set(
                    jnp.stack([jnp.int8(mg.DOOR), c, jnp.int8(mg.CLOSED)])
                )
                door_info.append((x, y, c, r, side_c))
        # Lock a random door, goal behind it, key in a random other room.
        idx = jax.random.randint(ks[2], (), 0, len(door_info))
        xs = jnp.stack([d[0] for d in door_info])
        ys = jnp.stack([d[1] for d in door_info])
        cs = jnp.stack([d[2] for d in door_info])
        rr = jnp.stack([jnp.int32(d[3]) for d in door_info])
        cc = jnp.stack([jnp.int32(0 if d[4] == 0 else 2) for d in door_info])
        grid = grid.at[ys[idx], xs[idx], 2].set(jnp.int8(mg.LOCKED))
        goal_mask = self._room_mask(rr[idx], cc[idx])
        gx, gy = mg.place_random(ks[3], grid, ~goal_mask)
        grid = grid.at[gy, gx].set(
            jnp.asarray([mg.GOAL, mg.GREEN, 0], jnp.int8)
        )
        # Key in a different room (index shifted by 1..5).
        kidx = jnp.mod(
            idx + 1 + jax.random.randint(ks[4], (), 0, len(door_info) - 1),
            len(door_info),
        )
        key_mask = self._room_mask(rr[kidx], cc[kidx])
        kx, ky = mg.place_random(ks[5], grid, ~key_mask)
        grid = grid.at[ky, kx].set(
            jnp.stack([jnp.int8(mg.KEY), cs[idx], jnp.int8(0)])
        )
        # Agent in the corridor.
        amask = corridor & (grid[:, :, 0] == mg.EMPTY)
        ax, ay = mg.place_random(ks[6], grid, ~amask)
        d = jax.random.randint(ks[7], (), 0, 4, jnp.int32)
        return grid, jnp.stack([ax, ay]), d, self.mission(REACH_GOAL, -1, -1)


class PlaygroundEnv(RoomGridEnv):
    """MiniGrid Playground: 3x3 rooms of random objects, no mission."""

    def generate(self, key):
        ks = jax.random.split(key, 4)
        grid = self._grid_with_walls()
        grid, _ = self._add_all_doors(ks[0], grid)
        grid, _, _ = self._add_distractors(
            ks[1], grid, int(self.config["num_dists"])
        )
        ax, ay = mg.place_random(ks[2], grid)
        d = jax.random.randint(ks[3], (), 0, 4, jnp.int32)
        return grid, jnp.stack([ax, ay]), d, self.mission(NONE, -1, -1)


class SynthEnv(RoomGridEnv):
    """BabyAI Synth / SynthLoc / SynthSeq / MiniBossLevel / BossLevel.

    Instruction kind sampled uniformly from {goto, open, pickup, putnext};
    Seq/Boss variants chain a second instruction.  BossLevel's unlock
    requirement is approximated with ordinary closed doors
    (BossLevelNoUnlock semantics) — see the module docstring.
    """

    DEFAULT_CONFIG = dict(RoomGridEnv.DEFAULT_CONFIG)
    DEFAULT_CONFIG.update({"seq": False})

    def generate(self, key):
        ks = jax.random.split(key, 8)
        grid = self._grid_with_walls()
        grid, placed = self._add_all_doors(ks[0], grid)
        n = max(int(self.config["num_dists"]), 2)
        grid, types, colors = self._add_distractors(ks[1], grid, n)
        door_colors = jnp.stack([c for _, _, c, _ in placed])

        def draw_instr(k):
            k1, k2, k3 = jax.random.split(k, 3)
            kind = jax.random.randint(k1, (), 0, 4)
            ia = jax.random.randint(k2, (), 0, n)
            ib = jnp.mod(ia + 1 + jax.random.randint(k3, (), 0, n - 1), n)
            di = RoomGridEnv._pick_door(k2, placed)
            t = jnp.where(
                kind == OPEN, mg.DOOR, types[ia].astype(jnp.int32)
            )
            c = jnp.where(
                kind == OPEN,
                door_colors[di].astype(jnp.int32),
                colors[ia].astype(jnp.int32),
            )
            t2 = jnp.where(kind == PUTNEXT, types[ib].astype(jnp.int32), -1)
            c2 = jnp.where(kind == PUTNEXT, colors[ib].astype(jnp.int32), -1)
            return kind, t, c, t2, c2

        k1, t1, c1, t12, c12 = draw_instr(ks[2])
        if bool(self.config["seq"]):
            # Second instruction: goto/open/pickup only (putnext pairs
            # don't fit the packed mission layout).
            k2_, t2_, c2_, _, _ = draw_instr(ks[3])
            k2_ = jnp.where(k2_ == PUTNEXT, GOTO, k2_)
            # First instruction also avoids putnext in seq mode.
            k1 = jnp.where(k1 == PUTNEXT, PICKUP, k1)
            mission = self.mission(k1, t1, c1, k2_, t2_, c2_)
        else:
            mission = self.mission(k1, t1, c1, -1, t12, c12)
        ax, ay = mg.place_random(ks[4], grid)
        d = jax.random.randint(ks[5], (), 0, 4, jnp.int32)
        return grid, jnp.stack([ax, ay]), d, mission
