"""Doom-like scenario env: reference-parity surface over a TPU world.

Surface parity with ``envpool/vizdoom/vizdoom_env.h``:

* obs ``[stack_num * channels, img_height, img_width] uint8``
  (``:104-107``), frame stacking with reset fill (``:483-492``).
* action: ``use_combined_action=False`` → float button vector
  (``:131-135``); ``True`` → one discrete id over the combined action
  set built from the scenario's button list (``utils.h:33-127``,
  re-implemented in :mod:`.buttons`).
* info: the 16 game-variable keys AMMO2..AMMO7, ARMOR, DAMAGECOUNT,
  DEATHCOUNT, FRAGCOUNT, HEALTH, HITCOUNT, KILLCOUNT,
  SELECTED_WEAPON, SELECTED_WEAPON_AMMO, USER2 (``:108-124``).
* reward: EXACTLY the reference's shaped variable-delta machinery
  (``:396-446``): per-variable (delta≥0 → delta·pos, else −delta·neg)
  with the default weight table (``:70-90``), DAMAGECOUNT delta capped
  at 200 and HITCOUNT at 5, plus the selected-weapon duration bonus
  (``:438-446``, weights ``:91-99``).

The world behind that surface is a grid-arena surrogate (documented —
the Doom engine is native-only): DDA-raycast rendering, hitscan /
projectile combat, chasing monsters, pickups, acid floors, fireball
volleys — one fused XLA program per step, ``vmap``-able over the pool.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec
from ...ops.image import resize_area
from . import buttons as B
from .buttons import build_action_set
from .raycast import (
    H, W, SPR_AMMO, SPR_ARMOR, SPR_FIREBALL, SPR_MEDKIT, SPR_MONSTER,
    SPR_POISON, SPR_VEST, render_frame,
)
from .scenarios import SCENARIOS, Scenario

# Game-variable vector layout (reference info_index_, vizdoom_env.h:155).
GV_NAMES = (
    "AMMO2", "AMMO3", "AMMO4", "AMMO5", "AMMO6", "AMMO7",
    "ARMOR", "DAMAGECOUNT", "DEATHCOUNT", "FRAGCOUNT", "HEALTH",
    "HITCOUNT", "KILLCOUNT", "SELECTED_WEAPON", "SELECTED_WEAPON_AMMO",
    "USER2",
)
# Default reward_config weights (vizdoom_env.h:70-90), mapped onto the
# vector above.  SELECTED_WEAPON[_AMMO]/USER2 carry no weight.
_POS = np.asarray(
    [0.0002, 0.001, 0.001, 0.001, 0.002, 0.002,
     0.005, 0.003, -0.75, 1.0, 0.005, 0.01, 1.0, 0.0, 0.0, 0.0],
    np.float32,
)
_NEG = np.asarray(
    [-0.0001, -0.0005, -0.0005, -0.0005, -0.001, -0.001,
     -0.001, -0.003, 0.75, -1.5, -0.003, -0.01, 0.0, 0.0, 0.0, 0.0],
    np.float32,
)
# selected_weapon_reward_config (vizdoom_env.h:91-99), slots 0..7.
_WEAPON_REWARD = np.asarray(
    [0.0002, 0.0002, 0.0002, 0.001, 0.001, 0.001, 0.002, 0.002, 0.0, 0.0],
    np.float32,
)

_TURN = 0.20       # rad per 4-tic step
_MOVE = 0.55       # cells per 4-tic step
_RADIUS = 0.3      # player collision radius
_NR = 2            # player projectile slots
_NF = 4            # incoming fireball slots

_W2SLOT = {
    B.SELECT_WEAPON1: 1, B.SELECT_WEAPON2: 2, B.SELECT_WEAPON3: 3,
    B.SELECT_WEAPON4: 4, B.SELECT_WEAPON5: 5, B.SELECT_WEAPON6: 6,
    B.SELECT_WEAPON7: 7,
}


def shaped_reward(gvs, last_gvs, sel_count, weapon_duration):
    """The reference's delta reward (vizdoom_env.h:408-446)."""
    delta = gvs - last_gvs
    delta = delta.at[7].set(jnp.minimum(delta[7], 200.0))   # DAMAGECOUNT cap
    delta = delta.at[11].set(jnp.minimum(delta[11], 5.0))   # HITCOUNT cap
    r = jnp.sum(
        jnp.where(delta >= 0, delta * jnp.asarray(_POS),
                  -delta * jnp.asarray(_NEG))
    )
    sel_w = gvs[13].astype(jnp.int32)
    bonus = jnp.asarray(_WEAPON_REWARD)[jnp.clip(sel_w, 0, 9)]
    give = (sel_w >= 0) & (sel_count >= weapon_duration) & (gvs[14] > 0)
    return r + jnp.where(give, bonus, 0.0)


class DoomEnv(TpuEnv):
    DEFAULT_CONFIG = {
        "scenario": "basic",
        "img_height": 84,
        "img_width": 84,
        "stack_num": 4,
        "frame_skip": 4,
        "episodic_life": False,
        "force_speed": False,
        "use_combined_action": False,
        "use_inter_area_resize": True,
        "weapon_duration": 5,
        # wad_path: when set, the arena layout is parsed from the real
        # scenario WAD's LINEDEFS (envs/vizdoom/wad.py) instead of the
        # hand-authored grid — matching the reference's cfg/wad loading
        # (vizdoom_env.h:60-110).  The remaining engine-path keys are
        # accepted for reference-config compatibility; no engine binary
        # exists in this image:
        "cfg_path": "",
        "wad_path": "",
        "vzd_path": "",
        "iwad_path": "",
        "game_args": "",
        "map_id": "map01",
        "lmp_save_dir": "",
    }

    def __init__(self, config):
        super().__init__(config)
        self.sc: Scenario = SCENARIOS[str(config["scenario"])]
        wad = str(config["wad_path"])
        if wad:
            from .wad import wad_to_grid

            grid = wad_to_grid(
                wad,
                g=self.sc.grid.shape[0],
                map_name=str(config["map_id"]).upper() or None,
            )
            self.sc = dataclasses.replace(self.sc, grid=grid)
        self.walls = jnp.asarray(self.sc.grid)
        from .raycast import extract_cells

        self.wall_cells = extract_cells(self.sc.grid)
        self.g_size = self.sc.grid.shape[0]
        self.buttons = list(self.sc.buttons)
        self.action_set = jnp.asarray(
            build_action_set(self.buttons, bool(config["force_speed"])),
            jnp.float32,
        )
        self.combined = bool(config["use_combined_action"])
        self.nm = max(self.sc.n_monsters, 1)
        self.ni = max(self.sc.n_items, 1)
        kinds = self.sc.item_kinds or ("medkit",)
        self.item_type = jnp.asarray(
            [
                {"medkit": SPR_MEDKIT, "armor": SPR_ARMOR,
                 "ammo": SPR_AMMO, "poison": SPR_POISON}[
                    kinds[i % len(kinds)]
                ]
                for i in range(self.ni)
            ],
            jnp.int32,
        )
        # Free-cell table for random spawns (static).
        free = np.argwhere(self.sc.grid == 0)
        self.free_cells = jnp.asarray(
            free[:, ::-1].astype(np.float32) + 0.5  # (x, y) cell centers
        )

    # -- specs ----------------------------------------------------------

    @property
    def _hw(self):
        return int(self.config["img_height"]), int(self.config["img_width"])

    @property
    def _stack(self):
        return int(self.config["stack_num"])

    def state_spec(self):
        h, w = self._hw
        spec = {
            "obs": ArraySpec(
                jnp.uint8, (self._stack * self.sc.channels, h, w), 0, 255
            ),
        }
        for name in GV_NAMES:
            spec[f"info:{name}"] = ArraySpec(jnp.float32, ())
        return spec

    def action_spec(self):
        if self.combined:
            n = self.action_set.shape[0]
            return {
                "action": ArraySpec(jnp.int32, (), 0, n - 1, is_discrete=True)
            }
        nb = len(self.buttons)
        return {"action": ArraySpec(jnp.float32, (nb,), 0.0, 1.0)}

    # -- helpers --------------------------------------------------------

    def _press(self, b, bid):
        """Pressed amount of button ``bid`` from button vector ``b``."""
        if bid in self.buttons:
            return b[self.buttons.index(bid)]
        return jnp.float32(0.0)

    def _cell_free(self, x, y):
        ix = jnp.clip(x.astype(jnp.int32), 0, self.g_size - 1)
        iy = jnp.clip(y.astype(jnp.int32), 0, self.g_size - 1)
        if getattr(ix, "ndim", 0) == 0:
            return self.walls[iy, ix] == 0      # scalar: cheap slice
        from .raycast import grid_lookup

        return grid_lookup(self.walls, iy, ix) == 0

    def _pos_free(self, x, y, r=_RADIUS):
        ok = jnp.bool_(True)
        for sx in (-r, r):
            for sy in (-r, r):
                ok = ok & self._cell_free(x + sx, y + sy)
        return ok

    def _los(self, x0, y0, x1, y1):
        """Coarse line-of-sight: 16 samples along the segment."""
        t = (jnp.arange(1, 16, dtype=jnp.float32) / 16.0)
        xs = x0 + (x1 - x0) * t
        ys = y0 + (y1 - y0) * t
        return jnp.all(self._cell_free(xs, ys))

    def _rand_cell(self, key):
        i = jax.random.randint(key, (), 0, self.free_cells.shape[0])
        return self.free_cells[i]

    def _monster_spawn(self, key, n):
        """Spawn band per scenario (east wall / north wall / ring)."""
        sc = self.sc
        g = float(self.g_size)
        keys = jax.random.split(key, n)
        u = jax.random.uniform(key, (n,))
        if sc.monster_wall == "east":
            free = np.argwhere(sc.grid == 0)
            x = jnp.full((n,), float(free[:, 1].max()) + 0.5 - 0.6)
            ylo = float(free[:, 0].min()) + 0.5
            yhi = float(free[:, 0].max()) + 0.5
            y = ylo + u * (yhi - ylo)
        elif sc.monster_wall == "north":
            free = np.argwhere(sc.grid == 0)
            y = jnp.full((n,), float(free[:, 0].min()) + 0.5 + 0.3)
            xlo = float(free[:, 1].min()) + 0.5
            xhi = float(free[:, 1].max()) + 0.5
            x = xlo + u * (xhi - xlo)
        elif sc.monster_wall == "corridor":
            # pairs along the corridor (deadly_corridor)
            x = 6.0 + 2.6 * jnp.arange(n, dtype=jnp.float32)
            y = jnp.where(jnp.arange(n) % 2 == 0, 10.6, 12.4)
        else:  # "ring" or default: random free cells
            pts = jax.vmap(self._rand_cell)(keys)
            x, y = pts[:, 0], pts[:, 1]
        return jnp.stack([x, y], -1)

    # -- world init -----------------------------------------------------

    def _init_world(self, key):
        sc = self.sc
        k1, k2, k3, k4 = jax.random.split(key, 4)
        if sc.random_spawn:
            p0 = self._rand_cell(k1)
            ang = jax.random.uniform(k1, (), minval=0.0, maxval=2 * np.pi)
            px, py = p0[0], p0[1]
        else:
            px = jnp.float32(sc.spawn[0])
            py = jnp.float32(sc.spawn[1])
            ang = jnp.float32(sc.spawn_ang)
        mxy = self._monster_spawn(k2, self.nm)
        mhp = jnp.full((self.nm,), sc.monster_hp if sc.n_monsters else 0.0)
        if sc.n_monsters == 0:
            mhp = jnp.zeros((self.nm,))
        ikeys = jax.random.split(k3, self.ni)
        ixy = jax.vmap(self._rand_cell)(ikeys)
        ipresent = jnp.full((self.ni,), sc.n_items > 0)
        ammo = jnp.zeros((8,)).at[sc.weapon].set(sc.ammo0)
        return {
            "px": px, "py": py, "ang": ang,
            "hp": jnp.float32(100.0), "armor": jnp.float32(0.0),
            "ammo": ammo, "sel_w": jnp.int32(sc.weapon),
            "kills": jnp.float32(0.0), "hits": jnp.float32(0.0),
            "dmg": jnp.float32(0.0), "frags": jnp.float32(0.0),
            "deaths": jnp.float32(0.0),
            "mxy": mxy, "mhp": mhp,
            "mcool": jnp.zeros((self.nm,)),
            "mlat": jnp.ones((self.nm,)),
            "ixy": ixy, "ipresent": ipresent,
            "icool": jnp.zeros((self.ni,)),
            "rock": jnp.zeros((_NR, 4)),
            "r_alive": jnp.zeros((_NR,), bool),
            "fb": jnp.zeros((_NF, 4)),
            "fb_alive": jnp.zeros((_NF,), bool),
            "fcool": jnp.float32(4.0),
            "flash": jnp.float32(0.0), "hurt": jnp.float32(0.0),
            "goal": jnp.float32(0.0),
        }

    def _gvs(self, g):
        sel = jnp.clip(g["sel_w"], 0, 7)
        return jnp.stack([
            g["ammo"][2], g["ammo"][3], g["ammo"][4], g["ammo"][5],
            g["ammo"][6], g["ammo"][7], g["armor"], g["dmg"], g["deaths"],
            g["frags"], g["hp"], g["hits"], g["kills"],
            g["sel_w"].astype(jnp.float32), g["ammo"][sel], g["goal"],
        ])

    # -- rendering ------------------------------------------------------

    def _frame(self, g):
        sc = self.sc
        spr_xy = jnp.concatenate([
            g["mxy"], g["ixy"], g["rock"][:, :2], g["fb"][:, :2],
            jnp.asarray([sc.goal or (0.0, 0.0)], jnp.float32),
        ])
        spr_type = jnp.concatenate([
            jnp.full((self.nm,), SPR_MONSTER, jnp.int32),
            self.item_type,
            jnp.full((_NR + _NF,), SPR_FIREBALL, jnp.int32),
            jnp.asarray([SPR_VEST], jnp.int32),
        ])
        spr_alive = jnp.concatenate([
            g["mhp"] > 0, g["ipresent"], g["r_alive"], g["fb_alive"],
            jnp.asarray([bool(sc.goal)]),
        ])
        frame = render_frame(
            self.walls, g["px"], g["py"], g["ang"],
            spr_xy, spr_type, spr_alive,
            flash=g["flash"], hurt=g["hurt"],
            weapon_up=jnp.float32(1.0 if sc.ammo0 > 0 else 0.0),
            wall_cells=self.wall_cells,
        )  # [H, W, 3] float
        if sc.channels == 1:
            lum = (
                0.299 * frame[..., 0] + 0.587 * frame[..., 1]
                + 0.114 * frame[..., 2]
            )
            chw = lum[None]
        else:
            chw = jnp.transpose(frame, (2, 0, 1))
        h, w = self._hw
        if (h, w) != (H, W):
            chw = jnp.stack(
                [resize_area(c, (h, w), jnp.float32) for c in chw]
            )
        return jnp.clip(jnp.round(chw), 0, 255).astype(jnp.uint8)

    def _push(self, stack, frame, fill):
        pushed = jnp.concatenate([stack[1:], frame[None]], 0)
        filled = jnp.broadcast_to(frame[None], stack.shape)
        return jnp.where(fill, filled, pushed).astype(jnp.uint8)

    def _obs(self, stack, g):
        h, w = self._hw
        out = {"obs": stack.reshape(self._stack * self.sc.channels, h, w)}
        gvs = self._gvs(g)
        for i, name in enumerate(GV_NAMES):
            out[f"info:{name}"] = gvs[i]
        return out

    # -- env API --------------------------------------------------------

    def reset_env(self, key):
        g = self._init_world(key)
        frame = self._frame(g)
        h, w = self._hw
        stack = jnp.zeros((self._stack, self.sc.channels, h, w), jnp.uint8)
        stack = self._push(stack, frame, jnp.bool_(True))
        state = {
            "g": g, "stack": stack, "gvs": self._gvs(g),
            "sel_count": jnp.int32(1),
        }
        return state, self._obs(stack, g)

    def step_env(self, state, action, key):
        sc = self.sc
        g = dict(state["g"])
        ks = jax.random.split(key, 6)
        skip = float(self.config["frame_skip"]) / 4.0

        # --- decode action → button vector ---
        if self.combined:
            a = jnp.clip(
                jnp.reshape(action, ()).astype(jnp.int32),
                0, self.action_set.shape[0] - 1,
            )
            b = self.action_set[a]
        else:
            b = jnp.reshape(
                jnp.asarray(action, jnp.float32), (len(self.buttons),)
            )
        atk = self._press(b, B.ATTACK) > 0.5
        spd = jnp.where(self._press(b, B.SPEED) > 0.5, 1.4, 1.0)
        if bool(self.config["force_speed"]) and B.SPEED in self.buttons:
            spd = jnp.float32(1.4)
        turn = (
            self._press(b, B.TURN_RIGHT) - self._press(b, B.TURN_LEFT)
        ) * _TURN * skip
        fwd = (
            self._press(b, B.MOVE_FORWARD) - self._press(b, B.MOVE_BACKWARD)
        ) * _MOVE * skip * spd
        strafe = (
            self._press(b, B.MOVE_RIGHT) - self._press(b, B.MOVE_LEFT)
        ) * _MOVE * skip * spd

        ang = g["ang"] + turn
        ca, sa = jnp.cos(ang), jnp.sin(ang)
        dx = fwd * ca + strafe * -sa
        dy = fwd * sa + strafe * ca
        nx = g["px"] + dx
        ny = g["py"] + dy
        px = jnp.where(self._pos_free(nx, g["py"]), nx, g["px"])
        py = jnp.where(self._pos_free(px, ny), ny, g["py"])
        g["px"], g["py"], g["ang"] = px, py, ang

        # --- weapon select ---
        sel_w = g["sel_w"]
        for bid, slot in _W2SLOT.items():
            if bid in self.buttons:
                sel_w = jnp.where(
                    self._press(b, bid) > 0.5, jnp.int32(slot), sel_w
                )
        g["sel_w"] = sel_w

        # --- attack ---
        sel = jnp.clip(sel_w, 0, 7)
        can_fire = atk & (g["ammo"][sel] > 0)
        g["ammo"] = g["ammo"].at[sel].add(
            jnp.where(can_fire, -1.0, 0.0)
        )
        alive = g["mhp"] > 0
        mdx = g["mxy"][:, 0] - px
        mdy = g["mxy"][:, 1] - py
        mdist = jnp.sqrt(mdx**2 + mdy**2) + 1e-6
        angoff = jnp.abs(
            jnp.mod(jnp.arctan2(mdy, mdx) - ang + np.pi, 2 * np.pi) - np.pi
        )
        los = jax.vmap(
            lambda x1, y1: self._los(px, py, x1, y1)
        )(g["mxy"][:, 0], g["mxy"][:, 1])
        in_aim = (
            alive & los & (mdist < 24.0)
            & (angoff < jnp.arctan2(0.45, mdist) + 0.04)
        )
        if not sc.projectile:
            target = jnp.argmin(jnp.where(in_aim, mdist, 1e9))
            hit = can_fire & jnp.any(in_aim)
            dmg_vec = jnp.where(
                (jnp.arange(self.nm) == target) & hit, sc.attack_dmg, 0.0
            )
            g["mhp"] = jnp.maximum(g["mhp"] - dmg_vec, 0.0)
            g["hits"] = g["hits"] + jnp.where(hit, 1.0, 0.0)
            g["dmg"] = g["dmg"] + jnp.where(hit, sc.attack_dmg, 0.0)
        else:
            # spawn a rocket into a free slot
            slot = jnp.argmin(g["r_alive"].astype(jnp.int32))
            free_slot = ~g["r_alive"][slot]
            fire = can_fire & free_slot
            rvel = jnp.asarray([ca, sa]) * 0.9
            new_rock = jnp.concatenate(
                [jnp.stack([px, py]), rvel]
            )
            g["rock"] = jnp.where(
                (jnp.arange(_NR) == slot)[:, None] & fire,
                new_rock[None], g["rock"],
            )
            g["r_alive"] = g["r_alive"] | (
                (jnp.arange(_NR) == slot) & fire
            )

        # --- advance rockets (player projectiles) ---
        if sc.projectile:
            pos = g["rock"][:, :2] + g["rock"][:, 2:]
            wall_hit = ~jax.vmap(self._cell_free)(pos[:, 0], pos[:, 1])
            # splash vs monsters
            rd = jnp.sqrt(
                jnp.sum(
                    (pos[:, None, :] - g["mxy"][None, :, :]) ** 2, -1
                )
            )  # [NR, NM]
            boom = (rd < 0.8) & g["r_alive"][:, None] & alive[None, :]
            rock_dmg = jnp.sum(boom, 0) * sc.attack_dmg
            n_hit = jnp.sum(jnp.any(boom, 1))
            g["mhp"] = jnp.maximum(g["mhp"] - rock_dmg, 0.0)
            g["hits"] = g["hits"] + n_hit
            g["dmg"] = g["dmg"] + n_hit * sc.attack_dmg
            g["r_alive"] = g["r_alive"] & ~wall_hit & ~jnp.any(boom, 1)
            g["rock"] = g["rock"].at[:, :2].set(pos)

        # --- kill accounting (any monster that just died) ---
        died = (state["g"]["mhp"] > 0) & (g["mhp"] <= 0)
        n_died = jnp.sum(died.astype(jnp.float32))
        if sc.frags:
            g["frags"] = g["frags"] + n_died
        g["kills"] = g["kills"] + n_died

        # --- monster AI ---
        alive = g["mhp"] > 0
        if sc.monster_lateral > 0:
            lx = g["mxy"][:, 0]
            free = np.argwhere(sc.grid == 0)
            ylo = float(free[:, 0].min()) + 1.0
            yhi = float(free[:, 0].max())
            my = g["mxy"][:, 1] + g["mlat"] * sc.monster_lateral
            bounce = (my < ylo) | (my > yhi)
            g["mlat"] = jnp.where(bounce, -g["mlat"], g["mlat"])
            my = jnp.clip(my, ylo, yhi)
            g["mxy"] = jnp.stack([lx, my], -1)
        if sc.monster_speed > 0:
            ux = -mdx / mdist
            uy = -mdy / mdist
            step_m = sc.monster_speed * skip
            nmx = g["mxy"][:, 0] - ux * step_m
            nmy = g["mxy"][:, 1] - uy * step_m
            okm = jax.vmap(self._cell_free)(nmx, nmy)
            move = alive & okm & (mdist > 1.0)
            g["mxy"] = jnp.where(
                move[:, None], jnp.stack([nmx, nmy], -1), g["mxy"]
            )

        damage_in = jnp.float32(0.0)
        cool = jnp.maximum(g["mcool"] - 1.0, 0.0)
        if sc.monster_melee > 0:
            biting = alive & (mdist < 1.4) & (cool <= 0)
            damage_in = damage_in + jnp.sum(biting) * sc.monster_melee
            cool = jnp.where(biting, 3.0, cool)
        if sc.monster_ranged > 0:
            shooting = alive & (mdist < 14.0) & los & (cool <= 0)
            damage_in = damage_in + jnp.sum(shooting) * sc.monster_ranged
            cool = jnp.where(shooting, 2.0, cool)
        g["mcool"] = cool

        # --- respawn dead monsters ---
        if sc.monster_respawn:
            timer = jnp.where(died, 12.0, g["mcool"])
            respawn = (~alive) & (timer <= 0)
            spawn_xy = self._monster_spawn(ks[1], self.nm)
            g["mxy"] = jnp.where(respawn[:, None], spawn_xy, g["mxy"])
            g["mhp"] = jnp.where(respawn, sc.monster_hp, g["mhp"])
            g["mcool"] = jnp.where(
                ~alive, jnp.maximum(timer - 1.0, 0.0), g["mcool"]
            )

        # --- incoming fireballs (take_cover) ---
        if sc.fireballs > 0:
            fpos = g["fb"][:, :2] + g["fb"][:, 2:]
            wall_hit = ~jax.vmap(self._cell_free)(fpos[:, 0], fpos[:, 1])
            fd = jnp.sqrt((fpos[:, 0] - px) ** 2 + (fpos[:, 1] - py) ** 2)
            hit_p = (fd < 0.8) & g["fb_alive"]
            damage_in = damage_in + jnp.sum(hit_p) * sc.fireball_dmg
            fb_alive = g["fb_alive"] & ~wall_hit & ~hit_p
            fcool = g["fcool"] - 1.0
            # launch: aim at the player's current x from the north wall
            slot = jnp.argmin(fb_alive.astype(jnp.int32))
            can = (fcool <= 0) & ~fb_alive[slot]
            free = np.argwhere(sc.grid == 0)
            oy = float(free[:, 0].min()) + 0.6
            ox = px + jax.random.uniform(ks[2], (), minval=-1.5, maxval=1.5)
            vd = jnp.stack([px - ox, py - oy])
            vd = vd / (jnp.linalg.norm(vd) + 1e-6) * 0.7
            newf = jnp.concatenate([jnp.stack([ox, oy]), vd])
            g["fb"] = jnp.where(
                (jnp.arange(_NF) == slot)[:, None] & can, newf[None],
                g["fb"].at[:, :2].set(fpos),
            )
            g["fb_alive"] = fb_alive | ((jnp.arange(_NF) == slot) & can)
            g["fcool"] = jnp.where(can, 6.0, jnp.maximum(fcool, 0.0))

        # --- items ---
        if sc.n_items > 0:
            idist = jnp.sqrt(
                (g["ixy"][:, 0] - px) ** 2 + (g["ixy"][:, 1] - py) ** 2
            )
            grab = g["ipresent"] & (idist < 0.8)
            it = self.item_type
            heal = jnp.sum(grab & (it == SPR_MEDKIT)) * 25.0
            g["hp"] = jnp.minimum(g["hp"] + heal, 100.0)
            damage_in = damage_in + jnp.sum(grab & (it == SPR_POISON)) * 30.0
            g["armor"] = jnp.minimum(
                g["armor"] + jnp.sum(grab & (it == SPR_ARMOR)) * 50.0, 200.0
            )
            g["ammo"] = g["ammo"].at[sel].add(
                jnp.sum(grab & (it == SPR_AMMO)) * 10.0
            )
            icool = jnp.where(grab, 20.0, jnp.maximum(g["icool"] - 1.0, 0.0))
            present = g["ipresent"] & ~grab
            if sc.item_respawn:
                back = (~present) & (icool <= 0)
                ikeys = jax.random.split(ks[3], self.ni)
                new_xy = jax.vmap(self._rand_cell)(ikeys)
                g["ixy"] = jnp.where(back[:, None], new_xy, g["ixy"])
                present = present | back
            g["ipresent"] = present
            g["icool"] = icool

        # --- health drain, armor absorption, death ---
        absorbed = jnp.minimum(g["armor"], damage_in / 3.0)
        g["armor"] = g["armor"] - absorbed
        hp = g["hp"] - (damage_in - absorbed) - sc.health_drain * skip
        g["hp"] = jnp.maximum(hp, 0.0)
        just_died = (state["g"]["hp"] > 0) & (g["hp"] <= 0)
        g["deaths"] = g["deaths"] + jnp.where(just_died, 1.0, 0.0)

        # --- goal ---
        if sc.goal:
            gd = jnp.sqrt(
                (px - sc.goal[0]) ** 2 + (py - sc.goal[1]) ** 2
            )
            g["goal"] = jnp.where(gd < 1.0, 1.0, g["goal"])

        g["flash"] = jnp.where(can_fire, 1.0, g["flash"] * 0.5)
        g["hurt"] = jnp.clip(damage_in / 30.0, 0.0, 1.0)

        # --- termination ---
        done = g["hp"] <= 0
        if sc.goal:
            done = done | (g["goal"] > 0)
        if sc.kill_all_ends:
            done = done | jnp.all(g["mhp"] <= 0)

        # --- reward (reference delta machinery) ---
        gvs = self._gvs(g)
        last_gvs = state["gvs"]
        same_w = g["sel_w"] == state["g"]["sel_w"]
        sel_count = jnp.where(same_w, state["sel_count"] + 1, 1)
        reward = shaped_reward(
            gvs, last_gvs, sel_count, int(self.config["weapon_duration"])
        )

        frame = self._frame(g)
        stack = self._push(state["stack"], frame, jnp.bool_(False))
        new_state = {
            "g": g, "stack": stack, "gvs": gvs, "sel_count": sel_count,
        }
        return EnvOut(
            state=new_state,
            obs=self._obs(stack, g),
            reward=jnp.asarray(reward, jnp.float32),
            terminated=jnp.asarray(done, jnp.bool_),
        )
