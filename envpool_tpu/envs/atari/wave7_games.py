"""Arcade wave 7: StarGunner, TimePilot, Jamesbond, WizardOfWor,
Zaxxon, BankHeist.

Behavioral reference: the corresponding ALE games registered by
``envpool/atari/registration.py:21-35``; faithful-behavior cores under
``XxxLite-v5`` ids as in waves 1-6.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .arcade_env import RAW_H, RAW_W, ArcadeEnv, ArcadeGame
from .wave3_games import _freeze_when, _grids


# ---------------------------------------------------------------------------
# StarGunner: horizontal waves sweep in from the right; a bomber seeds
# mines from above.
# ---------------------------------------------------------------------------

_SG_N = 5


class StarGunnerGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "px": jnp.float32(30.0), "py": jnp.float32(105.0),
            "ex": RAW_W + 30.0 * jnp.arange(_SG_N, dtype=jnp.float32),
            "ey": jax.random.uniform(
                k1, (_SG_N,), jnp.float32, 40.0, 170.0
            ),
            "e_alive": jnp.ones((_SG_N,), bool),
            "bomber_x": jnp.float32(0.0),
            "mine_x": jnp.float32(-10.0), "mine_y": jnp.float32(0.0),
            "fire_cool": jnp.int32(0),
            "wave": jnp.int32(1),
            "lives": jnp.int32(5),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return g["lives"] <= 0

    def tick(self, g, action, key):
        over0 = self.over(g)
        fire = (action == 1) | (action >= 10)
        up = (action == 2) | (action == 6) | (action == 7)
        down = (action == 5) | (action == 8) | (action == 9)
        right = (action == 3) | (action == 6) | (action == 8)
        left = (action == 4) | (action == 7) | (action == 9)
        px = jnp.clip(
            g["px"] + 2.5 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            10.0, RAW_W / 2,
        )
        py = jnp.clip(
            g["py"] + 2.5 * (down.astype(jnp.float32)
                             - up.astype(jnp.float32)),
            35.0, 180.0,
        )
        spd = 1.6 + 0.25 * g["wave"].astype(jnp.float32)
        ex = g["ex"] - spd
        # Shot: horizontal beam hits the nearest enemy on the row.
        can_f = fire & (g["fire_cool"] == 0)
        on_row = g["e_alive"] & (jnp.abs(g["ey"] - py) < 7.0) & (ex > px)
        tgt = jnp.argmin(jnp.where(on_row, ex, 1e9))
        hit = can_f & jnp.any(on_row)
        e_alive = g["e_alive"] & ~((jnp.arange(_SG_N) == tgt) & hit)
        reward = jnp.where(hit, 100.0 * g["wave"].astype(jnp.float32), 0.0)
        # Passing enemies / mines hit the gunner.
        crashed = jnp.any(
            e_alive & (jnp.abs(ex - px) < 8.0) & (jnp.abs(g["ey"] - py) < 7.0)
        )
        k1, k2 = jax.random.split(key)
        bomber_x = jnp.mod(g["bomber_x"] + 2.0, jnp.float32(RAW_W))
        drop = (g["mine_y"] <= 0) & (jax.random.uniform(k1, ()) < 0.04)
        mine_x = jnp.where(drop, bomber_x, g["mine_x"])
        mine_y = jnp.where(
            drop, 25.0,
            jnp.where(g["mine_y"] > 0, g["mine_y"] + 2.5, 0.0),
        )
        mined = (mine_y > 0) & (jnp.abs(mine_x - px) < 7.0) & (
            jnp.abs(mine_y - py) < 7.0
        )
        mine_y = jnp.where(mine_y > 195.0, 0.0, mine_y)
        # Recycle dead / passed enemies; wave up when all down.
        gone = ~e_alive | (ex < -10.0)
        clear = jnp.all(gone)
        reward = reward + jnp.where(clear, 300.0, 0.0)
        ex = jnp.where(
            gone, RAW_W + 30.0 * jnp.arange(_SG_N, dtype=jnp.float32), ex
        )
        ey = jnp.where(
            gone,
            jax.random.uniform(k2, (_SG_N,), jnp.float32, 40.0, 170.0),
            g["ey"],
        )
        g2 = {
            "px": px, "py": py, "ex": ex, "ey": ey,
            "e_alive": e_alive | gone,
            "bomber_x": bomber_x,
            "mine_x": mine_x, "mine_y": mine_y,
            "fire_cool": jnp.where(
                can_f, 4, jnp.maximum(g["fire_cool"] - 1, 0)
            ),
            "wave": g["wave"] + clear.astype(jnp.int32),
            "lives": g["lives"] - (crashed | mined).astype(jnp.int32),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 18.0, jnp.float32)
        ground = rows > 190
        frame = jnp.where(ground, 70.0, frame)
        bm = (jnp.abs(rows - 22.0) < 4) & (
            jnp.abs(cols - g["bomber_x"]) < 10
        )
        frame = jnp.where(bm, 120.0, frame)
        mine = (
            (g["mine_y"] > 0)
            & (((cols - g["mine_x"]) ** 2 + (rows - g["mine_y"]) ** 2) < 8.0)
        )
        frame = jnp.where(mine, 230.0, frame)
        for i in range(_SG_N):
            en = (
                g["e_alive"][i]
                & (jnp.abs(rows - g["ey"][i]) < 5)
                & (jnp.abs(cols - g["ex"][i]) < 7)
            )
            frame = jnp.where(en, 190.0, frame)
        pl = (jnp.abs(rows - g["py"]) < 5) & (jnp.abs(cols - g["px"]) < 8)
        return jnp.where(pl, 250.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.9, gray * 0.6, gray])


class StarGunnerEnv(ArcadeEnv):
    GAME_CLS = StarGunnerGame


# ---------------------------------------------------------------------------
# TimePilot: rotate freely in open sky; enemies converge from all sides.
# ---------------------------------------------------------------------------

_TP_N = 5


class TimePilotGame(ArcadeGame):
    action_set_size = 10
    has_fire = True

    def init(self, key):
        k1 = key
        ang = jax.random.uniform(k1, (_TP_N,), jnp.float32, 0, 2 * np.pi)
        return {
            "ang": jnp.float32(0.0),            # own heading
            "ex": 90.0 * jnp.cos(ang), "ey": 90.0 * jnp.sin(ang),
            "e_alive": jnp.ones((_TP_N,), bool),
            "kills": jnp.int32(0),
            "era": jnp.int32(1),                # 1910→… epochs
            "fire_cool": jnp.int32(0),
            "lives": jnp.int32(4),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return g["lives"] <= 0

    def tick(self, g, action, key):
        over0 = self.over(g)
        fire = (action == 1) | (action >= 6)
        right = (action == 3) | (action == 7)
        left = (action == 4) | (action == 8)
        ang = g["ang"] + 0.12 * (
            right.astype(jnp.float32) - left.astype(jnp.float32)
        )
        # The pilot always flies forward: the WORLD moves opposite.
        vx, vy = jnp.cos(ang), jnp.sin(ang)
        spd = 1.8
        ex = g["ex"] - vx * spd
        ey = g["ey"] - vy * spd
        # Enemies steer toward the pilot (origin).
        d = jnp.sqrt(ex**2 + ey**2) + 1e-6
        esp = 0.8 + 0.15 * g["era"].astype(jnp.float32)
        ex = ex - ex / d * esp
        ey = ey - ey / d * esp
        # Shot along the heading.
        can_f = fire & (g["fire_cool"] == 0)
        angoff = jnp.abs(
            jnp.mod(jnp.arctan2(ey, ex) - ang + np.pi, 2 * np.pi) - np.pi
        )
        in_sight = g["e_alive"] & (angoff < 0.18) & (d < 110.0)
        tgt = jnp.argmin(jnp.where(in_sight, d, 1e9))
        hit = can_f & jnp.any(in_sight)
        e_alive = g["e_alive"] & ~((jnp.arange(_TP_N) == tgt) & hit)
        reward = jnp.where(hit, 100.0, 0.0)
        kills = g["kills"] + hit.astype(jnp.int32)
        # Era advance every 8 kills (mothership bonus).
        era_up = kills >= 8
        reward = reward + jnp.where(era_up, 1000.0, 0.0)
        kills = jnp.where(era_up, 0, kills)
        # Collision.
        rammed = jnp.any(e_alive & (d < 7.0))
        # Respawn dead enemies on the ring.
        k1 = key
        na = jax.random.uniform(k1, (_TP_N,), jnp.float32, 0, 2 * np.pi)
        dead = ~e_alive
        ex = jnp.where(dead, 110.0 * jnp.cos(na), ex)
        ey = jnp.where(dead, 110.0 * jnp.sin(na), ey)
        g2 = {
            "ang": ang, "ex": ex, "ey": ey, "e_alive": e_alive | dead,
            "kills": kills,
            "era": g["era"] + era_up.astype(jnp.int32),
            "fire_cool": jnp.where(
                can_f, 5, jnp.maximum(g["fire_cool"] - 1, 0)
            ),
            "lives": g["lives"] - rammed.astype(jnp.int32),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 95.0, jnp.float32)  # sky
        cx, cy = RAW_W / 2, RAW_H / 2
        # clouds drift by heading (parallax cue)
        cl = jnp.sin((cols + g["ang"] * 40.0) / 17.0) + jnp.cos(
            rows / 23.0
        ) > 1.2
        frame = jnp.where(cl, 120.0, frame)
        for i in range(_TP_N):
            en = (
                g["e_alive"][i]
                & (jnp.abs(rows - (cy + g["ey"][i])) < 5)
                & (jnp.abs(cols - (cx + g["ex"][i])) < 7)
            )
            frame = jnp.where(en, 40.0, frame)
        # own plane at center, nose marker by heading
        pl = ((cols - cx) ** 2 + (rows - cy) ** 2) < 30.0
        frame = jnp.where(pl, 240.0, frame)
        nx = cx + 9.0 * jnp.cos(g["ang"])
        ny = cy + 9.0 * jnp.sin(g["ang"])
        nose = ((cols - nx) ** 2 + (rows - ny) ** 2) < 6.0
        return jnp.where(nose, 0.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.7, gray * 0.85, gray])


class TimePilotEnv(ArcadeEnv):
    GAME_CLS = TimePilotGame


# ---------------------------------------------------------------------------
# Jamesbond: side-scroll vehicle; jump craters, shoot, catch diamonds.
# ---------------------------------------------------------------------------

_JB_N = 4


class JamesbondGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "py": jnp.float32(0.0),       # jump height
            "jv": jnp.float32(0.0),
            "scroll": jnp.float32(0.0),
            "crater": jax.random.uniform(
                k1, (), jnp.float32, 200.0, 400.0
            ),
            "ox": jax.random.uniform(
                k2, (_JB_N,), jnp.float32, 0.0, RAW_W
            ),
            "o_type": jnp.arange(_JB_N, dtype=jnp.int32) % 2,  # 0 enemy 1 gem
            "o_alive": jnp.ones((_JB_N,), bool),
            "fire_cool": jnp.int32(0),
            "lives": jnp.int32(5),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return g["lives"] <= 0

    def tick(self, g, action, key):
        over0 = self.over(g)
        fire = (action == 1) | (action >= 10)
        up = (action == 2) | (action == 6) | (action == 7)
        grounded = g["py"] <= 0.0
        jv = jnp.where(
            up & grounded, 6.0, g["jv"] - jnp.where(grounded, 0.0, 0.5)
        )
        py = jnp.maximum(g["py"] + jv, 0.0)
        jv = jnp.where(py <= 0.0, 0.0, jv)
        scroll = g["scroll"] + 2.2
        crater = g["crater"] - 2.2
        # Crater under the car while grounded → crash.
        in_crater = (jnp.abs(crater - 40.0) < 10.0) & (py <= 0.5)
        k1, k2 = jax.random.split(key)
        crater = jnp.where(
            crater < -20.0,
            jax.random.uniform(k1, (), jnp.float32, 180.0, 420.0),
            crater,
        )
        # Objects scroll toward the car at x=40.
        ox = g["ox"] - 2.2
        can_f = fire & (g["fire_cool"] == 0)
        # shots arc up-forward: hit the nearest alive enemy ahead
        ahead = g["o_alive"] & (g["o_type"] == 0) & (ox > 40.0) & (
            ox < 110.0
        )
        tgt = jnp.argmin(jnp.where(ahead, ox, 1e9))
        hit = can_f & jnp.any(ahead)
        reward = jnp.where(hit, 50.0, 0.0)
        # gems collected on contact while airborne
        gem = (
            g["o_alive"] & (g["o_type"] == 1)
            & (jnp.abs(ox - 40.0) < 8.0) & (py > 3.0)
        )
        reward = reward + jnp.sum(gem) * 100.0
        crashed_into = jnp.any(
            g["o_alive"] & (g["o_type"] == 0)
            & (jnp.abs(ox - 40.0) < 7.0) & (py <= 2.0)
        )
        o_alive = (
            g["o_alive"] & ~((jnp.arange(_JB_N) == tgt) & hit) & ~gem
        )
        gone = ~o_alive | (ox < -10.0)
        ox = jnp.where(
            gone,
            RAW_W + jax.random.uniform(k2, (_JB_N,), jnp.float32, 0.0,
                                       120.0),
            ox,
        )
        die = in_crater | crashed_into
        g2 = {
            "py": jnp.where(die, 0.0, py), "jv": jnp.where(die, 0.0, jv),
            "scroll": scroll, "crater": crater,
            "ox": ox, "o_type": g["o_type"], "o_alive": o_alive | gone,
            "fire_cool": jnp.where(
                can_f, 6, jnp.maximum(g["fire_cool"] - 1, 0)
            ),
            "lives": g["lives"] - die.astype(jnp.int32),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        ground_y = 160.0
        frame = jnp.where(rows < ground_y, 50.0, 110.0)
        cr = (rows > ground_y) & (jnp.abs(cols - g["crater"]) < 10.0)
        frame = jnp.where(cr, 20.0, frame)
        for i in range(_JB_N):
            oy = jnp.where(g["o_type"][i] == 0, ground_y - 6.0, 120.0)
            ob = (
                g["o_alive"][i]
                & (jnp.abs(rows - oy) < 5)
                & (jnp.abs(cols - g["ox"][i]) < 6)
            )
            lum = jnp.where(g["o_type"][i] == 0, 70.0, 230.0)
            frame = jnp.where(ob, lum, frame)
        pl = (
            (jnp.abs(rows - (ground_y - 8.0 - g["py"])) < 6)
            & (jnp.abs(cols - 40.0) < 8)
        )
        return jnp.where(pl, 250.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.9, gray * 0.6])


class JamesbondEnv(ArcadeEnv):
    GAME_CLS = JamesbondGame


# ---------------------------------------------------------------------------
# WizardOfWor: maze arena; shoot burwors, mind the radar.
# ---------------------------------------------------------------------------

_WW_N = 9      # maze cells per side (odd)
_WW_M = 4      # monsters
# fixed symmetric arena (1 = wall)
_WW_MAZE = np.ones((_WW_N, _WW_N), np.int8)
_WW_MAZE[1:-1, 1:-1] = 0
_WW_MAZE[2, 2] = _WW_MAZE[2, 6] = 1
_WW_MAZE[4, 4] = 1
_WW_MAZE[6, 2] = _WW_MAZE[6, 6] = 1


class WizardOfWorGame(ArcadeGame):
    action_set_size = 10
    has_fire = True

    def init(self, key):
        k1 = key
        corners = jnp.asarray(
            [[1, 1], [1, _WW_N - 2], [_WW_N - 2, 1],
             [_WW_N - 2, _WW_N - 2]]
        )
        return {
            "pr": jnp.int32(_WW_N // 2), "pc": jnp.int32(_WW_N // 2),
            "dir": jnp.int32(1),          # 0 up 1 right 2 down 3 left
            "mpos": corners,
            "m_alive": jnp.ones((_WW_M,), bool),
            "move_cool": jnp.int32(0),
            "dungeon": jnp.int32(1),
            "lives": jnp.int32(3),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return g["lives"] <= 0

    def tick(self, g, action, key):
        over0 = self.over(g)
        maze = jnp.asarray(_WW_MAZE)
        fire = (action == 1) | (action >= 6)
        up = (action == 2) | (action == 6)
        right = (action == 3) | (action == 7)
        left = (action == 4) | (action == 8)
        down = (action == 5) | (action == 9)
        can = g["move_cool"] == 0
        dr = (down.astype(jnp.int32) - up.astype(jnp.int32)) * can
        dc = (right.astype(jnp.int32) - left.astype(jnp.int32)) * can
        d = jnp.where(
            up, 0, jnp.where(right, 1, jnp.where(down, 2,
                                                 jnp.where(left, 3,
                                                           g["dir"])))
        )
        nr = g["pr"] + dr
        nr = jnp.where(maze[nr, g["pc"]] == 0, nr, g["pr"])
        nc = g["pc"] + dc
        nc = jnp.where(maze[nr, nc] == 0, nc, g["pc"])
        # Fire: a ray along the facing direction until a wall.
        drc = jnp.asarray([[-1, 0], [0, 1], [1, 0], [0, -1]])[d]
        hits = jnp.zeros((_WW_M,), bool)
        rr, cc = nr, nc
        blocked = jnp.bool_(False)
        for _ in range(_WW_N):
            rr = rr + drc[0]
            cc = cc + drc[1]
            blocked = blocked | (
                maze[jnp.clip(rr, 0, _WW_N - 1),
                     jnp.clip(cc, 0, _WW_N - 1)] == 1
            )
            on = (
                (g["mpos"][:, 0] == rr) & (g["mpos"][:, 1] == cc)
                & ~blocked
            )
            hits = hits | on
        shot = fire & g["m_alive"] & hits
        # only the first monster along the ray dies
        first = jnp.argmax(shot)
        killed = jnp.any(shot)
        m_alive = g["m_alive"] & ~((jnp.arange(_WW_M) == first) & killed)
        reward = jnp.where(killed, 100.0 * g["dungeon"].astype(
            jnp.float32
        ), 0.0)
        # Monsters: random valid step each tick, bias toward the player.
        k1, k2 = jax.random.split(key)

        def mstep(pos, k):
            cand = pos[None, :] + jnp.asarray(
                [[-1, 0], [1, 0], [0, -1], [0, 1]]
            )
            free = maze[cand[:, 0], cand[:, 1]] == 0
            dist = jnp.abs(cand[:, 0] - nr) + jnp.abs(cand[:, 1] - nc)
            cost = jnp.where(
                free, dist + jax.random.uniform(k, (4,)) * 3.0, 1e9
            )
            return cand[jnp.argmin(cost)]

        mpos = jax.vmap(mstep)(g["mpos"], jax.random.split(k1, _WW_M))
        mpos = jnp.where(m_alive[:, None] & can, mpos, g["mpos"])
        caught = jnp.any(
            m_alive & (mpos[:, 0] == nr) & (mpos[:, 1] == nc)
        )
        # Dungeon clear: all monsters down → next dungeon, respawn.
        clear = ~jnp.any(m_alive)
        reward = reward + jnp.where(clear, 500.0, 0.0)
        corners = jnp.asarray(
            [[1, 1], [1, _WW_N - 2], [_WW_N - 2, 1],
             [_WW_N - 2, _WW_N - 2]]
        )
        mpos = jnp.where(clear, corners, mpos)
        m_alive = m_alive | clear
        g2 = {
            "pr": jnp.where(caught, _WW_N // 2, nr),
            "pc": jnp.where(caught, _WW_N // 2, nc),
            "dir": d,
            "mpos": mpos, "m_alive": m_alive,
            "move_cool": jnp.where(can, 2, g["move_cool"] - 1),
            "dungeon": g["dungeon"] + clear.astype(jnp.int32),
            "lives": g["lives"] - caught.astype(jnp.int32),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        cell = 20.0
        x0, y0 = 5.0, 15.0
        cr = ((rows - y0) / cell).astype(jnp.int32)
        cc = ((cols - x0) / cell).astype(jnp.int32)
        inside = (cr >= 0) & (cr < _WW_N) & (cc >= 0) & (cc < _WW_N)
        crc = jnp.clip(cr, 0, _WW_N - 1)
        ccc = jnp.clip(cc, 0, _WW_N - 1)
        wall = inside & (jnp.asarray(_WW_MAZE)[crc, ccc] == 1)
        frame = jnp.where(wall, 120.0, jnp.where(inside, 25.0, 10.0))
        for i in range(_WW_M):
            my = y0 + (g["mpos"][i, 0] + 0.5) * cell
            mx = x0 + (g["mpos"][i, 1] + 0.5) * cell
            mo = (
                g["m_alive"][i]
                & (((cols - mx) ** 2 + (rows - my) ** 2) < 30.0)
            )
            frame = jnp.where(mo, 180.0, frame)
        py = y0 + (g["pr"] + 0.5) * cell
        px = x0 + (g["pc"] + 0.5) * cell
        pl = ((cols - px) ** 2 + (rows - py) ** 2) < 30.0
        frame = jnp.where(pl, 250.0, frame)
        # radar strip at the bottom
        radar = rows > RAW_H - 10
        return jnp.where(radar, 60.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.6, gray * 0.7, gray])


class WizardOfWorEnv(ArcadeEnv):
    GAME_CLS = WizardOfWorGame


# ---------------------------------------------------------------------------
# Zaxxon: isometric flight; altitude matters at walls; shoot turrets.
# ---------------------------------------------------------------------------

_ZX_T = 3


class ZaxxonGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "px": jnp.float32(RAW_W / 2),
            "alt": jnp.float32(3.0),        # 0..6
            "scroll": jnp.float32(0.0),
            "wall_d": jnp.float32(260.0),   # distance to the next wall
            "gap_alt": jax.random.randint(k1, (), 1, 6).astype(
                jnp.float32
            ),
            "tx": jax.random.uniform(
                k2, (_ZX_T,), jnp.float32, 30.0, RAW_W - 30.0
            ),
            "td": 80.0 * (1 + jnp.arange(_ZX_T, dtype=jnp.float32)),
            "t_alive": jnp.ones((_ZX_T,), bool),
            "fuel": jnp.float32(100.0),
            "fire_cool": jnp.int32(0),
            "lives": jnp.int32(3),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return g["lives"] <= 0

    def tick(self, g, action, key):
        over0 = self.over(g)
        fire = (action == 1) | (action >= 10)
        up = (action == 2) | (action == 6) | (action == 7)
        down = (action == 5) | (action == 8) | (action == 9)
        right = (action == 3) | (action == 6) | (action == 8)
        left = (action == 4) | (action == 7) | (action == 9)
        px = jnp.clip(
            g["px"] + 2.4 * (right.astype(jnp.float32)
                             - left.astype(jnp.float32)),
            15.0, RAW_W - 15.0,
        )
        alt = jnp.clip(
            g["alt"] + 0.15 * (up.astype(jnp.float32)
                               - down.astype(jnp.float32)),
            0.0, 6.0,
        )
        scroll = g["scroll"] + 2.0
        wall_d = g["wall_d"] - 2.0
        td = g["td"] - 2.0
        # Wall crossing: survive only near the gap altitude.
        k1, k2, k3 = jax.random.split(key, 3)
        at_wall = wall_d <= 0.0
        through = jnp.abs(alt - g["gap_alt"]) < 1.0
        wall_hit = at_wall & ~through
        wall_d = jnp.where(at_wall, 260.0, wall_d)
        gap_alt = jnp.where(
            at_wall, jax.random.randint(k1, (), 1, 6).astype(jnp.float32),
            g["gap_alt"],
        )
        # Turrets: shoot them before they pass (must be low enough).
        can_f = fire & (g["fire_cool"] == 0)
        in_col = (
            g["t_alive"] & (jnp.abs(g["tx"] - px) < 9.0)
            & (td > 0) & (td < 90.0) & (alt < 3.5)
        )
        tgt = jnp.argmin(jnp.where(in_col, td, 1e9))
        hit = can_f & jnp.any(in_col)
        t_alive = g["t_alive"] & ~((jnp.arange(_ZX_T) == tgt) & hit)
        reward = jnp.where(hit, 200.0, 0.0) + jnp.where(
            at_wall & through, 100.0, 0.0
        )
        # Turret flak when passing unshot and low.
        flak = jnp.any(
            t_alive & (jnp.abs(td) < 4.0)
            & (jnp.abs(g["tx"] - px) < 10.0) & (alt < 2.0)
        )
        gone = ~t_alive | (td < -10.0)
        td = jnp.where(
            gone, 80.0 + jax.random.uniform(k2, (_ZX_T,), jnp.float32,
                                            0.0, 160.0),
            td,
        )
        tx = jnp.where(
            gone,
            jax.random.uniform(k3, (_ZX_T,), jnp.float32, 30.0,
                               RAW_W - 30.0),
            g["tx"],
        )
        fuel = g["fuel"] - 0.08
        die = wall_hit | flak | (fuel <= 0.0)
        g2 = {
            "px": px, "alt": jnp.where(die, 3.0, alt),
            "scroll": scroll, "wall_d": wall_d, "gap_alt": gap_alt,
            "tx": tx, "td": td, "t_alive": t_alive | gone,
            "fuel": jnp.where(die, 100.0, fuel),
            "fire_cool": jnp.where(
                can_f, 5, jnp.maximum(g["fire_cool"] - 1, 0)
            ),
            "lives": g["lives"] - die.astype(jnp.int32),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 35.0, jnp.float32)
        # isometric floor stripes scrolling
        stripe = jnp.mod(rows + cols * 0.5 + g["scroll"], 24.0) < 3.0
        floor = rows > 70
        frame = jnp.where(floor & stripe, 55.0, frame)
        # approaching wall: height by distance; gap drawn darker
        wd = jnp.clip(g["wall_d"], 0.0, 260.0)
        wall_y = 70.0 + (1.0 - wd / 260.0) * 100.0
        wall = (rows > wall_y) & (rows < wall_y + 14.0) & floor
        frame = jnp.where(wall, 140.0, frame)
        for i in range(_ZX_T):
            ty = 70.0 + (1.0 - jnp.clip(g["td"][i], 0.0, 200.0) / 200.0
                         ) * 110.0
            tr = (
                g["t_alive"][i]
                & (jnp.abs(rows - ty) < 4)
                & (jnp.abs(cols - g["tx"][i]) < 5)
            )
            frame = jnp.where(tr, 170.0, frame)
        py = 150.0 - g["alt"] * 12.0
        pl = (jnp.abs(rows - py) < 5) & (jnp.abs(cols - g["px"]) < 8)
        frame = jnp.where(pl, 250.0, frame)
        # shadow directly below shows altitude
        sh = (jnp.abs(rows - 155.0) < 2) & (jnp.abs(cols - g["px"]) < 6)
        frame = jnp.where(sh, 20.0, frame)
        bar = (rows > RAW_H - 7) & (cols < g["fuel"] * (RAW_W / 100.0))
        return jnp.where(bar, 255.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.7, gray * 0.9, gray * 0.7])


class ZaxxonEnv(ArcadeEnv):
    GAME_CLS = ZaxxonGame


# ---------------------------------------------------------------------------
# BankHeist: drive the maze, rob banks (they respawn as cop cars), drop
# dynamite, watch the fuel.
# ---------------------------------------------------------------------------

_BH_N = 9
_BH_MAZE = np.ones((_BH_N, _BH_N), np.int8)
_BH_MAZE[1:-1, 1:-1] = 0
_BH_MAZE[2, 2:7:2] = 1
_BH_MAZE[4, 2] = _BH_MAZE[4, 6] = 1
_BH_MAZE[6, 2:7:2] = 1
_BH_B = 3  # banks/cops


class BankHeistGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        k1 = key
        return {
            "pr": jnp.int32(_BH_N - 2), "pc": jnp.int32(1),
            "bpos": jnp.asarray([[1, 3], [3, 7], [7, 5]]),
            "is_cop": jnp.zeros((_BH_B,), bool),
            "dyn_r": jnp.int32(-1), "dyn_c": jnp.int32(0),
            "dyn_t": jnp.float32(0.0),
            "fuel": jnp.float32(100.0),
            "move_cool": jnp.int32(0),
            "lives": jnp.int32(4),
            "score": jnp.int32(0),
        }

    def lives(self, g):
        return g["lives"]

    def over(self, g):
        return g["lives"] <= 0

    def tick(self, g, action, key):
        over0 = self.over(g)
        maze = jnp.asarray(_BH_MAZE)
        fire = (action == 1) | (action >= 10)   # drop dynamite
        up = (action == 2) | (action == 6) | (action == 7)
        down = (action == 5) | (action == 8) | (action == 9)
        right = (action == 3) | (action == 6) | (action == 8)
        left = (action == 4) | (action == 7) | (action == 9)
        can = g["move_cool"] == 0
        dr = (down.astype(jnp.int32) - up.astype(jnp.int32)) * can
        dc = (right.astype(jnp.int32) - left.astype(jnp.int32)) * can
        nr = g["pr"] + dr
        nr = jnp.where(maze[nr, g["pc"]] == 0, nr, g["pr"])
        nc = g["pc"] + dc
        nc = jnp.where(maze[nr, nc] == 0, nc, g["pc"])
        moved = (nr != g["pr"]) | (nc != g["pc"])
        fuel = g["fuel"] - jnp.where(moved, 0.35, 0.1)
        # Robbing: entering a bank cell converts it to a chasing cop at
        # the same spot (the classic escalation), +rob reward.
        on_bank = (
            ~g["is_cop"]
            & (g["bpos"][:, 0] == nr) & (g["bpos"][:, 1] == nc)
        )
        reward = jnp.sum(on_bank) * 50.0
        is_cop = g["is_cop"] | on_bank
        # Cops chase.
        k1, k2 = jax.random.split(key)

        def cop_step(pos, k):
            cand = pos[None, :] + jnp.asarray(
                [[-1, 0], [1, 0], [0, -1], [0, 1]]
            )
            free = maze[cand[:, 0], cand[:, 1]] == 0
            dist = jnp.abs(cand[:, 0] - nr) + jnp.abs(cand[:, 1] - nc)
            cost = jnp.where(
                free, dist + jax.random.uniform(k, (4,)), 1e9
            )
            return cand[jnp.argmin(cost)]

        stepped = jax.vmap(cop_step)(
            g["bpos"], jax.random.split(k1, _BH_B)
        )
        bpos = jnp.where(
            (is_cop & can)[:, None], stepped, g["bpos"]
        )
        # Dynamite: drop on FIRE; detonates after a fuse, killing cops on
        # the cell.
        drop = fire & (g["dyn_r"] < 0)
        dyn_r = jnp.where(drop, nr, g["dyn_r"])
        dyn_c = jnp.where(drop, nc, g["dyn_c"])
        dyn_t = jnp.where(drop, 10.0, jnp.maximum(g["dyn_t"] - 1.0, 0.0))
        boom = (g["dyn_r"] >= 0) & (dyn_t <= 0.0)
        blasted = is_cop & boom & (
            (bpos[:, 0] == dyn_r) & (bpos[:, 1] == dyn_c)
        )
        reward = reward + jnp.sum(blasted) * 200.0
        # blasted cops respawn as fresh banks elsewhere
        new_banks = jnp.asarray([[1, 5], [5, 1], [7, 7]])
        bpos = jnp.where(blasted[:, None], new_banks, bpos)
        is_cop = is_cop & ~blasted
        dyn_r = jnp.where(boom, -1, dyn_r)
        caught = jnp.any(
            is_cop & (bpos[:, 0] == nr) & (bpos[:, 1] == nc)
        )
        die = caught | (fuel <= 0.0)
        g2 = {
            "pr": jnp.where(die, _BH_N - 2, nr),
            "pc": jnp.where(die, 1, nc),
            "bpos": bpos, "is_cop": is_cop & ~die,
            "dyn_r": dyn_r.astype(jnp.int32),
            "dyn_c": dyn_c.astype(jnp.int32), "dyn_t": dyn_t,
            "fuel": jnp.where(die, 100.0, fuel),
            "move_cool": jnp.where(can, 2, g["move_cool"] - 1),
            "lives": g["lives"] - die.astype(jnp.int32),
            "score": g["score"] + reward.astype(jnp.int32),
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        cell = 20.0
        x0, y0 = 5.0, 12.0
        cr = ((rows - y0) / cell).astype(jnp.int32)
        cc = ((cols - x0) / cell).astype(jnp.int32)
        inside = (cr >= 0) & (cr < _BH_N) & (cc >= 0) & (cc < _BH_N)
        crc = jnp.clip(cr, 0, _BH_N - 1)
        ccc = jnp.clip(cc, 0, _BH_N - 1)
        wall = inside & (jnp.asarray(_BH_MAZE)[crc, ccc] == 1)
        frame = jnp.where(wall, 100.0, jnp.where(inside, 40.0, 15.0))
        for i in range(_BH_B):
            by = y0 + (g["bpos"][i, 0] + 0.5) * cell
            bx = x0 + (g["bpos"][i, 1] + 0.5) * cell
            m = ((cols - bx) ** 2 + (rows - by) ** 2) < 28.0
            lum = jnp.where(g["is_cop"][i], 200.0, 160.0)
            frame = jnp.where(m, lum, frame)
        dy = y0 + (g["dyn_r"] + 0.5) * cell
        dx = x0 + (g["dyn_c"] + 0.5) * cell
        dyn = (
            (g["dyn_r"] >= 0)
            & (((cols - dx) ** 2 + (rows - dy) ** 2) < 10.0)
        )
        frame = jnp.where(dyn, 230.0, frame)
        py = y0 + (g["pr"] + 0.5) * cell
        px = x0 + (g["pc"] + 0.5) * cell
        pl = ((cols - px) ** 2 + (rows - py) ** 2) < 28.0
        frame = jnp.where(pl, 250.0, frame)
        bar = (rows > RAW_H - 7) & (cols < g["fuel"] * (RAW_W / 100.0))
        return jnp.where(bar, 255.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.8, gray * 0.5])


class BankHeistEnv(ArcadeEnv):
    GAME_CLS = BankHeistGame
