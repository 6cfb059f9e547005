"""Scroller-engine procgen games: bigfish, starpilot, fruitbot,
dodgeball, bossfight, caveflyer, plunder.

Continuous [0, 64]² playfield, per-step entity kinematics, schematic
sprites.  Entity slots are fixed-size with validity masks.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .core import RES, decode_action, draw_disc

_NE = 10  # entity slots


def _spawn_edge(key, speed_lo, speed_hi):
    """Spawn on the right edge moving left."""
    k1, k2, k3 = jax.random.split(key, 3)
    y = jax.random.uniform(k1, (), jnp.float32, 4.0, RES - 4.0)
    vx = -jax.random.uniform(k2, (), jnp.float32, speed_lo, speed_hi)
    size = jax.random.uniform(k3, (), jnp.float32, 1.0, 4.0)
    return jnp.stack([RES - 2.0, y, vx, 0.0, size])


class _ScrollBase:
    def __init__(self, size: int, mode: str):
        self.mode = mode
        self.hard = mode in ("hard", "extreme")
        self.spawn_p = 0.15 if self.hard else 0.08

    def _move_player(self, g, dx, dy, speed=1.5):
        p = g["p"] + jnp.stack(
            [dx.astype(jnp.float32), dy.astype(jnp.float32)]
        ) * speed
        return jnp.clip(p, 2.0, RES - 2.0)


class BigfishGame(_ScrollBase):
    """Eat smaller fish (+1); eaten by bigger ones; grow; +10 when
    biggest."""

    def init(self, key):
        ents = jnp.zeros((_NE, 5), jnp.float32)
        return {
            "p": jnp.asarray([16.0, 32.0], jnp.float32),
            "size": jnp.float32(1.5),
            "ents": ents,
            "alive": jnp.zeros(_NE, bool),
            "t": jnp.int32(0),
        }

    def tick(self, g, action, key):
        dx, dy, _ = decode_action(action)
        p = self._move_player(g, dx, dy)
        ents = g["ents"].at[:, 0].add(g["ents"][:, 2])
        alive = g["alive"] & (ents[:, 0] > -4.0)
        k1, k2 = jax.random.split(key)
        slot = jnp.argmin(alive)
        spawn = (jax.random.uniform(k1, ()) < self.spawn_p) & ~alive.all()
        ents = jnp.where(spawn, ents.at[slot].set(_spawn_edge(k2, 0.3, 0.9)), ents)
        alive = jnp.where(spawn, alive.at[slot].set(True), alive)
        d = jnp.linalg.norm(ents[:, :2] - p[None, :], axis=1)
        touch = alive & (d < (g["size"] + ents[:, 4]))
        smaller = ents[:, 4] < g["size"]
        eat = touch & smaller
        eaten_by = (touch & ~smaller).any()
        n_eat = eat.sum()
        size = g["size"] + 0.3 * n_eat.astype(jnp.float32)
        alive = alive & ~eat
        reward = n_eat.astype(jnp.float32)
        win = size >= 8.0
        reward = reward + jnp.where(win, 10.0, 0.0)
        done = eaten_by | win
        return (
            {"p": p, "size": size, "ents": ents, "alive": alive,
             "t": g["t"] + 1},
            reward,
            done,
        )

    def render(self, g):
        img = jnp.full((RES, RES, 3), jnp.asarray([30.0, 70.0, 140.0]))
        for i in range(_NE):
            rgb = jnp.where(
                g["ents"][i, 4] < g["size"],
                jnp.asarray([120.0, 220.0, 120.0]),
                jnp.asarray([220.0, 80.0, 80.0]),
            )
            img = draw_disc(img, g["ents"][i, 0], g["ents"][i, 1],
                          g["ents"][i, 4], rgb, cond=g["alive"][i])
        return jnp.clip(
            draw_disc(img, g["p"][0], g["p"][1], g["size"],
                      [240.0, 200.0, 60.0]),
            0, 255,
        ).astype(jnp.uint8)


class StarpilotGame(_ScrollBase):
    """Side-scrolling shooter: fire (+1 per kill), die on contact."""

    def init(self, key):
        return {
            "p": jnp.asarray([10.0, 32.0], jnp.float32),
            "ents": jnp.zeros((_NE, 5), jnp.float32),
            "alive": jnp.zeros(_NE, bool),
            "bullet": jnp.asarray([-1.0, 0.0], jnp.float32),
            "t": jnp.int32(0),
        }

    def tick(self, g, action, key):
        dx, dy, sp = decode_action(action)
        p = self._move_player(g, dx, dy)
        fire = sp == 1
        bullet = jnp.where(
            g["bullet"][0] >= 0,
            g["bullet"] + jnp.asarray([4.0, 0.0]),
            jnp.where(fire, jnp.stack([p[0] + 2, p[1]]), g["bullet"]),
        )
        bullet = jnp.where(bullet[0] > RES, jnp.asarray([-1.0, 0.0]), bullet)
        ents = g["ents"].at[:, 0].add(g["ents"][:, 2])
        alive = g["alive"] & (ents[:, 0] > -4.0)
        k1, k2 = jax.random.split(key)
        slot = jnp.argmin(alive)
        spawn = (jax.random.uniform(k1, ()) < self.spawn_p) & ~alive.all()
        ents = jnp.where(
            spawn, ents.at[slot].set(_spawn_edge(k2, 0.6, 1.4)), ents
        )
        alive = jnp.where(spawn, alive.at[slot].set(True), alive)
        db = jnp.linalg.norm(ents[:, :2] - bullet[None, :], axis=1)
        hit = alive & (db < ents[:, 4] + 1.5) & (bullet[0] >= 0)
        kills = hit.sum()
        alive = alive & ~hit
        bullet = jnp.where(hit.any(), jnp.asarray([-1.0, 0.0]), bullet)
        dp = jnp.linalg.norm(ents[:, :2] - p[None, :], axis=1)
        dead = (alive & (dp < ents[:, 4] + 1.5)).any()
        reward = kills.astype(jnp.float32)
        return (
            {"p": p, "ents": ents, "alive": alive, "bullet": bullet,
             "t": g["t"] + 1},
            reward,
            dead,
        )

    def render(self, g):
        img = jnp.full((RES, RES, 3), jnp.asarray([15.0, 15.0, 30.0]))
        for i in range(_NE):
            img = draw_disc(img, g["ents"][i, 0], g["ents"][i, 1],
                          g["ents"][i, 4], [200.0, 80.0, 200.0], cond=g["alive"][i])
        img = draw_disc(img, g["bullet"][0], g["bullet"][1], 1.2,
                      [255.0, 255.0, 160.0], cond=g["bullet"][0] >= 0)
        return jnp.clip(
            draw_disc(img, g["p"][0], g["p"][1], 2.2, [80.0, 180.0, 255.0]),
            0, 255,
        ).astype(jnp.uint8)


class FruitbotGame(_ScrollBase):
    """Catch fruit (+1), avoid junk (-4); reach the end (+10)."""

    LENGTH = 400

    def init(self, key):
        return {
            "p": jnp.asarray([32.0, 6.0], jnp.float32),
            "ents": jnp.zeros((_NE, 5), jnp.float32),  # x y vy kind size
            "alive": jnp.zeros(_NE, bool),
            "t": jnp.int32(0),
        }

    def tick(self, g, action, key):
        dx, _, _ = decode_action(action)
        p = jnp.clip(
            g["p"] + jnp.stack([dx.astype(jnp.float32) * 2.0, 0.0]),
            2.0, RES - 2.0,
        )
        ents = g["ents"].at[:, 1].add(-1.2)
        alive = g["alive"] & (ents[:, 1] > 0.0)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        slot = jnp.argmin(alive)
        spawn = (jax.random.uniform(k1, ()) < self.spawn_p * 2) & ~alive.all()
        kind = (jax.random.uniform(k3, ()) < 0.5).astype(jnp.float32)
        new = jnp.stack([
            jax.random.uniform(k2, (), jnp.float32, 4.0, RES - 4.0),
            jnp.float32(RES - 2.0),
            jnp.float32(0.0),
            kind,  # 1 fruit, 0 junk
            jnp.float32(2.0),
        ])
        ents = jnp.where(spawn, ents.at[slot].set(new), ents)
        alive = jnp.where(spawn, alive.at[slot].set(True), alive)
        d = jnp.sqrt(
            (ents[:, 0] - p[0]) ** 2 + (ents[:, 1] - p[1]) ** 2
        )
        touch = alive & (d < 3.5)
        fruit = touch & (ents[:, 3] > 0.5)
        junk = touch & (ents[:, 3] <= 0.5)
        alive = alive & ~touch
        reward = fruit.sum().astype(jnp.float32) - 4.0 * junk.sum()
        t = g["t"] + 1
        win = t >= self.LENGTH
        reward = reward + jnp.where(win, 10.0, 0.0)
        return (
            {"p": p, "ents": ents, "alive": alive, "t": t},
            reward,
            win,
        )

    def render(self, g):
        img = jnp.full((RES, RES, 3), jnp.asarray([40.0, 45.0, 40.0]))
        for i in range(_NE):
            rgb = jnp.where(
                g["ents"][i, 3] > 0.5,
                jnp.asarray([230.0, 120.0, 60.0]),
                jnp.asarray([100.0, 100.0, 110.0]),
            )
            img = draw_disc(img, g["ents"][i, 0], g["ents"][i, 1], 2.0, rgb, cond=g["alive"][i])
        return jnp.clip(
            draw_disc(img, g["p"][0], g["p"][1], 2.5, [120.0, 220.0, 120.0]),
            0, 255,
        ).astype(jnp.uint8)


class DodgeballGame(_ScrollBase):
    """Hit all enemies with balls (+1 each, +10 clear), don't get hit."""

    def init(self, key):
        ks = jax.random.split(key, _NE)
        ents = jnp.stack([
            jnp.stack([
                jax.random.uniform(ks[i], (), jnp.float32, 20.0, RES - 4.0),
                jax.random.uniform(
                    jax.random.fold_in(ks[i], 1), (), jnp.float32, 4.0,
                    RES - 4.0,
                ),
                jax.random.uniform(
                    jax.random.fold_in(ks[i], 2), (), jnp.float32, -0.5, 0.5
                ),
                jax.random.uniform(
                    jax.random.fold_in(ks[i], 3), (), jnp.float32, -0.5, 0.5
                ),
                jnp.float32(2.0),
            ])
            for i in range(_NE)
        ])
        n = 4 if not self.hard else 7
        return {
            "p": jnp.asarray([6.0, 32.0], jnp.float32),
            "ents": ents,
            "alive": jnp.arange(_NE) < n,
            "ball": jnp.asarray([-1.0, 0.0, 0.0, 0.0], jnp.float32),
            "t": jnp.int32(0),
        }

    def tick(self, g, action, key):
        dx, dy, sp = decode_action(action)
        p = self._move_player(g, dx, dy)
        fire = (sp == 1) & (g["ball"][0] < 0)
        aim = jnp.stack(
            [jnp.where(dx == 0, 1.0, dx.astype(jnp.float32)),
             dy.astype(jnp.float32)]
        )
        aim = aim / (jnp.linalg.norm(aim) + 1e-6)
        ball = jnp.where(
            fire,
            jnp.concatenate([p, aim * 3.0]),
            g["ball"].at[:2].add(g["ball"][2:]),
        )
        out = (
            (ball[0] < 0) | (ball[0] > RES) | (ball[1] < 0) | (ball[1] > RES)
        )
        ball = jnp.where(out & ~fire, jnp.asarray([-1.0, 0, 0, 0]), ball)
        # Enemies bounce around.
        ents = g["ents"].at[:, :2].add(g["ents"][:, 2:4])
        bounce_x = (ents[:, 0] < 2) | (ents[:, 0] > RES - 2)
        bounce_y = (ents[:, 1] < 2) | (ents[:, 1] > RES - 2)
        ents = ents.at[:, 2].multiply(jnp.where(bounce_x, -1.0, 1.0))
        ents = ents.at[:, 3].multiply(jnp.where(bounce_y, -1.0, 1.0))
        db = jnp.linalg.norm(ents[:, :2] - ball[None, :2], axis=1)
        hit = g["alive"] & (db < 3.0) & (ball[0] >= 0)
        alive = g["alive"] & ~hit
        dp = jnp.linalg.norm(ents[:, :2] - p[None, :], axis=1)
        tagged = (alive & (dp < 3.0)).any()
        cleared = ~alive.any()
        reward = hit.sum().astype(jnp.float32) + jnp.where(
            cleared & g["alive"].any(), 10.0, 0.0
        )
        return (
            {"p": p, "ents": ents, "alive": alive, "ball": ball,
             "t": g["t"] + 1},
            reward,
            tagged | cleared,
        )

    def render(self, g):
        img = jnp.full((RES, RES, 3), jnp.asarray([50.0, 50.0, 60.0]))
        for i in range(_NE):
            img = draw_disc(img, g["ents"][i, 0], g["ents"][i, 1], 2.0,
                          [220.0, 90.0, 90.0], cond=g["alive"][i])
        img = draw_disc(img, g["ball"][0], g["ball"][1], 1.3,
                      [250.0, 250.0, 250.0], cond=g["ball"][0] >= 0)
        return jnp.clip(
            draw_disc(img, g["p"][0], g["p"][1], 2.2, [90.0, 160.0, 250.0]),
            0, 255,
        ).astype(jnp.uint8)


class BossfightGame(_ScrollBase):
    """Damage the boss between its attack barrages (+1 per hit round,
    +10 on kill)."""

    def init(self, key):
        return {
            "p": jnp.asarray([32.0, 8.0], jnp.float32),
            "boss_x": jnp.float32(32.0),
            "boss_hp": jnp.int32(9 if self.hard else 5),
            "shots": jnp.zeros((_NE, 4), jnp.float32),
            "shot_live": jnp.zeros(_NE, bool),
            "bullet": jnp.asarray([-1.0, 0.0], jnp.float32),
            "t": jnp.int32(0),
        }

    def tick(self, g, action, key):
        dx, dy, sp = decode_action(action)
        p = self._move_player(g, dx, dy)
        k1, k2, k3 = jax.random.split(key, 3)
        boss_x = jnp.clip(
            g["boss_x"] + jax.random.uniform(k1, (), jnp.float32, -1, 1),
            8.0, RES - 8.0,
        )
        # Player bullet (up).
        fire = (sp == 1) & (g["bullet"][0] < 0)
        bullet = jnp.where(
            fire, jnp.stack([p[0], p[1] + 3]),
            g["bullet"] + jnp.asarray([0.0, 3.0]) * (g["bullet"][0] >= 0),
        )
        bullet = jnp.where(bullet[1] > RES, jnp.asarray([-1.0, 0.0]), bullet)
        hit_boss = (
            (bullet[0] >= 0)
            & (jnp.abs(bullet[0] - boss_x) < 5.0)
            & (bullet[1] > RES - 12.0)
        )
        boss_hp = g["boss_hp"] - hit_boss.astype(jnp.int32)
        bullet = jnp.where(hit_boss, jnp.asarray([-1.0, 0.0]), bullet)
        # Boss barrage.
        shots = g["shots"].at[:, :2].add(g["shots"][:, 2:])
        live = g["shot_live"] & (shots[:, 1] > 0)
        slot = jnp.argmin(live)
        spawn = jax.random.uniform(k2, ()) < (0.25 if self.hard else 0.15)
        aim = p - jnp.stack([boss_x, jnp.float32(RES - 6.0)])
        aim = aim / (jnp.linalg.norm(aim) + 1e-6)
        new = jnp.concatenate(
            [jnp.stack([boss_x, jnp.float32(RES - 6.0)]), aim * 1.6]
        )
        shots = jnp.where(spawn & ~live.all(), shots.at[slot].set(new), shots)
        live = jnp.where(spawn & ~live.all(), live.at[slot].set(True), live)
        dp = jnp.linalg.norm(shots[:, :2] - p[None, :], axis=1)
        dead = (live & (dp < 2.5)).any()
        win = boss_hp <= 0
        reward = hit_boss.astype(jnp.float32) + jnp.where(win, 10.0, 0.0)
        return (
            {"p": p, "boss_x": boss_x, "boss_hp": boss_hp, "shots": shots,
             "shot_live": live, "bullet": bullet, "t": g["t"] + 1},
            reward,
            dead | win,
        )

    def render(self, g):
        img = jnp.full((RES, RES, 3), jnp.asarray([20.0, 18.0, 35.0]))
        img = draw_disc(img, g["boss_x"], RES - 6.0, 5.0, [200.0, 60.0, 200.0])
        for i in range(_NE):
            img = draw_disc(img, g["shots"][i, 0], g["shots"][i, 1], 1.4,
                          [255.0, 120.0, 60.0], cond=g["shot_live"][i])
        img = draw_disc(img, g["bullet"][0], g["bullet"][1], 1.2,
                      [160.0, 255.0, 160.0], cond=g["bullet"][0] >= 0)
        return jnp.clip(
            draw_disc(img, g["p"][0], g["p"][1], 2.2, [90.0, 170.0, 255.0]),
            0, 255,
        ).astype(jnp.uint8)


class CaveflyerGame(_ScrollBase):
    """Asteroids-style cave flight to the exit (+10); rocks kill;
    destroy targets (+3)."""

    def init(self, key):
        ks = jax.random.split(key, _NE)
        ents = jnp.stack([
            jnp.stack([
                jax.random.uniform(ks[i], (), jnp.float32, 16.0, RES - 4.0),
                jax.random.uniform(
                    jax.random.fold_in(ks[i], 1), (), jnp.float32, 4.0,
                    RES - 4.0,
                ),
                jax.random.uniform(
                    jax.random.fold_in(ks[i], 2), (), jnp.float32, -0.4, 0.4
                ),
                jax.random.uniform(
                    jax.random.fold_in(ks[i], 3), (), jnp.float32, -0.4, 0.4
                ),
                jax.random.uniform(
                    jax.random.fold_in(ks[i], 4), (), jnp.float32, 2.0, 4.0
                ),
            ])
            for i in range(_NE)
        ])
        return {
            "p": jnp.asarray([5.0, 32.0], jnp.float32),
            "v": jnp.zeros(2, jnp.float32),
            "ents": ents,
            "alive": jnp.ones(_NE, bool),
            "t": jnp.int32(0),
        }

    def tick(self, g, action, key):
        dx, dy, sp = decode_action(action)
        v = jnp.clip(
            g["v"] + 0.25 * jnp.stack(
                [dx.astype(jnp.float32), dy.astype(jnp.float32)]
            ),
            -2.0, 2.0,
        ) * 0.97
        p = jnp.clip(g["p"] + v, 2.0, RES - 2.0)
        ents = g["ents"].at[:, :2].add(g["ents"][:, 2:4])
        ents = ents.at[:, :2].set(jnp.mod(ents[:, :2], RES))
        d = jnp.linalg.norm(ents[:, :2] - p[None, :], axis=1)
        crash = (g["alive"] & (d < ents[:, 4] + 1.5)).any()
        at_exit = p[0] > RES - 4.0
        reward = jnp.where(at_exit, 10.0, 0.0)
        return (
            {"p": p, "v": v, "ents": ents, "alive": g["alive"],
             "t": g["t"] + 1},
            reward,
            crash | at_exit,
        )

    def render(self, g):
        img = jnp.full((RES, RES, 3), jnp.asarray([25.0, 20.0, 20.0]))
        rows = jax.lax.broadcasted_iota(jnp.float32, (RES, RES), 1)
        exit_band = rows > RES - 4
        img = jnp.where(
            exit_band[..., None], jnp.asarray([240.0, 210.0, 60.0]), img
        )
        for i in range(_NE):
            img = draw_disc(img, g["ents"][i, 0], g["ents"][i, 1],
                          g["ents"][i, 4], [110.0, 100.0, 90.0], cond=g["alive"][i])
        return jnp.clip(
            draw_disc(img, g["p"][0], g["p"][1], 2.0, [120.0, 220.0, 255.0]),
            0, 255,
        ).astype(jnp.uint8)


class PlunderGame(_ScrollBase):
    """Sink enemy ships (+1), avoid friendly ones (-1, timer penalty)."""

    def init(self, key):
        return {
            "p": jnp.asarray([32.0, 5.0], jnp.float32),
            "ents": jnp.zeros((_NE, 5), jnp.float32),  # x y vx kind size
            "alive": jnp.zeros(_NE, bool),
            "bullet": jnp.asarray([-1.0, 0.0], jnp.float32),
            "timer": jnp.float32(1.0),
            "t": jnp.int32(0),
        }

    def tick(self, g, action, key):
        dx, _, sp = decode_action(action)
        p = jnp.clip(
            g["p"] + jnp.stack([dx.astype(jnp.float32) * 1.5, 0.0]),
            2.0, RES - 2.0,
        )
        fire = (sp == 1) & (g["bullet"][0] < 0)
        bullet = jnp.where(
            fire, jnp.stack([p[0], p[1] + 2]),
            g["bullet"] + jnp.asarray([0.0, 2.5]) * (g["bullet"][0] >= 0),
        )
        bullet = jnp.where(bullet[1] > RES, jnp.asarray([-1.0, 0.0]), bullet)
        ents = g["ents"].at[:, 0].add(g["ents"][:, 2])
        alive = g["alive"] & (ents[:, 0] > -4.0) & (ents[:, 0] < RES + 4.0)
        k1, k2, k3 = jax.random.split(key, 3)
        slot = jnp.argmin(alive)
        spawn = (jax.random.uniform(k1, ()) < self.spawn_p * 1.5) & ~alive.all()
        lane = jax.random.uniform(k2, (), jnp.float32, 24.0, RES - 6.0)
        kind = (jax.random.uniform(k3, ()) < 0.5).astype(jnp.float32)
        new = jnp.stack(
            [jnp.float32(RES - 2.0), lane, jnp.float32(-0.8), kind,
             jnp.float32(2.5)]
        )
        ents = jnp.where(spawn, ents.at[slot].set(new), ents)
        alive = jnp.where(spawn, alive.at[slot].set(True), alive)
        db = jnp.abs(ents[:, 0] - bullet[0]) + jnp.abs(ents[:, 1] - bullet[1])
        hit = alive & (db < 4.0) & (bullet[0] >= 0)
        enemy_hit = hit & (ents[:, 3] > 0.5)
        friend_hit = hit & (ents[:, 3] <= 0.5)
        alive = alive & ~hit
        bullet = jnp.where(hit.any(), jnp.asarray([-1.0, 0.0]), bullet)
        timer = g["timer"] - 0.001 - 0.05 * friend_hit.sum()
        reward = enemy_hit.sum().astype(jnp.float32) - friend_hit.sum()
        done = timer <= 0.0
        return (
            {"p": p, "ents": ents, "alive": alive, "bullet": bullet,
             "timer": timer, "t": g["t"] + 1},
            reward,
            done,
        )

    def render(self, g):
        img = jnp.full((RES, RES, 3), jnp.asarray([30.0, 60.0, 110.0]))
        for i in range(_NE):
            rgb = jnp.where(
                g["ents"][i, 3] > 0.5,
                jnp.asarray([200.0, 70.0, 70.0]),
                jnp.asarray([210.0, 210.0, 210.0]),
            )
            img = draw_disc(img, g["ents"][i, 0], g["ents"][i, 1], 2.5, rgb, cond=g["alive"][i])
        img = draw_disc(img, g["bullet"][0], g["bullet"][1], 1.2,
                      [255.0, 240.0, 150.0], cond=g["bullet"][0] >= 0)
        return jnp.clip(
            draw_disc(img, g["p"][0], g["p"][1], 2.5, [240.0, 200.0, 80.0]),
            0, 255,
        ).astype(jnp.uint8)
