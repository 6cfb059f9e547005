"""Arcade wave 15: Backgammon, Blackjack, Casino, Othello,
TicTacToe3d, VideoCheckers, VideoChess — the 2600 board/casino carts.

Behavioral reference: the corresponding ALE ROMs registered by
``envpool/atari/registration.py:21-35``.  These cores play REAL
(simplified where stated) versions of the underlying games against
built-in opponents, driven through the ALE joystick interface like the
cartridges: Othello is full reversi with legality + flips, TicTacToe3d
is the true 4x4x4 game over all 76 winning lines, Blackjack deals real
hands; Backgammon is a hit-and-race variant (no doubling cube/bear-off
subtleties), VideoCheckers plays men-only draughts, VideoChess plays
capture-the-king with exact piece movement (no check/castling) — each
documented inline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .arcade_env import RAW_H, RAW_W, ArcadeEnv, ArcadeGame
from .wave3_games import _freeze_when, _grids
from .wave12_games import _joy


def _draw_card(key):
    """Uniform rank 1-13 (ace=1); blackjack value handled by caller."""
    return jax.random.randint(key, (), 1, 14)


def _bj_value(total, aces):
    """Best blackjack value given hard total and ace count."""
    soft = total + 10
    use_soft = (aces > 0) & (soft <= 21)
    return jnp.where(use_soft, soft, total)


# ---------------------------------------------------------------------------
# Blackjack: real hands vs a dealer who hits to 17; FIRE=hit,
# DOWN=stand, UP=raise the bet before the deal.
# ---------------------------------------------------------------------------


class BlackjackGame(ArcadeGame):
    action_set_size = 4  # NOOP FIRE UP DOWN
    has_fire = True
    minimal_set = (0, 1, 2, 5)

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        c1, c2 = _draw_card(k1), _draw_card(k2)
        up = _draw_card(k3)
        return {
            "total": jnp.minimum(c1, 10) + jnp.minimum(c2, 10),
            "aces": (c1 == 1).astype(jnp.int32) + (c2 == 1).astype(
                jnp.int32
            ),
            "ncards": jnp.int32(2),
            "dealer_up": up,
            "bet": jnp.int32(1),
            "bank": jnp.int32(200),
            "in_hand": jnp.bool_(True),
        }

    def lives(self, g):
        return (g["bank"] > 0).astype(jnp.int32)

    def over(self, g):
        return (g["bank"] <= 0) | (g["bank"] >= 1000)

    def tick(self, g, action, key):
        over0 = self.over(g)
        hit = action == 1
        raise_bet = action == 2
        stand = action == 3
        ks = jax.random.split(key, 8)
        # Hit: draw a card.
        card = _draw_card(ks[0])
        total = g["total"] + jnp.where(
            g["in_hand"] & hit, jnp.minimum(card, 10), 0
        )
        aces = g["aces"] + jnp.where(
            g["in_hand"] & hit, (card == 1).astype(jnp.int32), 0
        )
        ncards = g["ncards"] + (g["in_hand"] & hit).astype(jnp.int32)
        busted = total > 21
        # Stand (or bust): dealer plays — draws until best value >= 17.
        resolve = g["in_hand"] & (stand | busted)
        d_total = jnp.minimum(g["dealer_up"], 10)
        d_aces = (g["dealer_up"] == 1).astype(jnp.int32)

        def d_draw(c):
            dt, da, i = c
            crd = _draw_card(ks[2 + i % 5])
            return (
                dt + jnp.minimum(crd, 10),
                da + (crd == 1).astype(jnp.int32), i + 1,
            )

        d_total, d_aces, _ = jax.lax.while_loop(
            lambda c: _bj_value(c[0], c[1]) < 17, d_draw,
            (d_total, d_aces, jnp.int32(0)),
        )
        pv = _bj_value(total, aces)
        dv = _bj_value(d_total, d_aces)
        win = ~busted & ((dv > 21) | (pv > dv))
        push = ~busted & (dv <= 21) & (pv == dv)
        delta = jnp.where(
            win, g["bet"], jnp.where(push, 0, -g["bet"])
        )
        bank = g["bank"] + jnp.where(resolve, delta, 0)
        reward = jnp.where(resolve, delta.astype(jnp.float32), 0.0)
        # Raise bet between hands (caps at 25).
        bet = jnp.where(
            ~g["in_hand"] & raise_bet, jnp.minimum(g["bet"] + 1, 25),
            g["bet"],
        )
        # Deal the next hand one frame after resolution.
        new_deal = ~g["in_hand"]
        c1, c2 = _draw_card(ks[6]), _draw_card(ks[7])
        total = jnp.where(
            new_deal, jnp.minimum(c1, 10) + jnp.minimum(c2, 10), total
        )
        aces = jnp.where(
            new_deal,
            (c1 == 1).astype(jnp.int32) + (c2 == 1).astype(jnp.int32),
            aces,
        )
        ncards = jnp.where(new_deal, 2, ncards)
        dealer_up = jnp.where(new_deal, _draw_card(ks[1]), g["dealer_up"])
        in_hand = jnp.where(resolve, False, g["in_hand"]) | new_deal
        g2 = {
            "total": total, "aces": aces, "ncards": ncards,
            "dealer_up": dealer_up, "bet": bet, "bank": bank,
            "in_hand": in_hand,
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 40.0, jnp.float32)
        # Player total as a bar, dealer up-card as a block row.
        pv = _bj_value(g["total"], g["aces"])
        pbar = (rows > 150) & (rows < 165) & (
            cols < pv.astype(jnp.float32) * 7.0
        )
        frame = jnp.where(pbar, 220.0, frame)
        dbar = (rows > 50) & (rows < 65) & (
            cols < g["dealer_up"].astype(jnp.float32) * 7.0
        )
        frame = jnp.where(dbar, 160.0, frame)
        bank = (rows > 195) & (
            cols < g["bank"].astype(jnp.float32) * (RAW_W / 400.0)
        )
        frame = jnp.where(bank, 255.0, frame)
        for c in range(8):
            chip = (
                (c < g["ncards"])
                & (jnp.abs(rows - 110) < 6)
                & (jnp.abs(cols - (20.0 + 18.0 * c)) < 6)
            )
            frame = jnp.where(chip, 200.0, frame)
        return frame

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.4, gray, gray * 0.5])


class BlackjackEnv(ArcadeEnv):
    GAME_CLS = BlackjackGame


# ---------------------------------------------------------------------------
# Casino: five-card draw poker against a pay table (the cart's poker
# mode) — joystick moves the hold cursor, FIRE toggles, UP deals/draws.
# ---------------------------------------------------------------------------

_PAY_NAMES = 9


class CasinoGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        ks = jax.random.split(key, 5)
        cards = jnp.stack([_draw_card(k) for k in ks])
        return {
            "cards": cards,            # ranks 1-13
            "suits": jax.random.randint(key, (5,), 0, 4),
            "hold": jnp.zeros((5,), bool),
            "cursor": jnp.int32(0),
            "drawn": jnp.bool_(False),
            "bank": jnp.int32(100),
        }

    def lives(self, g):
        return (g["bank"] > 0).astype(jnp.int32)

    def over(self, g):
        return (g["bank"] <= 0) | (g["bank"] >= 500)

    @staticmethod
    def _payout(cards, suits):
        """Jacks-or-better pay ladder on ranks/suits [5]."""
        counts = (cards[:, None] == jnp.arange(1, 14)[None, :]).sum(0)
        pairs = jnp.sum(counts == 2)
        trips = jnp.any(counts == 3)
        quads = jnp.any(counts == 4)
        high_pair = jnp.any(
            (counts == 2) & ((jnp.arange(1, 14) >= 11) | (
                jnp.arange(1, 14) == 1))
        )
        flush = jnp.all(suits == suits[0])
        sorted_c = jnp.sort(cards)
        straight = jnp.all(jnp.diff(sorted_c) == 1)
        full = trips & (pairs == 1)
        return jnp.where(
            quads, 25, jnp.where(
                full, 9, jnp.where(
                    flush & straight, 50, jnp.where(
                        flush, 6, jnp.where(
                            straight, 4, jnp.where(
                                trips, 3, jnp.where(
                                    pairs == 2, 2, jnp.where(
                                        high_pair, 1, 0
                                    ))))))))

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        cursor = jnp.clip(
            g["cursor"] + right.astype(jnp.int32) - left.astype(jnp.int32),
            0, 4,
        )
        hold = g["hold"] ^ ((jnp.arange(5) == cursor) & fire & ~g["drawn"])
        # UP = draw (replace unheld), score the hand, then fresh deal.
        ks = jax.random.split(key, 11)
        new_cards = jnp.stack([_draw_card(k) for k in ks[:5]])
        new_suits = jax.random.randint(ks[5], (5,), 0, 4)
        do_draw = up & ~g["drawn"]
        cards = jnp.where(do_draw & ~hold, new_cards, g["cards"])
        suits = jnp.where(do_draw & ~hold, new_suits, g["suits"])
        pay = self._payout(cards, suits)
        reward = jnp.where(do_draw, pay.astype(jnp.float32) - 1.0, 0.0)
        bank = g["bank"] + reward.astype(jnp.int32)
        # Next hand.
        fresh_cards = jnp.stack([_draw_card(k) for k in ks[6:11]])
        cards = jnp.where(do_draw, fresh_cards, cards)
        suits = jnp.where(do_draw, jax.random.randint(ks[5], (5,), 0, 4),
                          suits)
        hold = jnp.where(do_draw, jnp.zeros((5,), bool), hold)
        g2 = {
            "cards": cards, "suits": suits, "hold": hold,
            "cursor": cursor, "drawn": jnp.bool_(False), "bank": bank,
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 35.0, jnp.float32)
        for i in range(5):
            x = 18.0 + 28.0 * i
            card = (jnp.abs(rows - 100) < 22) & (jnp.abs(cols - x) < 11)
            frame = jnp.where(card, 210.0, frame)
            face = (
                (rows > 85)
                & (rows < 85 + g["cards"][i].astype(jnp.float32) * 2.5)
                & (jnp.abs(cols - x) < 7)
            )
            frame = jnp.where(face, 120.0 + 30.0 * g["suits"][i], frame)
            held = g["hold"][i] & (jnp.abs(rows - 132) < 4) & (
                jnp.abs(cols - x) < 9
            )
            frame = jnp.where(held, 255.0, frame)
            cur = (g["cursor"] == i) & (jnp.abs(rows - 70) < 3) & (
                jnp.abs(cols - x) < 5
            )
            frame = jnp.where(cur, 240.0, frame)
        bank = (rows > 195) & (
            cols < g["bank"].astype(jnp.float32) * (RAW_W / 200.0)
        )
        return jnp.where(bank, 180.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.5, gray, gray * 0.4])


class CasinoEnv(ArcadeEnv):
    GAME_CLS = CasinoGame


# ---------------------------------------------------------------------------
# Othello: full reversi — legality, 8-direction flips, greedy drone.
# ---------------------------------------------------------------------------

_DIRS = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0),
         (1, 1)]


def _flips_for(board, r, c, me):
    """[8,8] bool of stones flipped by playing (r, c); all-False if the
    move is illegal.  board: +1 me, -1 opp, 0 empty."""
    total = jnp.zeros((8, 8), bool)
    occupied = board[r, c] != 0
    for dr, dc in _DIRS:
        run = jnp.zeros((8, 8), bool)
        good = jnp.zeros((), bool)
        cur_r, cur_c = r + dr, c + dc
        cand = jnp.zeros((8, 8), bool)
        open_run = jnp.ones((), bool)
        for _ in range(7):
            inb = (cur_r >= 0) & (cur_r < 8) & (cur_c >= 0) & (cur_c < 8)
            rr = jnp.clip(cur_r, 0, 7)
            cc = jnp.clip(cur_c, 0, 7)
            v = jnp.where(inb, board[rr, cc], 0)
            is_opp = v == -me
            is_me = v == me
            cand = cand | (
                open_run & is_opp
                & (jnp.arange(8)[:, None] == rr)
                & (jnp.arange(8)[None, :] == cc)
            )
            good = good | (open_run & is_me & jnp.any(cand))
            open_run = open_run & is_opp & inb
            cur_r, cur_c = cur_r + dr, cur_c + dc
        run = jnp.where(good, cand, run)
        total = total | run
    return total & ~occupied[None, None] if False else jnp.where(
        occupied, jnp.zeros((8, 8), bool), total
    )


def _apply_move(board, r, c, me):
    flips = _flips_for(board, r, c, me)
    legal = jnp.any(flips)
    stone = (jnp.arange(8)[:, None] == r) & (jnp.arange(8)[None, :] == c)
    new = jnp.where(flips, me, board)
    new = jnp.where(stone & legal, me, new)
    return jnp.where(legal, new, board), legal


def _best_greedy(board, me):
    """(r, c, any_legal) for the max-flip move of ``me`` (vmapped over
    the 64 squares — one traced body, not 64 unrolled)."""
    idx = jnp.arange(64)
    nf = jax.vmap(
        lambda i: jnp.sum(_flips_for(board, i // 8, i % 8, me))
    )(idx)
    best = jnp.argmax(nf)
    return best // 8, best % 8, jnp.max(nf) > 0


class OthelloGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        board = jnp.zeros((8, 8), jnp.int32)
        board = board.at[3, 3].set(1).at[4, 4].set(1)
        board = board.at[3, 4].set(-1).at[4, 3].set(-1)
        return {
            "board": board,  # +1 player, -1 drone
            "cr": jnp.int32(3), "cc": jnp.int32(3),
            "done": jnp.bool_(False),
        }

    def lives(self, g):
        return jnp.int32(1)

    def over(self, g):
        return g["done"]

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        cr = jnp.clip(
            g["cr"] + down.astype(jnp.int32) - up.astype(jnp.int32), 0, 7
        )
        cc = jnp.clip(
            g["cc"] + right.astype(jnp.int32) - left.astype(jnp.int32),
            0, 7,
        )
        board, placed = _apply_move(g["board"], cr, cc, 1)
        placed = placed & fire
        board = jnp.where(placed, board, g["board"])
        # Drone replies greedily when the player has moved.
        dr, dc, d_can = _best_greedy(board, -1)
        board2, _ = _apply_move(board, dr, dc, -1)
        board = jnp.where(placed & d_can, board2, board)
        full = jnp.all(board != 0)
        p_cnt = jnp.sum(board == 1)
        d_cnt = jnp.sum(board == -1)
        # Game ends when the board fills or the player mated the drone
        # out of moves right after a move with none available back.
        p_r, p_c, p_can = _best_greedy(board, 1)
        done = full | (~p_can & ~d_can)
        reward = jnp.where(
            done & ~g["done"], (p_cnt - d_cnt).astype(jnp.float32), 0.0
        ) + jnp.where(placed, 1.0, 0.0)
        g2 = {"board": board, "cr": cr, "cc": cc, "done": done}
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        cell_h, cell_w = 20, 18
        rr = jnp.clip((rows - 25) // cell_h, 0, 7).astype(jnp.int32)
        cc = jnp.clip((cols - 8) // cell_w, 0, 7).astype(jnp.int32)
        v = g["board"][rr, cc]
        in_board = (rows >= 25) & (rows < 185) & (cols >= 8) & (cols < 152)
        frame = jnp.where(in_board, 60.0, 20.0)
        inner = ((rows - 25) % cell_h > 3) & ((cols - 8) % cell_w > 3)
        frame = jnp.where(in_board & inner & (v == 1), 255.0, frame)
        frame = jnp.where(in_board & inner & (v == -1), 120.0, frame)
        cur = in_board & (rr == g["cr"]) & (cc == g["cc"]) & ~inner
        return jnp.where(cur, 200.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray * 0.4, gray, gray * 0.4])


class OthelloEnv(ArcadeEnv):
    GAME_CLS = OthelloGame


# ---------------------------------------------------------------------------
# TicTacToe3d: the real 4x4x4 game — 76 winning lines, greedy drone.
# ---------------------------------------------------------------------------


def _ttt3d_lines() -> np.ndarray:
    """[76, 4] cell indices (z*16+y*4+x) of every 4-in-a-row line."""
    lines = []
    rng = range(4)
    # Axis lines.
    for a in rng:
        for b in rng:
            lines.append([(a, b, x) for x in rng])
            lines.append([(a, x, b) for x in rng])
            lines.append([(x, a, b) for x in rng])
    # Plane diagonals.
    for a in rng:
        lines.append([(a, x, x) for x in rng])
        lines.append([(a, x, 3 - x) for x in rng])
        lines.append([(x, a, x) for x in rng])
        lines.append([(x, a, 3 - x) for x in rng])
        lines.append([(x, x, a) for x in rng])
        lines.append([(x, 3 - x, a) for x in rng])
    # Space diagonals.
    lines.append([(x, x, x) for x in rng])
    lines.append([(x, x, 3 - x) for x in rng])
    lines.append([(x, 3 - x, x) for x in rng])
    lines.append([(3 - x, x, x) for x in rng])
    idx = [[z * 16 + y * 4 + x for z, y, x in ln] for ln in lines]
    arr = np.asarray(idx, np.int32)
    assert arr.shape == (76, 4)
    return arr


_TTT_LINES = _ttt3d_lines()


class TicTacToe3dGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        return {
            "cells": jnp.zeros((64,), jnp.int32),  # +1 me, -1 drone
            "cur": jnp.int32(0),
            "result": jnp.int32(0),  # 0 playing, +1 win, -1 loss, 2 draw
        }

    def lives(self, g):
        return jnp.int32(1)

    def over(self, g):
        return g["result"] != 0

    @staticmethod
    def _won(cells, who):
        lines = cells[jnp.asarray(_TTT_LINES)]  # [76, 4]
        return jnp.any(jnp.all(lines == who, axis=1))

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        # Cursor walks the flattened 64-cell rack: left/right = x,
        # up/down = y, FIRE+up/down = layer.
        cur = g["cur"]
        x, y, z = cur % 4, (cur // 4) % 4, cur // 16
        x = jnp.clip(x + right.astype(jnp.int32) - left.astype(jnp.int32),
                     0, 3)
        y = jnp.clip(
            y + (down & ~fire).astype(jnp.int32)
            - (up & ~fire).astype(jnp.int32), 0, 3,
        )
        z = jnp.clip(
            z + (down & fire).astype(jnp.int32)
            - (up & fire).astype(jnp.int32), 0, 3,
        )
        cur = z * 16 + y * 4 + x
        empty = g["cells"][cur] == 0
        place = fire & ~up & ~down & empty
        cells = jnp.where(
            place, g["cells"].at[cur].set(1), g["cells"]
        )
        my_win = self._won(cells, 1)
        # Drone: complete its own 3-line, else block mine, else first
        # empty (line-table greedy).
        lv = cells[jnp.asarray(_TTT_LINES)]
        own3 = (jnp.sum(lv == -1, 1) == 3) & (jnp.sum(lv == 0, 1) == 1)
        blk3 = (jnp.sum(lv == 1, 1) == 3) & (jnp.sum(lv == 0, 1) == 1)

        def line_slot(mask):
            li = jnp.argmax(mask)
            slot = jnp.argmax(cells[jnp.asarray(_TTT_LINES)[li]] == 0)
            return jnp.asarray(_TTT_LINES)[li, slot], jnp.any(mask)

        w_cell, w_any = line_slot(own3)
        b_cell, b_any = line_slot(blk3)
        f_cell = jnp.argmax(cells == 0)
        d_cell = jnp.where(w_any, w_cell, jnp.where(b_any, b_cell, f_cell))
        d_turn = place & ~my_win & jnp.any(cells == 0)
        cells = jnp.where(d_turn, cells.at[d_cell].set(-1), cells)
        d_win = self._won(cells, -1)
        drawn = ~jnp.any(cells == 0) & ~my_win & ~d_win
        result = jnp.where(
            my_win, 1, jnp.where(d_win, -1, jnp.where(drawn, 2, 0))
        )
        reward = jnp.where(result == 1, 1.0, 0.0) - jnp.where(
            result == -1, 1.0, 0.0
        )
        g2 = {"cells": cells, "cur": cur, "result": result}
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 15.0, jnp.float32)
        # Four 4x4 layers stacked vertically.
        layer = jnp.clip((rows - 10) // 48, 0, 3).astype(jnp.int32)
        yy = jnp.clip(((rows - 10) % 48) // 11, 0, 3).astype(jnp.int32)
        xx = jnp.clip((cols - 35) // 23, 0, 3).astype(jnp.int32)
        in_rack = (
            (rows >= 10) & (rows < 202) & (cols >= 35) & (cols < 127)
            & (((rows - 10) % 48) < 44)
        )
        cell = layer * 16 + yy * 4 + xx
        v = g["cells"][cell]
        frame = jnp.where(in_rack, 50.0, frame)
        inner = (((rows - 10) % 48) % 11 > 2) & ((cols - 35) % 23 > 3)
        frame = jnp.where(in_rack & inner & (v == 1), 255.0, frame)
        frame = jnp.where(in_rack & inner & (v == -1), 140.0, frame)
        cur = in_rack & (cell == g["cur"]) & ~inner
        return jnp.where(cur, 220.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray, gray * 0.5])


class TicTacToe3dEnv(ArcadeEnv):
    GAME_CLS = TicTacToe3dGame


# ---------------------------------------------------------------------------
# Backgammon: hit-and-race variant — 4 checkers a side on a 16-point
# track, real dice, hits send the opponent's checker to the bar
# (start); no doubling cube or bear-off subtleties (documented).
# ---------------------------------------------------------------------------

_BG_TRACK = 16
_BG_MEN = 4


class BackgammonGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        return {
            "mine": jnp.zeros((_BG_MEN,), jnp.int32),   # points 0..16
            "theirs": jnp.zeros((_BG_MEN,), jnp.int32),
            "die": jax.random.randint(key, (), 1, 7),
            "sel": jnp.int32(0),
            "won": jnp.int32(0),
        }

    def lives(self, g):
        return jnp.int32(1)

    def over(self, g):
        return g["won"] != 0

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        sel = (
            g["sel"] + right.astype(jnp.int32) - left.astype(jnp.int32)
        ) % _BG_MEN
        ks = jax.random.split(key, 3)
        # FIRE moves the selected checker by the die.
        move = fire & (g["mine"][sel] < _BG_TRACK)
        target = jnp.minimum(g["mine"][sel] + g["die"], _BG_TRACK)
        mine = jnp.where(
            (jnp.arange(_BG_MEN) == sel) & move, target, g["mine"]
        )
        # Hit: their checker on the same point (mirrored track) goes
        # back to their start.
        their_pos = _BG_TRACK - g["theirs"]
        hit = move & (their_pos == target)
        theirs = jnp.where(hit, 0, g["theirs"])
        reward = jnp.where(jnp.any(hit), 5.0, 0.0)
        # Drone turn: its own die, advances its furthest-back checker,
        # hitting back the same way.
        d_die = jax.random.randint(ks[0], (), 1, 7)
        d_sel = jnp.argmin(theirs)
        d_target = jnp.minimum(theirs[d_sel] + d_die, _BG_TRACK)
        theirs = jnp.where(
            (jnp.arange(_BG_MEN) == d_sel) & move, d_target, theirs
        )
        my_pos_on_their_track = _BG_TRACK - mine
        d_hit = move & (my_pos_on_their_track == d_target)
        mine = jnp.where(d_hit, 0, mine)
        reward = reward - jnp.where(jnp.any(d_hit), 5.0, 0.0)
        die = jnp.where(move, jax.random.randint(ks[1], (), 1, 7),
                        g["die"])
        i_won = jnp.all(mine >= _BG_TRACK)
        they_won = jnp.all(theirs >= _BG_TRACK)
        won = jnp.where(i_won, 1, jnp.where(they_won, -1, 0))
        reward = reward + jnp.where(i_won, 100.0, 0.0) - jnp.where(
            they_won, 100.0, 0.0
        )
        g2 = {
            "mine": mine, "theirs": theirs, "die": die, "sel": sel,
            "won": won,
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        frame = jnp.full((RAW_H, RAW_W), 30.0, jnp.float32)
        # Points as triangles (columns).
        pt = jnp.clip(cols // 10, 0, _BG_TRACK).astype(jnp.int32)
        stripe = (pt % 2 == 0) & (rows > 40) & (rows < 180)
        frame = jnp.where(stripe, 55.0, frame)
        for i in range(_BG_MEN):
            x = g["mine"][i].astype(jnp.float32) * 10.0 + 5.0
            m = (
                (jnp.abs(rows - (160.0 - 10.0 * i)) < 5)
                & (jnp.abs(cols - x) < 4)
            )
            v = jnp.where(g["sel"] == i, 255.0, 220.0)
            frame = jnp.where(m, v, frame)
            tx = (_BG_TRACK - g["theirs"][i]).astype(jnp.float32) * 10.0 + 5.0
            t = (
                (jnp.abs(rows - (60.0 + 10.0 * i)) < 5)
                & (jnp.abs(cols - tx) < 4)
            )
            frame = jnp.where(t, 130.0, frame)
        # Die pips.
        die = (rows < 20) & (cols < g["die"].astype(jnp.float32) * 12.0)
        return jnp.where(die, 200.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.8, gray * 0.55])


class BackgammonEnv(ArcadeEnv):
    GAME_CLS = BackgammonGame


# ---------------------------------------------------------------------------
# VideoCheckers: men-only draughts on the dark squares — diagonal
# steps, jumps capture, greedy drone (no kings/multi-jumps,
# documented).
# ---------------------------------------------------------------------------


class VideoCheckersGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        board = jnp.zeros((8, 8), jnp.int32)
        rr = jnp.arange(8)[:, None]
        cc = jnp.arange(8)[None, :]
        dark = (rr + cc) % 2 == 1
        board = jnp.where(dark & (rr < 3), -1, board)   # drone, moves down
        board = jnp.where(dark & (rr > 4), 1, board)    # player, moves up
        return {
            "board": board,
            "cr": jnp.int32(5), "cc": jnp.int32(0),
            "dir": jnp.int32(0),  # chosen move dir: 1 = up-left, 2 = up-right
            "done": jnp.bool_(False),
        }

    def lives(self, g):
        return jnp.int32(1)

    def over(self, g):
        return g["done"]

    @staticmethod
    def _try_move(board, r, c, dr, dc, me):
        """Apply step-or-jump from (r,c) toward (dr,dc); returns
        (board', moved, captured)."""
        r1, c1 = r + dr, c + dc
        r2, c2 = r + 2 * dr, c + 2 * dc
        in1 = (r1 >= 0) & (r1 < 8) & (c1 >= 0) & (c1 < 8)
        in2 = (r2 >= 0) & (r2 < 8) & (c2 >= 0) & (c2 < 8)
        rr1, cc1 = jnp.clip(r1, 0, 7), jnp.clip(c1, 0, 7)
        rr2, cc2 = jnp.clip(r2, 0, 7), jnp.clip(c2, 0, 7)
        own = board[r, c] == me
        step_ok = own & in1 & (board[rr1, cc1] == 0)
        jump_ok = (
            own & in2 & (board[rr1, cc1] == -me) & (board[rr2, cc2] == 0)
        )
        b_step = board.at[r, c].set(0).at[rr1, cc1].set(me)
        b_jump = (
            board.at[r, c].set(0).at[rr1, cc1].set(0).at[rr2, cc2].set(me)
        )
        out = jnp.where(jump_ok, b_jump, jnp.where(step_ok, b_step, board))
        return out, step_ok | jump_ok, jump_ok

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        cr = jnp.clip(
            g["cr"] + down.astype(jnp.int32) - up.astype(jnp.int32), 0, 7
        )
        cc = jnp.clip(
            g["cc"] + right.astype(jnp.int32) - left.astype(jnp.int32),
            0, 7,
        )
        # FIRE+LEFT = move up-left, FIRE+RIGHT = move up-right.
        dc = jnp.where(left, -1, jnp.where(right, 1, 0))
        board, moved, captured = self._try_move(
            g["board"], cr, cc, -1, dc, 1
        )
        do = fire & (dc != 0)
        board = jnp.where(do, board, g["board"])
        moved = moved & do
        captured = captured & do
        reward = jnp.where(captured, 10.0, 0.0)
        # Drone: first jump found, else first step (scan the board).
        best_b = board
        found = jnp.zeros((), bool)
        got_jump = jnp.zeros((), bool)
        for r in range(8):
            for c in range(8):
                for dc2 in (-1, 1):
                    nb, mv, cap = self._try_move(board, r, c, 1, dc2, -1)
                    take = moved & mv & (
                        (cap & ~got_jump) | (~found)
                    )
                    best_b = jnp.where(take, nb, best_b)
                    found = found | (moved & mv)
                    got_jump = got_jump | (moved & cap)
        board = jnp.where(moved, best_b, board)
        p_cnt = jnp.sum(board == 1)
        d_cnt = jnp.sum(board == -1)
        reward = reward - jnp.where(
            d_cnt < jnp.sum(g["board"] == -1), 0.0, 0.0
        ) - jnp.where(p_cnt < jnp.sum(g["board"] == 1), 10.0, 0.0)
        reach = jnp.any(board[0] == 1) | (d_cnt == 0)
        fall = jnp.any(board[7] == -1) | (p_cnt == 0)
        done = reach | fall
        reward = reward + jnp.where(reach, 100.0, 0.0) - jnp.where(
            fall, 100.0, 0.0
        )
        g2 = {
            "board": board, "cr": cr, "cc": cc,
            "dir": g["dir"], "done": done,
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        ch, cw = 20, 18
        rr = jnp.clip((rows - 25) // ch, 0, 7).astype(jnp.int32)
        cc = jnp.clip((cols - 8) // cw, 0, 7).astype(jnp.int32)
        in_b = (rows >= 25) & (rows < 185) & (cols >= 8) & (cols < 152)
        dark = (rr + cc) % 2 == 1
        frame = jnp.where(in_b & dark, 70.0, jnp.where(in_b, 110.0, 20.0))
        v = g["board"][rr, cc]
        inner = ((rows - 25) % ch > 3) & ((cols - 8) % cw > 3)
        frame = jnp.where(in_b & inner & (v == 1), 250.0, frame)
        frame = jnp.where(in_b & inner & (v == -1), 160.0, frame)
        cur = in_b & (rr == g["cr"]) & (cc == g["cc"]) & ~inner
        return jnp.where(cur, 220.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.5, gray * 0.3])


class VideoCheckersEnv(ArcadeEnv):
    GAME_CLS = VideoCheckersGame


# ---------------------------------------------------------------------------
# VideoChess: capture-the-king with exact piece MOVEMENT (pawn fwd/
# diag-capture, N/B/R/Q/K geometry incl. slider blocking); no check/
# castling/en passant rules — capture the king to win (documented).
# ---------------------------------------------------------------------------

# Piece codes: 0 empty, 1 P, 2 N, 3 B, 4 R, 5 Q, 6 K (negative = drone).
_CH_BACK = np.asarray([4, 2, 3, 5, 6, 3, 2, 4], np.int32)


def _legal_dest(board, r, c, tr, tc, me):
    """Is (r,c) -> (tr,tc) a legal movement for ``me``'s piece there?

    Exact movement geometry with slider blocking; ignores check."""
    piece = board[r, c] * me  # >0 if my piece
    dst = board[tr, tc] * me
    dr, dc = tr - r, tc - c
    adr, adc = jnp.abs(dr), jnp.abs(dc)
    own_src = piece > 0
    not_own_dst = dst <= 0
    moving = (adr + adc) > 0
    # Path clear for sliders (scan up to 6 intermediate squares).
    steps = jnp.maximum(adr, adc)
    sr = jnp.sign(dr)
    sc = jnp.sign(dc)
    clear = jnp.ones((), bool)
    for i in range(1, 7):
        mr = r + sr * i
        mc = c + sc * i
        on_path = (i < steps)
        inb = (mr >= 0) & (mr < 8) & (mc >= 0) & (mc < 8)
        occ = board[jnp.clip(mr, 0, 7), jnp.clip(mc, 0, 7)] != 0
        clear = clear & ~(on_path & inb & occ)
    straight = ((dr == 0) | (dc == 0)) & clear
    diagonal = (adr == adc) & clear
    knight = ((adr == 2) & (adc == 1)) | ((adr == 1) & (adc == 2))
    king = (adr <= 1) & (adc <= 1)
    pawn_fwd = (dc == 0) & (dr == -me) & (board[tr, tc] == 0)
    pawn_cap = (adc == 1) & (dr == -me) & (dst < 0)
    ok = jnp.where(
        piece == 1, pawn_fwd | pawn_cap, jnp.where(
            piece == 2, knight, jnp.where(
                piece == 3, diagonal & (adr == adc), jnp.where(
                    piece == 4, straight & ((dr == 0) | (dc == 0)),
                    jnp.where(
                        piece == 5, straight | diagonal, jnp.where(
                            piece == 6, king, jnp.zeros((), bool)
                        ))))))
    return own_src & not_own_dst & moving & ok


_PIECE_VAL = np.asarray([0, 1, 3, 3, 5, 9, 100], np.int32)


class VideoChessGame(ArcadeGame):
    action_set_size = 18
    has_fire = True

    def init(self, key):
        board = jnp.zeros((8, 8), jnp.int32)
        back = jnp.asarray(_CH_BACK)
        board = board.at[0].set(-back).at[1].set(-1)
        board = board.at[7].set(back).at[6].set(1)
        return {
            "board": board,
            "cr": jnp.int32(6), "cc": jnp.int32(4),
            "sr": jnp.int32(-1), "sc": jnp.int32(-1),  # selected square
            "result": jnp.int32(0),
        }

    def lives(self, g):
        return jnp.int32(1)

    def over(self, g):
        return g["result"] != 0

    def tick(self, g, action, key):
        over0 = self.over(g)
        up, down, left, right, fire = _joy(action)
        cr = jnp.clip(
            g["cr"] + down.astype(jnp.int32) - up.astype(jnp.int32), 0, 7
        )
        cc = jnp.clip(
            g["cc"] + right.astype(jnp.int32) - left.astype(jnp.int32),
            0, 7,
        )
        board = g["board"]
        has_sel = g["sr"] >= 0
        # FIRE on own piece selects; FIRE elsewhere with a selection
        # attempts the move.
        on_own = board[cr, cc] > 0
        select = fire & on_own
        legal = jnp.where(
            has_sel,
            _legal_dest(board, jnp.clip(g["sr"], 0, 7),
                        jnp.clip(g["sc"], 0, 7), cr, cc, 1),
            jnp.zeros((), bool),
        )
        attempt = fire & has_sel & ~on_own
        moved = attempt & legal
        cap = board[cr, cc]
        b_moved = (
            board.at[jnp.clip(g["sr"], 0, 7),
                     jnp.clip(g["sc"], 0, 7)].set(0).at[cr, cc].set(
                board[jnp.clip(g["sr"], 0, 7), jnp.clip(g["sc"], 0, 7)]
            )
        )
        board = jnp.where(moved, b_moved, board)
        reward = jnp.where(
            moved, jnp.asarray(_PIECE_VAL)[jnp.abs(cap)].astype(
                jnp.float32
            ), 0.0
        )
        king_taken = moved & (cap == -6)
        sr = jnp.where(select, cr, jnp.where(moved, -1, g["sr"]))
        sc = jnp.where(select, cc, jnp.where(moved, -1, g["sc"]))
        # Drone: highest-value legal move (captures by piece value,
        # quiet moves value 0) — the 64x64 legality/value tables are
        # built with vmap, one traced body instead of 4096 unrolled.
        idx = jnp.arange(64)

        def one_src(src):
            def one_dst(dst):
                ok = _legal_dest(
                    board, src // 8, src % 8, dst // 8, dst % 8, -1
                )
                tgt = board[dst // 8, dst % 8]
                val = jnp.where(
                    tgt > 0,
                    jnp.asarray(_PIECE_VAL)[jnp.clip(tgt, 0, 6)], 0
                )
                return jnp.where(ok, val, -1)

            return jax.vmap(one_dst)(idx)

        vals = jax.vmap(one_src)(idx)  # [64, 64], -1 = illegal
        flat = jnp.argmax(vals)
        bsrc, bdst = flat // 64, flat % 64
        best_val = vals[bsrc, bdst]
        nb = board.at[bsrc // 8, bsrc % 8].set(0).at[
            bdst // 8, bdst % 8
        ].set(board[bsrc // 8, bsrc % 8])
        board2 = jnp.where(moved & (best_val >= 0), nb, board)
        my_king_gone = jnp.all(board2 != 6)
        result = jnp.where(
            king_taken, 1, jnp.where(my_king_gone & moved, -1, 0)
        )
        reward = reward + jnp.where(result == 1, 100.0, 0.0) - jnp.where(
            result == -1, 100.0, 0.0
        )
        g2 = {
            "board": board2, "cr": cr, "cc": cc, "sr": sr, "sc": sc,
            "result": result,
        }
        g2, reward = _freeze_when(over0, g, g2, reward)
        return g2, reward, self.over(g2)

    def render_gray(self, g):
        rows, cols = _grids()
        ch, cw = 20, 18
        rr = jnp.clip((rows - 25) // ch, 0, 7).astype(jnp.int32)
        cc = jnp.clip((cols - 8) // cw, 0, 7).astype(jnp.int32)
        in_b = (rows >= 25) & (rows < 185) & (cols >= 8) & (cols < 152)
        light = (rr + cc) % 2 == 0
        frame = jnp.where(in_b & light, 95.0, jnp.where(in_b, 55.0, 20.0))
        v = g["board"][rr, cc]
        # Piece height encodes type; brightness encodes side.
        ph = jnp.abs(v).astype(jnp.float32) * 2.0
        inner = (
            ((rows - 25) % ch > (16 - ph)) & ((cols - 8) % cw > 4)
            & ((cols - 8) % cw < 14)
        )
        frame = jnp.where(in_b & inner & (v > 0), 250.0, frame)
        frame = jnp.where(in_b & inner & (v < 0), 150.0, frame)
        selm = (
            in_b & (rr == g["sr"]) & (cc == g["sc"])
            & (((rows - 25) % ch < 2) | ((cols - 8) % cw < 2))
        )
        frame = jnp.where(selm, 255.0, frame)
        cur = (
            in_b & (rr == g["cr"]) & (cc == g["cc"])
            & (((rows - 25) % ch < 3) | ((cols - 8) % cw < 3))
        )
        return jnp.where(cur, 210.0, frame)

    def render_rgb(self, g):
        gray = self.render_gray(g)
        return jnp.stack([gray, gray * 0.9, gray * 0.6])


class VideoChessEnv(ArcadeEnv):
    GAME_CLS = VideoChessGame
