"""Backgammon — TPU-native functional implementation (pgx-class).

Behavioral reference: ``envpool/pgx/backgammon.h`` (itself a C++ port of
the PGX backgammon game).  Board layout: 28 ints in the *current
player's* perspective — points 0..23 (own checkers positive, moving
toward 23), 24 = own bar, 25 = opponent bar, 26 = own borne-off,
27 = opponent borne-off.  Actions: 156 = 26 sources x 6 dice;
``action // 6``: 0 = pass, 1 = bar, 2..25 = points 0..23;
``action % 6 + 1`` = die pips.  The board flips every turn
(``FlipBoard``, backgammon.h:63-74); rewards are win score
(1 / 2 gammon / 3 backgammon) for the winner, negated for the loser,
and ±3 on an illegal move (backgammon.h:196-210).

TPU-native notes: legality for all 156 actions is one masked array
program (no per-action loop at runtime); dice re-rolls avoid the C++
rejection loop by sampling distinct ordered pairs directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec

_INIT_BOARD = jnp.asarray(
    [2, 0, 0, 0, 0, -5, 0, -3, 0, 0, 0, 5, -5, 0,
     0, 0, 3, 0, 5, 0, 0, 0, 0, -2, 0, 0, 0, 0], jnp.int32)
_BAR, _OPP_BAR, _OFF, _OPP_OFF = 24, 25, 26, 27
_A = jnp.arange(156)
_SRC_CODE = _A // 6                    # 0 pass, 1 bar, 2..25 points
_DIE = _A % 6 + 1                      # pips 1..6
_SRC = jnp.where(_SRC_CODE == 1, _BAR, _SRC_CODE - 2)   # -2 for pass rows
_TO = _SRC + _DIE
_TGT = jnp.where(_SRC >= 24, _DIE - 1,
                 jnp.where((_TO >= 0) & (_TO <= 23), _TO, _OFF))


def _legal_mask(board, allow_die):
    """Legal-action mask [156] (backgammon.h:85-117, 327-350).

    ``allow_die`` [6] marks pips that may still be played; if nothing is
    legal, the six pass actions open up.
    """
    src_c = jnp.clip(_SRC, 0, 27)
    tgt_c = jnp.clip(_TGT, 0, 27)
    exists = board[src_c] >= 1
    is_open = board[tgt_c] >= -1
    to_point = (_TGT >= 0) & (_TGT <= 23) & (_SRC >= 0)
    point_legal = jnp.where(
        _SRC >= 24, exists & is_open,
        exists & is_open & (board[_BAR] == 0))
    any_fwd = (board[:24] > 0).any()
    rear = jnp.where(any_fwd, 24 - jnp.argmax(board[:24] > 0), -76)
    all_home = (15 - board[_OFF]) == jnp.sum(
        jnp.clip(board[18:24], 0, 15))
    dist = 24 - _SRC
    off_legal = ((_SRC >= 0) & (_SRC < 24) & exists & all_home
                 & ((dist == _DIE) | ((rear <= _DIE) & (rear == dist))))
    legal = (jnp.where(to_point, point_legal, off_legal)
             & allow_die[_DIE - 1] & (_SRC_CODE != 0))
    none = ~legal.any()
    return legal | (none & (_A < 6))


def _move(board, action):
    """Apply a checker move (backgammon.h:119-127); pass rows are
    guarded by the caller."""
    src = jnp.where(_SRC_CODE[action] == 1, _BAR, _SRC_CODE[action] - 2)
    tgt = _TGT[action]
    hit = board[tgt] == -1
    board = board.at[_OPP_BAR].add(jnp.where(hit, -1, 0))
    board = board.at[src].add(-1)
    board = board.at[tgt].add(jnp.where(hit, 2, 1))
    return board


def _flip(board):
    out = -board[23::-1]
    return jnp.concatenate([
        out, -board[_OPP_BAR:_OPP_BAR + 1], -board[_BAR:_BAR + 1],
        -board[_OPP_OFF:_OPP_OFF + 1], -board[_OFF:_OFF + 1]])


def _playable_from_dice(dice):
    doubles = dice[0] == dice[1]
    return jnp.where(
        doubles,
        jnp.full(4, dice[0], jnp.int32),
        jnp.asarray([dice[0], dice[1], -1, -1], jnp.int32))


def _allow_from_playable(playable):
    return (playable[:, None] == jnp.arange(6)[None, :]).any(0)


def _roll(key):
    d0 = jax.random.randint(key, (2,), 0, 6, jnp.int32)
    return d0


def _roll_distinct(key):
    """Uniform over distinct ordered pairs (= the C++ rejection loop)."""
    k0, k1 = jax.random.split(key)
    d0 = jax.random.randint(k0, (), 0, 6, jnp.int32)
    d1 = jax.random.randint(k1, (), 0, 5, jnp.int32)
    d1 = d1 + (d1 >= d0)
    return jnp.stack([d0, d1])


class BackgammonEnv(TpuEnv):
    DEFAULT_CONFIG = {}

    def state_spec(self):
        return {
            "obs": ArraySpec(jnp.int32, (-1, 34)),
            "info:board": ArraySpec(jnp.int32, (28,)),
            "info:current_player": ArraySpec(jnp.int32, (), 0, 1),
            "info:dice": ArraySpec(jnp.int32, (2,), 0, 5),
            "info:legal_action_mask": ArraySpec(jnp.bool_, (156,)),
            "info:playable_dice": ArraySpec(jnp.int32, (4,), -1, 5),
            "info:played_dice_num": ArraySpec(jnp.int32, (), 0, 4),
            "info:turn": ArraySpec(jnp.int32, (), 0, 1),
        }

    def action_spec(self):
        if self.max_num_players > 1:
            return {
                "action": ArraySpec(jnp.int32, (-1,), 0, 155,
                                    is_discrete=True)
            }
        return {"action": ArraySpec(jnp.int32, (), 0, 155,
                                    is_discrete=True)}

    def _obs(self, st):
        dice_count = jnp.sum(
            (st["playable"][:, None] == jnp.arange(6)[None, :])
            & (st["playable"][:, None] >= 0), 0).astype(jnp.int32)
        rows = []
        for player in range(2):
            mine = player == st["player"]
            rows.append(jnp.concatenate(
                [st["board"], jnp.where(mine, dice_count, 0)]))
        obs = jnp.stack(rows)
        if self.max_num_players <= 1:
            obs = obs[0]
        return {
            "obs": obs,
            "info:board": st["board"],
            "info:current_player": st["player"],
            "info:dice": st["dice"],
            "info:legal_action_mask": st["legal"],
            "info:playable_dice": st["playable"],
            "info:played_dice_num": st["played"],
            "info:turn": st["turn"],
        }

    def reset_env(self, key):
        k_p, k_d = jax.random.split(key)
        dice = _roll_distinct(k_d)
        playable = _playable_from_dice(dice)
        board = _INIT_BOARD
        st = {
            "board": board,
            "dice": dice,
            "playable": playable,
            "played": jnp.int32(0),
            "player": jax.random.randint(k_p, (), 0, 2, jnp.int32),
            "turn": jnp.where(dice[1] > dice[0], 1, 0).astype(jnp.int32),
            "legal": _legal_mask(board, _allow_from_playable(playable)),
        }
        return st, self._obs(st)

    def step_env(self, state, action, key):
        if self.max_num_players > 1:
            # Reference reads row 0 of the player rows
            # (backgammon.h:197 ``action["action"][0]``).
            action = jnp.reshape(action, (-1,))[0]
        action = jnp.clip(jnp.reshape(action, ()).astype(jnp.int32),
                          0, 155)
        st = dict(state)
        loser = st["player"]
        illegal = ~st["legal"][action]
        is_pass = _SRC_CODE[action] == 0

        # -- UpdateByAction (skipped for pass) --
        board = jnp.where(is_pass, st["board"], _move(st["board"], action))
        doubles = st["dice"][0] == st["dice"][1]
        slot = jnp.clip(3 - st["played"], 0, 3)
        playable_dbl = st["playable"].at[slot].set(-1)
        die0 = action % 6
        playable_non = jnp.where(st["playable"] == die0, -1,
                                 st["playable"])
        playable = jnp.where(
            is_pass, st["playable"],
            jnp.where(doubles, playable_dbl, playable_non))
        played = st["played"] + jnp.where(is_pass, 0, 1)

        # -- win check --
        all_off = board[_OFF] == 15
        gammon = board[_OPP_OFF] == 0
        backgmn = gammon & (jnp.sum(board[18:24]) != 0)
        score = (1 + gammon.astype(jnp.int32)
                 + backgmn.astype(jnp.int32)).astype(jnp.float32)

        # -- turn end --
        turn_end = (playable == -1).all() | is_pass
        change = ~all_off & turn_end
        flipped = _flip(board)
        new_dice = _roll(key)
        new_playable = _playable_from_dice(new_dice)

        board_out = jnp.where(change, flipped, board)
        dice_out = jnp.where(change, new_dice, st["dice"])
        playable_out = jnp.where(change, new_playable, playable)
        played_out = jnp.where(change, 0, played)
        player_out = jnp.where(change, 1 - st["player"], st["player"])
        turn_out = jnp.where(change, (st["turn"] + 1) % 2, st["turn"])
        allow = jnp.where(
            change,
            _allow_from_playable(new_playable),
            _allow_from_playable(playable))
        legal_out = _legal_mask(board_out, allow)

        terminated = all_off | illegal
        legal_out = jnp.where(terminated, jnp.ones(156, bool), legal_out)

        # rewards: win score to current player / -score to opponent;
        # illegal: -3 to the mover, +3 to the other.
        win_rewards = jnp.full(2, -score).at[loser].set(score)
        ill_rewards = jnp.full(2, 3.0).at[loser].set(-3.0)
        rewards = jnp.where(
            illegal, ill_rewards,
            jnp.where(all_off, win_rewards, jnp.zeros(2)))
        rewards = rewards.astype(jnp.float32)

        st = {
            "board": board_out, "dice": dice_out,
            "playable": playable_out, "played": played_out,
            "player": player_out, "turn": turn_out, "legal": legal_out,
        }
        reward = rewards if self.max_num_players > 1 else rewards[loser]
        return EnvOut(
            state=st, obs=self._obs(st), reward=reward,
            terminated=terminated)
