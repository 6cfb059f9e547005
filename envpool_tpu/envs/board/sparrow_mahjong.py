"""Sparrow Mahjong (suzume-jong) — TPU-native functional implementation.

Behavioral reference: ``envpool/pgx/sparrow_mahjong.h`` (EnvPool's C++
port of PGX suzume-jong).  Three players, 44 tiles of 11 types (4 each);
each type 1..9 has one red tile (ids ``4k`` except 36), the red dragon
(type 10) is all red.  Five-tile hands, one draw per turn, the only
action is which tile type to discard (11 actions).  Wins: tsumo on the
drawn tile, or ron on a discard (score >= 5, not furiten); the last
wall tile is the dora indicator and is never drawn — exhausting the
wall is a tie.  Scoring uses the reference's 160-entry winning-hand
cache (base-5 hand encodings with base/yaku scores), +2 dealer bonus,
dora and red-dora bonuses (skipped for yaku >= 10; six reds = super
red, yaku 20); rewards are scores / 26 per player id.

TPU-native notes: the winning-hand lookup is a vectorized membership /
nearest-entry scan over the constant cache; the reference's
redeal-until-playable reset loop (sparrow_mahjong.h:222-227) is a
``lax.while_loop`` over fresh deals.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec

_T = 11          # tile types
_N = 44          # tiles
_P = 3           # players
_RIVER = 10
_MAX_SCORE = 26.0

_WIN_HANDS = np.asarray([
    18, 78, 90, 378, 390, 450, 778, 790, 850, 1150, 1550, 1878, 1890,
    1950, 2250, 2650, 3878, 3890, 3950, 4250, 4650, 5750, 7750, 9378,
    9390, 9450, 9750, 10150, 11250, 13250, 19378, 19390, 19450, 19750,
    20150, 21250, 23250, 28750, 38750, 46878, 46890, 46950, 47250,
    47650, 48750, 50750, 56250, 66250, 96878, 96890, 96950, 97250,
    97650, 98750, 100750, 106250, 116250, 143750, 193750, 234378,
    234390, 234450, 234750, 235150, 236250, 238250, 243750, 253750,
    281250, 331250, 484378, 484390, 484450, 484750, 485150, 486250,
    488250, 493750, 503750, 531250, 581250, 718750, 968750, 1171878,
    1171890, 1171950, 1172250, 1172650, 1173750, 1175750, 1181250,
    1191250, 1218750, 1268750, 1406250, 1656250, 2421878, 2421890,
    2421950, 2422250, 2422650, 2423750, 2425750, 2431250, 2441250,
    2468750, 2518750, 2656250, 2906250, 3593750, 4843750, 5859378,
    5859390, 5859450, 5859750, 5860150, 5861250, 5863250, 5868750,
    5878750, 5906250, 5956250, 6093750, 6343750, 7031250, 8281250,
    12109378, 12109390, 12109450, 12109750, 12110150, 12111250,
    12113250, 12118750, 12128750, 12156250, 12206250, 12343750,
    12593750, 13281250, 14531250, 17968750, 24218750, 29296878,
    29296890, 29296950, 29297250, 29297650, 29298750, 29300750,
    29306250, 29316250, 29343750, 29393750, 29531250, 29781250,
    30468750, 31718750, 35156250, 41406250], np.int64)

_BASE_SCORES = np.asarray([
    4, 4, 4, 4, 4, 4, 3, 3, 3, 3, 2, 4, 4, 4, 4, 3, 3, 3, 3, 3, 2, 3,
    2, 4, 4, 4, 4, 3, 4, 3, 3, 3, 3, 3, 2, 3, 2, 3, 2, 4, 4, 4, 4, 3,
    4, 3, 4, 3, 3, 3, 3, 3, 2, 3, 2, 3, 2, 3, 2, 4, 4, 4, 4, 3, 4, 3,
    4, 3, 4, 3, 3, 3, 3, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 4, 4, 4, 4, 3,
    4, 3, 4, 3, 4, 3, 4, 3, 3, 3, 3, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3,
    2, 4, 4, 4, 4, 3, 4, 3, 4, 3, 4, 3, 4, 3, 4, 3, 3, 3, 3, 3, 2, 3,
    2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 4, 4, 4, 4, 3, 4, 3, 4, 3, 4, 3,
    4, 3, 4, 3, 4, 3], np.int32)

_YAKU_SCORES = np.asarray([
    15, 15, 15, 0, 10, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1,
    0, 1, 1, 0, 10, 0, 10, 0, 1, 1, 0, 0, 0, 1, 0, 1, 1, 1, 1, 0,
    0, 0, 1, 0, 1, 1, 1, 1, 0, 0, 0, 1, 0, 1, 1, 1, 1, 1, 1, 0,
    10, 0, 10, 0, 1, 1, 10, 1, 1, 1, 0, 0, 0, 1, 0, 1, 1, 1, 1, 1,
    1, 1, 1, 0, 10, 0, 10, 0, 1, 1, 10, 1, 1, 1, 10, 1, 0, 10, 0, 10,
    0, 1, 1, 10, 1, 1, 1, 10, 1, 10, 10, 0, 10, 0, 10, 0, 1, 1, 10, 1,
    1, 1, 10, 1, 10, 10, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 15, 15, 15, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    np.int32)

_BASE5 = np.asarray([9765625, 1953125, 390625, 78125, 15625, 3125, 625,
                     125, 25, 5, 1], np.int64)
_IS_RED = np.asarray([(i % 4 == 0 and i != 36) or i >= 40
                      for i in range(_N)])


def _to_base5(hand):
    return jnp.sum(hand.astype(jnp.int64) * jnp.asarray(_BASE5), -1)


def _is_completed(hand):
    return (_to_base5(hand)[..., None]
            == jnp.asarray(_WIN_HANDS)).any(-1)


def _hand_to_score(hand):
    """(base, yaku) of the nearest cache entry
    (sparrow_mahjong.h:121-134)."""
    value = _to_base5(hand)
    dist = jnp.abs(jnp.asarray(_WIN_HANDS) - value[..., None])
    ix = jnp.argmin(dist, -1)
    return jnp.asarray(_BASE_SCORES)[ix], jnp.asarray(_YAKU_SCORES)[ix]


def _hands_to_score(hands, n_red, dora, last_discard):
    """Per-seat potential score [3] (sparrow_mahjong.h:312-336)."""
    discard = jnp.where(last_discard >= 0, last_discard, 10)
    hand_sum = hands.sum(-1)
    add = jax.nn.one_hot(discard, _T, dtype=hands.dtype)
    full = hands + jnp.where((hand_sum == 5)[:, None], add[None, :], 0)
    base, yaku = _hand_to_score(full)
    n_doras = full[:, ...].take(dora, axis=-1) if False else full[
        jnp.arange(_P), jnp.full(_P, dora)]
    n_red_doras = n_red.sum(-1)
    yaku = jnp.where(n_red_doras >= 6, 20, yaku)
    return jnp.where(yaku >= 10, base + yaku,
                     base + yaku + n_doras + n_red_doras)


class SparrowMahjongEnv(TpuEnv):
    DEFAULT_CONFIG = {}

    def state_spec(self):
        return {
            "obs": ArraySpec(jnp.bool_, (-1, 11, 15)),
            "info:current_player": ArraySpec(jnp.int32, (), 0, 2),
            "info:dora": ArraySpec(jnp.int32, (), 0, 10),
            "info:draw_ix": ArraySpec(jnp.int32, (), 0, 44),
            "info:hands": ArraySpec(jnp.int32, (3, 11), 0, 6),
            "info:is_red_in_river": ArraySpec(jnp.bool_, (3, 10)),
            "info:last_discard": ArraySpec(jnp.int32, (), -1, 10),
            "info:legal_action_mask": ArraySpec(jnp.bool_, (11,)),
            "info:n_red_in_hands": ArraySpec(jnp.int32, (3, 11), 0, 4),
            "info:rivers": ArraySpec(jnp.int32, (3, 10), -1, 10),
            "info:scores": ArraySpec(jnp.int32, (3,)),
            "info:shuffled_players": ArraySpec(jnp.int32, (3,), 0, 2),
            "info:turn": ArraySpec(jnp.int32, ()),
            "info:wall": ArraySpec(jnp.int32, (44,), 0, 43),
        }

    def action_spec(self):
        if self.max_num_players > 1:
            return {"action": ArraySpec(jnp.int32, (-1,), 0, 10,
                                        is_discrete=True)}
        return {"action": ArraySpec(jnp.int32, (), 0, 10,
                                    is_discrete=True)}

    # -- helpers --

    def _draw(self, st):
        """Draw for the current turn + discard mask
        (sparrow_mahjong.h:296-310)."""
        seat = st["turn"] % _P
        tid = st["wall"][st["draw_ix"]]
        tile = tid // 4
        hands = st["hands"].at[seat, tile].add(1)
        red = jnp.asarray(_IS_RED)[tid]
        n_red = st["n_red"].at[seat, tile].add(red.astype(jnp.int32))
        legal = hands[seat] > 0
        return {**st, "hands": hands, "n_red": n_red,
                "draw_ix": st["draw_ix"] + 1, "legal": legal}

    def _deal(self, key):
        k_p, k_w = jax.random.split(key)
        shuffled = jax.random.permutation(k_p, _P).astype(jnp.int32)
        wall = jax.random.permutation(k_w, _N).astype(jnp.int32)
        tiles = wall[: _P * 5] // 4
        seats = jnp.repeat(jnp.arange(_P), 5)
        hands = jnp.zeros((_P, _T), jnp.int32).at[seats, tiles].add(1)
        reds = jnp.asarray(_IS_RED)[wall[: _P * 5]]
        n_red = jnp.zeros((_P, _T), jnp.int32).at[seats, tiles].add(
            reds.astype(jnp.int32))
        st = {
            "wall": wall, "hands": hands, "n_red": n_red,
            "rivers": jnp.full((_P, _RIVER), -1, jnp.int32),
            "red_river": jnp.zeros((_P, _RIVER), bool),
            "shuffled": shuffled,
            "turn": jnp.int32(0),
            "last_discard": jnp.int32(-1),
            "dora": wall[-1] // 4,
            "draw_ix": jnp.int32(_P * 5),
            "scores": jnp.zeros(_P, jnp.int32),
            "legal": jnp.zeros(_T, bool),
            "player": shuffled[0],
        }
        st = self._draw(st)
        # Immediate deal-in tsumo forces a redeal (the C++ do/while).
        bad = _is_completed(st["hands"][0])
        return st, bad

    def reset_env(self, key):
        st, bad = self._deal(key)

        def cond(carry):
            _, _, bad = carry
            return bad

        def body(carry):
            k, _, _ = carry
            k2 = jax.random.fold_in(k, 1)
            st2, bad2 = self._deal(k2)
            return k2, st2, bad2

        _, st, _ = jax.lax.while_loop(cond, body, (key, st, bad))
        return st, self._obs(st)

    # -- observation (sparrow_mahjong.h:470-506) --

    def _obs_player(self, st, player_id):
        seat = jnp.argmax(st["shuffled"] == player_id)
        obs = jnp.zeros((_T, 15), bool)
        counts = st["hands"][seat]
        obs = obs.at[:, 0:4].set(
            counts[:, None] >= jnp.arange(1, 5)[None, :])
        obs = obs.at[:, 4].set(st["n_red"][seat] >= 1)
        obs = obs.at[st["dora"], 5].set(True)
        for offset in range(_P):
            rp = (seat + offset) % _P
            river = st["rivers"][rp]
            hit = (river[:, None]
                   == jnp.arange(_T)[None, :]) & (river >= 0)[:, None]
            obs = obs.at[:, 6 + offset].max(hit.any(0))
        for offset in (1, 2):
            rp = (seat + offset) % _P
            river = st["rivers"][rp]
            count = (river >= 0).sum()
            for back in (1, 2, 3):
                idx = count - back
                tile = river[jnp.clip(idx, 0, _RIVER - 1)]
                ok = (idx >= 0) & (tile >= 0)
                feat = 9 + (offset - 1) * 3 + (back - 1)
                obs = obs.at[jnp.clip(tile, 0, _T - 1), feat].max(ok)
        return obs

    def _obs(self, st):
        obs = jnp.stack([self._obs_player(st, p) for p in range(_P)])
        if self.max_num_players <= 1:
            obs = obs[0]
        return {
            "obs": obs,
            "info:current_player": st["player"],
            "info:dora": st["dora"],
            "info:draw_ix": st["draw_ix"],
            "info:hands": st["hands"],
            "info:is_red_in_river": st["red_river"],
            "info:last_discard": st["last_discard"],
            "info:legal_action_mask": st["legal"],
            "info:n_red_in_hands": st["n_red"],
            "info:rivers": st["rivers"],
            "info:scores": st["scores"],
            "info:shuffled_players": st["shuffled"],
            "info:turn": st["turn"],
            "info:wall": st["wall"],
        }

    # -- step --

    def step_env(self, state, action, key):
        if self.max_num_players > 1:
            action = jnp.reshape(action, (-1,))[0]
        action = jnp.clip(jnp.reshape(action, ()).astype(jnp.int32),
                          0, _T - 1)
        st = dict(state)
        loser = st["player"]
        illegal = ~st["legal"][action]
        seat = st["turn"] % _P

        # Discard (sparrow_mahjong.h:421-434).
        hands = st["hands"].at[seat, action].add(-1)
        red_disc = hands[seat, action] < st["n_red"][seat, action]
        n_red = st["n_red"].at[seat, action].add(
            -red_disc.astype(jnp.int32))
        slot = st["turn"] // _P
        rivers = st["rivers"].at[seat, slot].set(action)
        red_river = st["red_river"].at[seat, slot].set(red_disc)
        st = {**st, "hands": hands, "n_red": n_red, "rivers": rivers,
              "red_river": red_river, "last_discard": action}

        scores_pot = _hands_to_score(hands, n_red, st["dora"], action)
        # Ron (sparrow_mahjong.h:338-356).
        add = jax.nn.one_hot(action, _T, dtype=hands.dtype)
        full = hands + add[None, :]
        completed = _is_completed(full)
        furiten = (rivers == action[None, None]).any(-1)
        winners = ((jnp.arange(_P) != seat) & ~furiten
                   & (scores_pot >= 5) & completed)
        has_ron = winners.any()

        ron_scores = scores_pot.at[0].add(2)
        ron_scores = jnp.where(winners, ron_scores, 0)
        ron_scores = ron_scores.at[seat].set(-ron_scores.sum())

        tie = (_N - 1) <= st["draw_ix"]

        # Non-tied continuation: next seat draws; tsumo check.
        st_next = {**st, "turn": st["turn"] + 1}
        st_next["player"] = st["shuffled"][st_next["turn"] % _P]
        st_next = self._draw(st_next)
        nseat = st_next["turn"] % _P
        nscores = _hands_to_score(
            st_next["hands"], st_next["n_red"], st["dora"],
            st["last_discard"])
        tsumo = _is_completed(st_next["hands"][nseat])
        tsumo_scores = nscores.at[0].add(2)
        w = tsumo_scores[nseat]
        loser_pay = (w + _P - 2) // (_P - 1)
        tsumo_scores = jnp.full(_P, -loser_pay).at[nseat].set(
            loser_pay * (_P - 1))

        done = has_ron | tie | (~has_ron & ~tie & tsumo) | illegal
        seat_scores = jnp.where(
            has_ron, ron_scores,
            jnp.where(tie, jnp.zeros(_P, jnp.int32),
                      jnp.where(tsumo, tsumo_scores,
                                jnp.zeros(_P, jnp.int32))))
        # Map seat scores to player ids (RewardsFromScores).
        rewards = jnp.zeros(_P, jnp.float32).at[st["shuffled"]].set(
            seat_scores.astype(jnp.float32) / _MAX_SCORE)
        ill_rewards = jnp.full(_P, 1.0, jnp.float32).at[loser].set(-1.0)
        rewards = jnp.where(illegal, ill_rewards,
                            jnp.where(has_ron | (~tie & tsumo), rewards,
                                      jnp.zeros(_P, jnp.float32)))

        # Select continuation vs terminal state.
        cont = ~has_ron & ~tie
        out = jax.tree.map(
            lambda a, b: jnp.where(cont, b, a),
            {k: st[k] for k in st}, {k: st_next[k] for k in st})
        out["scores"] = jnp.where(done & ~illegal, seat_scores,
                                  out["scores"])
        out["legal"] = jnp.where(done, jnp.ones(_T, bool), out["legal"])

        reward = rewards if self.max_num_players > 1 else rewards[loser]
        return EnvOut(state=out, obs=self._obs(out), reward=reward,
                      terminated=done)
