"""Leduc hold'em — TPU-native functional implementation (pgx-class).

Behavioral reference: the reference's pgx family registers
``LeducHoldem-v1`` (``envpool/pgx/registration.py``, 2-player).

Rules (standard Leduc, as in OpenSpiel/pgx): 6-card deck (J/Q/K × 2
suits, ranks 0/1/2).  Each player antes 1 and receives one private card.
Betting round 1 (raise size 2, max 2 raises), then one public card is
revealed, betting round 2 (raise size 4, max 2 raises).  Actions:
0 = call/check, 1 = raise, 2 = fold.  At showdown a private card pairing
the public card wins; otherwise the higher rank wins; equal ranks split
(reward 0).  Winner gains the loser's committed chips.

Fold is legal only when facing an outstanding raise; raise is legal while
fewer than 2 raises have happened this round.  For robustness under
unmasked random policies (the pgx core asserts legality instead), an
illegal action is treated as a call — documented, money-neutral, and
keeps trajectories well-defined; ``info:legal_moves`` carries the mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec

_RAISE = (2, 4)  # raise size per round


class LeducHoldemEnv(TpuEnv):
    DEFAULT_CONFIG = {}

    def state_spec(self):
        return {
            "obs:card": ArraySpec(jnp.int32, (), 0, 2),
            "obs:public_card": ArraySpec(jnp.int32, (), 0, 3),  # 3 = hidden
            "obs:chips": ArraySpec(jnp.int32, (2,), 0, 13),  # [mine, opp]
            "obs:round": ArraySpec(jnp.int32, (), 0, 1),
            "obs:current_player": ArraySpec(
                jnp.int32, (), 0, 1, is_discrete=True
            ),
            "info:legal_moves": ArraySpec(jnp.bool_, (3,)),
        }

    def action_spec(self):
        if self.max_num_players > 1:
            return {
                "action": ArraySpec(jnp.int32, (-1,), 0, 2, is_discrete=True)
            }
        return {"action": ArraySpec(jnp.int32, (), 0, 2, is_discrete=True)}

    @staticmethod
    def _legal(st):
        p = st["player"]
        facing = st["bets"][1 - p] > st["bets"][p]
        return jnp.stack(
            [jnp.bool_(True), st["raises"] < 2, facing]
        )

    def _obs(self, st):
        p = st["player"]
        return {
            "obs:card": st["cards"][p],
            "obs:public_card": jnp.where(
                st["round"] > 0, st["cards"][2], jnp.int32(3)
            ),
            "obs:chips": jnp.stack([st["bets"][p], st["bets"][1 - p]]),
            "obs:round": st["round"],
            "obs:current_player": p,
            "info:legal_moves": self._legal(st),
        }

    def reset_env(self, key):
        # Deal 3 of the 6 cards; rank = card // 2.
        deck = jax.random.permutation(key, 6)[:3] // 2
        st = {
            "cards": deck.astype(jnp.int32),  # [p0, p1, public]
            "bets": jnp.ones(2, jnp.int32),   # antes
            "round": jnp.int32(0),
            "raises": jnp.int32(0),
            "acted": jnp.int32(0),
            "player": jnp.int32(0),
        }
        return st, self._obs(st)

    def step_env(self, state, action, key):
        p = state["player"]
        if self.max_num_players > 1:
            action = action[p]
        legal = self._legal(state)
        action = jnp.where(legal[jnp.clip(action, 0, 2)], action, 0)

        cards, bets = state["cards"], state["bets"]
        rnd, raises, acted = state["round"], state["raises"], state["acted"]
        is_fold = action == 2
        is_raise = action == 1
        raise_amt = jnp.where(rnd == 0, _RAISE[0], _RAISE[1])

        new_bet_p = jnp.where(
            is_raise, bets[1 - p] + raise_amt, jnp.maximum(bets[p], bets[1 - p])
        )
        new_bets = bets.at[p].set(jnp.where(is_fold, bets[p], new_bet_p))
        new_raises = raises + is_raise.astype(jnp.int32)
        new_acted = acted + 1

        # A call (not the round-opening check) closes the betting round.
        round_over = ~is_fold & ~is_raise & (acted >= 1)
        to_showdown = round_over & (rnd == 1)
        to_round2 = round_over & (rnd == 0)
        terminated = is_fold | to_showdown

        # Showdown: pair with public > rank; equal ranks split.
        pub = cards[2]
        s0 = jnp.where(cards[0] == pub, 10 + cards[0], cards[0])
        s1 = jnp.where(cards[1] == pub, 10 + cards[1], cards[1])
        showdown_winner = jnp.where(s0 > s1, 0, jnp.where(s1 > s0, 1, -1))
        winner = jnp.where(is_fold, 1 - p, showdown_winner)

        next_rnd = jnp.where(to_round2, 1, rnd).astype(jnp.int32)
        next_player = jnp.where(
            terminated, p, jnp.where(to_round2, 0, 1 - p)
        ).astype(jnp.int32)
        st = {
            "cards": cards,
            "bets": new_bets,
            "round": next_rnd,
            "raises": jnp.where(to_round2, 0, new_raises).astype(jnp.int32),
            "acted": jnp.where(to_round2, 0, new_acted).astype(jnp.int32),
            "player": next_player,
        }

        loser = 1 - winner
        win_amount = jnp.where(
            winner < 0, 0, new_bets[jnp.maximum(loser, 0)]
        ).astype(jnp.float32)
        if self.max_num_players > 1:
            rewards = jnp.zeros(self.max_num_players, jnp.float32)
            w = jnp.maximum(winner, 0)
            rewards = jnp.where(
                terminated & (winner >= 0),
                rewards.at[w].set(win_amount).at[1 - w].set(-win_amount),
                rewards,
            )
            reward = rewards
        else:
            reward = jnp.where(
                terminated & (winner >= 0),
                jnp.where(winner == p, win_amount, -win_amount),
                0.0,
            ).astype(jnp.float32)
        return EnvOut(
            state=st,
            obs=self._obs(st),
            reward=reward,
            terminated=terminated,
        )
