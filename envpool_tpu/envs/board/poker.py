"""Kuhn poker — TPU-native functional implementation (pgx-class).

Behavioral reference: the reference's pgx family registers
``KuhnPoker-v1``.  Standard Kuhn poker: 3 cards (J=0, Q=1, K=2), each
player antes 1 and gets one card; actions 0=pass(check/fold), 1=bet(call).
Terminal payoffs follow the classic game tree; rewards are per-player in
multi-player mode, mover-perspective otherwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec


class KuhnPokerEnv(TpuEnv):
    DEFAULT_CONFIG = {}

    def state_spec(self):
        return {
            # Own card one-hot + betting history (p0 bet?, p1 bet?, raised?)
            "obs:card": ArraySpec(jnp.int32, (), 0, 2),
            "obs:history": ArraySpec(jnp.int32, (3,), 0, 1),
            "obs:current_player": ArraySpec(
                jnp.int32, (), 0, 1, is_discrete=True
            ),
        }

    def action_spec(self):
        if self.max_num_players > 1:
            return {
                "action": ArraySpec(jnp.int32, (-1,), 0, 1, is_discrete=True)
            }
        return {"action": ArraySpec(jnp.int32, (), 0, 1, is_discrete=True)}

    def _obs(self, st):
        player = st["player"]
        cards = st["cards"]
        return {
            "obs:card": cards[player],
            "obs:history": st["history"],
            "obs:current_player": player,
        }

    def reset_env(self, key):
        perm = jax.random.permutation(key, 3)
        st = {
            "cards": perm[:2].astype(jnp.int32),  # [p0 card, p1 card]
            "history": jnp.zeros(3, jnp.int32),   # [p0 acted bet, p1 acted bet, turn count]
            "player": jnp.int32(0),
        }
        return st, self._obs(st)

    def step_env(self, state, action, key):
        if self.max_num_players > 1:
            action = action[state["player"]]
        bet = action == 1
        turn = state["history"][2]
        p = state["player"]
        cards = state["cards"]
        p0_bet = state["history"][0] == 1
        # Game-tree resolution:
        #   t0: p0 pass|bet
        #   t1: p1 responds. pass/pass → showdown 1; bet after pass → t2;
        #       pass after bet → p0 wins 1 (fold); bet/bet → showdown 2.
        #   t2: p0 responds to p1's bet: pass → p1 wins 1; bet → showdown 2.
        showdown_winner = jnp.where(cards[0] > cards[1], 0, 1)
        t0 = turn == 0
        t1 = turn == 1
        t2 = turn >= 2

        terminal_t1_pp = t1 & ~p0_bet & ~bet        # check-check
        terminal_t1_fold = t1 & p0_bet & ~bet       # p1 folds
        terminal_t1_call = t1 & p0_bet & bet        # call
        continue_t1 = t1 & ~p0_bet & bet            # p1 bets after check
        terminal_t2_fold = t2 & ~bet                # p0 folds
        terminal_t2_call = t2 & bet                 # p0 calls

        terminated = (
            terminal_t1_pp
            | terminal_t1_fold
            | terminal_t1_call
            | terminal_t2_fold
            | terminal_t2_call
        )
        # Winner's profit: +1 on check-check and folds (just the ante),
        # +2 on called showdowns.
        pot = jnp.where(terminal_t1_call | terminal_t2_call, 2, 1)
        winner = jnp.where(
            terminal_t1_fold,
            0,
            jnp.where(terminal_t2_fold, 1, showdown_winner),
        )
        history = state["history"]
        history = history.at[0].set(
            jnp.where(t0, bet.astype(jnp.int32), history[0])
        )
        history = history.at[1].set(
            jnp.where(t1, bet.astype(jnp.int32), history[1])
        )
        history = history.at[2].set(turn + 1)
        next_player = jnp.where(terminated, p, 1 - p).astype(jnp.int32)
        st = {"cards": cards, "history": history, "player": next_player}

        win_amount = pot.astype(jnp.float32)
        if self.max_num_players > 1:
            rewards = jnp.zeros(self.max_num_players, jnp.float32)
            rewards = jnp.where(
                terminated,
                rewards.at[winner].set(win_amount).at[1 - winner].set(
                    -win_amount
                ),
                rewards,
            )
            reward = rewards
        else:
            # Mover's perspective.
            reward = jnp.where(
                terminated,
                jnp.where(winner == p, win_amount, -win_amount),
                0.0,
            ).astype(jnp.float32)
        return EnvOut(
            state=st,
            obs=self._obs(st),
            reward=reward,
            terminated=terminated,
        )
