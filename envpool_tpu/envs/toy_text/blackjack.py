"""Blackjack — TPU-native functional implementation.

Behavioral reference: ``envpool/toy_text/blackjack.h:34-160``.  Cards are
``min(10, U[1,13])`` with replacement.  State tracks raw hand sums, ace
presence, hand sizes and the two first cards of each hand (enough for the
natural check) instead of the reference's variable-length vectors (static
shapes for XLA).  The reference's obs quirk is preserved: ``obs[2]`` is
*ace present*, not gym's "usable ace" (``blackjack.h:117-126``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec


def _draw(key):
    return jnp.minimum(10, jax.random.randint(key, (), 1, 14, jnp.int32))


def _sum_hand(raw_sum, has_ace):
    """Raw sum, counting the usable ace as +10 when it fits."""
    return jnp.where(has_ace & (raw_sum + 10 <= 21), raw_sum + 10, raw_sum)


def _score(raw_sum, has_ace):
    s = _sum_hand(raw_sum, has_ace)
    return jnp.where(s > 21, 0, s)


class BlackjackEnv(TpuEnv):
    DEFAULT_CONFIG = {"natural": False, "sab": True}

    def state_spec(self):
        return {"obs": ArraySpec(jnp.int32, (3,), 0, 31)}

    def action_spec(self):
        return {"action": ArraySpec(jnp.int32, (), 0, 1, is_discrete=True)}

    def _obs(self, p_sum, p_ace, d0):
        return {
            "obs": jnp.stack(
                [
                    _sum_hand(p_sum, p_ace),
                    d0,
                    p_ace.astype(jnp.int32),
                ]
            ).astype(jnp.int32)
        }

    def reset_env(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        p0, p1, d0, d1 = _draw(k1), _draw(k2), _draw(k3), _draw(k4)
        state = {
            "p_sum": p0 + p1,
            "p_ace": (p0 == 1) | (p1 == 1),
            "p_cards": jnp.int32(2),
            "p_first": jnp.stack([p0, p1]),
            "d_sum": d0 + d1,
            "d_ace": (d0 == 1) | (d1 == 1),
            "d_first": jnp.stack([d0, d1]),
        }
        return state, self._obs(state["p_sum"], state["p_ace"], d0)

    def step_env(self, state, action, key):
        natural_cfg = bool(self.config["natural"])
        sab = bool(self.config["sab"])

        def is_natural(first):
            return ((first[0] == 1) & (first[1] == 10)) | (
                (first[0] == 10) & (first[1] == 1)
            )

        # --- hit branch -----------------------------------------------------
        hit_key, dealer_key = jax.random.split(key)
        card = _draw(hit_key)
        hit_sum = state["p_sum"] + card
        hit_ace = state["p_ace"] | (card == 1)
        hit_bust = _sum_hand(hit_sum, hit_ace) > 21

        # --- stick branch: dealer plays out ---------------------------------
        def dealer_body(i, carry):
            d_sum, d_ace = carry
            draw_more = _sum_hand(d_sum, d_ace) < 17
            c = _draw(jax.random.fold_in(dealer_key, i))
            d_sum = jnp.where(draw_more, d_sum + c, d_sum)
            d_ace = jnp.where(draw_more, d_ace | (c == 1), d_ace)
            return d_sum, d_ace

        # Raw sum gains ≥1 per draw; from min 2 to ≥17 needs ≤ 16 draws.
        d_sum, d_ace = jax.lax.fori_loop(
            0, 16, dealer_body, (state["d_sum"], state["d_ace"])
        )
        p_score = _score(state["p_sum"], state["p_ace"])
        d_score = _score(d_sum, d_ace)
        stick_reward = (
            (p_score > d_score).astype(jnp.float32)
            - (p_score < d_score).astype(jnp.float32)
        )
        p_nat = (state["p_cards"] == 2) & is_natural(state["p_first"])
        d_nat = is_natural(state["d_first"])
        if sab:
            stick_reward = jnp.where(p_nat & ~d_nat, 1.0, stick_reward)
        elif natural_cfg:
            stick_reward = jnp.where(
                p_nat & (stick_reward == 1.0), 1.5, stick_reward
            )

        hit = action != 0
        new_state = {
            "p_sum": jnp.where(hit, hit_sum, state["p_sum"]),
            "p_ace": jnp.where(hit, hit_ace, state["p_ace"]),
            "p_cards": jnp.where(hit, state["p_cards"] + 1, state["p_cards"]),
            "p_first": state["p_first"],
            "d_sum": jnp.where(hit, state["d_sum"], d_sum),
            "d_ace": jnp.where(hit, state["d_ace"], d_ace),
            "d_first": state["d_first"],
        }
        reward = jnp.where(
            hit, jnp.where(hit_bust, -1.0, 0.0), stick_reward
        ).astype(jnp.float32)
        terminated = jnp.where(hit, hit_bust, True)
        return EnvOut(
            state=new_state,
            obs=self._obs(
                new_state["p_sum"], new_state["p_ace"], state["d_first"][0]
            ),
            reward=reward,
            terminated=terminated,
        )
