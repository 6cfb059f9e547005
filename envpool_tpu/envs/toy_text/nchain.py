"""NChain — TPU-native functional implementation.

Behavioral reference: ``envpool/toy_text/nchain.h:34-108``.  5-state chain;
with prob 0.2 the action flips; action 1 ("return") gives +2 and jumps to
state 0; action 0 advances (reward 0) until state 4 which yields +10.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec


class NChainEnv(TpuEnv):
    DEFAULT_CONFIG = {}

    def state_spec(self):
        return {"obs": ArraySpec(jnp.int32, (), 0, 4, is_discrete=True)}

    def action_spec(self):
        return {"action": ArraySpec(jnp.int32, (), 0, 1, is_discrete=True)}

    def reset_env(self, key):
        s = jnp.int32(0)
        return s, {"obs": s}

    def step_env(self, state, action, key):
        flip = jax.random.uniform(key, ()) < 0.2
        act = jnp.where(flip, 1 - action, action)
        back = act != 0
        at_end = state >= 4
        reward = jnp.where(
            back, 2.0, jnp.where(at_end, 10.0, 0.0)
        ).astype(jnp.float32)
        new_s = jnp.where(back, 0, jnp.where(at_end, state, state + 1))
        new_s = new_s.astype(jnp.int32)
        return EnvOut(
            state=new_s,
            obs={"obs": new_s},
            reward=reward,
            terminated=jnp.bool_(False),
        )
