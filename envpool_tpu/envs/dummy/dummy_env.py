"""Dummy env — the machinery-exercising fixture.

Behavioral reference: ``envpool/dummy/dummy_envpool.h:25-104``, which
documents the EnvFns contract (config keys, obs/info fields, multi-player
specs) and is used to test the engine without a simulator.  This analog
exercises: env-specific config, multiple obs/info keys, per-player fields
under ``max_num_players``, deterministic state evolution, and the action
echo the reference's tests assert on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.env import EnvOut, TpuEnv
from ...core.specs import ArraySpec


class DummyEnv(TpuEnv):
    DEFAULT_CONFIG = {"state_num": 10, "action_num": 6}

    def state_spec(self):
        n = int(self.config["state_num"])
        spec = {
            "obs:raw": ArraySpec(jnp.int32, (n,)),
            "obs:dyn": ArraySpec(jnp.float32, (-1, 2)),  # per-player
            "info:queue_size": ArraySpec(jnp.int32, ()),
        }
        return spec

    def action_spec(self):
        return {
            "action": ArraySpec(
                jnp.int32,
                (),
                0,
                int(self.config["action_num"]) - 1,
                is_discrete=True,
            )
        }

    def _obs(self, state):
        n = int(self.config["state_num"])
        p = self.max_num_players
        raw = jnp.arange(n, dtype=jnp.int32) + state["counter"]
        dyn_shape = (2,) if p == 1 else (p, 2)
        dyn = jnp.full(dyn_shape, state["last_action"], jnp.float32)
        return {
            "obs:raw": raw,
            "obs:dyn": dyn,
            "info:queue_size": state["counter"],
        }

    def reset_env(self, key):
        state = {"counter": jnp.int32(0), "last_action": jnp.int32(0)}
        return state, self._obs(state)

    def step_env(self, state, action, key):
        new_state = {
            "counter": state["counter"] + 1,
            "last_action": action.astype(jnp.int32),
        }
        return EnvOut(
            state=new_state,
            obs=self._obs(new_state),
            # Reward echoes the action (dummy contract: observable I/O).
            reward=action.astype(jnp.float32),
            terminated=new_state["counter"]
            >= int(self.config["state_num"]),
        )
