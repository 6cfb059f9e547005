"""Composable pure wrappers over the functional env contract.

The reference fuses its wrapper logic (frame stack, max-pool, reward clip,
episodic life) directly into each C++ env (``envpool/atari/atari_env.h:
202-346``, ``envpool/mujoco/frame_stack.h``).  Here wrappers are *pure
function transformers* over ``reset_env``/``step_env`` — they compose, stay
jit/vmap-compatible, and XLA fuses them into the env step for free.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..core.env import EnvOut, TpuEnv
from ..core.specs import ArraySpec

__all__ = [
    "Wrapper",
    "FrameStack",
    "RewardClip",
    "TransformObservation",
    "TransformReward",
]


class Wrapper(TpuEnv):
    """Base wrapper: delegates everything to ``inner``."""

    def __init__(self, inner: TpuEnv):
        self.inner = inner
        super().__init__(inner.config)

    @property
    def reward_threshold(self):
        return self.inner.reward_threshold

    def state_spec(self):
        return self.inner.state_spec()

    def action_spec(self):
        return self.inner.action_spec()

    def reset_env(self, key):
        return self.inner.reset_env(key)

    def step_env(self, state, action, key):
        return self.inner.step_env(state, action, key)


class FrameStack(Wrapper):
    """Stack the last ``stack_num`` observations along a leading axis.

    Reference behavior (``atari_env.h:308-346``): at reset the single fresh
    frame fills all slots (``push_all``); at step the newest frame is pushed
    and the oldest dropped.  The stack lives in the env state pytree; the
    per-step cost is a roll of references, not a copy of history.
    """

    def __init__(self, inner: TpuEnv, stack_num: int, obs_key: str = "obs"):
        super().__init__(inner)
        self.stack_num = stack_num
        self.obs_key = obs_key

    def state_spec(self):
        spec = dict(self.inner.state_spec())
        base = spec[self.obs_key]
        spec[self.obs_key] = ArraySpec(
            base.dtype,
            (self.stack_num, *base.shape),
            base.minimum,
            base.maximum,
            base.is_discrete,
        )
        return spec

    def reset_env(self, key):
        state, obs = self.inner.reset_env(key)
        frame = obs[self.obs_key]
        stack = jnp.broadcast_to(
            frame[None], (self.stack_num, *frame.shape)
        ).astype(frame.dtype)
        new_obs = dict(obs)
        new_obs[self.obs_key] = stack
        return {"inner": state, "stack": stack}, new_obs

    def step_env(self, state, action, key):
        out = self.inner.step_env(state["inner"], action, key)
        frame = out.obs[self.obs_key]
        stack = jnp.concatenate(
            [state["stack"][1:], frame[None]], axis=0
        )
        new_obs = dict(out.obs)
        new_obs[self.obs_key] = stack
        return EnvOut(
            state={"inner": out.state, "stack": stack},
            obs=new_obs,
            reward=out.reward,
            terminated=out.terminated,
            discount=out.discount,
            truncated=out.truncated,
        )


class TransformReward(Wrapper):
    """Apply ``fn`` to the reward."""

    def __init__(self, inner: TpuEnv, fn: Callable[[jax.Array], jax.Array]):
        super().__init__(inner)
        self._fn = fn

    def step_env(self, state, action, key):
        out = self.inner.step_env(state, action, key)
        out.reward = self._fn(out.reward).astype(jnp.float32)
        return out


class RewardClip(TransformReward):
    """Sign-clip rewards to {-1, 0, 1} (``atari_env.h:259-266``).

    The unclipped reward is exposed as ``info:reward``, matching the
    reference's ``info:reward`` state key (``atari_env.h:70``).
    """

    def __init__(self, inner: TpuEnv):
        super().__init__(inner, jnp.sign)

    def state_spec(self):
        spec = dict(self.inner.state_spec())
        spec.setdefault("info:reward", ArraySpec(jnp.float32, ()))
        return spec

    def reset_env(self, key):
        state, obs = self.inner.reset_env(key)
        obs = dict(obs)
        obs.setdefault("info:reward", jnp.float32(0.0))
        return state, obs

    def step_env(self, state, action, key):
        out = self.inner.step_env(state, action, key)
        info_reward = out.reward
        out.reward = jnp.sign(out.reward).astype(jnp.float32)
        out.obs = dict(out.obs)
        out.obs.setdefault("info:reward", info_reward)
        return out


class NormalizeObs(Wrapper):
    """Running observation normalization (Welford, carried in env state).

    Stats are tracked **per env** (each env's stream normalizes itself);
    under the usual i.i.d. env batch the per-env statistics converge to the
    same values as a shared accumulator.  ``epsilon`` and clipping follow
    the common gym NormalizeObservation semantics.
    """

    def __init__(
        self,
        inner: TpuEnv,
        obs_key: str = "obs",
        epsilon: float = 1e-8,
        clip: float = 10.0,
    ):
        super().__init__(inner)
        self.obs_key = obs_key
        self.epsilon = epsilon
        self.clip = clip

    def _norm(self, stats, obs):
        count, mean, m2 = stats
        count = count + 1.0
        delta = obs - mean
        mean = mean + delta / count
        m2 = m2 + delta * (obs - mean)
        var = m2 / jnp.maximum(count - 1.0, 1.0)
        normed = jnp.clip(
            (obs - mean) / jnp.sqrt(var + self.epsilon),
            -self.clip,
            self.clip,
        )
        return (count, mean, m2), normed

    def reset_env(self, key):
        state, obs = self.inner.reset_env(key)
        raw = obs[self.obs_key]
        stats = (
            jnp.float32(0.0),
            jnp.zeros_like(raw),
            jnp.zeros_like(raw),
        )
        stats, normed = self._norm(stats, raw)
        new_obs = dict(obs)
        new_obs[self.obs_key] = normed
        return {"inner": state, "stats": stats}, new_obs

    def reset_env_from(self, state, key, full):
        inner_state, obs = self.inner.reset_env_from(
            state["inner"], key, full
        )
        # Keep running stats across episodes (gym semantics).
        stats, normed = self._norm(state["stats"], obs[self.obs_key])
        new_obs = dict(obs)
        new_obs[self.obs_key] = normed
        return {"inner": inner_state, "stats": stats}, new_obs

    def step_env(self, state, action, key):
        out = self.inner.step_env(state["inner"], action, key)
        stats, normed = self._norm(state["stats"], out.obs[self.obs_key])
        new_obs = dict(out.obs)
        new_obs[self.obs_key] = normed
        return EnvOut(
            state={"inner": out.state, "stats": stats},
            obs=new_obs,
            reward=out.reward,
            terminated=out.terminated,
            discount=out.discount,
            truncated=out.truncated,
        )


class TransformObservation(Wrapper):
    """Apply ``fn`` to one obs key (spec must be supplied if shape changes)."""

    def __init__(
        self,
        inner: TpuEnv,
        fn: Callable[[jax.Array], jax.Array],
        obs_key: str = "obs",
        new_spec: ArraySpec | None = None,
    ):
        super().__init__(inner)
        self._fn = fn
        self.obs_key = obs_key
        self._new_spec = new_spec

    def state_spec(self):
        spec = dict(self.inner.state_spec())
        if self._new_spec is not None:
            spec[self.obs_key] = self._new_spec
        return spec

    def _apply(self, obs: dict[str, Any]) -> dict[str, Any]:
        obs = dict(obs)
        obs[self.obs_key] = self._fn(obs[self.obs_key])
        return obs

    def reset_env(self, key):
        state, obs = self.inner.reset_env(key)
        return state, self._apply(obs)

    def step_env(self, state, action, key):
        out = self.inner.step_env(state, action, key)
        out.obs = self._apply(out.obs)
        return out
