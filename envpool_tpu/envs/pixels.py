"""from_pixels wrapper for physics envs (reference: registration.py:142-185).

``make(task, env_type, from_pixels=True, ...)`` wraps any physics-backed
env (anything exposing ``.model`` with a geom table and a ``qpos`` state
entry) so the observation becomes stacked on-device-rendered frames
``[stack, H, W] uint8`` (``mujoco/frame_stack.h:182-303`` semantics);
``info:*`` keys pass through unchanged.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..core.env import EnvOut, TpuEnv
from ..core.specs import ArraySpec
from ..ops.rasterize import render_scene


class PixelWrapper(TpuEnv):
    """Swap a physics env's obs for rendered pixel frames."""

    def __init__(self, inner: TpuEnv, height: int = 84, width: int = 84,
                 stack: int = 3, track_body: int = 1,
                 view_size: float = 2.0):
        super().__init__(inner.config)
        self.inner = inner
        self.height = height
        self.width = width
        self.stack = stack
        self.track_body = min(track_body, len(inner.model.body_names) - 1)
        self.view_size = view_size

    # -- specs -------------------------------------------------------------

    def state_spec(self):
        spec = {
            "obs": ArraySpec(
                jnp.uint8, (self.stack, self.height, self.width), 0, 255
            )
        }
        for k, v in self.inner.state_spec().items():
            if k.startswith("info:"):
                spec[k] = v
        return spec

    def action_spec(self):
        return self.inner.action_spec()

    # -- render ------------------------------------------------------------

    def _frame(self, qpos):
        img = render_scene(
            self.inner.model,
            qpos,
            self.height,
            self.width,
            self.track_body,
            self.view_size,
        )
        return jnp.clip(img, 0, 255).astype(jnp.uint8)

    def _obs(self, inner_obs, frames):
        out = {"obs": frames}
        for k, v in inner_obs.items():
            if k.startswith("info:"):
                out[k] = v
        return out

    # -- TpuEnv contract ---------------------------------------------------

    def reset_env(self, key):
        st, obs = self.inner.reset_env(key)
        frame = self._frame(st["qpos"])
        frames = jnp.tile(frame[None], (self.stack, 1, 1))
        return {"inner": st, "frames": frames}, self._obs(obs, frames)

    def reset_env_from(self, state, key, full):
        st, obs = self.inner.reset_env_from(state["inner"], key, full)
        frame = self._frame(st["qpos"])
        frames = jnp.tile(frame[None], (self.stack, 1, 1))
        return {"inner": st, "frames": frames}, self._obs(obs, frames)

    def step_env(self, state, action, key):
        out = self.inner.step_env(state["inner"], action, key)
        frame = self._frame(out.state["qpos"])
        frames = jnp.concatenate(
            [state["frames"][1:], frame[None]], axis=0
        )
        return EnvOut(
            state={"inner": out.state, "frames": frames},
            obs=self._obs(out.obs, frames),
            reward=out.reward,
            terminated=out.terminated,
            discount=out.discount,
            truncated=out.truncated,
        )


def wrap_from_pixels(env: TpuEnv, **kwargs: Any) -> TpuEnv:
    if not hasattr(env, "model") or env.model.geom_body is None:
        raise ValueError(
            "from_pixels requires a physics-backed env with a geom table "
            f"({type(env).__name__} has none)"
        )
    return PixelWrapper(env, **kwargs)
