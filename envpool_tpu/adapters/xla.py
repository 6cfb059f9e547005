"""Jittable functional interface: the analog of ``env.xla()``.

The reference builds ``recv/send/step`` as XLA FFI custom calls that hop
device→host→threadpool→device every step
(``envpool/core/xla.h:115-212``, ``envpool/python/xla_template.py:41-110``).
Here the pool state pytree *is* the handle, so ``step(handle, action)`` is a
plain pure function — it composes with ``jax.jit``, ``lax.scan`` and
``lax.fori_loop`` with no host crossing at all.

Usage (mirrors ``examples/xla_step.py:30-96``)::

    pool = envpool_tpu.make("CartPole-v1", env_type="gymnasium", num_envs=N)
    handle, recv, send, step = pool.xla()

    def actor_step(iter, handle):
        handle, (obs, rew, term, trunc, info) = step(handle, policy(obs))
        return handle

    handle = jax.lax.fori_loop(0, 100, actor_step, handle)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["make_xla"]


def make_xla(pool: Any):
    """Return ``(handle, recv, send, step)`` for a pool adapter."""
    engine = pool.engine
    env = engine.env
    action_keys = list(env.action_spec().keys())

    def _normalize(action):
        if isinstance(action, dict):
            flat = dict(action)
            flat.pop("env_id", None)
            flat.pop("players.env_id", None)
            return {k: jnp.asarray(flat[k]) for k in action_keys}
        if len(action_keys) != 1:
            raise ValueError(
                "bare-array action requires a single-key action spec; "
                f"this env expects {action_keys}"
            )
        spec = env.action_spec()[action_keys[0]]
        return {action_keys[0]: jnp.asarray(action).astype(spec.dtype)}

    def send(handle, action, env_id=None):
        ps, _ = handle
        tree = _normalize(action)
        if env_id is None:
            ps, ts = engine._step(ps, tree)
        else:
            ps, ts = engine._step_partial(ps, tree, jnp.asarray(env_id))
        return (ps, ts)

    def recv(handle):
        ps, ts = handle
        return (ps, ts), pool._to(ts, reset=False, return_info=True)

    def step(handle, action, env_id=None):
        return recv(send(handle, action, env_id))

    # Initial handle: current pool state + a zero timestep of the right
    # structure (never observed — the first recv follows a send).
    ts_shapes = jax.eval_shape(
        engine._reset,
        pool.pool_state,
        jnp.ones(engine.num_envs, jnp.bool_),
    )[1]
    zero_ts = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), ts_shapes
    )
    handle = (pool.pool_state, zero_ts)
    return handle, recv, send, step
