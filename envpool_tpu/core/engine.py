"""The vectorized env engine: ``jit(vmap(step))`` with fused auto-reset.

This replaces the reference's entire concurrency runtime — ``AsyncEnvPool``
worker threads, ``ActionBufferQueue`` and ``StateBufferQueue``
(``envpool/core/async_envpool.h:43-238``, ``core/state_buffer_queue.h``) —
with a single compiled XLA program per pool:

* Env state is a pytree of ``[num_envs, ...]`` arrays resident in HBM.
* One step = ``vmap`` of the env's pure ``reset_env``/``step_env`` over the
  env axis, with auto-reset *fused into the step* as an elementwise select
  (the reference decides reset lazily per dequeue via
  ``reset = force_reset || env->IsDone()``, ``core/async_envpool.h:127`` —
  identical observable semantics, zero queues).
* Buffers are donated, so stepping is allocation-free in steady state.
* The env-batch axis can be sharded over a ``jax.sharding.Mesh``; envs are
  independent, so stepping needs no collectives (the TPU answer to the
  reference's NUMA process sharding, ``benchmark/numa_test.sh``).

Common-field bookkeeping (``elapsed_step``, ``done``, ``trunc``,
``discount``, ``step_type``, ``info:env_id``) follows ``Env::Allocate``
(``envpool/core/env.h:224-256``) bit for bit:

* ``done = terminated || elapsed >= max_episode_steps`` (set on the step)
* ``trunc = done && elapsed >= max_episode_steps``
* ``discount = float(!done)`` unless the env overrides it
* ``step_type``: 0 (FIRST) on reset, 2 (LAST) when done, else 1 (MID)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp

from .env import TpuEnv

__all__ = ["PoolState", "Engine", "TimeStepDict"]

# A flat {key: batched array} timestep, common fields + env state fields,
# mirroring the reference's flat state-key list (envpool/core/env_spec.h:37-43).
TimeStepDict = dict[str, jax.Array]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PoolState:
    """Device-resident state of the whole pool (one pytree in HBM).

    This pytree *is* the XLA interface handle: where the reference threads a
    serialized C++ pointer through its custom calls
    (``envpool/core/xla_template.h:54-67``), here ``step(state, action)`` is
    natively functional and ``lax.scan``-able.
    """

    env_state: Any       # env-specific pytree, leaves [N, ...]
    key: jax.Array       # [N] PRNG keys
    elapsed: jax.Array   # [N] int32, steps since episode start
    autoreset: jax.Array  # [N] bool: episode over, reset on next step
    full_reset: jax.Array  # [N] bool: pending reset must fully restart

    @property
    def num_envs(self) -> int:
        return self.elapsed.shape[0]


def _tree_select(pred: jax.Array, on_true: Any, on_false: Any) -> Any:
    """Per-leaf select; ``pred`` broadcasts from the left (env axis)."""

    def sel(a, b):
        p = pred.reshape(pred.shape + (1,) * (a.ndim - pred.ndim))
        return jnp.where(p, a, b)

    return jax.tree_util.tree_map(sel, on_true, on_false)


def _zero_action(env: TpuEnv) -> dict[str, jax.Array]:
    """Batched all-zeros action tree (used to bootstrap rollouts)."""
    return {
        k: jnp.zeros(
            (env.num_envs, *s.static_shape(env.max_num_players)), s.dtype
        )
        for k, s in env.action_spec().items()
    }


# Engines are shared across pools with identical (env class, config,
# sharding): jit caches live on the Engine's bound closures, so sharing
# avoids recompiling the same program for every pool instance.
_ENGINE_CACHE: dict[Any, "Engine"] = {}


def _config_cache_key(config: dict[str, Any]) -> tuple:
    def freeze(v: Any):
        if isinstance(v, (list, tuple)):
            return tuple(freeze(x) for x in v)
        return v

    return tuple(sorted((k, freeze(v)) for k, v in config.items()))


class Engine:
    """Compiles and owns the pool-level step/reset functions for one env.

    All public functions are pure: ``(PoolState, ...) -> (PoolState, ts)``.
    Stateful adapters (gymnasium/dm) wrap them; the functional/XLA interface
    exposes them directly.
    """

    @classmethod
    def shared(
        cls, env: TpuEnv, sharding: jax.sharding.Sharding | None = None
    ) -> "Engine":
        key = (type(env), _config_cache_key(env.config), sharding)
        try:
            engine = _ENGINE_CACHE.get(key)
        except TypeError:  # unhashable config value — no sharing
            return cls(env, sharding)
        if engine is None:
            engine = cls(env, sharding)
            _ENGINE_CACHE[key] = engine
        return engine

    def __init__(self, env: TpuEnv, sharding: jax.sharding.Sharding | None = None):
        self.env = env
        self.num_envs = env.num_envs
        self.sharding = sharding
        self._action_keys = list(env.action_spec().keys())
        donate = {"donate_argnums": (0,)}
        self.step = jax.jit(self._step, **donate)
        self.reset = jax.jit(self._reset, **donate)
        self.step_partial = jax.jit(self._step_partial, **donate)
        self.reset_partial = jax.jit(self._reset_partial, **donate)
        self.init = jax.jit(self._init, out_shardings=sharding)

    # -- construction ------------------------------------------------------

    def _init(self) -> PoolState:
        """Initial pool state: every env 'done', pending its first reset.

        Mirrors reference envs constructing with ``done_ = true`` and
        ``elapsed_step_ = max_episode_steps + 1`` so the first dequeue
        auto-resets (e.g. ``classic_control/cartpole.h:74-77``).  The env
        state pytree is zero-initialised via ``eval_shape`` — no env code
        runs until the first (auto-)reset.
        """
        keys = self.env.keys()
        shapes = jax.eval_shape(self.env.reset_env, keys[0])[0]
        env_state = jax.tree_util.tree_map(
            lambda s: jnp.zeros((self.num_envs, *s.shape), s.dtype), shapes
        )
        return PoolState(
            env_state=env_state,
            key=keys,
            elapsed=jnp.zeros(self.num_envs, jnp.int32),
            autoreset=jnp.ones(self.num_envs, jnp.bool_),
            full_reset=jnp.ones(self.num_envs, jnp.bool_),
        )

    # -- single-env kernels (vmapped below) --------------------------------

    def _reset_one(self, key: jax.Array):
        key, sub = jax.random.split(key)
        state, obs = self.env.reset_env(sub)
        return state, key, obs

    def _step_one(
        self,
        env_state: Any,
        key: jax.Array,
        elapsed: jax.Array,
        do_reset: jax.Array,
        full_reset: jax.Array,
        action: Any,
    ):
        """One env transition with fused auto-reset (both branches + select)."""
        env = self.env
        key, sub = jax.random.split(key)
        # Reset branch (sees the terminal state for continuation semantics).
        r_state, r_obs = env.reset_env_from(env_state, sub, full_reset)
        # Step branch.
        out = env.step_env(env_state, env.single_action(action), sub)
        new_elapsed = jnp.where(do_reset, 0, elapsed + 1).astype(jnp.int32)
        time_trunc = new_elapsed >= env.max_episode_steps
        if out.truncated is not None:
            trunc_cond = time_trunc | out.truncated
        else:
            trunc_cond = time_trunc
        done_step = out.terminated | trunc_cond
        done = jnp.where(do_reset, False, done_step)
        trunc = done & trunc_cond
        reward = jnp.where(
            do_reset, jnp.zeros_like(out.reward), out.reward
        ).astype(jnp.float32)
        if out.discount is not None:
            discount_step = out.discount.astype(jnp.float32)
        else:
            discount_step = 1.0 - done_step.astype(jnp.float32)
        discount = jnp.where(do_reset, 1.0, discount_step)
        step_type = jnp.where(
            do_reset, 0, jnp.where(done, 2, 1)
        ).astype(jnp.int32)
        new_state = _tree_select(do_reset, r_state, out.state)
        obs = _tree_select(do_reset, r_obs, out.obs)
        common = {
            "elapsed_step": new_elapsed,
            "done": done,
            "reward": reward,
            "discount": discount,
            "step_type": step_type,
            "trunc": trunc,
        }
        return new_state, key, new_elapsed, done, obs, common

    # -- batched pool functions --------------------------------------------

    def _finish_ts(
        self, obs: dict, common: dict, env_id: jax.Array
    ) -> TimeStepDict:
        players = self.env.max_num_players
        env_id = env_id.astype(jnp.int32)
        players_env_id = (
            jnp.broadcast_to(env_id[:, None], (env_id.shape[0], players))
            if players > 1
            else env_id
        )
        ts: TimeStepDict = {
            "info:env_id": env_id,
            "info:players.env_id": players_env_id,
        }
        ts.update(common)
        ts.update(obs)
        return ts

    def _step(
        self,
        ps: PoolState,
        action: dict[str, jax.Array],
        force_reset: jax.Array | None = None,
    ) -> tuple[PoolState, TimeStepDict]:
        """Full-batch lockstep step (sync mode, ``batch_size == num_envs``)."""
        do_reset = ps.autoreset
        full = ps.full_reset
        if force_reset is not None:
            do_reset = do_reset | force_reset
            full = full | force_reset
        new_state, key, elapsed, done, obs, common = jax.vmap(self._step_one)(
            ps.env_state, ps.key, ps.elapsed, do_reset, full, action
        )
        new_ps = PoolState(new_state, key, elapsed, done, common["trunc"])
        env_id = jnp.arange(self.num_envs, dtype=jnp.int32)
        return new_ps, self._finish_ts(obs, common, env_id)

    def _reset(
        self, ps: PoolState, mask: jax.Array
    ) -> tuple[PoolState, TimeStepDict]:
        """Force-reset the masked envs; others are untouched (state & RNG).

        The analog of ``AsyncEnvPool::Reset(env_ids)`` enqueueing force-reset
        actions (``envpool/core/async_envpool.h:224-237``).  Rows outside the
        mask carry placeholder values — adapters gather only masked rows.
        """
        r_state, r_key, r_obs = jax.vmap(self._reset_one)(ps.key)
        new_ps = PoolState(
            env_state=_tree_select(mask, r_state, ps.env_state),
            key=_tree_select(mask, r_key, ps.key),
            elapsed=jnp.where(mask, 0, ps.elapsed).astype(jnp.int32),
            autoreset=jnp.where(mask, False, ps.autoreset),
            full_reset=jnp.where(mask, False, ps.full_reset),
        )
        n = self.num_envs
        zeros_f = jnp.zeros(n, jnp.float32)
        zeros_i = jnp.zeros(n, jnp.int32)
        common = {
            "elapsed_step": zeros_i,
            "done": jnp.zeros(n, jnp.bool_),
            "reward": zeros_f,
            "discount": jnp.ones(n, jnp.float32),
            "step_type": zeros_i,  # StepType.FIRST
            "trunc": jnp.zeros(n, jnp.bool_),
        }
        env_id = jnp.arange(n, dtype=jnp.int32)
        return new_ps, self._finish_ts(r_obs, common, env_id)

    def _reset_partial(
        self, ps: PoolState, env_id: jax.Array
    ) -> tuple[PoolState, TimeStepDict]:
        """Force-reset only ``env_id`` rows (gather/reset/scatter).

        Unlike :meth:`_reset` (which computes a full-batch reset and masks),
        this only runs the reset kernel over the addressed rows — the right
        program for ``options={"reset_mask"}`` partial resets on big pools.
        """
        take = functools.partial(jnp.take, indices=env_id, axis=0)
        r_state, r_key, r_obs = jax.vmap(self._reset_one)(take(ps.key))
        scatter = lambda buf, rows: buf.at[env_id].set(rows)
        b = env_id.shape[0]
        new_ps = PoolState(
            env_state=jax.tree_util.tree_map(scatter, ps.env_state, r_state),
            key=scatter(ps.key, r_key),
            elapsed=ps.elapsed.at[env_id].set(0),
            autoreset=ps.autoreset.at[env_id].set(False),
            full_reset=ps.full_reset.at[env_id].set(False),
        )
        common = {
            "elapsed_step": jnp.zeros(b, jnp.int32),
            "done": jnp.zeros(b, jnp.bool_),
            "reward": jnp.zeros(b, jnp.float32),
            "discount": jnp.ones(b, jnp.float32),
            "step_type": jnp.zeros(b, jnp.int32),  # StepType.FIRST
            "trunc": jnp.zeros(b, jnp.bool_),
        }
        return new_ps, self._finish_ts(r_obs, common, env_id.astype(jnp.int32))

    def _step_partial(
        self,
        ps: PoolState,
        action: dict[str, jax.Array],
        env_id: jax.Array,
    ) -> tuple[PoolState, TimeStepDict]:
        """Step only ``env_id`` rows (async mode, ``batch_size < num_envs``).

        The TPU analog of the reference's async send/recv: a gather of the
        addressed envs' state, a vmapped step over the small batch, and a
        scatter back.  Because JAX dispatch is asynchronous, several partial
        steps can be in flight on the device queue at once — this buys the
        same learner/env overlap the reference buys with extra envs per
        batch slot (``envpool/core/state_buffer_queue.h:72``).
        """
        take = functools.partial(jnp.take, indices=env_id, axis=0)
        sub_state = jax.tree_util.tree_map(take, ps.env_state)
        sub_key = take(ps.key)
        sub_elapsed = take(ps.elapsed)
        sub_reset = take(ps.autoreset)
        sub_full = take(ps.full_reset)
        new_state, key, elapsed, done, obs, common = jax.vmap(self._step_one)(
            sub_state, sub_key, sub_elapsed, sub_reset, sub_full, action
        )
        scatter = lambda buf, rows: buf.at[env_id].set(rows)
        new_ps = PoolState(
            env_state=jax.tree_util.tree_map(scatter, ps.env_state, new_state),
            key=scatter(ps.key, key),
            elapsed=scatter(ps.elapsed, elapsed),
            autoreset=scatter(ps.autoreset, done),
            full_reset=scatter(ps.full_reset, common["trunc"]),
        )
        return new_ps, self._finish_ts(obs, common, env_id.astype(jnp.int32))

    # -- rollout -----------------------------------------------------------

    def make_rollout(
        self,
        policy: Callable[[TimeStepDict, jax.Array], dict[str, jax.Array]],
        num_steps: int,
        reset_first: bool = True,
        collect: bool = True,
    ) -> Callable[[PoolState, jax.Array], tuple[PoolState, TimeStepDict]]:
        """Build a jitted T-step rollout: one ``lax.scan`` program.

        The analog of the reference's XLA interface driving env steps inside
        ``lax.fori_loop`` (``examples/xla_step.py:30-96``) — but with env
        state in HBM there is no host hop at all.  ``policy`` maps
        ``(timestep, key) -> action tree``.  With ``collect=False`` the
        per-step timesteps are not stacked (pure throughput mode).
        """

        def run(ps: PoolState, policy_key: jax.Array):
            if reset_first:
                ps, ts0 = self._reset(
                    ps, jnp.ones(self.num_envs, jnp.bool_)
                )
            else:
                ps, ts0 = self._step(
                    ps, _zero_action(self.env), None
                )

            def scan_body(carry, _):
                ps, ts, pkey = carry
                pkey, sub = jax.random.split(pkey)
                action = policy(ts, sub)
                ps, ts = self._step(ps, action)
                return (ps, ts, pkey), (ts if collect else None)

            (ps, last_ts, _), traj = jax.lax.scan(
                scan_body, (ps, ts0, policy_key), length=num_steps
            )
            return ps, (traj if collect else last_ts)

        return jax.jit(run, donate_argnums=(0,))
