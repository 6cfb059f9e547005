"""Stateful pool wrapper: the analog of ``EnvPoolMixin``.

Mirrors the API-agnostic half of the reference's Python layer
(``envpool/python/envpool.py:61-384``): batched ``step/reset/send/recv/
async_reset``, action normalization (dict or bare array, optional ``env_id``
routing), and the sync/async split.

TPU-native async mode: with ``batch_size < num_envs`` the pool runs
*partial steps* — a gather/step/scatter program over the addressed env rows.
``send`` only dispatches the compiled program (JAX dispatch is asynchronous),
so several partial steps are in flight on the device queue while the host
runs the learner; ``recv`` blocks on the oldest one.  This replaces the
reference's worker threads + StateBufferQueue pipelining
(``envpool/core/state_buffer_queue.h:35-164``) with the device queue itself.
"""

from __future__ import annotations

from collections import deque
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..core.engine import Engine, TimeStepDict
from ..core.env import TpuEnv
from ..core.env_spec import EnvSpec

__all__ = ["EnvPoolBase", "tile_frames"]


def tile_frames(frames: np.ndarray) -> np.ndarray:
    """Tile ``[B, H, W, 3]`` frames into one near-square grid image.

    The human-mode viewer shows the whole batch at once (the reference
    limits human mode to a single env, ``envpool/python/envpool.py:289-293``
    — the grid is the batched generalization).
    """
    frames = np.asarray(frames)
    b, h, w, c = frames.shape
    cols = int(np.ceil(np.sqrt(b)))
    rows = int(np.ceil(b / cols))
    grid = np.zeros((rows * h, cols * w, c), frames.dtype)
    for i in range(b):
        r, cidx = divmod(i, cols)
        grid[r * h : (r + 1) * h, cidx * w : (cidx + 1) * w] = frames[i]
    return grid


class EnvPoolBase:
    """Holds the device-resident PoolState and drives the Engine."""

    def __init__(self, spec: EnvSpec):
        self.spec = spec
        self._env: TpuEnv = spec.env
        self._engine = Engine.shared(
            self._env, self._env.config.get("sharding")
        )
        self._state = self._engine.init()
        self._recv_queue: deque = deque()
        self.num_envs = self._env.num_envs
        self.batch_size = int(self._env.config["batch_size"])
        self.all_env_ids = np.arange(self.num_envs, dtype=np.int32)
        self._numpy_output = bool(self._env.config.get("numpy_output", True))
        self._action_keys = list(self._env.action_spec().keys())
        self._state_keys = list(spec.state_array_spec.keys())
        rec = str(
            self._env.config.get("record_dir")
            or self._env.config.get("lmp_save_dir")
            or ""
        )
        if rec:
            from .record import EpisodeRecorder

            self._recorder = EpisodeRecorder(
                rec, self.num_envs, self._env.seeds()
            )
        else:
            self._recorder = None

    # -- properties mirroring EnvPoolMixin ---------------------------------

    @property
    def is_async(self) -> bool:
        return self.batch_size < self.num_envs

    @property
    def config(self) -> dict[str, Any]:
        return dict(self._env.config)

    def __len__(self) -> int:
        return self.num_envs

    def __repr__(self) -> str:
        cfg = ", ".join(f"{k}={v!r}" for k, v in self.config.items())
        return f"{self.__class__.__name__}({cfg})"

    def __str__(self) -> str:
        return self.__repr__()

    # -- action plumbing ---------------------------------------------------

    def _check_action(
        self, tree: dict[str, jax.Array], env_id: jax.Array | None
    ) -> None:
        """One-time dtype/shape validation (``envpool.py:151-172``)."""
        if getattr(self, "_action_checked", False):
            return
        self._action_checked = True
        batch = self.num_envs if env_id is None else int(env_id.shape[0])
        mnp = self._env.max_num_players
        for key, spec in self._env.action_spec().items():
            arr = tree[key]
            expect = (batch, *spec.static_shape(mnp))
            if tuple(arr.shape) != expect:
                raise ValueError(
                    f"action[{key!r}] shape {tuple(arr.shape)} != expected "
                    f"{expect} (num rows must match "
                    f"{'env_id' if env_id is not None else 'num_envs'})"
                )

    def _from(
        self,
        action: dict[str, Any] | np.ndarray,
        env_id: np.ndarray | None,
    ) -> tuple[dict[str, jax.Array], jax.Array | None]:
        """Normalize user action into a batched action tree + env_id rows.

        Accepts a bare array for single-key action specs or a (possibly
        nested via ``.``) dict, mirroring ``envpool.py:174-208``.
        """
        players = self._env.max_num_players
        if isinstance(action, dict):
            flat: dict[str, Any] = {}
            for k, v in action.items():
                flat[k] = v
            env_id_from_dict = flat.pop("env_id", None)
            flat.pop("players.env_id", None)
            if env_id is None and env_id_from_dict is not None:
                env_id = np.asarray(env_id_from_dict)
            tree = {}
            for k in self._action_keys:
                if k not in flat:
                    raise KeyError(f"missing action key {k!r}")
                arr = jnp.asarray(flat[k])
                spec = self._env.action_spec()[k]
                if players > 1 and spec.per_player:
                    # Per-player rows arrive flattened [B*P, ...] in player
                    # order (reference: contiguous players.env_id rows,
                    # envpool.py:123-149); fold into [B, P, ...].
                    rows = arr.shape[0]
                    if rows % players == 0 and (
                        arr.ndim < 2 or arr.shape[1] != players
                    ):
                        arr = arr.reshape(
                            rows // players, players, *arr.shape[1:]
                        )
                tree[k] = arr
        else:
            if len(self._action_keys) != 1:
                raise ValueError(
                    "bare-array action requires a single-key action spec; "
                    f"this env expects {self._action_keys}"
                )
            arr = jnp.asarray(action)
            spec = self._env.action_spec()[self._action_keys[0]]
            if players > 1 and spec.per_player:
                rows = arr.shape[0]
                if rows % players == 0 and (
                    arr.ndim < 2 or arr.shape[1] != players
                ):
                    arr = arr.reshape(rows // players, players, *arr.shape[1:])
            tree = {self._action_keys[0]: arr.astype(spec.dtype)}
        if env_id is not None:
            env_id = jnp.asarray(np.asarray(env_id, dtype=np.int32))
        return tree, env_id

    # -- send / recv -------------------------------------------------------

    def send(
        self,
        action: dict[str, Any] | np.ndarray,
        env_id: np.ndarray | None = None,
    ) -> None:
        """Dispatch one (partial) step; non-blocking."""
        tree, env_id = self._from(action, env_id)
        self._check_action(tree, env_id)
        if self._recorder is not None:
            self._recorder.on_send(
                self.all_env_ids if env_id is None else np.asarray(env_id),
                tree,
            )
        if env_id is None and not self.is_async:
            self._state, ts = self._engine.step(self._state, tree)
        else:
            if env_id is None:
                env_id = jnp.asarray(self.all_env_ids)
            self._state, ts = self._engine.step_partial(
                self._state, tree, env_id
            )
        self._recv_queue.append(ts)

    def recv(self, reset: bool = False, return_info: bool = True) -> Any:
        """Return the oldest dispatched batch (blocks on device transfer)."""
        if not self._recv_queue:
            raise RuntimeError(
                "recv() called with no pending batch — call send() or "
                "async_reset() first (reference semantics: every recv is "
                "paired with a prior send)."
            )
        ts = self._recv_queue.popleft()
        out = self._materialize(ts)
        if self._recorder is not None:
            self._recorder.on_recv(
                np.asarray(out["info:env_id"]), np.asarray(out["done"])
            )
        return self._to(out, reset, return_info)

    def async_reset(self) -> None:
        """Reset all envs, delivering results in ``batch_size`` chunks."""
        if self._recorder is not None:
            self._recorder.on_reset(self.all_env_ids)
        for start in range(0, self.num_envs, self.batch_size):
            ids = self.all_env_ids[start : start + self.batch_size]
            self._state, ts = self._reset_rows(jnp.asarray(ids))
            self._recv_queue.append(ts)

    # -- sync step / reset -------------------------------------------------

    def step(
        self,
        action: dict[str, Any] | np.ndarray,
        env_id: np.ndarray | None = None,
    ) -> Any:
        self.send(action, env_id)
        return self.recv(reset=False, return_info=True)

    def reset(self, env_id: np.ndarray | None = None) -> Any:
        if env_id is None:
            env_id = self.all_env_ids
        if self._recorder is not None:
            self._recorder.on_reset(np.asarray(env_id))
        self._state, ts = self._reset_rows(
            jnp.asarray(np.asarray(env_id, dtype=np.int32))
        )
        return self._to(
            self._materialize(ts),
            reset=True,
            return_info=bool(self.config.get("gym_reset_return_info", True)),
        )

    def _reset_rows(self, env_id: jax.Array):
        if int(env_id.shape[0]) < self.num_envs:
            # Partial reset: only run the reset kernel over addressed rows.
            return self._engine.reset_partial(self._state, env_id)
        mask = (
            jnp.zeros(self.num_envs, jnp.bool_).at[env_id].set(True)
        )
        state, ts = self._engine.reset(self._state, mask)
        ts = {k: jnp.take(v, env_id, axis=0) for k, v in ts.items()}
        return state, ts

    # -- output ------------------------------------------------------------

    def _materialize(self, ts: TimeStepDict) -> dict[str, Any]:
        if self._numpy_output:
            arrs = jax.device_get(list(ts.values()))
            return dict(zip(ts.keys(), arrs))
        return ts

    def _to(self, state: dict[str, Any], reset: bool, return_info: bool):
        raise NotImplementedError

    def close(self, **kwargs: Any) -> None:
        del kwargs

    # -- render ------------------------------------------------------------

    def render(self, env_id: np.ndarray | None = None) -> np.ndarray | None:
        """Batched RGB frames ``[B, H, W, 3] uint8``.

        The analog of ``AsyncEnvPool::Render``
        (``core/async_envpool.h:183-222``) — but rasterized on device by a
        vmapped pure function instead of serial host loops.

        With ``render_mode="human"`` (config key, reference behavior
        ``envpool/python/envpool.py:264-295``) the batch is tiled into a
        single grid image and shown in an OpenCV window; returns None.
        """
        if env_id is None:
            env_id = self.all_env_ids
        env_id = jnp.asarray(np.asarray(env_id, dtype=np.int32))
        if not hasattr(self, "_render_fn"):
            self._render_fn = jax.jit(
                lambda states, ids: jax.vmap(self._env.render_state)(
                    jax.tree_util.tree_map(
                        lambda x: jnp.take(x, ids, axis=0), states
                    )
                )
            )
        frames = self._render_fn(self._state.env_state, env_id)
        out = np.asarray(jax.device_get(frames))
        if self.config.get("render_mode", "rgb_array") == "human":
            self._show_human_frame(tile_frames(out))
            return None
        return out

    def _show_human_frame(self, frame: np.ndarray) -> None:
        """Display one RGB frame in a (reused) OpenCV window.

        Mirrors ``EnvPoolMixin._show_human_frame``
        (``envpool/python/envpool.py:246-263``): guarded cv2 import, BGR
        flip, 1 ms waitKey, window handle cached on the pool.
        """
        try:
            import cv2
        except ImportError as exc:
            raise RuntimeError(
                "render_mode='human' requires opencv-python to be installed"
            ) from exc
        window_name = getattr(
            self, "_render_window_name", f"{self.__class__.__name__}-render"
        )
        cv2.imshow(window_name, np.ascontiguousarray(frame[:, :, ::-1]))
        cv2.waitKey(1)
        self._render_window_name = window_name

    # -- checkpoint / resume -----------------------------------------------
    #
    # Absent in the reference (SURVEY.md §5: env state lives in C++
    # objects).  Here the pool state is a pytree in HBM, so checkpointing
    # falls out for free.

    def save_state(self, path: str) -> None:
        """Snapshot the full pool state (all envs) to an .npz file."""
        leaves, treedef = jax.tree_util.tree_flatten(self._state)
        arrs = jax.device_get(leaves)
        np.savez(
            path, *arrs, __treedef__=np.frombuffer(
                repr(treedef).encode(), dtype=np.uint8
            )
        )

    def load_state(self, path: str) -> None:
        """Restore a snapshot taken by :meth:`save_state`.

        Fails loudly if the snapshot was taken under a different config:
        the stored treedef repr and every leaf's shape/dtype must match the
        current pool's — silently unflattening mismatched leaves would
        mis-assign state across fields.
        """
        with np.load(path) as data:
            leaves = [
                data[f"arr_{i}"] for i in range(len(data.files) - 1)
            ]
            stored_treedef = (
                bytes(data["__treedef__"]).decode()
                if "__treedef__" in data
                else None
            )
        cur_leaves, treedef = jax.tree_util.tree_flatten(self._state)
        if stored_treedef is not None and stored_treedef != repr(treedef):
            raise ValueError(
                "load_state: snapshot treedef does not match this pool's "
                "state tree (was the snapshot taken with a different env "
                f"config?).\n  stored:  {stored_treedef}\n"
                f"  current: {treedef!r}"
            )
        if len(leaves) != len(cur_leaves):
            raise ValueError(
                f"load_state: snapshot has {len(leaves)} leaves, pool state "
                f"has {len(cur_leaves)}"
            )
        for i, (new, cur) in enumerate(zip(leaves, cur_leaves)):
            if tuple(new.shape) != tuple(cur.shape) or new.dtype != cur.dtype:
                raise ValueError(
                    f"load_state: leaf {i} mismatch — snapshot "
                    f"{new.dtype}{tuple(new.shape)} vs pool "
                    f"{cur.dtype}{tuple(cur.shape)}"
                )
        self._state = jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(a) for a in leaves]
        )
        self._recv_queue.clear()

    # -- functional escape hatch -------------------------------------------

    @property
    def engine(self) -> Engine:
        """The underlying pure-functional engine (jit/scan-able)."""
        return self._engine

    @property
    def pool_state(self):
        return self._state

    def xla(self):
        """Functional ``(handle, recv, send, step)``, like ``env.xla()``.

        The handle is the PoolState pytree itself — fully jittable and
        ``lax.scan``-able with *no* host callback, unlike the reference's
        custom-call bridge (``envpool/core/xla.h:115-212``).
        """
        from .xla import make_xla

        return make_xla(self)
