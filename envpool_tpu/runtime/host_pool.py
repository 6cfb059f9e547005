"""ctypes wrapper over the native host async executor.

The host-side counterpart of the device engine: for envs that cannot run as
JAX programs, this provides the reference's exact execution model — worker
threads, action queue, pipelined batched state buffers
(``envpool/core/async_envpool.h``) — as a native C++ library with a
send/recv API mirroring :class:`envpool_tpu.adapters.base.EnvPoolBase`.

The built-in env (C++ CartPole) exercises the executor end-to-end and
serves as the host-CPU comparator in benchmarks.  Custom host envs plug in
via a ``step_fn`` C callback (ctypes ``CFUNCTYPE``); note Python callbacks
re-acquire the GIL — true parallelism needs a native callback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = os.path.join(_DIR, "libenvpool_host.so")

STEP_FN = ctypes.CFUNCTYPE(
    ctypes.c_int,
    ctypes.c_void_p,
    ctypes.c_int,
    ctypes.c_int,
    ctypes.POINTER(ctypes.c_float),
    ctypes.POINTER(ctypes.c_float),
)


def build_library(force: bool = False) -> str:
    """Compile runtime.cc → libenvpool_host.so (idempotent)."""
    src = os.path.join(_DIR, "runtime.cc")
    if force or not os.path.exists(_LIB) or (
        os.path.getmtime(src) > os.path.getmtime(_LIB)
    ):
        subprocess.run(
            [
                "g++",
                "-O2",
                "-std=c++17",
                "-shared",
                "-fPIC",
                "-pthread",
                src,
                "-o",
                _LIB,
            ],
            check=True,
        )
    return _LIB


def _load():
    lib = ctypes.CDLL(build_library())
    lib.exec_create.restype = ctypes.c_void_p
    lib.exec_create.argtypes = [
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        STEP_FN,
        ctypes.c_void_p,
    ]
    lib.exec_destroy.argtypes = [ctypes.c_void_p]
    lib.exec_send.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.exec_recv.restype = ctypes.c_int
    lib.exec_recv.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.exec_pop_error.restype = ctypes.c_int
    lib.exec_pop_error.argtypes = [ctypes.c_void_p]
    return lib


class HostEnvError(RuntimeError):
    """One or more host envs raised inside the worker pool.

    Carries the failing env ids and their formatted tracebacks.  The
    executor converts a failed step into a zeroed terminal row so the
    batch still completes (no hung ``recv``); the wrapper then raises
    this on the next ``recv``.
    """

    def __init__(self, failures: dict[int, str]):
        self.failures = failures
        ids = sorted(failures)
        detail = "\n".join(f"[env {i}]\n{failures[i]}" for i in ids)
        super().__init__(
            f"host env(s) {ids} raised during step/reset:\n{detail}"
        )


class HostAsyncPool:
    """send/recv over the native executor (built-in CartPole by default)."""

    def __init__(
        self,
        num_envs: int,
        batch_size: int = 0,
        num_threads: int = 0,
        state_dim: int = 5,
        action_dim: int = 1,
        max_episode_steps: int = 500,
        seed: int = 42,
        step_fn=None,
    ):
        self._lib = _load()
        self.num_envs = num_envs
        self.batch_size = batch_size or num_envs
        self.state_dim = state_dim
        self.action_dim = action_dim
        # Exceptions raised by a Python step_fn inside a worker cannot
        # propagate through the C ABI; trap them, store the traceback,
        # and signal the executor with a negative return (failure
        # detection — raised as HostEnvError on the next recv).
        self._tracebacks: dict[int, str] = {}
        if step_fn is not None:
            import traceback as _tb

            def _guarded(ctx, env_id, reset, act, state):
                try:
                    return int(step_fn(ctx, env_id, reset, act, state))
                except Exception:
                    self._tracebacks[int(env_id)] = _tb.format_exc()
                    return -1

            self._cb = STEP_FN(_guarded)
        else:
            self._cb = STEP_FN()
        self._h = self._lib.exec_create(
            num_envs,
            self.batch_size,
            num_threads,
            state_dim,
            action_dim,
            max_episode_steps,
            seed,
            self._cb,
            None,
        )
        self.all_env_ids = np.arange(num_envs, dtype=np.int32)
        self._is_sync = self.batch_size == num_envs

    def close(self) -> None:
        if self._h:
            self._lib.exec_destroy(self._h)
            self._h = None

    def __del__(self):  # noqa: D105
        try:
            self.close()
        except Exception:
            pass

    def send(
        self,
        action: np.ndarray,
        env_id: np.ndarray | None = None,
        force_reset: bool = False,
    ) -> None:
        if env_id is None:
            env_id = self.all_env_ids
        env_id = np.ascontiguousarray(env_id, np.int32)
        action = np.ascontiguousarray(
            action, np.float32
        ).reshape(len(env_id), self.action_dim)
        self._lib.exec_send(
            self._h,
            env_id.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            action.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(env_id),
            int(force_reset),
        )

    def recv(self):
        states = np.empty((self.batch_size, self.state_dim), np.float32)
        env_ids = np.empty(self.batch_size, np.int32)
        dones = np.empty(self.batch_size, np.uint8)
        self._lib.exec_recv(
            self._h,
            states.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            env_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            dones.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if self._is_sync:
            # Rows arrive in completion order; restore env order.
            order = np.argsort(env_ids)
            states, env_ids, dones = states[order], env_ids[order], dones[order]
        self._raise_pending_errors()
        return states, env_ids, dones.astype(bool)

    def _raise_pending_errors(self) -> None:
        failures: dict[int, str] = {}
        while True:
            eid = self._lib.exec_pop_error(self._h)
            if eid < 0:
                break
            failures[eid] = self._tracebacks.pop(
                eid, "(no traceback captured)"
            )
        if failures:
            raise HostEnvError(failures)

    def reset(self):
        self.send(
            np.zeros((self.num_envs, self.action_dim), np.float32),
            force_reset=True,
        )
        return self.recv()

    def step(self, action: np.ndarray, env_id: np.ndarray | None = None):
        self.send(action, env_id)
        return self.recv()
