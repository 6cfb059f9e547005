"""Native host runtime: C++ async executor for host-side envs."""

from .host_pool import HostAsyncPool, build_library

__all__ = ["HostAsyncPool", "build_library"]
