"""Device-mesh parallelism for the env batch axis."""

from .mesh import env_mesh, env_sharding, local_env_slice, pod_mesh

__all__ = ["env_mesh", "env_sharding", "local_env_slice", "pod_mesh"]
