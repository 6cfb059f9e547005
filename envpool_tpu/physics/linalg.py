"""Small-matrix SPD solves, unrolled for static sizes.

``jnp.linalg.solve`` on batched tiny matrices lowers to a generic pivoted-LU
path that is slow on TPU.  Joint-space inertia matrices are SPD and small
(nv ≤ ~30), so an unrolled Cholesky — a static chain of elementwise ops on
``[batch]`` vectors that XLA fuses — is far cheaper.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["spd_solve"]


def spd_solve(M: jax.Array, b: jax.Array) -> jax.Array:
    """Solve M x = b for SPD M of static shape [n, n] (unrolled Cholesky).

    Works under vmap (all indexing is static).  Falls back to
    ``jnp.linalg.solve`` for n > 32.
    """
    n = M.shape[-1]
    if n > 32:
        return jnp.linalg.solve(M, b)
    eps = jnp.asarray(1e-12, M.dtype)
    # Cholesky: L lower-triangular with M = L L^T.
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        s = M[i, i]
        for k in range(i):
            s = s - L[i][k] * L[i][k]
        L[i][i] = jnp.sqrt(jnp.maximum(s, eps))
        inv_d = 1.0 / L[i][i]
        for j in range(i + 1, n):
            s = M[j, i]
            for k in range(i):
                s = s - L[j][k] * L[i][k]
            L[j][i] = s * inv_d
    # Forward substitution: L y = b.
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # Back substitution: L^T x = y.
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)
