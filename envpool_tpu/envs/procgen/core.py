"""Shared procgen machinery: action decoding, grid mazes, rendering."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

RES = 64          # procgen native resolution
N_ACTIONS = 15

# Procgen's 15-action combo set: (dx, dy, special) — movement on a
# 3x3 pad (9) + special buttons.  Index layout follows the procgen
# convention: 0..8 = (left/none/right) x (down/none/up), 9..14 specials.
_AX = np.asarray([-1, -1, -1, 0, 0, 0, 1, 1, 1, 0, 0, 0, 0, 0, 0], np.int32)
_AY = np.asarray([-1, 0, 1, -1, 0, 1, -1, 0, 1, 0, 0, 0, 0, 0, 0], np.int32)
_SPECIAL = np.asarray(
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 2, 3, 4, 5, 6], np.int32
)


def decode_action(a):
    """→ (dx, dy, special_id) with dy>0 = up, special 1 = fire/jump."""
    a = jnp.clip(a, 0, N_ACTIONS - 1)
    return (
        jnp.asarray(_AX)[a],
        jnp.asarray(_AY)[a],
        jnp.asarray(_SPECIAL)[a],
    )


_BANK_SIZE = 512
_maze_banks: dict = {}


def _np_maze(rng, n: int, extra_open: float):
    """Host-side recursive backtracker (same topology as ``gen_maze``)."""
    m = n // 2
    walls = np.ones((n, n), bool)
    visited = np.zeros((m, m), bool)
    stack = [(0, 0)]
    visited[0, 0] = True
    walls[1, 1] = False
    while stack:
        ci, cj = stack[-1]
        nbrs = []
        for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            ni, nj = ci + di, cj + dj
            if 0 <= ni < m and 0 <= nj < m and not visited[ni, nj]:
                nbrs.append((ni, nj))
        if not nbrs:
            stack.pop()
            continue
        ni, nj = nbrs[rng.integers(len(nbrs))]
        visited[ni, nj] = True
        y0, x0 = 1 + 2 * ci, 1 + 2 * cj
        y1, x1 = 1 + 2 * ni, 1 + 2 * nj
        walls[(y0 + y1) // 2, (x0 + x1) // 2] = False
        walls[y1, x1] = False
        stack.append((ni, nj))
    if extra_open > 0:
        for y in range(1, n - 1):
            for x in range(1, n - 1):
                if (
                    walls[y, x]
                    and ((y % 2 == 1) != (x % 2 == 1))
                    and rng.random() < extra_open
                ):
                    # knock only walls between two open cells
                    if y % 2 == 1 and not walls[y, x - 1] and not walls[
                        y, x + 1
                    ]:
                        walls[y, x] = False
                    elif x % 2 == 1 and not walls[y - 1, x] and not walls[
                        y + 1, x
                    ]:
                        walls[y, x] = False
    return walls


def maze_bank(n: int, extra_open: float = 0.0):
    """[_BANK_SIZE, n, n] precomputed maze layouts (device constant).

    The engine fuses auto-reset into every step (both branches +
    select), so an on-device DFS generator runs per env per step and
    dominated the grid games' step cost.  A host-generated bank makes
    reset a single gather; layout diversity is _BANK_SIZE per
    (size, mode) — entity/goal placement stays fully random per level,
    and the deterministic level_seed → layout map is preserved.
    """
    key = (n, round(float(extra_open), 3))
    if key not in _maze_banks:
        rng = np.random.default_rng(0x9E3779B9 ^ (n * 1000 + int(
            extra_open * 100
        )))
        bank = np.stack(
            [_np_maze(rng, n, extra_open) for _ in range(_BANK_SIZE)]
        )
        # Cache NUMPY (not jnp): this may run inside a trace, and a
        # traced constant must not leak into the module-level cache.
        _maze_banks[key] = bank
    return jnp.asarray(_maze_banks[key])


def gen_maze_banked(key, n: int, extra_open: float = 0.0):
    """Drop-in for ``gen_maze`` backed by the precomputed bank."""
    bank = maze_bank(n, extra_open)
    i = jax.random.randint(key, (), 0, bank.shape[0])
    return bank[i]


def gen_maze(key, n: int, extra_open: float = 0.0):
    """[n, n] wall bitmap: randomized DFS over odd cells (lax.scan).

    Classic recursive-backtracker on the (n//2)^2 odd-cell lattice,
    iterative with an explicit stack; ``extra_open`` knocks out a
    fraction of remaining walls (easier modes).
    """
    m = n // 2
    n_cells = m * m
    walls0 = jnp.ones((n, n), bool)

    def cell_xy(c):
        return 1 + 2 * (c % m), 1 + 2 * (c // m)

    k_dirs, k_open = jax.random.split(key)
    dir_keys = jax.random.split(k_dirs, 4 * n_cells)
    rand_dirs = jax.random.randint(
        k_dirs, (4 * n_cells, 4), 0, 4
    )

    def body(carry, t):
        walls, visited, stack, sp = carry
        cur = stack[jnp.maximum(sp - 1, 0)]
        cx, cy = cell_xy(cur)
        # Try the 4 neighbors in a per-step random order.
        order = jnp.argsort(
            jax.random.uniform(jax.random.fold_in(k_dirs, t), (4,))
        )
        dxs = jnp.asarray([1, -1, 0, 0])[order]
        dys = jnp.asarray([0, 0, 1, -1])[order]
        found = jnp.int32(-1)
        fdx = jnp.int32(0)
        fdy = jnp.int32(0)
        for i in range(4):
            nx = cur % m + dxs[i]
            ny = cur // m + dys[i]
            ok = (nx >= 0) & (nx < m) & (ny >= 0) & (ny < m)
            ncell = jnp.clip(ny * m + nx, 0, n_cells - 1)
            fresh = ok & ~visited[ncell] & (found < 0)
            found = jnp.where(fresh, ncell, found)
            fdx = jnp.where(fresh, dxs[i], fdx)
            fdy = jnp.where(fresh, dys[i], fdy)
        has = found >= 0
        # Carve: the wall between and the target cell.
        wx = cx + fdx
        wy = cy + fdy
        tx = cx + 2 * fdx
        ty = cy + 2 * fdy
        walls = jnp.where(
            has,
            walls.at[wy, wx].set(False).at[ty, tx].set(False),
            walls,
        )
        visited = jnp.where(has, visited.at[found].set(True), visited)
        stack = jnp.where(
            has, stack.at[sp].set(found), stack
        )
        sp = jnp.where(has, sp + 1, jnp.maximum(sp - 1, 1))
        return (walls, visited, stack, sp), None

    walls0 = walls0.at[1, 1].set(False)
    visited0 = jnp.zeros(n_cells, bool).at[0].set(True)
    stack0 = jnp.zeros(4 * n_cells, jnp.int32)
    (walls, _, _, _), _ = jax.lax.scan(
        body,
        (walls0, visited0, stack0, jnp.int32(1)),
        jnp.arange(4 * n_cells),
    )
    if extra_open > 0:
        holes = jax.random.uniform(k_open, (n, n)) < extra_open
        interior = jnp.zeros((n, n), bool).at[1:-1, 1:-1].set(True)
        walls = walls & ~(holes & interior)
    return walls


def render_grid(cells_rgb, res: int = RES):
    """[n, n, 3] float cell colors → [res, res, 3] uint8 (nearest).

    The nearest-neighbor upsample is two one-hot matmuls instead of a
    [res, res]-index gather — vector-index gathers lower to per-element
    dynamic-slices on TPU (see the highway/vizdoom perf notes).  The
    one-hot matrices are compile-time constants.
    """
    n = cells_rgb.shape[0]
    idx = (np.arange(res) * n // res).astype(np.int32)
    up = jnp.asarray(np.eye(n, dtype=np.float32)[idx])     # [res, n]
    img = jnp.einsum("rn,nmc->rmc", up, cells_rgb)
    img = jnp.einsum("sm,rmc->rsc", up, img)
    return jnp.clip(img, 0, 255).astype(jnp.uint8)


def draw_disc(img, x, y, r, rgb, cond=None):
    """Draw a disc on [res, res, 3] float canvas (y up, pixel coords).

    Static small radii take a scatter fast path: a precomputed
    (2R+1)² stamp written with ``mode="drop"`` — ~25 scatter points
    instead of a full [RES, RES] mask per entity, which dominated the
    scroll-game frame cost.  ``cond`` (traced bool) gates the draw by
    pushing the indices out of bounds (dropped), avoiding a full-canvas
    select per entity.  Traced radii fall back to the mask path.
    """
    if isinstance(r, (int, float)) and r <= 6:
        R = int(np.ceil(r))
        dy, dx = np.mgrid[-R:R + 1, -R:R + 1]
        inside = (dy * dy + dx * dx) <= r * r
        offs = np.stack([dy[inside], dx[inside]], 1)       # [K, 2]
        yi = jnp.round(y).astype(jnp.int32) + jnp.asarray(offs[:, 0])
        xi = jnp.round(x).astype(jnp.int32) + jnp.asarray(offs[:, 1])
        if cond is not None:
            yi = jnp.where(cond, yi, RES)                  # → dropped
        return img.at[yi, xi, :].set(
            jnp.asarray(rgb, jnp.float32), mode="drop"
        )
    rows = jax.lax.broadcasted_iota(jnp.float32, (RES, RES), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (RES, RES), 1)
    mask = (rows - y) ** 2 + (cols - x) ** 2 <= r * r
    if cond is not None:
        mask = mask & cond
    return jnp.where(mask[..., None], jnp.asarray(rgb, jnp.float32), img)
