"""Image preprocessing ops, designed for the MXU.

The reference implements the Atari pixel pipeline on CPU with OpenCV:
INTER_AREA resize + grayscale (``envpool/utils/image_process.h:27-45``) and
elementwise max-pool over the last two frames
(``envpool/atari/atari_env.h:295-301``).

TPU-native design: **area resize is a linear map**, so we express it as two
small matmuls with precomputed row/column averaging-weight matrices:

    out[h', w'] = Wh[h', :] @ img @ Ww[:, w']

Batched over thousands of envs this rides the MXU systolic array instead of
scalar CPU loops — the whole maxpool→grayscale→resize chain fuses into one
XLA computation whose FLOPs are two matmuls per frame.

The weights reproduce OpenCV INTER_AREA's fractional pixel coverage for
arbitrary scale factors (exact area overlap of source and destination
cells).  uint8 results match OpenCV within ±1 (OpenCV uses fixed-point
accumulation; we use float32 and round-half-away like ``saturate_cast``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["grayscale", "maxpool2", "resize_area", "resize_matrices"]


@functools.lru_cache(maxsize=64)
def _area_weights(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) area-overlap averaging weights (rows sum to 1)."""
    w = np.zeros((n_out, n_in), np.float32)
    scale = n_in / n_out
    for o in range(n_out):
        lo = o * scale
        hi = (o + 1) * scale
        i0 = int(np.floor(lo))
        i1 = int(np.ceil(hi))
        for i in range(i0, min(i1, n_in)):
            cover = min(hi, i + 1) - max(lo, i)
            if cover > 0:
                w[o, i] = cover
        w[o] /= w[o].sum()
    return w


def resize_matrices(
    in_hw: tuple[int, int], out_hw: tuple[int, int]
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(Wh [H',H], Ww [W,W']) weight matrices for `out = Wh @ img @ Ww`."""
    wh = jnp.asarray(_area_weights(in_hw[0], out_hw[0]))
    ww = jnp.asarray(_area_weights(in_hw[1], out_hw[1]).T)
    return wh, ww


def resize_area(
    img: jax.Array, out_hw: tuple[int, int], dtype=jnp.uint8
) -> jax.Array:
    """INTER_AREA resize of ``[..., H, W]`` images via two MXU matmuls."""
    h, w = img.shape[-2], img.shape[-1]
    wh, ww = resize_matrices((h, w), out_hw)
    x = img.astype(jnp.float32)
    # [..., H, W] -> [..., H', W]
    x = jnp.einsum("oh,...hw->...ow", wh, x)
    # [..., H', W] -> [..., H', W']
    x = jnp.einsum("...ow,wp->...op", x, ww)
    if jnp.issubdtype(dtype, jnp.integer):
        x = jnp.clip(jnp.round(x), 0, 255)
    return x.astype(dtype)


def grayscale(rgb: jax.Array, dtype=jnp.uint8) -> jax.Array:
    """ITU-R 601 luma of ``[..., 3, H, W]`` (channel-first) images."""
    r = rgb[..., 0, :, :].astype(jnp.float32)
    g = rgb[..., 1, :, :].astype(jnp.float32)
    b = rgb[..., 2, :, :].astype(jnp.float32)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    if jnp.issubdtype(dtype, jnp.integer):
        y = jnp.clip(jnp.round(y), 0, 255)
    return y.astype(dtype)


def maxpool2(a: jax.Array, b: jax.Array) -> jax.Array:
    """Elementwise max of two frames (flicker removal, atari_env.h:295)."""
    return jnp.maximum(a, b)
