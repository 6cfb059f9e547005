"""Fused arcade pixel pipeline as a Pallas TPU kernel.

One kernel per env block fuses the whole per-step image pipeline that the
reference runs as separate OpenCV CPU passes (``atari_env.h:295-330``):

    maxpool(frame_t-1, frame_t) → INTER_AREA resize → round → uint8

The resize is two MXU matmuls with precomputed area weights
(``ops/image.py``); batching ``B`` envs per grid step turns the small
per-env matmuls into MXU-shaped ones:

    Wh [h, H] · F [B, H, W]  →  [h, B, W]   (contract H)
    ...        · Ww [W, w]   →  [h, B, w]   (contract W)

Everything stays in VMEM; HBM sees one read of the two raw frames and one
uint8 write of the resized result.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .image import resize_matrices

__all__ = ["fused_pool_resize"]


def _kernel(wh_ref, ww_ref, f0_ref, f1_ref, out_ref):
    # All 2D in VMEM (Mosaic dislikes 3D dots/transposes here).
    pooled = jnp.maximum(f0_ref[0], f1_ref[0])  # [H, W]
    t = jnp.dot(
        wh_ref[:], pooled, preferred_element_type=jnp.float32
    )  # [h, W]
    o = jnp.dot(t, ww_ref[:], preferred_element_type=jnp.float32)  # [h, w]
    o = jnp.clip(jnp.round(o), 0.0, 255.0)
    # Mosaic has no f32→u8 cast; hop through int32.
    out_ref[0] = o.astype(jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("out_hw", "interpret"))
def fused_pool_resize(
    frames: jax.Array,
    out_hw: tuple[int, int],
    interpret: bool = False,
) -> jax.Array:
    """[N, 2, H, W] float32 → [N, h, w] uint8 (maxpool + area resize)."""
    n, two, h_in, w_in = frames.shape
    assert two == 2
    h, w = out_hw
    wh, ww = resize_matrices((h_in, w_in), (h, w))
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((h, h_in), lambda i: (0, 0)),
            pl.BlockSpec((w_in, w), lambda i: (0, 0)),
            pl.BlockSpec((1, h_in, w_in), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h_in, w_in), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(wh, ww, frames[:, 0], frames[:, 1])
