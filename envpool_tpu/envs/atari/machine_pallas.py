"""Pallas TPU mega-kernel for the 2600 frame loop.

One ``pallas_call`` advances a 128-lane tile of machines by a FULL
video frame: all machine state (registers, RAM, TIA file, collision
latches) lives in VMEM for the whole frame, every instruction is pure
VPU/MXU work, and the only HBM traffic is the state in/out plus the
per-slot line records.  This removes the per-instruction XLA dispatch
that made the vmapped scalar path ~48 us/instruction (PLAN.md) — the
entire ~2-5k-instruction frame is one kernel launch.

The kernel body IS ``machine_kernel._line_slot`` — the same batched
code the pure-jnp path runs and that tests prove bit-equal to the
scalar emulator — so correctness transfers; an interpret-mode test
additionally locks the Pallas wrapper itself against `frame_batched`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .machine_kernel import NREG, NS, SCALARS, _SLOTS, _line_slot

__all__ = ["frame_pallas"]

B_TILE_MAX = 2048

_i32 = jnp.int32


def _kernel(rom2d_ref, decode_ref, meta_ref, indpair_ref, scal_ref,
            ram_ref, tia_ref, cx_ref,
            out_scal_ref, out_ram_ref, out_tia_ref, out_cx_ref,
            recs_ref, rowsel_ref, rows_ref):
    tables = {
        "rom2d": rom2d_ref[:],
        "decode": decode_ref[:],
        "meta": meta_ref[:],
        "indpair": indpair_ref[:],
        # nbanks is static: recover from the table height (RH = 64*n).
        "nbanks": rom2d_ref.shape[0] // 64,
    }
    scal = scal_ref[:]
    s = {k: scal[i : i + 1] for i, k in enumerate(SCALARS)}
    s["wrapped"] = jnp.zeros_like(s["wrapped"])
    s["scanline"] = jnp.zeros_like(s["scanline"])
    s["ram"] = ram_ref[:]
    s["tia"] = tia_ref[:]
    s["cx"] = cx_ref[:]
    done0 = jnp.zeros(s["pc"].shape, jnp.int32)

    # Pre-zero the per-slot outputs, then run slots with EARLY EXIT as
    # soon as every lane's frame has wrapped — otherwise the masked
    # machinery would keep paying full instruction cost for up to half
    # the 262 slots on ROMs with short frames.
    recs_ref[:] = jnp.zeros(recs_ref.shape, _i32)
    rowsel_ref[:] = jnp.zeros(rowsel_ref.shape, _i32)
    rows_ref[:] = jnp.zeros(rows_ref.shape, _i32)

    def slot_cond(carry):
        i, s_, d = carry
        return (i < _SLOTS) & (jnp.sum((d == 0).astype(_i32)) > 0)

    def slot(carry):
        i, s_, d = carry
        s2, d2, rec, rowsel, row = _line_slot(s_, d, tables)
        recs_ref[pl.ds(i, 1)] = rec[None]
        rowsel_ref[pl.ds(i, 1)] = rowsel
        rows_ref[pl.ds(i, 1)] = row
        return i + 1, s2, d2

    _, s, _ = jax.lax.while_loop(
        slot_cond, slot, (jnp.int32(0), s, done0)
    )

    out_scal_ref[:] = jnp.concatenate(
        [s[k].astype(_i32) for k in SCALARS]
    )
    out_ram_ref[:] = s["ram"]
    out_tia_ref[:] = s["tia"]
    out_cx_ref[:] = s["cx"]


def frame_pallas(s: dict, tables: dict, interpret: bool = False):
    """Lane-last state dict -> (state', recs [S,NREG,B], rowsel, rows).

    Semantics of ``machine_kernel.frame_batched``; the batch is padded
    to a multiple of ``B_TILE`` and tiled over the Pallas grid.
    """
    b = s["pc"].shape[-1]
    # One tile covers the whole batch up to 1024 lanes (bigger tiles
    # amortize fixed loop overhead 8x vs 128); small batches round up
    # to a lane multiple instead of padding to the max tile.
    tile = min(B_TILE_MAX, ((b + 127) // 128) * 128)
    pad = (-b) % tile
    bp = b + pad

    def _pad(v):
        if pad == 0:
            return v
        widths = [(0, 0)] * (v.ndim - 1) + [(0, pad)]
        return jnp.pad(v, widths, mode="edge")

    scal = jnp.concatenate(
        [_pad(s[k]).astype(_i32) for k in SCALARS]
    )  # [NS, BP]
    ram = _pad(s["ram"])
    tia_f = _pad(s["tia"])
    cx = _pad(s["cx"])
    rom2d = jnp.asarray(tables["rom2d"], jnp.float32)
    decode = jnp.asarray(tables["decode"], jnp.float32)
    meta = jnp.asarray(tables["meta"], jnp.float32)
    indpair = jnp.asarray(tables["indpair"], jnp.float32)
    rh = rom2d.shape[0]

    grid = (bp // tile,)

    def lanes(*lead):
        def index_map(i):
            return tuple(0 for _ in lead) + (i,)

        return pl.BlockSpec(tuple(lead) + (tile,), index_map,
                            memory_space=pltpu.VMEM)

    def whole(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((NS, bp), _i32),
        jax.ShapeDtypeStruct((32, bp), _i32),
        jax.ShapeDtypeStruct((64, bp), _i32),
        jax.ShapeDtypeStruct((8, bp), _i32),
        jax.ShapeDtypeStruct((_SLOTS, NREG, bp), _i32),
        jax.ShapeDtypeStruct((_SLOTS, bp), _i32),
        jax.ShapeDtypeStruct((_SLOTS, bp), _i32),
    )
    out_specs = (
        lanes(NS), lanes(32), lanes(64), lanes(8),
        lanes(_SLOTS, NREG), lanes(_SLOTS), lanes(_SLOTS),
    )
    in_specs = [
        whole((rh, 64)), whole((256, 4)), whole((rh, 512)),
        whole((rh, 128)),
        lanes(NS), lanes(32), lanes(64), lanes(8),
    ]
    (oscal, oram, otia, ocx, recs, rowsel, rows) = pl.pallas_call(
        _kernel,
        grid=grid,
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(rom2d, decode, meta, indpair, scal, ram, tia_f, cx)

    out = {k: oscal[i : i + 1, :b] for i, k in enumerate(SCALARS)}
    out["ram"] = oram[:, :b]
    out["tia"] = otia[:, :b]
    out["cx"] = ocx[:, :b]
    return out, recs[..., :b], rowsel[..., :b], rows[..., :b]
