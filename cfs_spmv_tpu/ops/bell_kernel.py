"""Pallas TPU kernels for the BELL layout.

The execution-layer replacement for the reference's 9 OpenMP kernel
variants (``csr_matrix.tpp:2664-3162``). One kernel shape covers them all
because the layout already removed scatter conflicts:

- grid = one program per (8, 128) nnz chunk;
- x resides fully in VMEM (v5e: 128 MB ⇒ vectors up to ~30M fp32 rows),
  the analog of the reference's shared read-only x across threads;
- per chunk: slice the 1024-element x window at its 128-aligned base
  (scalar-prefetched), two-step gather (sublane table ``r2`` then lane
  index ``q``), fused multiply, sublane-sum into the owning row tile;
- output tile accumulation relies on Pallas revisiting semantics: chunks
  of a tile are consecutive in the grid, so the (1, 128) y block stays in
  VMEM until the tile is done — the functional analog of the reference's
  per-thread y ranges (``csr_matrix.tpp:2993-3015``), with zero
  synchronization instead of color barriers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANES = 8
LANES = 128

__all__ = ["bell_spmv_tiles", "bell_spmm_tiles"]


def _bell_kernel(base_ref, tile_ref, vals_ref, packed_ref, x_ref, y_ref):
    c = pl.program_id(0)
    b = base_ref[c]
    window = x_ref[pl.ds(b, SUBLANES), :]  # (8, 128) = 1024 x values
    pk = packed_ref[0]
    q = pk & 0xFFFF
    r2 = pk >> 16
    rows = jnp.take_along_axis(window, r2, axis=0)  # sublane gather
    gathered = jnp.take_along_axis(rows, q, axis=1)  # lane gather
    contrib = jnp.sum(vals_ref[0] * gathered, axis=0, keepdims=True)

    # y block covers 8 row tiles (Mosaic needs (8,128)-divisible blocks);
    # this chunk's tile occupies sublane tile % 8 of the block
    tile = tile_ref[c]
    prev = tile_ref[jnp.maximum(c - 1, 0)]
    new_block = jnp.logical_or(c == 0, (tile >> 3) != (prev >> 3))

    @pl.when(new_block)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    sub = tile & 7
    y_ref[pl.ds(sub, 1), :] += contrib


@functools.partial(
    jax.jit, static_argnames=("num_row_tiles", "interpret")
)
def bell_spmv_tiles(
    vals: jax.Array,  # (C, 8, 128)
    packed: jax.Array,  # (C, 8, 128) int32
    base: jax.Array,  # (C,) int32
    chunk_tile: jax.Array,  # (C,) int32
    x2d: jax.Array,  # (x_pad_rows, 128)
    *,
    num_row_tiles: int,
    interpret: bool = False,
) -> jax.Array:
    """y tiles (T, 128) = A_bell @ x for one BELL stream."""
    C = vals.shape[0]
    tiles_padded = -(-num_row_tiles // SUBLANES) * SUBLANES
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C,),
        in_specs=[
            pl.BlockSpec(
                (1, SUBLANES, LANES), lambda c, b_ref, t_ref: (c, 0, 0)
            ),
            pl.BlockSpec(
                (1, SUBLANES, LANES), lambda c, b_ref, t_ref: (c, 0, 0)
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (SUBLANES, LANES),
            lambda c, b_ref, t_ref: (t_ref[c] // SUBLANES, 0),
        ),
    )
    flops = 2 * C * SUBLANES * LANES
    out = pl.pallas_call(
        _bell_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tiles_padded, LANES), vals.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=vals.size * vals.dtype.itemsize + packed.size * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(base, chunk_tile, vals, packed, x2d)
    return out[:num_row_tiles]


def _bell_spmm_kernel(
    base_ref, tile_ref, vals_ref, packed_ref, x_ref, y_ref, *, n_rhs
):
    c = pl.program_id(0)
    b = base_ref[c]
    pk = packed_ref[0]
    q = pk & 0xFFFF
    r2 = pk >> 16
    v = vals_ref[0]
    tile = tile_ref[c]
    prev = tile_ref[jnp.maximum(c - 1, 0)]
    new_block = jnp.logical_or(c == 0, (tile >> 3) != (prev >> 3))

    @pl.when(new_block)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    sub = tile & 7
    for k in range(n_rhs):  # static unroll; B is small (e.g. 8)
        window = x_ref[k, pl.ds(b, SUBLANES), :]
        rows = jnp.take_along_axis(window, r2, axis=0)
        gathered = jnp.take_along_axis(rows, q, axis=1)
        contrib = jnp.sum(v * gathered, axis=0, keepdims=True)
        y_ref[k, pl.ds(sub, 1), :] += contrib


@functools.partial(
    jax.jit, static_argnames=("num_row_tiles", "interpret")
)
def bell_spmm_tiles(
    vals, packed, base, chunk_tile,
    x2d,  # (B, x_pad_rows, 128)
    *,
    num_row_tiles: int,
    interpret: bool = False,
) -> jax.Array:
    """Y tiles (B, T, 128) = A_bell @ X for B right-hand sides.

    The multi-RHS analog of reference SpDMV — the reference has no SpMM;
    this is part of the capability extension required by BASELINE config 3.
    """
    C = vals.shape[0]
    B = x2d.shape[0]
    tiles_padded = -(-num_row_tiles // SUBLANES) * SUBLANES
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C,),
        in_specs=[
            pl.BlockSpec(
                (1, SUBLANES, LANES), lambda c, b_ref, t_ref: (c, 0, 0)
            ),
            pl.BlockSpec(
                (1, SUBLANES, LANES), lambda c, b_ref, t_ref: (c, 0, 0)
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (B, SUBLANES, LANES),
            lambda c, b_ref, t_ref: (0, t_ref[c] // SUBLANES, 0),
        ),
    )
    kernel = functools.partial(_bell_spmm_kernel, n_rhs=B)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (B, tiles_padded, LANES), vals.dtype
        ),
        interpret=interpret,
    )(base, chunk_tile, vals, packed, x2d)
    return out[:, :num_row_tiles]
