"""Pallas TPU kernels for the BELL layout.

The execution-layer replacement for the reference's 9 OpenMP kernel
variants (``csr_matrix.tpp:2664-3162``). One kernel shape covers them all
because the layout already removed scatter conflicts:

- grid = one program per *group* of K = ``chunks_per_step`` (8, 128) nnz
  chunks (grouping amortizes Pallas per-step grid/DMA overhead, which
  dominates at 1 chunk/step);
- x resides fully in VMEM (v5e: 128 MB ⇒ vectors up to ~30M fp32 rows),
  the analog of the reference's shared read-only x across threads;
- per chunk: slice the 1024-element x window at its 128-aligned base
  (scalar-prefetched), two-step gather (sublane table ``r2`` then lane
  index ``q``), fused multiply, sublane-sum into the owning row tile;
- the output block spans BT = ``tiles_per_block`` row tiles and stays in
  VMEM while consecutive groups accumulate into it (Pallas revisiting
  semantics — the functional analog of the reference's per-thread y
  ranges, ``csr_matrix.tpp:2993-3015``, with zero synchronization
  instead of color barriers). The plan builder guarantees each group
  stays inside one output block.
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


def _gather_chunk(window, pk):
    """Two-step (sublane, lane) gather of 1024 x values for one chunk."""
    q = pk & 0xFFFF
    r2 = pk >> 16
    rows = jnp.take_along_axis(window, r2, axis=0)
    return jnp.take_along_axis(rows, q, axis=1)


def _bell_kernel(
    base_ref, tile_ref, vals_ref, packed_ref, x_ref, y_ref, *, K, BT
):
    g = pl.program_id(0)
    first_tile = tile_ref[g * K]
    prev_tile = tile_ref[jnp.maximum(g * K - 1, 0)]
    new_block = jnp.logical_or(
        g == 0, first_tile // BT != prev_tile // BT
    )

    @pl.when(new_block)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    for k in range(K):  # static unroll
        idx = g * K + k
        window = x_ref[pl.ds(base_ref[idx], SUBLANES), :]
        gathered = _gather_chunk(window, packed_ref[0, k])
        contrib = jnp.sum(vals_ref[0, k] * gathered, axis=0, keepdims=True)
        tile = tile_ref[idx]
        sub = tile - (tile // BT) * BT
        y_ref[pl.ds(sub, 1), :] += contrib


@functools.partial(
    jax.jit,
    static_argnames=("num_row_tiles", "chunks_per_step", "tiles_per_block",
                     "interpret"),
)
def bell_spmv_tiles(
    vals: jax.Array,  # (C, 8, 128)
    packed: jax.Array,  # (C, 8, 128) int32
    base: jax.Array,  # (C,) int32
    chunk_tile: jax.Array,  # (C,) int32
    x2d: jax.Array,  # (x_pad_rows, 128)
    *,
    num_row_tiles: int,
    chunks_per_step: int = 64,
    tiles_per_block: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """y tiles (T, 128) = A_bell @ x for one BELL stream."""
    C = vals.shape[0]
    K, BT = chunks_per_step, tiles_per_block
    assert C % K == 0, f"chunk stream not padded to K={K} (C={C})"
    G = C // K
    tiles_padded = -(-num_row_tiles // BT) * BT
    vals4 = vals.reshape(G, K, SUBLANES, LANES)
    packed4 = packed.reshape(G, K, SUBLANES, LANES)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(
                (1, K, SUBLANES, LANES),
                lambda g, b_ref, t_ref: (g, 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, K, SUBLANES, LANES),
                lambda g, b_ref, t_ref: (g, 0, 0, 0),
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BT, LANES),
            lambda g, b_ref, t_ref: (t_ref[g * K] // BT, 0),
        ),
    )
    out = pl.pallas_call(
        functools.partial(_bell_kernel, K=K, BT=BT),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tiles_padded, LANES), vals.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * C * SUBLANES * LANES,
            bytes_accessed=vals.size * vals.dtype.itemsize + packed.size * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(base, chunk_tile, vals4, packed4, x2d)
    return out[:num_row_tiles]


def _bell_spmm_kernel(
    base_ref, tile_ref, vals_ref, packed_ref, x_ref, y_ref, *, K, BT, n_rhs
):
    g = pl.program_id(0)
    first_tile = tile_ref[g * K]
    prev_tile = tile_ref[jnp.maximum(g * K - 1, 0)]
    new_block = jnp.logical_or(
        g == 0, first_tile // BT != prev_tile // BT
    )

    @pl.when(new_block)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    for k in range(K):
        idx = g * K + k
        b = base_ref[idx]
        pk = packed_ref[0, k]
        v = vals_ref[0, k]
        tile = tile_ref[idx]
        sub = tile - (tile // BT) * BT
        for rhs in range(n_rhs):  # static unroll; B is small (e.g. 8)
            window = x_ref[rhs, pl.ds(b, SUBLANES), :]
            gathered = _gather_chunk(window, pk)
            contrib = jnp.sum(v * gathered, axis=0, keepdims=True)
            y_ref[rhs, pl.ds(sub, 1), :] += contrib


@functools.partial(
    jax.jit,
    static_argnames=("num_row_tiles", "chunks_per_step", "tiles_per_block",
                     "interpret"),
)
def bell_spmm_tiles(
    vals, packed, base, chunk_tile,
    x2d,  # (B, x_pad_rows, 128)
    *,
    num_row_tiles: int,
    chunks_per_step: int = 64,
    tiles_per_block: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Y tiles (B, T, 128) = A_bell @ X for B right-hand sides.

    Multi-RHS extension (the reference offers only single-vector SpDMV;
    BASELINE config 3 requires SpMM).
    """
    C = vals.shape[0]
    B = x2d.shape[0]
    K, BT = chunks_per_step, tiles_per_block
    assert C % K == 0, f"chunk stream not padded to K={K} (C={C})"
    G = C // K
    tiles_padded = -(-num_row_tiles // BT) * BT
    vals4 = vals.reshape(G, K, SUBLANES, LANES)
    packed4 = packed.reshape(G, K, SUBLANES, LANES)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(
                (1, K, SUBLANES, LANES),
                lambda g, b_ref, t_ref: (g, 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, K, SUBLANES, LANES),
                lambda g, b_ref, t_ref: (g, 0, 0, 0),
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (B, BT, LANES),
            lambda g, b_ref, t_ref: (0, t_ref[g * K] // BT, 0),
        ),
    )
    out = pl.pallas_call(
        functools.partial(_bell_spmm_kernel, K=K, BT=BT, n_rhs=B),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (B, tiles_padded, LANES), vals.dtype
        ),
        interpret=interpret,
    )(base, chunk_tile, vals4, packed4, x2d)
    return out[:, :num_row_tiles]
