"""Op-level SpMV/SpMM: plan → device arrays → padded kernel calls.

This layer is the analog of the reference's ``dense_vector_multiply`` →
``spmv_fn`` dispatch (``csr_matrix.hpp:67-70,124``): it owns
padding/unpadding, backend selection (Pallas on TPU, interpreter on CPU
test meshes), and composition of streams (main BELL + spill; and for the
symmetric format: diag + lower + upper).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.bell import BellPlan
from ..utils.config import config
from .bell_kernel import LANES, bell_spmm_tiles, bell_spmv_tiles
from .xla_ref import coo_spmm_xla, coo_spmv_xla

__all__ = [
    "BellDevice",
    "to_device",
    "pad_x",
    "bell_apply",
    "bell_apply_mm",
    "sym_apply",
    "use_interpret",
]


def use_interpret() -> bool:
    """Pallas interpreter on non-TPU backends (CPU test meshes)."""
    return config.interpret or jax.default_backend() != "tpu"


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BellDevice:
    """Device-resident BELL stream (a pytree; static geometry in aux)."""

    vals: Any
    packed: Any
    base: Any
    chunk_tile: Any
    spill_row: Any  # (S,) int32 or shape-(0,) placeholder
    spill_col: Any
    spill_val: Any
    num_row_tiles: int = dataclasses.field(metadata=dict(static=True))
    x_pad_rows: int = dataclasses.field(metadata=dict(static=True))
    nrows: int = dataclasses.field(metadata=dict(static=True))
    ncols: int = dataclasses.field(metadata=dict(static=True))
    chunks_per_step: int = dataclasses.field(
        default=64, metadata=dict(static=True)
    )
    tiles_per_block: int = dataclasses.field(
        default=128, metadata=dict(static=True)
    )


def to_device(plan: BellPlan) -> BellDevice:
    if plan.spill is not None:
        sr = jnp.asarray(plan.spill.row)
        sc = jnp.asarray(plan.spill.col)
        sv = jnp.asarray(plan.spill.val)
    else:
        sr = jnp.zeros((0,), jnp.int32)
        sc = jnp.zeros((0,), jnp.int32)
        sv = jnp.zeros((0,), plan.vals.dtype)
    return BellDevice(
        vals=jnp.asarray(plan.vals),
        packed=jnp.asarray(plan.packed),
        base=jnp.asarray(plan.base),
        chunk_tile=jnp.asarray(plan.chunk_tile),
        spill_row=sr,
        spill_col=sc,
        spill_val=sv,
        num_row_tiles=plan.num_row_tiles,
        x_pad_rows=plan.x_pad_rows,
        nrows=plan.nrows,
        ncols=plan.ncols,
        chunks_per_step=plan.chunks_per_step,
        tiles_per_block=plan.tiles_per_block,
    )


def pad_x(x: jax.Array, x_pad_rows: int) -> jax.Array:
    """(m,) → (x_pad_rows, 128) zero-padded window-sliceable layout."""
    m = x.shape[0]
    total = x_pad_rows * LANES
    return jnp.pad(x, (0, total - m)).reshape(x_pad_rows, LANES)


def bell_apply(dev: BellDevice, x: jax.Array) -> jax.Array:
    """y = A @ x for one BELL stream (+ its spill), unpadded in/out."""
    x2d = pad_x(x, dev.x_pad_rows)
    tiles = bell_spmv_tiles(
        dev.vals, dev.packed, dev.base, dev.chunk_tile, x2d,
        num_row_tiles=dev.num_row_tiles,
        chunks_per_step=dev.chunks_per_step,
        tiles_per_block=dev.tiles_per_block,
        interpret=use_interpret(),
    )
    y = tiles.reshape(-1)[: dev.nrows]
    if dev.spill_row.shape[0]:
        y = y + coo_spmv_xla(
            dev.spill_row, dev.spill_col, dev.spill_val, x,
            nrows=dev.nrows,
        )
    return y


def bell_apply_mm(dev: BellDevice, x: jax.Array) -> jax.Array:
    """Y = A @ X, X: (ncols, B) — multi-RHS version."""
    B = x.shape[1]
    x2d = jnp.stack(
        [pad_x(x[:, k], dev.x_pad_rows) for k in range(B)], axis=0
    )
    tiles = bell_spmm_tiles(
        dev.vals, dev.packed, dev.base, dev.chunk_tile, x2d,
        num_row_tiles=dev.num_row_tiles,
        chunks_per_step=dev.chunks_per_step,
        tiles_per_block=dev.tiles_per_block,
        interpret=use_interpret(),
    )  # (B, T, 128)
    y = tiles.reshape(B, -1)[:, : dev.nrows].T
    if dev.spill_row.shape[0]:
        y = y + coo_spmm_xla(
            dev.spill_row, dev.spill_col, dev.spill_val, x,
            nrows=dev.nrows,
        )
    return y


def sym_apply(
    lower: BellDevice, upper: BellDevice, diag: jax.Array, x: jax.Array
) -> jax.Array:
    """Symmetric SpMV: y = D x + L x + Lᵀ x.

    Scatter-free replacement for the reference's conflict-free symmetric
    kernels (``cpu_mv_sym_conflict_free_v2``, ``csr_matrix.tpp:2965-3028``):
    the transpose fold-in is a second row-major BELL stream over Lᵀ instead
    of a color-phased ``y[col] +=`` scatter.
    """
    return diag * x + bell_apply(lower, x) + bell_apply(upper, x)


def sym_apply_mm(
    lower: BellDevice, upper: BellDevice, diag: jax.Array, x: jax.Array
) -> jax.Array:
    return (
        diag[:, None] * x + bell_apply_mm(lower, x) + bell_apply_mm(upper, x)
    )
