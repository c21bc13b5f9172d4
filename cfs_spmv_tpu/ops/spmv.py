"""Op-level SpMV/SpMM: plan → device arrays → padded kernel calls.

This layer is the analog of the reference's ``dense_vector_multiply`` →
``spmv_fn`` dispatch (``csr_matrix.hpp:67-70,124``): it owns
padding/unpadding, backend selection (Pallas on TPU, interpreter on CPU
test meshes), and composition of streams (paired symmetric + far
residual + diagonal).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.bell2 import LANES, SUBLANES, Bell2Plan
from ..formats.sbell import SBellPlan
from ..utils.config import config
from . import bell2_kernel as _bk
from .bell2_kernel import (
    bell2_spmm_tiles,
    bell2_spmm_tiles_accum,
    bell2_spmv_tiles,
    bell2_spmv_tiles_accum,
    meta_word,
    nib_split,
    sbell_spmm_tiles,
    sbell_spmv_tiles,
    unperm_gather_tiles,
    unperm_gather_tiles_mm,
    word_eligible,
    word_segments,
)
from .sdia_kernel import (
    sdia_gen_tiles,
    sdia_gen_tiles_mm,
    sdia_sym_tiles,
    sdia_sym_tiles_mm,
)

__all__ = [
    "Bell2Device",
    "SBellDevice",
    "to_device",
    "sym_to_device",
    "pad_x",
    "bell2_apply",
    "bell2_apply_mm",
    "sbell_apply",
    "sbell_apply_mm",
    "use_interpret",
]


def use_interpret() -> bool:
    """Pallas interpreter on non-TPU backends (CPU test meshes)."""
    return config.interpret or jax.default_backend() != "tpu"


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Bell2Device:
    """Device-resident one-sided BELL2 stream (pytree; static geometry)."""

    vals: Any
    packed: Any
    meta: Any
    step_block: Any
    num_row_tiles: int = dataclasses.field(metadata=dict(static=True))
    x_rows: int = dataclasses.field(metadata=dict(static=True))
    nrows: int = dataclasses.field(metadata=dict(static=True))
    ncols: int = dataclasses.field(metadata=dict(static=True))
    chunks_per_step: int = dataclasses.field(metadata=dict(static=True))
    tiles_per_block: int = dataclasses.field(metadata=dict(static=True))
    run_len: int = dataclasses.field(default=1, metadata=dict(static=True))
    max_windows: int = dataclasses.field(
        default=8, metadata=dict(static=True)
    )
    windows_contig: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )
    #: contig window range in segments (8/16/32; >8 = deep gather)
    window_depth: int = dataclasses.field(
        default=8, metadata=dict(static=True)
    )
    #: lane-rotation groups (1/2/4; >1 = rolled-back accumulators)
    lane_rot: int = dataclasses.field(
        default=1, metadata=dict(static=True)
    )
    sparse_stream: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )
    has_work: bool = dataclasses.field(
        default=True, metadata=dict(static=True)
    )
    #: half-height 4-bit window stream (``nib_split``); when set,
    #: ``packed`` is the int8 q stream (1.5 B/slot instead of int16's 2)
    nib: Any = None
    #: grid-step boundaries chaining per-segment word-path calls for
    #: streams past PREF_CMAX chunks (``word_segments``; () = single
    #: call)
    word_segs: tuple = dataclasses.field(
        default=(), metadata=dict(static=True)
    )
    #: degree-grouped row tiling: (nrows,) int32 slot of each original
    #: row in the compact permuted output (sentinel num_row_tiles*128
    #: for rows absent from the stream). Apply unpermutes with the
    #: Pallas slab-window kernel when unperm_* are present; the XLA
    #: elementwise gather (measured ~7 ns/row on v5e) remains only as
    #: the legacy fallback for pre-v13 cached plans.
    row_perm: Any = None
    unperm_pk: Any = None  # (nb*8, 128) int32
    unperm_slabs: Any = None  # (nb, W) int32
    unperm_w: int = dataclasses.field(default=0, metadata=dict(static=True))
    dia_vals: Any = None  # signed-offset dense-diagonal stream (general)
    dia_offsets: tuple = dataclasses.field(
        default=(), metadata=dict(static=True)
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SBellDevice:
    """Device-resident paired symmetric stream + far residual + diag."""

    vals: Any
    packed: Any
    meta: Any
    step_block: Any
    diag: Any
    far: Bell2Device | None
    num_row_tiles: int = dataclasses.field(metadata=dict(static=True))
    x_rows: int = dataclasses.field(metadata=dict(static=True))
    nrows: int = dataclasses.field(metadata=dict(static=True))
    chunks_per_step: int = dataclasses.field(metadata=dict(static=True))
    tiles_per_block: int = dataclasses.field(metadata=dict(static=True))
    transpose_windows: int = dataclasses.field(
        default=2, metadata=dict(static=True)
    )
    dia_vals: Any = None  # (R, D, 8, 128) dense-diagonal stream
    dia_offsets: tuple = dataclasses.field(
        default=(), metadata=dict(static=True)
    )
    has_paired: bool = dataclasses.field(
        default=True, metadata=dict(static=True)
    )


def to_device(plan: Bell2Plan) -> Bell2Device:
    meta_np = np.asarray(plan.meta)
    nib_dev = None
    packed_np = np.asarray(plan.packed)
    sb_np = np.asarray(plan.step_block)
    word_segs = ()
    # sparse (accumulating) streams have no segmented kernel variant:
    # they keep the plain PREF_CMAX cap
    if word_eligible(
        meta_np, contig=plan.windows_contig, depth=plan.window_depth,
        tiles_per_block=plan.tiles_per_block,
        step_block_np=None if plan.sparse_stream else sb_np,
    ):
        # scalar-prefetch fast path: one packed int32/chunk in SMEM
        # instead of the per-step SMEM-blocked table, which stalls the
        # stream pipeline ~677 ns/step (docs/KERNEL_NOTES_R3.md)
        meta_dev = jnp.asarray(meta_word(meta_np))
        if meta_np.shape[0] > _bk.PREF_CMAX:  # module attr: patchable
            word_segs = word_segments(sb_np, plan.chunks_per_step)
        if (
            config.nib_streams
            and packed_np.dtype == np.int16
            and packed_np.size
            and plan.window_depth <= 2 * SUBLANES
            and plan.lane_rot == 1
            and plan.chunks_per_step % 2 == 0
        ):
            # int8 q + half-height window nibbles: 1.5 B/slot of index
            # traffic instead of 2 (the word kernel is stream-DMA-bound)
            q8, nibs = nib_split(packed_np)
            packed_np = q8
            nib_dev = jnp.asarray(nibs)
    else:
        meta_dev = jnp.asarray(meta_np)
    return Bell2Device(
        vals=jnp.asarray(plan.vals),
        packed=jnp.asarray(packed_np),
        meta=meta_dev,
        nib=nib_dev,
        step_block=jnp.asarray(plan.step_block),
        num_row_tiles=plan.num_row_tiles,
        x_rows=plan.x_rows,
        nrows=plan.nrows,
        ncols=plan.ncols,
        chunks_per_step=plan.chunks_per_step,
        tiles_per_block=plan.tiles_per_block,
        run_len=plan.run_len,
        max_windows=plan.max_windows,
        windows_contig=plan.windows_contig,
        window_depth=plan.window_depth,
        lane_rot=plan.lane_rot,
        sparse_stream=plan.sparse_stream,
        has_work=plan.nnz > 0,
        word_segs=word_segs or (),
        row_perm=None if plan.row_perm is None
        else jnp.asarray(plan.row_perm),
        unperm_pk=None if plan.unperm_pk is None
        else jnp.asarray(plan.unperm_pk),
        unperm_slabs=None if plan.unperm_slabs is None
        else jnp.asarray(plan.unperm_slabs),
        unperm_w=0 if plan.unperm_slabs is None
        else int(plan.unperm_slabs.shape[1]),
        dia_vals=None if plan.dia is None else jnp.asarray(plan.dia.vals),
        dia_offsets=() if plan.dia is None else plan.dia.offsets,
    )


def sym_to_device(plan: SBellPlan) -> SBellDevice:
    empty = plan.nnz_paired == 0  # skip uploading the covering chunks
    return SBellDevice(
        vals=jnp.zeros((0,), jnp.float32)
        if empty
        else jnp.asarray(plan.vals),
        packed=jnp.zeros((0,), jnp.int32)
        if empty
        else jnp.asarray(plan.packed),
        meta=jnp.zeros((0,), jnp.int32)
        if empty
        else jnp.asarray(plan.meta),
        step_block=jnp.zeros((0,), jnp.int32)
        if empty
        else jnp.asarray(plan.step_block),
        diag=jnp.asarray(plan.diag),
        far=None if plan.far is None else to_device(plan.far),
        num_row_tiles=plan.num_row_tiles,
        x_rows=plan.x_rows,
        nrows=plan.nrows,
        chunks_per_step=plan.chunks_per_step,
        tiles_per_block=plan.tiles_per_block,
        transpose_windows=plan.transpose_windows,
        dia_vals=None if plan.dia is None else jnp.asarray(plan.dia.vals),
        dia_offsets=() if plan.dia is None else plan.dia.offsets,
        has_paired=plan.nnz_paired > 0,
    )


def pad_x(x: jax.Array, x_rows: int) -> jax.Array:
    """(m,) → (x_rows, 128) zero-padded segment-sliceable layout."""
    m = x.shape[0]
    return jnp.pad(x, (0, x_rows * LANES - m)).reshape(x_rows, LANES)



def _unperm_tiles(dev: Bell2Device, tiles: jax.Array) -> jax.Array:
    """Original-row-order tiles (>= ceil(nrows/128) rows of 128) from a
    grouped stream's compact output tiles."""
    if dev.unperm_pk is not None:
        return unperm_gather_tiles(
            dev.unperm_pk, dev.unperm_slabs, tiles[: dev.num_row_tiles],
            W=dev.unperm_w, interpret=use_interpret(),
        )
    # legacy plans (PLAN_VERSION < 13): elementwise XLA gather
    flat = tiles[: dev.num_row_tiles].reshape(-1)
    flat = jnp.concatenate([flat, jnp.zeros((1,), flat.dtype)])
    return pad_x(flat[dev.row_perm], -(-dev.nrows // LANES))


def _unperm_tiles_mm(dev: Bell2Device, tiles: jax.Array) -> jax.Array:
    """(B, >=ceil(nrows/128), 128) unpermuted tiles, multi-RHS."""
    if dev.unperm_pk is not None:
        return unperm_gather_tiles_mm(
            dev.unperm_pk, dev.unperm_slabs,
            tiles[:, : dev.num_row_tiles],
            W=dev.unperm_w, interpret=use_interpret(),
        )
    B = tiles.shape[0]
    flat = tiles[:, : dev.num_row_tiles].reshape(B, -1)
    flat = jnp.concatenate([flat, jnp.zeros((B, 1), flat.dtype)], axis=1)
    Y = flat[:, dev.row_perm]  # (B, nrows)
    T_full = -(-dev.nrows // LANES)
    return jnp.pad(
        Y, ((0, 0), (0, T_full * LANES - dev.nrows))
    ).reshape(B, T_full, LANES)


def bell2_apply(dev: Bell2Device, x: jax.Array) -> jax.Array:
    """y = A @ x for one BELL2 stream, unpadded in/out."""
    x2d = pad_x(x, dev.x_rows)
    kw = dict(
        num_row_tiles=dev.num_row_tiles,
        chunks_per_step=dev.chunks_per_step,
        tiles_per_block=dev.tiles_per_block,
        interpret=use_interpret(),
        run=dev.run_len,
        wmax=dev.max_windows,
        contig=dev.windows_contig,
        depth=dev.window_depth,
        rot=dev.lane_rot,
        nib=dev.nib,
    )
    if not dev.has_work:
        # dia-only (or empty) plan: nothing to stream at all
        tiles = jnp.zeros((dev.num_row_tiles, LANES), x2d.dtype)
    elif dev.sparse_stream and dev.row_perm is None:
        # post-peel residual: only tiles with chunks are visited
        BT = dev.tiles_per_block
        TP = -(-dev.num_row_tiles // BT) * BT
        tiles = bell2_spmv_tiles_accum(
            dev.vals, dev.packed, dev.meta, dev.step_block, x2d,
            jnp.zeros((TP, LANES), x2d.dtype), **kw
        )[: dev.num_row_tiles]
    else:
        tiles = bell2_spmv_tiles(
            dev.vals, dev.packed, dev.meta, dev.step_block, x2d,
            segs=dev.word_segs, **kw
        )
    if dev.row_perm is not None:
        # degree-grouped stream: unpermute the compact output (Pallas
        # slab-window kernel; absent rows read exact 0)
        ot = _unperm_tiles(dev, tiles)
        if dev.dia_vals is None:
            return ot.reshape(-1)[: dev.nrows]
        tiles = ot[: -(-dev.nrows // LANES)]
    if dev.dia_vals is not None:
        tiles = sdia_gen_tiles(
            dev.dia_vals, x2d, tiles, offsets=dev.dia_offsets,
            interpret=use_interpret(),
        )
    return tiles.reshape(-1)[: dev.nrows]


def bell2_apply_mm(dev: Bell2Device, x: jax.Array) -> jax.Array:
    """Y = A @ X, X: (ncols, B)."""
    B = x.shape[1]
    x3d = jnp.stack([pad_x(x[:, b], dev.x_rows) for b in range(B)])
    kw = dict(
        num_row_tiles=dev.num_row_tiles,
        chunks_per_step=dev.chunks_per_step,
        tiles_per_block=dev.tiles_per_block,
        interpret=use_interpret(),
        run=dev.run_len,
        wmax=dev.max_windows,
        contig=dev.windows_contig,
        depth=dev.window_depth,
        rot=dev.lane_rot,
        nib=dev.nib,
    )
    if not dev.has_work:
        tiles = jnp.zeros((B, dev.num_row_tiles, LANES), x3d.dtype)
    elif dev.sparse_stream and dev.row_perm is None:
        BT = dev.tiles_per_block
        TP = -(-dev.num_row_tiles // BT) * BT
        tiles = bell2_spmm_tiles_accum(
            dev.vals, dev.packed, dev.meta, dev.step_block, x3d,
            jnp.zeros((B, TP, LANES), x3d.dtype), **kw
        )[:, : dev.num_row_tiles]
    else:
        tiles = bell2_spmm_tiles(
            dev.vals, dev.packed, dev.meta, dev.step_block, x3d,
            segs=dev.word_segs, **kw
        )
    if dev.row_perm is not None:
        ot = _unperm_tiles_mm(dev, tiles)
        if dev.dia_vals is None:
            return ot.reshape(B, -1)[:, : dev.nrows].T
        tiles = ot[:, : -(-dev.nrows // LANES)]
    if dev.dia_vals is not None:
        tiles = sdia_gen_tiles_mm(
            dev.dia_vals, x3d, tiles, offsets=dev.dia_offsets,
            interpret=use_interpret(),
        )
    return tiles.reshape(B, -1)[:, : dev.nrows].T


def sbell_apply(dev: SBellDevice, x: jax.Array) -> jax.Array:
    """Symmetric y = (D + L + Lᵀ) x via the paired stream.

    Scatter-free replacement for the reference's conflict-free symmetric
    kernels (``cpu_mv_sym_conflict_free_v2``, ``csr_matrix.tpp:
    2965-3028``), with each stored value driving both contributions.
    """
    x2d = pad_x(x, dev.x_rows)
    if dev.has_paired:
        tiles = sbell_spmv_tiles(
            dev.vals, dev.packed, dev.meta, dev.step_block, x2d,
            num_row_tiles=dev.num_row_tiles,
            chunks_per_step=dev.chunks_per_step,
            tiles_per_block=dev.tiles_per_block,
            transpose_windows=dev.transpose_windows,
            interpret=use_interpret(),
        )
        diag_done = False
    else:
        # seed the accumulating streams with D x directly — saves the
        # separate add pass on the pure-SDIA (flagship) path
        tiles = pad_x(dev.diag * x, dev.num_row_tiles)
        diag_done = True
    if dev.far is not None:
        fd = dev.far
        fkw = dict(
            num_row_tiles=fd.num_row_tiles,
            chunks_per_step=fd.chunks_per_step,
            tiles_per_block=fd.tiles_per_block,
            interpret=use_interpret(),
            run=fd.run_len,
            wmax=fd.max_windows,
            contig=fd.windows_contig,
            depth=fd.window_depth,
            rot=fd.lane_rot,
            nib=fd.nib,
        )
        if fd.row_perm is not None:
            # degree-grouped far stream: dense over its compact tiles;
            # unpermute (Pallas kernel), then add into the paired tiles
            ftiles = bell2_spmv_tiles(
                fd.vals, fd.packed, fd.meta, fd.step_block, x2d,
                segs=fd.word_segs, **fkw
            )
            ot = _unperm_tiles(fd, ftiles)
            NT = dev.num_row_tiles
            if ot.shape[0] < NT:
                ot = jnp.pad(ot, ((0, NT - ot.shape[0]), (0, 0)))
            tiles = tiles[:NT] + ot[:NT]
        else:
            # far residual accumulates straight into the paired tiles
            # (sparse stream; unvisited blocks keep their values)
            BT = fd.tiles_per_block
            tiles_padded = -(-fd.num_row_tiles // BT) * BT
            tp = jnp.pad(
                tiles, ((0, tiles_padded - tiles.shape[0]), (0, 0))
            )
            tiles = bell2_spmv_tiles_accum(
                fd.vals, fd.packed, fd.meta, fd.step_block, x2d, tp,
                **fkw
            )[: dev.num_row_tiles]
    if dev.dia_vals is not None:
        # mirrored (signed) offsets -> blocked-y one-sided kernel
        dia_fn = (
            sdia_gen_tiles
            if any(d < 0 for d in dev.dia_offsets)
            else sdia_sym_tiles
        )
        tiles = dia_fn(
            dev.dia_vals, x2d, tiles[: dev.num_row_tiles],
            offsets=dev.dia_offsets, interpret=use_interpret(),
        )
    y = tiles.reshape(-1)[: dev.nrows]
    return y if diag_done else y + dev.diag * x


def sbell_apply_mm(dev: SBellDevice, x: jax.Array) -> jax.Array:
    B = x.shape[1]
    x3d = jnp.stack([pad_x(x[:, b], dev.x_rows) for b in range(B)])
    if dev.has_paired:
        tiles = sbell_spmm_tiles(
            dev.vals, dev.packed, dev.meta, dev.step_block, x3d,
            num_row_tiles=dev.num_row_tiles,
            chunks_per_step=dev.chunks_per_step,
            tiles_per_block=dev.tiles_per_block,
            transpose_windows=dev.transpose_windows,
            interpret=use_interpret(),
        )
        diag_done = False
    else:
        tiles = jnp.stack(
            [pad_x(dev.diag * x[:, b], dev.num_row_tiles)
             for b in range(B)]
        )
        diag_done = True
    if dev.far is not None:
        fd = dev.far
        fkw = dict(
            num_row_tiles=fd.num_row_tiles,
            chunks_per_step=fd.chunks_per_step,
            tiles_per_block=fd.tiles_per_block,
            interpret=use_interpret(),
            run=fd.run_len,
            wmax=fd.max_windows,
            contig=fd.windows_contig,
            depth=fd.window_depth,
            rot=fd.lane_rot,
            nib=fd.nib,
        )
        if fd.row_perm is not None:
            ftiles = bell2_spmm_tiles(
                fd.vals, fd.packed, fd.meta, fd.step_block, x3d,
                segs=fd.word_segs, **fkw
            )
            ot = _unperm_tiles_mm(fd, ftiles)
            NT = dev.num_row_tiles
            if ot.shape[1] < NT:
                ot = jnp.pad(ot, ((0, 0), (0, NT - ot.shape[1]), (0, 0)))
            tiles = tiles[:, :NT] + ot[:, :NT]
        else:
            BT = fd.tiles_per_block
            tiles_padded = -(-fd.num_row_tiles // BT) * BT
            tp = jnp.pad(
                tiles,
                ((0, 0), (0, tiles_padded - tiles.shape[1]), (0, 0)),
            )
            tiles = bell2_spmm_tiles_accum(
                fd.vals, fd.packed, fd.meta, fd.step_block, x3d, tp,
                **fkw
            )[:, : dev.num_row_tiles]
    if dev.dia_vals is not None:
        dia_fn = (
            sdia_gen_tiles_mm
            if any(d < 0 for d in dev.dia_offsets)
            else sdia_sym_tiles_mm
        )
        tiles = dia_fn(
            dev.dia_vals, x3d, tiles[:, : dev.num_row_tiles],
            offsets=dev.dia_offsets, interpret=use_interpret(),
        )
    Y = tiles.reshape(B, -1)[:, : dev.nrows].T
    return Y if diag_done else Y + dev.diag[:, None] * x
