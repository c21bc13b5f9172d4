"""Pallas TPU kernels for the BELL2 / SBELL layouts.

Execution layer replacing the reference's kernel set
(``csr_matrix.tpp:2664-3162``):

- ``bell2_spmv_tiles`` / ``bell2_spmm_tiles``: one-sided streams — per
  chunk, stack the up-to-eight x windows into an (8, 128) register W,
  gather x values with a two-step hardware gather (sublane gather through
  the window table ``r2``, lane gather by ``q = c % 128``), multiply,
  and sublane-sum into the chunk's row of the resident output block.
- ``sbell_spmv_tiles`` / ``sbell_spmm_tiles``: paired symmetric — each
  stored strict-lower nonzero is loaded ONCE and contributes both
  ``y[r] += v*x[c]`` (row side) and ``y[c] += v*x[r]`` (transpose side:
  value and own-tile x are lane-permuted onto lane ``c % 128``, then
  accumulated per window into the same resident output block). The TPU
  realization of the reference's symmetric traffic halving
  (``cpu_mv_sym_*``, ``csr_matrix.tpp:2706-3028``) with layout instead
  of coloring guaranteeing conflict-freedom.

Per-chunk metadata is a blocked SMEM operand (streamed per grid step), so
matrix size is not limited by SMEM capacity; the only full-array scalar
prefetch is the (G,) per-step output-block index used by the out spec.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANES = 8
LANES = 128
META_W = 2 + SUBLANES

#: max chunks whose packed meta word (4 B/chunk) is scalar-prefetched
#: into SMEM. Measured v5e (round 3): a per-grid-step SMEM-blocked
#: operand stalls the stream pipeline ~677 ns/step regardless of size
#: (559 GB/s vs the 740 GB/s the same DMAs reach without it), so
#: contig/deep plans prefetch the whole (C,) word array instead — a
#: 512 KB prefetch compiles on v5e, 1 MB does not; 120k chunks = 480 KB
#: covers audikw_1 full scale (~95k). Larger streams keep the streamed
#: META path (docs/KERNEL_NOTES_R3.md).
PREF_CMAX = 120_000
#: packed meta word layout: sub (bits 0-9) | x-slab base tile (10-31)
WORD_SUB_BITS = 10

__all__ = [
    "word_segments",
    "bell2_spmv_tiles",
    "bell2_spmv_tiles_accum",
    "bell2_spmm_tiles",
    "bell2_spmm_tiles_accum",
    "sbell_spmv_tiles",
    "sbell_spmm_tiles",
    "unperm_gather_tiles",
    "unperm_gather_tiles_mm",
    "meta_word",
    "word_eligible",
]


def _no_x64(fn):
    """Trace the kernel body with x64 semantics off.

    Under ``jax_enable_x64`` Python literals in index maps and
    ``take_along_axis`` indices trace to 64-bit values that Mosaic
    cannot lower ("64-bit types are not supported"). All Pallas-path
    operands are explicitly 32-bit or narrower, so disabling extended
    precision for the trace is semantics-preserving. fp64 inputs never
    reach this layer (they route through the XLA COO path)."""
    try:
        from jax._src.config import enable_x64 as _x64_ctx
    except ImportError:  # private API moved: rely on _i32map/_take_i32
        return fn

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        if any(
            getattr(a, "dtype", None) is not None
            and jnp.dtype(a.dtype).itemsize == 8
            for a in args
        ):
            # fp64 operands only occur in interpreter mode (CPU tests);
            # keep x64 semantics there
            return fn(*args, **kwargs)
        with _x64_ctx(False):
            return fn(*args, **kwargs)

    return wrapped


def _i32map(fn):
    """Pin a BlockSpec index_map's components to int32.

    Python int literals in index maps trace to int64 constants under
    ``jax_enable_x64``, giving Mosaic an unlowerable i64 transform
    function ("failed to legalize operation 'func.func'")."""

    def wrapped(*args):
        return tuple(
            jnp.int32(c) if isinstance(c, int) else c for c in fn(*args)
        )

    return wrapped


def _take_i32(a, idx, axis):
    """``jnp.take_along_axis`` with int32 indices and in-bounds mode.

    ``take_along_axis`` converts indices to the default int dtype, which
    is int64 under ``jax_enable_x64`` — unlowerable on TPU Pallas (no
    64-bit lanes). All kernel indices here are in-bounds by construction
    (bit-masked to 0..127 / 0..7), so emit the gather directly.
    """
    batch = 1 - axis
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(),
        collapsed_slice_dims=(axis,),
        start_index_map=(axis,),
        operand_batching_dims=(batch,),
        start_indices_batching_dims=(batch,),
    )
    return jax.lax.gather(
        a,
        idx.astype(jnp.int32)[..., None],
        dnums,
        slice_sizes=(1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def _stack_windows(x_ref, meta_ref, k, wmax=SUBLANES):
    """(8, 128) register of the chunk's x windows (only the first
    ``wmax`` rows are loaded; the rest are zeros — slot-packed plans cap
    windows at 4, halving the per-chunk VMEM loads)."""
    rows = [
        x_ref[pl.ds(meta_ref[0, k, 2 + i], 1), :] for i in range(wmax)
    ]
    if wmax < SUBLANES:
        rows.append(jnp.zeros((SUBLANES - wmax, LANES), x_ref.dtype))
    return jnp.concatenate(rows, axis=0)


def _stack_windows_b(x_ref, meta_ref, k, b, wmax=SUBLANES):
    rows = [
        x_ref[b, pl.ds(meta_ref[0, k, 2 + i], 1), :] for i in range(wmax)
    ]
    if wmax < SUBLANES:
        rows.append(jnp.zeros((SUBLANES - wmax, LANES), x_ref.dtype))
    return jnp.concatenate(rows, axis=0)


def _stack_windows_slim(x_ref, meta_ref, k, nwin):
    """W with only the first ``nwin`` window rows live (rest zeros)."""
    rows = [
        x_ref[pl.ds(meta_ref[0, k, 2 + i], 1), :] for i in range(nwin)
    ]
    pad = jnp.zeros((SUBLANES - nwin, LANES), x_ref.dtype)
    return jnp.concatenate(rows + [pad], axis=0)


def _stack_windows_slim_b(x_ref, meta_ref, k, b, nwin):
    rows = [
        x_ref[b, pl.ds(meta_ref[0, k, 2 + i], 1), :] for i in range(nwin)
    ]
    pad = jnp.zeros((SUBLANES - nwin, LANES), x_ref.dtype)
    return jnp.concatenate(rows + [pad], axis=0)


def _chunk(ref, k):
    """Chunk k's (8, 128) slab of a 2-D (K*8, 128) stream block."""
    return ref[k * SUBLANES:(k + 1) * SUBLANES, :]


def _stack_slab(x_ref, meta_ref, k):
    """Contiguous-range window stack: ONE dynamic (8, 128) slab load
    (plans with ``windows_contig``; rows [meta[k,2], meta[k,2]+8))."""
    return x_ref[pl.ds(meta_ref[0, k, 2], SUBLANES), :]


def _stack_slab_b(x_ref, meta_ref, k, b):
    return x_ref[b, pl.ds(meta_ref[0, k, 2], SUBLANES), :]


def _gather_x(W, pk):
    """Two-step gather: x value for every slot of the chunk."""
    if pk.dtype != jnp.int32:  # one-sided streams store int16
        # int16 packed is q | r2<<7 with bits 10-15 zero, so the shift
        # alone yields r2 — drops one mask op from the hot loop
        pk = pk.astype(jnp.int32)
        r2 = pk >> 7
    else:  # paired symmetric packs perm/valid above bit 9
        r2 = (pk >> 7) & 0x7
    q = pk & 0x7F
    G = _take_i32(W, r2, axis=0)
    return _take_i32(G, q, axis=1)


def _gather_x_deep(slabs, pk):
    """Deep-window gather: r2 is 5 bits (packed bits 7-11) indexing into
    ``len(slabs)`` stacked (8, 128) contiguous x slabs; each slab is
    gathered by r2 mod 8 and the right slab selected by r2 div 8."""
    r2 = (pk >> 7) & 0x1F
    G = _take_i32(slabs[0], r2 & 7, axis=0)
    for i in range(1, len(slabs)):
        Gi = _take_i32(slabs[i], r2 & 7, axis=0)
        G = jnp.where((r2 >> 3) == i, Gi, G)
    q = pk & 0x7F
    return _take_i32(G, q, axis=1)


def _chunk_contribs(stack, vals_ref, pk_ref, k0, run, *, depth):
    """Accumulate one run of chunks; returns the (1, 128) contribution.

    ``depth`` > 8 selects the deep-window gather (5-bit r2)."""
    acc = None
    for k in range(k0, k0 + run):
        pk = _chunk(pk_ref, k).astype(jnp.int32)
        if depth > 8:
            g = _gather_x_deep(stack(k), pk)
        else:
            r2 = (pk >> 7) & 0x1F
            G = _take_i32(stack(k)[0], r2 & 7, axis=0)
            g = _take_i32(G, pk & 0x7F, axis=1)
        vg = _chunk(vals_ref, k) * g
        acc = vg if acc is None else acc + vg
    return jnp.sum(acc, axis=0, keepdims=True)


def meta_word(meta):
    """(C,) packed meta word from a (C, META_W) contig/deep meta: the
    kernel needs only the target subrow ([:, 0]) and the x-slab base
    tile ([:, 2]) — window lists are implicit in contiguous-range
    plans. Works on host (numpy) or device arrays."""
    return (meta[:, 0] | (meta[:, 2] << WORD_SUB_BITS)).astype(jnp.int32)


def word_eligible(meta_np, *, contig, depth, tiles_per_block,
                  step_block_np=None) -> bool:
    """Whether a plan's meta can take the scalar-prefetch word path.

    With ``step_block_np`` the PREF_CMAX chunk cap is lifted when the
    stream can be SEGMENTED at out-block boundaries (``word_segments``)
    — each chained pallas_call prefetches only its own slice."""
    C = meta_np.shape[0]
    fits = C <= PREF_CMAX or (
        step_block_np is not None
        and word_segments(step_block_np, C // max(len(step_block_np), 1))
        is not None
    )
    return (
        (contig or depth > SUBLANES)
        and fits
        and tiles_per_block <= (1 << WORD_SUB_BITS)
        and (len(meta_np) == 0
             or int(meta_np[:, 2].max(initial=0)) < (1 << 21))
    )


def word_segments(step_block_np, K):
    """Grid-step boundaries splitting a word-path stream into segments
    of <= PREF_CMAX chunks, cutting ONLY where the output block changes
    (each block's chunks land in exactly one segment, so the per-call
    zero-on-new-block and lazy-store semantics are preserved; later
    calls alias the previous output, leaving foreign blocks untouched).
    Returns a tuple of step indices (0, ..., G) with >= 2 entries, or
    None when some single block exceeds PREF_CMAX chunks. A () return
    never happens; len == 2 means one segment (no chaining needed)."""
    sb = np.asarray(step_block_np)
    G = len(sb)
    if G == 0 or K <= 0:
        return (0, G)
    max_steps = max(PREF_CMAX // K, 1)
    # step indices where a new block starts
    starts = np.flatnonzero(np.diff(sb) != 0) + 1
    bounds = [0]
    cur = 0
    for nxt in list(starts) + [G]:
        if nxt - bounds[-1] > max_steps:
            # must cut before this block; cur is the last block start
            if cur == bounds[-1]:
                return None  # single block wider than the cap
            bounds.append(cur)
            if nxt - cur > max_steps:
                return None
        cur = nxt
    bounds.append(G)
    return tuple(int(b) for b in bounds)


def _word_contrib(vals_ref, pk_ref, x_ref, k, xb, *, depth, b=None):
    """(1, 128) row contribution of chunk k with slab base ``xb``."""

    def slab(off, n=SUBLANES):
        if b is None:
            return x_ref[pl.ds(off, n), :]
        return x_ref[b, pl.ds(off, n), :]

    pk16 = _chunk(pk_ref, k)
    if depth > SUBLANES:
        pk = pk16.astype(jnp.int32)
        slabs = [slab(xb + 8 * i) for i in range(depth // SUBLANES)]
        g = _gather_x_deep(slabs, pk)
    else:
        g = _gather_x(slab(xb), pk16)
    vg = _chunk(vals_ref, k) * g
    return jnp.sum(vg, axis=0, keepdims=True)


def _nib_consts():
    """Per-step iota constants for the nibble unpack (computed in-kernel
    — Pallas rejects captured array constants)."""
    row8 = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 0)
    shift = (row8 & 1) << 2
    dup = row8 >> 1  # 0,0,1,1,2,2,3,3
    return dup, shift


def _nib_contrib(vals_ref, q_ref, nib_ref, x_ref, k, xb, dup, shift, *,
                 depth, b=None):
    """Nibble-stream variant of ``_word_contrib`` (depth <= 16, rot 1):
    q is an int8 stream (1 B/slot) and the 4-bit window index rides a
    half-height int8 nibble stream (0.5 B/slot) — 1.5 B/slot of index
    traffic instead of int16's 2 B. Chunk pairs share one (8, 128)
    nibble block: even chunks read rows 0-3 (dup), odd rows 4-7."""

    def slab(off):
        if b is None:
            return x_ref[pl.ds(off, SUBLANES), :]
        return x_ref[b, pl.ds(off, SUBLANES), :]

    nibpair = nib_ref[
        (k // 2) * SUBLANES:(k // 2 + 1) * SUBLANES, :
    ].astype(jnp.int32)
    d = dup if k % 2 == 0 else dup + 4
    r2 = (_take_i32(nibpair, d, axis=0) >> shift) & 0xF
    q = q_ref[k * SUBLANES:(k + 1) * SUBLANES, :].astype(jnp.int32)
    G = _take_i32(slab(xb), r2 & 7, axis=0)
    if depth > SUBLANES:
        Gi = _take_i32(slab(xb + 8), r2 & 7, axis=0)
        G = jnp.where((r2 >> 3) == 1, Gi, G)
    g = _take_i32(G, q, axis=1)
    vg = _chunk(vals_ref, k) * g
    return jnp.sum(vg, axis=0, keepdims=True)


class _LazyRow:
    """Lazy-store row accumulator (measured v5e, round 4): ANY per-chunk
    VMEM read-modify-write costs ~2.2 ns (the load of ``+=`` cannot be
    reordered past the previous chunk's possibly-aliasing store, so RMWs
    serialize), while pure dynamic stores pipeline. The accumulator
    lives in a register; it resets when ``sub`` changes (chunks are
    tile-sorted, so a tile's chunks are consecutive) and the row is
    OVERWRITTEN every chunk — back-to-back WAW stores to the same row
    retire in order, so the tile's last store carries the full sum.
    One dynamic load per grid step (k == 0) picks up tiles straddling
    steps; K-padding chunks re-store the last real chunk's row (the
    planner forward-fills their meta — contributing exact 0) instead of
    resetting an arbitrary row. 88.0 -> 75.1 us on the audikw-proxy far
    stream (10.9 -> 9.3 ns/chunk; stream-pipeline floor 8.4)."""

    def __init__(self, y_ref, b=None):
        self.y_ref = y_ref
        self.b = b
        self.acc = None
        self.prev = None

    def _row(self, sub):
        if self.b is None:
            return self.y_ref[pl.ds(sub, 1), :]
        return self.y_ref[self.b, pl.ds(sub, 1), :]

    def add(self, sub, contrib):
        if self.acc is None:
            self.acc = self._row(sub) + contrib
        else:
            self.acc = jnp.where(
                sub == self.prev, self.acc, jnp.zeros_like(self.acc)
            ) + contrib
        if self.b is None:
            self.y_ref[pl.ds(sub, 1), :] = self.acc
        else:
            self.y_ref[self.b, pl.ds(sub, 1), :] = self.acc
        self.prev = sub


def _bell2_word_kernel(sb_ref, mw_ref, vals_ref, pk_ref, x_ref, y_ref,
                       *, K, depth):
    _zero_on_new_block(sb_ref, y_ref)
    g = pl.program_id(0)
    base0 = g * K
    lazy = _LazyRow(y_ref)
    for k in range(K):
        w = mw_ref[base0 + k]
        sub = w & ((1 << WORD_SUB_BITS) - 1)
        xb = w >> WORD_SUB_BITS
        contrib = _word_contrib(vals_ref, pk_ref, x_ref, k, xb,
                                depth=depth)
        lazy.add(sub, contrib)


def _bell2_nib_kernel(sb_ref, mw_ref, vals_ref, q_ref, nib_ref, x_ref,
                      y_ref, *, K, depth):
    _zero_on_new_block(sb_ref, y_ref)
    base0 = pl.program_id(0) * K
    dup, shift = _nib_consts()
    lazy = _LazyRow(y_ref)
    for k in range(K):
        w = mw_ref[base0 + k]
        sub = w & ((1 << WORD_SUB_BITS) - 1)
        xb = w >> WORD_SUB_BITS
        contrib = _nib_contrib(vals_ref, q_ref, nib_ref, x_ref, k, xb,
                               dup, shift, depth=depth)
        lazy.add(sub, contrib)


def _bell2_nib_accum_kernel(sb_ref, mw_ref, vals_ref, q_ref, nib_ref,
                            x_ref, yin_ref, y_ref, *, K, depth):
    g = pl.program_id(0)

    @pl.when(
        jnp.logical_or(g == 0, sb_ref[g] != sb_ref[jnp.maximum(g - 1, 0)])
    )
    def _():
        y_ref[...] = yin_ref[...]

    base0 = g * K
    dup, shift = _nib_consts()
    for k in range(K):
        w = mw_ref[base0 + k]
        sub = w & ((1 << WORD_SUB_BITS) - 1)
        xb = w >> WORD_SUB_BITS
        contrib = _nib_contrib(vals_ref, q_ref, nib_ref, x_ref, k, xb,
                               dup, shift, depth=depth)
        y_ref[pl.ds(sub, 1), :] += contrib


class _LazyRowMM:
    """Multi-RHS lazy-store accumulator: one (B, 1, 128) register acc,
    one strided store per chunk (see ``_LazyRow``)."""

    def __init__(self, y_ref):
        self.y_ref = y_ref
        self.acc = None
        self.prev = None

    def add(self, sub, contrib):
        if self.acc is None:
            self.acc = self.y_ref[:, pl.ds(sub, 1), :] + contrib
        else:
            self.acc = jnp.where(
                sub == self.prev, self.acc, jnp.zeros_like(self.acc)
            ) + contrib
        self.y_ref[:, pl.ds(sub, 1), :] = self.acc
        self.prev = sub


def _bell2_nib_mm_kernel(sb_ref, mw_ref, vals_ref, q_ref, nib_ref,
                         x_ref, y_ref, *, K, n_rhs, depth):
    _zero_on_new_block(sb_ref, y_ref)
    base0 = pl.program_id(0) * K
    dup, shift = _nib_consts()
    lazy = _LazyRowMM(y_ref)
    for k in range(K):
        w = mw_ref[base0 + k]
        sub = w & ((1 << WORD_SUB_BITS) - 1)
        xb = w >> WORD_SUB_BITS
        contribs = [
            _nib_contrib(vals_ref, q_ref, nib_ref, x_ref, k, xb, dup,
                         shift, depth=depth, b=b)[None]
            for b in range(n_rhs)
        ]
        lazy.add(sub, jnp.concatenate(contribs, 0))


def _bell2_nib_mm_accum_kernel(sb_ref, mw_ref, vals_ref, q_ref,
                               nib_ref, x_ref, yin_ref, y_ref, *, K,
                               n_rhs, depth):
    g = pl.program_id(0)

    @pl.when(
        jnp.logical_or(g == 0, sb_ref[g] != sb_ref[jnp.maximum(g - 1, 0)])
    )
    def _():
        y_ref[...] = yin_ref[...]

    base0 = g * K
    dup, shift = _nib_consts()
    for k in range(K):
        w = mw_ref[base0 + k]
        sub = w & ((1 << WORD_SUB_BITS) - 1)
        xb = w >> WORD_SUB_BITS
        contribs = [
            _nib_contrib(vals_ref, q_ref, nib_ref, x_ref, k, xb, dup,
                         shift, depth=depth, b=b)[None]
            for b in range(n_rhs)
        ]
        y_ref[:, pl.ds(sub, 1), :] += jnp.concatenate(contribs, 0)


def _bell2_word_accum_kernel(sb_ref, mw_ref, vals_ref, pk_ref, x_ref,
                             yin_ref, y_ref, *, K, depth):
    g = pl.program_id(0)

    @pl.when(
        jnp.logical_or(g == 0, sb_ref[g] != sb_ref[jnp.maximum(g - 1, 0)])
    )
    def _():
        y_ref[...] = yin_ref[...]

    base0 = g * K
    for k in range(K):
        w = mw_ref[base0 + k]
        sub = w & ((1 << WORD_SUB_BITS) - 1)
        xb = w >> WORD_SUB_BITS
        contrib = _word_contrib(vals_ref, pk_ref, x_ref, k, xb,
                                depth=depth)
        y_ref[pl.ds(sub, 1), :] += contrib


def _bell2_word_mm_kernel(sb_ref, mw_ref, vals_ref, pk_ref, x_ref,
                          y_ref, *, K, n_rhs, depth):
    _zero_on_new_block(sb_ref, y_ref)
    g = pl.program_id(0)
    base0 = g * K
    lazy = _LazyRowMM(y_ref)
    for k in range(K):
        w = mw_ref[base0 + k]
        sub = w & ((1 << WORD_SUB_BITS) - 1)
        xb = w >> WORD_SUB_BITS
        contribs = [
            _word_contrib(vals_ref, pk_ref, x_ref, k, xb, depth=depth,
                          b=b)[None]
            for b in range(n_rhs)
        ]
        lazy.add(sub, jnp.concatenate(contribs, 0))


def _bell2_word_mm_accum_kernel(sb_ref, mw_ref, vals_ref, pk_ref,
                                x_ref, yin_ref, y_ref, *, K, n_rhs,
                                depth):
    g = pl.program_id(0)

    @pl.when(
        jnp.logical_or(g == 0, sb_ref[g] != sb_ref[jnp.maximum(g - 1, 0)])
    )
    def _():
        y_ref[...] = yin_ref[...]

    base0 = g * K
    for k in range(K):
        w = mw_ref[base0 + k]
        sub = w & ((1 << WORD_SUB_BITS) - 1)
        xb = w >> WORD_SUB_BITS
        contribs = [
            _word_contrib(vals_ref, pk_ref, x_ref, k, xb, depth=depth,
                          b=b)[None]
            for b in range(n_rhs)
        ]
        y_ref[:, pl.ds(sub, 1), :] += jnp.concatenate(contribs, 0)


def _bell2_word_seg_kernel(sb_ref, mw_ref, vals_ref, pk_ref, x_ref,
                           yin_ref, y_ref, *, K, depth):
    """Word kernel over an ALIASED output (chained segment calls): the
    incoming y is identical storage, untouched except this segment's
    own blocks (zero-on-new-block + lazy stores as usual)."""
    del yin_ref
    _bell2_word_kernel(sb_ref, mw_ref, vals_ref, pk_ref, x_ref, y_ref,
                       K=K, depth=depth)


def _bell2_nib_seg_kernel(sb_ref, mw_ref, vals_ref, q_ref, nib_ref,
                          x_ref, yin_ref, y_ref, *, K, depth):
    del yin_ref
    _bell2_nib_kernel(sb_ref, mw_ref, vals_ref, q_ref, nib_ref, x_ref,
                      y_ref, K=K, depth=depth)


def _bell2_word_mm_seg_kernel(sb_ref, mw_ref, vals_ref, pk_ref, x_ref,
                              yin_ref, y_ref, *, K, n_rhs, depth):
    del yin_ref
    _bell2_word_mm_kernel(sb_ref, mw_ref, vals_ref, pk_ref, x_ref,
                          y_ref, K=K, n_rhs=n_rhs, depth=depth)


def _bell2_nib_mm_seg_kernel(sb_ref, mw_ref, vals_ref, q_ref, nib_ref,
                             x_ref, yin_ref, y_ref, *, K, n_rhs, depth):
    del yin_ref
    _bell2_nib_mm_kernel(sb_ref, mw_ref, vals_ref, q_ref, nib_ref,
                         x_ref, y_ref, K=K, n_rhs=n_rhs, depth=depth)


def _run_word_segmented(segs, K, BT, depth, mw, vals, packed, nib,
                        step_block, x, out_shape, B=None,
                        interpret=False):
    """Chained per-segment pallas_calls for word/nib streams past
    PREF_CMAX chunks: each call scalar-prefetches only its own meta
    slice and aliases the previous output (segments never share an
    out block — ``word_segments``)."""
    out = None
    nibk = nib is not None
    for i in range(len(segs) - 1):
        s0, s1 = segs[i], segs[i + 1]
        c0, c1 = s0 * K, s1 * K
        G = s1 - s0
        sb_i = step_block[s0:s1]
        mw_i = mw[c0:c1]
        vals_i = vals[c0 * SUBLANES:c1 * SUBLANES]
        pk_i = packed[c0 * SUBLANES:c1 * SUBLANES]
        args = [sb_i, mw_i, vals_i, pk_i]
        if nibk:
            args.append(nib[c0 * 4:c1 * 4])
        args.append(x)
        if i == 0:
            if nibk:
                kern = functools.partial(
                    _bell2_nib_kernel if B is None else
                    functools.partial(_bell2_nib_mm_kernel, n_rhs=B),
                    K=K, depth=depth,
                )
            else:
                kern = functools.partial(
                    _bell2_word_kernel if B is None else
                    functools.partial(_bell2_word_mm_kernel, n_rhs=B),
                    K=K, depth=depth,
                )
            out = pl.pallas_call(
                kern,
                grid_spec=_grid_spec_word(G, K, BT, B=B, nib=nibk),
                out_shape=out_shape,
                interpret=interpret,
            )(*args)
        else:
            if nibk:
                kern = functools.partial(
                    _bell2_nib_seg_kernel if B is None else
                    functools.partial(_bell2_nib_mm_seg_kernel, n_rhs=B),
                    K=K, depth=depth,
                )
                alias = {6: 0}
            else:
                kern = functools.partial(
                    _bell2_word_seg_kernel if B is None else
                    functools.partial(
                        _bell2_word_mm_seg_kernel, n_rhs=B
                    ),
                    K=K, depth=depth,
                )
                alias = {5: 0}
            out = pl.pallas_call(
                kern,
                grid_spec=_grid_spec_word(
                    G, K, BT, B=B, accum=True, nib=nibk
                ),
                out_shape=out_shape,
                input_output_aliases=alias,
                interpret=interpret,
            )(*args, out)
    return out


def _zero_on_new_block(sb_ref, y_ref):
    g = pl.program_id(0)

    @pl.when(
        jnp.logical_or(g == 0, sb_ref[g] != sb_ref[jnp.maximum(g - 1, 0)])
    )
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)


def _bell2_kernel(sb_ref, meta_ref, vals_ref, pk_ref, x_ref, y_ref, *, K,
                  run=1, wmax=SUBLANES, contig=False,
                  depth=SUBLANES):
    _zero_on_new_block(sb_ref, y_ref)

    if depth > SUBLANES:  # deep windows (contig only)
        def stack_deep(k):
            return [
                x_ref[pl.ds(meta_ref[0, k, 2] + 8 * i, SUBLANES), :]
                for i in range(depth // SUBLANES)
            ]

        for k0 in range(0, K, run):
            contrib = _chunk_contribs(
                stack_deep, vals_ref, pk_ref, k0, run, depth=depth,
            )
            y_ref[pl.ds(meta_ref[0, k0, 0], 1), :] += contrib
        return

    def stack(k):
        if contig:
            return _stack_slab(x_ref, meta_ref, k)
        return _stack_windows(x_ref, meta_ref, k, wmax)

    for k0 in range(0, K, run):
        # a run's chunks share one row tile: accumulate in register and
        # flush one sum + read-modify-write per run
        acc = None
        for k in range(k0, k0 + run):
            W = stack(k)
            g = _gather_x(W, _chunk(pk_ref, k))
            vg = _chunk(vals_ref, k) * g
            acc = vg if acc is None else acc + vg
        contrib = jnp.sum(acc, axis=0, keepdims=True)
        y_ref[pl.ds(meta_ref[0, k0, 0], 1), :] += contrib


def _grid_spec(G, K, BT):
    # one-sided streams are 2-D (C*8, 128): full native tiles for every
    # element width (the kernel is DMA-bound; 3-D (C,8,128) blocks pad
    # 16-bit data to half-empty (16,128) tiles and double its traffic)
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(
                (1, K, META_W), _i32map(lambda g, s: (g, 0, 0)),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (K * SUBLANES, LANES), _i32map(lambda g, s: (g, 0))
            ),
            pl.BlockSpec(
                (K * SUBLANES, LANES), _i32map(lambda g, s: (g, 0))
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BT, LANES), _i32map(lambda g, s: (s[g], 0))),
    )


def _grid_spec_word(G, K, BT, *, accum=False, B=None, nib=False):
    """Grid spec for the scalar-prefetch word path: the per-chunk meta
    word array is prefetched whole into SMEM (num_scalar_prefetch=2),
    removing the per-step SMEM-blocked operand that stalls the stream
    pipeline ~677 ns/step (docs/KERNEL_NOTES_R3.md). ``nib`` adds the
    half-height nibble window stream after the q stream."""
    stream = pl.BlockSpec(
        (K * SUBLANES, LANES), _i32map(lambda g, s, m: (g, 0))
    )
    if B is None:
        out = pl.BlockSpec((BT, LANES), _i32map(lambda g, s, m: (s[g], 0)))
    else:
        out = pl.BlockSpec(
            (B, BT, LANES), _i32map(lambda g, s, m: (0, s[g], 0))
        )
    in_specs = [stream, stream]
    if nib:
        in_specs.append(
            pl.BlockSpec((K * 4, LANES), _i32map(lambda g, s, m: (g, 0)))
        )
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if accum:
        in_specs.append(out)
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=in_specs,
        out_specs=out,
    )


def nib_split(packed_np):
    """(q8, nib) int8 streams from a (C*8, 128) int16 one-sided packed
    stream with depth <= 16 and rot == 1 (q bits 0-6, r2 bits 7-10):
    1.5 B/slot of index traffic instead of 2 (measured ~2.5% on the
    audikw far stream — the kernel is stream-DMA-bound)."""
    C = packed_np.shape[0] // SUBLANES
    pk = np.asarray(packed_np, np.int32).reshape(C, SUBLANES, LANES)
    q8 = (pk & 0x7F).astype(np.int8).reshape(C * SUBLANES, LANES)
    r2 = (pk >> 7) & 0xF
    nib = (r2[:, 0::2, :] | (r2[:, 1::2, :] << 4)).astype(np.int8)
    return q8, nib.reshape(C * 4, LANES)


def _grid_spec_mm(G, K, BT, B):
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(
                (1, K, META_W), _i32map(lambda g, s: (g, 0, 0)),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (K * SUBLANES, LANES), _i32map(lambda g, s: (g, 0))
            ),
            pl.BlockSpec(
                (K * SUBLANES, LANES), _i32map(lambda g, s: (g, 0))
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (B, BT, LANES), _i32map(lambda g, s: (0, s[g], 0))
        ),
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_row_tiles", "chunks_per_step", "tiles_per_block",
                     "interpret", "run", "wmax", "contig",
                     "depth", "rot", "segs"),
)
@_no_x64
def bell2_spmv_tiles(
    vals, packed, meta, step_block, x2d,
    *,
    num_row_tiles: int,
    chunks_per_step: int,
    tiles_per_block: int,
    interpret: bool = False,
    run: int = 1,
    wmax: int = SUBLANES,
    contig: bool = False,
    depth: int = SUBLANES,
    rot: int = 1,
    nib=None,
    segs: tuple = (),
):
    """y tiles (T, 128) = A @ x for one BELL2 stream.

    ``meta`` is either the (C, META_W) streamed table or a (C,) packed
    word array (``meta_word``) — the word form takes the
    scalar-prefetch fast path (contig/deep plans only). With ``nib``,
    ``packed`` is the int8 q stream and ``nib`` the half-height window
    nibbles (``nib_split``). ``segs`` (``word_segments``) chains
    per-segment calls for streams past PREF_CMAX chunks."""
    assert rot == 1, (
        "lane rotation was pruned in round 4: measured 9.2 -> 33.3 "
        "ns/chunk at rot=2 on v5e (the per-group masked accumulators + "
        "rolls always cost more than rotation can save in chunks)"
    )
    C = vals.shape[0] // SUBLANES
    K, BT = chunks_per_step, tiles_per_block
    assert C % K == 0, f"chunk stream not padded to K={K} (C={C})"
    G = C // K
    tiles_padded = -(-num_row_tiles // BT) * BT
    if meta.ndim == 1:
        oshape = jax.ShapeDtypeStruct((tiles_padded, LANES), x2d.dtype)
        if len(segs) > 2:
            out = _run_word_segmented(
                segs, K, BT, depth, meta, vals, packed, nib,
                step_block, x2d, oshape, interpret=interpret,
            )
            return out[:num_row_tiles]
        if nib is not None:
            out = pl.pallas_call(
                functools.partial(_bell2_nib_kernel, K=K, depth=depth),
                grid_spec=_grid_spec_word(G, K, BT, nib=True),
                out_shape=oshape,
                interpret=interpret,
            )(step_block, meta, vals, packed, nib, x2d)
            return out[:num_row_tiles]
        out = pl.pallas_call(
            functools.partial(_bell2_word_kernel, K=K, depth=depth),
            grid_spec=_grid_spec_word(G, K, BT),
            out_shape=oshape,
            interpret=interpret,
        )(step_block, meta, vals, packed, x2d)
        return out[:num_row_tiles]
    out = pl.pallas_call(
        functools.partial(_bell2_kernel, K=K, run=run, wmax=wmax,
                          contig=contig, depth=depth),
        grid_spec=_grid_spec(G, K, BT),
        out_shape=jax.ShapeDtypeStruct((tiles_padded, LANES), x2d.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * C * SUBLANES * LANES,
            bytes_accessed=vals.size * vals.dtype.itemsize
            + packed.size * packed.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        step_block,
        meta.reshape(G, K, META_W),
        vals,
        packed,
        x2d,
    )
    return out[:num_row_tiles]


def _bell2_accum_kernel(
    sb_ref, meta_ref, vals_ref, pk_ref, x_ref, yin_ref, y_ref, *, K, run=1,
    wmax=SUBLANES, contig=False, depth=SUBLANES,
):
    g = pl.program_id(0)

    @pl.when(
        jnp.logical_or(g == 0, sb_ref[g] != sb_ref[jnp.maximum(g - 1, 0)])
    )
    def _():
        y_ref[...] = yin_ref[...]

    if depth > SUBLANES:  # deep windows (contig only)
        def stack_deep(k):
            return [
                x_ref[pl.ds(meta_ref[0, k, 2] + 8 * i, SUBLANES), :]
                for i in range(depth // SUBLANES)
            ]

        for k0 in range(0, K, run):
            contrib = _chunk_contribs(
                stack_deep, vals_ref, pk_ref, k0, run, depth=depth,
            )
            y_ref[pl.ds(meta_ref[0, k0, 0], 1), :] += contrib
        return

    def stack(k):
        if contig:
            return _stack_slab(x_ref, meta_ref, k)
        return _stack_windows(x_ref, meta_ref, k, wmax)

    for k0 in range(0, K, run):
        acc = None
        for k in range(k0, k0 + run):
            W = stack(k)
            g = _gather_x(W, _chunk(pk_ref, k))
            vg = _chunk(vals_ref, k) * g
            acc = vg if acc is None else acc + vg
        contrib = jnp.sum(acc, axis=0, keepdims=True)
        y_ref[pl.ds(meta_ref[0, k0, 0], 1), :] += contrib


@functools.partial(
    jax.jit,
    static_argnames=("num_row_tiles", "chunks_per_step", "tiles_per_block",
                     "interpret", "run", "wmax", "contig",
                     "depth", "rot"),
)
@_no_x64
def bell2_spmv_tiles_accum(
    vals, packed, meta, step_block, x2d, y_tiles,
    *,
    num_row_tiles: int,
    chunks_per_step: int,
    tiles_per_block: int,
    interpret: bool = False,
    run: int = 1,
    wmax: int = SUBLANES,
    contig: bool = False,
    depth: int = SUBLANES,
    rot: int = 1,
    nib=None,
):
    """y_tiles += A @ x for a sparse accumulating BELL2 stream.

    The stream may leave output blocks unvisited (built with
    ``cover_all_tiles=False``); ``y_tiles`` is aliased into the output so
    untouched blocks keep their prior values. Used for the symmetric
    plan's far residual, whose nonzeros touch few tiles."""
    assert rot == 1, (
        "lane rotation was pruned in round 4: measured 9.2 -> 33.3 "
        "ns/chunk at rot=2 on v5e (the per-group masked accumulators + "
        "rolls always cost more than rotation can save in chunks)"
    )
    C = vals.shape[0] // SUBLANES
    K, BT = chunks_per_step, tiles_per_block
    assert C % K == 0
    G = C // K
    tiles_padded = -(-num_row_tiles // BT) * BT
    assert y_tiles.shape == (tiles_padded, LANES)
    if meta.ndim == 1:
        if nib is not None:
            return pl.pallas_call(
                functools.partial(
                    _bell2_nib_accum_kernel, K=K, depth=depth
                ),
                grid_spec=_grid_spec_word(G, K, BT, accum=True, nib=True),
                out_shape=jax.ShapeDtypeStruct(
                    (tiles_padded, LANES), x2d.dtype
                ),
                input_output_aliases={6: 0},
                interpret=interpret,
            )(step_block, meta, vals, packed, nib, x2d, y_tiles)
        return pl.pallas_call(
            functools.partial(_bell2_word_accum_kernel, K=K,
                              depth=depth),
            grid_spec=_grid_spec_word(G, K, BT, accum=True),
            out_shape=jax.ShapeDtypeStruct(
                (tiles_padded, LANES), x2d.dtype
            ),
            input_output_aliases={5: 0},
            interpret=interpret,
        )(step_block, meta, vals, packed, x2d, y_tiles)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(
                (1, K, META_W), _i32map(lambda g, s: (g, 0, 0)),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (K * SUBLANES, LANES), _i32map(lambda g, s: (g, 0))
            ),
            pl.BlockSpec(
                (K * SUBLANES, LANES), _i32map(lambda g, s: (g, 0))
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, LANES), _i32map(lambda g, s: (s[g], 0))),
        ],
        out_specs=pl.BlockSpec((BT, LANES), _i32map(lambda g, s: (s[g], 0))),
    )
    return pl.pallas_call(
        functools.partial(_bell2_accum_kernel, K=K, run=run, wmax=wmax,
                          contig=contig, depth=depth),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tiles_padded, LANES), x2d.dtype),
        input_output_aliases={5: 0},
        interpret=interpret,
    )(
        step_block,
        meta.reshape(G, K, META_W),
        vals,
        packed,
        x2d,
        y_tiles,
    )


def _bell2_mm_kernel(
    sb_ref, meta_ref, vals_ref, pk_ref, x_ref, y_ref, *, K, n_rhs, run=1,
    wmax=SUBLANES, contig=False, depth=SUBLANES,
):
    _zero_on_new_block(sb_ref, y_ref)

    if depth > SUBLANES:  # deep windows (contig only)
        for k0 in range(0, K, run):
            sub = meta_ref[0, k0, 0]
            contribs = []
            for b in range(n_rhs):
                def stack_deep(k, b=b):
                    return [
                        x_ref[
                            b,
                            pl.ds(meta_ref[0, k, 2] + 8 * i, SUBLANES),
                            :,
                        ]
                        for i in range(depth // SUBLANES)
                    ]

                contribs.append(_chunk_contribs(
                    stack_deep, vals_ref, pk_ref, k0, run, depth=depth,
                )[None])
            # one strided read-modify-write across all RHS (r3: per-b
            # RMWs dominated the MM kernel once run padding was dropped)
            y_ref[:, pl.ds(sub, 1), :] += jnp.concatenate(contribs, 0)
        return

    def stack(k, b):
        if contig:
            return _stack_slab_b(x_ref, meta_ref, k, b)
        return _stack_windows_b(x_ref, meta_ref, k, b, wmax)

    for k0 in range(0, K, run):
        sub = meta_ref[0, k0, 0]
        contribs = []
        for b in range(n_rhs):
            acc = None
            for k in range(k0, k0 + run):
                W = stack(k, b)
                g = _gather_x(W, _chunk(pk_ref, k))
                vg = _chunk(vals_ref, k) * g
                acc = vg if acc is None else acc + vg
            contribs.append(jnp.sum(acc, axis=0, keepdims=True)[None])
        y_ref[:, pl.ds(sub, 1), :] += jnp.concatenate(contribs, 0)


@functools.partial(
    jax.jit,
    static_argnames=("num_row_tiles", "chunks_per_step", "tiles_per_block",
                     "interpret", "run", "wmax", "contig",
                     "depth", "rot", "segs"),
)
@_no_x64
def bell2_spmm_tiles(
    vals, packed, meta, step_block, x3d,
    *,
    num_row_tiles: int,
    chunks_per_step: int,
    tiles_per_block: int,
    interpret: bool = False,
    run: int = 1,
    wmax: int = SUBLANES,
    contig: bool = False,
    depth: int = SUBLANES,
    rot: int = 1,
    nib=None,
    segs: tuple = (),
):
    """Y tiles (B, T, 128) = A @ X for B right-hand sides."""
    assert rot == 1, (
        "lane rotation was pruned in round 4: measured 9.2 -> 33.3 "
        "ns/chunk at rot=2 on v5e (the per-group masked accumulators + "
        "rolls always cost more than rotation can save in chunks)"
    )
    C = vals.shape[0] // SUBLANES
    B = x3d.shape[0]
    K, BT = chunks_per_step, tiles_per_block
    assert C % K == 0
    G = C // K
    tiles_padded = -(-num_row_tiles // BT) * BT
    if meta.ndim == 1:
        oshape = jax.ShapeDtypeStruct(
            (B, tiles_padded, LANES), x3d.dtype
        )
        if len(segs) > 2:
            out = _run_word_segmented(
                segs, K, BT, depth, meta, vals, packed, nib,
                step_block, x3d, oshape, B=B, interpret=interpret,
            )
            return out[:, :num_row_tiles]
        if nib is not None:
            out = pl.pallas_call(
                functools.partial(
                    _bell2_nib_mm_kernel, K=K, n_rhs=B, depth=depth
                ),
                grid_spec=_grid_spec_word(G, K, BT, B=B, nib=True),
                out_shape=oshape,
                interpret=interpret,
            )(step_block, meta, vals, packed, nib, x3d)
            return out[:, :num_row_tiles]
        out = pl.pallas_call(
            functools.partial(_bell2_word_mm_kernel, K=K, n_rhs=B,
                              depth=depth),
            grid_spec=_grid_spec_word(G, K, BT, B=B),
            out_shape=oshape,
            interpret=interpret,
        )(step_block, meta, vals, packed, x3d)
        return out[:, :num_row_tiles]
    out = pl.pallas_call(
        functools.partial(_bell2_mm_kernel, K=K, n_rhs=B, run=run, wmax=wmax,
                          contig=contig, depth=depth),
        grid_spec=_grid_spec_mm(G, K, BT, B),
        out_shape=jax.ShapeDtypeStruct(
            (B, tiles_padded, LANES), x3d.dtype
        ),
        interpret=interpret,
    )(
        step_block,
        meta.reshape(G, K, META_W),
        vals,
        packed,
        x3d,
    )
    return out[:, :num_row_tiles]


def _unperm_body(row_at, pk, g2, W, b=None):
    """(8, 128) unpermuted values for one 1024-row out-block.

    pk packs q (bits 0-6) | w (bits 7+, index into the block's window-row
    list) per original row; -1 rows emit exact 0 (absent rows, rows in
    unvisited blocks of sparse grouped grids). Each window row is one
    (1, 128) tile row of the grouped output; its values are lane-gathered
    by q (the index lives AT the out position, so — unlike the stream
    kernels' two-step gather, whose q/r2 occupy different logical
    positions — no packing discipline is needed) and selected where the
    out row's window index matches. Class-bucketed grouping keeps each
    block's slot runs contiguous, so W stays small
    (``formats/bell2._build_unperm``)."""
    w_of = pk >> 7  # -1 rows go negative: never matches a window
    q = pk & 0x7F
    out = None
    for w in range(W):
        src = (
            g2[pl.ds(row_at(w), 1), :]
            if b is None
            else g2[b, pl.ds(row_at(w), 1), :]
        )
        Hw = _take_i32(
            jnp.broadcast_to(src, (SUBLANES, LANES)), q, axis=1
        )
        out = Hw if out is None else jnp.where(w_of == w, Hw, out)
    return jnp.where(pk < 0, jnp.zeros_like(out), out)


#: out-blocks per unpermute grid step — amortizes the ~600 ns/step grid
#: cost (measured r3: 88 single-block steps took 17.9 us; at BPG=8 the
#: audikw proxy's 11 steps still cost 7 us, so batch 4x more)
UNPERM_BPG = 32


def _unperm_kernel(rows_ref, pk_ref, g2_ref, y_ref, *, W, bpg):
    g = pl.program_id(0)
    for i in range(bpg):
        sl = slice(i * SUBLANES, (i + 1) * SUBLANES)
        y_ref[sl, :] = _unperm_body(
            lambda w, i=i: rows_ref[g * bpg + i, w], pk_ref[sl, :],
            g2_ref, W
        )


def _unperm_mm_kernel(rows_ref, pk_ref, g2_ref, y_ref, *, W, n_rhs, bpg):
    g = pl.program_id(0)
    for i in range(bpg):
        sl = slice(i * SUBLANES, (i + 1) * SUBLANES)
        pk = pk_ref[sl, :]
        for b in range(n_rhs):
            y_ref[b, sl, :] = _unperm_body(
                lambda w, i=i: rows_ref[g * bpg + i, w], pk, g2_ref, W,
                b=b
            )


@functools.partial(jax.jit, static_argnames=("W", "interpret"))
@_no_x64
def unperm_gather_tiles(pk2d, rows, g_tiles, *, W: int,
                        interpret: bool = False):
    """(nb*8, 128) original-order y tiles from grouped output tiles.

    The O(n) unpermute of degree-grouped plans. XLA's elementwise 1-D
    gather costs ~7 ns/row on v5e (647 us at 90k rows — it dominated the
    round-2 grouped plans, BENCH_r02/r03); this kernel runs ~4 vector
    ops per window row per 1024-row block, UNPERM_BPG blocks per grid
    step (measured ~200 ns/step grid floor)."""
    nb = rows.shape[0]
    W_ = rows.shape[1]
    nbp = -(-nb // UNPERM_BPG)
    if nbp * UNPERM_BPG != nb:
        pk2d = jnp.pad(
            pk2d, ((0, (nbp * UNPERM_BPG - nb) * SUBLANES), (0, 0)),
            constant_values=-1,
        )
        rows = jnp.pad(rows, ((0, nbp * UNPERM_BPG - nb), (0, 0)))
    # the window-row table is scalar-prefetched whole (4*W B/block —
    # tiny): a per-step SMEM-blocked operand stalls the pipeline
    # ~500 ns/step (docs/KERNEL_NOTES_R3.md; 5.8 -> ~2 us on the
    # audikw proxy's 88 blocks)
    return pl.pallas_call(
        functools.partial(_unperm_kernel, W=W, bpg=UNPERM_BPG),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nbp,),
            in_specs=[
                pl.BlockSpec((UNPERM_BPG * SUBLANES, LANES),
                             _i32map(lambda g, r: (g, 0))),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (UNPERM_BPG * SUBLANES, LANES),
                _i32map(lambda g, r: (g, 0))
            ),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (nbp * UNPERM_BPG * SUBLANES, LANES), g_tiles.dtype
        ),
        interpret=interpret,
    )(rows.astype(jnp.int32), pk2d, g_tiles)[
        : nb * SUBLANES
    ]


@functools.partial(jax.jit, static_argnames=("W", "interpret"))
@_no_x64
def unperm_gather_tiles_mm(pk2d, rows, g_tiles, *, W: int,
                           interpret: bool = False):
    """(B, nb*8, 128) unpermuted Y tiles from grouped (B, T, 128)."""
    nb = rows.shape[0]
    B = g_tiles.shape[0]
    nbp = -(-nb // UNPERM_BPG)
    if nbp * UNPERM_BPG != nb:
        pk2d = jnp.pad(
            pk2d, ((0, (nbp * UNPERM_BPG - nb) * SUBLANES), (0, 0)),
            constant_values=-1,
        )
        rows = jnp.pad(rows, ((0, nbp * UNPERM_BPG - nb), (0, 0)))
    return pl.pallas_call(
        functools.partial(
            _unperm_mm_kernel, W=W, n_rhs=B, bpg=UNPERM_BPG
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nbp,),
            in_specs=[
                pl.BlockSpec((UNPERM_BPG * SUBLANES, LANES),
                             _i32map(lambda g, r: (g, 0))),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (B, UNPERM_BPG * SUBLANES, LANES),
                _i32map(lambda g, r: (0, g, 0))
            ),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, nbp * UNPERM_BPG * SUBLANES, LANES), g_tiles.dtype
        ),
        interpret=interpret,
    )(rows.astype(jnp.int32), pk2d, g_tiles)[
        :, : nb * SUBLANES
    ]


def _sbell_transpose_part(pk, v, xw):
    """Transpose products re-laned onto c % 128 (empty positions carry
    the r2 window sentinel, so the per-window masks exclude them)."""
    perm = (pk >> 10) & 0x7F
    XP = _take_i32(
        jnp.broadcast_to(xw, (SUBLANES, LANES)), perm, axis=1
    )
    VP = _take_i32(v, perm, axis=1)
    return VP * XP


def _sbell_kernel(
    sb_ref, meta_ref, vals_ref, pk_ref, x_ref, y_ref, *, K, BT, TW
):
    """Lazy-store paired kernel (round 5).

    The round-4 RMW measurement (~2.2 ns serialization per dynamic VMEM
    read-modify-write, docs/KERNEL_NOTES_R4.md) indicted this kernel's
    1 + TW RMWs per chunk. The rewrite removes them:

    - row side: a register accumulator that resets on ``sub`` change and
      is OVERWRITE-stored every chunk (the ``_LazyRow`` treatment; one
      dynamic load per grid step picks up tiles straddling steps;
      K-padding chunks inherit forward-filled meta so resets never wipe
      live rows — ``build_sbell_plan``);
    - transpose side: windows targeting the chunk's own tile route their
      contribution into the ROW register (select) instead of a dynamic
      RMW — banded pairs concentrate there — and the remaining windows
      keep plain RMWs. A per-slot register-accumulator variant with
      conditional (``pl.when``) flushes on slot-target change was
      measured 3.8x SLOWER (65.5 -> 247 us on the near_band_paired
      proxy): per-chunk scf.if breaks the stream pipeline the same way
      round 4's lane-rotation folds did. Transpose targets are always
      <= the chunk's tile (strict lower triangle), so the RMWs land on
      rows whose registers are already finalized.
    """
    _zero_on_new_block(sb_ref, y_ref)
    g = pl.program_id(0)
    block = sb_ref[g]
    acc = None
    prev_sub = None
    for k in range(K):
        pk = _chunk(pk_ref, k)
        v = _chunk(vals_ref, k)
        sub_t = meta_ref[0, k, 0]

        # row side: y[r] += v * x[c]
        W = _stack_windows_slim(x_ref, meta_ref, k, TW)
        gathered = _gather_x(W, pk)
        row_c = jnp.sum(v * gathered, axis=0, keepdims=True)

        # transpose side: y[c] += v * x[r], accumulated per window
        # (static unroll; unused windows hold an in-block sentinel and
        # receive only zeros)
        xw = x_ref[pl.ds(block * BT + sub_t, 1), :]
        PT = _sbell_transpose_part(pk, v, xw)
        r2 = (pk >> 7) & 0x7

        if acc is None:  # k == 0: pick up tiles straddling grid steps
            acc = y_ref[pl.ds(sub_t, 1), :]
        else:
            acc = jnp.where(
                sub_t == prev_sub, acc, jnp.zeros_like(acc)
            )
        acc = acc + row_c
        for w in range(TW):
            mask = (r2 == w).astype(v.dtype)
            contrib = jnp.sum(PT * mask, axis=0, keepdims=True)
            tgt = meta_ref[0, k, 2 + w] - block * BT
            own = tgt == sub_t
            zero = jnp.zeros_like(contrib)
            acc = acc + jnp.where(own, contrib, zero)
            y_ref[pl.ds(tgt, 1), :] += jnp.where(own, zero, contrib)
        y_ref[pl.ds(sub_t, 1), :] = acc
        prev_sub = sub_t


@functools.partial(
    jax.jit,
    static_argnames=("num_row_tiles", "chunks_per_step", "tiles_per_block",
                     "transpose_windows", "interpret"),
)
@_no_x64
def sbell_spmv_tiles(
    vals, packed, meta, step_block, x2d,
    *,
    num_row_tiles: int,
    chunks_per_step: int,
    tiles_per_block: int,
    transpose_windows: int = 2,
    interpret: bool = False,
):
    """y tiles = (L + Lᵀ) @ x from the paired strict-lower stream."""
    C = vals.shape[0] // SUBLANES
    K, BT = chunks_per_step, tiles_per_block
    assert C % K == 0
    G = C // K
    tiles_padded = -(-num_row_tiles // BT) * BT
    out = pl.pallas_call(
        functools.partial(_sbell_kernel, K=K, BT=BT, TW=transpose_windows),
        grid_spec=_grid_spec(G, K, BT),
        out_shape=jax.ShapeDtypeStruct((tiles_padded, LANES), x2d.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * C * SUBLANES * LANES,
            bytes_accessed=vals.size * vals.dtype.itemsize
            + packed.size * packed.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        step_block,
        meta.reshape(G, K, META_W),
        vals,
        packed,
        x2d,
    )
    return out[:num_row_tiles]


def _sbell_mm_kernel(
    sb_ref, meta_ref, vals_ref, pk_ref, x_ref, y_ref, *, K, BT, TW, n_rhs
):
    """SpMM variant of the lazy paired kernel (see ``_sbell_kernel``);
    the row register accumulators replicate per RHS."""
    _zero_on_new_block(sb_ref, y_ref)
    g = pl.program_id(0)
    block = sb_ref[g]
    acc = [None] * n_rhs
    prev_sub = None
    for k in range(K):
        pk = _chunk(pk_ref, k)
        v = _chunk(vals_ref, k)
        sub_t = meta_ref[0, k, 0]
        r2 = (pk >> 7) & 0x7
        for b in range(n_rhs):
            W = _stack_windows_slim_b(x_ref, meta_ref, k, b, TW)
            gathered = _gather_x(W, pk)
            row_c = jnp.sum(v * gathered, axis=0, keepdims=True)
            if acc[b] is None:
                acc[b] = y_ref[b, pl.ds(sub_t, 1), :]
            else:
                acc[b] = jnp.where(
                    sub_t == prev_sub, acc[b], jnp.zeros_like(acc[b])
                )
            acc[b] = acc[b] + row_c
            xw = x_ref[b, pl.ds(block * BT + sub_t, 1), :]
            PT = _sbell_transpose_part(pk, v, xw)
            for w in range(TW):
                mask = (r2 == w).astype(v.dtype)
                contrib = jnp.sum(PT * mask, axis=0, keepdims=True)
                tgt = meta_ref[0, k, 2 + w] - block * BT
                own = tgt == sub_t
                zero = jnp.zeros_like(contrib)
                acc[b] = acc[b] + jnp.where(own, contrib, zero)
                y_ref[b, pl.ds(tgt, 1), :] += jnp.where(own, zero, contrib)
        for b in range(n_rhs):
            y_ref[b, pl.ds(sub_t, 1), :] = acc[b]
        prev_sub = sub_t


@functools.partial(
    jax.jit,
    static_argnames=("num_row_tiles", "chunks_per_step", "tiles_per_block",
                     "transpose_windows", "interpret"),
)
@_no_x64
def sbell_spmm_tiles(
    vals, packed, meta, step_block, x3d,
    *,
    num_row_tiles: int,
    chunks_per_step: int,
    tiles_per_block: int,
    transpose_windows: int = 2,
    interpret: bool = False,
):
    """Y tiles (B, T, 128) = (L + Lᵀ) @ X from the paired stream."""
    C = vals.shape[0] // SUBLANES
    B = x3d.shape[0]
    K, BT = chunks_per_step, tiles_per_block
    assert C % K == 0
    G = C // K
    tiles_padded = -(-num_row_tiles // BT) * BT
    out = pl.pallas_call(
        functools.partial(_sbell_mm_kernel, K=K, BT=BT, TW=transpose_windows, n_rhs=B),
        grid_spec=_grid_spec_mm(G, K, BT, B),
        out_shape=jax.ShapeDtypeStruct(
            (B, tiles_padded, LANES), x3d.dtype
        ),
        interpret=interpret,
    )(
        step_block,
        meta.reshape(G, K, META_W),
        vals,
        packed,
        x3d,
    )
    return out[:, :num_row_tiles]


def _bell2_mm_accum_kernel(
    sb_ref, meta_ref, vals_ref, pk_ref, x_ref, yin_ref, y_ref, *, K, n_rhs,
    run=1, wmax=SUBLANES, contig=False, depth=SUBLANES,
):
    g = pl.program_id(0)

    @pl.when(
        jnp.logical_or(g == 0, sb_ref[g] != sb_ref[jnp.maximum(g - 1, 0)])
    )
    def _():
        y_ref[...] = yin_ref[...]

    if depth > SUBLANES:  # deep windows (contig only)
        for k0 in range(0, K, run):
            sub = meta_ref[0, k0, 0]
            contribs = []
            for b in range(n_rhs):
                def stack_deep(k, b=b):
                    return [
                        x_ref[
                            b,
                            pl.ds(meta_ref[0, k, 2] + 8 * i, SUBLANES),
                            :,
                        ]
                        for i in range(depth // SUBLANES)
                    ]

                contribs.append(_chunk_contribs(
                    stack_deep, vals_ref, pk_ref, k0, run, depth=depth,
                )[None])
            # one strided read-modify-write across all RHS (r3: per-b
            # RMWs dominated the MM kernel once run padding was dropped)
            y_ref[:, pl.ds(sub, 1), :] += jnp.concatenate(contribs, 0)
        return

    def stack(k, b):
        if contig:
            return _stack_slab_b(x_ref, meta_ref, k, b)
        return _stack_windows_b(x_ref, meta_ref, k, b, wmax)

    for k0 in range(0, K, run):
        sub = meta_ref[0, k0, 0]
        contribs = []
        for b in range(n_rhs):
            acc = None
            for k in range(k0, k0 + run):
                W = stack(k, b)
                g = _gather_x(W, _chunk(pk_ref, k))
                vg = _chunk(vals_ref, k) * g
                acc = vg if acc is None else acc + vg
            contribs.append(jnp.sum(acc, axis=0, keepdims=True)[None])
        y_ref[:, pl.ds(sub, 1), :] += jnp.concatenate(contribs, 0)


@functools.partial(
    jax.jit,
    static_argnames=("num_row_tiles", "chunks_per_step", "tiles_per_block",
                     "interpret", "run", "wmax", "contig",
                     "depth", "rot"),
)
@_no_x64
def bell2_spmm_tiles_accum(
    vals, packed, meta, step_block, x3d, y_tiles,
    *,
    num_row_tiles: int,
    chunks_per_step: int,
    tiles_per_block: int,
    interpret: bool = False,
    run: int = 1,
    wmax: int = SUBLANES,
    contig: bool = False,
    depth: int = SUBLANES,
    rot: int = 1,
    nib=None,
):
    """Y_tiles += A @ X for a sparse accumulating BELL2 stream."""
    assert rot == 1, (
        "lane rotation was pruned in round 4: measured 9.2 -> 33.3 "
        "ns/chunk at rot=2 on v5e (the per-group masked accumulators + "
        "rolls always cost more than rotation can save in chunks)"
    )
    C = vals.shape[0] // SUBLANES
    B = x3d.shape[0]
    K, BT = chunks_per_step, tiles_per_block
    assert C % K == 0
    G = C // K
    tiles_padded = -(-num_row_tiles // BT) * BT
    assert y_tiles.shape == (B, tiles_padded, LANES)
    if meta.ndim == 1:
        if nib is not None:
            return pl.pallas_call(
                functools.partial(
                    _bell2_nib_mm_accum_kernel, K=K, n_rhs=B, depth=depth
                ),
                grid_spec=_grid_spec_word(
                    G, K, BT, B=B, accum=True, nib=True
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (B, tiles_padded, LANES), x3d.dtype
                ),
                input_output_aliases={6: 0},
                interpret=interpret,
            )(step_block, meta, vals, packed, nib, x3d, y_tiles)
        return pl.pallas_call(
            functools.partial(_bell2_word_mm_accum_kernel, K=K,
                              n_rhs=B, depth=depth),
            grid_spec=_grid_spec_word(G, K, BT, B=B, accum=True),
            out_shape=jax.ShapeDtypeStruct(
                (B, tiles_padded, LANES), x3d.dtype
            ),
            input_output_aliases={5: 0},
            interpret=interpret,
        )(step_block, meta, vals, packed, x3d, y_tiles)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(
                (1, K, META_W), _i32map(lambda g, s: (g, 0, 0)),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (K * SUBLANES, LANES), _i32map(lambda g, s: (g, 0))
            ),
            pl.BlockSpec(
                (K * SUBLANES, LANES), _i32map(lambda g, s: (g, 0))
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((B, BT, LANES), _i32map(lambda g, s: (0, s[g], 0))),
        ],
        out_specs=pl.BlockSpec(
            (B, BT, LANES), _i32map(lambda g, s: (0, s[g], 0))
        ),
    )
    return pl.pallas_call(
        functools.partial(_bell2_mm_accum_kernel, K=K, n_rhs=B, run=run,
                          wmax=wmax, contig=contig, depth=depth),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (B, tiles_padded, LANES), x3d.dtype
        ),
        input_output_aliases={5: 0},
        interpret=interpret,
    )(
        step_block,
        meta.reshape(G, K, META_W),
        vals,
        packed,
        x3d,
        y_tiles,
    )
