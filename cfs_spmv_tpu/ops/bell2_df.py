"""Double-float (fp32 hi+lo pair) BELL2 SpMV — fp64 at VPU speeds.

The reference runs every kernel in IEEE double under ``--enable-dp``
(``configure.ac:48-67``); TPU v5e has no 64-bit vector lanes, so the
prior fp64 answer here was the emulated XLA ELL+COO path (0.069 Gnnz/s,
``ops/xla_ref.py``). This module implements the TPU-native answer:
**double-float arithmetic** — values, x and the accumulator are
(hi, lo) fp32 pairs combined with error-free transforms (Dekker TwoProd
+ Knuth TwoSum), giving ~2^-48 relative precision at fp32 vector
throughput. Measured on v5e (round-4 probe): a 16-term double-float dot
product lands within 2.4e-12 relative of the fp64 result (fp32 alone:
6.9e-5), confirming Mosaic preserves IEEE f32 semantics (no silent FMA
contraction breaking Dekker's splits).

Kernel structure mirrors the lazy-store word kernel
(``_bell2_word_kernel``) with two changes:

- every stream/operand is an (hi, lo) pair; the per-slot product is a
  full df x df multiply (TwoProd + cross terms, the v_lo*x_lo term is
  below the result precision and dropped);
- there is NO sublane reduce: the (8, 128) df accumulator pair is
  overwrite-stored per chunk at rows [sub*8, sub*8+8) of an 8x-tall
  output, and the apply layer folds the 8 sublane partials in float64
  (exact). This keeps the compensated arithmetic out of the reduce tree
  entirely.

Precision: each y element is a df sum of its row's chunk contributions
folded in f64 — relative error ~ nnz_row * 2^-48, far inside the
reference's fp64 tolerance (1e-8 relative, ``platform.hpp:27-37``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .bell2_kernel import (
    LANES,
    SUBLANES,
    WORD_SUB_BITS,
    _chunk,
    _gather_x,
    _gather_x_deep,
    _grid_spec_word,
    _no_x64,
)

__all__ = ["bell2_spmv_tiles_df", "bell2_spmm_tiles_df",
           "split_df", "fold_df_tiles"]

_SPLIT = 4097.0  # 2^12 + 1: Dekker split constant for fp32


def split_df(a):
    """(hi, lo) fp32 pair of a float64 array.

    Works on numpy AND jax arrays unchanged (``astype`` by name), so
    the plan builder's value split and the apply-time x split are the
    SAME code — the kernel's precision contract depends on ``lo`` being
    the exact f64 residual of ``hi`` in both places."""
    hi = a.astype("float32")
    lo = (a - hi.astype("float64")).astype("float32")
    return hi, lo


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _two_prod(a, b):
    p = a * b
    aa = a * jnp.float32(_SPLIT)
    ahi = aa - (aa - a)
    alo = a - ahi
    bb = b * jnp.float32(_SPLIT)
    bhi = bb - (bb - b)
    blo = b - bhi
    return p, ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo


def _df_add(hi, lo, acc_hi, acc_lo):
    """Normalized compensated accumulate (TwoSum + renormalize).

    Round-5 negative result: dropping the final normalizing two_sum
    (to shorten the loop-carried dependency to one op per plane)
    measured NO speedup on the audikw df stream (784.5 -> 778.7 us,
    within noise) — the df word kernel is gather/stream-bound, not
    chain-bound — while costing ~3.9e-8 relative error on ~6% of rows
    in the interpreter (a one-ulp compensation loss in the kernel
    context that a pure jit repro of the same chain does not show).
    Keep the normalized form."""
    s, e = _two_sum(acc_hi, hi)
    e = e + (acc_lo + lo)
    return _two_sum(s, e)


def _bell2_df_kernel(sb_ref, mw_ref, vh_ref, vl_ref, pk_ref, xh_ref,
                     xl_ref, yh_ref, yl_ref, *, K, depth):
    g = pl.program_id(0)

    @pl.when(
        jnp.logical_or(g == 0, sb_ref[g] != sb_ref[jnp.maximum(g - 1, 0)])
    )
    def _():
        yh_ref[...] = jnp.zeros_like(yh_ref)
        yl_ref[...] = jnp.zeros_like(yl_ref)

    base0 = g * K
    acc_hi = acc_lo = None
    prev = None
    for k in range(K):
        w = mw_ref[base0 + k]
        sub = w & ((1 << WORD_SUB_BITS) - 1)
        xb = w >> WORD_SUB_BITS
        pk16 = _chunk(pk_ref, k)
        if depth > SUBLANES:
            pk = pk16.astype(jnp.int32)
            gh = _gather_x_deep(
                [xh_ref[pl.ds(xb + 8 * i, SUBLANES), :]
                 for i in range(depth // SUBLANES)], pk)
            gl = _gather_x_deep(
                [xl_ref[pl.ds(xb + 8 * i, SUBLANES), :]
                 for i in range(depth // SUBLANES)], pk)
        else:
            gh = _gather_x(xh_ref[pl.ds(xb, SUBLANES), :], pk16)
            gl = _gather_x(xl_ref[pl.ds(xb, SUBLANES), :], pk16)
        vh = _chunk(vh_ref, k)
        vl = _chunk(vl_ref, k)
        # df product: (vh+vl)(gh+gl); the vl*gl term is < 2^-48 relative
        p, e = _two_prod(vh, gh)
        e = e + (vh * gl + vl * gh)
        sub8 = sub * SUBLANES
        if acc_hi is None:  # k == 0: pick up tiles straddling steps
            acc_hi = yh_ref[pl.ds(sub8, SUBLANES), :]
            acc_lo = yl_ref[pl.ds(sub8, SUBLANES), :]
        else:
            same = sub == prev
            acc_hi = jnp.where(same, acc_hi, jnp.zeros_like(acc_hi))
            acc_lo = jnp.where(same, acc_lo, jnp.zeros_like(acc_lo))
        acc_hi, acc_lo = _df_add(p, e, acc_hi, acc_lo)
        yh_ref[pl.ds(sub8, SUBLANES), :] = acc_hi
        yl_ref[pl.ds(sub8, SUBLANES), :] = acc_lo
        prev = sub


def _grid_spec_df(G, K, BT):
    """Word-path grid spec with paired value/x/y operands; the out
    blocks are 8x taller (BT*8 rows of unreduced sublane partials)."""
    from .bell2_kernel import _i32map
    from jax.experimental.pallas import tpu as pltpu

    stream = pl.BlockSpec(
        (K * SUBLANES, LANES), _i32map(lambda g, s, m: (g, 0))
    )
    out = pl.BlockSpec(
        (BT * SUBLANES, LANES), _i32map(lambda g, s, m: (s[g], 0))
    )
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[
            stream, stream, stream,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[out, out],
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_row_tiles", "chunks_per_step",
                     "tiles_per_block", "depth", "interpret"),
)
@_no_x64
def bell2_spmv_tiles_df(
    vals_hi, vals_lo, packed, meta_word_arr, step_block, xh2d, xl2d,
    *,
    num_row_tiles: int,
    chunks_per_step: int,
    tiles_per_block: int,
    depth: int = SUBLANES,
    interpret: bool = False,
):
    """(hi, lo) partial tiles (Tp*8, 128) of y = A @ x in double-float.

    Requires a word-eligible contig plan (``meta_word``); the caller
    folds the 8 sublane partials per row in float64
    (``fold_df_tiles``)."""
    C = vals_hi.shape[0] // SUBLANES
    K, BT = chunks_per_step, tiles_per_block
    assert C % K == 0
    G = C // K
    tiles_padded = -(-num_row_tiles // BT) * BT
    out_shape = jax.ShapeDtypeStruct(
        (tiles_padded * SUBLANES, LANES), jnp.float32
    )
    yh, yl = pl.pallas_call(
        functools.partial(_bell2_df_kernel, K=K, depth=depth),
        grid_spec=_grid_spec_df(G, K, BT),
        out_shape=[out_shape, out_shape],
        interpret=interpret,
    )(step_block, meta_word_arr, vals_hi, vals_lo, packed, xh2d, xl2d)
    n = num_row_tiles * SUBLANES
    return yh[:n], yl[:n]


def fold_df_tiles(yh, yl, num_row_tiles):
    """float64 (T, 128) tiles from the kernel's sublane partials: each
    row's 8 df partials are summed exactly in f64."""
    T = num_row_tiles
    s = yh.astype(jnp.float64) + yl.astype(jnp.float64)
    return s.reshape(T, SUBLANES, LANES).sum(axis=1)


def _df_reduce8(h, l):
    """(1, 128) df pair from an (8, 128) df pair by exact pairwise
    TwoSum folding (3 stages) — the MM kernel reduces in-kernel so its
    per-step output block is (B, BT, 128) instead of the SpMV path's
    8x-tall partials, which at B=8 x 2 pairs blew the ~16 MB scoped
    VMEM limit (measured: 72 MB requested on the audikw proxy)."""
    for half in (4, 2, 1):
        h, l = _df_add(h[half:2 * half], l[half:2 * half],
                       h[:half], l[:half])
    return h, l


def _bell2_df_mm_kernel(sb_ref, mw_ref, vh_ref, vl_ref, pk_ref, xh_ref,
                        xl_ref, yh_ref, yl_ref, *, K, depth, n_rhs):
    """Multi-RHS double-float kernel: the value/index streams are read
    ONCE per chunk and re-used across all RHS (the column-loop applier
    re-streamed them per RHS); per-RHS (hi, lo) register accumulator
    pairs follow the same lazy-store protocol as the SpMV kernel, with
    the sublane reduction done in-kernel by exact pairwise df folding."""
    g = pl.program_id(0)

    @pl.when(
        jnp.logical_or(g == 0, sb_ref[g] != sb_ref[jnp.maximum(g - 1, 0)])
    )
    def _():
        yh_ref[...] = jnp.zeros_like(yh_ref)
        yl_ref[...] = jnp.zeros_like(yl_ref)

    base0 = g * K
    acc_hi = [None] * n_rhs
    acc_lo = [None] * n_rhs
    prev = None
    for k in range(K):
        w = mw_ref[base0 + k]
        sub = w & ((1 << WORD_SUB_BITS) - 1)
        xb = w >> WORD_SUB_BITS
        pk16 = _chunk(pk_ref, k)
        vh = _chunk(vh_ref, k)
        vl = _chunk(vl_ref, k)
        if depth > SUBLANES:
            pk = pk16.astype(jnp.int32)
        for b in range(n_rhs):
            if depth > SUBLANES:
                gh = _gather_x_deep(
                    [xh_ref[b, pl.ds(xb + 8 * i, SUBLANES), :]
                     for i in range(depth // SUBLANES)], pk)
                gl = _gather_x_deep(
                    [xl_ref[b, pl.ds(xb + 8 * i, SUBLANES), :]
                     for i in range(depth // SUBLANES)], pk)
            else:
                gh = _gather_x(xh_ref[b, pl.ds(xb, SUBLANES), :], pk16)
                gl = _gather_x(xl_ref[b, pl.ds(xb, SUBLANES), :], pk16)
            p, e = _two_prod(vh, gh)
            e = e + (vh * gl + vl * gh)
            ch, cl = _df_reduce8(p, e)
            if acc_hi[b] is None:  # k == 0: tiles straddling steps
                acc_hi[b] = yh_ref[b, pl.ds(sub, 1), :]
                acc_lo[b] = yl_ref[b, pl.ds(sub, 1), :]
            else:
                same = sub == prev
                acc_hi[b] = jnp.where(
                    same, acc_hi[b], jnp.zeros_like(acc_hi[b])
                )
                acc_lo[b] = jnp.where(
                    same, acc_lo[b], jnp.zeros_like(acc_lo[b])
                )
            acc_hi[b], acc_lo[b] = _df_add(ch, cl, acc_hi[b], acc_lo[b])
            yh_ref[b, pl.ds(sub, 1), :] = acc_hi[b]
            yl_ref[b, pl.ds(sub, 1), :] = acc_lo[b]
        prev = sub


def _grid_spec_df_mm(G, K, BT, B):
    from jax.experimental.pallas import tpu as pltpu

    from .bell2_kernel import _i32map

    stream = pl.BlockSpec(
        (K * SUBLANES, LANES), _i32map(lambda g, s, m: (g, 0))
    )
    out = pl.BlockSpec(
        (B, BT, LANES), _i32map(lambda g, s, m: (0, s[g], 0))
    )
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[
            stream, stream, stream,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[out, out],
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_row_tiles", "chunks_per_step",
                     "tiles_per_block", "depth", "interpret"),
)
@_no_x64
def bell2_spmm_tiles_df(
    vals_hi, vals_lo, packed, meta_word_arr, step_block, xh3d, xl3d,
    *,
    num_row_tiles: int,
    chunks_per_step: int,
    tiles_per_block: int,
    depth: int = SUBLANES,
    interpret: bool = False,
):
    """(hi, lo) REDUCED tiles (B, T, 128) of Y = A @ X in double-float;
    X as (B, x_rows, 128) hi/lo pairs. One stream pass serves every RHS
    (the reference's ``--enable-dp`` SpMM analog); the caller folds
    hi + lo in float64."""
    C = vals_hi.shape[0] // SUBLANES
    B = xh3d.shape[0]
    K, BT = chunks_per_step, tiles_per_block
    assert C % K == 0
    G = C // K
    tiles_padded = -(-num_row_tiles // BT) * BT
    out_shape = jax.ShapeDtypeStruct(
        (B, tiles_padded, LANES), jnp.float32
    )
    yh, yl = pl.pallas_call(
        functools.partial(_bell2_df_mm_kernel, K=K, depth=depth,
                          n_rhs=B),
        grid_spec=_grid_spec_df_mm(G, K, BT, B),
        out_shape=[out_shape, out_shape],
        interpret=interpret,
    )(step_block, meta_word_arr, vals_hi, vals_lo, packed, xh3d, xl3d)
    return yh[:, :num_row_tiles], yl[:, :num_row_tiles]
