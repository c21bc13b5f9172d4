"""SDIA — dense-diagonal symmetric SpMV kernel.

The highest-throughput stream for the banded/stencil structure that
dominates the reference's target matrices (FEM bands, stencils — the
structure its bandwidth split exploits, ``csr_matrix.tpp:313-401``).
Diagonals dense enough to store contiguously need *no index data at
all*: the matrix's diagonal offsets are baked into the kernel trace as
static lane/sublane shifts, so per stored nonzero the stream moves 4
bytes (vs 8+ for indexed formats) and spends ~6 VPU ops per 1024 logical
nonzeros (vs ~43 for the gather-based paired kernel).

Layout: ``vals[r, j, i, l]`` holds A[g, g - d_j] for flat row
g = 1024 r + 128 i + l (zero where absent). Grid steps walk the R row
blocks; x and y live whole in VMEM, padded with ``SP`` leading zero
sublane rows so backward shifts never underflow.

Per diagonal d = 128 s + l, for the (8, 128) row block X at rows g:
- row side    y[g] += v * x[g - d]: x[g - d] is two sublane-shifted
  slabs combined by one lane-roll + lane-select;
- transpose   y[g - d] += v * x[g]: the product is lane-rolled the other
  way and accumulated into a (9, 128) per-``s``-group register, flushed
  with one read-modify-write per group.

Both sides read each stored value once — the reference's symmetric
traffic halving (``cpu_mv_sym_*``, ``csr_matrix.tpp:2706-3028``)
realized with static shifts instead of coloring.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bell2_kernel import _i32map, _no_x64

SUBLANES = 8
LANES = 128
BLOCK_ROWS = SUBLANES * LANES  # 1024 rows per grid step

__all__ = ["sdia_sym_tiles", "sdia_sym_tiles_mm", "sdia_gen_tiles",
           "sdia_gen_tiles_mm", "BLOCK_ROWS"]

#: rows per sdia_gen grid segment: keeps each call's whole-VMEM x slice
#: (rows/128 tiles x 512 B) near 48 MB — the TPU compiler crashes when a
#: single VMEM buffer passes ~64 MB (bisected on v5e)
_GEN_SEG_ROWS = 12_000_000


def _group_by_sublane_shift(offsets):
    groups: dict[int, list[tuple[int, int]]] = {}
    for j, d in enumerate(offsets):
        groups.setdefault(d // LANES, []).append((j, d % LANES))
    return groups


def _sdia_body(vals_ref, x_ref, y_ref, b, rb, RB, *, offsets, SP, dtype):
    """Accumulate one row block of (L + Lᵀ) x into y_ref (rhs index b
    selects the x/y planes for the SpMM variant; None for SpMV).
    ``rb`` indexes the row block within this grid step's RB-block slab
    (multiple blocks per step amortize grid/DMA overhead)."""
    g = pl.program_id(0)
    base = SP + (g * RB + rb) * SUBLANES

    def xload(r0, nrows=SUBLANES):
        if b is None:
            return x_ref[pl.ds(r0, nrows), :]
        return x_ref[b, pl.ds(r0, nrows), :]

    lane = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 1)
    lane9 = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES + 1, LANES), 1)
    xblk = xload(base)
    accr = jnp.zeros((SUBLANES, LANES), dtype)
    acc0 = None  # the s == 0 transpose group merges into accr's flush

    for s, diags in sorted(_group_by_sublane_shift(offsets).items()):
        acc9 = jnp.zeros((SUBLANES + 1, LANES), dtype)
        t1 = xload(base - s)
        t0 = xload(base - s - 1)
        for j, l in diags:
            v = vals_ref[rb, j]
            # row side: y[g] += v * x[g - d]
            if l == 0:
                xs = t1
            else:
                xs = jnp.where(
                    lane < l, pltpu.roll(t0, l, 1), pltpu.roll(t1, l, 1)
                )
            accr = accr + v * xs
            # transpose side: y[g - d] += v * x[g], gathered in acc9
            # (acc9 row k maps to y sublane base - s - 1 + k)
            p = v * xblk
            if l == 0:
                acc9 = acc9 + jnp.pad(p, ((1, 0), (0, 0)))
            else:
                rp = pltpu.roll(p, LANES - l, 1)
                hi = jnp.pad(rp, ((1, 0), (0, 0)))
                lo = jnp.pad(rp, ((0, 1), (0, 0)))
                acc9 = acc9 + jnp.where(lane9 < LANES - l, hi, lo)
        if s == 0:
            acc0 = acc9  # rows [base-1, base+8) overlap accr's rows
        elif b is None:
            y_ref[pl.ds(base - s - 1, SUBLANES + 1), :] += acc9
        else:
            y_ref[b, pl.ds(base - s - 1, SUBLANES + 1), :] += acc9
    # one combined read-modify-write for the row side + the s == 0
    # transpose group (banded matrices have ONLY that group, so this
    # halves the dynamic RMW count — the SpMM bottleneck)
    if acc0 is not None:
        out = acc0 + jnp.pad(accr, ((1, 0), (0, 0)))
        if b is None:
            y_ref[pl.ds(base - 1, SUBLANES + 1), :] += out
        else:
            y_ref[b, pl.ds(base - 1, SUBLANES + 1), :] += out
    elif b is None:
        y_ref[pl.ds(base, SUBLANES), :] += accr
    else:
        y_ref[b, pl.ds(base, SUBLANES), :] += accr


def _sdia_kernel(vals_ref, x_ref, yin_ref, y_ref, *, offsets, SP, dtype,
                 n_rhs, RB):
    @pl.when(pl.program_id(0) == 0)
    def _():
        y_ref[...] = yin_ref[...]

    for rb in range(RB):
        if n_rhs is None:
            _sdia_body(vals_ref, x_ref, y_ref, None, rb, RB,
                       offsets=offsets, SP=SP, dtype=dtype)
        else:
            for b in range(n_rhs):
                _sdia_body(vals_ref, x_ref, y_ref, b, rb, RB,
                           offsets=offsets, SP=SP, dtype=dtype)


def _blocks_per_step(R: int, D: int, itemsize: int = 4) -> int:
    """Row blocks per grid step: target ~0.5 MB of vals per DMA, cap 8.

    Must give the same answer for the plan's original R and the padded
    R (= next multiple): min(cap, R) with cap independent of R — and
    independent of the storage dtype (itemsize is pinned to 4 by the
    callers so bf16-cast plans keep their geometry).
    """
    per_block = D * SUBLANES * LANES * itemsize
    cap = max(1, min(SUBLANES, (512 * 1024) // max(per_block, 1)))
    return min(cap, R)


@functools.partial(
    jax.jit, static_argnames=("offsets", "interpret")
)
@_no_x64
def sdia_sym_tiles(vals, x2d, y_tiles, *, offsets, interpret=False):
    """y_tiles += (L + Lᵀ) x for the dense-diagonal symmetric stream.

    ``vals``: (R, D, 8, 128); ``x2d``: (x_rows, 128); ``y_tiles``:
    (T, 128) tiles accumulated in place (aliased). Returns (T, 128).
    """
    R, D = vals.shape[0], vals.shape[1]
    assert D == len(offsets)
    T = y_tiles.shape[0]
    SP = max(d // LANES for d in offsets) + 1
    RB = _blocks_per_step(R, D)
    assert R % RB == 0, "plan must pad R to the RB multiple"
    rows = SP + R * SUBLANES
    xp = jnp.pad(
        x2d, ((SP, max(0, rows - SP - x2d.shape[0])), (0, 0))
    )[:rows]
    yp = jnp.pad(y_tiles, ((SP, max(0, rows - SP - T)), (0, 0)))[:rows]
    out = pl.pallas_call(
        functools.partial(
            _sdia_kernel, offsets=offsets, SP=SP, dtype=x2d.dtype,
            n_rhs=None, RB=RB,
        ),
        grid=(R // RB,),
        in_specs=[
            pl.BlockSpec(
                (RB, D, SUBLANES, LANES), _i32map(lambda g: (g, 0, 0, 0))
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), x2d.dtype),
        input_output_aliases={2: 0},
        cost_estimate=pl.CostEstimate(
            flops=4 * vals.size,
            bytes_accessed=vals.size * vals.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(vals, xp, yp)
    return out[SP : SP + T]


def _sdia_gen_kernel(vals_ref, x_ref, yin_ref, y_ref, *, offsets, SPB,
                     dtype, RB, n_rhs=None):
    """One-sided signed-offset diagonal kernel, y BLOCKED per grid step.

    Row side only: ``y[g] += v_d[g] * x[g - d]`` for each signed offset
    (d > 0 subdiagonal reads behind, d < 0 superdiagonal reads ahead).
    x lives whole in VMEM (padded both ways); the y block covers exactly
    this step's rows, so y is streamed — the variant that removes the
    whole-y-in-VMEM row ceiling (~12M rows) of the symmetric kernel.
    Symmetric matrices use it above that ceiling by storing mirrored
    offsets (the Lᵀ diagonals as negative offsets, host-shifted), at 2x
    the value traffic of the paired sym kernel.
    """
    y_ref[...] = yin_ref[...]
    g = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 1)

    for rb in range(RB):
        base = SPB + (g * RB + rb) * SUBLANES
        for b in ([None] if n_rhs is None else range(n_rhs)):
            accr = jnp.zeros((SUBLANES, LANES), dtype)
            for s, diags in sorted(
                _group_by_sublane_shift(offsets).items()
            ):
                if b is None:
                    t1 = x_ref[pl.ds(base - s, SUBLANES), :]
                    t0 = x_ref[pl.ds(base - s - 1, SUBLANES), :]
                else:
                    t1 = x_ref[b, pl.ds(base - s, SUBLANES), :]
                    t0 = x_ref[b, pl.ds(base - s - 1, SUBLANES), :]
                for j, l in diags:
                    v = vals_ref[rb, j]
                    if l == 0:
                        xs = t1
                    else:
                        xs = jnp.where(
                            lane < l,
                            pltpu.roll(t0, l, 1),
                            pltpu.roll(t1, l, 1),
                        )
                    accr = accr + v * xs
            if b is None:
                y_ref[pl.ds(rb * SUBLANES, SUBLANES), :] += accr
            else:
                y_ref[b, pl.ds(rb * SUBLANES, SUBLANES), :] += accr


@functools.partial(
    jax.jit, static_argnames=("offsets", "interpret")
)
@_no_x64
def sdia_gen_tiles(vals, x2d, y_tiles, *, offsets, interpret=False):
    """y_tiles += A_dia x for signed-offset dense diagonals, y blocked.

    ``vals``: (R, D, 8, 128) with vals[r, j, i, l] = A[g, g - d_j] at
    flat row g = 1024 r + 128 i + l; ``offsets`` may contain positive
    (sub) and negative (super) diagonals. ``y_tiles``: (T, 128),
    accumulated (aliased); returns (T, 128).
    """
    R, D = vals.shape[0], vals.shape[1]
    assert D == len(offsets)
    T = y_tiles.shape[0]
    # leading pad covers the largest backward read (d > 0), trailing
    # pad the largest forward read (d < 0); +1 sublane for the l-split
    SPB = max(max((d // LANES for d in offsets), default=0), 0) + 1
    SPF = max(max((-(d // LANES) for d in offsets), default=0), 0) + 1
    RB = _blocks_per_step(R, D)
    assert R % RB == 0, "plan must pad R to the RB multiple"
    body_rows = R * SUBLANES
    rows = SPB + body_rows + SPF
    xp = jnp.pad(
        x2d, ((SPB, max(0, rows - SPB - x2d.shape[0])), (0, 0))
    )[:rows]
    yp = jnp.pad(y_tiles, ((0, max(0, body_rows - T)), (0, 0)))[:body_rows]

    # the whole-VMEM x operand tops out near 60 MB (the TPU compiler
    # crashes beyond ~64 MB single buffers); past ~12M rows the grid is
    # segmented so each call sees only its x slice + offset halo
    seg_R = max(RB, (_GEN_SEG_ROWS // (BLOCK_ROWS * RB)) * RB)
    outs = []
    for r0 in range(0, R, seg_R):
        r1 = min(r0 + seg_R, R)
        xs = jax.lax.dynamic_slice_in_dim(
            xp, r0 * SUBLANES, (r1 - r0) * SUBLANES + SPB + SPF, axis=0
        )
        ys = jax.lax.dynamic_slice_in_dim(
            yp, r0 * SUBLANES, (r1 - r0) * SUBLANES, axis=0
        )
        outs.append(pl.pallas_call(
            functools.partial(
                _sdia_gen_kernel, offsets=offsets, SPB=SPB,
                dtype=x2d.dtype, RB=RB,
            ),
            grid=((r1 - r0) // RB,),
            in_specs=[
                pl.BlockSpec(
                    (RB, D, SUBLANES, LANES),
                    _i32map(lambda g: (g, 0, 0, 0)),
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (RB * SUBLANES, LANES), _i32map(lambda g: (g, 0))
                ),
            ],
            out_specs=pl.BlockSpec(
                (RB * SUBLANES, LANES), _i32map(lambda g: (g, 0))
            ),
            out_shape=jax.ShapeDtypeStruct(
                ((r1 - r0) * SUBLANES, LANES), x2d.dtype
            ),
            input_output_aliases={2: 0},
            cost_estimate=pl.CostEstimate(
                flops=2 * vals[r0:r1].size,
                bytes_accessed=vals[r0:r1].size * vals.dtype.itemsize,
                transcendentals=0,
            ),
            interpret=interpret,
        )(vals[r0:r1], xs, ys))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return out[:T]


@functools.partial(
    jax.jit, static_argnames=("offsets", "interpret")
)
@_no_x64
def sdia_gen_tiles_mm(vals, x3d, y_tiles, *, offsets, interpret=False):
    """Y_tiles += A_dia X for the signed-offset stream; X (B, x_rows,
    128), Y_tiles (B, T, 128) accumulated (aliased)."""
    R, D = vals.shape[0], vals.shape[1]
    assert D == len(offsets)
    B, T = y_tiles.shape[0], y_tiles.shape[1]
    SPB = max(max((d // LANES for d in offsets), default=0), 0) + 1
    SPF = max(max((-(d // LANES) for d in offsets), default=0), 0) + 1
    RB = _blocks_per_step(R, D)
    assert R % RB == 0, "plan must pad R to the RB multiple"
    body_rows = R * SUBLANES
    rows = SPB + body_rows + SPF
    xp = jnp.pad(
        x3d, ((0, 0), (SPB, max(0, rows - SPB - x3d.shape[1])), (0, 0))
    )[:, :rows]
    yp = jnp.pad(
        y_tiles, ((0, 0), (0, max(0, body_rows - T)), (0, 0))
    )[:, :body_rows]

    # x slice is (B, rows, 128): scale the grid segmentation down by B
    # so each call's x buffer stays under the ~64 MB VMEM-buffer cap
    seg_R = max(RB, (_GEN_SEG_ROWS // B // (BLOCK_ROWS * RB)) * RB)
    outs = []
    for r0 in range(0, R, seg_R):
        r1 = min(r0 + seg_R, R)
        xs = jax.lax.dynamic_slice_in_dim(
            xp, r0 * SUBLANES, (r1 - r0) * SUBLANES + SPB + SPF, axis=1
        )
        ys = jax.lax.dynamic_slice_in_dim(
            yp, r0 * SUBLANES, (r1 - r0) * SUBLANES, axis=1
        )
        outs.append(pl.pallas_call(
            functools.partial(
                _sdia_gen_kernel, offsets=offsets, SPB=SPB,
                dtype=x3d.dtype, RB=RB, n_rhs=B,
            ),
            grid=((r1 - r0) // RB,),
            in_specs=[
                pl.BlockSpec(
                    (RB, D, SUBLANES, LANES),
                    _i32map(lambda g: (g, 0, 0, 0)),
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (B, RB * SUBLANES, LANES),
                    _i32map(lambda g: (0, g, 0)),
                ),
            ],
            out_specs=pl.BlockSpec(
                (B, RB * SUBLANES, LANES), _i32map(lambda g: (0, g, 0))
            ),
            out_shape=jax.ShapeDtypeStruct(
                (B, (r1 - r0) * SUBLANES, LANES), x3d.dtype
            ),
            input_output_aliases={2: 0},
            interpret=interpret,
        )(vals[r0:r1], xs, ys))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    return out[:, :T]


@functools.partial(
    jax.jit, static_argnames=("offsets", "interpret")
)
@_no_x64
def sdia_sym_tiles_mm(vals, x3d, y_tiles, *, offsets, interpret=False):
    """Y_tiles += (L + Lᵀ) X, X as (B, x_rows, 128)."""
    R, D = vals.shape[0], vals.shape[1]
    B, T = y_tiles.shape[0], y_tiles.shape[1]
    SP = max(d // LANES for d in offsets) + 1
    RB = _blocks_per_step(R, D)
    assert R % RB == 0, "plan must pad R to the RB multiple"
    rows = SP + R * SUBLANES
    xp = jnp.pad(
        x3d, ((0, 0), (SP, max(0, rows - SP - x3d.shape[1])), (0, 0))
    )[:, :rows]
    yp = jnp.pad(
        y_tiles, ((0, 0), (SP, max(0, rows - SP - T)), (0, 0))
    )[:, :rows]
    out = pl.pallas_call(
        functools.partial(
            _sdia_kernel, offsets=offsets, SP=SP, dtype=x3d.dtype,
            n_rhs=B, RB=RB,
        ),
        grid=(R // RB,),
        in_specs=[
            pl.BlockSpec(
                (RB, D, SUBLANES, LANES), _i32map(lambda g: (g, 0, 0, 0))
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, rows, LANES), x3d.dtype),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(vals, xp, yp)
    return out[:, SP : SP + T]
