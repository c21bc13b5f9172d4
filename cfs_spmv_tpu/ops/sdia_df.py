"""Double-float SDIA — banded fp64 at dense-diagonal speeds.

Round-4 shipped fp64 only through the one-sided slot-packed word path
(``ops/bell2_df``): symmetric banded matrices paid a 2x mirrored
expansion plus the full gather datapath, landing at 21-51 Gnnz/s where
the fp32 SDIA stream runs 160-265. This module runs the SDIA stream
itself in double-float: the (R, D, 8, 128) value planes are (hi, lo)
fp32 pairs, x/y live whole in VMEM as pairs, and every per-diagonal
contribution is a Dekker TwoProd + Knuth TwoSum compensated update —
the same error-free transforms as ``bell2_df`` (~2^-48 relative)
through the same static-shift datapath as ``sdia_sym_tiles``
(``ops/sdia_kernel``: index-free diagonals, lane-roll + select instead
of gathers). The reference's ``--enable-dp`` analog for its bandwidth-
structured kernels (``configure.ac:48-67``,
``csr_matrix.tpp:2706-3028``).

The main diagonal (offset 0) is storable too: the tune layer HALVES its
values (exact: x0.5 on hi and lo separately), so the row and transpose
sides each contribute half — the pair sums to the full diagonal term
without a special case in the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bell2_df import _df_add, _two_prod
from .bell2_kernel import _i32map, _no_x64
from .sdia_kernel import (
    LANES,
    SUBLANES,
    _blocks_per_step,
    _group_by_sublane_shift,
)

__all__ = ["sdia_sym_tiles_df", "sdia_sym_tiles_df_mm"]


def _df_mul(vh, vl, xh, xl):
    """(hi, lo) of (vh + vl) * (xh + xl); the vl*xl term is below the
    2^-48 result precision and dropped (same contract as bell2_df)."""
    p, e = _two_prod(vh, xh)
    return p, e + (vh * xl + vl * xh)


def _sdia_df_body(vh_ref, vl_ref, xh_ref, xl_ref, yh_ref, yl_ref, rb, RB,
                  *, offsets, SP, b=None):
    g = pl.program_id(0)
    base = SP + (g * RB + rb) * SUBLANES

    def xs_load(ref, r0, n=SUBLANES):
        if b is None:
            return ref[pl.ds(r0, n), :]
        return ref[b, pl.ds(r0, n), :]

    def y_get(ref, r0, n):
        if b is None:
            return ref[pl.ds(r0, n), :]
        return ref[b, pl.ds(r0, n), :]

    def y_set(ref, r0, n, v):
        if b is None:
            ref[pl.ds(r0, n), :] = v
        else:
            ref[b, pl.ds(r0, n), :] = v

    lane = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 1)
    lane9 = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES + 1, LANES), 1)
    xbh = xs_load(xh_ref, base)
    xbl = xs_load(xl_ref, base)
    accr_h = jnp.zeros((SUBLANES, LANES), jnp.float32)
    accr_l = jnp.zeros((SUBLANES, LANES), jnp.float32)
    acc0 = None  # the s == 0 transpose group merges into accr's flush

    for s, diags in sorted(_group_by_sublane_shift(offsets).items()):
        a9h = jnp.zeros((SUBLANES + 1, LANES), jnp.float32)
        a9l = jnp.zeros((SUBLANES + 1, LANES), jnp.float32)
        t1h = xs_load(xh_ref, base - s)
        t0h = xs_load(xh_ref, base - s - 1)
        t1l = xs_load(xl_ref, base - s)
        t0l = xs_load(xl_ref, base - s - 1)
        for j, l in diags:
            vh = vh_ref[rb, j]
            vl = vl_ref[rb, j]
            # row side: y[g] += v * x[g - d]
            if l == 0:
                xsh, xsl = t1h, t1l
            else:
                sel = lane < l
                xsh = jnp.where(
                    sel, pltpu.roll(t0h, l, 1), pltpu.roll(t1h, l, 1)
                )
                xsl = jnp.where(
                    sel, pltpu.roll(t0l, l, 1), pltpu.roll(t1l, l, 1)
                )
            p, e = _df_mul(vh, vl, xsh, xsl)
            accr_h, accr_l = _df_add(p, e, accr_h, accr_l)
            # transpose side: y[g - d] += v * x[g] (shifts are exact
            # data movement, so rolling hi and lo independently is safe)
            pt, et = _df_mul(vh, vl, xbh, xbl)
            if l == 0:
                ph = jnp.pad(pt, ((1, 0), (0, 0)))
                pe = jnp.pad(et, ((1, 0), (0, 0)))
            else:
                rp = pltpu.roll(pt, LANES - l, 1)
                re = pltpu.roll(et, LANES - l, 1)
                sel9 = lane9 < LANES - l
                ph = jnp.where(
                    sel9,
                    jnp.pad(rp, ((1, 0), (0, 0))),
                    jnp.pad(rp, ((0, 1), (0, 0))),
                )
                pe = jnp.where(
                    sel9,
                    jnp.pad(re, ((1, 0), (0, 0))),
                    jnp.pad(re, ((0, 1), (0, 0))),
                )
            a9h, a9l = _df_add(ph, pe, a9h, a9l)
        if s == 0:
            acc0 = (a9h, a9l)
        else:
            ch = y_get(yh_ref, base - s - 1, SUBLANES + 1)
            cl = y_get(yl_ref, base - s - 1, SUBLANES + 1)
            nh, nl = _df_add(a9h, a9l, ch, cl)
            y_set(yh_ref, base - s - 1, SUBLANES + 1, nh)
            y_set(yl_ref, base - s - 1, SUBLANES + 1, nl)
    # one combined read-modify-write for the row side + s == 0 group
    if acc0 is not None:
        oh, ol = _df_add(
            jnp.pad(accr_h, ((1, 0), (0, 0))),
            jnp.pad(accr_l, ((1, 0), (0, 0))),
            acc0[0], acc0[1],
        )
        ch = y_get(yh_ref, base - 1, SUBLANES + 1)
        cl = y_get(yl_ref, base - 1, SUBLANES + 1)
        nh, nl = _df_add(oh, ol, ch, cl)
        y_set(yh_ref, base - 1, SUBLANES + 1, nh)
        y_set(yl_ref, base - 1, SUBLANES + 1, nl)
    else:
        ch = y_get(yh_ref, base, SUBLANES)
        cl = y_get(yl_ref, base, SUBLANES)
        nh, nl = _df_add(accr_h, accr_l, ch, cl)
        y_set(yh_ref, base, SUBLANES, nh)
        y_set(yl_ref, base, SUBLANES, nl)


def _sdia_df_kernel(vh_ref, vl_ref, xh_ref, xl_ref, yh_ref, yl_ref, *,
                    offsets, SP, RB, n_rhs=None):
    @pl.when(pl.program_id(0) == 0)
    def _():
        yh_ref[...] = jnp.zeros_like(yh_ref)
        yl_ref[...] = jnp.zeros_like(yl_ref)

    for rb in range(RB):
        for b in ([None] if n_rhs is None else range(n_rhs)):
            _sdia_df_body(vh_ref, vl_ref, xh_ref, xl_ref, yh_ref,
                          yl_ref, rb, RB, offsets=offsets, SP=SP, b=b)


@functools.partial(jax.jit, static_argnames=("offsets", "interpret"))
@_no_x64
def sdia_sym_tiles_df(vals_hi, vals_lo, xh2d, xl2d, *, offsets,
                      interpret=False):
    """(hi, lo) fp32 (T, 128) tile pair of (L + D/2·2 + Lᵀ) x in
    double-float for the dense-diagonal symmetric stream.

    ``vals_*``: (R, D, 8, 128) fp32 planes (hi/lo of the f64 values;
    offset-0 values pre-halved by the tune layer); ``x*2d``:
    (x_rows, 128) hi/lo pair of x. The caller folds hi + lo in float64
    (exact at ~2^-48 relative)."""
    R, D = vals_hi.shape[0], vals_hi.shape[1]
    assert D == len(offsets)
    T = xh2d.shape[0]
    SP = max(d // LANES for d in offsets) + 1
    RB = _blocks_per_step(R, D)
    assert R % RB == 0, "plan must pad R to the RB multiple"
    rows = SP + R * SUBLANES
    xph = jnp.pad(
        xh2d, ((SP, max(0, rows - SP - xh2d.shape[0])), (0, 0))
    )[:rows]
    xpl = jnp.pad(
        xl2d, ((SP, max(0, rows - SP - xl2d.shape[0])), (0, 0))
    )[:rows]
    out_shape = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    yh, yl = pl.pallas_call(
        functools.partial(
            _sdia_df_kernel, offsets=offsets, SP=SP, RB=RB
        ),
        grid=(R // RB,),
        in_specs=[
            pl.BlockSpec(
                (RB, D, SUBLANES, LANES), _i32map(lambda g: (g, 0, 0, 0))
            ),
            pl.BlockSpec(
                (RB, D, SUBLANES, LANES), _i32map(lambda g: (g, 0, 0, 0))
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[out_shape, out_shape],
        cost_estimate=pl.CostEstimate(
            flops=16 * vals_hi.size,
            bytes_accessed=2 * vals_hi.size * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(vals_hi, vals_lo, xph, xpl)
    return yh[SP:SP + T], yl[SP:SP + T]


@functools.partial(jax.jit, static_argnames=("offsets", "interpret"))
@_no_x64
def sdia_sym_tiles_df_mm(vals_hi, vals_lo, xh3d, xl3d, *, offsets,
                         interpret=False):
    """(hi, lo) fp32 (B, T, 128) tile pairs of (L + D/2·2 + Lᵀ) X in
    double-float; X as (B, x_rows, 128) hi/lo pairs. The diagonal value
    planes are read once per row block and re-used across all RHS."""
    R, D = vals_hi.shape[0], vals_hi.shape[1]
    assert D == len(offsets)
    B, T = xh3d.shape[0], xh3d.shape[1]
    SP = max(d // LANES for d in offsets) + 1
    RB = _blocks_per_step(R, D)
    assert R % RB == 0, "plan must pad R to the RB multiple"
    rows = SP + R * SUBLANES
    xph = jnp.pad(
        xh3d, ((0, 0), (SP, max(0, rows - SP - xh3d.shape[1])), (0, 0))
    )[:, :rows]
    xpl = jnp.pad(
        xl3d, ((0, 0), (SP, max(0, rows - SP - xl3d.shape[1])), (0, 0))
    )[:, :rows]
    out_shape = jax.ShapeDtypeStruct((B, rows, LANES), jnp.float32)
    yh, yl = pl.pallas_call(
        functools.partial(
            _sdia_df_kernel, offsets=offsets, SP=SP, RB=RB, n_rhs=B
        ),
        grid=(R // RB,),
        in_specs=[
            pl.BlockSpec(
                (RB, D, SUBLANES, LANES), _i32map(lambda g: (g, 0, 0, 0))
            ),
            pl.BlockSpec(
                (RB, D, SUBLANES, LANES), _i32map(lambda g: (g, 0, 0, 0))
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[out_shape, out_shape],
        interpret=interpret,
    )(vals_hi, vals_lo, xph, xpl)
    return yh[:, SP:SP + T], yl[:, SP:SP + T]
