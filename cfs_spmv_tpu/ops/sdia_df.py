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

__all__ = ["sdia_sym_tiles_df"]


def _df_mul(vh, vl, xh, xl):
    """(hi, lo) of (vh + vl) * (xh + xl); the vl*xl term is below the
    2^-48 result precision and dropped (same contract as bell2_df)."""
    p, e = _two_prod(vh, xh)
    return p, e + (vh * xl + vl * xh)


def _sdia_df_body(vh_ref, vl_ref, xh_ref, xl_ref, yh_ref, yl_ref, rb, RB,
                  *, offsets, SP):
    g = pl.program_id(0)
    base = SP + (g * RB + rb) * SUBLANES

    lane = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 1)
    lane9 = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES + 1, LANES), 1)
    xbh = xh_ref[pl.ds(base, SUBLANES), :]
    xbl = xl_ref[pl.ds(base, SUBLANES), :]
    accr_h = jnp.zeros((SUBLANES, LANES), jnp.float32)
    accr_l = jnp.zeros((SUBLANES, LANES), jnp.float32)
    acc0 = None  # the s == 0 transpose group merges into accr's flush

    for s, diags in sorted(_group_by_sublane_shift(offsets).items()):
        a9h = jnp.zeros((SUBLANES + 1, LANES), jnp.float32)
        a9l = jnp.zeros((SUBLANES + 1, LANES), jnp.float32)
        t1h = xh_ref[pl.ds(base - s, SUBLANES), :]
        t0h = xh_ref[pl.ds(base - s - 1, SUBLANES), :]
        t1l = xl_ref[pl.ds(base - s, SUBLANES), :]
        t0l = xl_ref[pl.ds(base - s - 1, SUBLANES), :]
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
            ch = yh_ref[pl.ds(base - s - 1, SUBLANES + 1), :]
            cl = yl_ref[pl.ds(base - s - 1, SUBLANES + 1), :]
            nh, nl = _df_add(a9h, a9l, ch, cl)
            yh_ref[pl.ds(base - s - 1, SUBLANES + 1), :] = nh
            yl_ref[pl.ds(base - s - 1, SUBLANES + 1), :] = nl
    # one combined read-modify-write for the row side + s == 0 group
    if acc0 is not None:
        oh, ol = _df_add(
            jnp.pad(accr_h, ((1, 0), (0, 0))),
            jnp.pad(accr_l, ((1, 0), (0, 0))),
            acc0[0], acc0[1],
        )
        ch = yh_ref[pl.ds(base - 1, SUBLANES + 1), :]
        cl = yl_ref[pl.ds(base - 1, SUBLANES + 1), :]
        nh, nl = _df_add(oh, ol, ch, cl)
        yh_ref[pl.ds(base - 1, SUBLANES + 1), :] = nh
        yl_ref[pl.ds(base - 1, SUBLANES + 1), :] = nl
    else:
        ch = yh_ref[pl.ds(base, SUBLANES), :]
        cl = yl_ref[pl.ds(base, SUBLANES), :]
        nh, nl = _df_add(accr_h, accr_l, ch, cl)
        yh_ref[pl.ds(base, SUBLANES), :] = nh
        yl_ref[pl.ds(base, SUBLANES), :] = nl


def _sdia_df_kernel(vh_ref, vl_ref, xh_ref, xl_ref, yh_ref, yl_ref, *,
                    offsets, SP, RB):
    @pl.when(pl.program_id(0) == 0)
    def _():
        yh_ref[...] = jnp.zeros_like(yh_ref)
        yl_ref[...] = jnp.zeros_like(yl_ref)

    for rb in range(RB):
        _sdia_df_body(vh_ref, vl_ref, xh_ref, xl_ref, yh_ref, yl_ref,
                      rb, RB, offsets=offsets, SP=SP)


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
