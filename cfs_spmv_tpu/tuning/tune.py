"""The tuning dispatcher: CSR → device-ready tuned plan.

Analog of ``CSRMatrix::tune()`` (``csr_matrix.tpp:230-310``), which
orchestrates partition → HYB split → symmetry compression → kernel
binding. Here the pipeline is: triangle split (symmetric) → BELL2/SBELL
layout construction (the far-stream split subsumes the HYB decision) →
device upload → apply-function binding.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np


from ..formats.csr import CSR
from ..formats.sbell import build_sbell_plan
from ..ops import spmv as spmv_ops
from ..utils.logging import info
from ..utils.platform import Format, Kernel, Tuning

__all__ = ["TunedMatrix", "tune"]


@dataclasses.dataclass
class TunedMatrix:
    """A tuned, device-resident matrix with bound apply functions.

    The analog of a tuned ``CSRMatrix`` with its ``spmv_fn`` pointer bound
    (``csr_matrix.hpp:124``). The appliers are pure functions of
    (operands, x): the device pytree always travels as a jit argument —
    closures over device arrays would be re-embedded as module constants
    by any outer jit.
    """

    format: Format
    nrows: int
    ncols: int
    nnz_full: int
    symmetric: bool
    plan: object
    operands: object  # device pytree threaded through jit as an ARGUMENT
    _apply_mv: Callable  # pure (operands, x) -> y
    _apply_mm: Callable  # pure (operands, X) -> Y
    spill_fraction: float  # far-stream fraction for symmetric plans
    padding_ratio: float
    perm: np.ndarray | None = None  # RCM row order, if applied
    bsr: object | None = None  # BSR host container when fmt=BSR
    #: un-permuted appliers + operands when RCM is applied (the wrapped
    #: matvec pays two 1-D gathers per call — fine for one-shot applies,
    #: ~20x the kernel cost in a solver loop, so solvers work in
    #: permuted space via pure_apply + encode/decode)
    _inner: tuple | None = None

    def matvec(self, x):
        return self._apply_mv(self.operands, x)

    def matmat(self, x):
        return self._apply_mm(self.operands, x)

    def pure_apply(self):
        """(fn, operands) with fn pure in its arguments — compose THIS
        under outer jits (solvers, timing loops); closing over the bound
        methods instead would inline the whole matrix stream as module
        constants. When RCM reordering is active the returned fn works
        in PERMUTED space: feed it ``encode(x)`` and ``decode`` the
        result (norms are permutation-invariant, so solver scalars need
        no translation)."""
        if self._inner is not None:
            mv, _, ops = self._inner
            return mv, ops
        return self._apply_mv, self.operands

    def pure_apply_mm(self):
        if self._inner is not None:
            _, mm, ops = self._inner
            return mm, ops
        return self._apply_mm, self.operands

    def encode(self, x):
        """User space → internal (permuted) space."""
        if self.perm is None:
            return x
        return x[self.perm]  # rows of a 2-D X permute the same way

    def decode(self, y):
        """Internal (permuted) space → user space."""
        if self.perm is None:
            return y
        iperm = np.empty_like(self.perm)
        iperm[self.perm] = np.arange(len(self.perm))
        return y[iperm]

    def stream_bytes(self) -> int:
        return self.plan.stream_bytes()


def tune(
    csr: CSR,
    *,
    fmt: Format = Format.NONE,
    kernel: Kernel = Kernel.SpDMV,
    tuning: Tuning = Tuning.AGGRESSIVE,
    dtype=np.float32,
    cache_dir: str | None = None,
    reorder: bool | str = "auto",
    values: str = "same",
) -> TunedMatrix:
    """Select a layout and build the tuned matrix.

    Format selection mirrors the reference factory
    (``sparse_matrix.tpp:14-24``): ``SSS``/``HYB`` require symmetric
    storage; ``NONE`` auto-picks SSS for symmetric matrices under
    aggressive tuning, else general BELL2 (the tuned-CSR analog).
    ``Tuning.NONE`` on a symmetric matrix expands it and runs the
    one-sided kernel (the untuned-oracle path of the reference's
    differential tests, ``test_spmv_mmf.cpp:85-89``).

    ``reorder``: bandwidth-reducing RCM permutation (the locality analog
    of the reference's METIS placement, ``csr_matrix.tpp:543-639``).
    ``"auto"`` applies it only when it shrinks the mean bandwidth 2x on a
    scattered square matrix; ``True`` forces, ``False`` disables.

    ``values="bfloat16"`` stores stream values in bfloat16 (halving HBM
    traffic) while x/y and accumulation stay float32 — a TPU-native
    extra beyond the reference's float/double pair; results carry
    bfloat16 tolerances (~4e-3 relative per value).
    """
    del kernel  # SpDMV/SpDMM share plans; both appliers are bound below
    from ..io.plancache import cached_build
    from ..utils.config import config as _cfg

    if cache_dir is None:
        cache_dir = _cfg.plan_cache_dir
    if fmt == Format.NONE:
        fmt = (
            Format.SSS
            if (csr.symmetric and tuning == Tuning.AGGRESSIVE)
            else Format.CSR
        )
    bsr = None
    if fmt == Format.BSR:
        # BSR is a host-format contract (block detection + 1/b² index
        # storage, formats/bsr.py); the tuned execution path is shared —
        # TPU kernels exploit block structure via diagonal units, not
        # block indexing.
        from ..formats.bsr import BSR, detect_block_size

        bsr = BSR.from_csr(csr, detect_block_size(csr))
        fmt = Format.SSS if csr.symmetric else Format.CSR

    if fmt in (Format.SSS, Format.HYB) and not csr.symmetric:
        raise ValueError(f"format {fmt} requires a symmetric matrix")

    if np.dtype(dtype) == np.float64 and not spmv_ops.use_interpret():
        # Pallas TPU has no 64-bit lanes; fp64 (the reference test
        # binary's pinned type, test_spmv_mmf.cpp:17) runs through the
        # double-float Pallas path (fp32 hi+lo pairs, ~2^-48 relative —
        # ops/bell2_df.py; CFS_FP64=xla selects the old emulated XLA
        # ELL+COO path, 0.069 Gnnz/s measured).
        import jax

        if not jax.config.jax_enable_x64:
            raise ValueError(
                "float64 requested but jax_enable_x64 is off; enable it "
                "or use float32"
            )
        if _cfg.fp64_path not in ("df", "xla"):
            raise ValueError(
                f"CFS_FP64 must be 'df' or 'xla', got "
                f"{_cfg.fp64_path!r}"
            )
        if _cfg.fp64_path == "df":
            tuned = _tune_fp64_df(csr, fmt, cache_dir=cache_dir)
            if tuned is not None:
                return tuned
        return _tune_fp64_xla(csr, fmt)

    perm = None
    if (
        reorder
        and tuning == Tuning.AGGRESSIVE
        and csr.nrows == csr.ncols
        and csr.nnz
    ):
        import time as _time

        from .reorder import choose_reorder

        _t0 = _time.perf_counter()
        res, _, _ = choose_reorder(
            csr, min_gain=2.0 if reorder == "auto" else 1.0
        )
        info("tune: reorder decision %.1fs", _time.perf_counter() - _t0)
        if res is not None:
            perm, csr = res

    if fmt in (Format.SSS, Format.HYB) and tuning == Tuning.AGGRESSIVE:
        plan = cached_build(
            lambda: _cast_values(build_sbell_plan(csr, dtype=dtype), values),
            csr, dtype, cache_dir, fmt="sbell", values=values,
        )
        dev = spmv_ops.sym_to_device(plan)
        tuned = TunedMatrix(
            fmt, csr.nrows, csr.ncols, plan.nnz_full, True, plan,
            dev, spmv_ops.sbell_apply, spmv_ops.sbell_apply_mm,
            plan.far_fraction, plan.padding_ratio,
        )
    elif fmt in (Format.CSR, Format.BELL, Format.COO, Format.SSS, Format.HYB):
        from ..formats.bell2 import build_general_plan

        src = csr.to_coo().expand_symmetric() if csr.symmetric else None
        gen_csr = CSR.from_coo(src) if src is not None else csr
        # aggressive tuning peels dense signed-offset diagonals into the
        # index-free SDIA stream (general banded/stencil structure);
        # Tuning.NONE stays the plain one-sided oracle path
        peel = tuning == Tuning.AGGRESSIVE
        plan = cached_build(
            lambda: _cast_values(
                build_general_plan(gen_csr, dtype=dtype, dia=peel), values
            ),
            gen_csr, dtype, cache_dir, fmt="bell2", values=values,
            dia=peel,
        )
        dev = spmv_ops.to_device(plan)
        tuned = TunedMatrix(
            Format.CSR, gen_csr.nrows, gen_csr.ncols, gen_csr.nnz,
            csr.symmetric, plan,
            dev, spmv_ops.bell2_apply, spmv_ops.bell2_apply_mm,
            0.0, plan.padding_ratio,
        )
    else:
        raise NotImplementedError(f"format {fmt}")

    if perm is not None:
        tuned = _permuted(tuned, perm)
    if bsr is not None:
        tuned = dataclasses.replace(tuned, format=Format.BSR, bsr=bsr)
    if tuned.spill_fraction > _cfg.spill_warn_fraction:
        from ..utils.logging import warn

        warn(
            "tune: %.0f%% of nonzeros fell to the one-sided far stream "
            "(scattered structure; consider reorder=True)",
            100 * tuned.spill_fraction,
        )
    info(
        "tune: fmt=%s nnz=%d pad=%.2fx far=%.4f reorder=%s",
        tuned.format, tuned.nnz_full, tuned.padding_ratio,
        tuned.spill_fraction, perm is not None,
    )
    return tuned


def _cast_values(plan, values: str):
    """Cast stream value arrays to the storage dtype (bf16 halves HBM
    traffic; indices/metadata/x/y/diag are untouched)."""
    if values == "same":
        return plan
    if values != "bfloat16":
        raise ValueError(f"values must be 'same' or 'bfloat16', got {values}")
    import jax.numpy as jnp

    vdt = jnp.bfloat16
    plan.vals = plan.vals.astype(vdt)
    if getattr(plan, "far", None) is not None:
        plan.far.vals = plan.far.vals.astype(vdt)
    if getattr(plan, "dia", None) is not None:
        plan.dia.vals = plan.dia.vals.astype(vdt)
    return plan


def _permuted(tuned: TunedMatrix, perm: np.ndarray) -> TunedMatrix:
    """Wrap the appliers with the P A Pᵀ input/output gathers; the
    permutation arrays travel inside the operands pytree."""
    import jax.numpy as jnp

    iperm = np.empty_like(perm)
    iperm[perm] = np.arange(len(perm))
    operands = {
        "dev": tuned.operands,
        "p": jnp.asarray(perm),
        "ip": jnp.asarray(iperm),
    }
    inner_mv, inner_mm = tuned._apply_mv, tuned._apply_mm

    def apply_mv(ops, x):
        y = inner_mv(ops["dev"], jnp.take(x, ops["p"], axis=0))
        return jnp.take(y, ops["ip"], axis=0)

    def apply_mm(ops, x):
        y = inner_mm(ops["dev"], jnp.take(x, ops["p"], axis=0))
        return jnp.take(y, ops["ip"], axis=0)

    return dataclasses.replace(
        tuned, operands=operands, _apply_mv=apply_mv, _apply_mm=apply_mm,
        perm=perm, _inner=(inner_mv, inner_mm, tuned.operands),
    )


@dataclasses.dataclass
class CooDevicePlan:
    """Device arrays backing the fp64-on-TPU XLA path (ELL slab +
    COO skew remainder; ``row is None`` when no remainder)."""

    row: object
    col: object
    val: object
    ecol: object = None
    evals: object = None

    def stream_bytes(self) -> int:
        return sum(int(a.size) * a.dtype.itemsize
                   for a in (self.row, self.col, self.val,
                             self.ecol, self.evals)
                   if a is not None)


def _tune_fp64_df(csr: CSR, fmt: Format,
                  cache_dir: str | None = None) -> TunedMatrix | None:
    """fp64 via the double-float Pallas kernels.

    Symmetric square matrices first peel dense diagonals into a df SDIA
    stream (``ops/sdia_df``: values stay in the paired strict-lower
    representation, run through the static-shift datapath as fp32
    (hi, lo) planes — no 2x expansion, no gathers; offset 0 is admitted
    with pre-halved values so row + transpose sides sum to the full
    diagonal term). The residual — everything for asymmetric matrices —
    expands to one BELL2 plan whose values are fp32 (hi, lo) pairs (the
    lo plane rides ``Bell2Plan.vals2``; ``ops/bell2_df``); x splits on
    device; y folds back to float64. Returns None when a nonempty
    residual plan is not word-eligible (non-contig windows or
    > PREF_CMAX chunks) — the caller then falls back to the XLA path.

    Reference: ``--enable-dp`` runs every kernel — including the
    symmetric bandwidth-structured ones — in double
    (``configure.ac:48-67``, ``csr_matrix.tpp:2706-3028``)."""
    import jax.numpy as jnp

    from ..formats.bell2 import build_bell2_from_arrays
    from ..formats.sdia import SDIA_SYM_ROWS_MAX, extract_sdia
    from ..ops.bell2_df import bell2_spmv_tiles_df, fold_df_tiles, split_df
    from ..ops.bell2_kernel import meta_word, word_eligible
    from ..ops.sdia_df import sdia_sym_tiles_df
    from ..ops.spmv import pad_x

    from ..io.plancache import cached_build

    if csr.nnz == 0:
        return None  # trivial: let the XLA path return zeros
    nrows = csr.nrows
    # df pairs double the whole-x+y-in-VMEM footprint of the symmetric
    # SDIA kernel, so its row ceiling halves
    sym_sdia_ok = (
        csr.symmetric and csr.nrows == csr.ncols
        and csr.nrows <= SDIA_SYM_ROWS_MAX // 2
    )

    def _build():
        if sym_sdia_ok:
            lcoo = csr.to_coo()  # lower triangle incl. diagonal
            row_l = np.asarray(lcoo.row)
            col_l = np.asarray(lcoo.col)
            val_l = np.asarray(lcoo.val, np.float64)
            dia, resid = extract_sdia(
                row_l, col_l, val_l, nrows, dtype=np.float64,
                include_zero=True, min_frac=0.25,
            )
            if dia is not None:
                if 0 in dia.offsets:
                    # halve the main diagonal (exact: x0.5 scales the
                    # f64 exponent) — the kernel's row and transpose
                    # sides then each contribute half
                    dia.vals[:, dia.offsets.index(0)] *= 0.5
                rr, cc, vv = row_l[resid], col_l[resid], val_l[resid]
                strict = rr != cc
                er = np.concatenate([rr, cc[strict]]).astype(np.int32)
                ec = np.concatenate([cc, rr[strict]]).astype(np.int32)
                hi, lo = split_df(np.concatenate([vv, vv[strict]]))
                plan = build_bell2_from_arrays(
                    nrows, nrows, er, ec, hi, dtype=np.float32, val2=lo,
                    force_slot=True,
                )
                plan.dia = dia
                return plan
        coo = (
            csr.to_coo().expand_symmetric() if csr.symmetric
            else csr.to_coo()
        )
        hi, lo = split_df(np.asarray(coo.val, np.float64))
        return build_bell2_from_arrays(
            coo.nrows, coo.ncols,
            np.asarray(coo.row, np.int32), np.asarray(coo.col, np.int32),
            hi, dtype=np.float32, val2=lo, force_slot=True,
        )

    plan = cached_build(
        _build, csr, np.float64, cache_dir, fmt="bell2_df",
    )
    meta_np = np.asarray(plan.meta)
    has_far = plan.nnz > 0
    if has_far and (plan.vals2 is None or not word_eligible(
        meta_np, contig=plan.windows_contig, depth=plan.window_depth,
        tiles_per_block=plan.tiles_per_block,
    )):
        info("tune: fp64 df plan not word-eligible -> XLA fallback")
        return None
    dev = {
        "vh": jnp.asarray(plan.vals),
        "vl": None if plan.vals2 is None else jnp.asarray(plan.vals2),
        "pk": jnp.asarray(plan.packed),
        "mw": jnp.asarray(meta_word(meta_np)),
        "sb": jnp.asarray(plan.step_block),
        "perm": None if plan.row_perm is None
        else jnp.asarray(plan.row_perm),
    }
    LANES = 128
    dia_plan = plan.dia
    if dia_plan is not None:
        dh, dl = split_df(np.asarray(dia_plan.vals, np.float64))
        dev["dh"] = jnp.asarray(dh)
        dev["dl"] = jnp.asarray(dl)
    dia_offsets = None if dia_plan is None else tuple(dia_plan.offsets)
    dia_T = -(-nrows // LANES)
    T = plan.num_row_tiles
    x_rows, K, BT = plan.x_rows, plan.chunks_per_step, plan.tiles_per_block
    depth = plan.window_depth

    def _one(ops, x):
        xh, xl = split_df(x)
        y = None
        if has_far:
            yh, yl = bell2_spmv_tiles_df(
                ops["vh"], ops["vl"], ops["pk"], ops["mw"], ops["sb"],
                pad_x(xh, x_rows), pad_x(xl, x_rows),
                num_row_tiles=T, chunks_per_step=K, tiles_per_block=BT,
                depth=depth, interpret=spmv_ops.use_interpret(),
            )
            tiles = fold_df_tiles(yh, yl, T)
            flat = tiles.reshape(-1)
            if ops["perm"] is not None:
                # grouped plan: gather back to original row order (rows
                # in unvisited blocks / absent rows hit the zero
                # sentinel)
                flat = jnp.concatenate(
                    [flat, jnp.zeros((1,), flat.dtype)]
                )
                y = flat[ops["perm"]]
            else:
                y = flat[:nrows]
        if dia_offsets is not None:
            dyh, dyl = sdia_sym_tiles_df(
                ops["dh"], ops["dl"],
                pad_x(xh, dia_T), pad_x(xl, dia_T),
                offsets=dia_offsets,
                interpret=spmv_ops.use_interpret(),
            )
            ydia = (
                dyh.astype(jnp.float64) + dyl.astype(jnp.float64)
            ).reshape(-1)[:nrows]
            y = ydia if y is None else y + ydia
        return y

    def apply_mv(ops, x):
        return _one(ops, x)

    def _mm_group(ops, xb):
        """One <=8-RHS group through the batched df kernels (streams
        and diagonal planes read once per chunk/block, not per RHS)."""
        from ..ops.bell2_df import bell2_spmm_tiles_df
        from ..ops.sdia_df import sdia_sym_tiles_df_mm

        b = xb.shape[1]
        xh, xl = split_df(xb.T)  # (b, n) fp32 pairs

        def to3(a, rows):
            return jnp.pad(
                a, ((0, 0), (0, rows * LANES - a.shape[1]))
            ).reshape(b, rows, LANES)

        y = None
        if has_far:
            yh, yl = bell2_spmm_tiles_df(
                ops["vh"], ops["vl"], ops["pk"], ops["mw"], ops["sb"],
                to3(xh, x_rows), to3(xl, x_rows),
                num_row_tiles=T, chunks_per_step=K, tiles_per_block=BT,
                depth=depth, interpret=spmv_ops.use_interpret(),
            )
            flat = (
                yh.astype(jnp.float64) + yl.astype(jnp.float64)
            ).reshape(b, -1)
            if ops["perm"] is not None:
                flat = jnp.concatenate(
                    [flat, jnp.zeros((b, 1), flat.dtype)], axis=1
                )
                y = flat[:, ops["perm"]]
            else:
                y = flat[:, :nrows]
        if dia_offsets is not None:
            dyh, dyl = sdia_sym_tiles_df_mm(
                ops["dh"], ops["dl"], to3(xh, dia_T), to3(xl, dia_T),
                offsets=dia_offsets, interpret=spmv_ops.use_interpret(),
            )
            ydia = (
                dyh.astype(jnp.float64) + dyl.astype(jnp.float64)
            ).reshape(b, -1)[:, :nrows]
            y = ydia if y is None else y + ydia
        return y.T

    #: batched df MM limits: the word kernel double-buffers (B, BT, 128)
    #: hi/lo out blocks in ~16 MB scoped VMEM (B=8 at BT=512 measured
    #: 428 KB over), so the group size scales down with BT; and the
    #: kernels keep B x/y pair planes whole in VMEM, so past
    #: _DF_MM_ROWS_MAX (rows-of-128 x B) the matrix falls back to one
    #: df SpMV per column
    _DF_MM_ROWS_MAX = 40_000
    gmax = int(max(1, min(8, 2048 // max(BT, 1))))

    def apply_mm(ops, x):
        B_all = x.shape[1]
        rows_bound = max(x_rows if has_far else 0,
                         dia_T if dia_offsets is not None else 0)
        if min(B_all, gmax) * rows_bound > _DF_MM_ROWS_MAX:
            cols = [_one(ops, x[:, c]) for c in range(B_all)]
            return jnp.stack(cols, axis=1)
        # zero-pad the tail group to gmax: B is a static kernel shape,
        # so a remainder group would compile a second Pallas executable
        # (30-100 s per shape through the axon tunnel)
        pad = (-B_all) % gmax if B_all > gmax else 0
        xp = (
            jnp.pad(x, ((0, 0), (0, pad))) if pad else x
        )
        cols = [
            _mm_group(ops, xp[:, c0:c0 + gmax])
            for c0 in range(0, xp.shape[1], gmax)
        ]
        out = cols[0] if len(cols) == 1 else jnp.concatenate(cols, 1)
        return out[:, :B_all]

    nnz_log = plan.nnz + (0 if dia_plan is None else dia_plan.nnz)
    if csr.symmetric:
        ndiag = int(np.count_nonzero(
            np.asarray(csr.indices)
            == np.repeat(np.arange(nrows), np.diff(csr.indptr))
        )) if dia_plan is not None else 0
        nnz_log = 2 * csr.nnz - ndiag if dia_plan is not None else plan.nnz
    info(
        "tune: fp64 -> double-float Pallas path, nnz=%d chunks=%d "
        "pad=%.2fx depth=%d grouped=%s sdia=%s",
        nnz_log, plan.num_chunks, plan.padding_ratio, depth,
        plan.row_perm is not None,
        0 if dia_plan is None else len(dia_plan.offsets),
    )
    return TunedMatrix(
        fmt, nrows, csr.ncols, nnz_log, csr.symmetric, plan,
        dev, apply_mv, apply_mm, 0.0, plan.padding_ratio,
    )


def _tune_fp64_xla(csr: CSR, fmt: Format) -> TunedMatrix:
    import jax.numpy as jnp

    from ..ops.xla_ref import (
        build_ell_hyb,
        coo_spmm_xla,
        coo_spmv_xla,
        ell_spmm_xla,
        ell_spmv_xla,
    )

    coo = csr.to_coo().expand_symmetric() if csr.symmetric else csr.to_coo()
    nrows = csr.nrows
    # scatter-free ELL slab for the regular part; only the skew tail
    # (rows > 4x mean length) stays on the COO scatter-add path. The
    # pure-COO formulation measured 0.009 Gnnz/s on v5e (22 ms for
    # 205K nnz) — the emulated-fp64 scatter dominated; the dense
    # gather/multiply/row-sum is 3 orders faster.
    ecol, evals, rrow, rcol, rval = build_ell_hyb(
        coo.row, coo.col, coo.val.astype(np.float64), nrows
    )
    has_rem = len(rrow) > 0
    dev = {
        "ecol": jnp.asarray(ecol),
        "evals": jnp.asarray(evals),
        "row": jnp.asarray(rrow.astype(np.int32)) if has_rem else None,
        "col": jnp.asarray(rcol.astype(np.int32)) if has_rem else None,
        "val": jnp.asarray(rval) if has_rem else None,
    }

    def apply_mv(ops, x):
        y = ell_spmv_xla(ops["ecol"], ops["evals"], x)
        if ops["row"] is not None:
            y = y + coo_spmv_xla(ops["row"], ops["col"], ops["val"], x,
                                 nrows=nrows)
        return y

    def apply_mm(ops, x):
        y = ell_spmm_xla(ops["ecol"], ops["evals"], x)
        if ops["row"] is not None:
            y = y + coo_spmm_xla(ops["row"], ops["col"], ops["val"], x,
                                 nrows=nrows)
        return y

    info(
        "tune: fp64 on TPU -> XLA ELL(%d)+COO path, nnz=%d (rem %d)",
        ecol.shape[1], coo.nnz, len(rrow),
    )
    return TunedMatrix(
        fmt, nrows, csr.ncols, coo.nnz, csr.symmetric,
        CooDevicePlan(dev["row"], dev["col"], dev["val"],
                      dev["ecol"], dev["evals"]),
        dev, apply_mv, apply_mm, 0.0,
        float(ecol.size + len(rrow)) / max(coo.nnz, 1),
    )
