"""The tuning dispatcher: CSR → device-ready tuned plan.

Analog of ``CSRMatrix::tune()`` (``csr_matrix.tpp:230-310``), which
orchestrates partition → HYB split → symmetry compression → kernel
binding. Here the pipeline is: triangle split (symmetric) → BELL layout
with window assignment (which *implies* the HYB split via spilling) →
device upload → apply-function binding.

Improvement over the reference (SURVEY §5 checkpoint gap): tuned plans are
pure NumPy pytrees and can be cached to disk via ``plan_cache``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np

from ..formats.bell import BellPlan, build_bell_plan
from ..formats.csr import CSR
from ..formats.sss import SSSPlan, build_sss_plan
from ..ops import spmv as spmv_ops
from ..utils.config import config
from ..utils.logging import info, warn
from ..utils.platform import Format, Kernel, Tuning

__all__ = ["TunedMatrix", "tune"]


@dataclasses.dataclass
class TunedMatrix:
    """A tuned, device-resident matrix with bound apply functions.

    The analog of a tuned ``CSRMatrix`` with its ``spmv_fn`` pointer bound
    (``csr_matrix.hpp:124``); binding here closes over device arrays and
    returns jitted callables.
    """

    format: Format
    nrows: int
    ncols: int
    nnz_full: int
    symmetric: bool
    plan: object  # BellPlan | SSSPlan
    _matvec: Callable
    _matmat: Callable
    spill_fraction: float
    padding_ratio: float

    def matvec(self, x):
        return self._matvec(x)

    def matmat(self, x):
        return self._matmat(x)

    def stream_bytes(self) -> int:
        return self.plan.stream_bytes()


def tune(
    csr: CSR,
    *,
    fmt: Format = Format.NONE,
    kernel: Kernel = Kernel.SpDMV,
    tuning: Tuning = Tuning.AGGRESSIVE,
    dtype=np.float32,
) -> TunedMatrix:
    """Select a layout and build the tuned matrix.

    Format selection mirrors the reference factory
    (``sparse_matrix.tpp:14-24``): ``SSS``/``HYB`` require symmetric
    storage; ``NONE`` auto-picks SSS for symmetric matrices under
    aggressive tuning, else general BELL (the tuned-CSR analog).
    """
    del kernel  # SpDMV/SpDMM share plans; both appliers are bound below
    if fmt == Format.NONE:
        fmt = (
            Format.SSS
            if (csr.symmetric and tuning == Tuning.AGGRESSIVE)
            else Format.CSR
        )
    if fmt in (Format.SSS, Format.HYB) and not csr.symmetric:
        raise ValueError(f"format {fmt} requires a symmetric matrix")

    if fmt in (Format.SSS, Format.HYB):
        plan = build_sss_plan(csr, dtype=dtype)
        lo = spmv_ops.to_device(plan.lower)
        up = spmv_ops.to_device(plan.upper)
        import jax.numpy as jnp

        diag = jnp.asarray(plan.diag)

        def matvec(x, lo=lo, up=up, diag=diag):
            return spmv_ops.sym_apply(lo, up, diag, x)

        def matmat(x, lo=lo, up=up, diag=diag):
            return spmv_ops.sym_apply_mm(lo, up, diag, x)

        tuned = TunedMatrix(
            fmt, csr.nrows, csr.ncols, plan.nnz_full, True, plan,
            matvec, matmat, plan.spill_fraction,
            (plan.lower.padding_ratio + plan.upper.padding_ratio) / 2,
        )
    elif fmt in (Format.CSR, Format.BELL, Format.COO):
        src = csr.to_coo().expand_symmetric() if csr.symmetric else None
        gen_csr = CSR.from_coo(src) if src is not None else csr
        plan = build_bell_plan(gen_csr, dtype=dtype)
        dev = spmv_ops.to_device(plan)

        def matvec(x, dev=dev):
            return spmv_ops.bell_apply(dev, x)

        def matmat(x, dev=dev):
            return spmv_ops.bell_apply_mm(dev, x)

        tuned = TunedMatrix(
            Format.CSR, gen_csr.nrows, gen_csr.ncols, gen_csr.nnz,
            csr.symmetric, plan, matvec, matmat,
            plan.spill_fraction, plan.padding_ratio,
        )
    else:
        raise NotImplementedError(f"format {fmt}")

    if tuned.spill_fraction > config.spill_warn_fraction:
        warn(
            "spill fraction %.3f exceeds %.3f — matrix is a poor fit for "
            "the banded layout; scattered-stream path will dominate",
            tuned.spill_fraction, config.spill_warn_fraction,
        )
    info(
        "tune: fmt=%s nnz=%d pad=%.2fx spill=%.4f",
        tuned.format, tuned.nnz_full, tuned.padding_ratio,
        tuned.spill_fraction,
    )
    return tuned
