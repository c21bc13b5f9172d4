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

from ..formats.bell2 import build_bell2_plan
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
    (``csr_matrix.hpp:124``); binding here closes over device arrays and
    returns jitted callables.
    """

    format: Format
    nrows: int
    ncols: int
    nnz_full: int
    symmetric: bool
    plan: object
    _matvec: Callable
    _matmat: Callable
    spill_fraction: float  # far-stream fraction for symmetric plans
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
    aggressive tuning, else general BELL2 (the tuned-CSR analog).
    ``Tuning.NONE`` on a symmetric matrix expands it and runs the
    one-sided kernel (the untuned-oracle path of the reference's
    differential tests, ``test_spmv_mmf.cpp:85-89``).
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

    if fmt in (Format.SSS, Format.HYB) and tuning == Tuning.AGGRESSIVE:
        plan = build_sbell_plan(csr, dtype=dtype)
        dev = spmv_ops.sym_to_device(plan)

        def matvec(x, dev=dev):
            return spmv_ops.sbell_apply(dev, x)

        def matmat(x, dev=dev):
            return spmv_ops.sbell_apply_mm(dev, x)

        tuned = TunedMatrix(
            fmt, csr.nrows, csr.ncols, plan.nnz_full, True, plan,
            matvec, matmat, plan.far_fraction, plan.padding_ratio,
        )
    elif fmt in (Format.CSR, Format.BELL, Format.COO, Format.SSS, Format.HYB):
        src = csr.to_coo().expand_symmetric() if csr.symmetric else None
        gen_csr = CSR.from_coo(src) if src is not None else csr
        plan = build_bell2_plan(gen_csr, dtype=dtype)
        dev = spmv_ops.to_device(plan)

        def matvec(x, dev=dev):
            return spmv_ops.bell2_apply(dev, x)

        def matmat(x, dev=dev):
            return spmv_ops.bell2_apply_mm(dev, x)

        tuned = TunedMatrix(
            Format.CSR, gen_csr.nrows, gen_csr.ncols, gen_csr.nnz,
            csr.symmetric, plan, matvec, matmat,
            0.0, plan.padding_ratio,
        )
    else:
        raise NotImplementedError(f"format {fmt}")

    info(
        "tune: fmt=%s nnz=%d pad=%.2fx far=%.4f",
        tuned.format, tuned.nnz_full, tuned.padding_ratio,
        tuned.spill_fraction,
    )
    return tuned
