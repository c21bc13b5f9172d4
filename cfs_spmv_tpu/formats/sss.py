"""SSS — symmetric sparse skyline, TPU-native.

The reference's symmetric path stores, per thread, the strict lower
triangle + a separate diagonal (``SymThreadData``,
``csr_matrix.hpp:221-277``) and folds the transpose contribution in with
conflict-free colored scatters (``csr_matrix.tpp:1204-1639``).

TPU-native SSS keeps the same storage *semantics* — diagonal array +
strict lower triangle — but realizes the transpose term as a second
row-major BELL stream over Lᵀ. Both streams are scatter-free; coloring,
conflict graphs and phase barriers vanish by construction (documented
intentional divergence, SURVEY §2 parallelism table).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .bell import BellPlan, build_bell_plan
from .coo import COO
from .csr import CSR

__all__ = ["SSSPlan", "build_sss_plan"]


@dataclasses.dataclass
class SSSPlan:
    nrows: int
    nnz_full: int  # logical nnz of the expanded matrix (for GFLOP/s)
    diag: np.ndarray  # (nrows,)
    lower: BellPlan  # strict lower triangle, row-major
    upper: BellPlan  # strict upper triangle (= lowerᵀ), row-major

    @property
    def spill_fraction(self) -> float:
        s = (0 if self.lower.spill is None else self.lower.spill.nnz) + (
            0 if self.upper.spill is None else self.upper.spill.nnz
        )
        return s / max(self.nnz_full, 1)

    def stream_bytes(self) -> int:
        return (
            self.lower.stream_bytes()
            + self.upper.stream_bytes()
            + self.diag.nbytes
        )


def build_sss_plan(csr: CSR, *, dtype=np.float32) -> SSSPlan:
    """Build the symmetric plan from a lower-triangle CSR
    (``csr.symmetric`` must be True) or from a full symmetric CSR.
    """
    if csr.symmetric:
        lower_csr, diag, upper_csr = csr.split_triangle()
        # csr stores only the lower triangle; upper = lowerᵀ
        upper_csr = lower_csr.transpose()
        nnz_full = 2 * lower_csr.nnz + int(np.count_nonzero(diag))
    else:
        lower_csr, diag, upper_csr = csr.split_triangle()
        nnz_full = csr.nnz
    lower = build_bell_plan(lower_csr, dtype=dtype)
    upper = build_bell_plan(upper_csr, dtype=dtype)
    return SSSPlan(csr.nrows, nnz_full, diag.astype(dtype), lower, upper)
