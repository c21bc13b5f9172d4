"""cfs_spmv_tpu — TPU-native sparse linear algebra.

A from-scratch JAX/XLA/Pallas framework with the capability set of
cfs-spmv (Elafrou, Goumas, Koziris, SC'19 — conflict-free symmetric SpMV):
MatrixMarket I/O, CSR/COO/SSS/HYB/BELL/BSR layouts, an auto-tuning
preprocessing runtime, Pallas SpMV/SpMM kernels, and multi-chip execution
over a ``jax.sharding.Mesh``.

Umbrella module — the analog of the reference's ``include/cfs.hpp``.
"""

import os as _os

# NumPy's transparent-hugepage madvise triggers SYNCHRONOUS kernel
# compaction on hosts with THP defrag=madvise: every big fresh
# allocation stalls in-kernel (measured 37x on a 240 MB gather on the
# v5e build host). Preprocessing is allocation-heavy; opt out unless
# the user explicitly opted in. Effective only if numpy is not yet
# imported — harmless otherwise.
_os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

from .formats.coo import COO
from .formats.csr import CSR
from .matrix import SparseMatrix
from .models.spdmv import SpDMM, SpDMV
from .utils.config import apply_jax_compile_cache as _cc
from .utils.platform import Format, Kernel, Platform, Tuning, is_equal

_cc()  # honor CFS_COMPILE_CACHE before any backend work

__version__ = "0.1.0"

__all__ = [
    "COO",
    "CSR",
    "SparseMatrix",
    "SpDMV",
    "SpDMM",
    "Format",
    "Kernel",
    "Platform",
    "Tuning",
    "is_equal",
    "__version__",
]
