"""cfs_spmv_tpu — TPU-native sparse linear algebra.

A from-scratch JAX/XLA/Pallas framework with the capability set of
cfs-spmv (Elafrou, Goumas, Koziris, SC'19 — conflict-free symmetric SpMV):
MatrixMarket I/O, CSR/COO/SSS/HYB/BELL/BSR layouts, an auto-tuning
preprocessing runtime, Pallas SpMV/SpMM kernels, and multi-chip execution
over a ``jax.sharding.Mesh``.

Umbrella module — the analog of the reference's ``include/cfs.hpp``.
"""

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
