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
    cache_dir: str | None = None,
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
    if fmt in (Format.SSS, Format.HYB) and not csr.symmetric:
        raise ValueError(f"format {fmt} requires a symmetric matrix")

    if np.dtype(dtype) == np.float64 and not spmv_ops.use_interpret():
        # Pallas TPU has no 64-bit lanes; fp64 (the reference test
        # binary's pinned type, test_spmv_mmf.cpp:17) runs through the
        # pure-XLA COO path — emulated and slow, for correctness checks
        # on small matrices (SURVEY §7 hard parts).
        import jax

        if not jax.config.jax_enable_x64:
            raise ValueError(
                "float64 requested but jax_enable_x64 is off; enable it "
                "or use float32"
            )
        return _tune_fp64_xla(csr, fmt)

    if fmt in (Format.SSS, Format.HYB) and tuning == Tuning.AGGRESSIVE:
        plan = cached_build(
            lambda: build_sbell_plan(csr, dtype=dtype),
            csr, dtype, cache_dir, fmt="sbell",
        )
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
        plan = cached_build(
            lambda: build_bell2_plan(gen_csr, dtype=dtype),
            gen_csr, dtype, cache_dir, fmt="bell2",
        )
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


@dataclasses.dataclass
class CooDevicePlan:
    """Device COO arrays backing the fp64-on-TPU XLA path."""

    row: object
    col: object
    val: object

    def stream_bytes(self) -> int:
        return sum(int(a.size) * a.dtype.itemsize
                   for a in (self.row, self.col, self.val))


def _tune_fp64_xla(csr: CSR, fmt: Format) -> TunedMatrix:
    import jax.numpy as jnp

    from ..ops.xla_ref import coo_spmm_xla, coo_spmv_xla

    coo = csr.to_coo().expand_symmetric() if csr.symmetric else csr.to_coo()
    nrows = csr.nrows
    dev = CooDevicePlan(
        jnp.asarray(coo.row.astype(np.int32)),
        jnp.asarray(coo.col.astype(np.int32)),
        jnp.asarray(coo.val.astype(np.float64)),
    )

    def matvec(x, dev=dev):
        return coo_spmv_xla(dev.row, dev.col, dev.val, x, nrows=nrows)

    def matmat(x, dev=dev):
        return coo_spmm_xla(dev.row, dev.col, dev.val, x, nrows=nrows)

    info("tune: fp64 on TPU -> XLA COO path, nnz=%d", coo.nnz)
    return TunedMatrix(
        fmt, nrows, csr.ncols, coo.nnz, csr.symmetric, dev,
        matvec, matmat, 0.0, 1.0,
    )
