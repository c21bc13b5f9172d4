"""Per-chip roofline model and speed-of-light estimators.

The reference reports GFLOP/s = 2*nnz*iters/t (``bench_spmv_mmf.cpp:168``)
with no roofline context. BASELINE.json asks every kernel to be profiled
against a memory-bandwidth speed-of-light roofline per chip, so this module
derives the nnz/s ceiling from the chip's HBM bandwidth and the bytes each
kernel actually moves per nonzero.
"""

from __future__ import annotations

import dataclasses

__all__ = ["ChipSpec", "detect_chip", "spmv_bytes_per_nnz", "speed_of_light_nnz_s"]


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    name: str
    hbm_bw_bytes_s: float  # peak HBM bandwidth
    vmem_bytes: int
    bf16_flops: float
    f32_flops: float  # effective fp32-accurate matmul throughput


_KNOWN = {
    "v5e": ChipSpec("v5e", 820e9, 128 * 2**20, 197e12, 49e12),
    "v5p": ChipSpec("v5p", 2765e9, 128 * 2**20, 459e12, 115e12),
    "v4": ChipSpec("v4", 1228e9, 128 * 2**20, 275e12, 69e12),
    "v6e": ChipSpec("v6e", 1640e9, 128 * 2**20, 918e12, 230e12),
    "cpu": ChipSpec("cpu", 50e9, 1 << 30, 1e12, 5e11),
}


def detect_chip() -> ChipSpec:
    """Detect the local chip via Pallas TpuInfo, falling back to v5e."""
    try:
        import jax

        if jax.default_backend() == "cpu":
            return _KNOWN["cpu"]
        from jax.experimental.pallas import tpu as pltpu

        info = pltpu.get_tpu_info()
        spec = _KNOWN.get(str(getattr(info, "chip_version", "")).split(".")[-1].strip("'\""))
        bw = float(getattr(info, "mem_bw_bytes_per_second", 0) or 0)
        vmem = int(getattr(info, "vmem_capacity_bytes", 0) or 0)
        bf16 = float(getattr(info, "bf16_ops_per_second", 0) or 0)
        if bw > 0:
            return ChipSpec(
                name=str(getattr(info, "chip_version", "tpu")),
                hbm_bw_bytes_s=bw,
                vmem_bytes=vmem or 128 * 2**20,
                bf16_flops=bf16 or 197e12,
                f32_flops=(bf16 or 197e12) / 4.0,
            )
        if spec:
            return spec
    except Exception:
        pass
    from .logging import warn

    warn(
        "roofline: could not identify the TPU chip; assuming v5e specs "
        "(roofline percentages may be wrong on other chips)"
    )
    return _KNOWN["v5e"]


def spmv_bytes_per_nnz(
    *,
    value_bytes: int = 4,
    index_bytes: int = 4,
    nnz: int,
    nrows: int,
    ncols: int,
    vector_bytes: int = 4,
    passes: int = 1,
) -> float:
    """Average HBM bytes moved per nonzero for a streaming SpMV kernel.

    Per nnz: value + packed index; per matrix pass: read x (resident in
    VMEM, one HBM read), write y. ``passes`` counts how many times the nnz
    stream is traversed (SSS = 2 streams each traversed once == 1 pass over
    2*nnz values).
    """
    stream = (value_bytes + index_bytes) * nnz * passes
    vecs = vector_bytes * (ncols + nrows)
    return (stream + vecs) / max(nnz, 1)


def speed_of_light_nnz_s(chip: ChipSpec, bytes_per_nnz: float) -> float:
    """HBM-roofline nonzeros/second ceiling."""
    return chip.hbm_bw_bytes_s / max(bytes_per_nnz, 1e-12)
