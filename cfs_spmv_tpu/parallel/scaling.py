"""Weak/strong-scaling model for the distributed SpMV (BASELINE config 5).

Only one physical chip is available in this environment, so the N-host
claim is stated as *measured single-chip stream rates* + *modeled
communication*, not asserted. The model is honest about the design's
communication structure (``parallel/dist.py``):

- the paired/SDIA near streams read only the device's own x segment —
  zero interconnect traffic;
- the far stream needs remote x: ``comm="ring"`` rotates the local
  segment ``ndev-1`` times over ICI, each hop overlapped with the far
  sub-stream compute against the segment that just arrived.

Per-device time under overlap is therefore
``max(t_near + t_far, t_ring_comm)`` and weak-scaling efficiency is the
single-device time over that. Halo volume comes from the actual
partition (``far_profile``), not an assumption.

ICI numbers are per-chip aggregates from public TPU specs (the
scaling-book values); override with ``ici_bytes_s`` if yours differ.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..formats.csr import CSR
from ..tuning.partition import partition_tiles_by_nnz, tile_nnz_histogram

__all__ = ["far_profile", "FarProfile", "weak_scaling_model"]

LANES = 128

#: per-chip aggregate one-way ICI bandwidth (bytes/s)
ICI_BW = {
    "v5e": 1.8e11,   # 4 links x ~45 GB/s
    "v5p": 5.4e11,   # 6 links x ~90 GB/s
    "v4": 2.7e11,
    "v6e": 3.6e11,
    "cpu": 5e9,
}


@dataclasses.dataclass
class FarProfile:
    ndev: int
    far_nnz: int            # nonzeros needing a remote x value
    far_fraction: float
    halo_cols_max: int      # max distinct remote columns on any device
    seg_bytes: int          # one ring hop payload (x segment, 4B values)


def far_profile(csr: CSR, ndev: int) -> FarProfile:
    """Halo volume of the equal-nnz contiguous tile partition at
    ``ndev`` devices — the same partitioner DistSpDMV applies, without
    building any device state."""
    T = max(1, -(-csr.nrows // LANES))
    rowlen = np.diff(csr.indptr)
    row = np.repeat(np.arange(csr.nrows, dtype=np.int64), rowlen)
    col = csr.indices.astype(np.int64)
    hist = tile_nnz_histogram(csr.indptr, T)
    if csr.symmetric:
        hist = hist + np.bincount(col >> 7, minlength=T)
    bounds = partition_tiles_by_nnz(hist, ndev)
    ends = np.minimum(bounds[1:] * LANES, csr.nrows)
    ro = np.searchsorted(ends, row, side="right")
    co = np.searchsorted(ends, col, side="right")
    cross = ro != co
    far = int(np.count_nonzero(cross)) * (2 if csr.symmetric else 1)
    nnz_full = (
        2 * csr.nnz if csr.symmetric else csr.nnz
    )  # diagonal miscount is negligible for the model
    halo_max = 0
    if cross.any():
        # distinct (owner device, remote column) pairs per device
        key = ro[cross] * (csr.ncols + 1) + col[cross]
        if csr.symmetric:
            key = np.concatenate(
                [key, co[cross] * (csr.ncols + 1) + row[cross]]
            )
        uniq = np.unique(key)
        cnt = np.bincount(uniq // (csr.ncols + 1), minlength=ndev)
        halo_max = int(cnt.max())
    seg_rows = int(np.max(np.diff(np.concatenate([[0], ends]))))
    return FarProfile(
        ndev, far, far / max(nnz_full, 1), halo_max, 4 * seg_rows
    )


def weak_scaling_model(
    csr: CSR,
    *,
    measured_nnz_s: float,
    ndevs=(2, 4, 8, 16),
    chip: str = "v5e",
    ici_bytes_s: float | None = None,
):
    """Modeled weak-scaling efficiency for replicating THIS matrix's
    per-device workload across ``ndevs`` devices.

    ``measured_nnz_s`` is the single-chip rate on the same matrix (the
    per-device compute under weak scaling, where every device holds a
    shard shaped like this one). Communication = ring rotation of x
    segments, overlapped with far compute; efficiency =
    ``t_compute / max(t_compute, t_comm)``.

    Returns a list of dicts (one per device count).
    """
    bw = ici_bytes_s or ICI_BW.get(chip, ICI_BW["v5e"])
    nnz_full = 2 * csr.nnz if csr.symmetric else csr.nnz
    t_compute = nnz_full / max(measured_nnz_s, 1.0)
    rows = []
    for nd in ndevs:
        prof = far_profile(csr, nd)
        # weak scaling: per-device shard ~ this matrix; each device
        # forwards its x segment nd-1 times around the ring
        seg_bytes = 4 * csr.nrows  # whole local x per hop
        t_comm = (nd - 1) * seg_bytes / bw
        eff = t_compute / max(t_compute, t_comm)
        rows.append(
            dict(
                ndev=nd,
                far_fraction=prof.far_fraction,
                halo_cols_max=prof.halo_cols_max,
                comm_bytes=int((nd - 1) * seg_bytes),
                t_compute_s=t_compute,
                t_comm_s=t_comm,
                efficiency=eff,
            )
        )
    return rows
