"""SDIA plan — dense-diagonal extraction for symmetric matrices.

Host-side companion of ``ops/sdia_kernel.py``: finds the strict-lower
exact diagonals dense enough to pay for contiguous (index-free) storage
and lays their values out as (R, D, 8, 128) row blocks. The remaining
entries stay on the indexed SBELL/far streams — the same
structure-driven decomposition idea as the reference's bandwidth split
(``csr_matrix.tpp:313-401``), keyed on diagonal fill instead of span.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..utils.logging import info
from .bell2 import LANES, SUBLANES

__all__ = ["SDiaPlan", "extract_sdia", "SDIA_FILL", "SDIA_MIN_COUNT"]

#: minimum fill (entries / diagonal length) for dense storage: measured
#: crossover vs the slot-packed far stream is ~0.15 on v5e (SDIA scales
#: as ~190*fill Gnnz/s, the far path ~29); 0.2 keeps a safety margin
SDIA_FILL = 0.2
#: absolute minimum entries per diagonal (avoids trace bloat on tiny
#: dense-ish diagonals)
SDIA_MIN_COUNT = 256
#: maximum number of stored diagonals (VMEM block + trace size cap)
SDIA_MAX_D = 192

BLOCK_ROWS = SUBLANES * LANES


@dataclasses.dataclass
class SDiaPlan:
    nrows: int
    offsets: tuple[int, ...]  # strictly positive, ascending
    vals: np.ndarray  # (R, D, 8, 128)
    nnz: int  # stored (lower-triangle) entries

    @property
    def num_blocks(self) -> int:
        return int(self.vals.shape[0])

    @property
    def padding_ratio(self) -> float:
        return self.vals.size / max(self.nnz, 1)

    def stream_bytes(self) -> int:
        return self.vals.nbytes


def extract_sdia(
    row: np.ndarray,
    col: np.ndarray,
    val: np.ndarray,
    n: int,
    *,
    dtype=np.float32,
    fill: float = SDIA_FILL,
    min_count: int = SDIA_MIN_COUNT,
    max_d: int = SDIA_MAX_D,
):
    """Split strict-lower COO entries into (SDiaPlan | None, residual mask).

    The mask is True for entries NOT absorbed into the diagonal stream.
    """
    if len(row) == 0:
        return None, np.ones(0, bool)
    off = row - col
    uniq, inv, cnt = np.unique(off, return_inverse=True, return_counts=True)
    length = np.maximum(n - uniq, 1)
    ok = (cnt >= min_count) & (cnt >= fill * length)
    if ok.sum() > max_d:
        # keep the heaviest diagonals
        order = np.argsort(cnt[ok])[::-1][:max_d]
        keep_ids = np.flatnonzero(ok)[order]
        ok = np.zeros_like(ok)
        ok[keep_ids] = True
    if not ok.any():
        return None, np.ones(len(row), bool)

    sel = ok[inv]
    offsets = uniq[ok]
    dmap = np.full(len(uniq), -1, np.int64)
    dmap[ok] = np.arange(int(ok.sum()))

    from ..ops.sdia_kernel import _blocks_per_step

    R = -(-n // BLOCK_ROWS)
    D = len(offsets)
    # pad R so the kernel can process RB blocks per grid step
    RB = _blocks_per_step(R, D)
    R = -(-R // RB) * RB
    vals = np.zeros((R, D, SUBLANES, LANES), dtype)
    g = row[sel]
    j = dmap[inv[sel]]
    vals[g // BLOCK_ROWS, j, (g // LANES) % SUBLANES, g % LANES] = (
        val[sel].astype(dtype)
    )
    plan = SDiaPlan(
        n, tuple(int(d) for d in offsets), vals, int(sel.sum())
    )
    info(
        "sdia: %d diagonals, nnz=%d (%.1f%% of lower), pad=%.2fx",
        D, plan.nnz, 100 * plan.nnz / len(row), plan.padding_ratio,
    )
    return plan, ~sel
