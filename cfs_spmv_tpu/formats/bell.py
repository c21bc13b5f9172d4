"""BELL — banded sliced-ELL, the TPU-native tuned sparse layout.

This is the core re-design of the reference's tuned CSR machinery. The
reference resolves concurrent scatter (`y[col] += ...`) with a conflict
graph + greedy coloring + color-phased execution
(``csr_matrix.tpp:1204-1639, 2009-2363, 2905-3028``). A TPU has no shared-
memory scatter at all, so the problem is inverted: the *gather* of x by
column index is the hard part, and the scatter disappears by layout.

Layout ("BELL"):

- Rows are grouped into 128-row tiles (lane j of a tile = row ``128*t+j``),
  the TPU-lane analog of the reference's BlkFactor=16 row blocks
  (``csr_matrix.hpp:90``).
- Each tile stores its nonzeros as chunks of shape (8, 128): chunk ``s``
  holds nnz positions ``8s..8s+8`` of every row in the tile (col-sorted
  within each row), padded with explicit zeros to the tile's max row
  length — a sliced-ELL transpose.
- Row sums are then a pure sublane reduction: no scatter, no coloring, no
  atomics. This single design decision replaces reference components
  C11-C13 (symmetry strategies, conflict graph, coloring, balancing).

The gather of ``x[col]`` is solved with a per-chunk *window*: each chunk
declares a 1024-element, 128-aligned window of x; an entry at column c is
addressed inside the window by ``(r, q) = divmod(c - 128*base, 128)`` and
fetched with two hardware gathers (sublane-dim then lane-dim
``take_along_axis``, both natively supported by Mosaic). The sublane step
uses a per-(tile-row, window-lane) table ``r2``, which requires that two
entries in the same chunk tile-row may not use the same window lane ``q``
with different ``r`` — the TPU analog of the reference's conflict-freedom,
enforced statically at preprocessing time instead of by runtime phases.

Entries that overflow the window or lose a conflict are *spilled* to a
scattered-stream COO — the direct analog of the reference's high-bandwidth
HYB split (``split_by_bandwidth``, ``csr_matrix.tpp:313-401``).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..utils.config import config
from ..utils.logging import info
from .coo import COO
from .csr import CSR

__all__ = ["BellPlan", "build_bell_plan"]

LANES = 128
SUBLANES = 8
WINDOW = LANES * SUBLANES  # 1024


@dataclasses.dataclass
class BellPlan:
    """Static device layout for one BELL stream.

    Array shapes use C = total chunk count, T = row-tile count.
    ``packed[c, i, j] = q | (r2 << 16)`` stores the lane-gather index of
    slot (i, j) in the low half and the sublane table entry for window
    lane j in the high half (both tables share the (8, 128) shape, so one
    int32 stream carries 4 bytes/nnz of metadata — same as CSR's colind).

    The chunk stream is padded so that each group of ``chunks_per_step``
    consecutive chunks stays within one ``tiles_per_block``-tile output
    block; the kernel then processes a whole group per grid step,
    amortizing Pallas grid/DMA overhead (the TPU analog of the
    reference's cache-blocking constants, ``csr_matrix.hpp:89-94``).
    """

    nrows: int
    ncols: int
    nnz: int  # nonzeros carried by the BELL stream (excl. spill)
    vals: np.ndarray  # (C, 8, 128) value dtype
    packed: np.ndarray  # (C, 8, 128) int32
    base: np.ndarray  # (C,) int32 window base, units of 128 elements
    chunk_tile: np.ndarray  # (C,) int32 owning row tile
    num_row_tiles: int  # T
    x_pad_rows: int  # rows of the (x_pad_rows, 128) x operand
    spill: COO | None  # scattered stream (HYB analog); None if empty
    chunks_per_step: int = 1  # K: chunks processed per grid step
    tiles_per_block: int = 8  # BT: row tiles per output block

    @property
    def num_chunks(self) -> int:
        return int(self.vals.shape[0])

    @property
    def padding_ratio(self) -> float:
        """Stored slots / real nnz (1.0 = no padding waste)."""
        slots = self.vals.size
        return slots / max(self.nnz, 1)

    @property
    def spill_fraction(self) -> float:
        s = 0 if self.spill is None else self.spill.nnz
        return s / max(self.nnz + s, 1)

    def stream_bytes(self) -> int:
        """HBM bytes of the nnz stream (roofline input)."""
        return self.vals.nbytes + self.packed.nbytes + self.base.nbytes


def _pad_chunk_groups(vals, packed, base, chunk_tile, K, BT):
    """Pad the chunk stream so each K-chunk grid step stays inside one
    BT-tile output block (required by the multi-chunk kernel)."""
    C = len(chunk_tile)
    blocks = chunk_tile.astype(np.int64) // BT  # non-decreasing
    nb = int(blocks[-1]) + 1 if C else 1
    cnt = np.bincount(blocks, minlength=nb)
    padded = -(-cnt // K) * K
    old_start = np.concatenate([[0], np.cumsum(cnt)])
    new_start = np.concatenate([[0], np.cumsum(padded)])
    new_id = new_start[blocks] + (np.arange(C) - old_start[blocks])
    Cn = int(new_start[-1])
    if Cn == C:
        return vals, packed, base, chunk_tile
    vals_n = np.zeros((Cn,) + vals.shape[1:], vals.dtype)
    packed_n = np.zeros((Cn,) + packed.shape[1:], packed.dtype)
    base_n = np.zeros(Cn, base.dtype)
    # padding chunks adopt the block's last real tile (adds zero, never
    # triggers a new-block reset)
    last_tile = chunk_tile[old_start[1:] - 1]
    ct_n = np.repeat(last_tile, padded).astype(chunk_tile.dtype)
    vals_n[new_id] = vals
    packed_n[new_id] = packed
    base_n[new_id] = base
    ct_n[new_id] = chunk_tile
    return vals_n, packed_n, base_n, ct_n


#: strip width for cluster-aware chunking: one 128-aligned-down window of
#: WINDOW elements always covers a strip (127 alignment slack reserved)
STRIP = WINDOW - LANES  # 896


def _assign_round(row, col, val, n):
    """One assignment round over (row, col)-sorted COO arrays.

    Entries are grouped into chunks by (row tile, column strip, position):
    the strip — an 896-wide column band relative to the tile's minimum
    column — guarantees every chunk fits a single 1024-element window, so
    rows whose nonzeros form several distant clusters (e.g. 3D stencils)
    never overflow. This is the TPU-native analog of the reference's
    bandwidth-based HYB split (``csr_matrix.tpp:313-401``), generalized to
    per-tile multi-band.

    Returns per-entry slot coordinates ``(tile, chunk_local, sub, lane,
    q, r, base)`` plus a ``keep`` mask; entries that lose the conflict-free
    table rule get ``keep=False``. ``chunk_local`` is a round-dense chunk
    id ordered by (tile, strip, position-block).
    """
    nnz = len(row)
    tile = row >> 7
    lane = row & 127

    # per-tile minimum column anchors the strip grid
    ntiles = int(tile.max()) + 1
    tile_min = np.full(ntiles, np.iinfo(np.int64).max, np.int64)
    np.minimum.at(tile_min, tile, col)
    strip = (col - tile_min[tile]) // STRIP

    # position of each entry within its (row, strip) group; entries are
    # (row, col)-sorted so groups are contiguous runs
    grp_change = np.ones(nnz, bool)
    grp_change[1:] = (row[1:] != row[:-1]) | (strip[1:] != strip[:-1])
    grp_id = np.cumsum(grp_change) - 1
    starts = np.flatnonzero(grp_change)
    pos = np.arange(nnz, dtype=np.int64) - starts[grp_id]
    s_blk = pos >> 3
    sub = pos & 7

    # dense chunk ids ordered by (tile, strip, s_blk)
    tsb = (tile * (int(strip.max()) + 1 if nnz else 1) + strip) * (
        int(s_blk.max()) + 1 if nnz else 1
    ) + s_blk
    _, chunk_local = np.unique(tsb, return_inverse=True)

    # window base per chunk = floor(min col in chunk / 128); the strip
    # bound guarantees col - 128*base < 1024 for every chunk member
    nchunks = int(chunk_local.max()) + 1
    base_map = np.full(nchunks, np.iinfo(np.int64).max, np.int64)
    np.minimum.at(base_map, chunk_local, col)
    base = base_map[chunk_local] >> 7

    off = col - (base << 7)
    q = off & 127
    r = off >> 7

    # conflict-free sublane-table rule: key (chunk, sub, q) -> single r.
    # First entry (CSR order) wins; later entries with different r lose.
    # Static replacement for the reference's conflict graph + coloring
    # (csr_matrix.tpp:1361-1501).
    key = (chunk_local * SUBLANES + sub) * LANES + q
    order = np.argsort(key, kind="stable")
    k_sorted = key[order]
    r_sorted = r[order]
    first = np.ones(nnz, bool)
    first[1:] = k_sorted[1:] != k_sorted[:-1]
    group = np.cumsum(first) - 1
    r_owner = r_sorted[np.flatnonzero(first)][group]
    keep = np.empty(nnz, bool)
    keep[order] = r_sorted == r_owner

    return tile, chunk_local, sub, lane, q, r, base, keep


def build_bell_plan(
    csr: CSR,
    *,
    dtype=np.float32,
    rounds: int = 3,
    chunks_per_step: int = 64,
    tiles_per_block: int = 128,
) -> BellPlan:
    """Build a BELL plan from a (general, non-symmetric-storage) CSR.

    Fully vectorized NumPy preprocessing — the analog of the reference's
    ``tune()`` pipeline (``csr_matrix.tpp:230-310``) with conflict-free
    slot assignment replacing graph coloring. Entries that overflow a
    chunk's window or lose a table conflict are retried in up to
    ``rounds-1`` overflow rounds over progressively sparser residuals (the
    HYB low/high-bandwidth split analog, ``csr_matrix.tpp:313-401``);
    final losers go to the scattered spill stream. O(nnz log nnz).
    """
    n, m, nnz = csr.nrows, csr.ncols, csr.nnz
    T = max(1, -(-n // LANES))
    x_pad_rows = -(-m // LANES) + SUBLANES - 1  # window overrun headroom

    rowlen = np.diff(csr.indptr)
    row = np.repeat(np.arange(n, dtype=np.int64), rowlen)
    col = csr.indices.astype(np.int64)
    val = np.asarray(csr.data)

    # accumulated kept entries with (tile, round, chunk, sub, lane, q, r)
    parts = []
    for rnd in range(max(1, rounds)):
        if len(row) == 0:
            break
        tile, ck, sub, lane, q, r, base, keep = _assign_round(row, col, val, n)
        if keep.any():
            parts.append(dict(
                tile=tile[keep], rnd=np.full(keep.sum(), rnd, np.int64),
                ck=ck[keep], sub=sub[keep], lane=lane[keep],
                q=q[keep], r=r[keep], base=base[keep], val=val[keep],
            ))
        row, col, val = row[~keep], col[~keep], val[~keep]

    spill = None
    if len(row):
        spill = COO(n, m, row.astype(np.int32), col.astype(np.int32),
                    val.astype(dtype))
    n_spill = len(row)

    if not parts:
        va, pk, ba, ct = _pad_chunk_groups(
            np.zeros((T, SUBLANES, LANES), dtype),
            np.zeros((T, SUBLANES, LANES), np.int32),
            np.zeros(T, np.int32),
            np.arange(T, dtype=np.int32),
            chunks_per_step, tiles_per_block,
        )
        return BellPlan(
            n, m, 0, va, pk, ba, ct, T, x_pad_rows, spill,
            chunks_per_step, tiles_per_block,
        )

    tile = np.concatenate([p["tile"] for p in parts])
    rnd = np.concatenate([p["rnd"] for p in parts])
    ck = np.concatenate([p["ck"] for p in parts])
    sub = np.concatenate([p["sub"] for p in parts])
    lane = np.concatenate([p["lane"] for p in parts])
    q = np.concatenate([p["q"] for p in parts])
    r = np.concatenate([p["r"] for p in parts])
    base = np.concatenate([p["base"] for p in parts])
    vkeep = np.concatenate([p["val"] for p in parts])

    # assign dense global chunk ids, ordered by (tile, round, local chunk)
    # so chunks of one output tile are consecutive in the grid (Pallas
    # revisiting)
    max_ck = int(ck.max()) + 1
    nrounds = int(rnd.max()) + 1
    ckey = (tile * nrounds + rnd) * max_ck + ck
    uniq, chunk_of_entry = np.unique(ckey, return_inverse=True)
    chunk_tile_real = (uniq // max_ck) // nrounds
    # ensure empty tiles still get one (zero) chunk so y is initialized
    missing = np.setdiff1d(np.arange(T, dtype=np.int64), chunk_tile_real)
    all_tiles = np.concatenate([chunk_tile_real, missing])
    order = np.argsort(all_tiles, kind="stable")
    # remap: position of each original unique chunk after tile-sort
    remap = np.empty(len(all_tiles), np.int64)
    remap[order] = np.arange(len(all_tiles))
    chunk = remap[chunk_of_entry]
    C = len(all_tiles)
    chunk_tile = all_tiles[order].astype(np.int32)

    base_arr = np.zeros(C, np.int64)
    base_arr[chunk] = base

    vals_arr = np.zeros((C, SUBLANES, LANES), dtype)
    q_arr = np.zeros((C, SUBLANES, LANES), np.int32)
    r2_tbl = np.zeros((C, SUBLANES, LANES), np.int32)
    vals_arr[chunk, sub, lane] = vkeep.astype(dtype)
    q_arr[chunk, sub, lane] = q
    r2_tbl[chunk, sub, q] = r
    packed = q_arr | (r2_tbl << 16)

    vals_arr, packed, base_arr, chunk_tile = _pad_chunk_groups(
        vals_arr, packed, base_arr.astype(np.int32), chunk_tile,
        chunks_per_step, tiles_per_block,
    )

    plan = BellPlan(
        n, m, nnz - n_spill,
        vals_arr, packed,
        base_arr.astype(np.int32), chunk_tile,
        T, x_pad_rows, spill,
        chunks_per_step, tiles_per_block,
    )
    info(
        "bell: %dx%d nnz=%d chunks=%d pad=%.2fx spill=%.4f",
        n, m, nnz, C, plan.padding_ratio, plan.spill_fraction,
    )
    return plan
