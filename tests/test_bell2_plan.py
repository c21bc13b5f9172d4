"""BELL2/SBELL plan builder tests: plans must be lossless, total (no
spill), and respect the chunk/block geometry invariants. This statically
validates the layout's conflict-freedom claim, the analog of validating
the reference's coloring (``csr_matrix.tpp:1361-1501``)."""

import numpy as np
import pytest

from cfs_spmv_tpu.formats.bell2 import (
    LANES,
    SUBLANES,
    build_bell2_plan,
)
from cfs_spmv_tpu.formats.coo import COO
from cfs_spmv_tpu.formats.csr import CSR
from cfs_spmv_tpu.formats.sbell import build_sbell_plan


def decode_bell2(plan):
    """Invert the BELL2 encoding back to (row, col, val) triples.

    Understands the relaxed layouts too: 5-bit r2 against the contiguous
    window base for deep-window plans, rotated row lanes (rc in packed
    bits 12-13) for lane-rotation plans, and degree-grouped row tiling
    (slots inverted through ``row_perm``)."""
    K = plan.chunks_per_step
    depth = plan.window_depth
    rot = plan.lane_rot
    stride = LANES // rot
    r2_mask = 0x1F if depth > SUBLANES else 0x7
    inv = None
    if plan.row_perm is not None:
        inv = np.full(plan.num_row_tiles * LANES, -1, np.int64)
        live = plan.row_perm < plan.num_row_tiles * LANES
        inv[plan.row_perm[live]] = np.nonzero(live)[0]
    rows, cols, vals = [], [], []
    for c in range(plan.num_chunks):
        block = plan.step_block[c // K]
        tile = block * plan.tiles_per_block + plan.meta[c, 0]
        for i in range(SUBLANES):
            for j in range(LANES):
                v = plan.vals[c * SUBLANES + i, j]
                if v == 0:
                    continue
                pk = plan.packed[c * SUBLANES + i, j]
                q = pk & 0x7F
                r2 = (plan.packed[c * SUBLANES + i, q] >> 7) & r2_mask
                if plan.windows_contig:
                    win = plan.meta[c, 2] + r2
                else:
                    win = plan.meta[c, 2 + r2]
                lane_r = (j - stride * ((pk >> 12) & 0x3)) % LANES
                slot = tile * LANES + lane_r
                rows.append(slot if inv is None else inv[slot])
                cols.append(win * LANES + q)
                vals.append(v)
    return np.array(rows), np.array(cols), np.array(vals)


def decode_sbell_pairs(plan):
    """Decode the paired stream, checking row/transpose metadata agree."""
    K = plan.chunks_per_step
    out = []
    for c in range(plan.num_chunks):
        block = plan.step_block[c // K]
        tile = block * plan.tiles_per_block + plan.meta[c, 0]
        for i in range(SUBLANES):
            for j in range(LANES):
                v = plan.vals[c * SUBLANES + i, j]
                if v == 0:
                    continue
                pk_rowside = plan.packed[c * SUBLANES + i, j]
                q = pk_rowside & 0x7F  # == lane_c
                pk_t = plan.packed[c * SUBLANES + i, q]
                r2 = (pk_t >> 7) & 0x7
                perm = (pk_t >> 10) & 0x7F
                assert r2 != 7, "transpose slot holds the empty sentinel"
                assert perm == j, "perm must point back at lane_r"
                win = plan.meta[c, 2 + r2]
                r = tile * LANES + j
                col = win * LANES + q
                out.append((r, col, v))
    return out


@pytest.mark.parametrize("bandwidth,seed", [(30, 0), (500, 1), (None, 2)])
def test_bell2_lossless(bandwidth, seed):
    coo = COO.random(700, 650, 7.0, bandwidth=bandwidth, seed=seed,
                     dtype=np.float64)
    coo.val[coo.val == 0] = 0.5
    plan = build_bell2_plan(CSR.from_coo(coo), dtype=np.float64,
                            chunks_per_step=16, tiles_per_block=8)
    r, c, v = decode_bell2(plan)
    assert plan.spill_fraction == 0.0
    got = sorted(zip(r.tolist(), c.tolist(), v.tolist()))
    want = sorted(zip(coo.row.tolist(), coo.col.tolist(), coo.val.tolist()))
    assert got == want


def test_bell2_dense_band_high_fill():
    """Contiguous band (FEM-like): diagonal units give near-ideal fill."""
    n = 1024
    half_bw = 16
    rows = np.repeat(np.arange(n, dtype=np.int64), half_bw)
    offs = np.tile(np.arange(1, half_bw + 1, dtype=np.int64), n)
    cols = rows - offs
    keep = cols >= 0
    coo = COO(n, n, rows[keep].astype(np.int32), cols[keep].astype(np.int32),
              np.random.default_rng(0).uniform(0.5, 1, keep.sum()))
    plan = build_bell2_plan(CSR.from_coo(coo), dtype=np.float64)
    # every diagonal is dense -> fill ~ 100% up to tile-edge effects
    assert plan.padding_ratio < 1.5
    r, c, v = decode_bell2(plan)
    assert len(r) == coo.nnz


def test_bell2_geometry():
    coo = COO.random(900, 900, 5.0, bandwidth=100, seed=3)
    plan = build_bell2_plan(CSR.from_coo(coo), chunks_per_step=16,
                            tiles_per_block=8)
    assert plan.num_chunks % plan.chunks_per_step == 0
    K = plan.chunks_per_step
    subs = plan.meta[:, 0]
    assert (subs < plan.tiles_per_block).all()
    assert (np.diff(plan.step_block) >= 0).all()


def test_bell2_multicluster_rows():
    """3-cluster rows (stencil-like): total placement, no overflow."""
    row = np.repeat(np.arange(128, dtype=np.int32), 3)
    col = np.concatenate([
        np.stack([r, r + 1600, r + 3200]) for r in range(128)
    ]).astype(np.int32).reshape(-1)
    val = np.arange(1.0, 385.0)
    plan = build_bell2_plan(
        CSR.from_coo(COO(128, 3400, row, col, val)), dtype=np.float64,
        chunks_per_step=16, tiles_per_block=8,
    )
    r, c, v = decode_bell2(plan)
    assert len(r) == 384
    assert sorted(zip(r.tolist(), c.tolist())) == sorted(
        zip(row.tolist(), col.tolist())
    )


def test_bell2_empty():
    csr = CSR.from_coo(COO(256, 256, np.array([], np.int32),
                           np.array([], np.int32), np.array([])))
    plan = build_bell2_plan(csr, chunks_per_step=16, tiles_per_block=8)
    assert plan.nnz == 0
    assert plan.num_chunks % plan.chunks_per_step == 0


def test_sbell_pairs_consistent():
    coo = COO.random(600, 600, 6.0, symmetric=True, bandwidth=200,
                     seed=4, dtype=np.float64)
    coo.val[coo.val == 0] = 0.25
    csr = CSR.from_coo(coo)
    plan = build_sbell_plan(csr, dtype=np.float64, chunks_per_step=16,
                            tiles_per_block=8, pair_threshold=1)
    pairs = decode_sbell_pairs(plan)
    lower, diag, _ = csr.split_triangle()
    lo = lower.to_coo()
    want = sorted(zip(lo.row.tolist(), lo.col.tolist(), lo.val.tolist()))
    got = sorted(pairs)
    if plan.far is not None:
        fr, fc, fv = decode_bell2(plan.far)
        lower_mask = fr > fc
        got = sorted(
            got
            + list(zip(fr[lower_mask].tolist(), fc[lower_mask].tolist(),
                       fv[lower_mask].tolist()))
        )
        upper = sorted(
            zip(fc[~lower_mask].tolist(), fr[~lower_mask].tolist(),
                fv[~lower_mask].tolist())
        )
        assert upper == sorted(
            zip(fr[lower_mask].tolist(), fc[lower_mask].tolist(),
                fv[lower_mask].tolist())
        )
    assert got == want
    assert np.allclose(plan.diag, diag)


def test_sbell_band_fully_paired():
    """Dense band: everything pairs, padding near 1, no far stream."""
    n = 2048
    half_bw = 8
    rows = np.repeat(np.arange(n, dtype=np.int64), half_bw)
    offs = np.tile(np.arange(1, half_bw + 1, dtype=np.int64), n)
    cols = rows - offs
    keep = cols >= 0
    r = np.concatenate([rows[keep], np.arange(n)])
    c = np.concatenate([cols[keep], np.arange(n)])
    v = np.concatenate(
        [np.random.default_rng(0).uniform(0.5, 1, keep.sum()),
         np.ones(n) * 2.0]
    )
    coo = COO(n, n, r.astype(np.int32), c.astype(np.int32), v,
              symmetric=True)
    plan = build_sbell_plan(CSR.from_coo(coo), dtype=np.float64)
    assert plan.far is None or plan.far.nnz == 0
    assert plan.far_fraction < 0.01
    assert plan.padding_ratio < 1.6


def test_sbell_sparse_diagonals_go_far():
    """Scattered symmetric matrix: pairing rejected, all nnz in far."""
    coo = COO.random(800, 800, 4.0, symmetric=True, seed=5,
                     dtype=np.float64)
    plan = build_sbell_plan(CSR.from_coo(coo), dtype=np.float64,
                            pair_threshold=48)
    # random structure -> no diagonal reaches the threshold
    assert plan.nnz_paired == 0
    assert plan.far is not None and plan.far.nnz > 0
