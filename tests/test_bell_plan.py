"""BELL plan builder tests: the plan must be a lossless re-encoding of the
matrix (kept + spill == all nonzeros) and every kept slot must decode to
the right (row, col, val) through the window/gather metadata — this checks
the conflict-free assignment invariant *statically*, without running the
kernel (the TPU analog of validating the reference's coloring: no two
same-phase writers, ``csr_matrix.tpp:1361-1501``)."""

import numpy as np
import pytest

from cfs_spmv_tpu.formats.bell import LANES, SUBLANES, WINDOW, build_bell_plan
from cfs_spmv_tpu.formats.coo import COO
from cfs_spmv_tpu.formats.csr import CSR


def decode_plan_to_coo(plan):
    """Invert the BELL encoding back to (row, col, val) triples."""
    C = plan.num_chunks
    q = plan.packed & 0xFFFF
    r2 = plan.packed >> 16
    rows, cols, vals = [], [], []
    for c in range(C):
        t = plan.chunk_tile[c]
        for i in range(SUBLANES):
            for j in range(LANES):
                v = plan.vals[c, i, j]
                if v == 0:
                    continue
                qq = q[c, i, j]
                rr = r2[c, i, qq]
                col = plan.base[c] * LANES + rr * LANES + qq
                rows.append(t * LANES + j)
                cols.append(col)
                vals.append(v)
    return np.array(rows), np.array(cols), np.array(vals)


@pytest.mark.parametrize("bandwidth,seed", [(30, 0), (200, 1), (None, 2)])
def test_plan_lossless(bandwidth, seed):
    coo = COO.random(500, 430, 7.0, bandwidth=bandwidth, seed=seed,
                     dtype=np.float64)
    # avoid zero-valued entries (zero == padding sentinel in the decode)
    coo.val[coo.val == 0] = 0.5
    csr = CSR.from_coo(coo)
    plan = build_bell_plan(csr, dtype=np.float64)

    r, c, v = decode_plan_to_coo(plan)
    if plan.spill is not None:
        r = np.concatenate([r, plan.spill.row])
        c = np.concatenate([c, plan.spill.col])
        v = np.concatenate([v, plan.spill.val])
    got = sorted(zip(r.tolist(), c.tolist(), v.tolist()))
    want = sorted(
        zip(coo.row.tolist(), coo.col.tolist(), coo.val.tolist())
    )
    assert got == want


def test_plan_geometry():
    coo = COO.random(300, 300, 5.0, bandwidth=50, seed=3)
    plan = build_bell_plan(CSR.from_coo(coo))
    assert plan.num_row_tiles == -(-300 // LANES)
    assert plan.vals.shape == plan.packed.shape
    assert plan.vals.shape[1:] == (SUBLANES, LANES)
    # every tile visited at least once, chunks grouped per tile
    assert set(plan.chunk_tile.tolist()) == set(range(plan.num_row_tiles))
    assert (np.diff(plan.chunk_tile) >= 0).all()
    # window bases in range for the padded x
    assert (plan.base >= 0).all()
    assert (plan.base + SUBLANES <= plan.x_pad_rows).all()


def test_banded_matrix_has_no_spill():
    # bandwidth 60 << window 1024: everything should fit
    coo = COO.random(1000, 1000, 8.0, bandwidth=60, seed=4)
    plan = build_bell_plan(CSR.from_coo(coo))
    assert plan.spill_fraction < 0.01


def test_empty_matrix():
    csr = CSR.from_coo(COO(256, 256, np.array([], np.int32),
                           np.array([], np.int32), np.array([])))
    plan = build_bell_plan(csr)
    assert plan.num_row_tiles == 2
    # chunk stream padded to a multiple of chunks_per_step per block
    assert plan.num_chunks % plan.chunks_per_step == 0
    assert plan.nnz == 0 and plan.spill is None


def test_empty_rows_and_tiles():
    # matrix with entries only in the last tile; first tiles empty
    row = np.array([400, 401, 450], np.int32)
    col = np.array([3, 100, 449], np.int32)
    val = np.array([1.0, 2.0, 3.0])
    plan = build_bell_plan(CSR.from_coo(COO(451, 451, row, col, val)),
                           dtype=np.float64)
    r, c, v = decode_plan_to_coo(plan)
    assert sorted(zip(r.tolist(), c.tolist())) == [(400, 3), (401, 100), (450, 449)]


def test_window_conflict_resolved_by_overflow_round():
    """Two entries in the same chunk tile-row with same window lane q but
    different sublane r conflict; the loser must be recovered by an
    overflow round (HYB analog), not spilled."""
    # rows 0 and 1 (same tile, same nnz position 0 -> same chunk, sublane 0)
    # cols 0 and 128: base=0, q=0 for both, r=0 vs r=1 -> conflict
    row = np.array([0, 1], np.int32)
    col = np.array([0, 128], np.int32)
    val = np.array([1.0, 2.0])
    plan = build_bell_plan(CSR.from_coo(COO(129, 200, row, col, val)),
                           dtype=np.float64)
    assert plan.spill is None and plan.nnz == 2
    r, c, v = decode_plan_to_coo(plan)
    assert sorted(zip(r.tolist(), c.tolist())) == [(0, 0), (1, 128)]


def test_persistent_conflict_spills_after_rounds():
    """Entries that conflict in every round end up in the spill stream."""
    # 4 rows, each 1 nnz at position 0, cols 0/128/256/384: all share
    # q=0 with distinct r -> one winner per round; with rounds=3 exactly
    # one entry remains and must spill
    row = np.arange(4, dtype=np.int32)
    col = np.array([0, 128, 256, 384], np.int32)
    val = np.array([1.0, 2.0, 3.0, 4.0])
    plan = build_bell_plan(CSR.from_coo(COO(128, 500, row, col, val)),
                           dtype=np.float64, rounds=3)
    assert plan.spill is not None and plan.spill.nnz == 1
    assert plan.nnz == 3


def test_far_cluster_recovered_by_overflow_round():
    row = np.array([0, 0], np.int32)
    col = np.array([0, 5000], np.int32)
    val = np.array([1.0, 2.0])
    # round 1: base=0, col 5000 out of window; round 2 re-bases at 5000
    plan = build_bell_plan(CSR.from_coo(COO(10, 6000, row, col, val)),
                           dtype=np.float64)
    assert plan.spill is None and plan.nnz == 2
    r, c, v = decode_plan_to_coo(plan)
    assert sorted(c.tolist()) == [0, 5000]
