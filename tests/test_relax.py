"""Relaxed one-sided packing (deep windows, lane rotation).

Scattered structures sit at the lane-conflict floor of the strict
slot packing (CLAUDE.md round-2 ablations): dense rows force chunks the
other 127 lanes cannot fill, and an 8-segment contiguous window range
forces chunk splits when a subrow's columns span more segments. The
relaxations trade per-chunk compute for fewer chunks:

- ``window_depth`` 16/32: r2 grows to 5 bits, the kernel gathers from
  depth/8 stacked slabs and selects;
- ``lane_rot`` 2/4 (lane rotation) was PRUNED in round 4: measured on
  v5e under the lazy-store kernel the rot=2 datapath ran 33.3 ns/chunk
  vs 9.2 at rot=1, so rotation (at best a 2x chunk saving) can never
  win; the planner must now never pick it.

Reference analog: the HYB/conflict-coloring kernels that these layouts
replace (``csr_matrix.tpp:3030-3162``).
"""

import numpy as np
import pytest

from cfs_spmv_tpu.formats.bell2 import build_bell2_plan
from cfs_spmv_tpu.formats.coo import COO
from cfs_spmv_tpu.formats.csr import CSR
from cfs_spmv_tpu.ops import spmv as ops
from cfs_spmv_tpu.utils.platform import allclose_spmv


def _dense_row_coo(n=1024, dense_rows=(3, 200), per_dense=700, seed=0):
    """A few dense rows on sparse background: lane-conflict bound."""
    rng = np.random.default_rng(seed)
    rows, cols = [], []
    for r in dense_rows:
        c = rng.choice(n, per_dense, replace=False)
        rows.append(np.full(per_dense, r))
        cols.append(c)
    bg_r = np.repeat(np.arange(n), 2)
    bg_c = rng.integers(0, n, 2 * n)
    rows.append(bg_r)
    cols.append(bg_c)
    row = np.concatenate(rows).astype(np.int64)
    col = np.concatenate(cols).astype(np.int64)
    val = rng.uniform(0.5, 1.5, len(row)).astype(np.float32)
    return COO(n, n, row, col, val).canonicalize()


def _scattered_coo(n=4096, per_row=12, seed=1):
    """Uniformly scattered columns: window-range bound (each subrow's
    columns span far more than 8 segments)."""
    rng = np.random.default_rng(seed)
    row = np.repeat(np.arange(n, dtype=np.int64), per_row)
    col = rng.integers(0, n, n * per_row).astype(np.int64)
    val = rng.uniform(0.5, 1.5, len(row)).astype(np.float32)
    return COO(n, n, row, col, val).canonicalize()


def _check_plan(csr, plan, seed=0):
    dev = ops.to_device(plan)
    x = np.random.default_rng(seed).uniform(1, 2, csr.ncols)
    x = x.astype(np.float32)
    y = np.asarray(ops.bell2_apply(dev, x))
    xd = x.astype(np.float64)
    assert allclose_spmv(
        y, csr.spmv_host(xd), np.float32,
        nnz_per_row=csr.nnz / csr.nrows,
        scale=csr.spmv_host(xd, absolute=True),
    )
    return plan


def test_lane_rot_never_picked():
    """Rotation is pruned (round 4): even the shape it was built for —
    dense rows on sparse background — must pack at rot=1 and stay
    correct (degree grouping absorbs the imbalance instead)."""
    csr = CSR.from_coo(_dense_row_coo())
    plan = build_bell2_plan(csr, dtype=np.float32)
    assert plan.lane_rot == 1
    _check_plan(csr, plan)


def test_deep_window_plan_correct():
    csr = CSR.from_coo(_scattered_coo())
    plan = build_bell2_plan(csr, dtype=np.float32)
    assert plan.window_depth > 8, (
        f"scattered matrix should pick deep windows "
        f"(depth={plan.window_depth}, rot={plan.lane_rot})"
    )
    _check_plan(csr, plan)


def test_relax_disabled_still_correct():
    csr = CSR.from_coo(_scattered_coo(n=2048, per_row=10, seed=3))
    plan = build_bell2_plan(csr, dtype=np.float32, allow_relax=False)
    assert plan.window_depth == 8 and plan.lane_rot == 1
    _check_plan(csr, plan)


def test_relaxed_spmm_correct():
    csr = CSR.from_coo(_scattered_coo(n=2048, per_row=14, seed=4))
    plan = build_bell2_plan(csr, dtype=np.float32)
    dev = ops.to_device(plan)
    B = 3
    X = np.random.default_rng(7).uniform(1, 2, (csr.ncols, B))
    X = X.astype(np.float32)
    Y = np.asarray(ops.bell2_apply_mm(dev, X))
    Xd = X.astype(np.float64)
    ref = np.stack(
        [csr.spmv_host(Xd[:, b]) for b in range(B)], axis=1
    )
    scale = np.stack(
        [csr.spmv_host(Xd[:, b], absolute=True) for b in range(B)], axis=1
    )
    assert allclose_spmv(
        Y, ref, np.float32,
        nnz_per_row=csr.nnz / csr.nrows, scale=scale,
    )


def test_relaxed_plan_reduces_chunks():
    """The relaxation must actually buy chunks, not just trigger."""
    csr = CSR.from_coo(_scattered_coo())
    strict = build_bell2_plan(csr, dtype=np.float32, allow_relax=False)
    relaxed = build_bell2_plan(csr, dtype=np.float32)
    assert relaxed.num_chunks < strict.num_chunks


def test_relaxed_plan_roundtrips_cache(tmp_path):
    from cfs_spmv_tpu.io.plancache import load_plan, save_plan

    csr = CSR.from_coo(_scattered_coo(n=1024, per_row=10, seed=9))
    plan = build_bell2_plan(csr, dtype=np.float32)
    p = tmp_path / "plan.npz"
    save_plan(str(p), plan)
    plan2 = load_plan(str(p))
    assert plan2.window_depth == plan.window_depth
    assert plan2.lane_rot == plan.lane_rot
    np.testing.assert_array_equal(plan2.packed, plan.packed)
    _check_plan(csr, plan2)


@pytest.mark.parametrize("sym_seed", [11, 12])
def test_symmetric_far_stream_relaxed(sym_seed):
    """Scattered symmetric matrix: the far stream may relax; the full
    tuned pipeline must stay correct."""
    from cfs_spmv_tpu import Format, SpDMV, SparseMatrix

    coo = COO.random(
        2048, 2048, 8.0, symmetric=True, seed=sym_seed, dtype=np.float64
    )
    A = SparseMatrix.create(coo, Format.SSS)
    x = np.random.default_rng(sym_seed).uniform(1, 2, A.ncols)
    spdmv = SpDMV(A, dtype=np.float32)
    y = np.asarray(spdmv(x.astype(np.float32)))
    y_ref = A.csr.spmv_host(x)
    assert allclose_spmv(
        y, y_ref, np.float32,
        nnz_per_row=A.nnz_full / max(A.nrows, 1),
        scale=A.csr.spmv_host(x, absolute=True),
    )
