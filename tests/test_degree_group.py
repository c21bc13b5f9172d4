"""Degree-grouped row tiling (``Bell2Plan.row_perm``).

Scattered matrices with high row-degree variance sit far above the
capacity floor under the lane-pinned layout: each lane of a 128-row
tile is one row, so one heavy row forces chunks the other 127 lanes
cannot fill. Grouping rows into tiles by descending stream degree
equalizes per-lane multiplicity at zero kernel cost (the kernel is
permutation-blind); apply unpermutes with one O(n) gather against a
zero-extended output. This is the TPU replacement for the reference's
conflict-balancing pass (``csr_matrix.tpp:2009-2363``) in the
dense-row/variance regime.
"""

import numpy as np
import pytest

from cfs_spmv_tpu.formats.bell2 import build_bell2_plan
from cfs_spmv_tpu.formats.coo import COO
from cfs_spmv_tpu.formats.csr import CSR
from cfs_spmv_tpu.ops import spmv as ops
from cfs_spmv_tpu.utils.platform import allclose_spmv


def _powerlaw_csr(n=3000, seed=0, dense_rows=6, dense_deg=400):
    """Scattered matrix with a heavy-degree head: a few dense rows over
    a light random tail — the shape the lane-pinned layout cannot
    absorb (its floor is dominated by the dense rows)."""
    rng = np.random.default_rng(seed)
    deg = rng.integers(2, 8, n)
    deg[rng.choice(n, dense_rows, replace=False)] = dense_deg
    row = np.repeat(np.arange(n, dtype=np.int64), deg)
    col = rng.integers(0, n, len(row)).astype(np.int64)
    val = rng.uniform(-1, 1, len(row))
    return CSR.from_coo(COO(n, n, row, col, val).canonicalize())


def _check(csr, plan, x=None, rhs=0):
    n = csr.ncols
    rng = np.random.default_rng(7)
    x = rng.uniform(1, 2, n).astype(np.float32) if x is None else x
    xd = x.astype(np.float64)
    y_ref = csr.spmv_host(xd)
    scale = csr.spmv_host(xd, absolute=True)
    dev = ops.to_device(plan)
    y = np.asarray(ops.bell2_apply(dev, x))
    assert allclose_spmv(
        y, y_ref, np.float32, nnz_per_row=csr.nnz / csr.nrows,
        scale=scale,
    )
    if rhs:
        X = rng.uniform(1, 2, (n, rhs)).astype(np.float32)
        Y = np.asarray(ops.bell2_apply_mm(dev, X))
        for b in range(rhs):
            xb = X[:, b].astype(np.float64)
            assert allclose_spmv(
                Y[:, b], csr.spmv_host(xb), np.float32,
                nnz_per_row=csr.nnz / csr.nrows,
                scale=csr.spmv_host(xb, absolute=True),
            )


def test_grouping_triggers_and_shrinks_plan():
    csr = _powerlaw_csr()
    strict = build_bell2_plan(csr, dtype=np.float32, allow_relax=False)
    plan = build_bell2_plan(csr, dtype=np.float32)
    assert plan.row_perm is not None, "grouping should trigger here"
    assert not plan.sparse_stream
    # the whole point: far fewer chunks than the lane-pinned layout
    assert plan.num_chunks < 0.5 * strict.num_chunks
    # sentinel contract: absent rows point one past the compact output
    sent = plan.num_row_tiles * 128
    perm = plan.row_perm
    assert perm.shape == (csr.nrows,)
    assert perm.max() <= sent
    used = perm[perm < sent]
    assert len(np.unique(used)) == len(used)  # slots are unique


def test_grouped_spmv_spmm_correct():
    csr = _powerlaw_csr(seed=1)
    plan = build_bell2_plan(csr, dtype=np.float32)
    assert plan.row_perm is not None
    _check(csr, plan, rhs=2)


def test_grouped_with_empty_rows():
    # half the rows have no entries at all: they must read exact zeros
    # through the sentinel
    rng = np.random.default_rng(2)
    n = 2000
    deg = np.zeros(n, np.int64)
    live = rng.choice(n, n // 2, replace=False)
    deg[live] = rng.integers(1, 6, len(live))
    deg[live[:4]] = 300
    row = np.repeat(np.arange(n, dtype=np.int64), deg)
    col = rng.integers(0, n, len(row)).astype(np.int64)
    val = rng.uniform(-1, 1, len(row))
    csr = CSR.from_coo(COO(n, n, row, col, val).canonicalize())
    plan = build_bell2_plan(csr, dtype=np.float32)
    if plan.row_perm is None:
        pytest.skip("grouping did not trigger on this draw")
    dead = np.setdiff1d(np.arange(n), row)
    x = np.random.default_rng(3).uniform(1, 2, n).astype(np.float32)
    y = np.asarray(ops.bell2_apply(ops.to_device(plan), x))
    assert np.all(y[dead] == 0.0)
    _check(csr, plan)


def test_grouped_rectangular():
    # nrows != ncols: the permutation concerns rows only
    rng = np.random.default_rng(4)
    n, m = 1500, 3000
    deg = rng.integers(1, 6, n)
    deg[rng.choice(n, 4, replace=False)] = 350
    row = np.repeat(np.arange(n, dtype=np.int64), deg)
    col = rng.integers(0, m, len(row)).astype(np.int64)
    val = rng.uniform(-1, 1, len(row))
    csr = CSR.from_coo(COO(n, m, row, col, val).canonicalize())
    plan = build_bell2_plan(csr, dtype=np.float32)
    if plan.row_perm is None:
        pytest.skip("grouping did not trigger on this draw")
    _check(csr, plan)


def test_symmetric_far_grouped():
    """SSS path: scattered symmetric matrix with dense rows routes its
    far stream through the grouped layout; composition adds the
    unpermuted far contribution into the paired/diag tiles."""
    from cfs_spmv_tpu.formats.sbell import build_sbell_plan
    from cfs_spmv_tpu.ops.spmv import sbell_apply, sbell_apply_mm, sym_to_device

    rng = np.random.default_rng(5)
    n = 2500
    # lower-triangle scattered entries, a few dense rows
    deg = rng.integers(1, 4, n)
    heavy = rng.choice(np.arange(n // 2, n), 5, replace=False)
    deg[heavy] = 250
    r = np.repeat(np.arange(n, dtype=np.int64), deg)
    c = (rng.random(len(r)) * r).astype(np.int64)  # strictly below row
    keep = c < r
    r, c = r[keep], c[keep]
    v = rng.uniform(-1, 1, len(r))
    d = np.arange(n, dtype=np.int64)
    coo = COO(
        n, n,
        np.concatenate([r, d]), np.concatenate([c, d]),
        np.concatenate([v, rng.uniform(1, 2, n)]),
        symmetric=True,
    ).canonicalize()
    csr = CSR.from_coo(coo)
    plan = build_sbell_plan(csr, dtype=np.float32)
    if plan.far is None or plan.far.row_perm is None:
        pytest.skip("far grouping did not trigger on this draw")
    dev = sym_to_device(plan)
    x = rng.uniform(1, 2, n).astype(np.float32)
    xd = x.astype(np.float64)
    y_ref = csr.spmv_host(xd)
    scale = csr.spmv_host(xd, absolute=True)
    y = np.asarray(sbell_apply(dev, x))
    assert allclose_spmv(
        y, y_ref, np.float32, nnz_per_row=2 * csr.nnz / n, scale=scale,
    )
    X = rng.uniform(1, 2, (n, 2)).astype(np.float32)
    Y = np.asarray(sbell_apply_mm(dev, X))
    for b in range(2):
        xb = X[:, b].astype(np.float64)
        assert allclose_spmv(
            Y[:, b], csr.spmv_host(xb), np.float32,
            nnz_per_row=2 * csr.nnz / n,
            scale=csr.spmv_host(xb, absolute=True),
        )


def test_grouped_plan_cache_roundtrip(tmp_path):
    from cfs_spmv_tpu.io.plancache import load_plan, save_plan

    csr = _powerlaw_csr(seed=6, n=2000)
    plan = build_bell2_plan(csr, dtype=np.float32)
    if plan.row_perm is None:
        pytest.skip("grouping did not trigger on this draw")
    p = tmp_path / "plan.npz"
    save_plan(str(p), plan)
    plan2 = load_plan(str(p))
    assert plan2.row_perm is not None
    np.testing.assert_array_equal(plan.row_perm, plan2.row_perm)
    np.testing.assert_array_equal(plan.vals, plan2.vals)
    assert plan2.num_row_tiles == plan.num_row_tiles
    _check(csr, plan2)


def test_radius_grouping_banded_variance():
    """Banded matrix with strong per-row degree variance: the
    locality-preserving radius sort balances lanes without scattering
    chunk column windows across the matrix."""
    rng = np.random.default_rng(9)
    n = 6000
    deg = rng.integers(2, 8, n)
    deg[rng.choice(n, 40, replace=False)] = rng.integers(60, 120, 40)
    row = np.repeat(np.arange(n, dtype=np.int64), deg)
    col = np.clip(
        row + rng.integers(-500, 501, len(row)), 0, n - 1
    ).astype(np.int64)
    val = rng.uniform(-1, 1, len(row))
    csr = CSR.from_coo(COO(n, n, row, col, val).canonicalize())
    plan = build_bell2_plan(csr, dtype=np.float32)
    if plan.row_perm is None:
        pytest.skip("grouping did not trigger on this draw")
    strict = build_bell2_plan(csr, dtype=np.float32, allow_relax=False)
    assert plan.num_chunks < strict.num_chunks
    _check(csr, plan, rhs=2)


def test_dist_plans_stay_unpermuted():
    """SPMD shard plans pin the strict layout (allow_relax=False):
    per-shard compact tile counts would break the single-program
    contract."""
    csr = _powerlaw_csr(seed=8, n=2000)
    plan = build_bell2_plan(csr, dtype=np.float32, allow_relax=False)
    assert plan.row_perm is None


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_grouped_perm_targets_only_visited_blocks(seed):
    """Static sentinel invariant (the property only REAL TPU kernels
    can violate at runtime): every non-sentinel unpermute target must
    live in a block the sparse grid visits — unvisited blocks hold
    garbage on hardware (the interpreter zeros them, hiding bugs)."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2_000, 9_000))
    csr = _powerlaw_csr(
        n=n, seed=seed + 10,
        dense_rows=int(rng.integers(2, 12)),
        dense_deg=int(rng.integers(150, 700)),
    )
    plan = build_bell2_plan(csr, dtype=np.float32)
    if plan.row_perm is None:
        pytest.skip("grouping did not trigger")
    perm = plan.row_perm
    sentinel = plan.num_row_tiles * 128
    live = perm[perm < sentinel]
    assert np.all(perm <= sentinel)
    visited = np.zeros(-(-plan.num_row_tiles // plan.tiles_per_block), bool)
    visited[np.unique(plan.step_block)] = True
    assert np.all(visited[(live >> 7) // plan.tiles_per_block]), (
        "unpermute target in an unvisited (garbage) output block"
    )
    # and every row with entries must be reachable (not sentinel)
    rowlen = np.diff(csr.indptr)
    assert np.all(perm[rowlen > 0] < sentinel)
