"""fp64-on-TPU ELL+COO path (scatter-free hot loop).

Pallas has no 64-bit lanes, so fp64 routes through pure XLA
(``tuning/tune._tune_fp64_xla``). The original COO scatter-add
formulation measured 0.009 Gnnz/s on v5e; the ELL slab turns the
regular part into gather/multiply/row-sum. The reference runs all
kernels in double under ``--enable-dp`` (``configure.ac``), so this is
its last strictly-won capability — these tests pin the split and the
appliers on the CPU backend (XLA fp64 semantics are identical there).
"""

import numpy as np

from cfs_spmv_tpu.formats.coo import COO
from cfs_spmv_tpu.formats.csr import CSR
from cfs_spmv_tpu.ops.xla_ref import (
    build_ell_hyb,
    ell_spmm_xla,
    ell_spmv_xla,
)
from cfs_spmv_tpu.utils.platform import Format


def _coo(n=700, per_row=5, dense_rows=(3, 77), dense_len=200, seed=0):
    """Skewed: background rows of ~5 nnz plus two dense rows that must
    overflow the 4x-mean ELL width into the COO remainder."""
    rng = np.random.default_rng(seed)
    row = np.repeat(np.arange(n, dtype=np.int64), per_row)
    col = rng.integers(0, n, n * per_row)
    for r in dense_rows:
        row = np.concatenate([row, np.full(dense_len, r)])
        col = np.concatenate([col, rng.choice(n, dense_len, replace=False)])
    val = rng.uniform(0.5, 1.5, len(row))
    return COO(n, n, row.astype(np.int64), col.astype(np.int64),
               val).canonicalize()


def test_build_ell_hyb_partition():
    coo = _coo()
    n = coo.nrows
    ecol, evals, rr, rc, rv = build_ell_hyb(coo.row, coo.col, coo.val, n)
    counts = np.bincount(coo.row, minlength=n)
    L = ecol.shape[1]
    assert L < counts.max()  # the dense rows overflow
    # every entry lands exactly once: slab nonzeros + remainder == nnz
    assert (evals != 0).sum() + len(rv) == coo.nnz
    # remainder rows are exactly the overflowing ones
    assert set(np.unique(rr)) == set(np.where(counts > L)[0])
    # slab reproduces each row's first-L entries' sum against the oracle
    x = np.random.default_rng(1).uniform(1, 2, n)
    y = np.asarray(ell_spmv_xla(ecol, evals, x))
    if len(rr):
        np.add.at(y, rr, rv * x[rc])
    ref = CSR.from_coo(coo).spmv_host(x)
    np.testing.assert_allclose(y, ref, rtol=1e-13)


def test_ell_spmm_matches_spmv():
    coo = _coo(seed=2)
    n = coo.nrows
    ecol, evals, rr, rc, rv = build_ell_hyb(coo.row, coo.col, coo.val, n)
    X = np.random.default_rng(3).uniform(1, 2, (n, 3))
    Y = np.asarray(ell_spmm_xla(ecol, evals, X))
    for b in range(3):
        np.testing.assert_allclose(
            Y[:, b], np.asarray(ell_spmv_xla(ecol, evals, X[:, b])),
            rtol=1e-13,
        )


def test_tune_fp64_xla_applier():
    """Drive _tune_fp64_xla directly (the use_interpret gate skips it on
    CPU backends; XLA CPU runs the same HLO in native f64)."""
    from cfs_spmv_tpu.tuning.tune import _tune_fp64_xla

    coo = _coo(seed=4)
    csr = CSR.from_coo(coo)
    tuned = _tune_fp64_xla(csr, Format.CSR)
    x = np.random.default_rng(5).uniform(1, 2, csr.ncols)
    y = np.asarray(tuned.matvec(x))
    np.testing.assert_allclose(y, csr.spmv_host(x), rtol=1e-13)
    X = np.random.default_rng(6).uniform(1, 2, (csr.ncols, 2))
    Y = np.asarray(tuned.matmat(X))
    np.testing.assert_allclose(Y[:, 0], csr.spmv_host(X[:, 0]), rtol=1e-13)


def test_tune_fp64_xla_symmetric_no_remainder():
    """Banded symmetric (uniform degree): remainder must be empty and
    the mirrored expansion exact."""
    from cfs_spmv_tpu.tuning.tune import _tune_fp64_xla

    rng = np.random.default_rng(7)
    n, hb = 512, 6
    rows = np.repeat(np.arange(n, dtype=np.int64), hb)
    offs = np.tile(np.arange(1, hb + 1, dtype=np.int64), n)
    cols = rows - offs
    keep = cols >= 0
    r = np.concatenate([rows[keep], np.arange(n)])
    c = np.concatenate([cols[keep], np.arange(n)])
    v = rng.uniform(0.5, 1.5, len(r))
    csr = CSR.from_coo(COO(n, n, r, c, v, symmetric=True).canonicalize())
    tuned = _tune_fp64_xla(csr, Format.SSS)
    assert tuned.operands["row"] is None  # uniform rows: pure ELL
    x = rng.uniform(1, 2, n)
    np.testing.assert_allclose(
        np.asarray(tuned.matvec(x)), csr.spmv_host(x), rtol=1e-13
    )
