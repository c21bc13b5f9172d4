"""Pure-XLA sparse ops: differential oracle + scattered-spill path.

Two roles, mirroring the reference's test strategy (SURVEY §4):

- the *oracle* for differential tests (the reference uses its own untuned
  serial CSR kernel as oracle, ``test_spmv_mmf.cpp:85-89``; here the naive
  gather/scatter formulation plays that part — plus dense matmul for tiny
  matrices);
- the *spill stream* executor: out-of-window entries from the BELL plan
  (HYB high-bandwidth analog, ``csr_matrix.tpp:313-401``) are applied with
  XLA gather + scatter-add. This is slow per element on TPU, which is
  exactly why the tuner keeps the spill fraction small.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "coo_spmv_xla",
    "coo_spmm_xla",
    "csr_spmv_oracle",
    "build_ell_hyb",
    "ell_spmv_xla",
    "ell_spmm_xla",
]


@functools.partial(jax.jit, static_argnames=("nrows",))
def coo_spmv_xla(row, col, val, x, *, nrows: int):
    """y = A @ x from COO arrays via gather + segment-sum."""
    prod = val * jnp.take(x, col, axis=0)
    return jnp.zeros((nrows,), prod.dtype).at[row].add(prod)


@functools.partial(jax.jit, static_argnames=("nrows",))
def coo_spmm_xla(row, col, val, x, *, nrows: int):
    """Y = A @ X (X: (ncols, B)) from COO arrays."""
    prod = val[:, None] * jnp.take(x, col, axis=0)
    return jnp.zeros((nrows, x.shape[1]), prod.dtype).at[row].add(prod)


def build_ell_hyb(row, col, val, nrows, *, width_factor=4, min_width=8):
    """Host split of COO triples into a dense ELL slab + COO remainder.

    The fp64-on-TPU path (Pallas has no 64-bit lanes) originally ran
    pure COO scatter-add — ~0.009 Gnnz/s, 4-5 orders below fp32,
    because every element pays an emulated-fp64 scatter. The reference
    runs ALL kernels in double under ``--enable-dp``
    (``/root/reference/configure.ac``), so fp64 throughput is the one
    capability it strictly won. ELL turns the hot part into dense
    gather/multiply/row-sum — no scatter — and leaves only the skew
    tail (rows longer than ``width_factor``× the mean) on the COO path.

    Returns ``(ecol (nrows, L) int32, eval (nrows, L), rem_row,
    rem_col, rem_val)``; L == 0 (empty slab) when nrows == 0.
    """
    row = np.asarray(row)
    counts = np.bincount(row, minlength=nrows)
    if nrows == 0 or len(row) == 0:
        z = np.zeros((nrows, 0))
        return (z.astype(np.int32), z.astype(val.dtype),
                row[:0], np.asarray(col)[:0], np.asarray(val)[:0])
    L = int(min(
        counts.max(),
        max(min_width, int(np.ceil(width_factor * counts.mean()))),
    ))
    order = np.argsort(row, kind="stable")
    r, c, v = row[order], np.asarray(col)[order], np.asarray(val)[order]
    starts = np.zeros(nrows + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    k = np.arange(len(r), dtype=np.int64) - starts[r]  # rank within row
    in_ell = k < L
    # padded slots gather x[0] with value 0 (exact no-op contribution)
    ecol = np.zeros((nrows, L), np.int32)
    evals = np.zeros((nrows, L), v.dtype)
    ecol[r[in_ell], k[in_ell]] = c[in_ell]
    evals[r[in_ell], k[in_ell]] = v[in_ell]
    rem = ~in_ell
    return ecol, evals, r[rem], c[rem], v[rem]


@jax.jit
def ell_spmv_xla(ecol, evals, x):
    """y = A @ x from an ELL slab: gather + multiply + row reduction,
    scatter-free (each output row is owned by one reduction)."""
    return jnp.sum(evals * jnp.take(x, ecol, axis=0), axis=1)


@jax.jit
def ell_spmm_xla(ecol, evals, x):
    """Y = A @ X (X: (ncols, B)) from an ELL slab."""
    return jnp.einsum("rl,rlb->rb", evals, jnp.take(x, ecol, axis=0))


def csr_spmv_oracle(csr, x):
    """Host NumPy oracle (serial CSR / symmetric-fold-in semantics),
    delegating to :meth:`cfs_spmv_tpu.formats.csr.CSR.spmv_host`."""
    return csr.spmv_host(x)
