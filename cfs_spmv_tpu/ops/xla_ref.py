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

__all__ = ["coo_spmv_xla", "coo_spmm_xla", "csr_spmv_oracle"]


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


def csr_spmv_oracle(csr, x):
    """Host NumPy oracle (serial CSR / symmetric-fold-in semantics),
    delegating to :meth:`cfs_spmv_tpu.formats.csr.CSR.spmv_host`."""
    return csr.spmv_host(x)
