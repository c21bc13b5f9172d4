"""Iterative solvers built on SpDMV — the framework's flagship "models".

The reference is a kernel library; its consumer-facing workload is
repeated SpMV (``bench_spmv_mmf.cpp:153-167``). The natural TPU-resident
workload with identical inner structure is a Krylov solver, so Conjugate
Gradient is provided as the flagship end-to-end model: the whole iteration
runs inside one ``lax.scan``-style jit with no host round-trips.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["cg", "power_iteration"]


def cg(
    matvec: Callable,
    b: jax.Array,
    *,
    iters: int = 50,
    x0: jax.Array | None = None,
):
    """Fixed-iteration Conjugate Gradient for SPD systems.

    Fixed trip count keeps shapes/control flow static under jit (XLA
    requirement); residual norm is returned for convergence checks on the
    host. fp32 accumulation with one fp64-free Polak update per step.
    """
    from ..utils.timing import as_pure

    # device streams flow as arguments (closures would embed the whole
    # matrix into the compiled module as constants); with RCM active the
    # whole iteration runs in permuted space (norms are invariant) and
    # only the solution is decoded
    fn, ops, encode, decode = as_pure(matvec)
    b = jnp.asarray(encode(b))
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(encode(x0))
    r = b - fn(ops, x)
    p = r
    rs = jnp.vdot(r, r)

    def body(carry, _):
        x, r, p, rs = carry
        Ap = fn(ops, p)
        alpha = rs / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.vdot(r, r)
        p = r + (rs_new / rs) * p
        return (x, r, p, rs_new), rs_new

    (x, r, _, rs), hist = jax.lax.scan(
        body, (x, r, p, rs), None, length=iters
    )
    return decode(x), jnp.sqrt(rs), jnp.sqrt(hist)


def power_iteration(matvec: Callable, n: int, *, iters: int = 100, seed: int = 0):
    """Dominant eigenvalue via power iteration (spectral-norm model)."""
    from ..utils.timing import as_pure

    v = jax.random.normal(jax.random.PRNGKey(seed), (n,), jnp.float32)
    v = v / jnp.linalg.norm(v)
    fn, ops, _, decode = as_pure(matvec)

    def body(v, _):
        w = fn(ops, v)
        nrm = jnp.linalg.norm(w)
        return w / nrm, nrm

    v, nrms = jax.lax.scan(body, v, None, length=iters)
    return decode(v), nrms[-1]
