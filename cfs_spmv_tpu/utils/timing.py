"""Benchmark timing protocol.

The reference times a bare host loop of SpMV calls
(``bench_spmv_mmf.cpp:153-167``). Through the axon TPU tunnel every
dispatch costs ~31 ms of fixed round-trip latency, so the equivalent
protocol runs the iteration loop *inside* one jitted ``fori_loop`` with a
data dependency that prevents hoisting, and removes the fixed dispatch
cost with a two-point measurement: t/iter = (T(2k) - T(k)) / k, which
cancels latency exactly (unlike subtracting a separately measured empty
loop, which can go negative for sub-microsecond kernels). The trip count
is a traced argument so both points share one compiled executable.
"""

from __future__ import annotations

import time

import numpy as np

__all__ = ["time_matvec", "as_pure"]


def as_pure(matvec, x=None):
    """(fn(operands, x), operands) form of a matvec-like object.

    ``TunedMatrix`` / ``SpDMV`` expose this natively (``x`` with ndim 2
    selects the multi-RHS applier); bare callables get empty operands
    (any arrays they capture then become jit constants — fine for small
    closures, ruinous for matrix streams).

    Returns (fn, operands, encode, decode); encode/decode map user space
    to the internal (RCM-permuted) space and back — identity when no
    reordering is active.
    """
    ident = lambda v: v  # noqa: E731
    obj = matvec
    if hasattr(obj, "__self__"):  # bound method (e.g. tuned.matvec)
        obj = obj.__self__
    if hasattr(obj, "A"):  # SpDMV functor → its SparseMatrix
        obj = obj.A
    if hasattr(obj, "tuned") and obj.tuned is not None:  # SparseMatrix
        obj = obj.tuned
    if hasattr(obj, "pure_apply"):  # TunedMatrix
        if x is not None and getattr(x, "ndim", 1) == 2:
            fn, ops = obj.pure_apply_mm()
        else:
            fn, ops = obj.pure_apply()
        return fn, ops, obj.encode, obj.decode
    return (lambda ops, x: matvec(x)), (), ident, ident


def time_matvec(matvec, x, iters: int = 500, repeats: int = 5) -> float:
    """Amortized per-iteration seconds with a hoisting-proof dependency."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(x)
    # device streams must flow through the jit as ARGUMENTS — a closure
    # would inline the whole matrix into the module as constants (and
    # closure_convert cannot rescue consts hidden in inner pjits)
    fn, ops, encode, _ = as_pure(matvec, x)
    x = jnp.asarray(encode(x))  # once, outside the timed loop

    @jax.jit
    def loop(x, n, ops):
        def body(i, carry):
            x, acc = carry
            y = fn(ops, x * (1.0 + 1e-12 * i))
            # ravel + cast keeps the carry type fixed for 2-D / fp64 y
            return (x, acc + y.ravel()[0].astype(jnp.float32))

        return jax.lax.fori_loop(
            0, n, body, (x, jnp.float32(0.0))
        )

    jax.block_until_ready(loop(x, 2 * iters, ops))  # warmup / compile

    def timed(n):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(loop(x, n, ops)[1])
            best = min(best, time.perf_counter() - t0)
        return best

    # host-load spikes can make T(k) exceed T(2k); retry until the pair
    # is sane, then fall back to the amortized upper bound rather than
    # reporting a nonsense (even infinite) rate
    for _ in range(4):
        t1 = timed(iters)
        t2 = timed(2 * iters)
        if t2 > 1.2 * t1:
            return (t2 - t1) / iters
    return t2 / (2 * iters)


def ballast_probe(mb: int = 64) -> float:
    """Host-noise probe: seconds to gather an ``mb``-MB array through a
    random permutation. ~0.2 s on a quiet host; inflates 10-30x under
    this VM's fast-RAM pressure episodes (see CLAUDE.md) — preprocessing
    seconds quoted next to a bad probe are host-bound, not algorithmic."""
    import numpy as _np

    n = mb * (1 << 20) // 8
    rng = _np.random.default_rng(0)
    src = rng.uniform(size=n)
    idx = rng.permutation(n)
    t0 = time.perf_counter()
    out = src[idx]
    dt = time.perf_counter() - t0
    del out
    return dt
