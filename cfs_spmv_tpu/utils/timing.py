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

__all__ = ["time_matvec"]


def time_matvec(matvec, x, iters: int = 500, repeats: int = 5) -> float:
    """Amortized per-iteration seconds with a hoisting-proof dependency."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(x)

    @jax.jit
    def loop(x, n):
        def body(i, carry):
            x, acc = carry
            y = matvec(x * (1.0 + 1e-12 * i))
            # ravel + cast keeps the carry type fixed for 2-D / fp64 y
            return (x, acc + y.ravel()[0].astype(jnp.float32))

        return jax.lax.fori_loop(
            0, n, body, (x, jnp.float32(0.0))
        )

    jax.block_until_ready(loop(x, 2 * iters))  # warmup / compile

    def timed(n):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(loop(x, n)[1])
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(iters)
    t2 = timed(2 * iters)
    return max(t2 - t1, 1e-12) / iters
