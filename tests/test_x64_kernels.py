"""No 64-bit types may enter a Pallas kernel trace under jax_enable_x64.

The reference harness is pinned to double (``test_spmv_mmf.cpp:17``), so
users enable ``jax_enable_x64`` globally; TPU Pallas has no 64-bit lanes
(Mosaic: "64-bit types are not supported" / i64 index-map transforms
"failed to legalize"). The fp32 kernel path must therefore trace clean
32-bit programs even with x64 on — literals in BlockSpec index maps and
``take_along_axis`` index promotion are the historical leaks.

The x64 flag is already on globally in conftest.py; these tests walk the
traced jaxpr's ``pallas_call`` equations and assert their kernel jaxprs
and index maps carry no 64-bit dtype.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cfs_spmv_tpu.formats.bell2 import build_bell2_plan
from cfs_spmv_tpu.formats.csr import CSR
from cfs_spmv_tpu.formats.sbell import build_sbell_plan
from cfs_spmv_tpu.ops import spmv as ops


def _pallas_jaxprs(jaxpr):
    """All jaxprs reachable from pallas_call eqns (kernel + index maps)."""
    found = []

    def walk(jx):
        for eqn in jx.eqns:
            if eqn.primitive.name == "pallas_call":
                found.append(eqn.params["jaxpr"])
                gm = eqn.params.get("grid_mapping")
                if gm is not None:
                    for bm in gm.block_mappings:
                        found.append(bm.index_map_jaxpr.jaxpr)
            for v in eqn.params.values():
                sub = getattr(v, "jaxpr", None)
                if sub is not None and hasattr(sub, "eqns"):
                    walk(sub)

    walk(jaxpr.jaxpr)
    return found


def _assert_no_64bit(jaxpr):
    kernels = _pallas_jaxprs(jaxpr)
    assert kernels, "expected at least one pallas_call in the trace"
    for k in kernels:
        s = str(k)
        assert "i64" not in s and "f64" not in s and "u64" not in s, (
            "64-bit type leaked into a Pallas kernel trace:\n" + s[:2000]
        )


def _banded_csr(n=600, bw=30, seed=0):
    from cfs_spmv_tpu.formats.coo import COO

    coo = COO.random(
        n, n, 4.0, symmetric=True, bandwidth=bw, seed=seed,
        dtype=np.float64,
    )
    return CSR.from_coo(coo.canonicalize())


def test_sbell_apply_trace_is_32bit():
    assert jax.config.jax_enable_x64  # conftest turns it on
    csr = _banded_csr()
    plan = build_sbell_plan(csr, dtype=np.float32)
    dev = ops.sym_to_device(plan)
    x = jnp.ones((csr.nrows,), jnp.float32)
    _assert_no_64bit(jax.make_jaxpr(ops.sbell_apply)(dev, x))


def test_sbell_apply_mm_trace_is_32bit():
    csr = _banded_csr()
    plan = build_sbell_plan(csr, dtype=np.float32)
    dev = ops.sym_to_device(plan)
    X = jnp.ones((csr.nrows, 4), jnp.float32)
    _assert_no_64bit(jax.make_jaxpr(ops.sbell_apply_mm)(dev, X))


def test_bell2_apply_trace_is_32bit():
    csr = _banded_csr()
    plan = build_bell2_plan(csr, dtype=np.float32)
    dev = ops.to_device(plan)
    x = jnp.ones((csr.ncols,), jnp.float32)
    _assert_no_64bit(jax.make_jaxpr(ops.bell2_apply)(dev, x))


def test_general_dia_trace_is_32bit():
    """The signed-offset (general/mirrored) SDIA path must trace 32-bit
    too — its offsets are Python ints in pad widths and slab indices."""
    from cfs_spmv_tpu.formats.bell2 import build_general_plan
    from tests.test_sdia_gen import _banded_general

    csr = _banded_general(n=1200)
    plan = build_general_plan(csr, dtype=np.float32)
    assert plan.dia is not None
    dev = ops.to_device(plan)
    x = jnp.ones((csr.ncols,), jnp.float32)
    _assert_no_64bit(jax.make_jaxpr(ops.bell2_apply)(dev, x))


def test_empty_paired_placeholders_stay_32bit():
    """f64[0] placeholders would re-enable x64 tracing via the dtype
    gate in ``_no_x64`` — they must upload as 32-bit."""
    from cfs_spmv_tpu.formats.coo import COO

    coo = COO.random(
        400, 400, 2.0, symmetric=True, seed=3, dtype=np.float64
    )  # scattered: everything lands in the far stream
    plan = build_sbell_plan(CSR.from_coo(coo.canonicalize()),
                            dtype=np.float32)
    dev = ops.sym_to_device(plan)
    for name in ("vals", "packed", "meta", "step_block"):
        assert jnp.dtype(getattr(dev, name).dtype).itemsize <= 4, name
