"""Nibble-split one-sided streams (int8 q + 4-bit window nibbles).

The scalar-prefetch word path is stream-DMA-bound on adversarial
shapes (docs/KERNEL_NOTES_R3.md); ``nib_split`` cuts the index stream
from int16's 2 B/slot to 1.5 B (measured +8% on the random-band
workload, neutral on the VPU-bound audikw proxy). These tests pin:

- the split is a bit-exact re-encoding of the packed fields;
- nib and word kernels agree across the spmv / accum / spmm /
  spmm-accum variants (bit-exact on the dense paths; ~2 ulps on the
  accumulating ones, where interpret-mode XLA refuses the op order);
- the gate only fires where the encoding is valid (depth <= 16,
  rot == 1, even K, int16 stream).
"""

import numpy as np

from cfs_spmv_tpu.formats.bell2 import SUBLANES, build_bell2_plan
from cfs_spmv_tpu.formats.coo import COO
from cfs_spmv_tpu.formats.csr import CSR
from cfs_spmv_tpu.ops import spmv as ops
from cfs_spmv_tpu.ops.bell2_kernel import nib_split
from cfs_spmv_tpu.utils.config import config


def _scattered_csr(n=4096, per_row=10, seed=3):
    rng = np.random.default_rng(seed)
    row = np.repeat(np.arange(n, dtype=np.int64), per_row)
    col = rng.integers(0, n, n * per_row).astype(np.int64)
    val = rng.uniform(0.5, 1.5, len(row)).astype(np.float32)
    return CSR.from_coo(COO(n, n, row, col, val).canonicalize())


def test_nib_split_bit_exact():
    rng = np.random.default_rng(0)
    C = 6
    q = rng.integers(0, 128, (C * SUBLANES, 128))
    r2 = rng.integers(0, 16, (C * SUBLANES, 128))
    packed = (q | (r2 << 7)).astype(np.int16)
    q8, nib = nib_split(packed)
    assert q8.dtype == np.int8 and nib.dtype == np.int8
    assert q8.shape == (C * SUBLANES, 128)
    assert nib.shape == (C * 4, 128)
    np.testing.assert_array_equal(q8, q.astype(np.int8))
    # nibble decode: even sublane rows in the low nibble, odd in high
    n3 = nib.astype(np.int32).reshape(C, 4, 128)
    lo, hi = n3 & 0xF, (n3 >> 4) & 0xF
    r3 = r2.reshape(C, SUBLANES, 128)
    np.testing.assert_array_equal(lo, r3[:, 0::2])
    np.testing.assert_array_equal(hi, r3[:, 1::2])


def _apply_both(csr, *, cover_all_tiles=True, mm=0, seed=0):
    """y with nib on vs off; plans built once, identical geometry."""
    plan = build_bell2_plan(csr, dtype=np.float32,
                            cover_all_tiles=cover_all_tiles)
    x = np.random.default_rng(seed).uniform(1, 2, csr.ncols)
    if mm:
        x = np.random.default_rng(seed).uniform(1, 2, (csr.ncols, mm))
    x = x.astype(np.float32)
    outs = {}
    old = config.nib_streams
    try:
        for nib in (True, False):
            config.nib_streams = nib
            dev = ops.to_device(plan)
            assert (dev.nib is not None) == (
                nib and dev.meta.ndim == 1
                and plan.window_depth <= 2 * SUBLANES
                and plan.lane_rot == 1
                and plan.chunks_per_step % 2 == 0
            )
            fn = ops.bell2_apply_mm if mm else ops.bell2_apply
            outs[nib] = np.asarray(fn(dev, x))
    finally:
        config.nib_streams = old
    return plan, outs


def _assert_tight(a, b):
    """Same math, possibly different XLA:CPU fusion in interpret mode:
    agree to ~2 ulps (the dense word path measures bit-identical; the
    accumulating variants reassociate the aliased += under interpret)."""
    scale = np.abs(b).max()
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6 * scale)


def test_nib_matches_word_spmv():
    csr = _scattered_csr()
    plan, outs = _apply_both(csr)
    # the proof only counts if the nib path actually ran
    assert plan.windows_contig or plan.window_depth > SUBLANES
    np.testing.assert_array_equal(outs[True], outs[False])


def test_nib_matches_word_spmm():
    csr = _scattered_csr(seed=5)
    _, outs = _apply_both(csr, mm=3, seed=5)
    np.testing.assert_array_equal(outs[True], outs[False])


def test_nib_matches_word_sparse_accum():
    # sparse accumulating stream (the far-residual mode)
    csr = _scattered_csr(n=2048, per_row=4, seed=7)
    _, outs = _apply_both(csr, cover_all_tiles=False, seed=7)
    _assert_tight(outs[True], outs[False])


def test_nib_matches_word_sparse_accum_mm():
    csr = _scattered_csr(n=2048, per_row=4, seed=9)
    _, outs = _apply_both(csr, cover_all_tiles=False, mm=2, seed=9)
    _assert_tight(outs[True], outs[False])


def test_nib_gate_rejects_odd_k():
    csr = _scattered_csr(n=1024, per_row=6, seed=11)
    plan = build_bell2_plan(csr, dtype=np.float32, chunks_per_step=3)
    old = config.nib_streams
    try:
        config.nib_streams = True
        dev = ops.to_device(plan)
    finally:
        config.nib_streams = old
    assert dev.nib is None  # odd K cannot pair chunks within a step
    x = np.random.default_rng(0).uniform(1, 2, csr.ncols).astype(np.float32)
    y = np.asarray(ops.bell2_apply(dev, x))
    ref = csr.spmv_host(x.astype(np.float64))
    assert np.allclose(y, ref, rtol=1e-5, atol=1e-5 * np.abs(ref).max())


def test_word_path_segmentation(monkeypatch):
    """Streams past PREF_CMAX chunks chain per-segment word-path calls
    (cut at out-block boundaries, later calls alias the output) and
    must match the single-call result exactly."""
    import cfs_spmv_tpu.ops.bell2_kernel as bk
    from cfs_spmv_tpu.formats.bell2 import build_bell2_plan
    from cfs_spmv_tpu.formats.coo import COO
    from cfs_spmv_tpu.formats.csr import CSR
    from cfs_spmv_tpu.ops import spmv as ops

    rng = np.random.default_rng(31)
    n = 4096
    row = np.repeat(np.arange(n, dtype=np.int64), 10)
    col = np.clip(
        row + rng.integers(-400, 401, len(row)), 0, n - 1
    )
    csr = CSR.from_coo(
        COO(n, n, row, col, rng.uniform(-1, 1, len(row))).canonicalize()
    )
    plan = build_bell2_plan(csr, dtype=np.float32, chunks_per_step=8,
                            tiles_per_block=8)
    assert plan.windows_contig or plan.window_depth > 8
    x = rng.uniform(1, 2, n).astype(np.float32)

    dev1 = ops.to_device(plan)
    assert dev1.word_segs == ()
    y1 = np.asarray(ops.bell2_apply(dev1, x))

    monkeypatch.setattr(bk, "PREF_CMAX", 32)  # force 4 segments
    dev2 = ops.to_device(plan)
    assert len(dev2.word_segs) > 2, dev2.word_segs
    y2 = np.asarray(ops.bell2_apply(dev2, x))
    np.testing.assert_array_equal(y1, y2)

    # multi-RHS path through the same segmentation
    X = rng.uniform(1, 2, (n, 2)).astype(np.float32)
    Y1 = np.asarray(ops.bell2_apply_mm(dev1, X))
    Y2 = np.asarray(ops.bell2_apply_mm(dev2, X))
    np.testing.assert_array_equal(Y1, Y2)

    # word_segments contract: block-pure cuts
    segs = dev2.word_segs
    sb = np.asarray(plan.step_block)
    for b in segs[1:-1]:
        assert sb[b] != sb[b - 1], "cut must sit at a block boundary"
