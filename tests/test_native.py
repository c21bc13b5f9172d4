"""Native C++ runtime vs NumPy fallback equivalence.

The native library (csrc/cfs_native.cpp) must produce bit-identical
results to the Python fallbacks: same MMF parse, same BELL2 plans.
"""

import io

import numpy as np
import pytest

from cfs_spmv_tpu import COO, CSR, native
from cfs_spmv_tpu.formats.bell2 import build_bell2_plan
from cfs_spmv_tpu.io.mmf import read_mmf


requires_native = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


@pytest.fixture
def no_native(monkeypatch):
    """Force the NumPy fallback paths."""
    monkeypatch.setattr(native, "parse_mmf_body", lambda *a, **k: None)
    monkeypatch.setattr(native, "pack_units", lambda *a, **k: None)


def _mmf_text():
    rng = np.random.default_rng(3)
    n, nnz = 57, 301
    r = rng.integers(1, n + 1, nnz)
    c = rng.integers(1, n + 1, nnz)
    v = rng.standard_normal(nnz)
    lines = [
        "%%MatrixMarket matrix coordinate real general",
        "% comment line",
        f"{n} {n} {nnz}",
    ]
    lines += [f"{ri} {ci} {vi:.17g}" for ri, ci, vi in zip(r, c, v)]
    # per-entry comment lines are legal and must be skipped
    lines.insert(10, "% mid-body comment")
    return "\n".join(lines) + "\n"


@requires_native
def test_parse_matches_python(no_native_request=None):
    text = _mmf_text()
    hdr_n, rn, cn, vn = read_mmf(io.StringIO(text))
    # force fallback by monkeypatching inline
    orig = native.parse_mmf_body
    try:
        native.parse_mmf_body = lambda *a, **k: None
        hdr_p, rp, cp, vp = read_mmf(io.StringIO(text))
    finally:
        native.parse_mmf_body = orig
    assert hdr_n == hdr_p
    np.testing.assert_array_equal(rn, rp)
    np.testing.assert_array_equal(cn, cp)
    np.testing.assert_array_equal(vn, vp)


@requires_native
def test_parse_pattern_and_malformed():
    text = (
        "%%MatrixMarket matrix coordinate pattern general\n"
        "3 3 2\n1 2\n3 1\n"
    )
    hdr, r, c, v = read_mmf(io.StringIO(text))
    np.testing.assert_array_equal(r, [0, 2])
    np.testing.assert_array_equal(c, [1, 0])
    assert np.all(v == 0.42)

    bad = "%%MatrixMarket matrix coordinate real general\n2 2 2\n1 1 0.5\n"
    with pytest.raises(ValueError):
        read_mmf(io.StringIO(bad))  # truncated body


@requires_native
@pytest.mark.parametrize("kind", ["banded", "scattered", "mixed"])
def test_pack_units_matches_python(kind):
    rng_seed = {"banded": 0, "scattered": 1, "mixed": 2}[kind]
    bw = {"banded": 40, "scattered": None, "mixed": 900}[kind]
    coo = COO.random(1000, 1000, 9.0, bandwidth=bw, seed=rng_seed)
    csr = CSR.from_coo(coo)

    plan_native = build_bell2_plan(csr, dtype=np.float32)
    orig = native.pack_units
    try:
        native.pack_units = lambda *a, **k: None
        plan_py = build_bell2_plan(csr, dtype=np.float32)
    finally:
        native.pack_units = orig

    np.testing.assert_array_equal(plan_native.vals, plan_py.vals)
    np.testing.assert_array_equal(plan_native.packed, plan_py.packed)
    np.testing.assert_array_equal(plan_native.meta, plan_py.meta)
    np.testing.assert_array_equal(
        plan_native.step_block, plan_py.step_block
    )


def test_native_disabled_env(monkeypatch):
    """CFS_NATIVE=0 must force the fallback without error."""
    import cfs_spmv_tpu.native as nat

    monkeypatch.setattr(nat, "_tried", False)
    monkeypatch.setattr(nat, "_lib", None)
    monkeypatch.setenv("CFS_NATIVE", "0")
    assert nat.parse_mmf_body(b"1 1 1.0", 1, 3) is None
    assert not nat.available()
    # restore for other tests
    monkeypatch.setattr(nat, "_tried", False)


def _block_coo(n_blocks=500, b=3, nbr=6, seed=5):
    rng = np.random.default_rng(seed)
    br = np.repeat(np.arange(n_blocks), nbr)
    bc = rng.integers(0, n_blocks, n_blocks * nbr)
    ri, ci = np.meshgrid(np.arange(b), np.arange(b), indexing="ij")
    row = (br[:, None] * b + ri.ravel()[None, :]).ravel()
    col = (bc[:, None] * b + ci.ravel()[None, :]).ravel()
    val = rng.uniform(0.5, 1.5, len(row))
    n = n_blocks * b
    return COO(n, n, row.astype(np.int64), col.astype(np.int64),
               val.astype(np.float32)).canonicalize()


@requires_native
@pytest.mark.parametrize(
    "kwargs",
    [
        {},
        {"contig": True},
        {"contig": True, "rot": 2},
        {"contig": True, "rot": 4},
        {"contig": True, "max_windows": 16},
        {"contig": True, "max_windows": 32, "rot": 4},
    ],
    ids=["free", "contig", "rot2", "rot4", "deep16", "deep32rot4"],
)
def test_pack_slots_native_matches_python(kwargs):
    from cfs_spmv_tpu.native import pack_slots, pack_slots_py

    coo = _block_coo()
    csr = CSR.from_coo(coo)
    row = np.repeat(np.arange(csr.nrows, dtype=np.int64),
                    np.diff(csr.indptr))
    col = csr.indices.astype(np.int64)
    tile, lane, seg, q = row >> 7, row & 127, col >> 7, col & 127
    order = np.lexsort((q, seg, tile))
    mw = kwargs.pop("max_windows", 8)
    args = (tile[order], lane[order], seg[order], q[order], mw)
    a = pack_slots(*args, **kwargs)
    b = pack_slots_py(*args, **kwargs)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_slot_packed_spmv_correct():
    """Block-structured matrix routes through the slot packer and still
    matches the host oracle."""
    from cfs_spmv_tpu.formats.bell2 import build_bell2_plan
    from cfs_spmv_tpu.ops import spmv as ops
    from cfs_spmv_tpu.utils.platform import allclose_spmv

    coo = _block_coo(n_blocks=800, nbr=8, seed=6)
    csr = CSR.from_coo(coo)
    plan = build_bell2_plan(csr, dtype=np.float32)
    dev = ops.to_device(plan)
    x = np.random.default_rng(0).uniform(1, 2, csr.ncols).astype(np.float32)
    y = np.asarray(ops.bell2_apply(dev, x))
    xd = x.astype(np.float64)
    assert allclose_spmv(
        y, csr.spmv_host(xd), np.float32,
        nnz_per_row=csr.nnz / csr.nrows,
        scale=csr.spmv_host(xd, absolute=True),
    )


@requires_native
@pytest.mark.parametrize("mw", [8, 16, 32], ids=["d8", "d16", "d32"])
def test_pack_slots_sweep_native_matches_python(mw):
    """Anchor-sweep packer: native and Python mirrors are bit-identical,
    the pack satisfies the layout invariants, and it never uses more
    chunks than the first-fit ring packer on the same stream."""
    from cfs_spmv_tpu.native import pack_slots_sweep, pack_slots_sweep_py

    rng = np.random.default_rng(3)
    # wide-band random structure — the shape the sweep exists for
    n = 4000
    row = np.repeat(np.arange(n, dtype=np.int64), 10)
    col = np.clip(row + rng.integers(-600, 601, len(row)), 0, n - 1)
    key = row * n + col
    keep = np.ones(len(key), bool)
    keep[1:] = np.sort(key)[1:] != np.sort(key)[:-1]
    order0 = np.argsort(key)
    row, col = row[order0][keep], col[order0][keep]
    tile, lane, seg, q = row >> 7, row & 127, col >> 7, col & 127
    order = np.lexsort((q, seg, tile))
    args = (tile[order], lane[order], seg[order], q[order], mw)
    a = pack_slots_sweep(*args)
    b = pack_slots_sweep_py(*args)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # layout invariants: unique (chunk, sub, row-lane); one seg per
    # (chunk, sub, gather-lane); window consistency seg == anchor + r2
    e_chunk, e_sub, e_r2 = a[0], a[1], a[2]
    sl = (e_chunk.astype(np.int64) * 8 + e_sub) * 128
    assert len(np.unique(sl + lane[order])) == len(row)
    kq = sl + q[order]
    o2 = np.argsort(kq, kind="stable")
    same = kq[o2][1:] == kq[o2][:-1]
    assert np.all(seg[order][o2][1:][same] == seg[order][o2][:-1][same])
    np.testing.assert_array_equal(a[5][:, 0][e_chunk] + e_r2, seg[order])
    assert e_r2.min() >= 0 and e_r2.max() < mw


@requires_native
def test_pack_slots_sweep_i32_matches_i64():
    from cfs_spmv_tpu.native import pack_slots_sweep

    coo = _block_coo()
    csr = CSR.from_coo(coo)
    row = np.repeat(np.arange(csr.nrows, dtype=np.int64),
                    np.diff(csr.indptr))
    col = csr.indices.astype(np.int64)
    tile, lane, seg, q = row >> 7, row & 127, col >> 7, col & 127
    order = np.lexsort((q, seg, tile))
    a64 = pack_slots_sweep(tile[order], lane[order], seg[order], q[order],
                           16)
    a32 = pack_slots_sweep(
        tile[order].astype(np.int32), lane[order].astype(np.int32),
        seg[order].astype(np.int32), q[order].astype(np.int32), 16,
    )
    assert a32[0].dtype == np.int32
    for x, y in zip(a64, a32):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@requires_native
@pytest.mark.parametrize("rot", [1, 2])
def test_pack_slots_i32_matches_i64(rot):
    """The int32 packer instantiation places every entry identically to
    the int64 one (same template; the dtype only narrows the streams)."""
    from cfs_spmv_tpu.native import pack_slots

    coo = _block_coo()
    csr = CSR.from_coo(coo)
    row = np.repeat(np.arange(csr.nrows, dtype=np.int64),
                    np.diff(csr.indptr))
    col = csr.indices.astype(np.int64)
    tile, lane, seg, q = row >> 7, row & 127, col >> 7, col & 127
    order = np.lexsort((q, seg, tile))
    a64 = pack_slots(tile[order], lane[order], seg[order], q[order], 8,
                     contig=True, rot=rot)
    a32 = pack_slots(
        tile[order].astype(np.int32), lane[order].astype(np.int32),
        seg[order].astype(np.int32), q[order].astype(np.int32), 8,
        contig=True, rot=rot,
    )
    assert a32[0].dtype == np.int32
    for x, y in zip(a64, a32):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@requires_native
def test_assemble_plan_matches_numpy_scatters():
    """cfs_assemble_plan writes the same value tiles and packed field as
    the NumPy fancy-scatter fallback, including the r2 |= plane."""
    from cfs_spmv_tpu.native import assemble_plan

    rng = np.random.default_rng(11)
    for rot in (1, 2, 4):
        n, C = 5000, 16
        stride = 128 // rot
        ec = rng.integers(0, C, n).astype(np.int32)
        e_sub = rng.integers(0, 8, n).astype(np.int32)
        e_r2 = rng.integers(0, 8, n).astype(np.int32)
        e_rc = rng.integers(0, rot, n).astype(np.int32)
        lane = rng.integers(0, 128, n).astype(np.int32)
        q = rng.integers(0, 128, n).astype(np.int32)
        val = rng.standard_normal(n).astype(np.float32)
        # dedup placed-lane collisions (the packer guarantees unique
        # slots; the comparison needs the same precondition)
        lane_p = lane if rot == 1 else (lane + stride * e_rc) & 127
        flat = (ec.astype(np.int64) * 8 + e_sub) * 128 + lane_p
        _, first = np.unique(flat, return_index=True)
        keep = np.zeros(n, bool)
        keep[first] = True
        # and q-plane collisions against differing r2 within a subrow
        qflat = (ec.astype(np.int64) * 8 + e_sub) * 128 + q
        qf = qflat[keep]
        _, qfirst = np.unique(qf, return_index=True)
        kq = np.zeros(len(qf), bool)
        kq[qfirst] = True
        idx = np.flatnonzero(keep)[kq]
        ec, e_sub, e_r2, e_rc = ec[idx], e_sub[idx], e_r2[idx], e_rc[idx]
        lane, q, val = lane[idx], q[idx], val[idx]
        lane_p = lane if rot == 1 else (lane + stride * e_rc) & 127

        vals_np = np.zeros((C, 8, 128), np.float32)
        packed_np = np.zeros((C, 8, 128), np.int16)
        vals_np[ec, e_sub, lane_p] = val
        if rot == 1:
            packed_np[ec, e_sub, lane_p] = q.astype(np.int16)
        else:
            packed_np[ec, e_sub, lane_p] = (
                q | (e_rc.astype(np.int64) << 12)
            ).astype(np.int16)
        packed_np[ec, e_sub, q] |= (e_r2 << 7).astype(np.int16)

        vals_c = np.zeros((C, 8, 128), np.float32)
        packed_c = np.zeros((C, 8, 128), np.int16)
        assert assemble_plan(
            ec, e_sub, e_r2, e_rc, lane, q, val, rot, vals_c, packed_c
        )
        np.testing.assert_array_equal(vals_np, vals_c)
        np.testing.assert_array_equal(packed_np, packed_c)


@requires_native
def test_assemble_sdia_matches_numpy_scatter():
    from cfs_spmv_tpu.native import assemble_sdia

    rng = np.random.default_rng(4)
    R, D = 7, 5
    n = 3000
    g = np.sort(rng.choice(R * 1024, n, replace=False)).astype(np.int64)
    j = rng.integers(0, D - 2, n).astype(np.int32)
    val = rng.standard_normal(n).astype(np.float32)
    ref = np.zeros((R, D, 8, 128), np.float32)
    ref[g // 1024, j + 1, (g // 128) % 8, g % 128] = val
    out = np.zeros((R, D, 8, 128), np.float32)
    assert assemble_sdia(g, j, 1, D, val, out)
    np.testing.assert_array_equal(ref, out)


@requires_native
@pytest.mark.parametrize("mirror", [False, True])
def test_sym_split_fill_matches_numpy_path(mirror, monkeypatch):
    """The one-pass native symmetric split + SDIA fill must produce the
    same plan as the NumPy formulation (diag, diagonal planes, residual
    stream)."""
    from cfs_spmv_tpu.formats import sbell as sb

    rng = np.random.default_rng(5)
    n = 4000
    # dense band (absorbed by SDIA) + scattered residual + partial diag
    rows = [np.arange(1, n, dtype=np.int64), np.arange(3, n, dtype=np.int64)]
    cols = [np.arange(1, n, dtype=np.int64) - 1,
            np.arange(3, n, dtype=np.int64) - 3]
    sr = rng.integers(1, n, 3000)
    sc = (sr - rng.integers(1, 900, 3000)).clip(0)
    m = sr > sc
    rows.append(sr[m]); cols.append(sc[m])
    d = rng.choice(n, n // 2, replace=False)
    rows.append(d); cols.append(d)
    row = np.concatenate(rows); col = np.concatenate(cols)
    val = rng.standard_normal(len(row))
    coo = COO(n, n, row, col, val, symmetric=True).canonicalize()
    csr = CSR.from_coo(coo)

    plan_nat = sb.build_sbell_plan(csr, dtype=np.float32, dia_mirror=mirror)
    monkeypatch.setattr(native, "sym_off_counts", lambda *a, **k: None)
    monkeypatch.setattr(native, "pair_mark", lambda *a, **k: None)
    plan_np = sb.build_sbell_plan(csr, dtype=np.float32, dia_mirror=mirror)

    np.testing.assert_array_equal(
        plan_nat.diag.astype(np.float32), plan_np.diag.astype(np.float32)
    )
    assert (plan_nat.dia is None) == (plan_np.dia is None)
    if plan_nat.dia is not None:
        assert plan_nat.dia.offsets == plan_np.dia.offsets
        np.testing.assert_array_equal(plan_nat.dia.vals, plan_np.dia.vals)
    assert (plan_nat.far is None) == (plan_np.far is None)
    if plan_nat.far is not None:
        np.testing.assert_array_equal(plan_nat.far.vals, plan_np.far.vals)
        np.testing.assert_array_equal(
            plan_nat.far.packed, plan_np.far.packed
        )
    np.testing.assert_array_equal(plan_nat.vals, plan_np.vals)
    np.testing.assert_array_equal(plan_nat.packed, plan_np.packed)
    assert plan_nat.nnz_full == plan_np.nnz_full


@requires_native
def test_sym_adjacency_same_rcm_perm(monkeypatch):
    """Native adjacency (arbitrary neighbor order) must yield the same
    RCM permutation as the sorted NumPy edge list."""
    from cfs_spmv_tpu.tuning import reorder as ro

    rng = np.random.default_rng(9)
    n = 3000
    r = rng.integers(1, n, 8000)
    c = (r - rng.integers(1, 200, 8000)).clip(0)
    m = r > c
    d = np.arange(n)
    row = np.concatenate([r[m], d]); col = np.concatenate([c[m], d])
    csr = CSR.from_coo(COO(n, n, row, col,
                           np.ones(len(row), np.float32),
                           symmetric=True).canonicalize())
    p_nat = ro.rcm_permutation(csr)
    monkeypatch.setattr(native, "sym_adjacency", lambda *a, **k: None)
    p_np = ro.rcm_permutation(csr)
    np.testing.assert_array_equal(p_nat, p_np)


@requires_native
def test_dist_sym_split_native_matches_numpy():
    """The native two-pass distributed shard split (cfs_dist_sym_count/
    _fill) produces bit-identical streams to the NumPy fallback."""
    import cfs_spmv_tpu.native as nat
    from cfs_spmv_tpu.parallel.dist import DistSpDMV
    from cfs_spmv_tpu.parallel.mesh import make_mesh
    from cfs_spmv_tpu.utils.proxies import cant_proxy, near_band_paired

    for csr, nd in [(cant_proxy(n=20000, half_bw=16), 4),
                    (near_band_paired(n=12000, n_diags=32, max_off=300),
                     4)]:
        mesh = make_mesh(nd)
        d1 = DistSpDMV(csr, mesh)
        old_lib, old_tried = nat._lib, nat._tried
        nat._lib, nat._tried = None, True
        try:
            d2 = DistSpDMV(csr, mesh)
        finally:
            nat._lib, nat._tried = old_lib, old_tried
        assert d1.far_nnz == d2.far_nnz
        assert d1.dia_offsets == d2.dia_offsets
        if d1._dia is None:
            assert d2._dia is None
        else:
            np.testing.assert_array_equal(d1._dia, d2._dia)
        for a, b in zip(d1._paired, d2._paired):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(d1._far, d2._far):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
