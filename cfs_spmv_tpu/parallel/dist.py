"""Distributed SpMV over a device mesh.

TPU-native replacement for the reference's shared-memory thread
parallelism (OpenMP row ranges + conflict-free coloring,
``csr_matrix.tpp:403-541, 1204-1639``): matrix rows are sharded across
devices in contiguous, block-aligned 128-row-tile ranges balanced by
nonzero count (``partition_by_nnz`` analog, ``tpp:437-541``).

Communication structure mirrors the reference's HYB low/high-bandwidth
split (``split_by_bandwidth``, ``tpp:313-401``) at pod scale:

- the *paired symmetric near stream* (entries whose row and column live
  in the same output block, hence the same shard) reads only the
  device's own x segment — NO communication at all;
- only the *far stream* (plus general asymmetric matrices) needs
  remote x: either one ``all_gather`` over the mesh (comm="gather") or
  a ``ppermute`` ring that overlaps each rotation with the partial SpMV
  against the arriving segment (comm="ring") — the collective
  replacements for the reference's shared read-only x.

Each device produces exactly its own y rows, so there is no cross-device
scatter or psum: conflict-freedom by partition, as in the paper, but
enforced by layout instead of coloring.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

try:  # moved out of experimental in newer jax
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..formats.bell2 import LANES, META_W, Bell2Plan, build_bell2_plan
from ..formats.coo import COO
from ..formats.csr import CSR
from ..formats.sbell import build_sbell_plan
from ..tuning.partition import (
    estimate_imbalance,
    partition_tiles_by_nnz,
    tile_nnz_histogram,
)
from ..utils.logging import info
from .mesh import ROWS_AXIS

__all__ = ["DistSpDMV", "shard_csr_rows"]


def _slice_csr_rows(csr: CSR, r0: int, r1: int, pad_rows: int) -> CSR:
    """Rows [r0, r1) as a local CSR padded to ``pad_rows`` rows."""
    p0, p1 = csr.indptr[r0], csr.indptr[r1]
    indptr = (csr.indptr[r0 : r1 + 1] - p0).astype(np.int64)
    indptr = np.pad(indptr, (0, pad_rows - (r1 - r0)), mode="edge")
    return CSR(pad_rows, csr.ncols, indptr, csr.indices[p0:p1],
               csr.data[p0:p1], csr.symmetric)


def shard_csr_rows(csr: CSR, ndev: int, align_tiles: int = 1):
    """Equal-nnz contiguous row-tile shard bounds (ref ``tpp:437-541``),
    aligned to ``align_tiles`` tiles."""
    T = max(1, -(-csr.nrows // LANES))
    hist = tile_nnz_histogram(csr.indptr, T)
    bounds = partition_tiles_by_nnz(hist, ndev)
    if align_tiles > 1:
        bounds = (np.round(bounds / align_tiles) * align_tiles).astype(
            np.int64
        )
        np.maximum.accumulate(bounds, out=bounds)
        bounds = np.minimum(bounds, T)
        bounds[0], bounds[-1] = 0, T
    work = [
        int(hist[bounds[d] : bounds[d + 1]].sum()) for d in range(ndev)
    ]
    info(
        "shard: %d devices, nnz/dev %s, imbalance %.3f",
        ndev, work, estimate_imbalance(np.maximum(work, 1)),
    )
    return bounds


def _pad_bell2(plans: list[Bell2Plan], dtype):
    """Stack per-device BELL2 plans into uniform (D, ...) arrays.

    When EVERY plan can take the scalar-prefetch word path (or is
    empty — its zero streams contribute nothing under either kernel
    form), the stacked meta is the packed (D, C) meta_word array
    instead of the streamed (D, C, META_W) table: the kernels dispatch
    on ``meta.ndim``, so the SPMD program then runs the lazy-store /
    stall-free word kernels (round 4: the streamed path pays the
    ~677 ns/step SMEM pipeline stall plus the serializing per-chunk
    RMW — a large share of the dist-vs-tuned single-chip gap on
    scattered structure). Padding words copy each plan's last real
    word so the lazy reset never targets a live row."""
    from ..ops.bell2_kernel import meta_word, word_eligible

    K = plans[0].chunks_per_step
    C_max = max(p.num_chunks for p in plans)
    C_max = max(-(-C_max // K) * K, K)
    vals, qidx, meta, steps = [], [], [], []
    G_max = C_max // K
    # depth is a static kernel arg shared SPMD-wide; dist plans are
    # built with allow_relax=False, so only depth-8 contig qualifies
    word_ok = all(
        p.nnz == 0
        or (
            p.window_depth == 8
            and word_eligible(
                np.asarray(p.meta), contig=p.windows_contig,
                depth=p.window_depth,
                tiles_per_block=p.tiles_per_block,
            )
        )
        for p in plans
    )
    for p in plans:
        pad = C_max - p.num_chunks
        # streams are 2-D (C*8, 128): pad whole 8-row chunk slabs
        vals.append(np.pad(p.vals, ((0, pad * 8), (0, 0))))
        qidx.append(np.pad(p.packed, ((0, pad * 8), (0, 0))))
        if word_ok:
            w = np.asarray(meta_word(np.asarray(p.meta)), np.int32)
            fill = int(w[-1]) if len(w) else 0
            meta.append(np.pad(w, (0, pad), constant_values=fill))
        else:
            meta.append(np.pad(p.meta, ((0, pad), (0, 0))))
        sb = p.step_block
        last = sb[-1] if len(sb) else 0
        steps.append(np.pad(sb, (0, G_max - len(sb)), constant_values=last))
    return (np.stack(vals), np.stack(qidx), np.stack(meta), np.stack(steps))


class DistSpDMV:
    """Mesh-parallel SpDMV functor (the multi-chip ``SpDMV`` analog).

    Construction = preprocessing (partition + per-shard planning + device
    placement), call = y = A @ x, mirroring the reference kernel API
    (``sparse_kernel.hpp:17-27``) at pod scale.
    """

    def __init__(self, A, mesh, *, dtype=np.float32, dia_min_count=None,
                 comm: str = "auto", assign: str = "contiguous"):
        from ..formats.sdia import SDIA_MIN_COUNT
        from ..matrix import SparseMatrix

        csr = A.csr if isinstance(A, SparseMatrix) else A
        self.dia_min_count = (
            SDIA_MIN_COUNT if dia_min_count is None else dia_min_count
        )
        if comm not in ("auto", "gather", "ring", "halo"):
            raise ValueError(
                "comm must be 'auto', 'gather', 'ring' or 'halo', "
                f"got {comm}"
            )
        if assign not in ("contiguous", "cluster"):
            raise ValueError(
                f"assign must be 'contiguous' or 'cluster', got {assign}"
            )
        if csr.ncols != csr.nrows:
            # x is distributed by the ROW partition; a rectangular x has
            # no owner for columns beyond nrows
            raise NotImplementedError(
                "DistSpDMV requires a square matrix (row-partitioned x); "
                f"got {csr.nrows}x{csr.ncols}"
            )
        #: halo strategy for the far stream:
        #: - "halo": TWO neighbor ppermutes exchange only the H boundary
        #:   rows each side (H = max column overhang of any shard's far
        #:   entries, 128-aligned); the far plans are built in window
        #:   coordinates [r0-H, r1+H). The comm volume is 2*H*4 B per
        #:   device INDEPENDENT of device count — this is what makes
        #:   banded structures weak-scale across DCN host boundaries
        #:   (full-x schemes move seg_bytes*(ndev-1); see
        #:   parallel/scaling.py).
        #: - "gather": one all_gather of the whole x;
        #: - "ring": ndev ppermute rotations of the local x segment,
        #:   each overlapped with the far sub-stream that consumes it
        #:   (the overlapped-halo-exchange structure of BASELINE
        #:   config 4 for structures whose halo spans everything);
        #: - "auto" (default): "halo" when ndev > 1 and H fits within
        #:   one neighbor segment, else "gather".
        self.comm = comm
        self.halo_rows = 0
        self.mesh = mesh
        self.ndev = mesh.shape[ROWS_AXIS]
        self.nrows = csr.nrows
        self.ncols = csr.ncols
        self.symmetric = csr.symmetric
        self.dtype = np.dtype(dtype)

        #: locality-aware assignment (METIS analog, tuning/cluster.py):
        #: greedy tile clustering permutes rows so that the contiguous
        #: equal-nnz shards cut fewer edges — shrinking the far stream,
        #: the only stream that communicates
        self.perm = None
        self._iperm = None
        if assign == "cluster" and csr.nnz:
            from ..tuning.cluster import choose_cluster_assignment

            res = choose_cluster_assignment(csr, self.ndev)
            if res is not None:
                self.perm, csr = res
                self._iperm = np.empty_like(self.perm)
                self._iperm[self.perm] = np.arange(len(self.perm))

        T = max(1, -(-csr.nrows // LANES))
        # output-block size adapts down for tiny (test) matrices
        tiles_per_dev = max(1, T // max(self.ndev, 1))
        self.BT = 8
        while self.BT * 2 <= min(128, tiles_per_dev):
            self.BT *= 2
        self.K = 16 if T < 64 else 128

        if csr.symmetric:
            self._init_symmetric(csr)
        else:
            self._init_general(csr)
        self._place()
        self._fn = self._build()

    # ------------------------------------------------------------------
    def _build_ring_far(self, entries):
        """Ring-mode far streams: ``entries[d] = (local_row, global_col,
        val)``. Returns one stacked accumulating BELL2 stream per ring
        step k; slice [k][d] holds shard d's entries whose columns live
        on device (d + k) % ndev, in that device's local coordinates —
        so step k of the rotation applies them against the x segment
        just received."""
        self.K_ring = min(self.K, 32)
        per_k = [[None] * self.ndev for _ in range(self.ndev)]
        starts = np.array([self.real[e][0] for e in range(self.ndev)],
                          dtype=np.int64)
        ends = starts + np.array(
            [self.real[e][1] for e in range(self.ndev)], dtype=np.int64
        )
        for d in range(self.ndev):
            lr, gc, v = entries[d]
            # one-pass bucketing by column-owner device (was: ndev full
            # boolean-mask passes per shard — quadratic in device count):
            # stable sort by owner keeps the original entry order within
            # each bucket, so the per-step plans are bit-identical
            owner = np.searchsorted(ends, gc, side="right")
            order = np.argsort(owner, kind="stable")
            so = owner[order]
            cuts = np.searchsorted(so, np.arange(self.ndev + 1))
            lro, gco, vo = lr[order], gc[order], v[order]
            for k in range(self.ndev):
                e = (d + k) % self.ndev
                lo, hi = cuts[e], cuts[e + 1]
                c0 = starts[e]
                from ..formats.bell2 import build_bell2_from_arrays

                # raw triples straight into the slot packer (same
                # rationale as the halo/gather far build: the unit
                # pipeline is ~40x slower on dense far diagonals)
                per_k[k][d] = build_bell2_from_arrays(
                    self.shard_rows, self.shard_rows,
                    lro[lo:hi].astype(np.int32),
                    (gco[lo:hi] - c0).astype(np.int32),
                    np.asarray(vo[lo:hi], self.dtype),
                    dtype=self.dtype,
                    chunks_per_step=self.K_ring, tiles_per_block=self.BT,
                    cover_all_tiles=False,
                    # run length is a static kernel arg shared SPMD-wide
                    allow_runs=False, allow_relax=False, force_slot=True,
                )
        return tuple(
            _pad_bell2(per_k[k], self.dtype) for k in range(self.ndev)
        )

    # ------------------------------------------------------------------
    def _halo_pregate(self, row, col, T, bt_align=1):
        """Uniform row partition for halo comm, or None.

        The halo exchange's static neighbor slices require globally
        contiguous segments: every shard except the last must hold
        exactly ``shard_rows`` real rows, so halo mode switches the
        partitioner from equal-nnz to UNIFORM tiles (banded matrices —
        the shapes halo mode exists for — have near-uniform nnz/row, so
        the balance cost is small). Viability is pre-gated on the
        matrix bandwidth: the window overhang H never exceeds
        max|col - row|, so bw <= one uniform segment guarantees the
        exact H computed later fits too."""
        if self.comm not in ("auto", "halo") or self.ndev <= 1:
            return None
        if not len(row):
            return None
        bw = int(
            np.max(np.abs(col.astype(np.int64) - row.astype(np.int64)))
        )
        Tu = -(-T // self.ndev)
        Tu = -(-Tu // bt_align) * bt_align
        if -(-bw // LANES) * LANES > Tu * LANES:
            return None
        self._halo_ok = True
        return np.minimum(
            np.arange(self.ndev + 1, dtype=np.int64) * Tu, T
        )

    # ------------------------------------------------------------------
    def _resolve_comm(self, H_need: int) -> None:
        """Pick the halo strategy once the far column overhang is known
        (``H_need`` = max rows any shard's far/x window extends past its
        own segment, both directions)."""
        from ..utils.logging import info

        if self.comm == "ring":
            return
        H = max(0, -(-int(H_need) // LANES) * LANES)
        fits = (
            self.ndev > 1
            and H <= self.shard_rows
            and getattr(self, "_halo_ok", False)
        )
        if self.comm == "halo" and not fits:
            from ..utils.logging import warn

            warn(
                "dist: halo comm requested but the far window (%d rows)"
                " exceeds one neighbor segment (%d) or ndev == 1 — "
                "falling back to gather", H, self.shard_rows,
            )
            self.comm = "gather"
            return
        if self.comm == "auto":
            self.comm = "halo" if fits else "gather"
        if self.comm == "halo":
            self.halo_rows = H
            info(
                "dist: halo comm (H=%d rows = %.1f KB/device vs "
                "%.1f KB full-x)", H, 2 * H * 4 / 1024,
                (self.ndev - 1) * self.shard_rows * 4 / 1024,
            )

    # ------------------------------------------------------------------
    def _init_general(self, csr: CSR):
        T = max(1, -(-csr.nrows // LANES))
        bounds = None
        if self.comm in ("auto", "halo") and self.ndev > 1:
            # O(nnz) row stream only when the pregate can actually use
            # it (comm='ring'/'gather' or 1 device skip it entirely)
            row0 = np.repeat(
                np.arange(csr.nrows, dtype=np.int64), np.diff(csr.indptr)
            )
            bounds = self._halo_pregate(row0, csr.indices, T)
            del row0
        if bounds is None:
            bounds = shard_csr_rows(csr, self.ndev, align_tiles=1)
        T_max = max(1, max(int(bounds[d + 1] - bounds[d]) for d in range(self.ndev)))
        self.shard_rows = T_max * LANES
        self.nnz_full = csr.nnz
        self.bounds = bounds
        self.real = [
            (min(int(bounds[d]) * LANES, csr.nrows),
             min(int(bounds[d + 1]) * LANES, csr.nrows)
             - min(int(bounds[d]) * LANES, csr.nrows))
            for d in range(self.ndev)
        ]
        rl_all = np.diff(csr.indptr)
        row_all = np.repeat(np.arange(csr.nrows, dtype=np.int64), rl_all)
        own = np.searchsorted(
            np.array([self.real[d][0] + self.real[d][1]
                      for d in range(self.ndev)], dtype=np.int64),
            row_all, side="right",
        )
        colo = np.searchsorted(
            np.array([self.real[d][0] + self.real[d][1]
                      for d in range(self.ndev)], dtype=np.int64),
            csr.indices.astype(np.int64), side="right",
        )
        #: nonzeros whose x column lives on another device — the only
        #: traffic that rides the interconnect (halo volume diagnostic)
        self.far_nnz = int(np.count_nonzero(own != colo))
        if self.comm == "ring":
            entries = []
            for d in range(self.ndev):
                r0, nr = self.real[d]
                shard = _slice_csr_rows(csr, r0, r0 + nr, self.shard_rows)
                lr = np.repeat(
                    np.arange(self.shard_rows, dtype=np.int64),
                    np.diff(shard.indptr),
                )
                entries.append(
                    (lr, shard.indices.astype(np.int64), shard.data)
                )
            self._far = self._build_ring_far(entries)
            self._x_rows_full = self.shard_rows // LANES
        else:
            shards = []
            H_need = 0
            for d in range(self.ndev):
                r0, nr = self.real[d]
                shard = _slice_csr_rows(csr, r0, r0 + nr, self.shard_rows)
                shard.symmetric = False
                if len(shard.indices):
                    c = shard.indices
                    H_need = max(
                        H_need,
                        int(r0 - c.min()),
                        int(c.max()) + 1 - (r0 + self.shard_rows),
                    )
                shards.append((r0, shard))
            self._resolve_comm(H_need)
            plans = []
            for r0, shard in shards:
                if self.comm == "halo":
                    H = self.halo_rows
                    shard = CSR(
                        shard.nrows, self.shard_rows + 2 * H,
                        shard.indptr,
                        shard.indices - np.int64(r0 - H),
                        shard.data, False,
                    )
                plans.append(
                    build_bell2_plan(
                        shard, dtype=self.dtype,
                        chunks_per_step=self.K, tiles_per_block=self.BT,
                        allow_runs=False, allow_relax=False,
                        # slot packer directly: the unit pipeline is
                        # ~40x slower on dense far/stencil diagonals
                        force_slot=True,
                    )
                )
            self._far = _pad_bell2(plans, self.dtype)
            # max over plans: empty shard plans keep an unclamped (< 8
            # rows) x_rows, but the word kernels load 8-row slabs
            self._x_rows_full = max(max(p.x_rows for p in plans), 8)
        self._far_tiles = T_max
        self._paired = None
        self._diag = None

    # ------------------------------------------------------------------
    # ------------------------------------------------------------------
    def _select_union_dia(self, union):
        """Shared dense-diagonal selection for the shard split paths:
        sets dia_offsets/_dia_pos/dia_mirror from the per-shard union
        counts and returns (Du, Dk, R_loc, dmap_arr)."""
        import os as _os

        from ..formats.sdia import BLOCK_ROWS, SDIA_MAX_D
        from ..ops.sdia_kernel import _blocks_per_step

        # over-full union: keep the heaviest-count offsets (mirrors
        # extract_sdia's heaviest-first truncation; keeping the smallest
        # offsets instead could park the densest diagonals on the far
        # stream)
        keep = sorted(union, key=lambda o: (-union[o], o))[:SDIA_MAX_D]
        self.dia_offsets = tuple(sorted(keep))
        # the shard SDIA kernel keeps the whole shard y (+x) resident in
        # VMEM; past ~4M rows/shard that allocation exceeds the remote
        # AOT compiler's scoped-vmem cap (measured: nlpkkt-scale at
        # ndev=1, f32[65410,128] > the 16 MB scoped limit). Shards that
        # big store MIRRORED (+d, -d) planes on the x/y-SEGMENTED
        # blocked-y kernel instead (sdia_gen_tiles) — 2x value traffic
        # but bounded per-segment VMEM, exactly like the single-chip
        # >10M-row path (formats/sdia.py mirror mode). Env
        # CFS_DIST_SDIA_ROWS_MAX overrides.
        rows_max = int(
            _os.environ.get("CFS_DIST_SDIA_ROWS_MAX", 5_000_000)
        )
        self.dia_mirror = bool(
            self.dia_offsets and self.shard_rows > rows_max
        )
        self._dia_pos = self.dia_offsets
        if self.dia_mirror:
            info(
                "dist: shard_rows=%d exceeds the whole-y SDIA gate "
                "(%d): mirrored segmented SDIA", self.shard_rows,
                rows_max,
            )
            self.dia_offsets = self._dia_pos + tuple(
                -o for o in self._dia_pos
            )
        Du = len(self._dia_pos)
        Dk = len(self.dia_offsets)  # kernel planes (2*Du when mirrored)
        R_loc = -(-self.shard_rows // BLOCK_ROWS)
        if Dk:
            RB = _blocks_per_step(R_loc, Dk)
            R_loc = -(-R_loc // RB) * RB
        dmap_arr = np.full(self.shard_rows, -1, np.int32)
        for jj, o in enumerate(self._dia_pos):
            dmap_arr[o] = jj
        return Du, Dk, R_loc, dmap_arr

    # ------------------------------------------------------------------
    def _shard_paired_plan(self, nr_, nc_, nv_):
        """Paired SBELL plan for one shard's near residual (local
        coordinates). Shard SDIA is handled by the caller with union
        offsets; relaxed layouts are per-plan static kernel configs and
        SPMD stacks shard streams into ONE program, hence dia=False /
        allow_relax=False."""
        ncoo = COO(
            self.shard_rows, self.shard_rows,
            np.ascontiguousarray(nr_, np.int32),
            np.ascontiguousarray(nc_, np.int32),
            np.ascontiguousarray(nv_, self.dtype),
            symmetric=True,
        )
        return build_sbell_plan(
            CSR.from_coo(ncoo), dtype=self.dtype,
            chunks_per_step=self.K, tiles_per_block=self.BT,
            transpose_windows=2, dia=False, allow_relax=False,
        )

    # ------------------------------------------------------------------
    def _native_sym_split(self, lower, r_starts, r_ends):
        """Native two-pass shard split (csrc cfs_dist_sym_count/_fill).

        Returns (paired_plans, far_raw, dia_big, H_need) or None when
        the native library is unavailable (the caller then runs
        ``_numpy_sym_split``, which produces bit-identical outputs —
        differential-tested in tests/test_native.py)."""
        from .. import native as _native
        from ..formats.sdia import SDIA_FILL

        n = lower.nrows
        NB = self.BT * LANES
        nat = _native.dist_sym_count(
            lower.indptr, lower.indices, n, self.ndev, r_ends, NB,
            self.shard_rows,
        )
        if nat is None:
            return None
        off_cnt, cnt_near, cnt_far, cnt_mirror, cross = nat
        self.far_nnz = 2 * cross

        # union of qualifying dense diagonals (offsets are STATIC in
        # the kernel trace, so the SPMD program needs one shared tuple;
        # zero-filled planes cover shards missing a diagonal) — per-
        # shard thresholds identical to the NumPy path
        union: dict[int, int] = {}
        for d in range(self.ndev):
            cf = off_cnt[d]
            uniq = np.flatnonzero(cf)
            cnt = cf[uniq]
            length = np.maximum(self.shard_rows - uniq, 1)
            ok = (uniq > 0) & (cnt >= self.dia_min_count) & (
                cnt >= SDIA_FILL * length
            )
            for o, c in zip(uniq[ok], cnt[ok]):
                union[int(o)] = union.get(int(o), 0) + int(c)
        Du, Dk, R_loc, dmap_arr = self._select_union_dia(union)

        if Du:
            sel = np.array(self._dia_pos, np.int64)
            absorbed = off_cnt[:, sel].sum(axis=1)
        else:
            absorbed = np.zeros(self.ndev, np.int64)
        n_near = cnt_near - absorbed
        near_base = np.concatenate([[0], np.cumsum(n_near)])
        far_base = np.concatenate([[0], np.cumsum(cnt_far)])
        mir_base = np.concatenate([[0], np.cumsum(cnt_mirror)])
        tot_n, tot_f, tot_m = (
            int(near_base[-1]), int(far_base[-1]), int(mir_base[-1])
        )
        near_r = np.empty(max(tot_n, 1), np.int32)
        near_c = np.empty(max(tot_n, 1), np.int32)
        near_v = np.empty(max(tot_n, 1), self.dtype)
        far_r = np.empty(max(tot_f, 1), np.int32)
        far_c = np.empty(max(tot_f, 1), np.int32)
        far_v = np.empty(max(tot_f, 1), self.dtype)
        mir_r = np.empty(max(tot_m, 1), np.int32)
        mir_c = np.empty(max(tot_m, 1), np.int32)
        mir_v = np.empty(max(tot_m, 1), self.dtype)
        dia_big = (
            np.zeros((self.ndev, R_loc, Dk, 8, LANES), self.dtype)
            if Du else None
        )
        data_c = np.ascontiguousarray(np.asarray(lower.data, self.dtype))
        if not _native.dist_sym_fill(
            lower.indptr, lower.indices, data_c, n, self.ndev,
            r_starts, r_ends, NB, self.shard_rows, dmap_arr, Dk, Du,
            self.dia_mirror, R_loc,
            near_base[:-1], far_base[:-1], mir_base[:-1],
            near_r, near_c, near_v, far_r, far_c, far_v,
            mir_r, mir_c, mir_v, dia_big,
        ):
            return None

        paired_plans, far_raw = [], []
        H_need = 0
        for d in range(self.ndev):
            r0, _ = self.real[d]
            sn = slice(near_base[d], near_base[d + 1])
            paired_plans.append(
                self._shard_paired_plan(near_r[sn], near_c[sn],
                                        near_v[sn])
            )
            sf = slice(far_base[d], far_base[d + 1])
            sm = slice(mir_base[d], mir_base[d + 1])
            lr = np.concatenate(
                [far_r[sf], mir_r[sm]]
            ).astype(np.int64)
            mc = np.concatenate(
                [far_c[sf], mir_c[sm]]
            ).astype(np.int64)
            mv = np.concatenate([far_v[sf], mir_v[sm]])
            far_raw.append((r0, lr, mc, mv))
            if len(mc):
                H_need = max(
                    H_need,
                    int(r0 - mc.min()),
                    int(mc.max()) + 1 - (r0 + self.shard_rows),
                )
        return paired_plans, far_raw, dia_big, H_need

    # ------------------------------------------------------------------
    def _numpy_sym_split(self, lower, r_starts, r_ends):
        """NumPy shard split (fallback when the native library is
        absent; bit-identical outputs to ``_native_sym_split``)."""
        BT = self.BT
        row = np.repeat(
            np.arange(lower.nrows, dtype=np.int64), np.diff(lower.indptr)
        )
        col = lower.indices.astype(np.int64)
        val = np.asarray(lower.data)
        tile = row >> 7
        seg = col >> 7
        near = (tile // BT) == (seg // BT)

        # --- one-pass owner bucketing (r1 advice, mirrored from the
        # ring path): the row stream is CSR-sorted, so each shard's
        # row range is a searchsorted slice; the mirror image is
        # bucketed ONCE by column owner with a stable argsort. The old
        # code evaluated full-stream boolean masks per device (the
        # mirror mask three times) — O(ndev * nnz) host work. ---------
        row_lo = np.searchsorted(row, r_starts)
        row_hi = np.searchsorted(row, r_ends)

        # --- per-shard near entries in local coordinates --------------
        shard_near = []
        for d in range(self.ndev):
            r0 = r_starts[d]
            sl = slice(row_lo[d], row_hi[d])
            ns = near[sl]
            shard_near.append(
                ((row[sl][ns] - r0), (col[sl][ns] - r0), val[sl][ns])
            )

        # --- union of qualifying dense diagonals (offsets are STATIC in
        # the kernel trace, so the SPMD program needs one shared tuple;
        # zero-filled planes cover shards missing a diagonal) -----------
        from ..formats.sdia import SDIA_FILL, SDIA_MAX_D

        union: dict[int, int] = {}  # offset -> total count across shards
        for nr_, nc_, _ in shard_near:
            if not len(nr_):
                continue
            offd = nr_ - nc_
            # bounded-key bincount instead of np.unique's full sort
            # (near offsets are strict-lower within one shard window)
            cnt_full = np.bincount(offd, minlength=self.shard_rows)
            uniq = np.flatnonzero(cnt_full)
            cnt = cnt_full[uniq]
            length = np.maximum(self.shard_rows - uniq, 1)
            ok = (uniq > 0) & (cnt >= self.dia_min_count) & (
                cnt >= SDIA_FILL * length
            )
            for o, c in zip(uniq[ok], cnt[ok]):
                union[int(o)] = union.get(int(o), 0) + int(c)
        Du, Dk, R_loc, dmap_arr = self._select_union_dia(union)

        # halo diagnostic: entries (either image) whose x column lives
        # on another device
        ro = np.searchsorted(r_ends, row, side="right")
        co = np.searchsorted(r_ends, col, side="right")
        self.far_nnz = 2 * int(np.count_nonzero(ro != co))

        # mirror image (col, row, val) of far entries, bucketed once by
        # column owner (stable: per-shard order matches the old masked
        # gathers, so plans stay bit-identical)
        mi = np.flatnonzero(~near)
        morder = mi[np.argsort(co[mi], kind="stable")]
        mcuts = np.concatenate(
            [[0], np.cumsum(np.bincount(co[mi], minlength=self.ndev))]
        ).astype(np.int64)

        paired_plans, far_raw, dia_vals = [], [], []
        H_need = 0
        from ..formats.sdia import BLOCK_ROWS
        from .. import native as _native

        for d in range(self.ndev):
            r0, nr = self.real[d]
            nr_, nc_, nv_ = shard_near[d]
            if Du:
                # vectorized offset -> plane map (the former per-entry
                # Python dict lookup dominated full-scale preprocessing)
                j_all = dmap_arr[nr_ - nc_]
                on_dia = j_all >= 0
                dv = np.zeros((R_loc, Dk, 8, LANES), self.dtype)
                g = nr_[on_dia].astype(np.int64)
                j = j_all[on_dia]
                v_dia = np.ascontiguousarray(nv_[on_dia], self.dtype)
                if not _native.assemble_sdia(g, j, 0, Dk, v_dia, dv):
                    dv[g // BLOCK_ROWS, j,
                       (g // LANES) % 8, g % LANES] = v_dia
                if self.dia_mirror:
                    # the -d plane: same values scattered by COLUMN
                    gc = nc_[on_dia].astype(np.int64)
                    if not _native.assemble_sdia(
                        gc, j, Du, Dk, v_dia, dv
                    ):
                        dv[gc // BLOCK_ROWS, Du + j,
                           (gc // LANES) % 8, gc % LANES] = v_dia
                dia_vals.append(dv)
                nr_, nc_, nv_ = nr_[~on_dia], nc_[~on_dia], nv_[~on_dia]
            sl = slice(row_lo[d], row_hi[d])
            fr_d = row[sl][~near[sl]]
            fc_d = col[sl][~near[sl]]
            fv_d = val[sl][~near[sl]]
            md = morder[mcuts[d]:mcuts[d + 1]]
            paired_plans.append(self._shard_paired_plan(nr_, nc_, nv_))
            # far: local rows, global cols, one-sided — this shard owns
            # rows of both mirror images that fall in [r0, r1)
            mr = np.concatenate([fr_d, col[md]])
            mc = np.concatenate([fc_d, row[md]])
            mv = np.concatenate([fv_d, val[md]])
            far_raw.append((r0, (mr - r0).astype(np.int64),
                            mc.astype(np.int64), mv))
            if len(mc):
                H_need = max(
                    H_need,
                    int(r0 - mc.min()),
                    int(mc.max()) + 1 - (r0 + self.shard_rows),
                )

        dia_big = np.stack(dia_vals) if dia_vals else None
        return paired_plans, far_raw, dia_big, H_need

    def _init_symmetric(self, csr: CSR):
        lower, diag, _ = csr.split_triangle()
        rowlen = np.diff(lower.indptr)
        row = np.repeat(np.arange(csr.nrows, dtype=np.int64), rowlen)
        self.nnz_full = 2 * len(row) + int(np.count_nonzero(diag))

        # balance on total work per tile (both triangles); halo comm
        # (viable for banded structure) switches to uniform tiles — its
        # static neighbor slices need contiguous equal segments
        T = max(1, -(-csr.nrows // LANES))
        BT = self.BT
        bounds = self._halo_pregate(row, lower.indices, T, bt_align=BT)
        # the int64 row stream (1 GB at nlpkkt scale) served only the
        # pregate; the native split works off the CSR directly and this
        # host's fast-backed RAM is capacity-limited (CLAUDE.md) — free
        # it before the split (the NumPy fallback rebuilds it)
        del row
        if bounds is None:
            hist = tile_nnz_histogram(lower.indptr, T)
            histT = np.zeros(T, np.int64)
            np.add.at(histT, lower.indices >> 7, 1)
            bounds = partition_tiles_by_nnz(hist + histT, self.ndev)
            bounds = (np.round(bounds / BT) * BT).astype(np.int64)
            np.maximum.accumulate(bounds, out=bounds)
            bounds = np.minimum(bounds, -(-csr.nrows // LANES))
            bounds[0] = 0
            bounds[-1] = -(-csr.nrows // LANES)
        self.bounds = bounds

        T_max = max(1, max(int(bounds[d + 1] - bounds[d]) for d in range(self.ndev)))
        self.shard_rows = T_max * LANES
        self.real = [
            (min(int(bounds[d]) * LANES, csr.nrows),
             min(int(bounds[d + 1]) * LANES, csr.nrows)
             - min(int(bounds[d]) * LANES, csr.nrows))
            for d in range(self.ndev)
        ]

        r_starts = np.array(
            [self.real[d][0] for d in range(self.ndev)], np.int64
        )
        r_ends = r_starts + np.array(
            [self.real[d][1] for d in range(self.ndev)], np.int64
        )
        # shard split: one native counting pass + one native fill pass
        # (csrc cfs_dist_sym_count/_fill) replace the ~15 full NumPy
        # passes of the per-shard masks/gathers/per-entry dict lookups
        # that made DistSpDMV planning 77-90x the single-chip tune() at
        # full scale (VERDICT r4 missing #3)
        res = self._native_sym_split(lower, r_starts, r_ends)
        if res is None:
            res = self._numpy_sym_split(lower, r_starts, r_ends)
        paired_plans, far_raw, dia_big, H_need = res
        # the lower CSR (1.4 GB at nlpkkt scale) is consumed; free it
        # before the far-plan sorts/packs so the live set stays under
        # this host's fast-backed-RAM ceiling
        del lower
        diags = []
        for d in range(self.ndev):
            r0, nr = self.real[d]
            dg = np.zeros(self.shard_rows, self.dtype)
            dg[:nr] = diag[r0:r0 + nr]
            diags.append(dg)

        self._resolve_comm(H_need)
        far_plans = []
        for r0, lr, gc, mv in far_raw:
            if self.comm == "ring":
                far_plans.append((lr, gc, mv))
                continue
            if self.comm == "halo":
                H = self.halo_rows
                gc = gc - (r0 - H)
                ncols_w = self.shard_rows + 2 * H
            else:
                ncols_w = csr.ncols
            # raw triples straight into the slot packer: the unit
            # pipeline measured 44 s on a 2.1M-row stencil's far stream
            # (the g^2 diagonals cross NB blocks, so ~2/13 of a 27-pt
            # stencil's entries land far) while the native slot pack is
            # ~1 s — and skipping canonicalize+CSR saves two more full
            # sorts (entries are unique by construction)
            from ..formats.bell2 import build_bell2_from_arrays

            far_plans.append(
                build_bell2_from_arrays(
                    self.shard_rows, ncols_w,
                    lr.astype(np.int32), gc.astype(np.int32),
                    np.asarray(mv, self.dtype), dtype=self.dtype,
                    chunks_per_step=self.K, tiles_per_block=self.BT,
                    allow_runs=False, allow_relax=False, force_slot=True,
                )
            )

        # stack paired streams
        K = self.K
        C_max = max(p.num_chunks for p in paired_plans)
        C_max = max(-(-C_max // K) * K, K)
        G_max = C_max // K
        pv, pp, pm, ps = [], [], [], []
        for p in paired_plans:
            pad = C_max - p.num_chunks
            pv.append(np.pad(p.vals, ((0, pad * 8), (0, 0))))
            pp.append(np.pad(p.packed, ((0, pad * 8), (0, 0))))
            # padding chunk segs must stay in-block for the transpose
            # store: use the last step's block start as sentinel
            mpad = np.zeros((pad, META_W), np.int32)
            if pad:
                last_blk = p.step_block[-1] if len(p.step_block) else 0
                mpad[:, 2:] = last_blk * self.BT
            pm.append(np.concatenate([p.meta, mpad]))
            sb = p.step_block
            last = sb[-1] if len(sb) else 0
            ps.append(np.pad(sb, (0, G_max - len(sb)), constant_values=last))
            # the paired plan's internal far residual (greedy leftovers)
            # stays a separate local one-sided stream
        self._dia = dia_big
        self._paired = (np.stack(pv), np.stack(pp), np.stack(pm), np.stack(ps))
        self._paired_far = [p.far for p in paired_plans]
        if self.comm == "ring":
            self._far = self._build_ring_far(far_plans)
            self._x_rows_full = self.shard_rows // LANES
        else:
            self._far = _pad_bell2(far_plans, self.dtype)
            self._x_rows_full = max(
                max(p.x_rows for p in far_plans), 8
            )
        self._far_tiles = T_max
        self._diag = np.stack(diags)

        # stack paired-internal far residuals (local coords) if any
        if any(f is not None for f in self._paired_far):
            residuals = [
                f if f is not None else _empty_like_bell2(
                    self.shard_rows, self.shard_rows, self.dtype,
                    self.K, self.BT,
                )
                for f in self._paired_far
            ]
            self._pfar = _pad_bell2(residuals, self.dtype)
        else:
            self._pfar = None

    # ------------------------------------------------------------------
    def _place(self):
        sharded = NamedSharding(self.mesh, P(ROWS_AXIS))

        def put(arrs):
            return tuple(
                jax.device_put(jnp.asarray(a), sharded) for a in arrs
            )

        if self.comm == "ring":
            self._far = tuple(put(t) for t in self._far)
        else:
            self._far = put(self._far)
        if self._paired is not None:
            self._paired = put(self._paired)
        if getattr(self, "_pfar", None) is not None:
            self._pfar = put(self._pfar)
        if getattr(self, "_dia", None) is not None:
            (self._dia,) = put((self._dia,))
        if self._diag is not None:
            (self._diag,) = put((self._diag,))

    # ------------------------------------------------------------------
    def _build(self):
        from ..ops.bell2_kernel import (
            bell2_spmv_tiles,
            bell2_spmv_tiles_accum,
            sbell_spmv_tiles,
        )
        from ..ops.sdia_kernel import sdia_gen_tiles, sdia_sym_tiles
        from ..ops.spmv import use_interpret

        ndev = self.ndev
        S = self.shard_rows
        n = self.nrows
        interpret = use_interpret()
        sym = self._paired is not None
        real = self.real
        K, BT = self.K, self.BT
        K_ring = getattr(self, "K_ring", K)
        ring = self.comm == "ring"
        halo = self.comm == "halo"
        H = self.halo_rows
        T_loc = self._far_tiles
        x_rows_full = self._x_rows_full
        x_rows_loc = S // LANES
        pfar = getattr(self, "_pfar", None)
        dia = getattr(self, "_dia", None)
        dia_offsets = getattr(self, "dia_offsets", ())
        dtype = self.dtype

        def one_sided(arrs, x2d, tiles):
            vals, qidx, meta, steps = (a[0] for a in arrs)
            out = bell2_spmv_tiles(
                vals, qidx, meta, steps, x2d,
                num_row_tiles=tiles, chunks_per_step=K,
                tiles_per_block=BT, interpret=interpret,
            )
            return out.reshape(-1)[:S]

        # word-path kernels load 8-row x slabs: tiny shards pad up
        xr_loc = max(x_rows_loc, 8)

        def shard_fn(far, paired, pfar_arrs, dia_v, diag, x_sh):
            x_loc = x_sh[0]
            x2d_loc = jnp.pad(
                x_loc, (0, xr_loc * LANES - x_loc.shape[0])
            ).reshape(xr_loc, LANES)
            y = jnp.zeros((S,), x_loc.dtype)
            if sym:
                pv, pp, pm, ps = (a[0] for a in paired)
                tiles = sbell_spmv_tiles(
                    pv, pp, pm, ps, x2d_loc,
                    num_row_tiles=T_loc, chunks_per_step=K,
                    tiles_per_block=BT, transpose_windows=2,
                    interpret=interpret,
                )
                if dia_v is not None:
                    dia_fn = (
                        sdia_gen_tiles
                        if any(o < 0 for o in dia_offsets)
                        else sdia_sym_tiles
                    )
                    tiles = dia_fn(
                        dia_v[0], x2d_loc, tiles,
                        offsets=dia_offsets, interpret=interpret,
                    )
                y = y + diag[0] * x_loc
                if pfar_arrs is not None:
                    y = y + one_sided(pfar_arrs, x2d_loc, T_loc)
            else:
                tiles = jnp.zeros((T_loc, LANES), dtype)

            if ring:
                # rotate x segments around the ring; each arriving
                # segment is consumed by the far sub-stream holding the
                # columns that segment owns — compute overlaps the next
                # permute (async collectives)
                TP = -(-T_loc // BT) * BT
                tp = jnp.pad(tiles, ((0, TP - tiles.shape[0]), (0, 0)))
                xs = x_loc
                # the word-path kernels load 8-row x slabs: feed the
                # plan's x_rows (>= 8), not the raw segment tiles
                xr_ring = max(x_rows_loc, 8)
                for k in range(ndev):
                    vals, qidx, meta, steps = (a[0] for a in far[k])
                    x2d_k = jnp.pad(
                        xs, (0, xr_ring * LANES - xs.shape[0])
                    ).reshape(xr_ring, LANES)
                    tp = bell2_spmv_tiles_accum(
                        vals, qidx, meta, steps, x2d_k, tp,
                        num_row_tiles=T_loc, chunks_per_step=K_ring,
                        tiles_per_block=BT, interpret=interpret,
                    )
                    if k + 1 < ndev:
                        xs = jax.lax.ppermute(
                            xs, ROWS_AXIS,
                            [(i, (i - 1) % ndev) for i in range(ndev)],
                        )
                y = y + tp[:T_loc].reshape(-1)[:S]
            elif halo:
                # neighbor halo exchange: the far plans live in window
                # coordinates [r0-H, r1+H), so only 2*H boundary rows
                # move — comm volume independent of device count (the
                # multi-host weak-scaling design; wrap-around halos at
                # the mesh edges are never referenced: window positions
                # outside the matrix carry only zero-valued slots)
                y = y + tiles.reshape(-1)[:S]
                if H:
                    left = jax.lax.ppermute(
                        x_loc[S - H:], ROWS_AXIS,
                        [(i, (i + 1) % ndev) for i in range(ndev)],
                    )
                    right = jax.lax.ppermute(
                        x_loc[:H], ROWS_AXIS,
                        [(i, (i - 1) % ndev) for i in range(ndev)],
                    )
                    xw = jnp.concatenate([left, x_loc, right])
                else:
                    xw = x_loc
                # the far plan may demand >= window-depth x rows
                xw = jnp.pad(xw, (0, x_rows_full * LANES - xw.shape[0]))
                y = y + one_sided(
                    far, xw.reshape(x_rows_full, LANES), T_loc
                )
            else:
                # far/general stream needs full x: one all_gather
                y = y + tiles.reshape(-1)[:S]
                xg = jax.lax.all_gather(x_loc, ROWS_AXIS, tiled=False)
                parts = [xg[d, : real[d][1]] for d in range(ndev)]
                x_full = (
                    jnp.concatenate(parts)[:n] if ndev > 1 else parts[0]
                )
                pad_len = x_rows_full * LANES - x_full.shape[0]
                x2d_full = jnp.pad(x_full, (0, pad_len)).reshape(
                    x_rows_full, LANES
                )
                y = y + one_sided(far, x2d_full, T_loc)
            return y[None]

        in_specs = (
            P(ROWS_AXIS),
            P(ROWS_AXIS) if sym else None,
            P(ROWS_AXIS) if (sym and pfar is not None) else None,
            P(ROWS_AXIS) if (sym and dia is not None) else None,
            P(ROWS_AXIS) if sym else None,
            P(ROWS_AXIS),
        )
        smapped = shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=in_specs,
            out_specs=P(ROWS_AXIS),
            # pallas_call out_shapes carry no vma annotation
            check_vma=False,
        )

        @jax.jit
        def run(far, paired, pfar_a, dia_a, diag, x):
            segs = []
            xp = jnp.pad(x, (0, S))
            for d in range(ndev):
                r0, nr = real[d]
                seg = jax.lax.dynamic_slice_in_dim(xp, r0, S)
                segs.append(jnp.where(jnp.arange(S) < nr, seg, 0))
            x_sh = jnp.stack(segs)
            y_sh = smapped(far, paired, pfar_a, dia_a, diag, x_sh)
            outs = [y_sh[d, : real[d][1]] for d in range(ndev)]
            return jnp.concatenate(outs)[:n]

        return run

    # ------------------------------------------------------------------
    def _build_mm(self, B: int):
        """Multi-RHS variant of the distributed program (SpDMM at mesh
        scale — a capability the reference lacks). One compiled program
        per RHS count, cached."""
        from ..ops.bell2_kernel import (
            bell2_spmm_tiles,
            bell2_spmm_tiles_accum,
            sbell_spmm_tiles,
        )
        from ..ops.sdia_kernel import sdia_gen_tiles_mm, sdia_sym_tiles_mm
        from ..ops.spmv import use_interpret

        ndev = self.ndev
        S = self.shard_rows
        n = self.nrows
        interpret = use_interpret()
        sym = self._paired is not None
        real = self.real
        K, BT = self.K, self.BT
        K_ring = getattr(self, "K_ring", K)
        ring = self.comm == "ring"
        halo = self.comm == "halo"
        H = self.halo_rows
        T_loc = self._far_tiles
        x_rows_full = self._x_rows_full
        x_rows_loc = S // LANES
        dia_offsets = getattr(self, "dia_offsets", ())
        dtype = self.dtype

        def one_sided_mm(arrs, x3d, n_chunks_step):
            vals, qidx, meta, steps = (a[0] for a in arrs)
            out = bell2_spmm_tiles(
                vals, qidx, meta, steps, x3d,
                num_row_tiles=T_loc, chunks_per_step=n_chunks_step,
                tiles_per_block=BT, interpret=interpret,
            )
            return out.reshape(B, -1)[:, :S]

        xr_loc = max(x_rows_loc, 8)  # word kernels load 8-row x slabs

        def to3d(x_bs):  # (S, B) local segment -> (B, xr_loc, 128)
            return jnp.pad(
                x_bs, ((0, xr_loc * LANES - x_bs.shape[0]), (0, 0))
            ).T.reshape(B, xr_loc, LANES)

        def shard_fn(far, paired, pfar_arrs, dia_v, diag, x_sh):
            x_loc = x_sh[0]  # (S, B)
            x3d_loc = to3d(x_loc)
            y = jnp.zeros((B, S), x_loc.dtype)
            if sym:
                pv, pp, pm, ps = (a[0] for a in paired)
                tiles = sbell_spmm_tiles(
                    pv, pp, pm, ps, x3d_loc,
                    num_row_tiles=T_loc, chunks_per_step=K,
                    tiles_per_block=BT, transpose_windows=2,
                    interpret=interpret,
                )
                if dia_v is not None:
                    dia_fn_mm = (
                        sdia_gen_tiles_mm
                        if any(o < 0 for o in dia_offsets)
                        else sdia_sym_tiles_mm
                    )
                    tiles = dia_fn_mm(
                        dia_v[0], x3d_loc, tiles,
                        offsets=dia_offsets, interpret=interpret,
                    )
                y = y + diag[0][None, :] * x_loc.T
                if pfar_arrs is not None:
                    y = y + one_sided_mm(pfar_arrs, x3d_loc, K)
            else:
                tiles = jnp.zeros((B, T_loc, LANES), dtype)

            if ring:
                TP = -(-T_loc // BT) * BT
                tp = jnp.pad(
                    tiles, ((0, 0), (0, TP - tiles.shape[1]), (0, 0))
                )
                xs = x_loc
                xr_ring = max(x_rows_loc, 8)
                for k in range(ndev):
                    vals, qidx, meta, steps = (a[0] for a in far[k])
                    x3d_k = jnp.pad(
                        xs, ((0, xr_ring * LANES - xs.shape[0]), (0, 0))
                    ).T.reshape(B, xr_ring, LANES)
                    tp = bell2_spmm_tiles_accum(
                        vals, qidx, meta, steps, x3d_k, tp,
                        num_row_tiles=T_loc, chunks_per_step=K_ring,
                        tiles_per_block=BT, interpret=interpret,
                    )
                    if k + 1 < ndev:
                        xs = jax.lax.ppermute(
                            xs, ROWS_AXIS,
                            [(i, (i - 1) % ndev) for i in range(ndev)],
                        )
                y = y + tp[:, :T_loc].reshape(B, -1)[:, :S]
            elif halo:
                y = y + tiles.reshape(B, -1)[:, :S]
                if H:
                    left = jax.lax.ppermute(
                        x_loc[S - H:], ROWS_AXIS,
                        [(i, (i + 1) % ndev) for i in range(ndev)],
                    )
                    right = jax.lax.ppermute(
                        x_loc[:H], ROWS_AXIS,
                        [(i, (i - 1) % ndev) for i in range(ndev)],
                    )
                    xw = jnp.concatenate([left, x_loc, right])
                else:
                    xw = x_loc
                xw = jnp.pad(
                    xw, ((0, x_rows_full * LANES - xw.shape[0]), (0, 0))
                )
                y = y + one_sided_mm(
                    far, xw.T.reshape(B, x_rows_full, LANES), K
                )
            else:
                y = y + tiles.reshape(B, -1)[:, :S]
                xg = jax.lax.all_gather(x_loc, ROWS_AXIS, tiled=False)
                parts = [xg[d, : real[d][1]] for d in range(ndev)]
                x_full = (
                    jnp.concatenate(parts)[:n] if ndev > 1 else parts[0]
                )
                pad_len = x_rows_full * LANES - x_full.shape[0]
                x3d_full = jnp.pad(
                    x_full, ((0, pad_len), (0, 0))
                ).T.reshape(B, x_rows_full, LANES)
                y = y + one_sided_mm(far, x3d_full, K)
            return y[None]

        sym_spec = P(ROWS_AXIS) if sym else None
        in_specs = (
            P(ROWS_AXIS),
            sym_spec,
            P(ROWS_AXIS)
            if (sym and getattr(self, "_pfar", None) is not None)
            else None,
            P(ROWS_AXIS)
            if (sym and getattr(self, "_dia", None) is not None)
            else None,
            sym_spec,
            P(ROWS_AXIS),
        )
        smapped = shard_map(
            shard_fn, mesh=self.mesh, in_specs=in_specs,
            out_specs=P(ROWS_AXIS), check_vma=False,
        )

        @jax.jit
        def run(far, paired, pfar_a, dia_a, diag, x):
            segs = []
            xp = jnp.pad(x, ((0, S), (0, 0)))
            for d in range(ndev):
                r0, nr = real[d]
                seg = jax.lax.dynamic_slice_in_dim(xp, r0, S, axis=0)
                segs.append(
                    jnp.where(jnp.arange(S)[:, None] < nr, seg, 0)
                )
            x_sh = jnp.stack(segs)  # (ndev, S, B)
            y_sh = smapped(far, paired, pfar_a, dia_a, diag, x_sh)
            outs = [
                y_sh[d, :, : real[d][1]] for d in range(ndev)
            ]  # each (B, real rows)
            return jnp.concatenate(outs, axis=1)[:, :n].T

        return run

    def matmat(self, X):
        """Y = A @ X for X of shape (ncols, B)."""
        X = jnp.asarray(X, self.dtype)
        if X.ndim != 2 or X.shape[0] != self.ncols:
            raise ValueError(
                f"X must be ({self.ncols}, B), got {X.shape}"
            )
        B = int(X.shape[1])
        if not hasattr(self, "_fn_mm"):
            self._fn_mm = {}
        if B not in self._fn_mm:
            self._fn_mm[B] = self._build_mm(B)
        return self.decode(self._fn_mm[B](
            self._far, self._paired, getattr(self, "_pfar", None),
            getattr(self, "_dia", None), self._diag, self.encode(X),
        ))

    def __call__(self, x):
        x = jnp.asarray(x, self.dtype)
        if x.ndim == 2:
            return self.matmat(x)
        if x.shape != (self.ncols,):
            raise ValueError(f"x must be ({self.ncols},), got {x.shape}")
        fn, ops = self.pure_apply()
        return self.decode(fn(ops, self.encode(x)))

    # --- pure-apply protocol (see utils.timing.as_pure): operands flow
    # as jit arguments so solver/timing loops never embed the sharded
    # streams as module constants -------------------------------------
    def pure_apply(self):
        operands = (
            self._far, self._paired, getattr(self, "_pfar", None),
            getattr(self, "_dia", None), self._diag,
        )
        inner = self._fn

        def fn(ops, x):
            return inner(*ops, x)

        return fn, operands

    def pure_apply_mm(self):
        """Multi-RHS pure applier: (fn, operands) with fn(ops, X) for X
        of shape (ncols, B). The B-specific distributed program is built
        (and cached) at first trace — ``as_pure(dspmv, X)`` with a 2-D X
        times/composes real distributed SpMM, not the SpMV program."""
        operands = (
            self._far, self._paired, getattr(self, "_pfar", None),
            getattr(self, "_dia", None), self._diag,
        )

        def fn(ops, x):
            B = int(x.shape[1])
            if not hasattr(self, "_fn_mm"):
                self._fn_mm = {}
            if B not in self._fn_mm:
                self._fn_mm[B] = self._build_mm(B)
            return self._fn_mm[B](*ops, x)

        return fn, operands

    @property
    def far_fraction(self) -> float:
        """Fraction of logical nonzeros needing a remote x value — the
        halo volume that the weak-scaling model is gated on."""
        return self.far_nnz / max(self.nnz_full, 1)

    def encode(self, x):
        """User space → internal (cluster-permuted) space; identity when
        assign='contiguous' or clustering was rejected."""
        if self.perm is None:
            return x
        return jnp.take(jnp.asarray(x), jnp.asarray(self.perm), axis=0)

    def decode(self, y):
        if self.perm is None:
            return y
        return jnp.take(y, jnp.asarray(self._iperm), axis=0)


def _empty_like_bell2(nrows, ncols, dtype, K, BT):
    from ..formats.bell2 import build_bell2_plan as _b

    empty = CSR(
        nrows, ncols,
        np.zeros(nrows + 1, np.int64),
        np.zeros(0, np.int32),
        np.zeros(0, dtype),
        False,
    )
    return _b(empty, dtype=dtype, chunks_per_step=K, tiles_per_block=BT)
