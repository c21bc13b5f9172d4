"""Distributed SpMV over a device mesh.

TPU-native replacement for the reference's shared-memory thread
parallelism (OpenMP row ranges + conflict-free coloring,
``csr_matrix.tpp:403-541, 1204-1639``): matrix rows are sharded across
devices in contiguous 128-row-tile ranges balanced by nonzero count
(``partition_by_nnz`` analog, ``tpp:437-541``); each device runs the BELL
kernel on its shard against the full x vector obtained with one
``all_gather`` over the mesh — the collective replacement for the
reference's shared read-only x. Symmetric matrices shard the lower and
the transposed-upper streams by the *same* row ranges, so every device
produces exactly its own y segment and no cross-device scatter or psum
is needed (the conflict-free property, achieved by layout).

The all-gather is the current halo strategy (full replication); the
overlapped segment-wise halo exchange of BASELINE config 4 is the next
refinement step.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

try:  # moved out of experimental in newer jax
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..formats.bell import LANES, BellPlan, build_bell_plan
from ..formats.csr import CSR
from ..tuning.partition import (
    estimate_imbalance,
    partition_tiles_by_nnz,
    tile_nnz_histogram,
)
from ..utils.logging import info
from .mesh import ROWS_AXIS

__all__ = ["DistSpDMV", "shard_csr_rows"]


def _slice_csr_rows(csr: CSR, r0: int, r1: int) -> CSR:
    """Rows [r0, r1) as a local CSR (local row ids, global columns)."""
    p0, p1 = csr.indptr[r0], csr.indptr[r1]
    return CSR(
        r1 - r0,
        csr.ncols,
        (csr.indptr[r0 : r1 + 1] - p0).astype(np.int64),
        csr.indices[p0:p1],
        csr.data[p0:p1],
        False,
    )


def shard_csr_rows(csr: CSR, ndev: int) -> tuple[list[CSR], np.ndarray]:
    """Equal-nnz contiguous row-tile shards (ref ``tpp:437-541``)."""
    T = max(1, -(-csr.nrows // LANES))
    hist = tile_nnz_histogram(csr.indptr, T)
    bounds = partition_tiles_by_nnz(hist, ndev)
    shards = []
    for d in range(ndev):
        r0 = int(bounds[d]) * LANES
        r1 = min(int(bounds[d + 1]) * LANES, csr.nrows)
        r0 = min(r0, csr.nrows)
        shards.append(_slice_csr_rows(csr, r0, r1))
    work = np.array([s.nnz for s in shards])
    info(
        "shard: %d devices, nnz/dev %s, imbalance %.3f",
        ndev, work.tolist(), estimate_imbalance(work),
    )
    return shards, bounds


def _pad_plan_arrays(plans: list[BellPlan], dtype):
    """Stack per-device plans into uniform (D, ...) arrays."""
    K = plans[0].chunks_per_step
    C_max = max(p.num_chunks for p in plans)
    C_max = -(-C_max // K) * K
    S_max = max(
        (0 if p.spill is None else p.spill.nnz) for p in plans
    )
    vals, packed, base, ctile = [], [], [], []
    s_row, s_col, s_val = [], [], []
    for p in plans:
        pad = C_max - p.num_chunks
        vals.append(np.pad(p.vals, ((0, pad), (0, 0), (0, 0))))
        packed.append(np.pad(p.packed, ((0, pad), (0, 0), (0, 0))))
        base.append(np.pad(p.base, (0, pad)))
        last_tile = p.chunk_tile[-1] if len(p.chunk_tile) else 0
        ctile.append(
            np.pad(p.chunk_tile, (0, pad), constant_values=last_tile)
        )
        sn = 0 if p.spill is None else p.spill.nnz
        sp = S_max - sn
        if p.spill is None:
            s_row.append(np.zeros(S_max, np.int32))
            s_col.append(np.zeros(S_max, np.int32))
            s_val.append(np.zeros(S_max, dtype))
        else:
            s_row.append(np.pad(p.spill.row, (0, sp)))
            s_col.append(np.pad(p.spill.col, (0, sp)))
            s_val.append(np.pad(p.spill.val.astype(dtype), (0, sp)))
    return (
        np.stack(vals), np.stack(packed), np.stack(base), np.stack(ctile),
        np.stack(s_row), np.stack(s_col), np.stack(s_val),
    )


@dataclasses.dataclass
class _ShardMeta:
    row0: int  # global first row
    nrows: int  # real rows of this shard
    num_row_tiles: int


class DistSpDMV:
    """Mesh-parallel SpDMV functor (the multi-chip ``SpDMV`` analog).

    Construction = preprocessing (partition + per-shard BELL planning +
    device placement), call = y = A @ x, mirroring the reference kernel
    API semantics (``sparse_kernel.hpp:17-27``) at pod scale.
    """

    def __init__(self, A, mesh, *, dtype=np.float32):
        from ..matrix import SparseMatrix

        if isinstance(A, SparseMatrix):
            csr = A.csr
        else:
            csr = A
        self.mesh = mesh
        self.ndev = mesh.shape[ROWS_AXIS]
        self.nrows = csr.nrows
        self.ncols = csr.ncols
        self.symmetric = csr.symmetric
        self.dtype = np.dtype(dtype)

        if csr.symmetric:
            lower, diag, _ = csr.split_triangle()
            upper = lower.transpose()
            # balance on combined per-tile work of both streams
            T = max(1, -(-csr.nrows // LANES))
            hist = tile_nnz_histogram(lower.indptr, T) + tile_nnz_histogram(
                upper.indptr, T
            )
            bounds = partition_tiles_by_nnz(hist, self.ndev)
            self.nnz_full = 2 * lower.nnz + int(np.count_nonzero(diag))
        else:
            lower, diag, upper = csr, None, None
            T = max(1, -(-csr.nrows // LANES))
            hist = tile_nnz_histogram(lower.indptr, T)
            bounds = partition_tiles_by_nnz(hist, self.ndev)
            self.nnz_full = csr.nnz

        self.bounds = bounds
        metas, lo_plans, up_plans, diags = [], [], [], []
        T_max = max(
            int(bounds[d + 1] - bounds[d]) for d in range(self.ndev)
        )
        T_max = max(T_max, 1)
        self.shard_rows = T_max * LANES
        for d in range(self.ndev):
            r0 = min(int(bounds[d]) * LANES, csr.nrows)
            r1 = min(int(bounds[d + 1]) * LANES, csr.nrows)
            lo_shard = _slice_csr_rows(lower, r0, r1)
            # pad shard to uniform tile count for stacking
            lo_shard.nrows = self.shard_rows
            lo_shard.indptr = np.pad(
                lo_shard.indptr,
                (0, self.shard_rows - (r1 - r0)),
                mode="edge",
            )
            lo_plans.append(build_bell_plan(lo_shard, dtype=dtype))
            if upper is not None:
                up_shard = _slice_csr_rows(upper, r0, r1)
                up_shard.nrows = self.shard_rows
                up_shard.indptr = np.pad(
                    up_shard.indptr,
                    (0, self.shard_rows - (r1 - r0)),
                    mode="edge",
                )
                up_plans.append(build_bell_plan(up_shard, dtype=dtype))
            if diag is not None:
                dg = np.zeros(self.shard_rows, dtype)
                dg[: r1 - r0] = diag[r0:r1]
                diags.append(dg)
            metas.append(_ShardMeta(r0, r1 - r0, T_max))

        self.metas = metas
        self.x_pad_rows = lo_plans[0].x_pad_rows
        self._lo = _pad_plan_arrays(lo_plans, self.dtype)
        self._up = _pad_plan_arrays(up_plans, self.dtype) if up_plans else None
        self._diag = np.stack(diags) if diags else None
        self._place()
        self._fn = self._build()

    # --- device placement ---------------------------------------------
    def _place(self):
        sharded = NamedSharding(self.mesh, P(ROWS_AXIS))
        def put(arrs):
            return tuple(jax.device_put(jnp.asarray(a), sharded) for a in arrs)
        self._lo = put(self._lo)
        if self._up is not None:
            self._up = put(self._up)
        if self._diag is not None:
            (self._diag,) = put((self._diag,))

    # --- jitted program ------------------------------------------------
    def _build(self):
        from ..ops.bell_kernel import bell_spmv_tiles
        from ..ops.spmv import use_interpret

        ndev = self.ndev
        S = self.shard_rows
        n = self.nrows
        Kt = self.metas[0].num_row_tiles
        x_pad_rows = self.x_pad_rows
        interpret = use_interpret()
        sym = self._up is not None
        real = [(m.row0, m.nrows) for m in self.metas]
        plan0_k = None

        def local_bell(arrs, x2d):
            # shard_map keeps the (length-1) leading device dim; drop it
            vals, packed, base, ctile, sr, sc, sv = (a[0] for a in arrs)
            tiles = bell_spmv_tiles(
                vals, packed, base, ctile, x2d,
                num_row_tiles=Kt,
                interpret=interpret,
            )
            y = tiles.reshape(-1)[:S]
            # spill (scattered stream), cheap when tuner kept it small
            prod = sv * jnp.take(x2d.reshape(-1), sc, axis=0)
            y = y + jnp.zeros((S,), y.dtype).at[sr].add(prod)
            return y

        def shard_fn(lo, up, diag, x_sh):
            x_loc = x_sh[0]  # (S,) this device's padded x segment
            xg = jax.lax.all_gather(x_loc, ROWS_AXIS, tiled=False)
            parts = [xg[d, : real[d][1]] for d in range(ndev)]
            x_full = jnp.concatenate(parts)[:n] if ndev > 1 else parts[0]
            pad_len = x_pad_rows * LANES - x_full.shape[0]
            x2d = jnp.pad(x_full, (0, pad_len)).reshape(x_pad_rows, LANES)
            y = local_bell(lo, x2d)
            if sym:
                y = y + local_bell(up, x2d) + diag[0] * x_loc
            return y[None]

        in_specs = (
            P(ROWS_AXIS),
            P(ROWS_AXIS) if sym else None,
            P(ROWS_AXIS) if sym else None,
            P(ROWS_AXIS),
        )

        smapped = shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=in_specs,
            out_specs=P(ROWS_AXIS),
            check_vma=False,
        )

        @jax.jit
        def run(lo, up, diag, x):
            # split global x into padded equal shards (D, S)
            segs = []
            for d in range(ndev):
                r0, nr = real[d]
                seg = jax.lax.dynamic_slice_in_dim(
                    jnp.pad(x, (0, S)), r0, S
                )
                mask = jnp.arange(S) < nr
                segs.append(jnp.where(mask, seg, 0))
            x_sh = jnp.stack(segs)
            y_sh = run_inner(lo, up, diag, x_sh)
            outs = [y_sh[d, : real[d][1]] for d in range(ndev)]
            return jnp.concatenate(outs)[:n]

        def run_inner(lo, up, diag, x_sh):
            lo_in = tuple(a for a in lo)
            if sym:
                return smapped(lo_in, self._up_tuple(up), diag, x_sh)
            return smapped(lo_in, None, None, x_sh)

        return run

    @staticmethod
    def _up_tuple(up):
        return tuple(a for a in up)

    def __call__(self, x):
        x = jnp.asarray(x, self.dtype)
        if x.shape != (self.ncols,):
            raise ValueError(
                f"x must be ({self.ncols},), got {x.shape}"
            )
        return self._fn(self._lo, self._up, self._diag, x)
