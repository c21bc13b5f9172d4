// cfs_native — native host-side runtime for cfs_spmv_tpu.
//
// TPU-native counterpart of the reference's C++ runtime layer
// (athelaf/cfs-spmv is C++ end to end): the two host-side hot loops that
// stay scalar — MatrixMarket body tokenization (ref src/mmf.cpp:6-44,
// DoRead/split per line) and the greedy chunk/window packing of the BELL2
// planner (the analog of the per-thread CSR splitting + windowing in
// csr_matrix.tpp:1204-1348) — implemented as a small C ABI shared library
// loaded via ctypes. Everything vectorizable lives in NumPy; only the
// inherently sequential scans live here.
//
// Build: g++ -O3 -march=native -shared -fPIC cfs_native.cpp -o libcfs_native.so

#include <cstdint>
#include <cstdlib>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// MMF body parser.
//
// Parses `nnz` coordinate records of `width` whitespace-separated fields
// (2 = pattern, 3 = real/integer) from buf[0:len). Rows/cols are written
// 1-based-as-stored (caller rebases), values only when width == 3.
// Lines starting with '%' are skipped (per-entry comments are legal MMF).
// Returns the number of records parsed, or -(byte offset + 1) of the first
// malformed token.
int64_t cfs_parse_mmf_body(const char *buf, int64_t len, int64_t nnz,
                           int32_t width, int64_t *row, int64_t *col,
                           double *val) {
  const char *p = buf;
  const char *end = buf + len;
  for (int64_t k = 0; k < nnz; ++k) {
    // skip whitespace and comment lines
    for (;;) {
      while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n'))
        ++p;
      if (p < end && *p == '%') {
        while (p < end && *p != '\n') ++p;
        continue;
      }
      break;
    }
    if (p >= end) return -(int64_t)(p - buf) - 1;
    char *q;
    long long r = strtoll(p, &q, 10);
    if (q == p) return -(int64_t)(p - buf) - 1;
    p = q;
    long long c = strtoll(p, &q, 10);
    if (q == p) return -(int64_t)(p - buf) - 1;
    p = q;
    row[k] = (int64_t)r;
    col[k] = (int64_t)c;
    if (width == 3) {
      double v = strtod(p, &q);
      if (q == p) return -(int64_t)(p - buf) - 1;
      p = q;
      val[k] = v;
    }
  }
  return nnz;
}

// ---------------------------------------------------------------------------
// Greedy BELL2 chunk packing (formats/bell2.py:pack_chunks inner loop).
//
// Units are scanned in key order; a unit joins the current chunk while the
// chunk has a free subrow (< sublanes) and the union of x-windows stays
// within max_windows slots. Window ids within a chunk are assigned in
// first-seen order (must match the Python fallback exactly so plans are
// reproducible across backends).
//
// Inputs (all preallocated by the caller):
//   uw_start/uw_end : per-unit [start, end) into the distinct
//                     (unit, window-need) list      (n_units, n_units)
//   uw_seg          : segment id per (unit, window) (n_uw)
//   unit_tile       : owning row tile per unit      (n_units)
// Outputs:
//   chunk_of_unit, subrow_of_unit : per-unit placement (n_units)
//   uw_slot                       : window slot per (unit, window) (n_uw)
//   chunk_tile     : owning tile per chunk          (cap n_units)
//   windows        : (cap n_units, sublanes) window table, zero-filled
//   nwin           : windows used per chunk         (cap n_units)
// Returns the number of chunks, or -1 on invariant violation.
int64_t cfs_pack_units(const int64_t *uw_start, const int64_t *uw_end,
                       const int64_t *uw_seg, const int64_t *unit_tile,
                       int64_t n_units, int64_t sublanes,
                       int64_t max_windows, int64_t *chunk_of_unit,
                       int64_t *subrow_of_unit, int64_t *uw_slot,
                       int64_t *chunk_tile, int32_t *windows,
                       int32_t *nwin) {
  if (max_windows > 8 || sublanes > 8) return -1;
  int64_t n_chunks = 0;
  int64_t cur_tile = -2;  // forces a new chunk for the first unit
  int64_t cur_sub = sublanes;
  int64_t winmap[8];  // segment id per occupied slot
  int64_t nmap = 0;

  for (int64_t k = 0; k < n_units; ++k) {
    const int64_t s0 = uw_start[k], s1 = uw_end[k];
    // count windows of this unit not already in the chunk (segs within a
    // unit may repeat across its (unit, seg) records only as distinct
    // entries; dedup against winmap AND among themselves)
    int64_t fresh = 0;
    for (int64_t i = s0; i < s1; ++i) {
      const int64_t sg = uw_seg[i];
      bool seen = false;
      for (int64_t w = 0; w < nmap; ++w)
        if (winmap[w] == sg) { seen = true; break; }
      if (!seen) {
        for (int64_t j = s0; j < i; ++j)
          if (uw_seg[j] == sg) { seen = true; break; }
      }
      if (!seen) ++fresh;
    }
    if (unit_tile[k] != cur_tile || cur_sub >= sublanes ||
        nmap + fresh > max_windows) {
      cur_tile = unit_tile[k];
      cur_sub = 0;
      nmap = 0;
      chunk_tile[n_chunks] = cur_tile;
      ++n_chunks;
    }
    const int64_t ci = n_chunks - 1;
    for (int64_t i = s0; i < s1; ++i) {
      const int64_t sg = uw_seg[i];
      int64_t slot = -1;
      for (int64_t w = 0; w < nmap; ++w)
        if (winmap[w] == sg) { slot = w; break; }
      if (slot < 0) {
        if (nmap >= max_windows) return -1;
        slot = nmap;
        winmap[nmap] = sg;
        windows[ci * sublanes + nmap] = (int32_t)sg;
        ++nmap;
      }
      uw_slot[i] = slot;
    }
    nwin[ci] = (int32_t)nmap;
    chunk_of_unit[k] = ci;
    subrow_of_unit[k] = cur_sub;
    ++cur_sub;
  }
  return n_chunks;
}

}  // extern "C"
