// Native runtime helpers for vexcl_tpu.
//
// Role: the host-side data-preparation layer that the reference implements
// in native C++ (vexcl is header-only C++; its format conversions and host
// merge passes run natively).  The TPU compute path is XLA/Pallas; these
// helpers cover the host-side hot spots:
//
//   * CSR -> padded-ELL repack (vexcl/sparse/ell.hpp construction analog)
//   * CSR tail extraction for the hybrid format (spmat/hybrid_ell.inl)
//   * k-way merge of sorted runs (the host merge of vexcl/sort.hpp:1924-2068,
//     kept for host-side post-processing paths)
//   * Philox4x32-10 host reference generator (validation / host fills)
//
// Built as a plain shared library, loaded via ctypes (no pybind11 in this
// environment).  All exports use C linkage with raw pointers.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <memory>
#include <queue>
#include <vector>

extern "C" {

// CSR -> padded ELL planes.  ecol must hold n*width int32 (filled with -1),
// eval n*width doubles (zero-filled).  Values truncated at `width` per row.
void csr_to_ell_f64(int64_t n, const int64_t* ptr, const int32_t* col,
                    const double* val, int64_t width, int32_t* ecol,
                    double* eval) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    int64_t len = ptr[i + 1] - ptr[i];
    if (len > width) len = width;
    const int64_t base = ptr[i];
    int32_t* oc = ecol + i * width;
    double* ov = eval + i * width;
    for (int64_t k = 0; k < len; ++k) {
      oc[k] = col[base + k];
      ov[k] = val[base + k];
    }
  }
}

void csr_to_ell_f32(int64_t n, const int64_t* ptr, const int32_t* col,
                    const float* val, int64_t width, int32_t* ecol,
                    float* eval) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    int64_t len = ptr[i + 1] - ptr[i];
    if (len > width) len = width;
    const int64_t base = ptr[i];
    int32_t* oc = ecol + i * width;
    float* ov = eval + i * width;
    for (int64_t k = 0; k < len; ++k) {
      oc[k] = col[base + k];
      ov[k] = val[base + k];
    }
  }
}

// Extract the CSR tail (entries beyond `width` per row).
// tptr must hold n+1 entries; returns total tail nnz.
int64_t csr_tail(int64_t n, const int64_t* ptr, const int32_t* col,
                 const double* val, int64_t width, int64_t* tptr,
                 int32_t* tcol, double* tval) {
  int64_t out = 0;
  tptr[0] = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t len = ptr[i + 1] - ptr[i];
    if (len > width) {
      for (int64_t k = width; k < len; ++k) {
        tcol[out] = col[ptr[i] + k];
        tval[out] = val[ptr[i] + k];
        ++out;
      }
    }
    tptr[i + 1] = out;
  }
  return out;
}

// k-way merge of sorted f64 key runs with u64 payload indices.
// offsets: nruns+1 partition points into keys/vals.
void kway_merge_f64(int64_t nruns, const int64_t* offsets, const double* keys,
                    const int64_t* vals, double* okeys, int64_t* ovals) {
  using Item = std::pair<double, int64_t>;  // key, run index
  std::vector<int64_t> cursor(nruns);
  auto cmp = [&](const Item& a, const Item& b) { return a.first > b.first; };
  std::priority_queue<Item, std::vector<Item>, decltype(cmp)> heap(cmp);
  for (int64_t r = 0; r < nruns; ++r) {
    cursor[r] = offsets[r];
    if (cursor[r] < offsets[r + 1]) heap.push({keys[cursor[r]], r});
  }
  int64_t out = 0;
  while (!heap.empty()) {
    auto [key, r] = heap.top();
    heap.pop();
    okeys[out] = key;
    ovals[out] = vals ? vals[cursor[r]] : cursor[r];
    ++out;
    ++cursor[r];
    if (cursor[r] < offsets[r + 1]) heap.push({keys[cursor[r]], r});
  }
}

// Philox4x32-10 host reference (round structure identical to the device
// implementation in vexcl_tpu/ops/random.py).
static inline void mulhilo(uint32_t a, uint32_t b, uint32_t* hi,
                           uint32_t* lo) {
  uint64_t p = (uint64_t)a * (uint64_t)b;
  *hi = (uint32_t)(p >> 32);
  *lo = (uint32_t)p;
}

void philox4x32_host(int64_t n, uint32_t k0, uint32_t k1, uint32_t* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    uint32_t c0 = (uint32_t)i, c1 = (uint32_t)((uint64_t)i >> 32), c2 = 0,
             c3 = 0;
    uint32_t key0 = k0, key1 = k1;
    for (int r = 0; r < 10; ++r) {
      uint32_t hi0, lo0, hi1, lo1;
      mulhilo(0xD2511F53u, c0, &hi0, &lo0);
      mulhilo(0xCD9E8D57u, c2, &hi1, &lo1);
      uint32_t n0 = hi1 ^ c1 ^ key0;
      uint32_t n1 = lo1;
      uint32_t n2 = hi0 ^ c3 ^ key1;
      uint32_t n3 = lo0;
      c0 = n0; c1 = n1; c2 = n2; c3 = n3;
      key0 += 0x9E3779B9u;
      key1 += 0xBB67AE85u;
    }
    out[4 * i + 0] = c0;
    out[4 * i + 1] = c1;
    out[4 * i + 2] = c2;
    out[4 * i + 3] = c3;
  }
}


// Rank-within-group: rank[i] = #{j < i : keys[j] == keys[i]}.  One pass
// with a counter array indexed by key (keys in [0, nkeys)).  Replaces the
// numpy argsort+searchsorted rank pattern, which cost ~7 s per 16.8M call
// on the bench host (the counter array is cache-resident at the SELLR
// planner's key ranges: tiles*128 or row counts).
void group_rank_i32(int64_t E, const int32_t* keys, int64_t nkeys,
                    int32_t* rank) {
  std::vector<int32_t> cnt((size_t)nkeys, 0);
  for (int64_t i = 0; i < E; ++i) rank[i] = cnt[keys[i]]++;
}

// Fused CSR row expansion: rows_of[k] = row of entry k, within[k] = its
// slot index inside the row.  One streaming pass (numpy: two np.repeat +
// an arange subtract, ~7 s at 16.8M on the bench host).
void expand_rows_i32(int64_t n, const int64_t* ptr, int32_t* rows_of,
                     int32_t* within) {
  for (int64_t i = 0; i < n; ++i) {
    const int64_t b = ptr[i], e = ptr[i + 1];
    for (int64_t k = b; k < e; ++k) {
      rows_of[k] = (int32_t)i;
      within[k] = (int32_t)(k - b);
    }
  }
}

// Complete a partial permutation: dst[i] < 0 slots are filled with the
// unused destination values in ascending order.  Replaces a numpy
// nonzero/bool-mask/nonzero chain (~3 random passes over the grid).
void perm_complete_i32(int64_t M, int32_t* dst) {
  std::vector<uint64_t> used((size_t)((M + 63) >> 6), 0);
  for (int64_t i = 0; i < M; ++i) {
    int64_t d = dst[i];
    if (d >= 0) used[d >> 6] |= (uint64_t)1 << (d & 63);
  }
  int64_t nf = 0;
  for (int64_t i = 0; i < M; ++i) {
    if (dst[i] >= 0) continue;
    while (used[nf >> 6] >> (nf & 63) & 1) ++nf;
    dst[i] = (int32_t)nf++;
  }
}

// Scatter-add with duplicate accumulation: out[idx[i]] += val[i].
// Serial per pass but memory-speed; used by the DIA builder when CSR input
// carries duplicate cells (numpy's bincount-with-weights measured
// ~0.5 Melem/s, np.add.at worse).
void scatter_add_f64(int64_t nnz, const int64_t* idx, const double* val,
                     double* out) {
  for (int64_t i = 0; i < nnz; ++i) out[idx[i]] += val[i];
}

void scatter_add_f32(int64_t nnz, const int64_t* idx, const float* val,
                     float* out) {
  for (int64_t i = 0; i < nnz; ++i) out[idx[i]] += val[i];
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Konig edge coloring by Euler splitting (shuffle-routed SpMV plan,
// vexcl_tpu/sparse/shuffle_plan.py).  d-regular bipartite multigraph
// (d a power of two), vertices su/dv in [0, nv); writes colors in [0, d).
//
// Level-synchronous rewrite (r4): the recursive linked-list version paid
// a cache miss per pointer hop over the full edge range at every depth
// (~50 s at 16M edges on this 1-core host).  Here each Euler split
// COMPACTS its two halves into contiguous spans of a ping-pong buffer,
// so every deeper level walks cache-resident data; incidence is CSR with
// cursors (no linked lists), ids are int32, used/fwd are bitmasks, and
// each slot carries its jump target (no per-step u/v lookup).  `seg`
// marks vertex-disjoint contiguous edge segments (the planner's
// per-group grids), which start cache-resident from level 0.
// Requires E, 2*nv < 2^31 (the python wrapper falls back otherwise).
// ---------------------------------------------------------------------------

namespace {

struct SegColorScratch {
  std::vector<int32_t> eu, ev, eid, eu2, ev2, eid2;  // edge triples (2 bufs)
  // 2*m incidence slots: other_endpoint << 32 | local_edge << 1 | is_src
  std::vector<uint64_t> slots;
  std::vector<int32_t> vcur, vend, vfill;     // per-vertex slot cursors
  std::vector<int32_t> touched;               // touched vertex list
  std::vector<uint64_t> used, fwd;            // bitmasks over local edges
  std::vector<int32_t> trail_of;              // multi-trail: edge -> trail
};

inline bool bit_get(const uint64_t* b, int32_t i) {
  return (b[i >> 6] >> (i & 63)) & 1;
}
inline void bit_set(uint64_t* b, int32_t i) {
  b[i >> 6] |= uint64_t(1) << (i & 63);
}

// Build the per-group incidence CSR + clear bitmasks; shared by both
// walk variants.
void build_incidence(SegColorScratch& S, const int32_t* u,
                     const int32_t* v, int32_t m, int32_t nv) {
  S.touched.clear();
  // degree count (vend doubles as the counter; zeroed invariantly)
  for (int32_t i = 0; i < m; ++i) {
    int32_t a = u[i], b = v[i] + nv;
    if (!S.vend[a]) S.touched.push_back(a);
    ++S.vend[a];
    if (!S.vend[b]) S.touched.push_back(b);
    ++S.vend[b];
  }
  int32_t off = 0;
  for (int32_t t : S.touched) {
    int32_t c = S.vend[t];
    S.vcur[t] = off;
    S.vfill[t] = off;
    off += c;
    S.vend[t] = off;
  }
  for (int32_t i = 0; i < m; ++i) {
    int32_t a = u[i], b = v[i] + nv;
    S.slots[S.vfill[a]++] =
        ((uint64_t)(uint32_t)b << 32) | ((uint32_t)i << 1) | 1u;
    S.slots[S.vfill[b]++] = ((uint64_t)(uint32_t)a << 32) | ((uint32_t)i << 1);
  }
  const int32_t nw = (m + 63) >> 6;
  std::fill(S.used.begin(), S.used.begin() + nw, 0);
  std::fill(S.fwd.begin(), S.fwd.begin() + nw, 0);
}

// Orient one group: local edges (u[i], v[i]) for i in [0, m); all degrees
// even.  Sets S.fwd bit = edge oriented src->dst.
void euler_orient(SegColorScratch& S, const int32_t* u, const int32_t* v,
                  int32_t m, int32_t nv) {
  build_incidence(S, u, v, m, nv);
  uint64_t* ub = S.used.data();
  uint64_t* fb = S.fwd.data();
  for (int32_t i0 = 0; i0 < m; ++i0) {
    if (bit_get(ub, i0)) continue;
    int32_t x = u[i0];
    for (;;) {
      int32_t c = S.vcur[x], e = S.vend[x];
      uint64_t s = 0;
      while (c < e && bit_get(ub, (int32_t)((uint32_t)(s = S.slots[c]) >> 1)))
        ++c;
      S.vcur[x] = c;
      if (c >= e) break;
      s = S.slots[c];
      int32_t ei = (int32_t)((uint32_t)s >> 1);
      bit_set(ub, ei);
      if (s & 1) bit_set(fb, ei);
      x = (int32_t)(s >> 32);
    }
  }
  for (int32_t t : S.touched) S.vend[t] = 0;  // restore the invariant
}

// Multi-trail orientation for LARGE groups.  The single walker chases one
// pointer at a time through a slots array far bigger than cache, so the
// level runs at ~1 serialized cache miss per edge (measured 28.5 s for
// the unsegmented 16.8M-edge coloring vs 6.5 s cache-resident).  K
// interleaved walkers keep K misses in flight (memory-level parallelism).
// Each walker lays down a greedy trail; a trail is a closed circuit
// unless walkers collide at a vertex whose free degree ran out (rare).
// A repair pass Euler-orients the tiny multigraph of OPEN trails (open-
// endpoint degrees are even at every vertex by the handshake argument)
// and flips the trails traversed against that orientation — per-vertex
// in==out then holds globally, which is all the Euler split needs.
void euler_orient_mt(SegColorScratch& S, const int32_t* u, const int32_t* v,
                     int32_t m, int32_t nv) {
  build_incidence(S, u, v, m, nv);
  uint64_t* ub = S.used.data();
  uint64_t* fb = S.fwd.data();
  if ((int64_t)S.trail_of.size() < (int64_t)m) S.trail_of.resize(m);
  int32_t* trail_of = S.trail_of.data();
  const uint64_t* slots = S.slots.data();

  constexpr int K = 8;
  int32_t wx[K], wtrail[K];
  std::vector<int32_t> tstart, tend;
  int64_t seed = 0;
  int active = 0;
  auto grab_seed = [&](int k) -> bool {
    while (seed < m && bit_get(ub, (int32_t)seed)) ++seed;
    if (seed >= m) return false;
    const int32_t x = u[seed];
    ++seed;  // a start hint only; the edge is consumed by the walk itself
    wx[k] = x;
    wtrail[k] = (int32_t)tstart.size();
    tstart.push_back(x);
    tend.push_back(-1);
    return true;
  };
  for (int k = 0; k < K; ++k) {
    if (!grab_seed(k)) break;
    ++active;
  }
  while (active > 0) {
    for (int k = 0; k < active;) {
      const int32_t x = wx[k];
      int32_t c = S.vcur[x];
      const int32_t e = S.vend[x];
      uint64_t s = 0;
      while (c < e && bit_get(ub, (int32_t)((uint32_t)(s = slots[c]) >> 1)))
        ++c;
      S.vcur[x] = c;
      if (c >= e) {
        tend[wtrail[k]] = x;
        if (!grab_seed(k)) {
          --active;  // retire the slot: swap in the last active walker
          wx[k] = wx[active];
          wtrail[k] = wtrail[active];
          continue;  // re-run slot k with the swapped-in walker
        }
        ++k;
        continue;
      }
      const int32_t ei = (int32_t)((uint32_t)s >> 1);
      bit_set(ub, ei);
      if (s & 1) bit_set(fb, ei);
      trail_of[ei] = wtrail[k];
      const int32_t nx = (int32_t)(s >> 32);
      wx[k] = nx;
      __builtin_prefetch(&slots[S.vcur[nx]]);
      ++k;
    }
  }
  for (int32_t t : S.touched) S.vend[t] = 0;  // restore the invariant

  // ---- repair: orient the open-trail multigraph, flip backward trails
  const int32_t nt = (int32_t)tstart.size();
  std::vector<int32_t> open;
  for (int32_t t = 0; t < nt; ++t)
    if (tend[t] >= 0 && tend[t] != tstart[t]) open.push_back(t);
  if (open.empty()) return;
  const int32_t no = (int32_t)open.size();
  std::vector<int32_t> tu(no), tv(no);
  {
    std::vector<int32_t> all;
    all.reserve(2 * no);
    for (int32_t t : open) {
      all.push_back(tstart[t]);
      all.push_back(tend[t]);
    }
    std::sort(all.begin(), all.end());
    all.erase(std::unique(all.begin(), all.end()), all.end());
    for (int32_t i = 0; i < no; ++i) {
      tu[i] = (int32_t)(std::lower_bound(all.begin(), all.end(),
                                         tstart[open[i]]) - all.begin());
      tv[i] = (int32_t)(std::lower_bound(all.begin(), all.end(),
                                         tend[open[i]]) - all.begin());
    }
    // trail-graph vertex count
    const int32_t tnv = (int32_t)all.size();
    std::vector<int32_t> deg(tnv + 1, 0), cur(tnv), fill(tnv);
    for (int32_t i = 0; i < no; ++i) {
      ++deg[tu[i] + 1];
      ++deg[tv[i] + 1];
    }
    for (int32_t x = 0; x < tnv; ++x) deg[x + 1] += deg[x];
    std::vector<uint64_t> tslots(2 * no);
    for (int32_t x = 0; x < tnv; ++x) fill[x] = cur[x] = deg[x];
    for (int32_t i = 0; i < no; ++i) {
      tslots[fill[tu[i]]++] =
          ((uint64_t)(uint32_t)tv[i] << 32) | ((uint32_t)i << 1) | 1u;
      tslots[fill[tv[i]]++] =
          ((uint64_t)(uint32_t)tu[i] << 32) | ((uint32_t)i << 1);
    }
    std::vector<uint64_t> tused((no + 63) >> 6, 0);
    std::vector<uint64_t> tflip(((int64_t)nt + 63) >> 6, 0);
    bool any_flip = false;
    for (int32_t i0 = 0; i0 < no; ++i0) {
      if (bit_get(tused.data(), i0)) continue;
      int32_t x = tu[i0];
      for (;;) {
        int32_t c = cur[x], e = deg[x + 1];
        uint64_t s = 0;
        while (c < e &&
               bit_get(tused.data(),
                       (int32_t)((uint32_t)(s = tslots[c]) >> 1)))
          ++c;
        cur[x] = c;
        if (c >= e) break;
        const int32_t ti = (int32_t)((uint32_t)s >> 1);
        bit_set(tused.data(), ti);
        if (!(s & 1)) {  // traversed end->start: flip the whole trail
          bit_set(tflip.data(), open[ti]);
          any_flip = true;
        }
        x = (int32_t)(s >> 32);
      }
    }
    if (!any_flip) return;
    for (int32_t ei = 0; ei < m; ++ei)
      if (bit_get(tflip.data(), trail_of[ei]))
        fb[ei >> 6] ^= (uint64_t)1 << (ei & 63);
  }
}

// Shared Euler-split level loop: scratch arrives with eu/ev/eid filled.
void run_color_levels(SegColorScratch& S, int64_t E, int32_t nv, int32_t d,
                      int64_t seg, int32_t* colors) {
  S.vcur.resize(2 * (int64_t)nv);
  S.vfill.resize(2 * (int64_t)nv);
  S.vend.assign(2 * (int64_t)nv, 0);
  const int64_t max_m = seg < E ? seg : E;
  S.slots.resize(2 * max_m);
  S.used.resize((max_m + 63) >> 6);
  S.fwd.resize((max_m + 63) >> 6);
  std::vector<int64_t> offs, offs2;
  std::vector<int32_t> base, base2;
  for (int64_t s = 0; s < E; s += seg) offs.push_back(s);
  offs.push_back(E);
  base.assign(offs.size() - 1, 0);
  for (int32_t dd = d; dd > 1; dd >>= 1) {
    offs2.clear();
    base2.clear();
    offs2.push_back(0);
    for (size_t g = 0; g + 1 < offs.size(); ++g) {
      const int64_t s0 = offs[g];
      const int32_t m = (int32_t)(offs[g + 1] - s0);
      // multi-trail walk once the group's working set exceeds cache
      // (the 16 MB slots of a 1M-edge group already miss on this host's
      // small L3 share: measured 3.3 s/level simple vs 0.2 s mt); below
      // ~32K edges the trail bookkeeping outweighs the hidden latency
      if (m > (1 << 15))
        euler_orient_mt(S, S.eu.data() + s0, S.ev.data() + s0, m, nv);
      else
        euler_orient(S, S.eu.data() + s0, S.ev.data() + s0, m, nv);
      // compact: fwd half to [s0, s0+m/2), rest to [s0+m/2, s0+m)
      int64_t wf = s0, wb = s0 + m / 2;
      const uint64_t* fb = S.fwd.data();
      for (int32_t i = 0; i < m; ++i) {
        int64_t w = bit_get(fb, i) ? wf++ : wb++;
        S.eu2[w] = S.eu[s0 + i];
        S.ev2[w] = S.ev[s0 + i];
        S.eid2[w] = S.eid[s0 + i];
      }
      offs2.push_back(s0 + m / 2);
      offs2.push_back(s0 + m);
      base2.push_back(base[g]);
      base2.push_back(base[g] + (dd >> 1));
    }
    S.eu.swap(S.eu2); S.ev.swap(S.ev2); S.eid.swap(S.eid2);
    offs.swap(offs2);
    base.swap(base2);
  }
  for (size_t g = 0; g + 1 < offs.size(); ++g)
    for (int64_t i = offs[g]; i < offs[g + 1]; ++i)
      colors[S.eid[i]] = base[g];
}

}  // namespace

extern "C" {

// seg: edges [k*seg, (k+1)*seg) are vertex-disjoint groups (pass seg == E
// for one connected problem).
void edge_color_pow2_seg(int64_t E, const int64_t* su, const int64_t* dv,
                         int64_t nv64, int32_t d, int64_t seg,
                         int32_t* colors) {
  SegColorScratch S;
  S.eu.resize(E); S.ev.resize(E); S.eid.resize(E);
  S.eu2.resize(E); S.ev2.resize(E); S.eid2.resize(E);
  for (int64_t i = 0; i < E; ++i) {
    S.eu[i] = (int32_t)su[i];
    S.ev[i] = (int32_t)dv[i];
    S.eid[i] = (int32_t)i;
  }
  run_color_levels(S, E, (int32_t)nv64, d, seg, colors);
}

void edge_color_pow2(int64_t E, const int64_t* su, const int64_t* dv,
                     int64_t nv, int32_t d, int32_t* colors) {
  edge_color_pow2_seg(E, su, dv, nv, d, E, colors);
}

// ---------------------------------------------------------------------------
// Permutation-grid fast path (r5).  Every grid the SELLR planner colors is
// a FULL PERMUTATION of [0, E): source row p>>7 holds exactly 128
// consecutive edges and every destination row receives exactly 128 — a
// 128-regular bipartite multigraph that is regular ON BOTH SIDES.  Two
// structural facts make the general incidence-rebuilding Euler machinery
// unnecessary:
//
//   1. A STABLE split keeps each side's per-row edge blocks CONTIGUOUS,
//      ALIGNED and exactly halved, so at level k (degree d = 128>>k) the
//      edges of any row occupy an aligned d-block of the position arrays
//      and the Euler pairing within a row is simply `pos ^ 1`.
//   2. The union of the two pairings (one perfect matching on edges per
//      side) is a disjoint set of EVEN cycles alternating src-pairs and
//      dst-pairs; a valid orientation gives the two members of every
//      pair OPPOSITE fwd bits.  Walking the "step" permutation
//      step(p) = P[Q[p^1] ^ 1] visits every SECOND element of a union
//      cycle, so the correct assignment is a CONSTANT bit on the
//      step-visited positions and the complement on their xor-partners
//      (NOT an alternating bit along the step walk — two union hops lie
//      between consecutive step positions).
//
// K interleaved walkers keep K cache misses in flight.  Each walker claims
// PAIRS {p, p^1} (one visited bit + one orientation bit per pair) along a
// contiguous arc of its union cycle; arcs of different walkers on one
// cycle meet at claim boundaries, where the required relative orientation
// is recorded as a parity constraint between the two walker segments and
// solved afterwards with a tiny parity-DSU (flipping a segment toggles
// the orientation of every pair it claimed).  ~2 memory ops per
// edge-level against ~5 for the general path.  Returns 0, or -1 if the
// grid is not an exactly-128-regular segment-confined permutation or an
// internal invariant trips (caller falls back to edge_color_rows_i32).
// ---------------------------------------------------------------------------
int edge_color_perm_i32(int64_t E, const int32_t* drow, int64_t seg,
                        int32_t* colors) {
  if (seg <= 0) seg = E;
  if (E < 128 || (E & 127) || (seg & 127) || E % seg || E >= (1ll << 31))
    return -1;
  const int64_t nrows = E >> 7;
  const int64_t segrows = seg >> 7;
  // Reused, NON-initializing scratch: std::vector<int32_t>(E) zero-fills
  // ~7 x 67 MB per call at the bench grid (three large calls per
  // construction), a pure memset tax — every cell below is written
  // before it is read (the build loop covers all E slots exactly once;
  // the per-level partition covers each group exactly once; pairvis /
  // orient are std::fill'ed per segment-level on 64-bit-aligned word
  // ranges since seg % 128 == 0; segof is written at claim before read).
  struct PermScratch {
    std::unique_ptr<int32_t[]> i32;   // 7 planes of cap each
    std::unique_ptr<uint64_t[]> pv, ob;
    std::unique_ptr<int32_t[]> so;
    int64_t cap = 0;
    void ensure(int64_t n) {
      if (n <= cap) return;
      i32.reset(new int32_t[7 * n]);
      const int64_t words = ((n >> 1) + 63) >> 6;
      pv.reset(new uint64_t[words]);
      ob.reset(new uint64_t[words]);
      so.reset(new int32_t[n >> 1]);
      cap = n;
    }
  };
  static thread_local PermScratch PS;
  PS.ensure(E);
  int32_t* const P = PS.i32.get();
  int32_t* const Q = P + E;
  int32_t* const ID = P + 2 * E;
  int32_t* const P2 = P + 3 * E;
  int32_t* const Q2 = P + 4 * E;
  int32_t* const ID2 = P + 5 * E;
  int32_t* const npbuf = P + 6 * E;
  {
    // dst slot of edge p: (drow[p] << 7) | arrival-order within the row;
    // P = slot -> position, Q = position -> slot.  Validates exact
    // 128-regularity and segment confinement as it builds.
    std::vector<int32_t> cnt((size_t)nrows, 0);
    for (int64_t p = 0; p < E; ++p) {
      const int32_t r = drow[p];
      if (r < 0 || r >= nrows || (r / segrows) != (p >> 7) / segrows)
        return -1;
      const int32_t k = cnt[r]++;
      if (k >= 128) return -1;
      const int64_t q = ((int64_t)r << 7) | k;
      Q[p] = (int32_t)q;
      P[q] = (int32_t)p;
      ID[p] = (int32_t)p;
    }
  }
  std::vector<int32_t> ca, cb;         // parity constraints between segments
  std::vector<uint8_t> cw;
  std::vector<int32_t> dsu_p;          // parity-DSU (rank-free, path-halved)
  std::vector<uint8_t> dsu_w;          // parity of node relative to parent

  // Segments are fully independent subproblems, so the SEGMENT loop is
  // OUTER and the 7 split levels run back to back on one segment: at the
  // planner's seg = 128K-edge grids the whole working set (~3 MB) stays
  // cache-resident across levels instead of streaming 6 full-E arrays
  // per level (levels-outer cost ~2x at 16.8M edges on the bench host).
  // Ping-pong buffers swap PER SEGMENT; 7 levels (odd) end in the "2"
  // arrays, copied back so the final color pass reads ID.
  int32_t* const baseP = P;
  int32_t* const baseQ = Q;
  int32_t* const baseID = ID;
  int32_t* const baseP2 = P2;
  int32_t* const baseQ2 = Q2;
  int32_t* const baseID2 = ID2;
  int32_t* const npb = npbuf;
  uint64_t* const pv = PS.pv.get();
  uint64_t* const ob = PS.ob.get();
  int32_t* const so = PS.so.get();

  for (int64_t s0 = 0; s0 < E; s0 += seg) {
    int32_t* Pa = baseP;
    int32_t* Qa = baseQ;
    int32_t* IDa = baseID;
    int32_t* Pb = baseP2;
    int32_t* Qb = baseQ2;
    int32_t* IDb = baseID2;
    const int64_t h0 = s0 >> 1;           // first pair of the segment
    const int64_t h1 = (s0 + seg) >> 1;   // one past the last

    int64_t gm = seg;
    for (int32_t d = 128; d > 1; d >>= 1, gm >>= 1) {
      std::fill(pv + (h0 >> 6), pv + (h1 >> 6), 0);
      std::fill(ob + (h0 >> 6), ob + (h1 >> 6), 0);
      ca.clear(); cb.clear(); cw.clear();
      const int32_t* Pd = Pa;
      const int32_t* Qd = Qa;

      // fwd(p) = orient(p>>1) ^ (p & 1); a claim at entry position p sets
      // fwd(p) = 0 (all walkers use bit 0; the DSU repairs cross-segment
      // consistency), i.e. orient(h) = p & 1.
      auto claim = [&](int32_t p, int32_t s) {
        const int32_t h = p >> 1;
        bit_set(pv, h);
        if (p & 1) bit_set(ob, h);
        so[h] = s;
      };

      constexpr int K = 16;
      int32_t wpos[K], wseed[K], wseg[K];
      int64_t scanh = h0;
      int32_t nseg = 0;
      int active = 0;
      auto grab = [&](int k) -> bool {
        while (scanh < h1 && bit_get(pv, (int32_t)scanh)) ++scanh;
        if (scanh >= h1) return false;
        const int32_t p = (int32_t)(scanh << 1);
        wpos[k] = wseed[k] = p;
        wseg[k] = nseg++;
        claim(p, wseg[k]);
        // Seed-backward boundary: arcs only record constraints where a
        // walker STEPS across them, and a step never crosses the joint
        // between a mirror-direction arc seeded at pair h and a forward
        // arc seeded at pair h+1 — so enforce the seed's backward dst-link
        // eagerly if its neighbor pair is already claimed (the unclaimed
        // case is recorded later by the neighbor's own seed-check or first
        // step).  Missing this produced per-dst-row unbalanced splits at
        // K>1 (caught by the python mirror; K=1 claims whole cycles and
        // never exercises constraints).
        const int32_t bq = Pd[Qd[p] ^ 1];  // dst-partner of the seed
        const int32_t hb = bq >> 1;
        if (hb != (p >> 1) && bit_get(pv, hb)) {
          ca.push_back(wseg[k]);
          cb.push_back(so[hb]);
          cw.push_back((uint8_t)(1 ^ bit_get(ob, hb) ^ (bq & 1)));
        }
        return true;
      };
      for (int k = 0; k < K; ++k) {
        if (!grab(k)) break;
        ++active;
      }
      while (active > 0) {
        for (int k = 0; k < active;) {
          const int32_t p = wpos[k];
          const int32_t np = Pd[Qd[p ^ 1] ^ 1];  // next step-class position
          const int32_t h = np >> 1;
          if (!bit_get(pv, h)) {
            claim(np, wseg[k]);
            wpos[k] = np;
            __builtin_prefetch(&Qd[np ^ 1]);
            ++k;
            continue;
          }
          if (np != wseed[k]) {
            // arc boundary: this walker requires fwd(np) == 0 relative to
            // itself, so flip(self) ^ flip(owner) == stored fwd(np)
            ca.push_back(wseg[k]);
            cb.push_back(so[h]);
            cw.push_back((uint8_t)(bit_get(ob, h) ^ (np & 1)));
          }
          if (!grab(k)) {
            --active;
            wpos[k] = wpos[active];
            wseed[k] = wseed[active];
            wseg[k] = wseg[active];
            continue;  // re-run slot k with the swapped-in walker
          }
          ++k;
        }
      }

      // ---- solve the walker parity constraints, apply flips ------------
      if (!ca.empty()) {
        dsu_p.resize(nseg);
        dsu_w.assign(nseg, 0);
        for (int32_t i = 0; i < nseg; ++i) dsu_p[i] = i;
        auto find = [&](int32_t x, uint8_t& par) {
          par = 0;
          while (dsu_p[x] != x) {
            const int32_t gp = dsu_p[dsu_p[x]];
            const uint8_t w = (uint8_t)(dsu_w[x] ^ dsu_w[dsu_p[x]]);
            dsu_p[x] = gp;  // path halving keeps parity-to-parent correct
            dsu_w[x] = w;
            par ^= w;
            x = gp;
          }
          par ^= dsu_w[x];  // root has dsu_w 0, harmless
          return x;
        };
        bool bad = false;
        for (size_t i = 0; i < ca.size() && !bad; ++i) {
          uint8_t pa, pb;
          const int32_t ra = find(ca[i], pa), rb = find(cb[i], pb);
          const uint8_t w = (uint8_t)(cw[i] ^ pa ^ pb);
          if (ra == rb) {
            if (w) bad = true;  // odd constraint cycle: not a valid grid
          } else {
            dsu_p[ra] = rb;
            dsu_w[ra] = w;
          }
        }
        if (bad) return -1;
        // flip of a walker segment = its parity to its component root
        std::vector<uint8_t> flip(nseg);
        bool any = false;
        for (int32_t s = 0; s < nseg; ++s) {
          uint8_t par;
          find(s, par);
          flip[s] = par;
          any |= par;
        }
        if (any)
          for (int64_t h = h0; h < h1; ++h)
            if (flip[so[h]]) ob[h >> 6] ^= (uint64_t)1 << (h & 63);
      }

      // ---- stable partition of both position arrays within each group --
      for (int64_t g0 = s0; g0 < s0 + seg; g0 += gm) {
        int64_t wf = g0, wb2 = g0 + gm / 2;
        for (int64_t p = g0; p < g0 + gm; ++p) {
          const bool f = bit_get(ob, (int32_t)(p >> 1)) ^ ((int32_t)p & 1);
          const int64_t np = f ? wf++ : wb2++;
          IDb[np] = IDa[p];
          // pack the fwd bit so the dst pass reads ONE array
          npb[p] = (int32_t)np | (f ? INT32_MIN : 0);
        }
        if (wf != g0 + gm / 2 || wb2 != g0 + gm) return -1;  // defensive
        int64_t qf = g0, qb = g0 + gm / 2;
        for (int64_t q = g0; q < g0 + gm; ++q) {
          const int32_t v = npb[Pd[q]];
          if (q + 16 < s0 + seg) __builtin_prefetch(&npb[Pd[q + 16]]);
          const int32_t np = v & INT32_MAX;
          const int64_t nq = (v < 0) ? qf++ : qb++;
          Pb[nq] = np;
          Qb[np] = (int32_t)nq;
        }
        if (qf != g0 + gm / 2 || qb != g0 + gm) return -1;  // defensive
      }
      std::swap(Pa, Pb);
      std::swap(Qa, Qb);
      std::swap(IDa, IDb);
    }
    // 7 swaps: latest data sits in the "2" arrays (IDa aliases baseID2);
    // copy the segment slice back so the color pass reads baseID
    if (IDa != baseID)
      std::copy(IDa + s0, IDa + s0 + seg, baseID + s0);
  }
  const int64_t csz = seg >> 7;
  for (int64_t p = 0; p < E; ++p)
    colors[baseID[p]] = (int32_t)((p % seg) / csz);
  return 0;
}


// Planner-shaped entry: the source vertex of edge i is ALWAYS i/128 (the
// route grids are row-major (rows, 128) in source order), so only the
// int32 dst-row array crosses the boundary — materializing the int64
// su/dv pair cost ~1 s/array in numpy on the bench host.
void edge_color_rows_i32(int64_t E, const int32_t* dvrow, int64_t nv64,
                         int32_t d, int64_t seg, int32_t* colors) {
  SegColorScratch S;
  S.eu.resize(E); S.ev.resize(E); S.eid.resize(E);
  S.eu2.resize(E); S.ev2.resize(E); S.eid2.resize(E);
  for (int64_t i = 0; i < E; ++i) {
    S.eu[i] = (int32_t)(i >> 7);
    S.ev[i] = dvrow[i];
    S.eid[i] = (int32_t)i;
  }
  run_color_levels(S, E, (int32_t)nv64, d, seg, colors);
}


// ---------------------------------------------------------------------------
// Fused Benes-plan scatter passes (r5).  _plan's numpy forms cost ~7 s at
// 16.8M elements on the 1-core bench host: every stage builds 67 MB int32
// position temps (2-5 arithmetic passes) before a fancy-index scatter.
// Each function below is ONE pass with no temps.  dst is the group-local
// destination flat position per element (see shuffle_plan._plan); colors
// may be null meaning colors[p] = p & 127 (the known_colors case).
// ---------------------------------------------------------------------------

// A stage: out[(r<<7) + colors[p]] = p & 127
void plan_scatter_a_i32(int64_t rows, const int32_t* colors, int32_t* out) {
  for (int64_t p = 0; p < rows * 128; ++p)
    out[((p >> 7) << 7) + colors[p]] = (int32_t)(p & 127);
}

// C stage: out[((grp + (dst[p]>>7)) << 7) | (dst[p]&127)] = colors[p]
// with grp = (r/R)*R
void plan_scatter_c_i32(int64_t rows, int64_t R, const int32_t* dst,
                        const int32_t* colors, int32_t* out) {
  for (int64_t r = 0; r < rows; ++r) {
    const int64_t grp = (r / R) * R;
    const int64_t b = r << 7;
    for (int64_t l = 0; l < 128; ++l) {
      const int32_t d = dst[b + l];
      out[((grp + (d >> 7)) << 7) | (d & 127)] =
          colors ? colors[b + l] : (int32_t)l;
    }
  }
}

// B stage bottoms: out[((grp + (dst[p]>>7)) << 7) | colors[p]] = v(r)
// where v = r & 7 (tile-absolute sub pass) or r % R (group-local subk)
void plan_scatter_b_i32(int64_t rows, int64_t R, int tileabs,
                        const int32_t* dst, const int32_t* colors,
                        int32_t* out) {
  for (int64_t r = 0; r < rows; ++r) {
    const int64_t grp = (r / R) * R;
    const int32_t v = (int32_t)(tileabs ? (r & 7) : (r % R));
    const int64_t b = r << 7;
    for (int64_t l = 0; l < 128; ++l) {
      const int32_t c = colors ? colors[b + l] : (int32_t)l;
      out[((grp + (dst[b + l] >> 7)) << 7) | c] = v;
    }
  }
}

// t-branch next-level dst:
// out[((((r/R)*128 + colors[p]) * nb + (r%R)/128) << 7) | (r&127)]
//   = dst[p] >> 7
void plan_t_next_i32(int64_t rows, int64_t R, const int32_t* dst,
                     const int32_t* colors, int32_t* out) {
  const int64_t nb = R >> 7;
  for (int64_t r = 0; r < rows; ++r) {
    const int64_t grp128 = (r / R) * 128;
    const int64_t srow_hi = (r % R) >> 7;
    const int64_t lane = r & 127;
    const int64_t b = r << 7;
    for (int64_t l = 0; l < 128; ++l) {
      const int32_t c = colors ? colors[b + l] : (int32_t)l;
      out[(((grp128 + c) * nb + srow_hi) << 7) | lane] =
          dst[b + l] >> 7;
    }
  }
}

// free-lanes reindex: out[(r<<7) + colors[p]] = dst[p]
void plan_scatter_freelanes_i32(int64_t rows, const int32_t* dst,
                                const int32_t* colors, int32_t* out) {
  for (int64_t p = 0; p < rows * 128; ++p)
    out[((p >> 7) << 7) + colors[p]] = dst[p];
}

}  // extern "C"
