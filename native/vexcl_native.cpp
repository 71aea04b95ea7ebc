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
// Konig edge coloring by recursive Euler splitting (shuffle-routed SpMV
// plan, vexcl_tpu/sparse/shuffle_plan.py).  d-regular bipartite multigraph
// (d a power of two), vertices su/dv in [0, nv); writes colors in [0, d).
// Workspaces are reused across the recursion; every per-call touch is
// O(edges in the call), so total work is O(E log d).
// ---------------------------------------------------------------------------

namespace {

struct ColorScratch {
  const int64_t* su;
  const int64_t* dv;
  int64_t nv;
  std::vector<int64_t> head;   // 2*nv, -1-initialized, reset after each call
  std::vector<int64_t> nxt;    // 2*E incidence links
  std::vector<int64_t> eid;    // 2*E incidence edge ids
  std::vector<char> side;      // 2*E incidence side (1 = src)
  std::vector<char> used;      // E
  std::vector<char> fwd;       // E
  int32_t* colors;
};

void euler_color_rec(ColorScratch& S, std::vector<int64_t>& edges,
                     int32_t d, int32_t base) {
  if (d == 1) {
    for (int64_t e : edges) S.colors[e] = base;
    return;
  }
  const int64_t nv = S.nv;
  // build per-vertex incidence linked lists for this edge subset
  int64_t slot = 0;
  for (int64_t e : edges) {
    int64_t u = S.su[e];
    S.eid[slot] = e; S.side[slot] = 1; S.nxt[slot] = S.head[u];
    S.head[u] = slot++;
    int64_t v = S.dv[e] + nv;
    S.eid[slot] = e; S.side[slot] = 0; S.nxt[slot] = S.head[v];
    S.head[v] = slot++;
  }
  // Euler circuits: orient edges; all degrees even so walks close
  for (int64_t e0 : edges) {
    if (S.used[e0]) continue;
    int64_t v = S.su[e0];
    while (true) {
      int64_t i = S.head[v];
      while (i != -1 && S.used[S.eid[i]]) i = S.nxt[i];
      S.head[v] = i;
      if (i == -1) break;
      int64_t e = S.eid[i];
      S.used[e] = 1;
      if (S.side[i]) { S.fwd[e] = 1; v = S.dv[e] + nv; }
      else           { S.fwd[e] = 0; v = S.su[e]; }
    }
  }
  // reset touched workspace entries
  for (int64_t e : edges) {
    S.head[S.su[e]] = -1;
    S.head[S.dv[e] + nv] = -1;
    S.used[e] = 0;
  }
  std::vector<int64_t> half0, half1;
  half0.reserve(edges.size() / 2);
  half1.reserve(edges.size() / 2);
  for (int64_t e : edges) (S.fwd[e] ? half0 : half1).push_back(e);
  { std::vector<int64_t>().swap(edges); }  // free before recursing
  euler_color_rec(S, half0, d / 2, base);
  euler_color_rec(S, half1, d / 2, base + d / 2);
}

}  // namespace

extern "C" {

void edge_color_pow2(int64_t E, const int64_t* su, const int64_t* dv,
                     int64_t nv, int32_t d, int32_t* colors) {
  ColorScratch S;
  S.su = su; S.dv = dv; S.nv = nv; S.colors = colors;
  S.head.assign(2 * nv, -1);
  S.nxt.resize(2 * E);
  S.eid.resize(2 * E);
  S.side.resize(2 * E);
  S.used.assign(E, 0);
  S.fwd.assign(E, 0);
  std::vector<int64_t> edges(E);
  for (int64_t e = 0; e < E; ++e) edges[e] = e;
  euler_color_rec(S, edges, d, 0);
}

}  // extern "C"
