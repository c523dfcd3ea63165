// Benes-style 3-stage routing for static in-kernel permutations.
//
// A TPU VREG shuffle can permute lanes within a sublane row
// (tpu.dynamic_gather axis=1) or sublanes within a lane column
// (axis=0 + cross-VREG selects), but not both at once. Any static
// permutation of an [R, 128] tile factors into
//
//     lane-shuffle  ∘  sublane-shuffle  ∘  lane-shuffle
//
// by Konig's theorem: model elements as edges of a 128-regular
// bipartite multigraph (source rows x dest rows); a proper
// 128-edge-coloring assigns each element a carrier lane such that no
// two elements of one source row or one dest row share a lane. The
// coloring is computed by Euler-circuit halving (split D-regular into
// two D/2-regular subgraphs by alternating edges along Euler
// circuits), D = 128 = 2^7, so 7 levels of O(E) work.
//
// This is the host-side planning tier of the sorted-gather SpMV
// kernel (ops/kernels/spmv_sorted.py) — the TPU-native replacement
// for the reference's in-kernel merge-path searches
// (include/loops/schedule/merge_path_flat.hxx:267-335): planning cost
// moves to the host, the device executes three O(1)-per-element
// shuffles.
//
// Gather conventions match jnp.take_along_axis:
//   stage1: a1[r, c]    = in[r, s1[r, c]]      (lane gather)
//   stage2: a2[r, c]    = a1[s2[r, c], c]      (sublane gather)
//   stage3: out[r, l]   = a2[r, s3[r, l]]      (lane gather)
// so out[dest[e]] == in[e] for every element e.

#include <cstddef>
#include <cstdint>
#include <thread>
#include <utility>
#include <vector>

// One block's routing with caller-provided scratch (all buffers reused
// across tasks and blocks — the per-task vector churn dominated the
// original implementation's runtime ~10x over the edge-walk itself).
namespace {
struct Scratch {
  std::vector<int> color, edges, buf;
  std::vector<int> off, inc, fill, ptr;
  std::vector<char> used, half;
  std::vector<int> circuit;
  std::vector<std::pair<int, int>> walk;  // (node, incoming slot)
  explicit Scratch(int rows) {
    const int L = 128;
    const int n = rows * L;
    color.resize(n);
    edges.resize(n);
    buf.resize(n);
    off.resize(2 * rows + 1);
    inc.resize(2 * n);
    fill.resize(2 * rows);
    ptr.resize(2 * rows);
    used.resize(n);
    half.resize(n);
    circuit.reserve(n);
    walk.reserve(n + 1);
  }
};

void route_block(int rows, const int32_t* d, int32_t* S1, int32_t* S2,
                 int32_t* S3, Scratch& sc) {
  const int L = 128;
  const int n = rows * L;
  std::vector<int>& color = sc.color;
  std::vector<int>& edges = sc.edges;
  std::vector<int>& buf = sc.buf;
  struct Task {
    int start, len, D, colorBase;
  };

  {
    for (int e = 0; e < n; ++e) edges[e] = e;
    std::vector<Task> tasks{{0, n, L, 0}};

    while (!tasks.empty()) {
      Task t = tasks.back();
      tasks.pop_back();
      if (t.D == 1) {
        for (int i = 0; i < t.len; ++i) color[edges[t.start + i]] = t.colorBase;
        continue;
      }
      const int nodes = 2 * rows;
      // incidence lists over the edges of this class (slot indices)
      std::vector<int>& off = sc.off;
      for (int x = 0; x <= nodes; ++x) off[x] = 0;
      for (int i = 0; i < t.len; ++i) {
        int e = edges[t.start + i];
        ++off[e / L + 1];
        ++off[rows + d[e] / L + 1];
      }
      for (int x = 0; x < nodes; ++x) off[x + 1] += off[x];
      std::vector<int>& inc = sc.inc;
      std::vector<int>& fill = sc.fill;
      for (int x = 0; x < nodes; ++x) fill[x] = off[x];
      for (int i = 0; i < t.len; ++i) {
        int e = edges[t.start + i];
        inc[fill[e / L]++] = i;
        inc[fill[rows + d[e] / L]++] = i;
      }
      std::vector<int>& ptr = sc.ptr;
      for (int x = 0; x < nodes; ++x) ptr[x] = off[x];
      std::vector<char>& used = sc.used;
      std::vector<char>& half = sc.half;
      for (int i = 0; i < t.len; ++i) used[i] = half[i] = 0;
      std::vector<int>& circuit = sc.circuit;
      std::vector<std::pair<int, int>>& walk = sc.walk;

      for (int i0 = 0; i0 < t.len; ++i0) {
        if (used[i0]) continue;
        circuit.clear();
        walk.clear();
        walk.push_back({edges[t.start + i0] / L, -1});
        while (!walk.empty()) {
          int x = walk.back().first;
          int found = -1;
          while (ptr[x] < off[x + 1]) {
            int slot = inc[ptr[x]];
            if (!used[slot]) {
              found = slot;
              break;
            }
            ++ptr[x];
          }
          if (found < 0) {
            int in_slot = walk.back().second;
            walk.pop_back();
            if (in_slot >= 0) circuit.push_back(in_slot);
          } else {
            used[found] = 1;
            int e = edges[t.start + found];
            int u = e / L, v = rows + d[e] / L;
            walk.push_back({x == u ? v : u, found});
          }
        }
        // alternate halves along the circuit: every node's visits pair
        // consecutive edges, so its degree splits exactly in two
        for (std::size_t k = 0; k < circuit.size(); ++k)
          half[circuit[k]] = (char)(k & 1);
      }
      int cntA = 0;
      for (int i = 0; i < t.len; ++i) cntA += !half[i];
      int a = 0, bb = 0;
      for (int i = 0; i < t.len; ++i) {
        int e = edges[t.start + i];
        if (!half[i])
          buf[a++] = e;
        else
          buf[cntA + bb++] = e;
      }
      for (int i = 0; i < t.len; ++i) edges[t.start + i] = buf[i];
      tasks.push_back({t.start, cntA, t.D / 2, t.colorBase});
      tasks.push_back(
          {t.start + cntA, t.len - cntA, t.D / 2, t.colorBase + t.D / 2});
    }

    for (int e = 0; e < n; ++e) {
      int srow = e / L, slane = e % L;
      int drow = d[e] / L, dlane = d[e] % L;
      int c = color[e];
      S1[srow * L + c] = slane;
      S2[drow * L + c] = srow;
      S3[drow * L + dlane] = c;
    }
  }
}
}  // namespace

extern "C" int benes_route(int64_t n_blocks, int32_t rows,
                           const int32_t* dest, int32_t* s1,
                           int32_t* s2, int32_t* s3) {
  const int L = 128;
  const int64_t n = (int64_t)rows * L;
  if (rows <= 0 || (L & (L - 1)) != 0) return 1;

  // blocks are independent: split across hardware threads, one scratch
  // per worker (buffer reuse is what removed the per-task allocation
  // churn; threads add the remaining cores)
  unsigned hw = std::thread::hardware_concurrency();
  int n_workers = (int)(hw ? hw : 1);
  if ((int64_t)n_workers > n_blocks) n_workers = (int)n_blocks;
  // small plans: thread spawn + per-worker Scratch would exceed the
  // routing work itself; require >=4 blocks per worker before going
  // parallel (also keeps shared hosts polite)
  if (n_blocks / 4 < (int64_t)n_workers)
    n_workers = (int)(n_blocks / 4 ? n_blocks / 4 : 1);
  if (n_workers <= 1) {
    Scratch sc(rows);
    for (int64_t b = 0; b < n_blocks; ++b)
      route_block(rows, dest + b * n, s1 + b * n, s2 + b * n, s3 + b * n,
                  sc);
    return 0;
  }
  std::vector<std::thread> workers;
  workers.reserve(n_workers);
  for (int w = 0; w < n_workers; ++w) {
    workers.emplace_back([=]() {
      Scratch sc(rows);
      for (int64_t b = w; b < n_blocks; b += n_workers)
        route_block(rows, dest + b * n, s1 + b * n, s2 + b * n,
                    s3 + b * n, sc);
    });
  }
  for (auto& t : workers) t.join();
  return 0;
}
