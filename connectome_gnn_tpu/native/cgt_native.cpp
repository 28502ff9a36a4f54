// Native host-side graph preprocessing kernels.
//
// The TPU compute path is JAX/XLA/Pallas; this library accelerates the
// *host* runtime around it — the giant-graph ingest path (reordering,
// band packing) whose numpy implementations are Python-loop- or
// np.add.at-bound at voxel-connectome scale (millions of nodes/edges).
//
// Every function is an exact drop-in for its numpy reference (same visit
// order, same float accumulation order → bitwise-identical results); the
// equivalence is asserted in tests/test_native.py.  Plain C ABI, driven
// from Python via ctypes on raw numpy buffers — no pybind11 dependency.

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" {

// Reverse Cuthill-McKee ordering over a symmetrized CSR adjacency.
//
// Mirrors connectome_gnn_tpu/data/reorder.py::reverse_cuthill_mckee
// exactly: components seeded from minimum-degree unvisited nodes (stable
// by index), per-node neighbor lists deduplicated ascending, unvisited
// neighbors enqueued stably by degree, final order reversed.
//
// indptr: [n+1], indices: [indptr[n]] (may contain duplicates),
// degree: [n] (duplicate-counting, as the numpy path computes it),
// out: [n] receives perm with perm[new] = old.
void cgt_rcm(int64_t n, const int64_t* indptr, const int64_t* indices,
             const int64_t* degree, int64_t* out) {
  std::vector<char> visited(n, 0);
  std::vector<int64_t> seeds(n);
  for (int64_t i = 0; i < n; ++i) seeds[i] = i;
  std::stable_sort(seeds.begin(), seeds.end(), [&](int64_t a, int64_t b) {
    return degree[a] < degree[b];
  });

  std::vector<int64_t> queue;
  queue.reserve(n);
  std::vector<int64_t> nbrs;
  int64_t pos = 0;
  for (int64_t s : seeds) {
    if (visited[s]) continue;
    visited[s] = 1;
    size_t qhead = queue.size();
    queue.push_back(s);
    while (qhead < queue.size()) {
      int64_t node = queue[qhead++];
      out[pos++] = node;
      nbrs.assign(indices + indptr[node], indices + indptr[node + 1]);
      std::sort(nbrs.begin(), nbrs.end());
      nbrs.erase(std::unique(nbrs.begin(), nbrs.end()), nbrs.end());
      nbrs.erase(std::remove_if(nbrs.begin(), nbrs.end(),
                                [&](int64_t x) { return visited[x]; }),
                 nbrs.end());
      for (int64_t x : nbrs) visited[x] = 1;
      std::stable_sort(nbrs.begin(), nbrs.end(), [&](int64_t a, int64_t b) {
        return degree[a] < degree[b];
      });
      for (int64_t x : nbrs) queue.push_back(x);
    }
  }
  std::reverse(out, out + n);
}

// COO → block-band packing: band[rb, d+W, r%block, s%block] += w.
//
// Mirrors the np.add.at call in connectome_gnn_tpu/ops/banded.py::to_banded
// (same sequential accumulation order → bitwise-identical floats).
// band must be zero-initialized, shape [nb, 2W+1, block, block] C-order.
void cgt_band_pack(int64_t e, const int64_t* senders,
                   const int64_t* receivers, const float* weights,
                   int64_t block, int64_t W, float* band) {
  const int64_t d1 = (2 * W + 1) * block * block;
  const int64_t d2 = block * block;
  for (int64_t i = 0; i < e; ++i) {
    const int64_t r = receivers[i];
    const int64_t s = senders[i];
    const int64_t rb = r / block;
    const int64_t d = s / block - rb + W;
    band[rb * d1 + d * d2 + (r % block) * block + (s % block)] += weights[i];
  }
}

// Dense [n, n] adjacency accumulation: adj[r, s] += w.
// Mirrors np.add.at in the dense collate path.
void cgt_dense_pack(int64_t e, const int64_t* senders,
                    const int64_t* receivers, const float* weights,
                    int64_t n, float* adj) {
  for (int64_t i = 0; i < e; ++i) {
    adj[receivers[i] * n + senders[i]] += weights[i];
  }
}

}  // extern "C"
