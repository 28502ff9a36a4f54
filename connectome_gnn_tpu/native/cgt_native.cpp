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

// Row-block-windowed COO → block-band packing for streamed per-shard
// ingest: band is a slab of nb_rows block rows starting at global block
// row rb_lo; edges whose receiver block falls outside [rb_lo,
// rb_lo+nb_rows) are skipped.  Visiting edges in input order regardless
// of the window keeps the per-cell accumulation order identical to a
// full-band cgt_band_pack, so the slab is bitwise-equal to the matching
// rows of the full band.  band must be zero-initialized, shape
// [nb_rows, 2W+1, block, block] C-order.
void cgt_band_pack_range(int64_t e, const int64_t* senders,
                         const int64_t* receivers, const float* weights,
                         int64_t block, int64_t W, int64_t rb_lo,
                         int64_t nb_rows, float* band) {
  const int64_t d1 = (2 * W + 1) * block * block;
  const int64_t d2 = block * block;
  for (int64_t i = 0; i < e; ++i) {
    const int64_t r = receivers[i];
    const int64_t s = senders[i];
    const int64_t rb = r / block - rb_lo;
    if (rb < 0 || rb >= nb_rows) continue;
    const int64_t d = s / block - r / block + W;
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

// k-hop fanout neighbor sampling (GraphSAGE-style), the C++ counterpart
// of connectome_gnn_tpu/data/sampling.py::sample_subgraph.
//
// Same traversal semantics (frontier expansion over in-edges grouped by
// receiver, up to fanout[h] sampled in-edges per node at hop h, nodes
// recorded in discovery order with seeds first, kept edge ids returned
// sorted-unique); sampling uses a splitmix64 PRNG via partial
// Fisher-Yates, so draws are uniform-without-replacement but NOT the
// numpy Generator stream — use the numpy path when bitwise numpy parity
// matters, this one for throughput.
//
// order/starts/ends: receiver-grouped edge index (order[starts[v]..ends[v])
// are edge ids with receiver v); src: edge senders [E].
// out_nodes (cap num_nodes) and out_edges (cap E) receive the results;
// returns 0 on success.
static inline uint64_t splitmix64(uint64_t* s) {
  uint64_t z = (*s += 0x9E3779B97F4A7C15ull);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
  return z ^ (z >> 31);
}

extern "C" int64_t cgt_sample_subgraph(
    int64_t num_nodes, int64_t num_edges, const int64_t* order,
    const int64_t* starts, const int64_t* ends, const int64_t* src,
    int64_t num_seeds, const int64_t* seeds, int64_t num_hops,
    const int64_t* fanout, uint64_t rng_seed, int64_t* out_nodes,
    int64_t* out_n_nodes, int64_t* out_edges, int64_t* out_n_edges) {
  std::vector<int64_t> visited(num_nodes, -1);
  std::vector<int64_t> kept;  // per-node expansions are distinct edges and
  std::vector<int64_t> frontier, next_frontier, scratch;  // each node is
  int64_t n_nodes = 0;  // expanded once → no dedup needed, just a sort

  for (int64_t i = 0; i < num_seeds; ++i) {
    int64_t s = seeds[i];
    if (s < 0 || s >= num_nodes) return 1;
    if (visited[s] < 0) {
      visited[s] = n_nodes;
      out_nodes[n_nodes++] = s;
      frontier.push_back(s);
    }
  }

  uint64_t rng = rng_seed ^ 0xD1B54A32D192ED03ull;
  for (int64_t hop = 0; hop < num_hops && !frontier.empty(); ++hop) {
    const int64_t f = fanout[hop];
    next_frontier.clear();
    for (int64_t node : frontier) {
      const int64_t lo = starts[node], hi = ends[node];
      const int64_t deg = hi - lo;
      scratch.assign(order + lo, order + hi);
      int64_t take = deg < f ? deg : f;
      for (int64_t k = 0; k < take; ++k) {
        // partial Fisher-Yates: uniform without replacement
        int64_t j = k + (int64_t)(splitmix64(&rng) % (uint64_t)(deg - k));
        std::swap(scratch[k], scratch[j]);
        const int64_t e = scratch[k];
        kept.push_back(e);
        const int64_t nbr = src[e];
        // corrupt edge lists must fail loudly like the numpy path, not
        // write out of bounds
        if (nbr < 0 || nbr >= num_nodes) return 2;
        if (visited[nbr] < 0) {
          visited[nbr] = n_nodes;
          out_nodes[n_nodes++] = nbr;
          next_frontier.push_back(nbr);
        }
      }
    }
    frontier.swap(next_frontier);
  }

  // O(K log K) in kept edges, independent of total edge count — the
  // per-sample cost must scale with the minibatch, not the graph
  std::sort(kept.begin(), kept.end());
  for (size_t i = 0; i < kept.size(); ++i) out_edges[i] = kept[i];
  *out_n_nodes = n_nodes;
  *out_n_edges = (int64_t)kept.size();
  return 0;
}

}  // extern "C"
