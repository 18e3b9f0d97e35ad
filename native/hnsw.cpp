// Compact HNSW (Malkov & Yashunin) approximate nearest-neighbor index, L2.
//
// Native-parity replacement for the reference's FAISS ``IndexHNSWFlat`` used
// by ``DenseHNSWFlatIndexer`` (/root/reference/utils/dpr_utils.py:156-221):
// L2-metric hierarchical small-world graph with efConstruction/efSearch and
// the store_n (M) degree bound. Inner-product search rides on top via the
// DPR aux-dimension trick applied by the Python wrapper.
//
// Single-threaded build, thread-safe concurrent search (const graph).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <memory>
#include <mutex>
#include <queue>
#include <random>
#include <vector>

namespace {

struct HnswIndex {
  int64_t dim;
  int64_t m;        // max degree on upper layers; 2m on layer 0
  int64_t ef_construction;
  int64_t ef_search;
  double level_mult;
  std::mt19937_64 rng;

  std::vector<float> data;              // [n, dim]
  std::vector<int> levels;              // per node
  // neighbors[l][node] -> adjacency (flat, capped)
  std::vector<std::vector<std::vector<int>>> neighbors;
  int entry_point = -1;
  int max_level = -1;

  // Visited-set pool (hnswlib's VisitedListPool idea): a fresh O(n)
  // byte-array memset per beam search is amortized during build but costs
  // every QUERY an n-byte clear (38 MB per search_layer call at 38M
  // docs). Epoch-tagged u32 buffers reset by bumping a generation id;
  // the mutex only guards pool push/pop (ns per query), searches stay
  // safely concurrent because each call owns a buffer exclusively.
  struct Visited {
    std::vector<uint32_t> tags;
    uint32_t gen = 0;
  };
  mutable std::vector<std::unique_ptr<Visited>> visited_pool;
  mutable std::mutex pool_mu;

  std::unique_ptr<Visited> acquire_visited() const {
    std::unique_ptr<Visited> v;
    {
      std::lock_guard<std::mutex> lk(pool_mu);
      if (!visited_pool.empty()) {
        v = std::move(visited_pool.back());
        visited_pool.pop_back();
      }
    }
    if (!v) v = std::make_unique<Visited>();
    if ((int64_t)v->tags.size() < size()) v->tags.resize(size(), 0);
    if (++v->gen == 0) {  // generation wrap: clear once, restart at 1
      std::fill(v->tags.begin(), v->tags.end(), 0);
      v->gen = 1;
    }
    return v;
  }
  void release_visited(std::unique_ptr<Visited> v) const {
    std::lock_guard<std::mutex> lk(pool_mu);
    visited_pool.push_back(std::move(v));
  }

  int64_t size() const { return static_cast<int64_t>(levels.size()); }

  const float* vec(int id) const { return data.data() + id * dim; }

  float dist(const float* a, const float* b) const {
    // Four independent accumulators: a single-accumulator FP reduction
    // cannot be auto-vectorized without -ffast-math (reassociation), and
    // the build spends ~all its time here (768-d L2 per beam candidate).
    // The fixed lane order keeps results deterministic.
    float acc0 = 0.f, acc1 = 0.f, acc2 = 0.f, acc3 = 0.f;
    int64_t i = 0;
    for (; i + 4 <= dim; i += 4) {
      const float d0 = a[i] - b[i];
      const float d1 = a[i + 1] - b[i + 1];
      const float d2 = a[i + 2] - b[i + 2];
      const float d3 = a[i + 3] - b[i + 3];
      acc0 += d0 * d0;
      acc1 += d1 * d1;
      acc2 += d2 * d2;
      acc3 += d3 * d3;
    }
    for (; i < dim; ++i) {
      const float d = a[i] - b[i];
      acc0 += d * d;
    }
    return (acc0 + acc1) + (acc2 + acc3);
  }

  // Greedy descent on one layer toward q from start.
  int greedy(const float* q, int start, int layer) const {
    int cur = start;
    float cur_d = dist(q, vec(cur));
    bool improved = true;
    while (improved) {
      improved = false;
      for (int nb : neighbors[layer][cur]) {
        const float d = dist(q, vec(nb));
        if (d < cur_d) {
          cur_d = d;
          cur = nb;
          improved = true;
        }
      }
    }
    return cur;
  }

  // Beam search on a layer; returns up to ef closest (dist, id) pairs.
  // Visited tracking uses the epoch-tagged pool above (flat array, no
  // hash inserts, no per-call O(n) clear).
  std::vector<std::pair<float, int>> search_layer(
      const float* q, int start, int layer, int64_t ef) const {
    using Pair = std::pair<float, int>;
    std::priority_queue<Pair> results;                         // max-heap
    std::priority_queue<Pair, std::vector<Pair>, std::greater<Pair>> cands;
    auto visited = acquire_visited();
    uint32_t* tags = visited->tags.data();
    const uint32_t gen = visited->gen;
    const float d0 = dist(q, vec(start));
    results.emplace(d0, start);
    cands.emplace(d0, start);
    tags[start] = gen;
    while (!cands.empty()) {
      auto [cd, c] = cands.top();
      if (cd > results.top().first && (int64_t)results.size() >= ef) break;
      cands.pop();
      for (int nb : neighbors[layer][c]) {
        if (tags[nb] == gen) continue;
        tags[nb] = gen;
        const float d = dist(q, vec(nb));
        if ((int64_t)results.size() < ef || d < results.top().first) {
          cands.emplace(d, nb);
          results.emplace(d, nb);
          if ((int64_t)results.size() > ef) results.pop();
        }
      }
    }
    release_visited(std::move(visited));
    std::vector<Pair> out;
    out.reserve(results.size());
    while (!results.empty()) {
      out.push_back(results.top());
      results.pop();
    }
    std::sort(out.begin(), out.end());  // ascending distance
    return out;
  }

  // Neighbor selection heuristic (Malkov & Yashunin Algorithm 4, the rule
  // FAISS/hnswlib use): scan candidates by ascending distance and keep e
  // only if it is closer to the node than to every already-kept neighbor.
  // Plain closest-M selection links each node only into its densest local
  // neighborhood; under clustered data the bidirectional-link pruning then
  // severs the rare inter-cluster edges and layer 0 fragments -- measured
  // as a recall plateau (0.82 at ef=1024 on 500-cluster data) that no ef
  // can recover. The diversity rule preserves those bridge edges.
  // Remaining capacity is backfilled with the nearest pruned candidates
  // (FAISS's keep-pruned-connections behavior) so degree stays full.
  static void select_heuristic(std::vector<std::pair<float, int>>& scored,
                               const HnswIndex& idx, int64_t max_degree,
                               std::vector<int>& out) {
    std::sort(scored.begin(), scored.end());  // ascending distance
    out.clear();
    std::vector<int> pruned;
    for (auto& [d, e] : scored) {
      if ((int64_t)out.size() >= max_degree) break;
      bool diverse = true;
      for (int kept : out) {
        if (idx.dist(idx.vec(e), idx.vec(kept)) < d) {
          diverse = false;
          break;
        }
      }
      if (diverse) {
        out.push_back(e);
      } else {
        pruned.push_back(e);
      }
    }
    for (int e : pruned) {
      if ((int64_t)out.size() >= max_degree) break;
      out.push_back(e);
    }
  }

  static void shrink(std::vector<int>& adj, const HnswIndex& idx, int node,
                     int64_t max_degree) {
    if ((int64_t)adj.size() <= max_degree) return;
    std::vector<std::pair<float, int>> scored;
    scored.reserve(adj.size());
    for (int nb : adj) scored.emplace_back(idx.dist(idx.vec(node), idx.vec(nb)), nb);
    select_heuristic(scored, idx, max_degree, adj);
  }

  void add(const float* v) {
    const int id = static_cast<int>(size());
    data.insert(data.end(), v, v + dim);
    std::uniform_real_distribution<double> unif(0.0, 1.0);
    const int level = static_cast<int>(-std::log(std::max(unif(rng), 1e-12)) *
                                       level_mult);
    levels.push_back(level);
    while ((int)neighbors.size() <= level) neighbors.emplace_back();
    for (int l = 0; l <= level; ++l) {
      neighbors[l].resize(size());
    }
    for (auto& layer : neighbors) layer.resize(size());

    if (entry_point < 0) {
      entry_point = id;
      max_level = level;
      return;
    }
    int cur = entry_point;
    for (int l = max_level; l > level; --l) cur = greedy(v, cur, l);
    for (int l = std::min(level, max_level); l >= 0; --l) {
      auto cands = search_layer(v, cur, l, ef_construction);
      const int64_t max_degree = (l == 0) ? 2 * m : m;
      // the new node links to a DIVERSE subset of the beam (cap m, as in
      // the paper -- layer 0 allows 2m only via later backlink growth)
      std::vector<int>& adj = neighbors[l][id];
      select_heuristic(cands, *this, m, adj);
      for (int nb : adj) {
        neighbors[l][nb].push_back(id);
        shrink(neighbors[l][nb], *this, nb, max_degree);
      }
      if (!cands.empty()) cur = cands.front().second;
    }
    if (level > max_level) {
      max_level = level;
      entry_point = id;
    }
  }

  void search(const float* q, int64_t k, float* dists, int64_t* ids) const {
    if (entry_point < 0) {
      for (int64_t i = 0; i < k; ++i) {
        dists[i] = std::numeric_limits<float>::infinity();
        ids[i] = -1;
      }
      return;
    }
    int cur = entry_point;
    for (int l = max_level; l > 0; --l) cur = greedy(q, cur, l);
    auto found = search_layer(q, cur, 0, std::max<int64_t>(ef_search, k));
    for (int64_t i = 0; i < k; ++i) {
      if (i < (int64_t)found.size()) {
        dists[i] = found[i].first;
        ids[i] = found[i].second;
      } else {
        dists[i] = std::numeric_limits<float>::infinity();
        ids[i] = -1;
      }
    }
  }
};

}  // namespace

extern "C" {

void* convdr_hnsw_create(int64_t dim, int64_t m, int64_t ef_construction,
                         int64_t ef_search, uint64_t seed) {
  auto* idx = new HnswIndex();
  idx->dim = dim;
  idx->m = std::max<int64_t>(m, 2);
  idx->ef_construction = std::max<int64_t>(ef_construction, idx->m);
  idx->ef_search = std::max<int64_t>(ef_search, 1);
  idx->level_mult = 1.0 / std::log(static_cast<double>(idx->m));
  idx->rng.seed(seed);
  return idx;
}

void convdr_hnsw_free(void* handle) { delete static_cast<HnswIndex*>(handle); }

void convdr_hnsw_add(void* handle, const float* vecs, int64_t n) {
  auto* idx = static_cast<HnswIndex*>(handle);
  for (int64_t i = 0; i < n; ++i) idx->add(vecs + i * idx->dim);
}

int64_t convdr_hnsw_size(void* handle) {
  return static_cast<HnswIndex*>(handle)->size();
}

void convdr_hnsw_set_ef_search(void* handle, int64_t ef_search) {
  static_cast<HnswIndex*>(handle)->ef_search = std::max<int64_t>(ef_search, 1);
}

void convdr_hnsw_search(void* handle, const float* queries, int64_t nq,
                        int64_t k, float* dists, int64_t* ids) {
  auto* idx = static_cast<HnswIndex*>(handle);
  for (int64_t q = 0; q < nq; ++q) {
    idx->search(queries + q * idx->dim, k, dists + q * k, ids + q * k);
  }
}

}  // extern "C"
