// HNSW approximate-nearest-neighbor index (from-scratch implementation of
// the Malkov & Yashunin algorithm; capability parity with the reference's
// FAISS IndexHNSWFlat, VectorStore_Faiss.py:120 M=32).
//
// Why C++ on host, in a TPU framework: HNSW search is irregular pointer
// chasing over a layered proximity graph — hostile to the TPU's vector
// units — so like the reference (which ran it inside FAISS's C++), it
// lives on the host CPU behind the same index interface as the HBM
// flat/IVF indexes. Single-writer / multi-reader: concurrent searches are
// safe; adds require external serialization (matches FAISS semantics).
//
// Build: g++ -O3 -march=native -shared -fPIC hnsw.cpp -o libhnsw.so
// Binding: ctypes (rag_arc_tpu/index/hnsw.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <queue>
#include <random>
#include <thread>
#include <vector>

namespace {

enum Metric { METRIC_IP = 0, METRIC_L2 = 1 };

struct Hnsw {
  int dim;
  int M;        // max neighbors per node, levels > 0
  int maxM0;    // max neighbors at level 0 (2*M, per the paper)
  int efc;      // beam width during construction
  Metric metric;
  bool sq8;     // scalar int8 storage (per-vector symmetric scale): 4x
                // less resident memory than f32, FAISS IndexHNSWSQ-style
  double level_mult;

  int64_t n = 0;
  std::vector<float> data;                    // n * dim        (f32 mode)
  std::vector<int8_t> codes;                  // n * dim        (sq8 mode)
  std::vector<float> scales;                  // n              (sq8 mode)
  std::vector<int> levels;                    // per node
  std::vector<std::vector<std::vector<int>>> links;  // node -> level -> ids
  std::vector<uint8_t> deleted;
  int entry = -1;
  int max_level = -1;
  std::mt19937_64 rng;

  Hnsw(int dim_, int m, int efc_, int metric_, uint64_t seed, bool sq8_)
      : dim(dim_), M(m), maxM0(2 * m), efc(efc_),
        metric(static_cast<Metric>(metric_)), sq8(sq8_),
        level_mult(1.0 / std::log(std::max(2.0, double(m)))), rng(seed) {}

  inline const float* vec(int64_t id) const { return data.data() + id * dim; }
  inline const int8_t* code(int64_t id) const { return codes.data() + id * dim; }

  // distance: smaller is closer. ip/cosine -> negative dot product.
  inline float dist(const float* a, const float* b) const {
    float acc = 0.f;
    if (metric == METRIC_IP) {
      for (int i = 0; i < dim; ++i) acc += a[i] * b[i];
      return -acc;
    }
    for (int i = 0; i < dim; ++i) {
      const float d = a[i] - b[i];
      acc += d * d;
    }
    return acc;
  }

  // f32 query vs stored node
  inline float dist_qn(const float* q, int64_t id) const {
    if (!sq8) return dist(q, vec(id));
    const int8_t* c = code(id);
    const float s = scales[id];
    float acc = 0.f;
    if (metric == METRIC_IP) {
      for (int i = 0; i < dim; ++i) acc += q[i] * (float)c[i];
      return -acc * s;
    }
    for (int i = 0; i < dim; ++i) {
      const float d = q[i] - (float)c[i] * s;
      acc += d * d;
    }
    return acc;
  }

  // stored node vs stored node (graph construction / link shrinking)
  inline float dist_nn(int64_t a, int64_t b) const {
    if (!sq8) return dist(vec(a), vec(b));
    const int8_t* ca = code(a);
    const int8_t* cb = code(b);
    if (metric == METRIC_IP) {
      int32_t acc = 0;  // |dim * 127^2| < 2^31 for dim < 130k
      for (int i = 0; i < dim; ++i) acc += (int32_t)ca[i] * (int32_t)cb[i];
      return -(float)acc * scales[a] * scales[b];
    }
    const float sa = scales[a], sb = scales[b];
    float acc = 0.f;
    for (int i = 0; i < dim; ++i) {
      const float d = (float)ca[i] * sa - (float)cb[i] * sb;
      acc += d * d;
    }
    return acc;
  }

  int random_level() {
    std::uniform_real_distribution<double> u(0.0, 1.0);
    double r = u(rng);
    if (r <= 0.0) r = 1e-12;
    return static_cast<int>(-std::log(r) * level_mult);
  }

  using Cand = std::pair<float, int>;  // (distance, id)

  // beam search within one layer. Returns up to `ef` closest candidates.
  std::vector<Cand> search_layer(const float* q, int ep, int ef, int level,
                                 bool skip_deleted) const {
    std::vector<uint8_t> visited(n, 0);
    // candidates: min-heap by distance; results: max-heap by distance
    std::priority_queue<Cand, std::vector<Cand>, std::greater<Cand>> cands;
    std::priority_queue<Cand> results;
    const float d0 = dist_qn(q, ep);
    visited[ep] = 1;
    cands.push({d0, ep});
    if (!skip_deleted || !deleted[ep]) results.push({d0, ep});

    while (!cands.empty()) {
      const Cand c = cands.top();
      if (!results.empty() && c.first > results.top().first &&
          (int)results.size() >= ef)
        break;
      cands.pop();
      const auto& nbrs = links[c.second][level];
      for (const int nb : nbrs) {
        if (visited[nb]) continue;
        visited[nb] = 1;
        const float d = dist_qn(q, nb);
        if ((int)results.size() < ef ||
            (!results.empty() && d < results.top().first)) {
          cands.push({d, nb});
          if (!skip_deleted || !deleted[nb]) {
            results.push({d, nb});
            if ((int)results.size() > ef) results.pop();
          }
        }
      }
    }
    std::vector<Cand> out(results.size());
    for (int i = (int)results.size() - 1; i >= 0; --i) {
      out[i] = results.top();
      results.pop();
    }
    return out;  // ascending distance
  }

  // neighbor selection heuristic (paper alg. 4): keep a candidate only if
  // it is closer to q than to every already-selected neighbor — preserves
  // graph diversity, which simple closest-M selection loses. (q enters
  // only through the precomputed c.first distances.)
  std::vector<int> select_neighbors(const std::vector<Cand>& cands,
                                    int m) const {
    std::vector<int> selected;
    selected.reserve(m);
    for (const auto& c : cands) {
      if ((int)selected.size() >= m) break;
      bool keep = true;
      for (const int s : selected) {
        if (dist_nn(c.second, s) < c.first) {
          keep = false;
          break;
        }
      }
      if (keep) selected.push_back(c.second);
    }
    // backfill with closest skipped candidates if underfull
    if ((int)selected.size() < m) {
      for (const auto& c : cands) {
        if ((int)selected.size() >= m) break;
        if (std::find(selected.begin(), selected.end(), c.second) ==
            selected.end())
          selected.push_back(c.second);
      }
    }
    return selected;
  }

  void shrink_links(int node, int level) {
    auto& nbrs = links[node][level];
    const int cap = level == 0 ? maxM0 : M;
    if ((int)nbrs.size() <= cap) return;
    std::vector<Cand> cands;
    cands.reserve(nbrs.size());
    for (const int nb : nbrs) cands.push_back({dist_nn(node, nb), nb});
    std::sort(cands.begin(), cands.end());
    nbrs = select_neighbors(cands, cap);
  }

  int64_t add(const float* v) {
    const int64_t id = n++;
    if (sq8) {
      float amax = 0.f;
      for (int i = 0; i < dim; ++i) amax = std::max(amax, std::fabs(v[i]));
      const float scale = std::max(amax, 1e-12f) / 127.f;
      scales.push_back(scale);
      const float inv = 1.f / scale;
      codes.reserve(codes.size() + dim);
      for (int i = 0; i < dim; ++i) {
        const float r = std::nearbyint(v[i] * inv);
        codes.push_back((int8_t)std::max(-127.f, std::min(127.f, r)));
      }
    } else {
      data.insert(data.end(), v, v + dim);
    }
    const int level = random_level();
    levels.push_back(level);
    links.emplace_back(level + 1);
    deleted.push_back(0);

    if (entry < 0) {
      entry = (int)id;
      max_level = level;
      return id;
    }
    int cur = entry;
    // greedy descent through levels above the node's level
    for (int lc = max_level; lc > level; --lc) {
      bool improved = true;
      float cur_d = dist_qn(v, cur);
      while (improved) {
        improved = false;
        for (const int nb : links[cur][lc]) {
          const float d = dist_qn(v, nb);
          if (d < cur_d) {
            cur_d = d;
            cur = nb;
            improved = true;
          }
        }
      }
    }
    // connect at each level from min(level, max_level) down to 0
    for (int lc = std::min(level, max_level); lc >= 0; --lc) {
      auto cands = search_layer(v, cur, efc, lc, /*skip_deleted=*/false);
      const int m = lc == 0 ? maxM0 : M;
      auto nbrs = select_neighbors(cands, std::min(m, M));
      links[id][lc] = nbrs;
      for (const int nb : nbrs) {
        links[nb][lc].push_back((int)id);
        shrink_links(nb, lc);
      }
      if (!cands.empty()) cur = cands.front().second;
    }
    if (level > max_level) {
      max_level = level;
      entry = (int)id;
    }
    return id;
  }

  void search(const float* q, int k, int ef, float* out_scores,
              int64_t* out_ids) const {
    if (entry < 0 || n == 0) {
      for (int i = 0; i < k; ++i) {
        out_scores[i] = -3.0e38f;
        out_ids[i] = -1;
      }
      return;
    }
    int cur = entry;
    float cur_d = dist_qn(q, cur);
    for (int lc = max_level; lc >= 1; --lc) {
      bool improved = true;
      while (improved) {
        improved = false;
        for (const int nb : links[cur][lc]) {
          const float d = dist_qn(q, nb);
          if (d < cur_d) {
            cur_d = d;
            cur = nb;
            improved = true;
          }
        }
      }
    }
    auto cands =
        search_layer(q, cur, std::max(ef, k), 0, /*skip_deleted=*/true);
    for (int i = 0; i < k; ++i) {
      if (i < (int)cands.size()) {
        // report score with larger-is-better semantics like the device
        // indexes: ip -> dot product; l2 -> negative squared distance
        out_scores[i] =
            metric == METRIC_IP ? -cands[i].first : -cands[i].first;
        out_ids[i] = cands[i].second;
      } else {
        out_scores[i] = -3.0e38f;
        out_ids[i] = -1;
      }
    }
  }
};

}  // namespace

extern "C" {

void* hnsw_create(int dim, int M, int ef_construction, int metric,
                  uint64_t seed, int sq8) {
  return new Hnsw(dim, M, ef_construction, metric, seed, sq8 != 0);
}

int hnsw_is_quantized(void* h) {
  return static_cast<Hnsw*>(h)->sq8 ? 1 : 0;
}

void hnsw_free(void* h) { delete static_cast<Hnsw*>(h); }

int64_t hnsw_add(void* h, const float* vecs, int64_t count) {
  Hnsw* index = static_cast<Hnsw*>(h);
  const int64_t start = index->n;
  for (int64_t i = 0; i < count; ++i) index->add(vecs + i * index->dim);
  return start;
}

void hnsw_search(void* h, const float* queries, int64_t nq, int k, int ef,
                 float* out_scores, int64_t* out_ids) {
  const Hnsw* index = static_cast<const Hnsw*>(h);
  // batch queries fan out across a thread pool: searches only read the
  // graph, so they are embarrassingly parallel (single-writer model —
  // the store's RW lock already serializes adds against searches)
  const int64_t hw = (int64_t)std::thread::hardware_concurrency();
  const int64_t n_threads = std::max<int64_t>(1, std::min<int64_t>({hw, nq, 16}));
  if (n_threads == 1) {
    for (int64_t i = 0; i < nq; ++i)
      index->search(queries + i * index->dim, k, ef, out_scores + i * k,
                    out_ids + i * k);
    return;
  }
  std::atomic<int64_t> next(0);
  auto run = [&]() {
    int64_t i;
    while ((i = next.fetch_add(1)) < nq)
      index->search(queries + i * index->dim, k, ef, out_scores + i * k,
                    out_ids + i * k);
  };
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int64_t t = 0; t < n_threads; ++t) pool.emplace_back(run);
  for (auto& t : pool) t.join();
}

void hnsw_mark_deleted(void* h, const int64_t* ids, int64_t count) {
  Hnsw* index = static_cast<Hnsw*>(h);
  for (int64_t i = 0; i < count; ++i)
    if (ids[i] >= 0 && ids[i] < index->n) index->deleted[ids[i]] = 1;
}

int64_t hnsw_size(void* h) { return static_cast<Hnsw*>(h)->n; }

int64_t hnsw_count_deleted(void* h) {
  const Hnsw* x = static_cast<const Hnsw*>(h);
  int64_t count = 0;
  for (const uint8_t d : x->deleted) count += d;
  return count;
}

void hnsw_get_vector(void* h, int64_t id, float* out) {
  const Hnsw* index = static_cast<const Hnsw*>(h);
  if (index->sq8) {
    const int8_t* c = index->code(id);
    const float s = index->scales[id];
    for (int i = 0; i < index->dim; ++i) out[i] = (float)c[i] * s;
    return;
  }
  std::memcpy(out, index->vec(id), sizeof(float) * index->dim);
}

// -- binary snapshot ------------------------------------------------------

int hnsw_save(void* h, const char* path) {
  const Hnsw* x = static_cast<const Hnsw*>(h);
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  // V2 adds the sq8 flag to the header and stores codes+scales instead of
  // f32 data when set; V1 files still load (f32, header one int shorter)
  const char magic[8] = {'R', 'A', 'T', 'H', 'N', 'S', 'W', '2'};
  std::fwrite(magic, 1, 8, f);
  int32_t header[6] = {x->dim,           x->M,         x->efc,
                       (int32_t)x->metric, x->max_level, x->sq8 ? 1 : 0};
  std::fwrite(header, sizeof(int32_t), 6, f);
  int64_t meta[2] = {x->n, (int64_t)x->entry};
  std::fwrite(meta, sizeof(int64_t), 2, f);
  if (x->sq8) {
    std::fwrite(x->codes.data(), 1, x->codes.size(), f);
    std::fwrite(x->scales.data(), sizeof(float), x->scales.size(), f);
  } else {
    std::fwrite(x->data.data(), sizeof(float), x->data.size(), f);
  }
  std::fwrite(x->levels.data(), sizeof(int), x->levels.size(), f);
  std::fwrite(x->deleted.data(), 1, x->deleted.size(), f);
  for (int64_t i = 0; i < x->n; ++i) {
    for (int lc = 0; lc <= x->levels[i]; ++lc) {
      const auto& nbrs = x->links[i][lc];
      const int32_t sz = (int32_t)nbrs.size();
      std::fwrite(&sz, sizeof(int32_t), 1, f);
      std::fwrite(nbrs.data(), sizeof(int), sz, f);
    }
  }
  std::fclose(f);
  return 0;
}

void* hnsw_load(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  char magic[8];
  if (std::fread(magic, 1, 8, f) != 8 ||
      std::memcmp(magic, "RATHNSW", 7) != 0 ||
      (magic[7] != '1' && magic[7] != '2')) {
    std::fclose(f);
    return nullptr;
  }
  const bool v2 = magic[7] == '2';
  int32_t header[6] = {0, 0, 0, 0, 0, 0};
  int64_t meta[2];
  const size_t nh = v2 ? 6 : 5;
  if (std::fread(header, sizeof(int32_t), nh, f) != nh ||
      std::fread(meta, sizeof(int64_t), 2, f) != 2) {
    std::fclose(f);
    return nullptr;
  }
  Hnsw* x =
      new Hnsw(header[0], header[1], header[2], header[3], 0, header[5] != 0);
  x->max_level = header[4];
  x->n = meta[0];
  x->entry = (int)meta[1];
  x->levels.resize(x->n);
  x->deleted.resize(x->n);
  bool ok = true;
  if (x->sq8) {
    x->codes.resize(x->n * x->dim);
    x->scales.resize(x->n);
    ok = std::fread(x->codes.data(), 1, x->codes.size(), f) == x->codes.size();
    ok = ok && std::fread(x->scales.data(), sizeof(float), x->n, f) ==
                   (size_t)x->n;
  } else {
    x->data.resize(x->n * x->dim);
    ok = std::fread(x->data.data(), sizeof(float), x->data.size(), f) ==
         x->data.size();
  }
  ok = ok && std::fread(x->levels.data(), sizeof(int), x->n, f) == (size_t)x->n;
  ok = ok && std::fread(x->deleted.data(), 1, x->n, f) == (size_t)x->n;
  x->links.resize(x->n);
  for (int64_t i = 0; ok && i < x->n; ++i) {
    x->links[i].resize(x->levels[i] + 1);
    for (int lc = 0; ok && lc <= x->levels[i]; ++lc) {
      int32_t sz = 0;
      ok = std::fread(&sz, sizeof(int32_t), 1, f) == 1 && sz >= 0;
      if (ok) {
        x->links[i][lc].resize(sz);
        ok = std::fread(x->links[i][lc].data(), sizeof(int), sz, f) ==
             (size_t)sz;
      }
    }
  }
  std::fclose(f);
  if (!ok) {
    delete x;
    return nullptr;
  }
  return x;
}

}  // extern "C"
