// Native host kernels for pagraph_tpu.
//
// TPU-native equivalents of the reference's C++ dependency surface
// (SURVEY.md §2.3): N2 — the multi-threaded CSR neighbor sampler that DGL
// provides (dgl.contrib.sampling.NeighborSampler); N1 — the hot
// gather-from-host-store path of the shared-memory feature store.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// Build: g++ -O3 -march=native -shared -fPIC -fopenmp.
//
// Sampling semantics match pagraph_tpu/sampling/sampler.py exactly
// (property-tested against it):
//   deg == 0          -> all slots masked
//   0 < deg <= fanout -> take all in-neighbors (slots k < deg)
//   deg > fanout      -> `fanout` uniform draws with replacement
// Layer dedup keeps first-occurrence order, so the dst set occupies the
// prefix of the src layer (the subset invariant the models rely on).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

// SplitMix64: fast, well-distributed, seedable per (batch, vertex, slot).
static inline uint64_t splitmix64(uint64_t x) {
  x += 0x9E3779B97F4A7C15ULL;
  x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ULL;
  x = (x ^ (x >> 27)) * 0x94D049BB133111EBULL;
  return x ^ (x >> 31);
}

}  // namespace

extern "C" {

// Sample one minibatch. All output buffers are caller-allocated.
//
//   indptr   [num_nodes+1] int64   in-CSR of the (partition) graph
//   indices  [num_edges]   int32
//   seeds    [num_seeds]   int64   num_seeds <= caps[hops]
//   fanouts  [hops]        int32   per-hop fanout; fanouts[0] expands from
//                                  the seeds (block hops-1), fanouts[hops-1]
//                                  produces the outermost layer (block 0)
//   caps     [hops+1]      int64   per-layer capacity, caps[0] = outermost
//   pos_of   [num_nodes]   int32   scratch, must be -1 on entry; restored
//                                  to -1 on exit (reusable across calls)
//   layer_nids  [sum(caps)]          int32  zero-padded, layer 0 first
//   layer_sizes [hops+1]             int64  valid count per layer
//   neigh_pos   [sum(caps[b+1]*fanout_of_block_b) for b in 0..hops-1] int32
//               block b (connecting layer b -> b+1) uses
//               caps[b+1]*fanouts[hops-1-b], blocks stored outermost-first
//   neigh_mask  same extent as neigh_pos, uint8
//   self_pos    [sum(caps[i]) for i in 1..hops] int32
//
// Returns 0 on success, -1 if num_seeds exceeds the seed capacity.
int pg_sample_minibatch(
    const int64_t* indptr, const int32_t* indices, int64_t num_nodes,
    const int64_t* seeds, int64_t num_seeds,
    const int32_t* fanouts, int32_t hops, const int64_t* caps, uint64_t seed,
    int32_t* pos_of,
    int32_t* layer_nids, int64_t* layer_sizes,
    int32_t* neigh_pos, uint8_t* neigh_mask, int32_t* self_pos) {
  if (num_seeds > caps[hops]) return -1;

  // Layer offsets into the flat output buffers.
  std::vector<int64_t> nid_off(hops + 2, 0);
  for (int i = 0; i <= hops; ++i) nid_off[i + 1] = nid_off[i] + caps[i];
  // Block b connects layer b (src) -> layer b+1 (dst); block buffers are
  // sized by the dst layer capacity.
  std::vector<int64_t> blk_off(hops + 1, 0), self_off(hops + 1, 0);
  for (int b = 0; b < hops; ++b) {
    blk_off[b + 1] = blk_off[b] + caps[b + 1] * fanouts[hops - 1 - b];
    self_off[b + 1] = self_off[b] + caps[b + 1];
  }

  // Current (inner) layer ids, built from the seeds inward->outward.
  std::vector<int64_t> cur(seeds, seeds + num_seeds);
  std::vector<int64_t> nxt;
  std::vector<int32_t> sampled;  // [m * fanout] neighbor vertex ids
  std::vector<uint8_t> smask;

  // Write the seed layer now.
  layer_sizes[hops] = num_seeds;
  {
    int32_t* dst = layer_nids + nid_off[hops];
    std::memset(dst, 0, sizeof(int32_t) * caps[hops]);
    for (int64_t i = 0; i < num_seeds; ++i) dst[i] = (int32_t)cur[i];
  }

  for (int hop = 0; hop < hops; ++hop) {
    const int blk = hops - hop - 1;       // block index, outermost-first
    const int32_t fanout = fanouts[hop];
    const int64_t cap_src = caps[blk];
    const int64_t cap_dst = caps[blk + 1];
    const int64_t m = (int64_t)cur.size();

    sampled.assign((size_t)m * fanout, 0);
    smask.assign((size_t)m * fanout, 0);

    // Draw neighbors (parallel: independent per dst vertex).
#pragma omp parallel for schedule(static)
    for (int64_t d = 0; d < m; ++d) {
      const int64_t v = cur[d];
      const int64_t lo = indptr[v], hi = indptr[v + 1];
      const int64_t deg = hi - lo;
      int32_t* out = sampled.data() + d * fanout;
      uint8_t* msk = smask.data() + d * fanout;
      if (deg == 0) continue;
      if (deg <= fanout) {
        for (int64_t k = 0; k < deg; ++k) { out[k] = indices[lo + k]; msk[k] = 1; }
      } else {
        uint64_t s = seed ^ splitmix64((uint64_t)v * 0x2545F4914F6CDD1DULL
                                       + (uint64_t)hop);
        for (int32_t k = 0; k < fanout; ++k) {
          s = splitmix64(s);
          out[k] = indices[lo + (int64_t)(s % (uint64_t)deg)];
          msk[k] = 1;
        }
      }
    }

    // Dedup in first-occurrence order: dst set first (subset invariant),
    // then sampled neighbors row-major.  Sequential (cheap vs the draws).
    nxt.clear();
    nxt.reserve((size_t)cap_src);
    for (int64_t i = 0; i < m; ++i) {
      const int64_t v = cur[i];
      if (pos_of[v] < 0) { pos_of[v] = (int32_t)nxt.size(); nxt.push_back(v); }
      self_pos[self_off[blk] + i] = pos_of[v];
    }
    int32_t* npos = neigh_pos + blk_off[blk];
    uint8_t* nmsk = neigh_mask + blk_off[blk];
    std::memset(npos, 0, sizeof(int32_t) * (size_t)(cap_dst * fanout));
    std::memset(nmsk, 0, sizeof(uint8_t) * (size_t)(cap_dst * fanout));
    for (int64_t i = 0; i < m * fanout; ++i) {
      if (!smask[i]) continue;
      const int64_t v = sampled[i];
      int32_t p = pos_of[v];
      if (p < 0) {
        if ((int64_t)nxt.size() >= cap_src) continue;  // overflow: mask edge
        p = (int32_t)nxt.size();
        pos_of[v] = p;
        nxt.push_back(v);
      }
      npos[i] = p;
      nmsk[i] = 1;
    }
    // Zero the padded tail of self_pos for this block.
    for (int64_t i = m; i < cap_dst; ++i) self_pos[self_off[blk] + i] = 0;

    // Emit the src layer.
    layer_sizes[blk] = (int64_t)nxt.size();
    int32_t* lnid = layer_nids + nid_off[blk];
    std::memset(lnid, 0, sizeof(int32_t) * cap_src);
    for (size_t i = 0; i < nxt.size(); ++i) lnid[i] = (int32_t)nxt[i];

    // Reset scratch for the next hop / next call.
    for (int64_t v : nxt) pos_of[v] = -1;
    cur.swap(nxt);
  }
  return 0;
}

// Fused row gather: out[i, :] = src[ids[i], :].  OpenMP over rows — the
// miss-path feature read (reference get_feat_from_server, get_data.py:106-117).
void pg_gather_rows_f32(const float* src, int64_t num_rows, int64_t dim,
                        const int64_t* ids, int64_t n, float* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    std::memcpy(out + i * dim, src + ids[i] * dim, sizeof(float) * dim);
  }
}

// Two-source gather used by multi-field stores: concatenate field slices.
void pg_gather_rows2_f32(const float* a, int64_t dim_a,
                         const float* b, int64_t dim_b,
                         const int64_t* ids, int64_t n, float* out) {
  const int64_t dim = dim_a + dim_b;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    std::memcpy(out + i * dim, a + ids[i] * dim_a, sizeof(float) * dim_a);
    std::memcpy(out + i * dim + dim_a, b + ids[i] * dim_b, sizeof(float) * dim_b);
  }
}

// Computation-aware greedy assignment (PaGraph "dg", SoCC'20 §4.1), the
// scalable path for partition/dg_part.py:dg_assign — bit-identical to the
// numpy stream (same double arithmetic, same exact-equality tie handling,
// reference: PaGraph/partition/dg.py:30-103).  The greedy stream is
// inherently sequential; this removes the per-vertex Python/numpy overhead
// (the SURVEY.md "hard part": O(train · |N_hops|) at papers100M scale).
//
//   indptr/indices  in-CSR of the full graph
//   train_nids      [num_train] int64, streamed in this order
//   avg             balance target train_frac * V / P
//   out             [num_train] int32 partition per train vertex
//
// Scratch is allocated internally: 4 B stamp + 4 B belongs per vertex plus
// num_parts bitmaps of num_nodes bits.
// ``weights``: optional per-train-vertex assignment weight (NULL -> 1.0).
// With w(v) = in_deg(v)+1 and avg = sum(w)/P this balances each
// partition's future CSR EDGE footprint instead of its train-vertex count
// (edge-partitioned mode pads every chip to max_p(E_p), so edge skew is
// wasted HBM — VERDICT r2 #4).  weights == NULL reproduces the reference
// formula bit-for-bit (p_wnum stays integer-valued in doubles).
int pg_dg_assign(const int64_t* indptr, const int32_t* indices,
                 int64_t num_nodes,
                 const int64_t* train_nids, int64_t num_train,
                 int32_t num_parts, int32_t hops, double avg,
                 const double* weights,
                 int32_t* out) {
  if (num_parts <= 0 || hops < 0) return -1;
  std::vector<int32_t> belongs(num_nodes, -1);
  std::vector<int64_t> stamp(num_nodes, -1);
  const int64_t words = (num_nodes + 63) / 64;
  std::vector<uint64_t> closure((size_t)num_parts * words, 0);
  std::vector<double> p_vnum(num_parts, 0.0);
  std::vector<int64_t> r_vnum(num_parts, 0);
  std::vector<double> com(num_parts), score(num_parts);
  std::vector<int32_t> neigh, frontier, next;
  for (int64_t i = 0; i < num_train; ++i) {
    const int64_t nid = train_nids[i];
    if (nid < 0 || nid >= num_nodes) return -2;
    // hops-level in-BFS, deduplicated, excluding nid itself
    // (matches _hop_neighbors / reference in_neighbors_hop, dg.py:18-27)
    neigh.clear();
    frontier.clear();
    stamp[nid] = i;
    frontier.push_back((int32_t)nid);
    for (int32_t h = 0; h < hops; ++h) {
      next.clear();
      for (int32_t v : frontier) {
        for (int64_t e = indptr[v]; e < indptr[v + 1]; ++e) {
          const int32_t u = indices[e];
          if (stamp[u] != i) {
            stamp[u] = i;
            next.push_back(u);
            neigh.push_back(u);
          }
        }
      }
      if (next.empty()) break;
      frontier.swap(next);
    }
    for (int32_t p = 0; p < num_parts; ++p) com[p] = 1.0;
    for (int32_t u : neigh) {
      const int32_t b = belongs[u];
      if (b >= 0) com[b] += 1.0;
    }
    double best = -1.0 / 0.0;
    for (int32_t p = 0; p < num_parts; ++p) {
      score[p] = com[p] * (avg - p_vnum[p]) / ((double)r_vnum[p] + 1.0);
      if (score[p] > best) best = score[p];
    }
    // ties break to the smallest partition, first occurrence on equal size
    int32_t pick = 0;
    double pick_vnum = 1.0 / 0.0;
    for (int32_t p = 0; p < num_parts; ++p) {
      if (score[p] == best && p_vnum[p] < pick_vnum) {
        pick_vnum = p_vnum[p];
        pick = p;
      }
    }
    out[i] = pick;
    belongs[nid] = pick;
    p_vnum[pick] += weights ? weights[i] : 1.0;
    uint64_t* bm = closure.data() + (size_t)pick * words;
    int64_t fresh = 0;
    auto touch = [&](int64_t v) {
      const uint64_t m = 1ULL << (v & 63);
      uint64_t& w = bm[v >> 6];
      if (!(w & m)) {
        w |= m;
        ++fresh;
      }
    };
    for (int32_t u : neigh) touch(u);
    touch(nid);
    r_vnum[pick] += fresh;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Offline-pipeline kernels (round 5): the dataset/partition phases that were
// numpy-bound at 0.5B+ edges (SCALE_r04: rmat gen 2,570 s, closure extraction
// 2,112 s at rmat24x32).  These are the papers100M-scale enablers for
// BASELINE config #5 — the reference gets the equivalents from PaRMAT and
// DGL's C++ sampler (reference: README.md:36-41, PaGraph/partition/utils.py:9-52).

// R-MAT edge generation: m directed edges over 2^scale vertices, Graph500
// quadrant descent.  Each edge owns an independent splitmix64 stream, so the
// draw order is deterministic and parallel.  Self-loops are re-drawn (up to
// 32 attempts, then the dst low bit is flipped) so exactly m edges emerge;
// the numpy generator (data/synthetic.py:rmat_coo) instead filters them out.
// Duplicate edges remain (removed at CSR build, like the COO->CSR round trip).
void pg_rmat_gen(int32_t scale, int64_t m, double a, double b, double c,
                 uint64_t seed, int32_t* src, int32_t* dst) {
  const uint64_t ta = (uint64_t)(a * 18446744073709551616.0);
  const uint64_t tab = (uint64_t)((a + b) * 18446744073709551616.0);
  const uint64_t tabc = (uint64_t)((a + b + c) * 18446744073709551616.0);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < m; ++i) {
    uint64_t s = seed ^ splitmix64((uint64_t)i * 0x9E3779B97F4A7C15ULL + 1);
    int32_t u = 0, v = 0;
    for (int attempt = 0; attempt < 32; ++attempt) {
      u = 0; v = 0;
      for (int32_t bit = 0; bit < scale; ++bit) {
        s = splitmix64(s);
        const uint64_t r = s;
        const int32_t sb = r >= tab ? 1 : 0;
        const int32_t db = ((r >= ta && r < tab) || r >= tabc) ? 1 : 0;
        u = (u << 1) | sb;
        v = (v << 1) | db;
      }
      if (u != v) break;
    }
    if (u == v) v ^= 1;
    src[i] = u;
    dst[i] = v;
  }
}

// Uniform random int8 in [-127, 127] (the pre-quantized feature tier with
// dequant scale 1/127 -> U[-1, 1]).  Independent stream per 8-byte block.
void pg_random_i8(int64_t count, uint64_t seed, int8_t* out) {
  const int64_t blocks = (count + 7) / 8;
#pragma omp parallel for schedule(static)
  for (int64_t blk = 0; blk < blocks; ++blk) {
    uint64_t r = splitmix64(seed ^ ((uint64_t)blk * 0xD1B54A32D192ED03ULL + 7));
    const int64_t lo = blk * 8, hi = std::min(lo + 8, count);
    for (int64_t i = lo; i < hi; ++i) {
      out[i] = (int8_t)((int32_t)((r & 0xFF)) % 255 - 127);
      r >>= 8;
    }
  }
}

// COO (src -> dst) to in-CSR with per-row sort + dedup (scipy parity:
// tocsr().sum_duplicates().sort_indices(), graph.py:from_coo).  Self-loops
// kept iff drop_self == 0.  `indices` must have capacity m; rows are
// compacted in place and the deduplicated edge count returned.  `cursor`
// is int64 scratch [n].  Fills `out_deg` (source-occurrence histogram of the
// deduplicated edges) when non-NULL.
int64_t pg_coo_to_csr(const int32_t* src, const int32_t* dst, int64_t m,
                      int64_t n, int32_t drop_self,
                      int64_t* indptr, int32_t* indices, int64_t* cursor,
                      int32_t* out_deg) {
  std::atomic<int64_t>* counts =
      reinterpret_cast<std::atomic<int64_t>*>(cursor);
#pragma omp parallel for schedule(static)
  for (int64_t v = 0; v < n; ++v) counts[v].store(0, std::memory_order_relaxed);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < m; ++i) {
    if (drop_self && src[i] == dst[i]) continue;
    counts[dst[i]].fetch_add(1, std::memory_order_relaxed);
  }
  indptr[0] = 0;
  for (int64_t v = 0; v < n; ++v)
    indptr[v + 1] = indptr[v] + cursor[v];
#pragma omp parallel for schedule(static)
  for (int64_t v = 0; v < n; ++v) counts[v].store(indptr[v], std::memory_order_relaxed);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < m; ++i) {
    if (drop_self && src[i] == dst[i]) continue;
    const int64_t pos = counts[dst[i]].fetch_add(1, std::memory_order_relaxed);
    indices[pos] = src[i];
  }
  // Per-row sort + unique; new length recorded in cursor.
#pragma omp parallel for schedule(dynamic, 4096)
  for (int64_t v = 0; v < n; ++v) {
    int32_t* lo = indices + indptr[v];
    int32_t* hi = indices + indptr[v + 1];
    std::sort(lo, hi);
    cursor[v] = std::unique(lo, hi) - lo;
  }
  // Compact rows left.  SERIAL: a later row's new region can overlap an
  // EARLIER row's not-yet-copied old region, so a parallel version races
  // across thread boundaries; the sequential memmove is bandwidth-bound
  // (~E*4 bytes) and cheap next to the sort pass.
  std::vector<int64_t> new_start(n + 1);
  new_start[0] = 0;
  for (int64_t v = 0; v < n; ++v) new_start[v + 1] = new_start[v] + cursor[v];
  for (int64_t v = 0; v < n; ++v) {
    const int64_t cnt = cursor[v], from = indptr[v], to = new_start[v];
    if (to != from && cnt > 0)
      std::memmove(indices + to, indices + from, sizeof(int32_t) * cnt);
  }
  std::memcpy(indptr, new_start.data(), sizeof(int64_t) * (n + 1));
  const int64_t e = new_start[n];
  if (out_deg) {
    std::atomic<int32_t>* od = reinterpret_cast<std::atomic<int32_t>*>(out_deg);
#pragma omp parallel for schedule(static)
    for (int64_t v = 0; v < n; ++v) od[v].store(0, std::memory_order_relaxed);
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < e; ++i)
      od[indices[i]].fetch_add(1, std::memory_order_relaxed);
  }
  return e;
}

// Hop closure over the in-CSR: level-synchronous BFS from `seeds`, `hops`
// levels, bitmap-visited (matches partition/utils.py:hop_closure — `visited`
// after all levels, `interior` after hops-1 levels; reference
// PaGraph/partition/utils.py:9-52 collects the same set via a DGL sampler).
// Bitmaps are [ (n+63)/64 ] uint64, caller-zeroed.
void pg_hop_closure(const int64_t* indptr, const int32_t* indices, int64_t n,
                    const int64_t* seeds, int64_t num_seeds, int32_t hops,
                    uint64_t* visited, uint64_t* interior) {
  std::atomic<uint64_t>* vis =
      reinterpret_cast<std::atomic<uint64_t>*>(visited);
  std::vector<int32_t> frontier;
  frontier.reserve(num_seeds);
  for (int64_t i = 0; i < num_seeds; ++i) {
    const int64_t v = seeds[i];
    const uint64_t bit = 1ULL << (v & 63);
    if (!(vis[v >> 6].fetch_or(bit, std::memory_order_relaxed) & bit))
      frontier.push_back((int32_t)v);
  }
  const int64_t words = (n + 63) / 64;
  std::vector<int32_t> next;
  bool interior_done = false;
  for (int32_t depth = 0; depth < hops; ++depth) {
    next.clear();
#pragma omp parallel
    {
      std::vector<int32_t> local;
#pragma omp for schedule(dynamic, 1024) nowait
      for (int64_t i = 0; i < (int64_t)frontier.size(); ++i) {
        const int32_t v = frontier[i];
        for (int64_t e = indptr[v]; e < indptr[v + 1]; ++e) {
          const int32_t u = indices[e];
          const uint64_t bit = 1ULL << (u & 63);
          if (!(vis[u >> 6].load(std::memory_order_relaxed) & bit)) {
            if (!(vis[u >> 6].fetch_or(bit, std::memory_order_relaxed) & bit))
              local.push_back(u);
          }
        }
      }
#pragma omp critical
      next.insert(next.end(), local.begin(), local.end());
    }
    frontier.swap(next);
    // interior = visited state after hops-1 expansion levels
    if (depth == hops - 2) {
      std::memcpy(interior, visited, sizeof(uint64_t) * words);
      interior_done = true;
    }
    if (frontier.empty()) break;
  }
  if (hops == 1) {
    // interior is exactly the seed set (the depth == hops-2 snapshot can
    // never fire); the caller zeroes the buffer.
    for (int64_t i = 0; i < num_seeds; ++i) {
      const int64_t v = seeds[i];
      interior[v >> 6] |= 1ULL << (v & 63);
    }
  } else if (!interior_done) {
    // BFS exhausted before hops-1 levels: visited is final, so the numpy
    // stream's interior == visited.
    std::memcpy(interior, visited, sizeof(uint64_t) * words);
  }
}

// Extract set bits of a bitmap as sorted int64 ids.  Returns the count.
int64_t pg_bitmap_extract(const uint64_t* bm, int64_t words, int64_t* out) {
  std::vector<int64_t> off(words + 1, 0);
#pragma omp parallel for schedule(static)
  for (int64_t w = 0; w < words; ++w)
    off[w + 1] = __builtin_popcountll(bm[w]);
  for (int64_t w = 0; w < words; ++w) off[w + 1] += off[w];
#pragma omp parallel for schedule(static)
  for (int64_t w = 0; w < words; ++w) {
    uint64_t x = bm[w];
    int64_t at = off[w];
    while (x) {
      out[at++] = (w << 6) + __builtin_ctzll(x);
      x &= x - 1;
    }
  }
  return off[words];
}

// Row remap for partition extraction: for each full-graph row r = rows[i],
// map its in-neighbors through full2sub into out_indices starting at
// out_starts[i].  Returns -1 if any neighbor is unmapped (closure violation).
int pg_map_rows(const int64_t* indptr, const int32_t* indices,
                const int32_t* full2sub, const int64_t* rows,
                const int64_t* out_starts, int64_t num_rows,
                int32_t* out_indices) {
  std::atomic<int> bad(0);
#pragma omp parallel for schedule(dynamic, 4096)
  for (int64_t i = 0; i < num_rows; ++i) {
    const int64_t r = rows[i];
    int64_t at = out_starts[i];
    for (int64_t e = indptr[r]; e < indptr[r + 1]; ++e) {
      const int32_t s = full2sub[indices[e]];
      if (s < 0) bad.store(1, std::memory_order_relaxed);
      out_indices[at++] = s;
    }
  }
  return bad.load() ? -1 : 0;
}

// Atomic histogram of int32 values (the out-degree count at sub-CSR scale,
// where np.bincount over 1B+ elements is single-threaded).
void pg_histogram_i32(const int32_t* values, int64_t count, int64_t nbins,
                      int32_t* out) {
  std::atomic<int32_t>* o = reinterpret_cast<std::atomic<int32_t>*>(out);
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < nbins; ++b) o[b].store(0, std::memory_order_relaxed);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < count; ++i)
    o[values[i]].fetch_add(1, std::memory_order_relaxed);
}

// CSR mean-aggregate SpMM: out[v] = norm[v] * sum_{u in N_in(v)} x[u]
// (the preprocess trick's offline pass, reference server/pa_server.py:45-52;
// scipy's single-threaded SpMM was the store_build bottleneck at 0.5B edges).
void pg_spmm_mean_f32(const int64_t* indptr, const int32_t* indices,
                      int64_t n, const float* x, int64_t d,
                      const float* norm, float* out) {
#pragma omp parallel for schedule(dynamic, 4096)
  for (int64_t v = 0; v < n; ++v) {
    float* o = out + v * d;
    std::memset(o, 0, sizeof(float) * d);
    for (int64_t e = indptr[v]; e < indptr[v + 1]; ++e) {
      const float* row = x + (int64_t)indices[e] * d;
      for (int64_t k = 0; k < d; ++k) o[k] += row[k];
    }
    const float nv = norm[v];
    for (int64_t k = 0; k < d; ++k) o[k] *= nv;
  }
}

// CSR mean-aggregate over an int8 (pre-quantized) feature matrix for rows
// [row_lo, row_hi): out[v - row_lo, k] = norm[v] * scale[k] * sum int8 rows.
// Exact: sum_u scale[k]*x[u,k] = scale[k] * sum_u x[u,k]; int64 accumulators
// (hub in-degree * 127 overflows int32 around deg 16.9M).  The row range
// makes the caller's chunked quantize-on-the-fly pass possible without ever
// materializing the full f32 aggregate (papers100M preprocess field).
void pg_spmm_mean_i8(const int64_t* indptr, const int32_t* indices,
                     const int8_t* x, int64_t d,
                     const float* norm, const float* scale,
                     int64_t row_lo, int64_t row_hi, float* out) {
#pragma omp parallel
  {
    std::vector<int64_t> acc(d);
#pragma omp for schedule(dynamic, 2048)
    for (int64_t v = row_lo; v < row_hi; ++v) {
      std::memset(acc.data(), 0, sizeof(int64_t) * d);
      for (int64_t e = indptr[v]; e < indptr[v + 1]; ++e) {
        const int8_t* row = x + (int64_t)indices[e] * d;
        for (int64_t k = 0; k < d; ++k) acc[k] += row[k];
      }
      float* o = out + (v - row_lo) * d;
      const float nv = norm[v];
      for (int64_t k = 0; k < d; ++k) o[k] = nv * scale[k] * (float)acc[k];
    }
  }
}

// int8 row gather (the pre-quantized host tier's miss path).
void pg_gather_rows_i8(const int8_t* src, int64_t num_rows, int64_t dim,
                       const int64_t* ids, int64_t n, int8_t* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    std::memcpy(out + i * dim, src + ids[i] * dim, (size_t)dim);
  }
}

}  // extern "C"
