// Native host tensorizer for fast_eng_super_resolution_tpu.
//
// The reference leans on VTK's C++ filters for its heavy host-side ETL
// (vtkFLUENTReader, vtkRedistributeDataSetFilter, point locators — SURVEY
// §2.3); this library provides the framework's own native equivalents for the
// paths that dominate >1M-node mesh ingestion:
//
//   - cells_to_edges: cell-clique -> deduplicated directed edge list
//     (replaces the O(cells*k^2) Python set loop, GraphDataset.py:853-865).
//   - rcb_assign: recursive coordinate bisection over cell centroids
//     (replaces vtkRedistributeDataSetFilter's kd-tree cuts).
//   - box_intersect_assign: overlap-mode cell->region assignment
//     (AssignToAllIntersectingRegions, GraphDataset.py:1219).
//
// Exposed as a C ABI for ctypes (no pybind11 in this image). Threaded with
// std::thread; no external dependencies.
//
// Build: make -C runtime   (produces libtensorizer.so)

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

int hardware_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n ? static_cast<int>(n) : 8;
}

template <typename F>
void parallel_for(int64_t n, F&& fn) {
  int nt = std::min<int64_t>(hardware_threads(), std::max<int64_t>(n, 1));
  if (nt <= 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t lo = t * chunk, hi = std::min<int64_t>(lo + chunk, n);
    if (lo >= hi) break;
    threads.emplace_back([=, &fn] { fn(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Cell-clique edge extraction.
// cells: [num_cells * k] int64 node ids (uniform cell size k).
// out_edges: caller-allocated [2 * max_edges] int32; returns edge count, or
// -1 if max_edges is too small (call again with a bigger buffer).
int64_t cells_to_edges(const int64_t* cells, int64_t num_cells, int64_t k,
                       int32_t* out_edges, int64_t max_edges) {
  const int64_t pairs_per_cell = k * (k - 1);  // ordered pairs
  const int64_t total = num_cells * pairs_per_cell;
  std::vector<uint64_t> keys(total);

  parallel_for(num_cells, [&](int64_t lo, int64_t hi) {
    for (int64_t c = lo; c < hi; ++c) {
      const int64_t* cell = cells + c * k;
      uint64_t* out = keys.data() + c * pairs_per_cell;
      int64_t idx = 0;
      for (int64_t i = 0; i < k; ++i) {
        for (int64_t j = 0; j < k; ++j) {
          if (i == j) continue;
          uint64_t a = static_cast<uint64_t>(cell[i]);
          uint64_t b = static_cast<uint64_t>(cell[j]);
          out[idx++] = (a << 32) | b;  // assumes node ids < 2^32
        }
      }
    }
  });

  std::sort(keys.begin(), keys.end());
  int64_t count = 0;
  uint64_t prev = ~0ull;
  for (uint64_t key : keys) {
    uint32_t a = static_cast<uint32_t>(key >> 32);
    uint32_t b = static_cast<uint32_t>(key & 0xffffffffu);
    if (key == prev || a == b) continue;
    prev = key;
    if (count >= max_edges) return -1;
    out_edges[2 * count] = static_cast<int32_t>(a);
    out_edges[2 * count + 1] = static_cast<int32_t>(b);
    ++count;
  }
  return count;
}

// One node of the RCB cut tree (recorded so overlap assignment can descend
// cell AABBs in O(log parts + memberships) instead of testing every box —
// the all-pairs test was O(cells x parts): 12e9 box checks and a 12 GB
// membership matrix at 23M cells / 512 parts).
struct RcbNode {
  int axis;
  double cut;
  int32_t left, right;  // child node indices (internal nodes)
  int32_t label;        // >= 0 for leaves, -1 for internal
};

// Recursive coordinate bisection over points (e.g. cell centroids).
// points: [n * 3] float64.  out_assign: [n] int32 region labels.
// out_boxes: [num_parts * 6] float64 (min xyz, max xyz per region).
// Returns this subtree's node index in *tree (or -1 when tree == nullptr).
static int rcb_split(const double* pts, std::vector<int64_t>& idx,
                     int64_t lo, int64_t hi, int parts, int* next_label,
                     int32_t* assign, double* boxes, const double* box_lo,
                     const double* box_hi,
                     std::vector<RcbNode>* tree = nullptr) {
  if (parts == 1) {
    int label = (*next_label)++;
    for (int64_t i = lo; i < hi; ++i) assign[idx[i]] = label;
    for (int d = 0; d < 3; ++d) {
      boxes[label * 6 + d] = box_lo[d];
      boxes[label * 6 + 3 + d] = box_hi[d];
    }
    if (tree) {
      tree->push_back({0, 0.0, -1, -1, label});
      return static_cast<int>(tree->size()) - 1;
    }
    return -1;
  }
  int n_left = parts / 2;
  int64_t count = hi - lo;
  if (count < 2) {
    // fewer points than parts (degenerate mesh): cut the BOX midpoint (or
    // the lone point's coordinate) and recurse so every label still gets a
    // possibly-empty region — nth_element on a <2-point range is UB and
    // idx[lo + k] would read past the subrange.  Mirrors the pure-Python
    // guard in partition.py:rcb_regions.
    int axis = 0;
    double span = -1;
    for (int d = 0; d < 3; ++d) {
      if (box_hi[d] - box_lo[d] > span) {
        span = box_hi[d] - box_lo[d];
        axis = d;
      }
    }
    double cut = count == 1 ? pts[idx[lo] * 3 + axis]
                            : 0.5 * (box_lo[axis] + box_hi[axis]);
    double lo_l[3], hi_l[3], lo_r[3], hi_r[3];
    std::memcpy(lo_l, box_lo, sizeof(lo_l));
    std::memcpy(hi_l, box_hi, sizeof(hi_l));
    std::memcpy(lo_r, box_lo, sizeof(lo_r));
    std::memcpy(hi_r, box_hi, sizeof(hi_r));
    hi_l[axis] = cut;
    lo_r[axis] = cut;
    int left = rcb_split(pts, idx, lo, hi, n_left, next_label, assign, boxes,
                         lo_l, hi_l, tree);
    int right = rcb_split(pts, idx, hi, hi, parts - n_left, next_label,
                          assign, boxes, lo_r, hi_r, tree);
    if (tree) {
      tree->push_back({axis, cut, left, right, -1});
      return static_cast<int>(tree->size()) - 1;
    }
    return -1;
  }
  int64_t k = static_cast<int64_t>(
      static_cast<double>(n_left) / parts * count + 0.5);
  k = std::max<int64_t>(1, std::min<int64_t>(k, count - 1));

  // longest axis of the population
  double mins[3] = {1e300, 1e300, 1e300}, maxs[3] = {-1e300, -1e300, -1e300};
  for (int64_t i = lo; i < hi; ++i) {
    const double* p = pts + idx[i] * 3;
    for (int d = 0; d < 3; ++d) {
      mins[d] = std::min(mins[d], p[d]);
      maxs[d] = std::max(maxs[d], p[d]);
    }
  }
  int axis = 0;
  double span = -1;
  for (int d = 0; d < 3; ++d) {
    if (maxs[d] - mins[d] > span) {
      span = maxs[d] - mins[d];
      axis = d;
    }
  }
  std::nth_element(idx.begin() + lo, idx.begin() + lo + k, idx.begin() + hi,
                   [&](int64_t a, int64_t b) {
                     return pts[a * 3 + axis] < pts[b * 3 + axis];
                   });
  double cut = pts[idx[lo + k] * 3 + axis];
  double lo_l[3], hi_l[3], lo_r[3], hi_r[3];
  std::memcpy(lo_l, box_lo, sizeof(lo_l));
  std::memcpy(hi_l, box_hi, sizeof(hi_l));
  std::memcpy(lo_r, box_lo, sizeof(lo_r));
  std::memcpy(hi_r, box_hi, sizeof(hi_r));
  hi_l[axis] = cut;
  lo_r[axis] = cut;
  int left = rcb_split(pts, idx, lo, lo + k, n_left, next_label, assign, boxes,
                       lo_l, hi_l, tree);
  int right = rcb_split(pts, idx, lo + k, hi, parts - n_left, next_label,
                        assign, boxes, lo_r, hi_r, tree);
  if (tree) {
    tree->push_back({axis, cut, left, right, -1});
    return static_cast<int>(tree->size()) - 1;
  }
  return -1;
}

void rcb_assign(const double* points, int64_t n, int num_parts,
                int32_t* out_assign, double* out_boxes) {
  std::vector<int64_t> idx(n);
  for (int64_t i = 0; i < n; ++i) idx[i] = i;
  double lo[3] = {1e300, 1e300, 1e300}, hi[3] = {-1e300, -1e300, -1e300};
  for (int64_t i = 0; i < n; ++i) {
    for (int d = 0; d < 3; ++d) {
      lo[d] = std::min(lo[d], points[i * 3 + d]);
      hi[d] = std::max(hi[d], points[i * 3 + d]);
    }
  }
  int next_label = 0;
  rcb_split(points, idx, 0, n, num_parts, &next_label, out_assign, out_boxes,
            lo, hi);
}

// Full subdomain extraction for one partition: given the global cell array
// and this partition's cell ids, produce the sorted-unique global node ids,
// the locally-reindexed deduplicated directed edge list (receiver-major
// order so downstream scatters see sorted segment ids), all in one pass.
// Returns 0 on success, -1 if a capacity is insufficient.
// out_counts = {num_gids, num_edges}.
int64_t extract_subdomain(const int64_t* cells, int64_t k,
                          const int64_t* cell_ids, int64_t n_cells,
                          int64_t* out_gids, int64_t gid_cap,
                          int32_t* out_edges, int64_t edge_cap,
                          int64_t* out_counts) {
  // 1. unique node ids of this partition's cells
  std::vector<int64_t> nodes(n_cells * k);
  for (int64_t c = 0; c < n_cells; ++c) {
    const int64_t* cell = cells + cell_ids[c] * k;
    for (int64_t j = 0; j < k; ++j) nodes[c * k + j] = cell[j];
  }
  std::sort(nodes.begin(), nodes.end());
  nodes.erase(std::unique(nodes.begin(), nodes.end()), nodes.end());
  int64_t n_gids = static_cast<int64_t>(nodes.size());
  if (n_gids > gid_cap) return -1;
  std::copy(nodes.begin(), nodes.end(), out_gids);

  // 2. local ordered pairs, keyed receiver-major for sorted segment ids
  auto local_of = [&](int64_t g) {
    return static_cast<uint64_t>(
        std::lower_bound(nodes.begin(), nodes.end(), g) - nodes.begin());
  };
  const int64_t pairs_per_cell = k * (k - 1);
  std::vector<uint64_t> keys(n_cells * pairs_per_cell);
  for (int64_t c = 0; c < n_cells; ++c) {
    const int64_t* cell = cells + cell_ids[c] * k;
    uint64_t local[16];
    for (int64_t j = 0; j < k; ++j) local[j] = local_of(cell[j]);
    uint64_t* out = keys.data() + c * pairs_per_cell;
    int64_t idx = 0;
    for (int64_t i = 0; i < k; ++i)
      for (int64_t j = 0; j < k; ++j) {
        if (i == j) continue;
        out[idx++] = (local[j] << 32) | local[i];  // receiver-major key
      }
  }
  std::sort(keys.begin(), keys.end());
  int64_t count = 0;
  uint64_t prev = ~0ull;
  for (uint64_t key : keys) {
    uint32_t recv = static_cast<uint32_t>(key >> 32);
    uint32_t send = static_cast<uint32_t>(key & 0xffffffffu);
    if (key == prev || recv == send) continue;
    prev = key;
    if (count >= edge_cap) return -1;
    out_edges[2 * count] = static_cast<int32_t>(send);
    out_edges[2 * count + 1] = static_cast<int32_t>(recv);
    ++count;
  }
  out_counts[0] = n_gids;
  out_counts[1] = count;
  return 0;
}

// One-call extraction for ALL partitions (the round-1 profile showed the
// per-partition extract_subdomain calls dominating >500k-node ETL: a global
// sort over ~35M packed pair keys plus a binary search per cell-node).  This
// variant keeps an O(n_points) local-id map per worker thread, reused across
// its partitions (reset via a touched list, not a full clear), and dedups
// edges with per-receiver buckets — O(E) passes with tiny per-bucket sorts
// instead of one giant sort.
//
// csr_offsets: [num_parts + 1]; csr_ids: concatenated cell ids per partition.
// Outputs are written at per-partition UPPER-BOUND offsets (gids at
// csr_off*k, edge pairs at csr_off*k*(k-1)) so threads write disjoint
// regions; out_counts[2p], out_counts[2p+1] give the actual {n_gids,
// n_edges} and the caller compacts.  Output ordering per partition matches
// extract_subdomain exactly: gids sorted-unique ascending; edges dedup'd,
// receiver-major (receiver ascending, then sender ascending).
// Returns 0, or -1 if n_points/node ids exceed int32 range or k > 16.
int64_t extract_all(const int64_t* cells, int64_t k, int64_t n_points,
                    const int64_t* csr_offsets, const int64_t* csr_ids,
                    int num_parts, int64_t* out_gids, int32_t* out_edges,
                    int64_t* out_counts) {
  if (n_points >= (int64_t(1) << 31) || k > 16) return -1;
  const int64_t ppc = k * (k - 1);  // ordered pairs per cell
  std::atomic<int> overflow{0};

  parallel_for(num_parts, [&](int64_t p_lo, int64_t p_hi) {
    std::vector<int32_t> local(n_points, -1);  // global id -> local rank
    std::vector<int64_t> touched;
    std::vector<int32_t> bucket_off;   // per-receiver slot cursor / offsets
    std::vector<int32_t> senders_buf;  // receiver-bucketed sender ids

    for (int64_t p = p_lo; p < p_hi; ++p) {
      const int64_t c_lo = csr_offsets[p], c_hi = csr_offsets[p + 1];
      if ((c_hi - c_lo) * ppc > INT32_MAX) {  // bucket cursors are int32
        overflow.store(1);
        continue;
      }
      int64_t* gids = out_gids + csr_offsets[p] * k;
      int32_t* edges = out_edges + 2 * csr_offsets[p] * ppc;

      // 1. unique global ids (sorted) + local ranks in the reusable map
      touched.clear();
      for (int64_t c = c_lo; c < c_hi; ++c) {
        const int64_t* cell = cells + csr_ids[c] * k;
        for (int64_t j = 0; j < k; ++j) {
          int64_t g = cell[j];
          if (local[g] < 0) {
            local[g] = 0;
            touched.push_back(g);
          }
        }
      }
      std::sort(touched.begin(), touched.end());
      const int64_t n_gids = static_cast<int64_t>(touched.size());
      for (int64_t r = 0; r < n_gids; ++r) {
        gids[r] = touched[r];
        local[touched[r]] = static_cast<int32_t>(r);
      }

      // 2. receiver degrees (each cell gives every member k-1 in-slots)
      bucket_off.assign(n_gids + 1, 0);
      for (int64_t c = c_lo; c < c_hi; ++c) {
        const int64_t* cell = cells + csr_ids[c] * k;
        for (int64_t j = 0; j < k; ++j)
          bucket_off[local[cell[j]] + 1] += static_cast<int32_t>(k - 1);
      }
      for (int64_t r = 0; r < n_gids; ++r) bucket_off[r + 1] += bucket_off[r];
      senders_buf.resize(bucket_off[n_gids]);

      // 3. scatter senders into their receiver's bucket
      for (int64_t c = c_lo; c < c_hi; ++c) {
        const int64_t* cell = cells + csr_ids[c] * k;
        int32_t l[16];
        for (int64_t j = 0; j < k; ++j) l[j] = local[cell[j]];
        for (int64_t j = 0; j < k; ++j) {
          int32_t* slot = senders_buf.data() + bucket_off[local[cell[j]]];
          int32_t wrote = 0;
          for (int64_t i = 0; i < k; ++i)
            if (i != j) slot[wrote++] = l[i];
          bucket_off[local[cell[j]]] += wrote;
        }
      }
      // bucket_off[r] now points at bucket END of receiver r (== start of
      // r+1's original offset); recover starts by walking backwards.
      // start(r) = bucket_off[r-1] for r>0, 0 for r=0 — post-increment above
      // shifted each entry to its end.

      // 4. per-bucket sort+unique, emit receiver-major
      int64_t n_edges = 0;
      int32_t start = 0;
      for (int64_t r = 0; r < n_gids; ++r) {
        int32_t end = bucket_off[r];
        std::sort(senders_buf.begin() + start, senders_buf.begin() + end);
        int32_t prev = -1;
        for (int32_t s = start; s < end; ++s) {
          int32_t snd = senders_buf[s];
          if (snd == prev || snd == static_cast<int32_t>(r)) continue;
          prev = snd;
          edges[2 * n_edges] = snd;
          edges[2 * n_edges + 1] = static_cast<int32_t>(r);
          ++n_edges;
        }
        start = end;
      }

      out_counts[2 * p] = n_gids;
      out_counts[2 * p + 1] = n_edges;
      for (int64_t g : touched) local[g] = -1;  // cheap reset, map reused
    }
  });
  return overflow.load() ? -1 : 0;
}

// Overlap-mode assignment: cell -> every region whose box intersects the
// cell's AABB.  cell_lo/cell_hi: [n * 3]; boxes: [num_parts * 6].
// out: [n * num_parts] uint8 membership matrix.
void box_intersect_assign(const double* cell_lo, const double* cell_hi,
                          int64_t n, const double* boxes, int num_parts,
                          uint8_t* out) {
  parallel_for(n, [&](int64_t lo_i, int64_t hi_i) {
    for (int64_t i = lo_i; i < hi_i; ++i) {
      for (int p = 0; p < num_parts; ++p) {
        const double* blo = boxes + p * 6;
        const double* bhi = boxes + p * 6 + 3;
        bool hit = true;
        for (int d = 0; d < 3; ++d) {
          if (cell_hi[i * 3 + d] < blo[d] || cell_lo[i * 3 + d] > bhi[d]) {
            hit = false;
            break;
          }
        }
        out[i * num_parts + p] = hit ? 1 : 0;
      }
    }
  });
}

// One-call overlap partition assignment: centroids + AABBs from (points,
// cells), RCB over centroids, box-intersection membership, emitted as CSR
// (offsets + concatenated cell ids per partition).  Threads everywhere the
// work is per-cell.  Returns total assignment count, or -1 if ids_cap is too
// small (call again with a larger buffer).
int64_t rcb_overlap_assign(const float* points, const int64_t* cells,
                           int64_t n_cells, int64_t k, int num_parts,
                           int mode_overlap, int64_t* out_offsets,
                           int64_t* out_ids, int64_t ids_cap,
                           double* out_boxes) {
  std::vector<double> centroids(n_cells * 3);
  std::vector<double> lo(n_cells * 3), hi(n_cells * 3);
  parallel_for(n_cells, [&](int64_t a, int64_t b) {
    for (int64_t c = a; c < b; ++c) {
      double cen[3] = {0, 0, 0};
      double mn[3] = {1e300, 1e300, 1e300}, mx[3] = {-1e300, -1e300, -1e300};
      for (int64_t j = 0; j < k; ++j) {
        const float* p = points + cells[c * k + j] * 3;
        for (int d = 0; d < 3; ++d) {
          double v = p[d];
          cen[d] += v;
          mn[d] = std::min(mn[d], v);
          mx[d] = std::max(mx[d], v);
        }
      }
      for (int d = 0; d < 3; ++d) {
        centroids[c * 3 + d] = cen[d] / k;
        lo[c * 3 + d] = mn[d];
        hi[c * 3 + d] = mx[d];
      }
    }
  });

  std::vector<int32_t> assign(n_cells);
  std::vector<RcbNode> tree;
  int root;
  {
    std::vector<int64_t> idxv(n_cells);
    for (int64_t i = 0; i < n_cells; ++i) idxv[i] = i;
    double glo[3] = {1e300, 1e300, 1e300}, ghi[3] = {-1e300, -1e300, -1e300};
    for (int64_t i = 0; i < n_cells; ++i) {
      for (int d = 0; d < 3; ++d) {
        glo[d] = std::min(glo[d], centroids[i * 3 + d]);
        ghi[d] = std::max(ghi[d], centroids[i * 3 + d]);
      }
    }
    int next_label = 0;
    root = rcb_split(centroids.data(), idxv, 0, n_cells, num_parts,
                     &next_label, assign.data(), out_boxes, glo, ghi, &tree);
  }

  if (!mode_overlap) {
    std::vector<int64_t> counts(num_parts, 0);
    for (int64_t c = 0; c < n_cells; ++c) counts[assign[c]]++;
    out_offsets[0] = 0;
    for (int p = 0; p < num_parts; ++p) out_offsets[p + 1] = out_offsets[p] + counts[p];
    if (out_offsets[num_parts] > ids_cap) return -1;
    std::vector<int64_t> cursor(out_offsets, out_offsets + num_parts);
    for (int64_t c = 0; c < n_cells; ++c) out_ids[cursor[assign[c]]++] = c;
    return out_offsets[num_parts];
  }

  // overlap: descend each cell's AABB through the recorded cut tree —
  // O(cells * (log parts + memberships)) and no n_cells x num_parts
  // membership matrix.  Semantics identical to all-pairs box intersection
  // with inclusive bounds: a subtree's box is the intersection of the cut
  // halfspaces along its path, and cell AABBs (built from in-bounds mesh
  // points) always intersect the root box.  Two chunked passes (count,
  // fill) keep out_ids ascending-by-cell within each partition, matching
  // the previous serial fill.
  const int64_t nchunk =
      std::min<int64_t>(hardware_threads(), std::max<int64_t>(n_cells, 1));
  const int64_t chunk = (n_cells + nchunk - 1) / nchunk;
  std::vector<std::vector<int64_t>> chunk_counts(
      nchunk, std::vector<int64_t>(num_parts, 0));

  auto for_each_membership = [&](int64_t c, auto&& emit) {
    int32_t stack[2048];  // iterative DFS peak = tree depth + 1 (<= ~32)
    int sp = 0;
    stack[sp++] = root;
    const double* clo = lo.data() + c * 3;
    const double* chi = hi.data() + c * 3;
    while (sp) {
      const RcbNode& nd = tree[stack[--sp]];
      if (nd.label >= 0) {
        emit(nd.label);
        continue;
      }
      if (clo[nd.axis] <= nd.cut) stack[sp++] = nd.left;
      if (chi[nd.axis] >= nd.cut) stack[sp++] = nd.right;
    }
  };

  parallel_for(nchunk, [&](int64_t ta, int64_t tb) {
    for (int64_t t = ta; t < tb; ++t) {
      int64_t* cnt = chunk_counts[t].data();
      const int64_t c_hi = std::min(n_cells, (t + 1) * chunk);
      for (int64_t c = t * chunk; c < c_hi; ++c)
        for_each_membership(c, [&](int32_t p) { ++cnt[p]; });
    }
  });
  out_offsets[0] = 0;
  for (int p = 0; p < num_parts; ++p) {
    int64_t total = 0;
    for (int64_t t = 0; t < nchunk; ++t) total += chunk_counts[t][p];
    out_offsets[p + 1] = out_offsets[p] + total;
  }
  if (out_offsets[num_parts] > ids_cap) return -1;

  // per-(chunk, part) write cursors: partition offset + earlier chunks
  std::vector<std::vector<int64_t>> cursor(
      nchunk, std::vector<int64_t>(num_parts));
  for (int p = 0; p < num_parts; ++p) {
    int64_t at = out_offsets[p];
    for (int64_t t = 0; t < nchunk; ++t) {
      cursor[t][p] = at;
      at += chunk_counts[t][p];
    }
  }
  parallel_for(nchunk, [&](int64_t ta, int64_t tb) {
    for (int64_t t = ta; t < tb; ++t) {
      int64_t* cur = cursor[t].data();
      const int64_t c_hi = std::min(n_cells, (t + 1) * chunk);
      for (int64_t c = t * chunk; c < c_hi; ++c)
        for_each_membership(c, [&](int32_t p) { out_ids[cur[p]++] = c; });
    }
  });
  return out_offsets[num_parts];
}

}  // extern "C"
