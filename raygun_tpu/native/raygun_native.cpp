// raygun_native: host-side segmentation + evaluation kernels.
//
// TPU-native rebuild of the reference's native dependency stack (SURVEY
// §2.2): waterz (C++ hierarchical agglomeration, reference segment.py:127-132),
// affogato's mutex watershed (reference segment.py:197-199), skimage's seeded
// watershed (reference segment.py:24-43), and funlib.evaluate's rand_voi
// (reference evaluation/validate_affinities.py:149). Exposed via a C ABI for
// ctypes (no pybind11 in this environment).
//
// Build: make (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <numeric>
#include <queue>
#include <unordered_map>
#include <unordered_set>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// union-find
// ---------------------------------------------------------------------------

struct UnionFind {
    std::vector<int64_t> parent;
    std::vector<int64_t> rank_;

    explicit UnionFind(size_t n) : parent(n), rank_(n, 0) {
        std::iota(parent.begin(), parent.end(), 0);
    }
    int64_t find(int64_t x) {
        while (parent[x] != x) {
            parent[x] = parent[parent[x]];
            x = parent[x];
        }
        return x;
    }
    int64_t merge(int64_t a, int64_t b) {
        a = find(a);
        b = find(b);
        if (a == b) return a;
        if (rank_[a] < rank_[b]) std::swap(a, b);
        parent[b] = a;
        if (rank_[a] == rank_[b]) rank_[a]++;
        return a;
    }
};

// ---------------------------------------------------------------------------
// mutex watershed (affogato compute_mws_segmentation semantics)
// ---------------------------------------------------------------------------
//
// affs:      (C, Z, Y, X) float32. First `sep` channels are ATTRACTIVE with
//            weight = affs value (higher merges earlier); the rest are
//            REPULSIVE (higher separates earlier) — matching the caller-side
//            inversion in reference segment.py:191-194.
// offsets:   (C, 3) int64 voxel offsets.
// strides:   (3,) int64 subsampling of repulsive edges (affogato `strides`).
// mask:      (Z*Y*X) uint8 or NULL; voxels with mask==0 get label 0.
// out:       (Z*Y*X) uint64 segmentation, labels start at 1.

// stride_phase: global voxel coordinate of this array's origin modulo the
// strides — keeps repulsive-edge subsampling phase-consistent when the array
// is a chunk of a larger volume (blockwise MWS).
void mutex_watershed(const float* affs, const int64_t* offsets, int64_t n_offsets,
                     int64_t sep, int64_t Z, int64_t Y, int64_t X,
                     const int64_t* strides, const int64_t* stride_phase,
                     const uint8_t* mask, uint64_t* out) {
    const int64_t N = Z * Y * X;

    struct Edge {
        float w;
        int64_t u, v;
        uint8_t attractive;
    };
    std::vector<Edge> edges;
    edges.reserve(static_cast<size_t>(N) * 2);

    for (int64_t c = 0; c < n_offsets; ++c) {
        const int64_t oz = offsets[c * 3 + 0];
        const int64_t oy = offsets[c * 3 + 1];
        const int64_t ox = offsets[c * 3 + 2];
        const bool attractive = c < sep;
        const int64_t sz = attractive ? 1 : strides[0];
        const int64_t sy = attractive ? 1 : strides[1];
        const int64_t sx = attractive ? 1 : strides[2];
        const int64_t pz = stride_phase ? stride_phase[0] : 0;
        const int64_t py = stride_phase ? stride_phase[1] : 0;
        const int64_t px = stride_phase ? stride_phase[2] : 0;
        for (int64_t z = 0; z < Z; ++z) {
            const int64_t z2 = z + oz;
            if (z2 < 0 || z2 >= Z) continue;
            if (!attractive && ((z + pz) % sz)) continue;
            for (int64_t y = 0; y < Y; ++y) {
                const int64_t y2 = y + oy;
                if (y2 < 0 || y2 >= Y) continue;
                if (!attractive && ((y + py) % sy)) continue;
                for (int64_t x = 0; x < X; ++x) {
                    const int64_t x2 = x + ox;
                    if (x2 < 0 || x2 >= X) continue;
                    if (!attractive && ((x + px) % sx)) continue;
                    const int64_t u = (z * Y + y) * X + x;
                    const int64_t v = (z2 * Y + y2) * X + x2;
                    if (mask && (!mask[u] || !mask[v])) continue;
                    edges.push_back(
                        {affs[c * N + u], u, v, static_cast<uint8_t>(attractive)});
                }
            }
        }
    }

    std::sort(edges.begin(), edges.end(),
              [](const Edge& a, const Edge& b) { return a.w > b.w; });

    UnionFind uf(static_cast<size_t>(N));
    // mutex constraints per root, stored as sorted neighbor-root sets
    std::vector<std::unordered_set<int64_t>> mutexes(static_cast<size_t>(N));

    auto has_mutex = [&](int64_t ra, int64_t rb) {
        const auto& small = mutexes[ra].size() < mutexes[rb].size() ? mutexes[ra]
                                                                    : mutexes[rb];
        const int64_t other = mutexes[ra].size() < mutexes[rb].size() ? rb : ra;
        return small.count(other) > 0;
    };
    auto merge_mutexes = [&](int64_t keep, int64_t gone) {
        if (mutexes[gone].empty()) return;
        for (int64_t m : mutexes[gone]) {
            // m may be stale (merged away); re-resolve
            int64_t rm = uf.find(m);
            if (rm == keep) continue;
            mutexes[keep].insert(rm);
            mutexes[rm].erase(gone);
            mutexes[rm].insert(keep);
        }
        mutexes[gone].clear();
    };

    for (const auto& e : edges) {
        int64_t ru = uf.find(e.u);
        int64_t rv = uf.find(e.v);
        if (ru == rv) continue;
        if (e.attractive) {
            if (has_mutex(ru, rv)) continue;
            int64_t keep = uf.merge(ru, rv);
            int64_t gone = keep == ru ? rv : ru;
            merge_mutexes(keep, gone);
        } else {
            mutexes[ru].insert(rv);
            mutexes[rv].insert(ru);
        }
    }

    // compact labels, masked voxels -> 0
    std::unordered_map<int64_t, uint64_t> relabel;
    relabel.reserve(1024);
    uint64_t next = 1;
    for (int64_t i = 0; i < N; ++i) {
        if (mask && !mask[i]) {
            out[i] = 0;
            continue;
        }
        int64_t r = uf.find(i);
        auto it = relabel.find(r);
        if (it == relabel.end()) {
            relabel.emplace(r, next);
            out[i] = next++;
        } else {
            out[i] = it->second;
        }
    }
}

// ---------------------------------------------------------------------------
// mutex watershed on an explicit edge list (segment-level region graph).
//
// The stitch phase of blockwise MWS (seg/blockwise_mws.py): nodes are
// block-local segment ids (compacted by the caller), edges are aggregated
// cross-block voxel edges. Same Kruskal-with-mutexes semantics as the voxel
// kernel above; edges are sorted by weight descending here.
// out: (n_nodes) uint64 — root id per node (NOT compacted; caller relabels).
// ---------------------------------------------------------------------------

// presorted != 0: edges already sorted by weight descending (e.g. by an
// XLA device sort) — skip the host sort.
void mws_region_graph(const float* w, const int64_t* u, const int64_t* v,
                      const uint8_t* attractive, int64_t n_edges,
                      int64_t n_nodes, int64_t presorted, uint64_t* out) {
    std::vector<int64_t> order(static_cast<size_t>(n_edges));
    std::iota(order.begin(), order.end(), 0);
    if (!presorted)
        std::sort(order.begin(), order.end(),
                  [&](int64_t a, int64_t b) { return w[a] > w[b]; });

    UnionFind uf(static_cast<size_t>(n_nodes));
    std::vector<std::unordered_set<int64_t>> mutexes(
        static_cast<size_t>(n_nodes));
    auto has_mutex = [&](int64_t ra, int64_t rb) {
        const auto& small = mutexes[ra].size() < mutexes[rb].size()
                                ? mutexes[ra] : mutexes[rb];
        const int64_t other =
            mutexes[ra].size() < mutexes[rb].size() ? rb : ra;
        return small.count(other) > 0;
    };
    for (int64_t k = 0; k < n_edges; ++k) {
        const int64_t e = order[k];
        int64_t ru = uf.find(u[e]);
        int64_t rv = uf.find(v[e]);
        if (ru == rv) continue;
        if (attractive[e]) {
            if (has_mutex(ru, rv)) continue;
            int64_t keep = uf.merge(ru, rv);
            int64_t gone = keep == ru ? rv : ru;
            if (!mutexes[gone].empty()) {
                for (int64_t m : mutexes[gone]) {
                    int64_t rm = uf.find(m);
                    if (rm == keep) continue;
                    mutexes[keep].insert(rm);
                    mutexes[rm].erase(gone);
                    mutexes[rm].insert(keep);
                }
                mutexes[gone].clear();
            }
        } else {
            mutexes[ru].insert(rv);
            mutexes[rv].insert(ru);
        }
    }
    for (int64_t i = 0; i < n_nodes; ++i)
        out[i] = static_cast<uint64_t>(uf.find(i));
}

// ---------------------------------------------------------------------------
// seeded watershed (skimage.segmentation.watershed semantics: priority flood
// on image value ascending; we flood on -distance so deepest basins win)
// ---------------------------------------------------------------------------

void seeded_watershed(const float* image, const uint64_t* seeds,
                      const uint8_t* mask, int64_t Z, int64_t Y, int64_t X,
                      uint64_t* out) {
    const int64_t N = Z * Y * X;
    struct QItem {
        float v;
        int64_t order;
        int64_t idx;
        bool operator<(const QItem& o) const {
            // min-heap by (value, insertion order)
            return v != o.v ? v > o.v : order > o.order;
        }
    };
    std::priority_queue<QItem> pq;
    std::memcpy(out, seeds, sizeof(uint64_t) * static_cast<size_t>(N));
    int64_t order = 0;
    for (int64_t i = 0; i < N; ++i) {
        if (mask && !mask[i]) out[i] = 0;
        if (out[i] != 0) pq.push({image[i], order++, i});
    }
    const int64_t stride_z = Y * X, stride_y = X, stride_x = 1;
    const int64_t strides3[6] = {-stride_z, stride_z, -stride_y,
                                 stride_y,  -stride_x, stride_x};
    while (!pq.empty()) {
        QItem it = pq.top();
        pq.pop();
        const int64_t i = it.idx;
        const int64_t z = i / stride_z, y = (i / stride_y) % Y, x = i % X;
        for (int d = 0; d < 6; ++d) {
            int64_t zz = z, yy = y, xx = x;
            if (d == 0) zz--;
            if (d == 1) zz++;
            if (d == 2) yy--;
            if (d == 3) yy++;
            if (d == 4) xx--;
            if (d == 5) xx++;
            if (zz < 0 || zz >= Z || yy < 0 || yy >= Y || xx < 0 || xx >= X)
                continue;
            const int64_t j = i + strides3[d];
            if (out[j] != 0) continue;
            if (mask && !mask[j]) continue;
            out[j] = out[i];
            pq.push({image[j], order++, j});
        }
    }
}

// ---------------------------------------------------------------------------
// waterz-style hierarchical agglomeration with histogram-quantile scoring
// ---------------------------------------------------------------------------
//
// affs: (3, Z, Y, X) nearest-neighbor affinities (offsets (1,0,0),(0,1,0),
// (0,0,1)). fragments: (Z*Y*X) uint64. For each edge between touching
// fragments, score = 1 - quantile_q(boundary affinities, 256-bin histogram) —
// the reference's "OneMinus<HistogramQuantileAffinity<..75..256..>>" scoring
// (reference segment.py:127-132). Merge edges in ascending score order;
// snapshot a segmentation at each threshold.
//
// out: (n_thresholds, Z*Y*X) uint64.

namespace {

struct EdgeHist {
    std::vector<uint32_t> bins;
    uint64_t count = 0;
    EdgeHist() : bins(256, 0) {}
    void add(float a) {
        int b = static_cast<int>(a * 255.0f);
        b = b < 0 ? 0 : (b > 255 ? 255 : b);
        bins[b]++;
        count++;
    }
    void merge(const EdgeHist& o) {
        for (int i = 0; i < 256; ++i) bins[i] += o.bins[i];
        count += o.count;
    }
    float quantile(double q) const {
        if (count == 0) return 0.f;
        const uint64_t target = static_cast<uint64_t>(q * (count - 1));
        uint64_t seen = 0;
        for (int i = 0; i < 256; ++i) {
            seen += bins[i];
            if (seen > target) return i / 255.0f;
        }
        return 1.0f;
    }
};

}  // namespace

void agglomerate(const float* affs, const uint64_t* fragments, int64_t Z,
                 int64_t Y, int64_t X, const float* thresholds,
                 int64_t n_thresholds, double quantile, uint64_t* out) {
    const int64_t N = Z * Y * X;

    // compact fragment ids
    std::unordered_map<uint64_t, int64_t> frag_id;
    frag_id.reserve(4096);
    std::vector<uint64_t> frag_label;
    for (int64_t i = 0; i < N; ++i) {
        uint64_t f = fragments[i];
        if (f == 0) continue;
        if (!frag_id.count(f)) {
            frag_id.emplace(f, static_cast<int64_t>(frag_label.size()));
            frag_label.push_back(f);
        }
    }
    const int64_t n_frags = static_cast<int64_t>(frag_label.size());

    // region graph: edge histograms keyed by (min,max) compact ids
    std::map<std::pair<int64_t, int64_t>, EdgeHist> graph;
    const int64_t offs[3][3] = {{1, 0, 0}, {0, 1, 0}, {0, 0, 1}};
    for (int c = 0; c < 3; ++c) {
        for (int64_t z = 0; z < Z - offs[c][0]; ++z)
            for (int64_t y = 0; y < Y - offs[c][1]; ++y)
                for (int64_t x = 0; x < X - offs[c][2]; ++x) {
                    const int64_t u = (z * Y + y) * X + x;
                    const int64_t v =
                        ((z + offs[c][0]) * Y + (y + offs[c][1])) * X +
                        (x + offs[c][2]);
                    const uint64_t fu = fragments[u], fv = fragments[v];
                    if (fu == 0 || fv == 0 || fu == fv) continue;
                    int64_t a = frag_id[fu], b = frag_id[fv];
                    if (a > b) std::swap(a, b);
                    graph[{a, b}].add(affs[c * N + u]);
                }
    }

    UnionFind uf(static_cast<size_t>(n_frags));
    // adjacency: per-root map of neighbor-root -> hist (lazy merged)
    std::vector<std::unordered_map<int64_t, EdgeHist>> adj(
        static_cast<size_t>(n_frags));
    for (auto& kv : graph) {
        adj[kv.first.first][kv.first.second] = kv.second;
        adj[kv.first.second][kv.first.first] = kv.second;
    }

    struct QEdge {
        float score;
        int64_t a, b;
        bool operator<(const QEdge& o) const { return score > o.score; }
    };
    std::priority_queue<QEdge> pq;
    for (auto& kv : graph) {
        const float s = 1.0f - kv.second.quantile(quantile);
        pq.push({s, kv.first.first, kv.first.second});
    }

    // thresholds must be processed ascending
    std::vector<int64_t> order(n_thresholds);
    std::iota(order.begin(), order.end(), 0);
    std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
        return thresholds[a] < thresholds[b];
    });

    auto snapshot = [&](int64_t t_idx) {
        uint64_t* dst = out + t_idx * N;
        for (int64_t i = 0; i < N; ++i) {
            const uint64_t f = fragments[i];
            if (f == 0) {
                dst[i] = 0;
                continue;
            }
            dst[i] = frag_label[uf.find(frag_id[f])];
        }
    };

    size_t t_pos = 0;
    while (!pq.empty() && t_pos < static_cast<size_t>(n_thresholds)) {
        QEdge e = pq.top();
        pq.pop();
        int64_t ra = uf.find(e.a), rb = uf.find(e.b);
        if (ra == rb) continue;
        // stale check: re-score current edge between the live roots
        auto it = adj[ra].find(rb);
        if (it == adj[ra].end()) continue;
        const float live = 1.0f - it->second.quantile(quantile);
        if (live > e.score + 1e-6f) {
            pq.push({live, ra, rb});
            continue;
        }
        while (t_pos < static_cast<size_t>(n_thresholds) &&
               e.score > thresholds[order[t_pos]]) {
            snapshot(order[t_pos]);
            t_pos++;
        }
        if (t_pos >= static_cast<size_t>(n_thresholds)) break;

        const int64_t keep = uf.merge(ra, rb);
        const int64_t gone = keep == ra ? rb : ra;
        adj[keep].erase(gone);
        adj[gone].erase(keep);
        for (auto& nb : adj[gone]) {
            const int64_t rn = uf.find(nb.first);
            if (rn == keep) continue;
            auto ex = adj[keep].find(rn);
            if (ex == adj[keep].end()) {
                adj[keep][rn] = nb.second;
            } else {
                ex->second.merge(nb.second);
            }
            adj[rn].erase(gone);
            adj[rn][keep] = adj[keep][rn];
            pq.push({1.0f - adj[keep][rn].quantile(quantile), keep, rn});
        }
        adj[gone].clear();
    }
    while (t_pos < static_cast<size_t>(n_thresholds)) {
        snapshot(order[t_pos]);
        t_pos++;
    }
}

// ---------------------------------------------------------------------------
// waterz-style agglomeration over an EXPLICIT region graph (blockwise path:
// the graph is accumulated chunk-by-chunk in Python; this merges it and
// emits one fragment->segment LUT per threshold instead of volumes).
//
// hists: (n_edges, 256) uint32 affinity histograms per edge.
// out:   (n_thresholds, n_nodes) uint64 — root node id per node.
// ---------------------------------------------------------------------------

void agglomerate_graph(const int64_t* u, const int64_t* v,
                       const uint32_t* hists, int64_t n_edges,
                       int64_t n_nodes, const float* thresholds,
                       int64_t n_thresholds, double quantile, uint64_t* out) {
    UnionFind uf(static_cast<size_t>(n_nodes));
    std::vector<std::unordered_map<int64_t, EdgeHist>> adj(
        static_cast<size_t>(n_nodes));
    for (int64_t e = 0; e < n_edges; ++e) {
        EdgeHist h;
        for (int i = 0; i < 256; ++i) h.bins[i] = hists[e * 256 + i];
        h.count = 0;
        for (int i = 0; i < 256; ++i) h.count += h.bins[i];
        auto ita = adj[u[e]].find(v[e]);
        if (ita == adj[u[e]].end()) {
            adj[u[e]][v[e]] = h;
            adj[v[e]][u[e]] = h;
        } else {
            ita->second.merge(h);
            adj[v[e]][u[e]].merge(h);
        }
    }

    struct QEdge {
        float score;
        int64_t a, b;
        bool operator<(const QEdge& o) const { return score > o.score; }
    };
    std::priority_queue<QEdge> pq;
    for (int64_t a = 0; a < n_nodes; ++a)
        for (auto& kv : adj[a])
            if (kv.first > a)
                pq.push({1.0f - kv.second.quantile(quantile), a, kv.first});

    std::vector<int64_t> order(n_thresholds);
    std::iota(order.begin(), order.end(), 0);
    std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
        return thresholds[a] < thresholds[b];
    });

    auto snapshot = [&](int64_t t_idx) {
        uint64_t* dst = out + t_idx * n_nodes;
        for (int64_t i = 0; i < n_nodes; ++i)
            dst[i] = static_cast<uint64_t>(uf.find(i));
    };

    size_t t_pos = 0;
    while (!pq.empty() && t_pos < static_cast<size_t>(n_thresholds)) {
        QEdge e = pq.top();
        pq.pop();
        int64_t ra = uf.find(e.a), rb = uf.find(e.b);
        if (ra == rb) continue;
        auto it = adj[ra].find(rb);
        if (it == adj[ra].end()) continue;
        const float live = 1.0f - it->second.quantile(quantile);
        if (live > e.score + 1e-6f) {
            pq.push({live, ra, rb});
            continue;
        }
        while (t_pos < static_cast<size_t>(n_thresholds) &&
               e.score > thresholds[order[t_pos]]) {
            snapshot(order[t_pos]);
            t_pos++;
        }
        if (t_pos >= static_cast<size_t>(n_thresholds)) break;

        const int64_t keep = uf.merge(ra, rb);
        const int64_t gone = keep == ra ? rb : ra;
        adj[keep].erase(gone);
        adj[gone].erase(keep);
        for (auto& nb : adj[gone]) {
            const int64_t rn = uf.find(nb.first);
            if (rn == keep) continue;
            auto ex = adj[keep].find(rn);
            if (ex == adj[keep].end()) {
                adj[keep][rn] = nb.second;
            } else {
                ex->second.merge(nb.second);
            }
            adj[rn].erase(gone);
            adj[rn][keep] = adj[keep][rn];
            pq.push({1.0f - adj[keep][rn].quantile(quantile), keep, rn});
        }
        adj[gone].clear();
    }
    while (t_pos < static_cast<size_t>(n_thresholds)) {
        snapshot(order[t_pos]);
        t_pos++;
    }
}

// ---------------------------------------------------------------------------
// rand / VOI metrics (funlib.evaluate rand_voi parity)
// ---------------------------------------------------------------------------
//
// results: [voi_split, voi_merge, rand_split, rand_merge,
//           nvi_split, nvi_merge, nid]

void rand_voi(const uint64_t* gt, const uint64_t* seg, int64_t N,
              double* results) {
    std::unordered_map<uint64_t, double> p_gt, p_seg;
    std::unordered_map<uint64_t, std::unordered_map<uint64_t, double>> p_joint;
    p_gt.reserve(1024);
    p_seg.reserve(1024);
    for (int64_t i = 0; i < N; ++i) {
        p_gt[gt[i]] += 1.0;
        p_seg[seg[i]] += 1.0;
        p_joint[gt[i]][seg[i]] += 1.0;
    }
    const double total = static_cast<double>(N);
    double H_gt = 0, H_seg = 0, H_joint = 0;
    double sum_gt2 = 0, sum_seg2 = 0, sum_joint2 = 0;
    for (auto& kv : p_gt) {
        const double p = kv.second / total;
        H_gt -= p * std::log2(p);
        sum_gt2 += p * p;
    }
    for (auto& kv : p_seg) {
        const double p = kv.second / total;
        H_seg -= p * std::log2(p);
        sum_seg2 += p * p;
    }
    for (auto& row : p_joint)
        for (auto& kv : row.second) {
            const double p = kv.second / total;
            H_joint -= p * std::log2(p);
            sum_joint2 += p * p;
        }
    const double voi_split = H_joint - H_gt;   // H(seg|gt)
    const double voi_merge = H_joint - H_seg;  // H(gt|seg)
    const double I = H_gt + H_seg - H_joint;
    results[0] = voi_split;
    results[1] = voi_merge;
    results[2] = sum_joint2 / sum_gt2;   // rand_split
    results[3] = sum_joint2 / sum_seg2;  // rand_merge
    results[4] = H_joint > 0 ? voi_split / H_joint : 0.0;  // nvi_split
    results[5] = H_joint > 0 ? voi_merge / H_joint : 0.0;  // nvi_merge
    results[6] = H_joint > 0 ? 1.0 - I / H_joint : 0.0;    // nid
}

// ---------------------------------------------------------------------------
// connected components (26- or 6-connectivity), for fragment seeding
// ---------------------------------------------------------------------------

void connected_components(const uint8_t* mask, int64_t Z, int64_t Y, int64_t X,
                          int64_t connectivity, uint64_t* out) {
    const int64_t N = Z * Y * X;
    std::fill(out, out + N, 0);
    std::vector<int64_t> stack;
    uint64_t next = 0;
    for (int64_t s = 0; s < N; ++s) {
        if (!mask[s] || out[s]) continue;
        next++;
        stack.push_back(s);
        out[s] = next;
        while (!stack.empty()) {
            const int64_t i = stack.back();
            stack.pop_back();
            const int64_t z = i / (Y * X), y = (i / X) % Y, x = i % X;
            for (int64_t dz = -1; dz <= 1; ++dz)
                for (int64_t dy = -1; dy <= 1; ++dy)
                    for (int64_t dx = -1; dx <= 1; ++dx) {
                        if (!dz && !dy && !dx) continue;
                        if (connectivity == 1 &&
                            (std::abs(dz) + std::abs(dy) + std::abs(dx)) > 1)
                            continue;
                        const int64_t zz = z + dz, yy = y + dy, xx = x + dx;
                        if (zz < 0 || zz >= Z || yy < 0 || yy >= Y || xx < 0 ||
                            xx >= X)
                            continue;
                        const int64_t j = (zz * Y + yy) * X + xx;
                        if (mask[j] && !out[j]) {
                            out[j] = next;
                            stack.push_back(j);
                        }
                    }
        }
    }
}

}  // extern "C"
