// ODD-STh decomposition engine.
//
// Semantics mirror the reference's pure-Python pipeline
// (reference grakel/kernels/odd_sth.py:263-608) and the Python fallback in
// grakel_tpu/kernels/odd_sth.py:
//   * per vertex v: BFS DAG rooted at v — children(u) = neighbors one BFS
//     level deeper, depth-capped at h (odd_sth.py:333-376);
//   * inverse-topological (Kahn) ordering popping a (label, insertion)
//     min-heap — exactly the reference's "re-sort queue by label before
//     every pop" order (odd_sth.py:379-457);
//   * bottom-up canonical subtree identity over (label, children ordered
//     by the Kahn ordering) — here a 128-bit fingerprint instead of the
//     reference's nested ID strings (odd_sth.py:460-511), so identity
//     survives across calls (fit vs transform) without string interning;
//   * per-graph counts merged by fingerprint, then appended to a global
//     first-appearance table whose inserting frequency is the C weight
//     (odd_sth.py:514-608, position-0 quirk at :604).
//
// One call decomposes a whole batch of graphs; outputs are malloc'd and
// released with odd_sth_free.

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <queue>
#include <tuple>
#include <unordered_map>
#include <vector>

namespace {

struct Key128 {
    uint64_t a, b;
    bool operator==(const Key128 &o) const { return a == o.a && b == o.b; }
};

struct Key128Hash {
    size_t operator()(const Key128 &k) const {
        return (size_t)(k.a ^ (k.b * 0x9E3779B97F4A7C15ULL));
    }
};

static inline uint64_t fmix64(uint64_t x) {
    x ^= x >> 33; x *= 0xFF51AFD7ED558CCDULL;
    x ^= x >> 33; x *= 0xC4CEB9FE1A85EC53ULL;
    x ^= x >> 33; return x;
}

static inline void mix(Key128 &k, uint64_t x) {
    k.a = fmix64(k.a ^ x);
    k.b = (k.b ^ x) * 0xC6A4A7935BD1E995ULL + 0x2545F4914F6CDD1DULL;
}

template <typename T>
static T *dup(const std::vector<T> &v) {
    T *p = (T *)std::malloc(std::max<size_t>(v.size(), 1) * sizeof(T));
    if (p && !v.empty()) std::memcpy(p, v.data(), v.size() * sizeof(T));
    return p;
}

}  // namespace

extern "C" {

// node_off:  int64[n_graphs+1]   per-graph vertex offsets (global space)
// adj_off:   int64[total_nodes+1] CSR row offsets into adj
// adj:       int32[total_adj]     neighbor lists, LOCAL vertex indices
// labels:    int64[total_nodes]   order-preserving label codes (drive the
//            Kahn heap comparisons; batch-local is fine)
// ids:       int64[total_nodes]    stable label identity codes (mixed into
//            the fingerprints; must be identical across fit/transform)
// h:         BFS depth cap; < 0 means unbounded
// Returns the number of distinct subtrees (table rows), or -1 on error.
long odd_sth_decompose(
    int n_graphs, const long long *node_off, const long long *adj_off,
    const int *adj, const long long *labels, const long long *ids, int h,
    unsigned long long **out_ha, unsigned long long **out_hb,
    long long **out_C,
    int **out_node, int **out_graph, long long **out_freq,
    long long *out_nnz) {
    const int depth_cap = h < 0 ? INT32_MAX : h;

    std::unordered_map<Key128, long long, Key128Hash> table;  // key -> row
    std::vector<unsigned long long> ha, hb;
    std::vector<long long> Cw;
    std::vector<int> coo_node, coo_graph;
    std::vector<long long> coo_freq;

    for (int g = 0; g < n_graphs; ++g) {
        const long long base = node_off[g];
        const int n = (int)(node_off[g + 1] - base);
        if (n <= 0) continue;

        std::vector<int> level(n), bfs(n);
        std::vector<std::vector<int>> kids(n);
        std::vector<int> indeg(n);
        std::vector<int> kahn(n);          // pop order
        std::vector<int> ord(n);           // ordering[v] (n down to 1)
        std::vector<Key128> fp(n);
        std::unordered_map<Key128, long long, Key128Hash> gcount;

        for (int root = 0; root < n; ++root) {
            // ---- BFS DAG (children = one level deeper) ----
            std::fill(level.begin(), level.end(), -1);
            int head = 0, tail = 0;
            bfs[tail++] = root;
            level[root] = 0;
            int n_dag = 1;
            std::vector<int> dag_nodes;
            dag_nodes.reserve(n);
            dag_nodes.push_back(root);
            while (head < tail) {
                const int u = bfs[head++];
                const int lu = level[u];
                kids[u].clear();
                if (lu == depth_cap) break;
                const long long a0 = adj_off[base + u];
                const long long a1 = adj_off[base + u + 1];
                for (long long e = a0; e < a1; ++e) {
                    const int w = adj[e];
                    if (level[w] < 0) {
                        level[w] = lu + 1;
                        kids[u].push_back(w);
                        bfs[tail++] = w;
                        dag_nodes.push_back(w);
                        ++n_dag;
                    } else if (level[w] == lu + 1) {
                        kids[u].push_back(w);
                    }
                }
            }
            // nodes never popped (queue drained early by the depth cap)
            // keep whatever kids were assigned; unpopped ones get none
            for (int qi = head; qi < tail; ++qi) kids[bfs[qi]].clear();

            // ---- Kahn with (label, insertion) min-heap ----
            for (int i = 0; i < n_dag; ++i) indeg[dag_nodes[i]] = 0;
            for (int i = 0; i < n_dag; ++i)
                for (int c : kids[dag_nodes[i]]) ++indeg[c];
            using Item = std::tuple<long long, int, int>;
            std::priority_queue<Item, std::vector<Item>,
                                std::greater<Item>> heap;
            int cnt = 0;
            for (int i = 0; i < n_dag; ++i) {
                const int v = dag_nodes[i];
                if (indeg[v] == 0)
                    heap.emplace(labels[base + v], cnt++, v);
            }
            int popped = 0, visited = n_dag;
            while (!heap.empty()) {
                const int e = std::get<2>(heap.top());
                heap.pop();
                kahn[popped++] = e;
                ord[e] = visited--;
                for (int c : kids[e]) {
                    if (--indeg[c] == 0)
                        heap.emplace(labels[base + c], cnt++, c);
                }
            }

            // ---- bottom-up fingerprints, children ordered by (ord,
            // label) — ord is a bijection so it alone decides ----
            for (int i = popped - 1; i >= 0; --i) {
                const int v = kahn[i];
                std::sort(kids[v].begin(), kids[v].end(),
                          [&](int x, int y) { return ord[x] < ord[y]; });
                Key128 k{0x6A09E667F3BCC908ULL, 0xBB67AE8584CAA73BULL};
                mix(k, (uint64_t)ids[base + v]);
                for (int c : kids[v]) {
                    mix(k, fp[c].a);
                    mix(k, fp[c].b);
                }
                if (!kids[v].empty()) mix(k, 0x510E527FADE682D1ULL);
                fp[v] = k;
                ++gcount[k];
            }
        }

        // ---- append this graph into the global table ----
        for (const auto &kv : gcount) {
            long long row;
            auto it = table.find(kv.first);
            if (it == table.end()) {
                row = (long long)ha.size();
                table.emplace(kv.first, row);
                ha.push_back(kv.first.a);
                hb.push_back(kv.first.b);
                Cw.push_back(kv.second);   // inserting frequency == C
            } else {
                row = it->second;
            }
            coo_node.push_back((int)row);
            coo_graph.push_back(g);
            coo_freq.push_back(kv.second);
        }
    }

    *out_ha = dup(ha);
    *out_hb = dup(hb);
    *out_C = dup(Cw);
    *out_node = dup(coo_node);
    *out_graph = dup(coo_graph);
    *out_freq = dup(coo_freq);
    *out_nnz = (long long)coo_node.size();
    return (long long)ha.size();
}

void odd_sth_free(void *p) { std::free(p); }

}  // extern "C"
