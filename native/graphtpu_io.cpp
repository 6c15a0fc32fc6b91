// Native graph-text ingest for graphtpu.
//
// Plays the role of the reference's native ETL tooling — the
// LAGraph_MMRead text parser + src/main/c/src/tools/converter.cpp binary
// converter — for the .v/.e Graphalytics formats: mmap'd, multi-threaded
// parsing of vertex files (one uint64 id per line) and edge files
// ("src dst [weight]" per line) into caller-allocated arrays, exposed
// over a C ABI for ctypes (graphtpu/ingest/native.py).
//
// Design: two-phase parallel scan. Phase 1 splits the mapping into
// per-thread byte ranges aligned to line boundaries and counts lines;
// phase 2 parses each range into its exclusive output slice (prefix-sum
// offsets), so there is no locking and the output order equals file order.

#include <algorithm>
#include <cctype>
#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Mapped {
    const char *data = nullptr;
    size_t size = 0;
    int fd = -1;
    bool ok() const { return data != nullptr || size == 0; }
};

Mapped map_file(const char *path) {
    Mapped m;
    m.fd = open(path, O_RDONLY);
    if (m.fd < 0) return m;
    struct stat st;
    if (fstat(m.fd, &st) != 0) { close(m.fd); m.fd = -1; return m; }
    m.size = static_cast<size_t>(st.st_size);
    if (m.size == 0) { m.data = reinterpret_cast<const char*>(&m); return m; }
    void *p = mmap(nullptr, m.size, PROT_READ, MAP_PRIVATE, m.fd, 0);
    if (p == MAP_FAILED) { close(m.fd); m.fd = -1; m.size = 0; return m; }
    madvise(p, m.size, MADV_SEQUENTIAL);
    m.data = static_cast<const char*>(p);
    return m;
}

void unmap_file(Mapped &m) {
    if (m.data && m.size) munmap(const_cast<char*>(m.data), m.size);
    if (m.fd >= 0) close(m.fd);
    m.data = nullptr; m.size = 0; m.fd = -1;
}

int n_threads(size_t bytes) {
    unsigned hw = std::thread::hardware_concurrency();
    if (hw == 0) hw = 4;
    // below ~4 MB the spawn cost dominates
    size_t want = bytes / (4u << 20);
    if (want < 1) return 1;
    return static_cast<int>(want < hw ? want : hw);
}

// Byte ranges aligned so each range starts right after a '\n'.
std::vector<std::pair<size_t, size_t>> split_ranges(const char *d, size_t n, int t) {
    std::vector<std::pair<size_t, size_t>> r;
    size_t chunk = n / t;
    size_t start = 0;
    for (int i = 0; i < t; i++) {
        size_t end = (i == t - 1) ? n : (i + 1) * chunk;
        if (end < n) {
            while (end < n && d[end] != '\n') end++;
            if (end < n) end++;  // include the newline
        }
        if (end > start) r.emplace_back(start, end);
        start = end;
    }
    return r;
}

// Count non-empty lines in [b, e).
int64_t count_lines_range(const char *d, size_t b, size_t e) {
    int64_t lines = 0;
    bool content = false;
    for (size_t i = b; i < e; i++) {
        char c = d[i];
        if (c == '\n') {
            if (content) lines++;
            content = false;
        } else if (c != '\r' && c != ' ' && c != '\t') {
            content = true;
        }
    }
    if (content) lines++;  // last line without trailing newline
    return lines;
}

inline const char *skip_ws(const char *p, const char *e) {
    while (p < e && (*p == ' ' || *p == '\t' || *p == '\r')) p++;
    return p;
}

inline const char *parse_i64(const char *p, const char *e, int64_t *out) {
    bool neg = false;
    if (p < e && (*p == '-' || *p == '+')) { neg = (*p == '-'); p++; }
    int64_t v = 0;
    const char *s = p;
    while (p < e && *p >= '0' && *p <= '9') { v = v * 10 + (*p - '0'); p++; }
    if (p == s) return nullptr;
    *out = neg ? -v : v;
    return p;
}

inline const char *parse_f64(const char *p, const char *e, double *out) {
    // strtod needs NUL-terminated input; numbers are short, copy to a buffer.
    char buf[64];
    size_t n = static_cast<size_t>(e - p);
    if (n > sizeof(buf) - 1) n = sizeof(buf) - 1;
    memcpy(buf, p, n);
    buf[n] = 0;
    char *endp = nullptr;
    double v = strtod(buf, &endp);
    if (endp == buf) return nullptr;
    *out = v;
    return p + (endp - buf);
}

}  // namespace

extern "C" {

int gtio_version() { return 1; }

// Number of non-empty lines, or -1 on open failure.
int64_t gtio_count_lines(const char *path) {
    Mapped m = map_file(path);
    if (m.fd < 0 && m.size != 0) return -1;
    if (m.fd < 0) return -1;
    if (m.size == 0) { unmap_file(m); return 0; }
    int t = n_threads(m.size);
    auto ranges = split_ranges(m.data, m.size, t);
    std::vector<int64_t> counts(ranges.size(), 0);
    std::vector<std::thread> th;
    for (size_t i = 0; i < ranges.size(); i++)
        th.emplace_back([&, i] { counts[i] = count_lines_range(m.data, ranges[i].first, ranges[i].second); });
    for (auto &x : th) x.join();
    int64_t total = 0;
    for (auto c : counts) total += c;
    unmap_file(m);
    return total;
}

// Parse one uint64/int64 id per line into out[0..cap). Returns the number
// parsed, or -1 on open failure, -2 on malformed content / overflow.
int64_t gtio_parse_vertices(const char *path, int64_t *out, int64_t cap) {
    Mapped m = map_file(path);
    if (m.fd < 0) return -1;
    if (m.size == 0) { unmap_file(m); return 0; }
    int t = n_threads(m.size);
    auto ranges = split_ranges(m.data, m.size, t);
    size_t nr = ranges.size();
    std::vector<int64_t> counts(nr, 0);
    {
        std::vector<std::thread> th;
        for (size_t i = 0; i < nr; i++)
            th.emplace_back([&, i] { counts[i] = count_lines_range(m.data, ranges[i].first, ranges[i].second); });
        for (auto &x : th) x.join();
    }
    std::vector<int64_t> offs(nr + 1, 0);
    for (size_t i = 0; i < nr; i++) offs[i + 1] = offs[i] + counts[i];
    if (offs[nr] > cap) { unmap_file(m); return -2; }

    std::vector<int> errs(nr, 0);
    std::vector<std::thread> th;
    for (size_t i = 0; i < nr; i++) {
        th.emplace_back([&, i] {
            const char *p = m.data + ranges[i].first;
            const char *e = m.data + ranges[i].second;
            int64_t *dst = out + offs[i];
            int64_t k = 0;
            while (p < e) {
                p = skip_ws(p, e);
                if (p < e && *p == '\n') { p++; continue; }
                if (p >= e) break;
                int64_t v;
                const char *q = parse_i64(p, e, &v);
                if (!q) { errs[i] = 1; return; }
                dst[k++] = v;
                p = q;
                while (p < e && *p != '\n') p++;
                if (p < e) p++;
            }
            if (k != counts[i]) errs[i] = 1;
        });
    }
    for (auto &x : th) x.join();
    unmap_file(m);
    for (auto err : errs) if (err) return -2;
    return offs[nr];
}

// Parse "src dst [weight]" lines. Returns lines parsed, -1 open failure,
// -2 malformed/overflow.
int64_t gtio_parse_edges(const char *path, int32_t weighted,
                         int64_t *src, int64_t *dst, double *w, int64_t cap) {
    Mapped m = map_file(path);
    if (m.fd < 0) return -1;
    if (m.size == 0) { unmap_file(m); return 0; }
    int t = n_threads(m.size);
    auto ranges = split_ranges(m.data, m.size, t);
    size_t nr = ranges.size();
    std::vector<int64_t> counts(nr, 0);
    {
        std::vector<std::thread> th;
        for (size_t i = 0; i < nr; i++)
            th.emplace_back([&, i] { counts[i] = count_lines_range(m.data, ranges[i].first, ranges[i].second); });
        for (auto &x : th) x.join();
    }
    std::vector<int64_t> offs(nr + 1, 0);
    for (size_t i = 0; i < nr; i++) offs[i + 1] = offs[i] + counts[i];
    if (offs[nr] > cap) { unmap_file(m); return -2; }

    std::vector<int> errs(nr, 0);
    std::vector<std::thread> th;
    for (size_t i = 0; i < nr; i++) {
        th.emplace_back([&, i] {
            const char *p = m.data + ranges[i].first;
            const char *e = m.data + ranges[i].second;
            int64_t base = offs[i];
            int64_t k = 0;
            while (p < e) {
                p = skip_ws(p, e);
                if (p < e && *p == '\n') { p++; continue; }
                if (p >= e) break;
                int64_t s, d;
                const char *q = parse_i64(p, e, &s);
                if (!q) { errs[i] = 1; return; }
                q = skip_ws(q, e);
                q = parse_i64(q, e, &d);
                if (!q) { errs[i] = 1; return; }
                src[base + k] = s;
                dst[base + k] = d;
                if (weighted) {
                    q = skip_ws(q, e);
                    double wv;
                    q = parse_f64(q, e, &wv);
                    if (!q) { errs[i] = 1; return; }
                    w[base + k] = wv;
                }
                k++;
                p = q;
                while (p < e && *p != '\n') p++;
                if (p < e) p++;
            }
            if (k != counts[i]) errs[i] = 1;
        });
    }
    for (auto &x : th) x.join();
    unmap_file(m);
    for (auto err : errs) if (err) return -2;
    return offs[nr];
}

// Lexsort the edge stream by (src, dst) with optional keep-first dedup,
// in place. Two STABLE counting-sort passes (by dst, then by src) —
// O(m + n) with sequential counter traffic, ~5x numpy's int64 argsort
// on one core at 60M edges (the round-4 ingest bottleneck: 31.0 s of
// host relabel, BENCH_r04, VERDICT r4 #5; the TPU-sort alternative is
// blocked by the environment's ~2.5 MB/s device->host relay — see
// core/graph.py _device_sort_edges). Stability makes the dedup
// keep-FIRST, matching the numpy path's semantics exactly.
// `w` may be null (unweighted). Returns the new edge count after dedup
// (== m when dedup=0), or -1 on invalid ids (outside [0, n)).
int64_t gtio_sort_edges(int64_t m, int64_t n, int32_t *src, int32_t *dst,
                        double *w, int32_t has_w, int32_t dedup) try {
    if (m <= 0) return m < 0 ? -1 : 0;
    for (int64_t i = 0; i < m; i++)
        if (src[i] < 0 || src[i] >= n || dst[i] < 0 || dst[i] >= n) return -1;
    std::vector<int32_t> ts(m), td(m);
    std::vector<double> tw(has_w ? m : 0);
    std::vector<int64_t> cnt(n + 1, 0);

    // pass 1: stable counting sort by dst into the temporaries
    for (int64_t i = 0; i < m; i++) cnt[dst[i] + 1]++;
    for (int64_t v = 0; v < n; v++) cnt[v + 1] += cnt[v];
    for (int64_t i = 0; i < m; i++) {
        int64_t p = cnt[dst[i]]++;
        ts[p] = src[i]; td[p] = dst[i];
        if (has_w) tw[p] = w[i];
    }

    // pass 2: stable counting sort by src back into the caller arrays
    std::fill(cnt.begin(), cnt.end(), 0);
    for (int64_t i = 0; i < m; i++) cnt[ts[i] + 1]++;
    for (int64_t v = 0; v < n; v++) cnt[v + 1] += cnt[v];
    for (int64_t i = 0; i < m; i++) {
        int64_t p = cnt[ts[i]]++;
        src[p] = ts[i]; dst[p] = td[i];
        if (has_w) w[p] = tw[i];
    }

    if (!dedup) return m;
    int64_t k = 1;
    for (int64_t i = 1; i < m; i++) {
        if (src[i] == src[k - 1] && dst[i] == dst[k - 1]) continue;
        src[k] = src[i]; dst[k] = dst[i];
        if (has_w) w[k] = w[i];
        k++;
    }
    return k;
} catch (...) {
    // bad_alloc etc. must not cross the C ABI (std::terminate); -5 maps
    // to the numpy fallback on the Python side
    return -5;
}

// ---------------------------------------------------------------------------
// Fused relabel pipeline: sparse-original-id edges -> dense-id sorted
// deduped COO, the whole L3 hot path of bin/py/relabel.py:37-45 +
// Graph.from_original_ids in one native call (round-5, VERDICT r4 #5).
//
// Steps (all single-core; this environment has 1 CPU):
//   1. open-addressing hash join original id -> dense id (the DuckDB
//      rowid join of relabel.py:37-45);
//   2. optional undirected doubling (mirror every non-loop edge, matching
//      Graph.from_original_ids's concatenate([s, d], [d, s]) order);
//   3. stable LSD radix sort (2^11 buckets/pass) of the packed
//      (src << id_bits) | dst key — bucket-streamed scatters instead of
//      the counting sort's full-range random writes (measured 5.6 s ->
//      ~1.5 s at 62M edges);
//   4. keep-first dedup; for undirected weighted inputs, adjacent
//      duplicates with CONFLICTING weights are an error (-3), the exact
//      semantics of from_original_ids's pre-doubling pair check.
//
// Returns the deduped edge count, or -1 capacity, -2 unknown edge id,
// -3 conflicting duplicate weights, -4 duplicate vertex id, -5 native
// failure (allocation — caller falls back to numpy), -6 declined
// (a vertex id equals the hash sentinel INT64_MIN — caller falls back
// to numpy, which handles any int64 id).

namespace {

inline uint64_t mix64(uint64_t x) {
    x += 0x9e3779b97f4a7c15ull;
    x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ull;
    x = (x ^ (x >> 27)) * 0x94d049bb133111ebull;
    return x ^ (x >> 31);
}

}  // namespace

int64_t gtio_relabel_edges(int64_t n, const int64_t *vids,
                           int64_t m, const int64_t *esrc, const int64_t *edst,
                           double *w, int32_t has_w, int32_t directed,
                           int32_t *out_src, int32_t *out_dst, double *out_w,
                           int64_t cap) try {
    // -- 1. hash join original -> dense ------------------------------------
    for (int64_t i = 0; i < n; i++)
        if (vids[i] == INT64_MIN) return -6;  // sentinel collision: decline
    size_t hs = 16;
    while ((int64_t)hs < 2 * n) hs <<= 1;
    std::vector<int64_t> hkey(hs, INT64_MIN);
    std::vector<int32_t> hval(hs);
    for (int64_t i = 0; i < n; i++) {
        uint64_t p = mix64((uint64_t)vids[i]) & (hs - 1);
        while (hkey[p] != INT64_MIN) {
            if (hkey[p] == vids[i]) return -4;  // duplicate vertex id
            p = (p + 1) & (hs - 1);
        }
        hkey[p] = vids[i];
        hval[p] = (int32_t)i;
    }
    auto lookup = [&](int64_t id, int32_t *out) -> bool {
        uint64_t p = mix64((uint64_t)id) & (hs - 1);
        while (hkey[p] != INT64_MIN) {
            if (hkey[p] == id) { *out = hval[p]; return true; }
            p = (p + 1) & (hs - 1);
        }
        return false;
    };

    int id_bits = 1;
    while ((int64_t(1) << id_bits) < n) id_bits++;

    // -- 2. map + (optionally) double into packed keys ----------------------
    // key = (src << id_bits) | dst; payload = original edge index (for w)
    int64_t m2_cap = directed ? m : 2 * m;
    if (m2_cap > cap) return -1;
    std::vector<int64_t> key(m2_cap);
    std::vector<int32_t> pos(has_w ? m2_cap : 0);
    int64_t m2 = 0;
    for (int64_t i = 0; i < m; i++) {
        int32_t s, d;
        if (!lookup(esrc[i], &s) || !lookup(edst[i], &d)) return -2;
        key[m2] = ((int64_t)s << id_bits) | d;
        if (has_w) pos[m2] = (int32_t)i;
        m2++;
    }
    if (!directed) {
        // mirrors appended after all originals = the numpy concatenate
        // order, so stable sort + keep-first dedup semantics match
        for (int64_t i = 0; i < m; i++) {
            int32_t s = (int32_t)(key[i] >> id_bits);
            int32_t d = (int32_t)(key[i] & ((int64_t(1) << id_bits) - 1));
            if (s == d) continue;
            key[m2] = ((int64_t)d << id_bits) | s;
            if (has_w) pos[m2] = (int32_t)i;
            m2++;
        }
    }

    // -- 3. stable LSD radix sort on the packed key -------------------------
    const int RB = 11;                      // 2048 streamed buckets/pass
    const int key_bits = 2 * id_bits;
    const int passes = (key_bits + RB - 1) / RB;
    std::vector<int64_t> key2(m2);
    std::vector<int32_t> pos2(has_w ? m2 : 0);
    std::vector<int64_t> hist(((size_t)1 << RB) + 1);
    int64_t *ka = key.data(), *kb = key2.data();
    int32_t *pa = pos.data(), *pb = pos2.data();
    for (int p = 0; p < passes; p++) {
        const int shift = p * RB;
        const int64_t mask = (int64_t(1) << RB) - 1;
        std::fill(hist.begin(), hist.end(), 0);
        for (int64_t i = 0; i < m2; i++) hist[((ka[i] >> shift) & mask) + 1]++;
        for (size_t b = 0; b < ((size_t)1 << RB); b++) hist[b + 1] += hist[b];
        if (has_w) {
            for (int64_t i = 0; i < m2; i++) {
                int64_t t = hist[(ka[i] >> shift) & mask]++;
                kb[t] = ka[i]; pb[t] = pa[i];
            }
        } else {
            for (int64_t i = 0; i < m2; i++)
                kb[hist[(ka[i] >> shift) & mask]++] = ka[i];
        }
        std::swap(ka, kb);
        std::swap(pa, pb);
    }

    // -- 4. unpack + keep-first dedup ---------------------------------------
    const int64_t dmask = (int64_t(1) << id_bits) - 1;
    int64_t k = 0;
    for (int64_t i = 0; i < m2; i++) {
        if (i > 0 && ka[i] == ka[i - 1]) {
            // duplicate of the previous key (already emitted keep-first)
            if (!directed && has_w && w[pa[i]] != out_w[k - 1]) return -3;
            continue;
        }
        out_src[k] = (int32_t)(ka[i] >> id_bits);
        out_dst[k] = (int32_t)(ka[i] & dmask);
        if (has_w) out_w[k] = w[pa[i]];
        k++;
    }
    return k;
} catch (...) {
    return -5;  // bad_alloc etc.: numpy fallback, never std::terminate
}

}  // extern "C"
