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

}  // extern "C"
