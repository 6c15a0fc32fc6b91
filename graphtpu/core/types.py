"""Shared constants and dtype policy.

The reference computes with GrB_Index (uint64) throughout; on TPU we keep
vertex ids as int32 on device (|V| < 2^31 for every Graphalytics dataset)
and confine 64-bit original ids to the ingest edge, mirroring how the
reference confines original ids to graph.vtx/.vtb (SURVEY.md §7 hard part d).
"""

from __future__ import annotations

import numpy as np

# Printed for unreachable vertices in BFS output — int64 max, matching the
# reference serializer (src/main/c/src/algorithms/bfs.cpp:61).
UNREACHABLE = np.iinfo(np.int64).max  # 9223372036854775807

# Device-side index dtype.
INDEX_DTYPE = np.int32

# Host-side original-id dtype (sparse uint64 ids in .v files; int64 holds all
# published Graphalytics datasets' ids).
ORIGINAL_ID_DTYPE = np.int64

# Sentinel used on device for "no value" in int32 computations.
INT32_INF = np.iinfo(np.int32).max
