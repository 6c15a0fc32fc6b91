"""Multi-chip execution: mesh setup, row-partitioned sparse containers,
and shard_map'd algorithm loops.

This is the genuinely new subsystem relative to the reference, which is
single-node (SURVEY.md §2.9): the distributed communication backend is
JAX collectives over ICI/DCN (all_gather for frontier/label/rank vectors,
psum for scalar masses and convergence flags), compiled by XLA — no
NCCL/MPI analogue needed.
"""

from graphtpu.parallel.mesh import make_mesh, ROWS_AXIS
from graphtpu.parallel.partition import ShardedGraph
