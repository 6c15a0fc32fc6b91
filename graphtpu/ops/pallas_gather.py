"""Pallas table-gather prototype — the VERDICT r2 #4 A/B, answered.

The repo's dominant primitive is `table_gather(x, idx)` (ops/gather.py):
XLA lowers it to a [idx >> 7] row fetch from HBM plus a fused lane
select, measured ~2.6 ns/index on v5e — ~197 GB/s of HBM row traffic
(512 B/index), a quarter of the chip's HBM bandwidth. For the
label/rank tables of every Graphalytics iteration the table itself is
small (n=2^20 int32 = 4 MB < 16 MB VMEM), so the obvious below-XLA play
is a Pallas kernel that pins the WHOLE table in VMEM and pays HBM only
for index/output streams (8 B/index). The reference precedent for
dropping below the library is the CUDA fork's cdlp_kernel.cu.

**Answer (measured on jax 0.9.0 / v5e, round 3): not expressible.**
Mosaic's only dynamic-indexing primitive is `tpu.dynamic_gather`, and
the lowering chain constrains it away from this use case step by step
(scripts/perf/measure_pallas_gather.py reproduces each):

1. `jnp.take(tbl, rows, axis=0)`  → "Shape mismatch in input, indices
   and output": only take_along_axis-shaped gathers lower (indices
   shape == operand shape + (1,), mosaic/lowering.py gather rule).
2. index arithmetic under the repo's x64 mode promotes to int64 →
   "64-bit types are not supported" (fixed with jax.enable_x64(False)
   around the kernel body).
3. take_along_axis(mode="clip") → "Unsupported gather": only
   FILL_OR_DROP / PROMISE_IN_BOUNDS modes lower.
4. The [16,128]→[2048,1] index relayout (lanes→sublanes) →
   "infer-vector-layout: unsupported shape cast"; feeding pre-shaped
   [R,128] indices instead → **"Not implemented: Multiple source vregs
   along gather dimension"** — `tpu.dynamic_gather` is a SINGLE-VREG
   sublane shuffle: the gathered axis must fit one (8, 128) vreg, and
   every lane gathers within its own column.

So the hardware primitive is an 8-deep lane-aligned shuffle (useful for
tiny lookup tables — `vreg_shuffle` below, verified correct on chip),
not an arbitrary VMEM gather; a 2^13-row label table has 1024 source
vregs. XLA's gather engine keeps the hot path (GRAPHTPU rates:
gather_ns=2.6). Revisit if Mosaic grows multi-vreg dynamic_gather —
the win on the table (labels in VMEM, 8 B/idx HBM) is bounded below by
~64x less HBM row traffic than the XLA path.

**Second formulation (VERDICT r3 #4), measured round 4: also loses.**
`dma_row_gather` below is the scalar-prefetch-driven route — the table
stays in HBM and the kernel issues one 512 B async copy per index with
up to 64 DMAs in flight (PrefetchScalarGridSpec + per-slot semaphores).
It compiles and is bit-correct on v5e, but the A/B at a 1 GB table
(scripts/perf/dma_gather_bench.py, N=2^20 random rows, identical
harness) reads:

    XLA table[idx] row fetch:   34.2 ns/row   (16.5 at N=2^22)
    pallas DMA, best config :   52.6 ns/row   (block=1024, slots=32;
                                 46-64 across the block/slots sweep)

Per-row DMA issue overhead (~50 ns even fully pipelined) is the floor —
XLA's gather engine batches row fetches below what software-issued
descriptors can reach. Both Pallas doors are now measured shut; the
hardware gather path keeps every hot gather. Constraints hit on the
way (each documented at the code): x64 leaks int64 into Mosaic's
self-recursing s64 convert rule (trace-time RecursionError), index_map
constants must be 32-bit, and scalar-prefetch operands are staged in
SMEM (1 MB) so an index vector caps at ~2^17 int32 per call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def vreg_shuffle(tbl8: jax.Array, ind: jax.Array) -> jax.Array:
    """out[i, j] = tbl8[ind[i, j], j] for an 8-row table — the one
    dynamic-gather form Mosaic supports (single source vreg, lane-aligned,
    indices shape == table shape). Verified correct on v5e.
    tbl8: [8, 128]; ind: [8, 128] int32 in [0, 8)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(tbl_ref, ind_ref, out_ref):
        with jax.enable_x64(False):
            out_ref[:] = jnp.take_along_axis(
                tbl_ref[:], ind_ref[:].astype(jnp.int32), axis=0,
                mode="promise_in_bounds",
            )

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(ind.shape, tbl8.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tbl8, ind)


def dma_row_gather(table: jax.Array, idx: jax.Array, *, block: int = 512,
                   slots: int = 16) -> jax.Array:
    """out[i] = table[idx[i]] by scalar-prefetch-driven per-row DMA — the
    SECOND Pallas formulation (VERDICT r3 #4): instead of asking Mosaic's
    vector unit to gather (the measured dead end above), keep the table
    in HBM and drive one 512 B async copy per index from the
    scalar-prefetched index vector, `slots` DMAs in flight.

    This is how hand-written TPU sparse kernels fetch from HBM-resident
    tables; the question it answers is whether explicit DMA issue beats
    XLA's gather engine for the big-table row fetch (the LCC hash-row
    probe at ~16 ns/row, the PR slab gather at ~2.6 ns/idx). See
    scripts/perf/dma_gather_bench.py for the measured verdict.

    table: [R, 128] int32/float32 (one hardware tile row per index);
    idx: [N] int32, N % block == 0, N <= 2^17 — scalar-prefetch operands
    are staged in SMEM (1 MB on v5e): a 2^20-index vector failed AOT
    compile with "Allocation (size=4194304) would exceed memory
    (size=1048576) ... space=smem, tag='prefetched SMEM operand'".
    Callers chunk larger streams."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = idx.shape[0]
    assert n % block == 0, (n, block)

    def kern(idx_ref, table_ref, out_ref, sems):
        # x64 must be off inside the body: int64 loop indices hit
        # Mosaic's s64 convert rule, which self-recurses (RecursionError
        # at trace time — same class of constraint as vreg_shuffle's)
        with jax.enable_x64(False):
            b = pl.program_id(0)
            base = b * block

            def make(i, slot):
                return pltpu.make_async_copy(
                    table_ref.at[idx_ref[base + i]],
                    out_ref.at[i],
                    sems.at[slot],
                )

            def prime(i, _):
                make(i, i % slots).start()
                return _

            jax.lax.fori_loop(0, min(slots, block), prime, 0)

            def step(i, _):
                # wait DMA i, then issue DMA i+slots into the freed slot
                make(i, i % slots).wait()
                make(i + slots, i % slots).start()
                return _

            jax.lax.fori_loop(0, max(block - slots, 0), step, 0)

            def drain(i, _):
                make(i, i % slots).wait()
                return _

            jax.lax.fori_loop(max(block - slots, 0), block, drain, 0)

    # the 32-bit scope must also cover the grid spec + call: index_map
    # constants trace as i64 under the repo's x64 mode and Mosaic fails
    # to legalize the (i32, smem-ref) -> (i32, i64) transform func
    with jax.enable_x64(False):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // block,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (block, 128), lambda b, *_: (b, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.SemaphoreType.DMA((slots,))],
        )
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n, 128), table.dtype),
            grid_spec=grid_spec,
        )(idx.astype(jnp.int32), table)


def pallas_table_gather(x: jax.Array, idx: jax.Array) -> jax.Array:
    """The losing prototype's entry point, kept for the A/B harness.
    Raises with the measured verdict — callers use ops.gather.table_gather."""
    raise NotImplementedError(
        "VMEM-resident table gather is not expressible on this toolchain: "
        "tpu.dynamic_gather is a single-vreg (8x128) lane-aligned shuffle "
        "('Multiple source vregs along gather dimension'). See module "
        "docstring; XLA table_gather (~2.6 ns/idx) remains the hot path."
    )
