"""Pallas row-gather probe: is XLA's dynamic-gather lowering the ceiling?

docs/PERFORMANCE.md rests on "the raw random-row gather rate IS the
march's speed of light" — measured so far only through XLA's own gather
op.  This probe measures the same workload through hand-written Pallas
kernels so the claim is falsifiable against the hardware rather than
against one lowering:

1. ``random``   — per-lane row DMA from HBM, N-deep double buffering:
   the latency-bound pattern the march performs (one 16..250 B row per
   lane per step).
2. ``coalesced``— one block DMA per RUN contiguous rows: the best case a
   brick/ray-binning pass could manufacture.  The rows/s gap between
   these two bounds what any binning scheme can buy.

Run (real chip):  timeout 1200 python -u tools/pallas_gather_probe.py \
                      --json PALLAS_GATHER.json
CPU smoke:        ... --interpret  (tiny sizes, correctness only)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024  # lanes per grid program (= the XLA T(1024) s32 layout)
NBUF = 8  # DMA pipeline depth


def _per_lane_kernel(idx_ref, rows_ref, out_ref, *, width):
    """TILE sequential row DMAs, NBUF in flight (the march's access
    pattern: one small row per lane, random address).

    Mosaic shapes every constraint here: HBM uint8 buffers tile at
    1024 B (smaller per-DMA slices are rejected outright), VMEM refs
    reject sub-tile slicing — so each pipeline slot owns its own whole
    1-D scratch buffer and the lane loop is fully unrolled (TILE is
    static), leaving no dynamic slicing anywhere."""
    pid = pl.program_id(0)

    def body(*args):
        bufs, sems = args[:-1], args[-1]

        def get_dma(k, j):
            off = pl.multiple_of(idx_ref[j] * width, 1024)
            return pltpu.make_async_copy(
                rows_ref.at[pl.ds(off, width)], bufs[k], sems.at[k]
            )

        for k in range(NBUF):
            get_dma(k, k).start()
        acc = jnp.float32(0.0)
        for j in range(TILE):
            k = j % NBUF
            get_dma(k, j).wait()
            acc = acc + jnp.sum(
                bufs[k][...].astype(jnp.int32).astype(jnp.float32)
            )
            if j + NBUF < TILE:
                get_dma(k, j + NBUF).start()
        out_ref[pid, 0] = acc

    pl.run_scoped(
        body,
        *[pltpu.VMEM((width,), jnp.uint8) for _ in range(NBUF)],
        pltpu.SemaphoreType.DMA((NBUF,)),
    )


def _coalesced_kernel(idx_ref, rows_ref, out_ref, *, width, run):
    """TILE rows fetched as TILE//run block DMAs of ``run`` contiguous
    rows each — the upper bound after a perfect binning pass."""
    nblocks = TILE // run
    pid = pl.program_id(0)

    def body(*args):
        bufs, sems = args[:-1], args[-1]

        def get_dma(k, b):
            off = pl.multiple_of(idx_ref[b] * width, 1024)
            return pltpu.make_async_copy(
                rows_ref.at[pl.ds(off, run * width)], bufs[k], sems.at[k]
            )

        depth = min(NBUF, nblocks)
        for k in range(depth):
            get_dma(k, k).start()
        acc = jnp.float32(0.0)
        for b in range(nblocks):
            k = b % depth
            get_dma(k, b).wait()
            acc = acc + jnp.sum(
                bufs[k][...].astype(jnp.int32).astype(jnp.float32)
            )
            if b + depth < nblocks:
                get_dma(k, b + depth).start()
        out_ref[pid, 0] = acc

    pl.run_scoped(
        body,
        *[pltpu.VMEM((run * width,), jnp.uint8) for _ in range(min(NBUF, nblocks))],
        pltpu.SemaphoreType.DMA((NBUF,)),
    )


def build(kind, nrows, width, batch, run=32, interpret=False):
    ntiles = batch // TILE
    if kind == "per_lane":
        kernel = functools.partial(_per_lane_kernel, width=width)
    else:
        kernel = functools.partial(_coalesced_kernel, width=width, run=run)
    # One 1024-entry s32 block per program — the SMEM block shape must
    # equal XLA's T(1024) tiled layout; the coalesced kernel reads only
    # its first TILE//run entries (the rest is padding).
    idx_block = (1024,)

    grid_spec = pl.GridSpec(
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(
                idx_block, lambda i: (i,), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # rows stay in HBM
        ],
        # Whole-array SMEM output: per-(1,1) blocks fail the Mosaic
        # (8,128) block-tiling check; with the full array visible each
        # program writes its own row (the TPU grid runs sequentially).
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ntiles, 1), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )
    return jax.jit(call)


def measure(kind, nrows, width, batch, run=32, interpret=False, reps=3):
    assert width % 1024 == 0, "1-D uint8 DMA slices must be 1024-aligned"
    fn = build(kind, nrows, width, batch, run=run, interpret=interpret)
    rows = jax.jit(
        lambda: jax.random.randint(
            jax.random.PRNGKey(0), (nrows * width,), 0, 255, dtype=jnp.uint8
        )
    )()
    rng = np.random.default_rng(0)
    ntiles = batch // TILE
    if kind == "per_lane":
        idx = rng.integers(0, nrows, batch).astype(np.int32)
        idx_used = idx
    else:
        per = TILE // run
        used = rng.integers(
            0, max(1, nrows - run), (ntiles, per)
        ).astype(np.int32)
        idx = np.zeros((ntiles, 1024), np.int32)
        idx[:, :per] = used
        idx_used = used.reshape(-1)
        idx = idx.reshape(-1)
    idx = jnp.asarray(idx)
    out = fn(idx, rows)
    out.block_until_ready()
    # Correctness cross-check vs XLA take (per tile sums).
    rows2d = rows.reshape(nrows, width)
    iu = jnp.asarray(idx_used)
    if kind == "per_lane":
        want = (
            jnp.take(rows2d, iu, axis=0)
            .astype(jnp.float32)
            .sum(-1)
            .reshape(-1, TILE)
            .sum(-1)
        )
    else:
        gathered = jax.vmap(
            lambda s: jax.lax.dynamic_slice(rows2d, (s, 0), (run, width))
        )(iu)
        want = (
            gathered.astype(jnp.float32)
            .sum((-1, -2))
            .reshape(-1, TILE // run)
            .sum(-1)
        )
    np.testing.assert_allclose(
        np.asarray(out)[:, 0], np.asarray(want), rtol=1e-5,
    )
    # Fetch-based timing with distinct index sets per rep: through the
    # tunneled backend block_until_ready can return before execution
    # finishes, and identical dispatches may be replay-cached (see
    # tools/perf_probe.timeit).
    salts = [
        jnp.asarray(np.roll(np.asarray(idx), k + 1)) for k in range(reps)
    ]
    float(fn(salts[0], rows).sum())
    t0 = time.time()
    for k in range(reps):
        float(fn(salts[k], rows).sum())
    dt = (time.time() - t0) / reps
    return batch / dt


def main():
    interpret = "--interpret" in sys.argv
    out_json = None
    if "--json" in sys.argv:
        out_json = sys.argv[sys.argv.index("--json") + 1]
    report = {"tile": TILE, "nbuf": NBUF}
    print("devices:", jax.devices())
    if interpret:
        cases = [(4096, 1024, 4096)]
        runs = (8,)
    else:
        # 1024 B is the SMALLEST per-DMA slice Mosaic accepts from an HBM
        # uint8 buffer (1-D memref tiling is (1024); 2-D tiled memrefs
        # reject any single-row slice: "aligned to tiling (8)").  The
        # march's 16-256 B rows are therefore INEXPRESSIBLE as per-lane
        # Pallas DMAs — the kernel would fetch the containing 1024 B block
        # (64x waste for 16 B cell rows, 8x for 128 B brick-3 rows).  This
        # probe measures that hardware-minimum pattern: 1024 B random
        # blocks (= 8 adjacent brick-3 rows) from a 128 MB and a 1 GB
        # table, plus coalesced runs.
        cases = [(1 << 17, 1024, 1 << 18), (1 << 20, 1024, 1 << 18)]
        runs = (8, 32)
    results = []
    for nrows, width, batch in cases:
        r = measure("per_lane", nrows, width, batch, interpret=interpret)
        print(
            f"per-lane DMA {nrows}x{width}B: {r/1e6:.1f} Mrows/s", flush=True
        )
        results.append(
            {
                "kind": "per_lane",
                "nrows": nrows,
                "row_bytes": width,
                "mrows_per_s": round(r / 1e6, 2),
            }
        )
        for run in runs:
            r = measure(
                "coalesced", nrows, width, batch, run=run, interpret=interpret
            )
            print(
                f"coalesced x{run} DMA {nrows}x{width}B: {r/1e6:.1f} Mrows/s",
                flush=True,
            )
            results.append(
                {
                    "kind": f"coalesced_{run}",
                    "nrows": nrows,
                    "row_bytes": width,
                    "mrows_per_s": round(r / 1e6, 2),
                }
            )
    report["results"] = results
    if out_json:
        with open(out_json, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
