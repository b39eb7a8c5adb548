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

TILE = 512  # lanes per grid program
NBUF = 8  # DMA pipeline depth


def _per_lane_kernel(idx_ref, rows_ref, out_ref, *, width):
    """TILE sequential row DMAs, NBUF in flight (the march's access
    pattern: one small row per lane, random address)."""

    def body(scratch, sems):
        def get_dma(slot, j):
            return pltpu.make_async_copy(
                rows_ref.at[idx_ref[j]],
                scratch.at[slot],
                sems.at[slot],
            )

        for k in range(NBUF):
            get_dma(k, k).start()

        def loop(j, acc):
            slot = jax.lax.rem(j, NBUF)
            pltpu.make_async_copy(
                rows_ref.at[idx_ref[j]], scratch.at[slot], sems.at[slot]
            ).wait()
            v = jnp.sum(scratch[slot].astype(jnp.float32))

            @pl.when(j + NBUF < TILE)
            def _():
                def start(s):
                    pltpu.make_async_copy(
                        rows_ref.at[idx_ref[j + NBUF]],
                        scratch.at[s],
                        sems.at[s],
                    ).start()

                start(slot)

            return acc + v

        acc = jax.lax.fori_loop(0, TILE, loop, jnp.float32(0.0))
        out_ref[0, 0] = acc

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((NBUF, width), jnp.uint8),
        sems=pltpu.SemaphoreType.DMA((NBUF,)),
    )


def _coalesced_kernel(idx_ref, rows_ref, out_ref, *, width, run):
    """TILE rows fetched as TILE//run block DMAs of ``run`` contiguous
    rows each — the upper bound after a perfect binning pass."""
    nblocks = TILE // run

    def body(scratch, sems):
        def get_dma(slot, b):
            return pltpu.make_async_copy(
                rows_ref.at[pl.ds(idx_ref[b], run)],
                scratch.at[slot],
                sems.at[slot],
            )

        for k in range(min(NBUF, nblocks)):
            get_dma(k, k).start()

        def loop(b, acc):
            slot = jax.lax.rem(b, NBUF)
            pltpu.make_async_copy(
                rows_ref.at[pl.ds(idx_ref[b], run)],
                scratch.at[slot],
                sems.at[slot],
            ).wait()
            v = jnp.sum(scratch[slot].astype(jnp.float32))

            @pl.when(b + NBUF < nblocks)
            def _():
                pltpu.make_async_copy(
                    rows_ref.at[pl.ds(idx_ref[b + NBUF], run)],
                    scratch.at[slot],
                    sems.at[slot],
                ).start()

            return acc + v

        acc = jax.lax.fori_loop(0, nblocks, loop, jnp.float32(0.0))
        out_ref[0, 0] = acc

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((NBUF, run, width), jnp.uint8),
        sems=pltpu.SemaphoreType.DMA((NBUF,)),
    )


def build(kind, nrows, width, batch, run=32, interpret=False):
    ntiles = batch // TILE
    if kind == "per_lane":
        kernel = functools.partial(_per_lane_kernel, width=width)
        idx_block = (TILE,)
    else:
        kernel = functools.partial(_coalesced_kernel, width=width, run=run)
        idx_block = (TILE // run,)

    grid_spec = pl.GridSpec(
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(
                idx_block, lambda i: (i,), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # rows stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM
        ),
    )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ntiles, 1), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )
    return jax.jit(call)


def measure(kind, nrows, width, batch, run=32, interpret=False, reps=3):
    fn = build(kind, nrows, width, batch, run=run, interpret=interpret)
    rows = jax.jit(
        lambda: jax.random.randint(
            jax.random.PRNGKey(0), (nrows, width), 0, 255, dtype=jnp.uint8
        )
    )()
    rng = np.random.default_rng(0)
    if kind == "per_lane":
        idx = rng.integers(0, nrows, batch).astype(np.int32)
    else:
        nblocks = batch // run
        idx = rng.integers(0, max(1, nrows - run), nblocks).astype(np.int32)
    idx = jnp.asarray(idx)
    out = fn(idx, rows)
    out.block_until_ready()
    # Correctness cross-check vs XLA take (per tile sums).
    if kind == "per_lane":
        want = (
            jnp.take(rows, idx, axis=0)
            .astype(jnp.float32)
            .sum(-1)
            .reshape(-1, TILE)
            .sum(-1)
        )
    else:
        gathered = jax.vmap(
            lambda s: jax.lax.dynamic_slice(rows, (s, 0), (run, width))
        )(idx)
        want = (
            gathered.astype(jnp.float32)
            .sum((-1, -2))
            .reshape(-1, TILE // run)
            .sum(-1)
        )
    np.testing.assert_allclose(
        np.asarray(out)[:, 0], np.asarray(want), rtol=1e-6
    )
    t0 = time.time()
    for _ in range(reps):
        r = fn(idx, rows)
    r.block_until_ready()
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
        cases = [(4096, 16, 4096), (4096, 256, 4096)]
        runs = (8,)
    else:
        # Match the march operating points: 268 MB cell table (16 B) and
        # the 65 MB brick-4 table (rounded to 256 B rows for alignment).
        cases = [(1 << 24, 16, 1 << 18), (1 << 18, 256, 1 << 18)]
        runs = (8, 32, 128)
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
