"""Measure the march hot-loop cost breakdown on the real chip.

Times, at the bench operating point (batch 512x512):
  (a) raw fused row gathers (random indices) from a 64^3 and 256^3 packed
      table — the HBM/VMEM gather ceiling,
  (b) gather + trilinear + exp (the physics arithmetic),
  (c) the full micro_step equivalent (via a fixed-length scan of the
      pathtracer loop body on a real scene).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 512 * 512
ITERS = 100


def timeit(fn, *args, n=3):
    """Time by VALUE FETCH, not block_until_ready: through the axon tunnel
    block_until_ready can return in ~dispatch time while the execution is
    still running remotely (measured: a 1 s gather scan "ready" in 0.2 ms,
    with the missing second then appearing on the first .sum() fetch —
    results verified correct against CPU).  Fetching a scalar reduction is
    data-dependent on the full computation and cannot be faked; its ~ms
    round-trip is negligible against >=0.1 s workloads.  Each call gets a
    distinct salt so no replay/dedup layer can serve a cached result."""
    float(fn(*args, jnp.uint32(0)).sum())  # warmup: compile + run
    t0 = time.time()
    for k in range(n):
        float(fn(*args, jnp.uint32(k + 1)).sum())
    return (time.time() - t0) / n


def gather_bench(ncells, label, row_bytes=16, dtype="uint8", sorted_idx=False):
    # rows passed as an ARGUMENT (a closed-over table would embed a 268 MB
    # constant in the HLO → axon tunnel HTTP 413) and generated ON DEVICE
    # (a 268 MB host→device transfer through the tunnel is also fragile).
    width = row_bytes if dtype == "uint8" else row_bytes // 4
    rows = jax.jit(
        lambda: jax.random.randint(
            jax.random.PRNGKey(0), (ncells, width), 0, 255, dtype=jnp.uint8
        ).astype(jnp.dtype(dtype))
    )()
    idx_host = np.random.randint(0, ncells, (BATCH,), np.int64)
    if sorted_idx:
        idx_host = np.sort(idx_host)
    idx0 = jnp.asarray(idx_host, jnp.uint32)

    @jax.jit
    def run(rows, idx, salt):
        # ``salt`` rotates the index stream per call so every timed
        # dispatch is a genuinely distinct computation — identical repeat
        # executions can otherwise be coalesced/cached by the tunneled
        # backend (timeit docstring).  Statistically identical workload.
        if sorted_idx:
            idx = jnp.minimum(idx + salt, jnp.uint32(ncells - 1))
        else:
            idx = (idx + salt) % jnp.uint32(ncells)
        def body(c, _):
            idx, acc = c
            r = jnp.take(rows, idx.astype(jnp.int32), axis=0, mode="clip")
            acc = acc + r[:, :8].astype(jnp.float32).sum(-1)
            # churn the indices so iterations don't collapse (uint32: int32
            # would wrap negative and clip-clamp lanes to row 0).  The
            # sorted stream keeps its order (+1 per iteration) — the
            # best case a ray-binning pass could manufacture.
            if sorted_idx:
                idx = (idx + jnp.uint32(1)) % jnp.uint32(ncells)
            else:
                idx = (idx * jnp.uint32(1103515245) + jnp.uint32(12345)) % jnp.uint32(ncells)
            return (idx, acc), None

        (idx, acc), _ = jax.lax.scan(body, (idx, jnp.zeros(BATCH)), None, length=ITERS)
        return acc

    dt = timeit(run, rows, idx0)
    per_row = dt / (BATCH * ITERS)
    print(f"{label}: {dt*1e3:.1f} ms/{ITERS} iters -> {per_row*1e9:.2f} ns/row, "
          f"{BATCH*ITERS/dt/1e6:.0f} Mrows/s, "
          f"{BATCH*ITERS*row_bytes/dt/1e9:.1f} GB/s effective")
    return per_row


def sweep(report):
    """The committed cost-model evidence (docs/PERFORMANCE.md cites this):
    raw random-row gather rate across table size x row width x dtype.
    Row widths are the real operating points: 16 B = packed cell rows,
    54 B = brick-2 rows, 250 B = brick-4 rows (2*(B+1)^3 uint8)."""
    out = []
    for dtype in ("uint8", "float32"):
        for row_bytes in (16, 56, 252):
            # float32 rows need 4-byte-aligned widths; 56/252 stay
            # comparable to the 54/250 uint8 brick rows.
            if dtype == "float32" and row_bytes % 4:
                continue
            for table_mb in (4, 32, 256, 1024):
                nrows = table_mb * (1 << 20) // row_bytes
                rec = {
                    "table_mb": table_mb,
                    "row_bytes": row_bytes,
                    "dtype": dtype,
                }
                for kind, srt in (("random", False), ("sorted", True)):
                    per_row = gather_bench(
                        nrows,
                        f"gather {table_mb}MB x {row_bytes}B {dtype} {kind}",
                        row_bytes=row_bytes,
                        dtype=dtype,
                        sorted_idx=srt,
                    )
                    rec[f"ns_per_row_{kind}"] = round(per_row * 1e9, 3)
                    rec[f"mrows_per_s_{kind}"] = round(1e-6 / per_row, 1)
                out.append(rec)
    report["gather_sweep"] = out


def main():
    import json

    out_json = None
    if "--json" in sys.argv:
        out_json = sys.argv[sys.argv.index("--json") + 1]
    report = {"batch": BATCH, "iters": ITERS}
    print("devices:", jax.devices())
    if "--sweep" in sys.argv:
        sweep(report)
        if out_json:
            with open(out_json, "w") as f:
                json.dump(report, f, indent=1)
            print(f"wrote {out_json}")
        return
    g64 = gather_bench(64**3, "gather 64^3 (4 MB)")
    g256 = gather_bench(256**3, "gather 256^3 (268 MB)")
    report["gather_ns_per_row_64cube"] = round(g64 * 1e9, 3)
    report["gather_ns_per_row_256cube"] = round(g256 * 1e9, 3)

    # full loop cost on a real scene
    from deepestscatter_tpu import scene as scene_mod
    from deepestscatter_tpu.config import (CameraConfig, CloudModel, CloudRendering,
                                           ProgressiveConfig, SceneConfig)
    from deepestscatter_tpu.data import procedural
    from deepestscatter_tpu.render import inscatter
    from deepestscatter_tpu.render.progressive import ProgressiveRenderer

    for res in (64, 256):
        cfg = SceneConfig(
            cloud=CloudModel(size_m=2000.0),
            camera=CameraConfig(width=512, height=512),
            progressive=ProgressiveConfig(subframes_per_tick=2),
            rendering=CloudRendering(march_dtype="uint8"),
        )
        density = procedural.cumulus(resolution=res, seed=11)
        params, static = scene_mod.build_scene(cfg, density)
        params = inscatter.with_baked_inscatter(params, static)
        r = ProgressiveRenderer(cfg, params, static, seed=1)
        t0 = time.time(); r.tick(); jax.block_until_ready(r.state.mean)
        compile_s = time.time() - t0
        t0 = time.time()
        nt = 2
        for _ in range(nt):
            r.tick()
        jax.block_until_ready(r.state.mean)
        dt = (time.time() - t0) / nt
        rays = 512 * 512 * 2
        print(f"render {res}^3: compile+first {compile_s:.1f}s, {dt:.2f} s/tick, "
              f"{rays/dt/1e6:.3f} Mrays/s, mean={float(r.hdr_image().mean()):.3f}")
        report[f"render_mrays_{res}cube"] = round(rays / dt / 1e6, 4)

    if out_json:
        with open(out_json, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
