"""Benchmark: Mrays/s per chip at the BASELINE.json operating point —
512x512 multi-scatter progressive path tracing (reference-parity estimator:
sample step 1/512, MAX_DEPTH 2000, NEE each bounce, no Russian roulette) —
at BOTH a 64^3 (cache-resident) and a 256^3 (reference-scale, HBM-resident)
cloud grid.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} where
``value`` is the 256^3 (reference-scale) figure and the extra keys carry the
64^3 figure and the ROOFLINE accounting: the deferred march loop is
gather-bound (every march step fetches one fused 16-byte density+inscatter
row; see config.CloudRendering.march_deferred), so the speed-of-light bound
is the measured raw row-gather ceiling at the same table size.  The render's
achieved rows/s over that ceiling is the %-of-roofline — the falsifiable
"how far from speed of light" number BASELINE.md calls for.

"Rays" counts primary rays (pixels x subframes); every ray is a full
multiple-scattering path.  ``_ANCHOR_MRAYS`` is this repo's round-1
measurement on one TPU v5 lite chip (the reference publishes no numbers —
BASELINE.md), so vs_baseline tracks improvement across rounds.
"""

import functools
import json
import sys
import time

#: Round-1 anchor, measured on TPU v5e at 64^3 (see BASELINE.md: the
#: reference has no published numbers, so the baseline is our own first
#: measurement).
_ANCHOR_MRAYS = 0.043

#: Minimum measured wall-clock per configuration (driver requirement: a
#: bench short enough to be noise is not a bench).
_MIN_SECONDS = 10.0


def _measure(res: int, report_stats: bool, brick: int = 0) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepestscatter_tpu import scene as scene_mod
    from deepestscatter_tpu.config import (
        CameraConfig,
        CloudModel,
        CloudRendering,
        ProgressiveConfig,
        SceneConfig,
    )
    from deepestscatter_tpu.data import procedural
    from deepestscatter_tpu.render import camera as camera_ops
    from deepestscatter_tpu.render import inscatter, pathtracer
    from deepestscatter_tpu.render.progressive import ProgressiveRenderer

    width = height = 512
    subframes = 2
    cfg = SceneConfig(
        cloud=CloudModel(size_m=2000.0),
        camera=CameraConfig(width=width, height=height),
        progressive=ProgressiveConfig(subframes_per_tick=subframes),
        # uint8 march rows ARE the reference's storage semantics (density
        # and in-scatter grids are uint8 textures: Resources.cpp:93-96,
        # inScatter.cu:65) and gather ~2x faster than float32 rows.
        rendering=CloudRendering(march_dtype="uint8", march_brick=brick),
    )
    density = procedural.cumulus(resolution=res, seed=11)
    params, static = scene_mod.build_scene(cfg, density)
    params = inscatter.with_baked_inscatter(params, static)

    renderer = ProgressiveRenderer(cfg, params, static, seed=1)
    renderer.tick()  # warmup: compile + first execution

    # Calibrate tick count to >= _MIN_SECONDS of measured work.
    t0 = time.time()
    renderer.tick()
    jax.block_until_ready(renderer.state.mean)
    per_tick = time.time() - t0
    n_ticks = max(2, int(_MIN_SECONDS / per_tick) + 1)

    t0 = time.time()
    for _ in range(n_ticks):
        renderer.tick()
    jax.block_until_ready(renderer.state.mean)
    elapsed = time.time() - t0

    mean = float(renderer.hdr_image().mean())
    if not (0.1 < mean < 10.0):
        print(
            f"SANITY FAIL ({res}^3): image mean {mean} outside plausible "
            "range",
            file=sys.stderr,
        )
        sys.exit(1)

    rays = width * height * subframes * n_ticks
    out = {
        "mrays_per_s": round(rays / elapsed / 1e6, 4),
        "elapsed_s": round(elapsed, 1),
        "ticks": n_ticks,
    }
    if not report_stats:
        return out

    # --- roofline accounting (one instrumented tick) -----------------------
    # The deferred loop reports (cumulative march_iter calls, cumulative
    # resolve calls, buffer size) per compaction phase; each march_iter and
    # each resolve performs exactly ONE fused-row gather over its phase
    # buffer, so the gather count is exact.  The instrument mirrors the
    # renderer's real execution: the same lane-band partition (bounded
    # device calls on HBM-resident grids) and the same lane-regeneration
    # tick, summed over bands.
    basis = camera_ops.camera_basis(cfg.camera)
    origins, directions = camera_ops.generate_rays(basis, width, height)
    n = origins.shape[0]
    m = renderer._lanes_per_call()
    ids = jnp.arange(n, dtype=jnp.uint32)

    @functools.partial(jax.jit, static_argnames=("s",))
    def band_stats(params, o, d, rid, s):
        _, stats = pathtracer.trace_tick_moments(
            params, static, o, d, 1, jnp.int32(0), s, ray_ids=rid,
            with_stats=True,
        )
        return stats

    rows_per_tick = 0.0
    for lo in range(0, n, m):
        iters, nres, bufs = map(
            np.asarray,
            band_stats(
                params, origins[lo:lo + m], directions[lo:lo + m],
                ids[lo:lo + m], subframes,
            ),
        )
        d_iters = np.diff(iters, prepend=0)
        d_nres = np.diff(nres, prepend=0)
        rows_per_tick += float(((d_iters + d_nres) * bufs).sum())
    achieved_rows_s = rows_per_tick * n_ticks / elapsed

    # Raw gather ceiling at the SAME table size, row width, and dtype as
    # the HOT march gather — the density half of the split tables
    # ((brick+1)^3 B rows; 8 B cell rows): a scan of back-to-back
    # jnp.take calls with index churn (nothing but the gather).
    from deepestscatter_tpu.scene import march_row_width

    half = (brick + 1) ** 3 if brick else 8
    rows_tab = params.march_rows.reshape(-1, march_row_width(brick))[:, :half]
    idx0 = jnp.asarray(
        np.random.default_rng(0).integers(0, rows_tab.shape[0], width * height),
        jnp.uint32,
    )
    iters_ceil = 100

    @jax.jit
    def raw_gather(rows_tab, idx):
        def body(c, _):
            idx, acc = c
            r = jnp.take(rows_tab, idx.astype(jnp.int32), axis=0, mode="clip")
            acc = acc + r[:, :8].astype(jnp.float32).sum(-1)
            # (read width min(8, half) — the sum is there only to keep
            # the gather live; cost is the fetch)
            # LCG churn in uint32 (int32 would wrap negative and clip-clamp
            # every lane to row 0, making the "random gather" cache-resident).
            idx = (
                idx * jnp.uint32(1103515245) + jnp.uint32(12345)
            ) % jnp.uint32(rows_tab.shape[0])
            return (idx, acc), None

        (_, acc), _ = jax.lax.scan(
            body, (idx, jnp.zeros(idx.shape[0])), None, length=iters_ceil
        )
        return acc

    # Time by value fetch: block_until_ready can return before remote
    # execution finishes through the tunneled backend; a scalar fetch is
    # data-dependent and honest (see tools/perf_probe.timeit).
    float(raw_gather(rows_tab, idx0).sum())
    t0 = time.time()
    for _ in range(3):
        float(raw_gather(rows_tab, idx0).sum())
    dt = (time.time() - t0) / 3
    ceiling_rows_s = idx0.shape[0] * iters_ceil / dt

    out.update(
        rows_per_s=round(achieved_rows_s / 1e6, 1),
        roofline_rows_per_s=round(ceiling_rows_s / 1e6, 1),
        pct_of_roofline=round(100.0 * achieved_rows_s / ceiling_rows_s, 1),
    )
    return out


def _measure_neural(res: int = 256, width: int = 512, height: int = 256) -> dict:
    """Steady-state ms/frame of the neural renderers at the reference's
    renderCloud operating point (512x256, Tasks.cpp:49-50; the reference
    prints MS/FRAME in GuiExecutionLoop.cpp:114-128).  One frame = one
    sample per pixel (the analog of one subframe launch).  Weights are
    fresh-init: throughput does not depend on the values."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from deepestscatter_tpu import scene as scene_mod, tasks
    from deepestscatter_tpu.config import (
        CameraConfig,
        CloudModel,
        CloudRendering,
        SceneConfig,
    )
    from deepestscatter_tpu.data import procedural
    from deepestscatter_tpu.render import camera as camera_ops, inscatter

    cfg = SceneConfig(
        cloud=CloudModel(size_m=2000.0),
        camera=CameraConfig(width=width, height=height),
        rendering=CloudRendering(march_dtype="uint8"),
    )
    density = procedural.cumulus(resolution=res, seed=11)
    params, static = scene_mod.build_scene(cfg, density)
    params = inscatter.with_baked_inscatter(params, static)
    basis = camera_ops.camera_basis(cfg.camera)
    out = {}
    for kind in ("nn", "bnn"):
        t0 = _time.time()
        r = tasks._load_neural_renderer(kind, params, static, ":init:")
        init_s = _time.time() - t0  # includes the BNN probe-lattice bake
        img = r.render_frame(params, static, width, height, basis, seed=1)
        float(jnp.sum(img))  # value fetch: block_until_ready lies (docs)
        t0 = _time.time()
        n = 0
        while _time.time() - t0 < _MIN_SECONDS:
            img = r.render_frame(
                params, static, width, height, basis, seed=2 + n
            )
            float(jnp.sum(img))
            n += 1
        ms = (_time.time() - t0) / n * 1e3
        n_rays, n_hit, n_scat = r._camera.last_counts
        out[kind] = {
            "ms_per_frame": round(ms, 1),
            "fps": round(1e3 / ms, 2),
            "init_s": round(init_s, 1),
            "frames": n,
            # Compaction ratios of the measured frame: marches run on the
            # hit set, descriptor+MLP on the scattered set.
            "frac_hit": round(n_hit / max(n_rays, 1), 3),
            "frac_scattered": round(n_scat / max(n_rays, 1), 3),
        }
    return out


#: Operating brick at both grid sizes: 3 — the measured best with split
#: density/in-scatter tables (SPLIT_TABLES_r04.json: 256^3 0.423 Mrays/s
#: vs 0.286 fused / 0.147 cell rows; 64^3 0.652 vs 0.454 at the old
#: brick-4 point).  The brick sweep history: BRICK_SWEEP_r04.jsonl
#: (fused rows), BRICK256_TUNE.json (padded widths + scheduling knobs —
#: defaults optimal).  Override with --brick N.
_DEFAULT_BRICK_256 = 3

#: 64^3 operating brick (see above; brick 4 = 0.479, brick 2 = 0.419).
_DEFAULT_BRICK_64 = 3


def main() -> None:
    from deepestscatter_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    brick = _DEFAULT_BRICK_256
    if "--brick" in sys.argv:
        brick = int(sys.argv[sys.argv.index("--brick") + 1])
    if "--brick-sweep" in sys.argv:
        # Commit-grade sweep at the 256^3 point (VERDICT r3 task 2a);
        # prints one JSON object per brick, NOT the driver line.
        for b in (0, 2, 3, 4, 6):
            r = _measure(256, report_stats=True, brick=b)
            print(json.dumps({"brick": b, **r}), flush=True)
        return

    r64 = _measure(64, report_stats=False, brick=_DEFAULT_BRICK_64)
    r256 = _measure(256, report_stats=True, brick=brick)
    neural = _measure_neural(256)

    print(
        json.dumps(
            {
                "metric": "render_512sq_multiscatter_256cube",
                "value": r256["mrays_per_s"],
                "unit": "Mrays/s",
                "vs_baseline": round(r256["mrays_per_s"] / _ANCHOR_MRAYS, 3),
                "brick_256": brick,
                "grid64": r64,
                "grid256": r256,
                "neural_512x256": neural,
                "roofline": {
                    "Mrows_per_s_achieved": r256.get("rows_per_s"),
                    "Mrows_per_s_ceiling": r256.get("roofline_rows_per_s"),
                    "pct_of_gather_bound": r256.get("pct_of_roofline"),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
