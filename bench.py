"""Benchmark: Mrays/s per chip at the BASELINE.json operating point —
512x512 multi-scatter progressive path tracing (reference-parity estimator:
sample step 1/512, MAX_DEPTH 2000, NEE each bounce, no Russian roulette).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

"Rays" counts primary rays (pixels x subframes); every ray is a full
multiple-scattering path.  ``_ANCHOR_MRAYS`` is this repo's round-1
measurement on one TPU v5 lite chip (the reference publishes no numbers —
BASELINE.md), so vs_baseline tracks improvement across rounds.
"""

import json
import sys
import time

#: Round-1 anchor, measured on TPU v5e (see BASELINE.md: the reference has
#: no published numbers, so the baseline is our own first measurement).
_ANCHOR_MRAYS = 0.043


def main() -> None:
    import jax
    import jax.numpy as jnp

    from deepestscatter_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from deepestscatter_tpu import scene as scene_mod
    from deepestscatter_tpu.config import (
        CameraConfig,
        CloudModel,
        CloudRendering,
        ProgressiveConfig,
        SceneConfig,
    )
    from deepestscatter_tpu.data import procedural
    from deepestscatter_tpu.render import inscatter
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
        rendering=CloudRendering(march_dtype="uint8"),
    )
    density = procedural.cumulus(resolution=64, seed=11)
    params, static = scene_mod.build_scene(cfg, density)
    params = inscatter.with_baked_inscatter(params, static)

    renderer = ProgressiveRenderer(cfg, params, static, seed=1)
    renderer.tick()  # warmup: compile + first execution

    n_ticks = 2
    t0 = time.time()
    for _ in range(n_ticks):
        renderer.tick()
    jax.block_until_ready(renderer.state.mean)
    elapsed = time.time() - t0

    mean = float(renderer.hdr_image().mean())
    if not (0.1 < mean < 10.0):
        print(
            f"SANITY FAIL: image mean {mean} outside plausible range",
            file=sys.stderr,
        )
        sys.exit(1)

    mrays = width * height * subframes * n_ticks / elapsed / 1e6
    print(
        json.dumps(
            {
                "metric": "render_512sq_multiscatter",
                "value": round(mrays, 4),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / _ANCHOR_MRAYS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
