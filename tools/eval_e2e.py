"""End-to-end quality evaluation: dataset → training → renders → RMS bias.

This is the framework's integration test made into one reproducible
artifact — the analog of the reference's de-facto acceptance check
(TR/Utils/GenerateComparisons.py:32-43: tone-map the path-traced ground
truth and the neural renders with the shared Reinhard operator, report the
RMS of the difference).

Pipeline (every stage resumable):
  1. seed SceneSetups: train clouds × scenes (random light/size) into
     <root>/Train, a held-out cloud into <root>/Validation;
  2. run the 4 collector stages on both stores (ScatterSample → Result →
     DisneyDescriptor → BakedInterpolationSet), CONTINUE-resumable;
  3. train the RPNN (DisneyModel) and the two-stage Baked model with the
     reference recipe (log-MSE, Adam-amsgrad 1e-3, seed 566);
  4. render the HELD-OUT validation scene: converged PT ground truth, the
     NN (RPNN) and BNN (baked) renders with the trained weights, and the
     same renders with freshly initialized weights (the random baseline);
  5. report RMS bias of each render vs PT (utils.compare.rms_bias) into a
     JSON artifact (EVAL_r04.json) + EXRs/diff images for inspection.

Run on the real chip:
    cd /root/repo && timeout 5400 python -u tools/eval_e2e.py --out EVAL_r04.json

The smoke-scale version runs in tests/test_eval_e2e.py on CPU.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time
from typing import Dict, Optional, Sequence

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _seed_setups(root, train_clouds, val_cloud, scenes_per_cloud,
                 val_scenes, size_range, seed):
    """Explicit SceneSetup seeding (GenerateSceneSetups.py semantics with a
    controlled train/held-out split: the eval cloud never appears in Train)."""
    from deepestscatter_tpu.data import records
    from deepestscatter_tpu.data.store import DatasetTriplet

    rng = np.random.default_rng(seed)
    triplet = DatasetTriplet(root)

    # Sizes snap to a small discrete ladder: density_multiplier is a
    # compile-time constant of the march programs, so arbitrary per-scene
    # sizes would force one full XLA compile per scene; a handful of
    # distinct sizes lets all scenes share compiled programs.
    ladder = np.geomspace(size_range[0], size_range[1], 4)

    def make(clouds, n_each):
        out = np.zeros(len(clouds) * n_each, records.SCENE_SETUP)
        i = 0
        for cloud in clouds:
            for _ in range(n_each):
                lo, hi = np.log(size_range[0]), np.log(size_range[1])
                size = float(np.exp(rng.uniform(lo, hi)))
                size = float(ladder[np.argmin(np.abs(ladder - size))])
                phi = rng.uniform(0.0, 2.0 * np.pi)
                cos_t = rng.uniform(-1.0, 1.0)
                sin_t = np.sqrt(1.0 - cos_t**2)
                light = np.asarray(
                    [np.cos(phi) * sin_t, np.sin(phi) * sin_t, cos_t],
                    np.float32,
                )
                out[i] = (cloud.encode()[:records.CLOUD_PATH_LEN], size, light)
                i += 1
        return out

    if triplet.train.count("SceneSetup") == 0:
        triplet.train.table("SceneSetup").batch_append(
            0, make(train_clouds, scenes_per_cloud)
        )
    if triplet.validation.count("SceneSetup") == 0:
        triplet.validation.table("SceneSetup").batch_append(
            0, make([val_cloud], val_scenes)
        )
    return triplet


def run_eval(
    root: str,
    train_clouds: Sequence[str] = (
        "procedural:64:21",
        "procedural:64:22",
        "procedural:64:23",
    ),
    val_cloud: str = "procedural:64:29",
    scenes_per_cloud: int = 2,
    val_scenes: int = 2,
    batch_size: int = 2048,
    size_range=(1200.0, 4000.0),
    width: int = 256,
    height: int = 128,
    base_cfg=None,
    radiance_cfg=None,
    train_cfg=None,
    epochs_disney: int = 50,
    epochs_baked: int = 30,
    render_seed: int = 3,
    seed: int = 7,
    out_json: Optional[str] = None,
    skip_baked: bool = False,
    verbose: bool = True,
    run_name: str = "runs",
    device_resident: bool = True,
    collect: bool = True,
) -> Dict:
    from deepestscatter_tpu import tasks
    from deepestscatter_tpu.config import (
        CameraConfig,
        PointRadianceConfig,
        SceneConfig,
        TrainConfig,
    )
    from deepestscatter_tpu.render import camera as camera_ops
    from deepestscatter_tpu.render.progressive import ProgressiveRenderer
    from deepestscatter_tpu.train import entries
    from deepestscatter_tpu.utils import compare, exr

    from deepestscatter_tpu.config import CloudRendering

    t_start = time.time()
    timings: Dict[str, float] = {}
    if base_cfg is None:
        # Unbiased Russian roulette from bounce 64 (config.CloudRendering
        # notes): expectation-preserving, cuts the deep-diffusion tail that
        # dominates label generation in dense scenes.  The reference walks
        # every path to MAX_DEPTH 2000; gates stay the reference's CI gates.
        base_cfg = SceneConfig(
            rendering=CloudRendering(
                rr_start_depth=64,
                rr_survival=0.98,
                # uint8 march rows: the reference's texture storage and the
                # AUTO-brick fast path (tasks._production_base rationale).
                march_dtype="uint8",
            )
        )
    base_cfg = dataclasses.replace(
        base_cfg, camera=CameraConfig(width=width, height=height)
    )
    # Black-sample budget capped at 20k experiments (reference: 100k,
    # RadianceCollector.cpp:117).  Black points are exactly-zero labels
    # (deep shadow where the uint8 sun transmittance floors to 0); the cap
    # only limits how long the collector keeps CONFIRMING zero, trading
    # months-of-GPU-class label burn-in for an eval that runs in hours.
    radiance_cfg = radiance_cfg or PointRadianceConfig(
        black_min_experiments=20_000
    )
    run_dir = os.path.join(root, run_name)
    train_cfg = train_cfg or TrainConfig(
        run_dir=run_dir, val_batch_size=min(4096, val_scenes * batch_size)
    )

    # -- 1. scene setups ----------------------------------------------------
    triplet = _seed_setups(
        root, train_clouds, val_cloud, scenes_per_cloud, val_scenes,
        size_range, seed,
    )

    # -- 2. the 4 collector stages on both stores ---------------------------
    # ``collect=False`` trains/evaluates on whatever prefix a separately
    # supervised collection run has produced (tools/collect_r05.py
    # interleaves the stages per scene, so any stop point is a consistent
    # prefix; dataset length is min over tables as always).
    t0 = time.time()
    if collect:
        for store_name, store in (("train", triplet.train),
                                  ("val", triplet.validation)):
            for stage in ("ScatterSample", "Result", "DisneyDescriptor",
                          "BakedInterpolationSet"):
                t1 = time.time()
                n = tasks.collect(
                    store, stage, tasks.CollectMode.CONTINUE, base=base_cfg,
                    radiance_cfg=radiance_cfg, batch_size=batch_size,
                    verbose=verbose,
                )
                if verbose and n:
                    print(f"[eval] {store_name}/{stage}: {n} scenes "
                          f"({time.time() - t1:.1f}s)", flush=True)
    timings["collect_s"] = round(time.time() - t0, 1)

    # -- 3. training ---------------------------------------------------------
    results: Dict = {}
    nn_export = os.path.join(run_dir, "DisneyModel",
                             "DisneyModel.params.msgpack")
    t0 = time.time()
    if not os.path.exists(nn_export):
        t = entries.train_disney(
            root, config=train_cfg, epochs=epochs_disney,
            device_resident=device_resident,
        )
        results["val_loss_nn"] = t.best_val
    timings["train_nn_s"] = round(time.time() - t0, 1)
    bnn_export = os.path.join(run_dir, "BakedModel",
                              "LightProbeModel.params.msgpack")
    t0 = time.time()
    if not skip_baked and not os.path.exists(bnn_export):
        t = entries.train_baked(
            root, config=train_cfg, epochs=epochs_baked,
            device_resident=device_resident,
        )
        results["val_loss_bnn"] = t.best_val
    timings["train_bnn_s"] = round(time.time() - t0, 1)

    # -- 4. renders of the held-out scene ------------------------------------
    setup = triplet.validation.table("SceneSetup").get_record(0)
    cfg, params, static = tasks.scene_from_setup(setup, base_cfg)
    basis = camera_ops.camera_basis(cfg.camera)
    img_dir = os.path.join(
        root, "renders" if (width, height) == (256, 128)
        else f"renders_{width}x{height}"
    )
    os.makedirs(img_dir, exist_ok=True)

    # The converged PT ground truth is the longest render; reuse a
    # previously-written EXR so a resumed/staged eval never re-pays it.
    pt_path = os.path.join(img_dir, "eval.PT.exr")
    t0 = time.time()
    if os.path.exists(pt_path):
        pt = exr.read_exr(pt_path)
        results["pt_subframes"] = -1  # reused from disk
    else:
        prog = ProgressiveRenderer(cfg, params, static, seed=render_seed)
        pt = prog.run(verbose=verbose)
        results["pt_subframes"] = int(prog.state.subframe_id)
        exr.write_exr(pt_path, pt)
    timings["render_pt_s"] = round(time.time() - t0, 1)
    results["pt_mean"] = float(pt.mean())

    def neural_frame(kind: str, models_dir: str) -> np.ndarray:
        weights = tasks._load_neural_weights(kind, models_dir)
        r = tasks._build_neural_renderer(kind, weights, params, static)
        return np.asarray(
            r.render_frame(params, static, width, height, basis,
                           seed=render_seed)
        )

    renders = {"nn": ("trained", run_dir), "nn_random": ("random", ":init:")}
    if not skip_baked:
        renders["bnn"] = ("trained", run_dir)
        renders["bnn_random"] = ("random", ":init:")
    for name, (_, mdir) in renders.items():
        t0 = time.time()
        kind = name.split("_")[0]
        img = neural_frame(kind, mdir)
        timings[f"render_{name}_s"] = round(time.time() - t0, 1)
        exr.write_exr(os.path.join(img_dir, f"eval.{name.upper()}.exr"), img)
        results[f"rms_{name}"] = compare.rms_bias(pt, img)
        exr.write_exr(
            os.path.join(img_dir, f"eval.{name.upper()}.diff.exr"),
            compare.diff_image(pt, img),
        )
        if verbose:
            print(f"[eval] rms_{name} = {results[f'rms_{name}']:.5f}",
                  flush=True)

    timings["total_s"] = round(time.time() - t_start, 1)
    report = {
        "metric": "rms_bias_vs_pt_toneMapped",
        "reference": "GenerateComparisons.py:32-43",
        "held_out_scene": {
            "cloud": val_cloud,
            "size_m": float(setup["cloud_size_m"]),
            "light": [float(x) for x in setup["light_direction"]],
        },
        "dataset": {
            # ACTUAL collected prefix (min over the tables training reads),
            # not the seeded target — a --no-collect eval runs on whatever
            # a separately supervised collection produced.
            "train_scenes_seeded": triplet.train.count("SceneSetup"),
            "train_scenes": min(
                triplet.train.count(t)
                for t in ("ScatterSample", "Result", "DisneyDescriptor")
            ) // batch_size,
            "train_labels": min(
                triplet.train.count(t) for t in ("ScatterSample", "Result")
            ),
            "val_scenes": triplet.validation.count("SceneSetup"),
            "samples_per_scene": batch_size,
        },
        "label_generation": {
            "rr_start_depth": base_cfg.rendering.rr_start_depth,
            "rr_survival": base_cfg.rendering.rr_survival,
            "black_min_experiments": radiance_cfg.black_min_experiments,
            "rel_tol": radiance_cfg.rel_tol,
            "abs_tol": radiance_cfg.abs_tol,
            # Recorded honestly: the round-5 dataset grew across code
            # revisions — labels collected before/after the bimodal Mie
            # refit (max 0.28 deg direction-sampling shift) and the
            # round-5 march scheduling changes (bit-identical estimator)
            # are mixed.  Every label is an unbiased CI-gated estimate
            # either way; the heterogeneity is far below the 2e-2
            # relative CI gate.
            "notes": "labels span r4/r5 phase-table and scheduler "
                     "revisions (sub-CI heterogeneity; see commit log)",
        },
        "resolution": [width, height],
        **results,
        "timings": timings,
    }
    if out_json:
        with open(out_json, "w") as f:
            json.dump(report, f, indent=1)
    print(json.dumps(report))
    return report


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", default="runs/eval_e2e")
    p.add_argument("--out", default=None, help="write the report JSON here")
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--scenes-per-cloud", type=int, default=2)
    p.add_argument("--batch-size", type=int, default=2048)
    p.add_argument("--epochs-nn", type=int, default=50)
    p.add_argument("--epochs-bnn", type=int, default=30)
    p.add_argument("--skip-baked", action="store_true")
    p.add_argument("--run-name", default="runs",
                   help="training run subdirectory under --root (use a "
                        "fresh name to retrain instead of reusing exports)")
    p.add_argument("--no-collect", action="store_true",
                   help="skip the collector stages (train/eval on the "
                        "prefix a supervised collection run produced)")
    args = p.parse_args(argv)
    # Long unattended runs on the tunneled chip: if a device call wedges,
    # dump all-thread tracebacks every 10 min so the hang site is in the log.
    import faulthandler

    faulthandler.dump_traceback_later(600, repeat=True)
    from deepestscatter_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    run_eval(
        args.root,
        scenes_per_cloud=args.scenes_per_cloud,
        batch_size=args.batch_size,
        width=args.width,
        height=args.height,
        epochs_disney=args.epochs_nn,
        epochs_baked=args.epochs_bnn,
        out_json=args.out,
        skip_baked=args.skip_baked,
        run_name=args.run_name,
        collect=not args.no_collect,
    )


if __name__ == "__main__":
    main(sys.argv[1:])
