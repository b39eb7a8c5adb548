"""CLI — the app entry (reference: DG/src/main.cpp:26-85 plus the Python
utility mains), argparse instead of positional hardcoding:

    python -m deepestscatter_tpu render <cloud> [--out DIR] [--renderer pt]
    python -m deepestscatter_tpu setups <dataset_root> --clouds <root|specs...>
    python -m deepestscatter_tpu collect <dataset_root> <record_type> [...]
    python -m deepestscatter_tpu train-disney <dataset_root> [...]
    python -m deepestscatter_tpu train-baked <dataset_root> [...]
    python -m deepestscatter_tpu compare <pt.exr> <other.exr...> [--out DIR]
    python -m deepestscatter_tpu bench
    python -m deepestscatter_tpu eval [--root DIR] [--out report.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="deepestscatter_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("render", help="render a cloud (renderCloud task)")
    r.add_argument("cloud")
    r.add_argument("--out", default=".")
    r.add_argument(
        "--renderer", default="pt", choices=["pt", "nn", "bnn"],
        help="pt = path-traced ground truth; nn = RPNN; bnn = baked "
        "two-network (the reference renderCloud default, Tasks.cpp:86)",
    )
    r.add_argument(
        "--models-dir", default="runs",
        help="directory of exported *.params.msgpack (':init:' = untrained "
        "weights, smoke renders only)",
    )
    r.add_argument("--size-m", type=float, default=3000.0)
    r.add_argument("--directions", nargs="+", default=["Side", "Back"])
    r.add_argument("--max-subframes", type=int, default=None)
    r.add_argument("--width", type=int, default=None)
    r.add_argument("--height", type=int, default=None)

    s = sub.add_parser("setups", help="seed SceneSetup tables")
    s.add_argument("dataset_root")
    s.add_argument("--clouds", nargs="+", required=True,
                   help="cloud files/specs or a directory to glob")
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--scenes-per-cloud", type=int, default=30)

    c = sub.add_parser("collect", help="run one dataset collection stage")
    c.add_argument("dataset_root")
    c.add_argument("record_type", choices=[
        "ScatterSample", "Result", "DisneyDescriptor", "BakedInterpolationSet"])
    c.add_argument("--split", default="train",
                   choices=["train", "validation", "test"])
    c.add_argument("--mode", default="continue", choices=["continue", "overwrite"])
    c.add_argument("--max-scenes", type=int, default=None)

    for name in ("train-disney", "train-baked"):
        t = sub.add_parser(name, help=f"{name} on a collected dataset")
        t.add_argument("dataset_root")
        t.add_argument("--epochs", type=int, default=None)
        t.add_argument("--run-dir", default="runs")

    m = sub.add_parser("compare", help="RMS bias vs PT ground truth")
    m.add_argument("pt_exr")
    m.add_argument("others", nargs="+")
    m.add_argument("--out", default=None)

    sub.add_parser("bench", help="run the chip benchmark")

    e = sub.add_parser(
        "eval",
        help="end-to-end quality eval: dataset -> training -> NN/BNN/PT "
        "renders -> RMS bias (GenerateComparisons.py analog)",
    )
    e.add_argument("--root", default="runs/eval_e2e")
    e.add_argument("--out", default=None, help="report JSON path")
    e.add_argument("--width", type=int, default=256)
    e.add_argument("--height", type=int, default=128)
    e.add_argument("--scenes-per-cloud", type=int, default=2)
    e.add_argument("--batch-size", type=int, default=2048)
    e.add_argument("--epochs-nn", type=int, default=50)
    e.add_argument("--epochs-bnn", type=int, default=30)
    e.add_argument("--skip-baked", action="store_true")

    args = p.parse_args(argv)

    if args.cmd == "render":
        from . import tasks
        from .config import ProgressiveConfig, SceneConfig

        base = SceneConfig()
        if args.max_subframes is not None:
            base = dataclasses.replace(
                base,
                progressive=dataclasses.replace(
                    base.progressive, max_subframes=args.max_subframes
                ),
            )
        if args.width or args.height:
            cam = base.camera
            base = dataclasses.replace(
                base,
                camera=dataclasses.replace(
                    cam,
                    width=args.width or cam.width,
                    height=args.height or cam.height,
                ),
            )
        tasks.render_cloud(
            args.cloud, args.out, args.renderer, args.size_m,
            directions=args.directions, base=base,
            models_dir=args.models_dir,
        )
    elif args.cmd == "setups":
        import os

        from .data import scenesetups

        clouds = []
        for spec in args.clouds:
            if os.path.isdir(spec):
                clouds.extend(scenesetups.find_clouds(spec))
            else:
                clouds.append(spec)
        scenesetups.generate(
            args.dataset_root, clouds, seed=args.seed,
            scenes_per_cloud=args.scenes_per_cloud,
        )
        print(f"seeded {len(clouds)} clouds under {args.dataset_root}")
    elif args.cmd == "collect":
        from . import tasks
        from .data.store import DatasetTriplet

        triplet = DatasetTriplet(args.dataset_root)
        store = getattr(triplet, args.split)
        mode = (
            tasks.CollectMode.CONTINUE
            if args.mode == "continue"
            else tasks.CollectMode.OVERWRITE
        )
        n = tasks.collect(
            store, args.record_type, mode, max_scenes=args.max_scenes
        )
        print(f"processed {n} scenes")
    elif args.cmd in ("train-disney", "train-baked"):
        from .config import TrainConfig
        from .train import entries

        cfg = TrainConfig(run_dir=args.run_dir)
        fn = (
            entries.train_disney
            if args.cmd == "train-disney"
            else entries.train_baked
        )
        fn(args.dataset_root, config=cfg, epochs=args.epochs)
    elif args.cmd == "compare":
        from .utils import compare

        result = compare.compare_renders(args.pt_exr, args.others, args.out)
        print(json.dumps(result, indent=2))
    elif args.cmd == "bench":
        import runpy

        runpy.run_module("bench", run_name="__main__")
    elif args.cmd == "eval":
        import os
        import sys as _sys

        _sys.path.insert(
            0,
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "tools",
            ),
        )
        import eval_e2e

        eval_e2e.run_eval(
            args.root,
            scenes_per_cloud=args.scenes_per_cloud,
            batch_size=args.batch_size,
            width=args.width,
            height=args.height,
            epochs_disney=args.epochs_nn,
            epochs_baked=args.epochs_bnn,
            out_json=args.out,
            skip_baked=args.skip_baked,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
