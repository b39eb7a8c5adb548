"""Task orchestration — the Tasks/GuiExecutionLoop layer, TPU-native.

The reference queues lazy tasks, each building a fresh DI container and
running a scene to convergence (GuiExecutionLoop.cpp:85-128, Tasks.cpp).
Here a task is a plain function over (SceneConfig → scene pytree → jitted
programs); "the container" is ``scene.build_scene``.

- ``render_cloud``: the renderCloud entry (Tasks.cpp:104-112): renders a
  cloud at 512x256 for the Side and Back light directions and writes
  ``<cloud>.<dir>.<Renderer>.exr`` (PT to convergence, or a neural
  renderer given trained params).
- ``collect``: the 4-stage dataset pipeline over a store's SceneSetup
  table with the reference's slice-ownership and resume arithmetic
  (scene i owns ids [i*2048, (i+1)*2048); Continue resumes at
  count // 2048 — Tasks.h:59-68, Tasks.cpp:137).
"""

from __future__ import annotations

import dataclasses
import enum
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .config import (
    LIGHT_DIRECTIONS,
    BatchSettings,
    CloudModel,
    CloudRendering,
    DirectionalLight,
    PointRadianceConfig,
    SceneConfig,
)
from .data import clouds as clouds_mod
from .data import collectors, records
from .data.store import RecordStore
from .render import camera as camera_ops
from .render import inscatter
from .render.progressive import ProgressiveRenderer
from .scene import build_scene
from .utils import exr


class CollectMode(enum.Enum):
    OVERWRITE = "overwrite"
    CONTINUE = "continue"  # resume from count // BATCH_SIZE (Tasks.h:59-68)


def _production_base() -> SceneConfig:
    """Default scene config for datagen/render tasks: uint8 march rows —
    the reference's own texture storage for both density and the baked
    sun transmittance (Resources.cpp:93-96, inScatter.cu:65) — which also
    unlocks the AUTO brick layout (scene.build_scene), the measured
    1.2-2x march multiplier (BRICK_SWEEP_r04.jsonl, GRID64_BISECT.json).
    Mip pyramids (descriptor inputs) stay float32."""
    return SceneConfig(rendering=CloudRendering(march_dtype="uint8"))


def scene_from_setup(
    setup: np.void,
    base: Optional[SceneConfig] = None,
    bake: bool = True,
):
    """SceneSetup record → (params, static) — the installSceneSetup analog
    (installers.cpp:76-105: sampleStep 1/512, intensity 1e6, mipmaps on)."""
    base = base or _production_base()
    cloud_path = bytes(setup["cloud_path"]).rstrip(b"\x00").decode()
    density = clouds_mod.prepare(clouds_mod.load_density(cloud_path))
    light = tuple(float(x) for x in setup["light_direction"])
    cfg = dataclasses.replace(
        base,
        cloud=dataclasses.replace(
            base.cloud, volume_path=cloud_path, size_m=float(setup["cloud_size_m"])
        ),
        light=dataclasses.replace(base.light, direction=light),
    )
    params, static = build_scene(cfg, density)
    if bake:
        params = inscatter.with_baked_inscatter(params, static)
    return cfg, params, static


def collect(
    store: RecordStore,
    record_type: str,
    mode: CollectMode = CollectMode.CONTINUE,
    base: Optional[SceneConfig] = None,
    radiance_cfg: PointRadianceConfig = PointRadianceConfig(),
    batch_size: int = records.BATCH_SIZE,
    max_scenes: Optional[int] = None,
    verbose: bool = True,
) -> int:
    """Run one collection stage over every SceneSetup in ``store``.

    Returns the number of scenes processed.  Stage order follows the
    reference pipeline: ScatterSample → Result → DisneyDescriptor →
    BakedInterpolationSet; each stage requires its predecessors' records.
    """
    n_scenes = store.count("SceneSetup")
    if max_scenes is not None:
        n_scenes = min(n_scenes, max_scenes)
    start_scene = 0
    if mode is CollectMode.CONTINUE:
        start_scene = store.count(record_type) // batch_size
    setups = store.table("SceneSetup")
    processed = 0
    for scene_id in range(start_scene, n_scenes):
        if verbose:
            # Liveness marker BEFORE the device work: a scene's first launch
            # can spend minutes in compile + lockstep loops, and unattended
            # runs (tools/eval_e2e.py) need to show which scene they're on.
            print(
                f"[collect {record_type}] scene {scene_id + 1}/{n_scenes}...",
                flush=True,
            )
        setup = setups.get_record(scene_id)
        batch = BatchSettings(start_id=scene_id * batch_size, size=batch_size)
        cfg, params, static = scene_from_setup(
            setup, base, bake=(record_type != "ScatterSample")
        )
        seed = scene_id  # deterministic, restart-stable per scene

        if record_type == "ScatterSample":
            pos, direction = collectors.generate_scatter_samples(
                params, static, batch.size, seed
            )
            out = np.zeros(batch.size, records.SCATTER_SAMPLE)
            out["scene_setup_id"] = scene_id
            out["point"] = np.asarray(pos)
            out["view_direction"] = np.asarray(direction)
            store.table("ScatterSample").batch_append(batch.start_id, out)
        else:
            samples = store.table("ScatterSample").read(
                batch.start_id, batch.size
            )
            pos = jnp.asarray(samples["point"])
            direction = jnp.asarray(samples["view_direction"])
            if record_type == "Result":
                est = collectors.estimate_point_radiance(
                    params, static, pos, direction, radiance_cfg, seed=seed,
                    verbose=verbose,
                    # Mid-scene restartability: a killed/wedged run resumes
                    # the exact experiment sequence (RNG is keyed by
                    # absolute experiment index).
                    state_path=os.path.join(
                        store.root, f".radiance_state.{scene_id}.npz"
                    ),
                )
                out = np.zeros(batch.size, records.RESULT)
                out["light_intensity"] = np.asarray(est.radiance)
                out["is_converged"] = np.asarray(est.is_converged).astype(np.uint8)
                store.table("Result").batch_append(batch.start_id, out)
                state_file = os.path.join(
                    store.root, f".radiance_state.{scene_id}.npz"
                )
                if os.path.exists(state_file):
                    os.remove(state_file)
            elif record_type == "DisneyDescriptor":
                grids = collectors.collect_disney_descriptors(
                    params, static, pos, direction
                )
                out = np.zeros(batch.size, records.DISNEY_DESCRIPTOR)
                out["grid"] = grids
                store.table("DisneyDescriptor").batch_append(batch.start_id, out)
            elif record_type == "BakedInterpolationSet":
                out = collectors.collect_baked_sets(params, static, pos)
                store.table("BakedInterpolationSet").batch_append(
                    batch.start_id, out
                )
            else:
                raise ValueError(f"unknown record type {record_type}")
        processed += 1
        if verbose:
            print(
                f"[collect {record_type}] scene {scene_id + 1}/{n_scenes} done",
                flush=True,
            )
    return processed


#: Trainer run-subdirectories searched for exported weights — the trainers
#: write ``<run_dir>/<trainer-name>/<Model>.params.msgpack``
#: (train/trainer.py Trainer.export).
_TRAINER_SUBDIRS = {"nn": "DisneyModel", "bnn": "BakedModel"}


def _load_neural_weights(kind: str, models_dir: Optional[str]) -> dict:
    """Load the exported params pytrees an NN/BNN renderer needs (the analog
    of the reference loading ``DisneyModel.pt`` / ``LightProbeModel.pt`` —
    DisneyRenderer.cpp:19, BakedRenderer.cpp:12).  Weights are searched in
    ``models_dir`` itself and in the trainer's run subdirectory
    (``<models_dir>/DisneyModel`` / ``<models_dir>/BakedModel``), matching
    where the default training run exports them.

    ``models_dir=":init:"`` uses freshly initialized weights (smoke tests).
    """
    import jax

    from .models.probes import LightProbeModel, ProbeRendererModel
    from .models.rpnn import DisneyModel
    from .train.trainer import load_pytree

    init = models_dir == ":init:"
    root = models_dir or "runs"
    search_dirs = [root, os.path.join(root, _TRAINER_SUBDIRS.get(kind, ""))]

    def load(name: str, model, *sample_shapes):
        variables = model.init(
            jax.random.PRNGKey(566),
            *(jnp.zeros(s) for s in sample_shapes),
        )
        if init:
            return variables
        for d in search_dirs:
            path = os.path.join(d, f"{name}.params.msgpack")
            if os.path.exists(path):
                return load_pytree(path, variables)
        raise FileNotFoundError(
            f"{name}.params.msgpack not found under {search_dirs}: train "
            f"first (`python -m deepestscatter_tpu "
            f"train-{'disney' if kind == 'nn' else 'baked'} ...`) or "
            f"pass models_dir=':init:' for untrained smoke renders"
        )

    if kind == "nn":
        model = DisneyModel()
        return {"model": model, "params": load("DisneyModel", model, (1, 10, 226))}
    if kind == "bnn":
        probe_model = LightProbeModel()
        renderer_model = ProbeRendererModel()
        return {
            "probe_model": probe_model,
            "probe_params": load("LightProbeModel", probe_model, (1, 9, 225)),
            "renderer_model": renderer_model,
            "renderer_params": load(
                "ProbeRendererModel", renderer_model, (1, 202), (1, 3, 226)
            ),
        }
    raise ValueError(f"unknown neural renderer {kind!r} (want 'nn' or 'bnn')")


def _build_neural_renderer(kind: str, weights: dict, params, static):
    """Construct the frame renderer from preloaded weights.  NN is
    scene-independent; BNN re-bakes its probe lattice per scene/light
    (BakedRenderer.cpp:86 — the bake depends on the light direction)."""
    from .render.baked import BakedRenderer
    from .render.neural import DisneyRenderer

    if kind == "nn":
        return DisneyRenderer(weights["model"], weights["params"])
    return BakedRenderer(
        params,
        static,
        weights["probe_model"],
        weights["probe_params"],
        weights["renderer_model"],
        weights["renderer_params"],
    )


def _load_neural_renderer(kind: str, params, static, models_dir: Optional[str]):
    """One-shot load+build (kept for tests/back-compat)."""
    return _build_neural_renderer(
        kind, _load_neural_weights(kind, models_dir), params, static
    )


def render_cloud(
    cloud_path: str,
    out_dir: str = ".",
    renderer: str = "pt",
    size_m: float = 3000.0,
    neural_renderer=None,
    directions=("Side", "Back"),
    base: Optional[SceneConfig] = None,
    verbose: bool = True,
    models_dir: Optional[str] = None,
) -> list:
    """The renderCloud task (Tasks.cpp:104-112): one render per light
    direction at 512x256, EXR named ``<cloud>.<dir>.<NAME>.exr``.

    ``renderer``:
      "pt"  — progressive ground truth to convergence;
      "nn"  — the RPNN renderer (DisneyRenderer.cpp analog), weights from
              ``<models_dir>/DisneyModel.params.msgpack``;
      "bnn" — the baked two-network renderer (BakedRenderer.cpp analog:
              the task the reference's renderCloud hardwires, Tasks.cpp:86),
              weights from ``LightProbeModel`` / ``ProbeRendererModel``
              exports; the probe lattice is baked per scene at init.
    Passing a prebuilt ``neural_renderer`` object with ``render_frame``
    overrides the model loading (used by tests).
    """
    base = base or _production_base()
    density = clouds_mod.prepare(clouds_mod.load_density(cloud_path))
    os.makedirs(out_dir, exist_ok=True)
    cloud_name = os.path.splitext(os.path.basename(cloud_path))[0].replace(
        ":", "_"
    )
    stem = os.path.join(out_dir, cloud_name)
    outputs = []
    # Weights load once; only the BNN probe bake is per-direction (the
    # reference re-loads DisneyModel.pt per task container — here the NN
    # renderer is fully reusable across light directions).
    weights = None
    shared_nn_renderer = None
    if renderer != "pt" and neural_renderer is None:
        weights = _load_neural_weights(renderer, models_dir)
        if renderer == "nn":
            shared_nn_renderer = _build_neural_renderer(
                "nn", weights, None, None
            )
    for dir_name in directions:
        light = LIGHT_DIRECTIONS[dir_name]
        cfg = dataclasses.replace(
            base,
            cloud=dataclasses.replace(
                base.cloud, volume_path=cloud_path, size_m=size_m
            ),
            light=dataclasses.replace(base.light, direction=light),
        )
        params, static = build_scene(cfg, density)
        params = inscatter.with_baked_inscatter(params, static)
        if renderer == "pt":
            prog = ProgressiveRenderer(cfg, params, static, seed=0)
            hdr = prog.run(verbose=verbose)
            name = "PT"
        else:
            frame_renderer = neural_renderer
            if frame_renderer is None:
                frame_renderer = shared_nn_renderer or _build_neural_renderer(
                    renderer, weights, params, static
                )
            basis = camera_ops.camera_basis(cfg.camera)
            hdr = np.asarray(
                frame_renderer.render_frame(
                    params,
                    static,
                    cfg.camera.width,
                    cfg.camera.height,
                    basis,
                )
            )
            name = renderer.upper()
        path = f"{stem}.{dir_name}.{name}.exr"
        exr.write_exr(path, hdr)
        outputs.append(path)
        if verbose:
            print(f"[render_cloud] wrote {path}")
    return outputs
