"""Round-2 verify probe: 4-stage datagen on the real TPU with the new
reschedule/densify RadianceCollector."""
import time
import numpy as np
import jax

print("devices:", jax.devices())
from deepestscatter_tpu import tasks
from deepestscatter_tpu.config import CloudRendering, PointRadianceConfig, SceneConfig
from deepestscatter_tpu.data import scenesetups

import tempfile, os
root = tempfile.mkdtemp(prefix="dsprobe_")
triplet = scenesetups.generate(root, ["procedural:32:5"], seed=2, scenes_per_cloud=2)
store = None
for s in (triplet.train, triplet.validation, triplet.test):
    if s.count("SceneSetup"):
        store = s
        break
base = SceneConfig(rendering=CloudRendering(sample_step=1.0 / 256.0, max_depth=200))
t0 = time.time()
tasks.collect(store, "ScatterSample", tasks.CollectMode.OVERWRITE, base=base,
              batch_size=256, max_scenes=1, verbose=False)
print(f"stage1 ScatterSample: {time.time()-t0:.1f}s count={store.count('ScatterSample')}")
t0 = time.time()
cfg = PointRadianceConfig(max_threads=2560, launches_per_update=10,
                          black_min_experiments=2000)
tasks.collect(store, "Result", tasks.CollectMode.OVERWRITE, base=base,
              radiance_cfg=cfg, batch_size=256, max_scenes=1, verbose=True)
res = store.table("Result").read(0, 256)
conv = res["is_converged"].astype(bool)
print(f"stage2 Result: {time.time()-t0:.1f}s converged={conv.sum()}/256 "
      f"mean={res['light_intensity'].mean():.4f} max={res['light_intensity'].max():.4f}")
assert np.isfinite(res["light_intensity"]).all()
t0 = time.time()
tasks.collect(store, "DisneyDescriptor", tasks.CollectMode.OVERWRITE, base=base,
              batch_size=256, max_scenes=1, verbose=False)
print(f"stage3 DisneyDescriptor: {time.time()-t0:.1f}s")
t0 = time.time()
tasks.collect(store, "BakedInterpolationSet", tasks.CollectMode.OVERWRITE, base=base,
              batch_size=256, max_scenes=1, verbose=False)
print(f"stage4 BakedInterpolationSet: {time.time()-t0:.1f}s")
print("PROBE PASSED")
