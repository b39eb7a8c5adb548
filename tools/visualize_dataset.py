"""Dataset inspection — DatasetVisualisation.ipynb parity, headless.

The reference ships an ipyvolume notebook for 3D inspection of scatter
samples and descriptors.  This tool renders the same views to PNGs with
matplotlib (guarded import) from any record store:

    python tools/visualize_dataset.py <dataset_root>/Train --out viz/
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("store_root")
    p.add_argument("--out", default="viz")
    p.add_argument("--max-samples", type=int, default=20000)
    args = p.parse_args()

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib not available; install it for visualization")
        return 1

    from deepestscatter_tpu.data.store import RecordStore

    store = RecordStore(args.store_root)
    n = min(store.count("ScatterSample"), args.max_samples)
    if n == 0:
        print("no ScatterSample records")
        return 1
    samples = store.table("ScatterSample").read(0, n)
    os.makedirs(args.out, exist_ok=True)

    radiance = None
    if store.count("Result") >= n:
        radiance = store.table("Result").read(0, n)["light_intensity"]

    fig = plt.figure(figsize=(10, 8))
    ax = fig.add_subplot(projection="3d")
    pts = samples["point"]
    c = np.log1p(radiance) if radiance is not None else samples["scene_setup_id"]
    sc = ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], c=c, s=2, cmap="viridis")
    fig.colorbar(sc, label="log1p(radiance)" if radiance is not None else "scene id")
    ax.set_title(f"{n} scatter samples — {args.store_root}")
    path = os.path.join(args.out, "scatter_samples.png")
    fig.savefig(path, dpi=130)
    print(f"wrote {path}")

    if store.count("DisneyDescriptor") >= 1:
        grid = store.table("DisneyDescriptor").read(0, 1)["grid"][0]
        layers = grid.reshape(10, 9, 5, 5)
        fig, axes = plt.subplots(2, 5, figsize=(14, 6))
        for i, a in enumerate(axes.flat):
            a.imshow(layers[i].mean(axis=0), cmap="magma", vmin=0, vmax=255)
            a.set_title(f"layer {i}")
            a.axis("off")
        path = os.path.join(args.out, "descriptor_layers.png")
        fig.savefig(path, dpi=130)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
