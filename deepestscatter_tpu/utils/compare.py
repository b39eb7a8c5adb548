"""Golden-image evaluation — GenerateComparisons.py parity.

The reference's de-facto integration test (TR/Utils/GenerateComparisons.py:
6-65): read the path-traced ground truth ``*.PT.exr``, tone-map all
renders with the shared Reinhard operator, report RMS bias, and write
absolute-difference images.
"""

from __future__ import annotations

import os
from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np

from ..ops import tonemap as tonemap_ops
from . import exr


def tone_mapped(hdr: np.ndarray, exposure: float = 0.4) -> np.ndarray:
    """Shared display transform (reinhard.cu port) → float [0, 1]."""
    return np.asarray(tonemap_ops.reinhard(jnp.asarray(hdr), exposure))


def rms_bias(reference: np.ndarray, test: np.ndarray) -> float:
    """RMS of the tone-mapped difference (GenerateComparisons.py:32-43)."""
    a = tone_mapped(reference)
    b = tone_mapped(test)
    return float(np.sqrt(np.mean((a - b) ** 2)))


def diff_image(reference: np.ndarray, test: np.ndarray) -> np.ndarray:
    """|difference| of the tone-mapped images, for inspection."""
    return np.abs(tone_mapped(reference) - tone_mapped(test))


def compare_renders(
    pt_path: str,
    others: Sequence[str],
    out_dir: str | None = None,
) -> Dict[str, float]:
    """Compare renders against the PT ground truth EXR.

    Returns {name: rms_bias}; writes ``<name>.diff.exr`` images when
    ``out_dir`` is given.
    """
    gt = exr.read_exr(pt_path)
    out: Dict[str, float] = {}
    for path in others:
        img = exr.read_exr(path)
        name = os.path.basename(path)
        out[name] = rms_bias(gt, img)
        if out_dir is not None:
            os.makedirs(out_dir, exist_ok=True)
            exr.write_exr(
                os.path.join(out_dir, name.replace(".exr", ".diff.exr")),
                diff_image(gt, img),
            )
    return out
