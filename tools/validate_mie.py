"""Validate the generated Mie tables against the reference's published tables.

The reference ships tabulated ``mie[]`` / ``choppedMie[]`` data
(DG/src/Mie.cpp:8 and :4107); this repo regenerates both from first
principles (tools/gen_mie.py, Bohren-Huffman series over a fitted
modified-gamma droplet distribution).  This tool measures how close the
regenerated tables are to the reference's, on the quantities the renderer
actually consumes:

- the mean-normalized phase curves (NEE weights, cloud.cuh:47-56),
- the asymmetry parameter g,
- the chopped-phase CDF and its inverse (direction sampling,
  cloud.cuh:160-188),
- the chop region and the fraction of energy removed by the chop.

It parses the reference tables live from ``/root/reference`` (never copies
them into the repo) and writes a JSON report to ``MIE_VALIDATION.json`` at
the repo root.  tests/test_physics.py pins a small set of anchors derived
from this analysis so the validation holds without the reference mounted.
"""

from __future__ import annotations

import json
import os
import re
import sys

import numpy as np

REF_MIE_CPP = "/root/reference/DeepestScatter_DataGen/DeepestScatter_DataGen/src/Mie.cpp"
ASSET = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "deepestscatter_tpu",
    "assets",
    "mie_4096.npz",
)


def parse_reference_tables(path: str = REF_MIE_CPP):
    """Extract the mie[] / choppedMie[] float arrays from the reference source."""
    src = open(path).read()

    def grab(name: str) -> np.ndarray:
        m = re.search(rf"{name}\s*\[\s*\]\s*=\s*\{{(.*?)\}}", src, re.S)
        return np.array([float(v) for v in re.findall(r"[-+0-9.eE]+f?", m.group(1).replace("f", ""))])

    return grab("mie"), grab("choppedMie")


def _cdf(t: np.ndarray) -> np.ndarray:
    return np.cumsum(t / t.sum())


def _inv_cdf(cdf: np.ndarray, u: np.ndarray) -> np.ndarray:
    """cosθ(u) through the same piecewise-linear texture model as ops.phase."""
    n = cdf.shape[0]
    nodes = (np.arange(n) + 0.5) / n
    return 2.0 * np.interp(u, cdf, nodes, left=nodes[0], right=nodes[-1]) - 1.0


def compare(ref_mie: np.ndarray, ref_chop: np.ndarray, our_mie: np.ndarray, our_chop: np.ndarray) -> dict:
    x = np.linspace(-1.0, 1.0, ref_mie.shape[0])
    theta = np.degrees(np.arccos(np.clip(x, -1.0, 1.0)))
    body = theta > 3.0  # outside the (intentionally chopped) diffraction spike

    report: dict = {}
    for name, r, o in (("mie", ref_mie, our_mie), ("chopped", ref_chop, our_chop)):
        rn, on = r / r.mean(), o / o.mean()
        rc, oc = _cdf(r), _cdf(o)
        report[name] = {
            "g_ref": float(np.sum(x * r) / r.sum()),
            "g_ours": float(np.sum(x * o) / o.sum()),
            "cdf_max_abs_diff": float(np.abs(rc - oc).max()),
            "normalized_curve_log_rms_body": float(
                np.sqrt(np.mean(np.log(np.maximum(on[body], 1e-12) / np.maximum(rn[body], 1e-12)) ** 2))
            ),
        }

    # Direction-sampling comparison: inverse-CDF of the chopped phase.
    u = np.linspace(1e-4, 1.0 - 1e-4, 20001)
    ct_r = _inv_cdf(_cdf(ref_chop), u)
    ct_o = _inv_cdf(_cdf(our_chop), u)
    ang = np.abs(np.degrees(np.arccos(np.clip(ct_r, -1, 1))) - np.degrees(np.arccos(np.clip(ct_o, -1, 1))))
    report["inverse_cdf"] = {
        "max_abs_dcos": float(np.abs(ct_r - ct_o).max()),
        "max_angular_err_deg": float(ang.max()),
        "median_angular_err_deg": float(np.median(ang)),
        "p99_angular_err_deg": float(np.percentile(ang, 99)),
    }

    # Chop structure.
    r_idx = np.where(ref_chop != ref_mie)[0]
    o_idx = np.where(our_chop != our_mie)[0]
    report["chop"] = {
        "ref_first_chopped_bin": int(r_idx.min()),
        "ours_first_chopped_bin": int(o_idx.min()),
        "ref_energy_removed": float(1 - ref_chop.sum() / ref_mie.sum()),
        "ours_energy_removed": float(1 - our_chop.sum() / our_mie.sum()),
        "ref_peak_over_mean": float(ref_mie.max() / ref_mie.mean()),
        "ours_peak_over_mean": float(our_mie.max() / our_mie.mean()),
    }
    return report


def main() -> int:
    if not os.path.exists(REF_MIE_CPP):
        print("reference Mie.cpp not mounted; nothing to validate against", file=sys.stderr)
        return 1
    ref_mie, ref_chop = parse_reference_tables()
    data = np.load(ASSET)
    report = compare(ref_mie, ref_chop, data["mie_raw"], data["chopped_raw"])

    # Fast-path internal accuracy: the shipped inverse-CDF lerp table
    # (ops.phase.sample_cos_theta_fast) vs the exact piecewise-linear CDF
    # inversion of the SAME table (sample_cos_theta) — the granularity
    # error the renderer actually pays, separate from the table-vs-table
    # fit above.
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import jax.numpy as jnp

    from deepestscatter_tpu.ops import phase as phase_ops

    table = phase_ops.load_phase_table()
    u = np.linspace(1e-4, 1.0 - 1e-4, 20001)
    uu = jnp.asarray(u, jnp.float32)
    fast = np.asarray(phase_ops.sample_cos_theta_fast(table, uu))
    exact = np.asarray(phase_ops.sample_cos_theta(table, uu))
    fa = np.abs(
        np.degrees(np.arccos(np.clip(fast, -1, 1)))
        - np.degrees(np.arccos(np.clip(exact, -1, 1)))
    )
    report["fast_path"] = {
        "inv_cdf_size": int(table.inv_cdf_rows.shape[0]),
        "max_angular_err_deg": float(fa.max()),
        "p99_angular_err_deg": float(np.percentile(fa, 99)),
        "median_angular_err_deg": float(np.median(fa)),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "MIE_VALIDATION.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
