"""Lorenz-Mie phase tables: evaluation and inverse-CDF direction sampling.

Mirrors the reference's three 1D textures — ``mie``, ``choppedMie`` (phase,
normalized so the table mean is 1) and ``choppedMieIntegral`` (CDF used for
inverse-CDF sampling of scatter directions) — built in
DG/src/Mie.cpp:8206-8298 and consumed in DG/src/CUDA/cloud.cuh:47-56,160-188.
The tables themselves are computed from first principles by
``tools/gen_mie.py`` (Bohren-Huffman series), not copied.

Table-mean normalization implies ``∫ p d(cosθ) = 2`` on the tabulated
function, i.e. ``(1/4π) ∫ p dΩ = 1`` — the convention the renderer's
next-event estimation relies on (cloud.cuh:146-158 multiplies by
sun-to-sphere area ratio).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

_ASSET = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets", "mie_4096.npz")


class PhaseTable(NamedTuple):
    """Device-resident phase tables (registered as a pytree via NamedTuple).

    Alongside the reference's three textures, two *packed-row* tables serve
    the TPU fast paths (one row gather replaces several scalar gathers —
    see ops.grid.pack_corners for the measured rationale):

    - ``eval_rows[i] = (mie[i], mie[i+1], chopped[i], chopped[i+1])`` — both
      phase functions and their lerp neighbors in one fetch;
    - ``inv_cdf_rows[j] = (cosθ_j, cosθ_{j+1})`` — the chopped-phase CDF
      inverted offline onto a uniform grid in u, so direction sampling is
      one fetch + lerp instead of a 16-step bisection
      (the reference's binary search, cloud.cuh:160-188) or a
      ``searchsorted`` (14x slower than a row gather at batch 131k).
    """

    mie: jnp.ndarray  # [N] normalized phase, indexed by (cosθ+1)/2
    chopped: jnp.ndarray  # [N] normalized chopped phase
    chopped_cdf: jnp.ndarray  # [N] CDF of the chopped phase
    eval_rows: jnp.ndarray  # [N, 4] packed (mie, mie+1, chopped, chopped+1)
    inv_cdf_rows: jnp.ndarray  # [M, 2] packed inverse CDF (value, next)


def _normalize_mean(table: np.ndarray) -> np.ndarray:
    """Divide by the table mean (reference: getPhaseSampler, Mie.cpp:8206-8243)."""
    return table / table.mean()


def _build_cdf(table: np.ndarray) -> np.ndarray:
    """Running normalized cumulative sum (reference: getIntegralSampler,
    Mie.cpp:8245-8282): cdf[i] = sum(table[:i+1]) / sum(table)."""
    c = np.cumsum(table / table.sum())
    return c


def _invert_cdf(cdf: np.ndarray, m_samples: int) -> np.ndarray:
    """Tabulate ``m(u)`` solving ``tex1D(cdf, m) = u`` on a uniform u grid.

    ``tex1D(cdf, m)`` is piecewise-linear with nodes at ``(i + 0.5) / n``
    and flat clamps beyond the end nodes — exactly the function the
    reference bisects; here it is inverted once offline."""
    n = cdf.shape[0]
    nodes = (np.arange(n) + 0.5) / n
    u = (np.arange(m_samples) + 0.5) / m_samples
    m = np.interp(u, cdf, nodes, left=nodes[0], right=nodes[-1])
    return m.astype(np.float32)


def _pack_rows(*tables: np.ndarray) -> np.ndarray:
    """Interleave tables with their +1 neighbors → [N, 2 * len(tables)]."""
    cols = []
    for t in tables:
        cols.append(t)
        cols.append(np.concatenate([t[1:], t[-1:]]))
    return np.stack(cols, axis=-1)


def load_phase_table(dtype=jnp.float32, inv_cdf_size: int = 16384) -> PhaseTable:
    """Load the Mie tables and build the packed gather rows.

    ``inv_cdf_size`` 16384 (round 5; was 4096): the fast-path lerp error vs
    the exact CDF inversion drops from max 0.19 deg to 0.068 deg
    (MIE_VALIDATION.json ``fast_path``) for a 128 KB table — noise next to
    the march tables."""
    data = np.load(_ASSET)
    mie = _normalize_mean(data["mie_raw"])
    chopped = _normalize_mean(data["chopped_raw"])
    cdf = _build_cdf(data["chopped_raw"])
    inv = _invert_cdf(cdf, inv_cdf_size)
    return PhaseTable(
        mie=jnp.asarray(mie, dtype=dtype),
        chopped=jnp.asarray(chopped, dtype=dtype),
        chopped_cdf=jnp.asarray(cdf, dtype=dtype),
        eval_rows=jnp.asarray(_pack_rows(mie, chopped), dtype=dtype),
        inv_cdf_rows=jnp.asarray(_pack_rows(inv), dtype=dtype),
    )


def _tex1d(table: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """CUDA tex1D with normalized coords, linear filter, clamp-to-edge."""
    n = table.shape[0]
    t = u * n - 0.5
    t0 = jnp.floor(t)
    frac = t - t0
    i0 = jnp.clip(t0.astype(jnp.int32), 0, n - 1)
    i1 = jnp.clip(i0 + 1, 0, n - 1)
    return jnp.take(table, i0) * (1 - frac) + jnp.take(table, i1) * frac


def eval_phase(table: jnp.ndarray, cos_theta: jnp.ndarray) -> jnp.ndarray:
    """Phase value at cosθ (reference: getMiePhase/getChoppedMiePhase,
    cloud.cuh:47-56: ``tex1D(mie, (cosθ+1)/2)``)."""
    return _tex1d(table, (cos_theta + 1.0) * 0.5)


def sample_cos_theta(phase: PhaseTable, u: jnp.ndarray) -> jnp.ndarray:
    """Inverse-CDF sample of the scattering angle cosine.

    The reference runs a 16-iteration bisection solving
    ``tex1D(choppedMieIntegral, m) = u`` and returns ``cosθ = 2m - 1``
    (cloud.cuh:160-188).  The TPU-native equivalent is a vectorized
    ``searchsorted`` over the monotone CDF followed by an exact linear
    inversion within the bracketing texel — the same piecewise-linear
    function, solved exactly instead of to 2^-16.
    """
    cdf = phase.chopped_cdf
    n = cdf.shape[0]
    # tex1D(cdf, m) is piecewise-linear with nodes at m_i = (i + 0.5) / n,
    # values cdf[i] (clamped beyond the end nodes).
    i1 = jnp.clip(jnp.searchsorted(cdf, u, side="left"), 0, n - 1)
    i0 = jnp.maximum(i1 - 1, 0)
    c0 = jnp.take(cdf, i0)
    c1 = jnp.take(cdf, i1)
    denom = jnp.maximum(c1 - c0, 1e-20)
    frac = jnp.clip((u - c0) / denom, 0.0, 1.0)
    m = (i0.astype(u.dtype) + 0.5 + frac * (i1 - i0).astype(u.dtype)) / n
    # Below the first node / above the last node the CDF is flat: clamp.
    m = jnp.where(u <= cdf[0], 0.5 / n, m)
    m = jnp.where(u >= cdf[-1], (n - 0.5) / n, m)
    return 2.0 * m - 1.0


def eval_phase_pair(phase: PhaseTable, cos_theta: jnp.ndarray):
    """Evaluate (mie, chopped) at cosθ with ONE packed-row gather.

    Returns the same values as ``eval_phase(phase.mie, ·)`` /
    ``eval_phase(phase.chopped, ·)`` — both textures share the coordinate,
    so their lerp neighbors ride one fetch (the TPU hot-loop path)."""
    n = phase.mie.shape[0]
    t = ((cos_theta + 1.0) * 0.5) * n - 0.5
    t0 = jnp.floor(t)
    frac = jnp.where(t0 < 0.0, 0.0, t - t0)
    i0 = jnp.clip(t0.astype(jnp.int32), 0, n - 1)
    rows = jnp.take(phase.eval_rows, i0, axis=0, mode="clip")  # [..., 4]
    mie = rows[..., 0] * (1.0 - frac) + rows[..., 1] * frac
    chopped = rows[..., 2] * (1.0 - frac) + rows[..., 3] * frac
    return mie, chopped


def sample_cos_theta_fast(phase: PhaseTable, u: jnp.ndarray) -> jnp.ndarray:
    """Inverse-CDF scatter-cosine sample via the precomputed inverse table:
    one row gather + lerp.  Accuracy is one part in ``inv_cdf_size`` of the
    uniform input — tighter than the reference's 2^-16 bisection over most
    of the domain, and it replaces a ``searchsorted`` that is ~14x slower
    than a row gather on TPU."""
    inv = phase.inv_cdf_rows
    m_size = inv.shape[0]
    t = u * m_size - 0.5
    t0 = jnp.floor(t)
    frac = jnp.where(t0 < 0.0, 0.0, t - t0)
    i0 = jnp.clip(t0.astype(jnp.int32), 0, m_size - 1)
    rows = jnp.take(inv, i0, axis=0, mode="clip")  # [..., 2]
    m = rows[..., 0] * (1.0 - frac) + rows[..., 1] * frac
    return 2.0 * m - 1.0
