"""Welford running mean/variance: the progressive estimator's statistics.

The reference uses Welford updates per pixel (progressive.cu:17-27) and per
point-radiance task (PointRadianceTask.h:38-49), and a pairwise Welford merge
as its only cross-replica reduction (PointRadianceTask.h:54-68).  On TPU the
merge doubles as the cross-device reduction: a ``psum`` of
``(count, mean*count, m2 + count*mean^2)`` triples is algebraically the same
merge, so sharded estimators reduce with one collective.

State convention: ``mean`` is the running mean, ``m2`` the sum of squared
deviations (so variance = m2 / n), ``count`` the number of samples.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Welford(NamedTuple):
    mean: jnp.ndarray
    m2: jnp.ndarray
    count: jnp.ndarray

    @staticmethod
    def zeros(shape, dtype=jnp.float32) -> "Welford":
        z = jnp.zeros(shape, dtype)
        return Welford(mean=z, m2=z, count=jnp.zeros(shape, dtype))


def update(state: Welford, sample: jnp.ndarray, mask=None) -> Welford:
    """One Welford step (progressive.cu:17-27).  ``mask`` (optional, bool)
    freezes masked-out entries."""
    new_count = state.count + 1.0
    delta = sample - state.mean
    new_mean = state.mean + delta / new_count
    new_m2 = state.m2 + delta * (sample - new_mean)
    if mask is not None:
        new_mean = jnp.where(mask, new_mean, state.mean)
        new_m2 = jnp.where(mask, new_m2, state.m2)
        new_count = jnp.where(mask, new_count, state.count)
    return Welford(new_mean, new_m2, new_count)


def merge(a: Welford, b: Welford) -> Welford:
    """Pairwise merge (PointRadianceTask.h operator+=, :54-68)."""
    count = a.count + b.count
    safe = jnp.maximum(count, 1.0)
    w = b.count / safe
    mean = a.mean + (b.mean - a.mean) * w
    # The reference merges m2 by plain addition (ignoring the between-means
    # term); we keep the exact parallel-Welford form, which is what the
    # psum-triple reduction computes.
    m2 = a.m2 + b.m2 + (b.mean - a.mean) ** 2 * (a.count * b.count / safe)
    return Welford(mean, m2, count)


def to_moments(state: Welford):
    """(count, mean*count, raw second moment) — the psum-able representation."""
    return state.count, state.mean * state.count, state.m2 + state.count * state.mean**2


def from_moments(count, s1, s2) -> Welford:
    """Inverse of ``to_moments`` (apply after psum over devices)."""
    safe = jnp.maximum(count, 1.0)
    mean = s1 / safe
    m2 = jnp.maximum(s2 - safe * mean**2, 0.0)
    return Welford(mean, m2, count)


def confidence_interval_95(state: Welford) -> jnp.ndarray:
    """Absolute 95% CI half-width: 1.96 * sqrt(m2/N) / sqrt(N)
    (Camera.cpp:245-250, PointRadianceTask.h:23-36)."""
    n = jnp.maximum(state.count, 1.0)
    sigma = jnp.sqrt(state.m2 / n)
    return 1.96 * sigma / jnp.sqrt(n)


def is_converged(state: Welford, rel_tol: float, abs_tol: float) -> jnp.ndarray:
    """The reference's CI gate: relative < rel_tol OR absolute < abs_tol,
    relative measured against the running mean (+eps)."""
    abs_ci = confidence_interval_95(state)
    rel_ci = abs_ci / (state.mean + jnp.finfo(jnp.float32).eps)
    return (rel_ci < rel_tol) | (abs_ci < abs_tol)
