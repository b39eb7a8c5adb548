"""Fast TPU paths must match the exact reference formulations."""

import jax.numpy as jnp
import numpy as np

from deepestscatter_tpu.ops import grid as grid_ops
from deepestscatter_tpu.ops import phase as phase_ops


def test_packed_trilinear_matches_classic(rng):
    grid = jnp.asarray(rng.random((9, 7, 5)).astype(np.float32))
    packed = grid_ops.pack_corners(grid)
    assert packed.shape == (9, 7, 5, 8)
    # Include out-of-range coords to exercise clamp-to-edge.
    u = jnp.asarray(rng.uniform(-0.2, 1.2, (4096, 3)).astype(np.float32))
    classic = grid_ops.sample_trilinear(grid, u)
    fast = grid_ops.sample_trilinear(packed, u)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(classic), atol=1e-6)


def test_eval_phase_pair_matches_exact(rng):
    phase = phase_ops.load_phase_table()
    cos_t = jnp.asarray(rng.uniform(-1.0, 1.0, 8192).astype(np.float32))
    mie_fast, chop_fast = phase_ops.eval_phase_pair(phase, cos_t)
    mie = phase_ops.eval_phase(phase.mie, cos_t)
    chop = phase_ops.eval_phase(phase.chopped, cos_t)
    np.testing.assert_allclose(np.asarray(mie_fast), np.asarray(mie), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(chop_fast), np.asarray(chop), rtol=1e-5, atol=1e-5)


def test_inv_cdf_sampling_matches_exact(rng):
    phase = phase_ops.load_phase_table()
    u = jnp.asarray(rng.random(8192).astype(np.float32))
    exact = np.asarray(phase_ops.sample_cos_theta(phase, u))
    fast = np.asarray(phase_ops.sample_cos_theta_fast(phase, u))
    # The tabulated inverse agrees to table resolution; compare via the
    # forward CDF (the meaningful metric for a sampler).
    cdf_exact = np.interp(
        (exact + 1) / 2,
        (np.arange(4096) + 0.5) / 4096,
        np.asarray(phase.chopped_cdf),
    )
    cdf_fast = np.interp(
        (fast + 1) / 2,
        (np.arange(4096) + 0.5) / 4096,
        np.asarray(phase.chopped_cdf),
    )
    np.testing.assert_allclose(cdf_fast, cdf_exact, atol=2e-3)
