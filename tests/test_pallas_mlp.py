"""Pallas fused RPNN kernel vs the Flax reference model (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from deepestscatter_tpu.models.rpnn import DisneyModel
from deepestscatter_tpu.ops import pallas_mlp


def test_fused_rpnn_matches_flax():
    model = DisneyModel()
    variables = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 10, 226)))
    x = jnp.asarray(
        np.random.default_rng(0).random((300, 10, 226), np.float32)
    )
    expected = model.apply(variables, x)
    weights = pallas_mlp.stack_disney_weights(variables)
    got = pallas_mlp.rpnn_forward(x, weights, interpret=True)
    assert got.shape == expected.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=2e-5, atol=2e-5
    )


def test_fused_apply_drop_in():
    model = DisneyModel()
    variables = model.init(jax.random.PRNGKey(4), jnp.zeros((1, 10, 226)))
    apply_fn = pallas_mlp.make_fused_apply(variables, interpret=True)
    x = jnp.asarray(np.random.default_rng(1).random((64, 10, 226), np.float32))
    np.testing.assert_allclose(
        np.asarray(apply_fn(variables, x)),
        np.asarray(model.apply(variables, x)),
        rtol=2e-5,
        atol=2e-5,
    )
