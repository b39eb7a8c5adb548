"""Differentiable renderer: finite-difference gradient checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepestscatter_tpu.render import diff as diff_mod


def _scene(res=8):
    rng = np.random.default_rng(0)
    density = np.zeros((res, res, res), np.float32)
    density[2:-2, 2:-2, 2:-2] = rng.random((res - 4,) * 3).astype(np.float32)
    return diff_mod.DiffScene(
        density=jnp.asarray(density),
        sun_dir=jnp.asarray([-0.3, -0.9, 0.1]),
        eye=jnp.asarray([2.0, -0.3, 0.0]),
        look_at=jnp.zeros(3),
        light_radiance=jnp.asarray([1e6, 1e6, 1e6]),
    )


KW = dict(
    width=12, height=8, density_multiplier=40.0,
    n_steps=64, sun_steps=48, sample_step=1.0 / 64.0, remat_chunk=16,
    # The exact per-point sun march: pointwise-smooth in sun_dir, which the
    # small-eps FD probes rely on.  The default baked-grid path (renderer
    # semantics) is FD-checked in test_diff_cross_validation.py.
    use_baked_inscatter=False,
)


def _loss(scene):
    return diff_mod.render_single_scatter(scene, **KW).mean()


@pytest.fixture(scope="module")
def scene_and_grads():
    scene = _scene()
    img, grads = diff_mod.render_and_grads(scene, **KW)
    return scene, img, grads


def test_render_finite_nonzero(scene_and_grads):
    _, img, grads = scene_and_grads
    assert np.all(np.isfinite(np.asarray(img)))
    assert float(jnp.abs(img).max()) > 0
    for leaf in jax.tree.leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))
    assert float(jnp.abs(grads.density).max()) > 0
    assert float(jnp.abs(grads.sun_dir).max()) > 0
    assert float(jnp.abs(grads.eye).max()) > 0


def _fd_check(scene, get, set_, eps, rtol):
    """Central finite differences vs the analytic gradient.

    ``eps`` may be a sequence: the renderer's phase lookup is piecewise
    linear (4096-bin table with a sharp forward lobe), so a single FD step
    straddling a table kink measures the average slope across bins, not the
    point slope.  The check passes if FD agrees at ANY of the probe widths —
    i.e. the FD sequence converges to the analytic value before float32
    noise takes over.
    """
    base_grad = jax.grad(_loss)(scene)
    g_analytic = float(get(base_grad))
    eps_list = eps if isinstance(eps, (list, tuple)) else [eps]
    errs = []
    for e in eps_list:
        g_fd = (float(_loss(set_(scene, +e))) - float(_loss(set_(scene, -e)))) / (2 * e)
        if g_fd == pytest.approx(g_analytic, rel=rtol, abs=1e-7):
            return
        errs.append((e, g_fd))
    raise AssertionError(f"analytic {g_analytic} vs FD {errs}")


def test_grad_wrt_density_voxel(scene_and_grads):
    scene, _, grads = scene_and_grads
    # Pick the voxel with the largest gradient for a strong FD signal.
    g = np.asarray(grads.density)
    z, y, x = np.unravel_index(np.argmax(np.abs(g)), g.shape)

    def get(t):
        return t.density[z, y, x]

    def set_(s, d):
        return s._replace(density=s.density.at[z, y, x].add(d))

    _fd_check(scene, get, set_, eps=1e-3, rtol=2e-2)


def test_grad_wrt_sun_direction(scene_and_grads):
    scene, _, _ = scene_and_grads

    def get(t):
        return t.sun_dir[1]

    def set_(s, d):
        return s._replace(sun_dir=s.sun_dir.at[1].add(d))

    _fd_check(scene, get, set_, eps=[1e-3, 3e-5, 1e-5], rtol=5e-2)


def test_grad_wrt_camera_eye(scene_and_grads):
    scene, _, _ = scene_and_grads

    def get(t):
        return t.eye[0]

    def set_(s, d):
        return s._replace(eye=s.eye.at[0].add(d))

    _fd_check(scene, get, set_, eps=[1e-3, 1e-4, 3e-5], rtol=5e-2)
