"""Interactive session: arcball math, exposure, pause, snapshots."""

import os
import zlib

import numpy as np
import pytest

from deepestscatter_tpu import scene as scene_mod
from deepestscatter_tpu.config import CameraConfig, CloudModel, SceneConfig
from deepestscatter_tpu.render import viewer
from deepestscatter_tpu.utils import png


@pytest.fixture(scope="module")
def session():
    from deepestscatter_tpu.data import procedural

    cfg = SceneConfig(
        cloud=CloudModel(size_m=1000.0),
        camera=CameraConfig(width=16, height=8),
    )
    density = procedural.cumulus(resolution=16, seed=9)
    params, static = scene_mod.build_scene(cfg, density)
    return viewer.InteractiveSession(cfg, params, static, seed=2)


def test_arcball_identity_and_orthonormal():
    np.testing.assert_allclose(
        viewer.arcball_rotation(0.1, 0.2, 0.1, 0.2), np.eye(3), atol=1e-6
    )
    r = viewer.arcball_rotation(0.0, 0.0, 0.3, 0.1)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-5)


def test_tick_pause_exposure(session):
    frame = session.tick()
    assert frame.shape == (8, 16, 3) and frame.dtype == np.uint8
    assert session.subframes == 10
    session.toggle_pause()
    session.tick()
    assert session.subframes == 10  # paused: no new subframes
    session.toggle_pause()
    e0 = session.exposure
    assert session.adjust_exposure(1.2) == pytest.approx(e0 * 1.2)


def test_drag_resets_accumulation(session):
    session.tick()
    before = session.renderer.directions.copy()
    session.drag(0.0, 0.0, 0.4, 0.0)
    assert session.subframes == 0  # reset
    after = session.renderer.directions
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_png_snapshot(session, tmp_path):
    session.tick()
    path = os.path.join(tmp_path, "frame.png")
    session.snapshot(path)
    raw = open(path, "rb").read()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    # decode IDAT back and compare pixels
    idat_ofs = raw.index(b"IDAT") + 4
    length = int.from_bytes(raw[idat_ofs - 8 : idat_ofs - 4], "big")
    data = zlib.decompress(raw[idat_ofs : idat_ofs + length])
    h, w = 8, 16
    rows = np.frombuffer(data, np.uint8).reshape(h, 1 + w * 3)[:, 1:]
    np.testing.assert_array_equal(
        rows.reshape(h, w, 3), session.display_image()
    )
