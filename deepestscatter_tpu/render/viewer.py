"""Interactive progressive-render session — GuiExecutionLoop parity.

The reference opens a (hidden) glut/glew window whose idle callback drives
``Scene::update`` and whose keyboard/mouse handlers adjust exposure
(``+``/``-``), pause (space), and orbit the camera with a quaternion
arcball (GuiExecutionLoop.cpp:114-185, Util/Arcball).  TPU hosts are
headless, so the same capability is an object API driven by any frontend
(notebook widget, web handler, or the CLI writing PNG frames):

- ``tick()``          — renders one progressive tick, returns the
  tone-mapped uint8 frame (the glutDisplay body);
- ``drag(x0,y0,x1,y1)`` — arcball orbit in normalized window coords,
  resetting the progressive accumulator (camera moved → estimate invalid);
- ``adjust_exposure`` / ``toggle_pause`` — the keyboard handlers;
- ``snapshot(path)``  — PNG/EXR dump (the every-40-subframes snapshot).
"""

from __future__ import annotations

import numpy as np

from ..config import SceneConfig
from ..ops import tonemap as tonemap_ops
from ..scene import SceneParams, SceneStatic
from ..utils import exr as exr_mod
from ..utils import png as png_mod
from . import camera as camera_ops
from . import progressive as progressive_mod


def arcball_rotation(
    x0: float, y0: float, x1: float, y1: float, radius: float = 1.0
) -> np.ndarray:
    """Rotation matrix for a drag between two normalized window points
    ([-1, 1]^2) — the quaternion arcball of Util/Arcball: map each point
    onto the unit sphere (or its hyperbolic skirt), rotate one to the
    other."""

    def to_sphere(x, y):
        p = np.asarray([x / radius, y / radius, 0.0], np.float64)
        r2 = p[0] ** 2 + p[1] ** 2
        if r2 <= 1.0:
            p[2] = np.sqrt(1.0 - r2)
        else:
            p /= np.sqrt(r2)
        return p

    a = to_sphere(x0, y0)
    b = to_sphere(x1, y1)
    axis = np.cross(a, b)
    s = np.linalg.norm(axis)
    c = float(np.clip(np.dot(a, b), -1.0, 1.0))
    if s < 1e-12:
        return np.eye(3, dtype=np.float32)
    axis = axis / s
    angle = np.arctan2(s, c)
    k = np.asarray(
        [
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ]
    )
    rot = np.eye(3) + np.sin(angle) * k + (1 - np.cos(angle)) * (k @ k)
    return rot.astype(np.float32)


class InteractiveSession:
    """Headless interactive render loop over a scene."""

    def __init__(
        self,
        cfg: SceneConfig,
        params: SceneParams,
        static: SceneStatic,
        seed: int = 0,
    ):
        self.cfg = cfg
        self.params = params
        self.static = static
        self.seed = seed
        self.exposure = cfg.camera.exposure
        self.paused = False
        self.rotation = np.eye(3, dtype=np.float32)
        #: Smoothed per-tick wall time (the reference's MS/FRAME readout).
        self.ms_per_frame: float | None = None
        self._rebuild()

    def _rebuild(self) -> None:
        self.renderer = progressive_mod.ProgressiveRenderer(
            self.cfg, self.params, self.static, seed=self.seed
        )
        basis = camera_ops.camera_basis(self.cfg.camera, rotation=self.rotation)
        self.renderer.origins, self.renderer.directions = (
            camera_ops.generate_rays(
                basis, self.cfg.camera.width, self.cfg.camera.height
            )
        )

    # -- handlers (GuiExecutionLoop.cpp:143-185) ---------------------------

    def adjust_exposure(self, factor: float = 1.2) -> float:
        """The +/- keys scale exposure (no re-render needed: tone mapping
        is display-side)."""
        self.exposure *= factor
        return self.exposure

    def toggle_pause(self) -> bool:
        self.paused = not self.paused
        return self.paused

    def drag(self, x0: float, y0: float, x1: float, y1: float) -> None:
        """Arcball orbit; resets the progressive estimate."""
        self.rotation = arcball_rotation(x0, y0, x1, y1) @ self.rotation
        self._rebuild()

    # -- the loop body ------------------------------------------------------

    def tick(self) -> np.ndarray:
        """One display tick → tone-mapped uint8 [H, W, 3] frame.

        Tracks a smoothed ``ms_per_frame`` (the reference prints MS/FRAME
        per display tick, GuiExecutionLoop.cpp:114-128 via
        sutil::displayMillisecondsPerFrame)."""
        import time as _time

        t0 = _time.time()
        if not self.paused:
            self.renderer.tick()
        frame = self.display_image()
        dt_ms = (_time.time() - t0) * 1e3
        self.ms_per_frame = (
            dt_ms
            if self.ms_per_frame is None
            else 0.8 * self.ms_per_frame + 0.2 * dt_ms
        )
        return frame

    def display_image(self) -> np.ndarray:
        import jax.numpy as jnp

        hdr = jnp.asarray(self.renderer.hdr_image())
        out = tonemap_ops.reinhard(hdr, self.exposure)
        return np.asarray(tonemap_ops.to_uint8(out))

    @property
    def subframes(self) -> int:
        return int(self.renderer.state.subframe_id)

    def snapshot(self, path: str) -> None:
        if path.endswith(".png"):
            png_mod.write_png(path, self.display_image())
        else:
            exr_mod.write_exr(path, self.renderer.hdr_image())
