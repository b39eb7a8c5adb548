"""CLI integration tests (__main__.py — the main.cpp/Tasks.cpp app entry)."""

import json
import os

import numpy as np
import pytest

from deepestscatter_tpu.__main__ import main as cli_main
from deepestscatter_tpu.utils import exr


def _render_args(tmp_path, renderer, extra=()):
    return [
        "render",
        "procedural:16:3",
        "--out",
        str(tmp_path),
        "--renderer",
        renderer,
        "--size-m",
        "800",
        "--width",
        "16",
        "--height",
        "8",
        "--directions",
        "Side",
        "--max-subframes",
        "2",
        *extra,
    ]


def test_render_pt(tmp_path):
    assert cli_main(_render_args(tmp_path, "pt")) == 0
    out = tmp_path / "procedural_16_3.Side.PT.exr"
    assert out.exists()
    img = exr.read_exr(str(out))
    assert img.shape == (8, 16, 3)
    assert np.all(np.isfinite(img))


@pytest.mark.parametrize("renderer", ["nn", "bnn"])
def test_render_neural_init_weights(tmp_path, renderer):
    args = _render_args(tmp_path, renderer, ("--models-dir", ":init:"))
    assert cli_main(args) == 0
    out = tmp_path / f"procedural_16_3.Side.{renderer.upper()}.exr"
    img = exr.read_exr(str(out))
    assert img.shape == (8, 16, 3)
    assert np.all(np.isfinite(img))


def test_render_neural_missing_models(tmp_path):
    args = _render_args(
        tmp_path, "nn", ("--models-dir", str(tmp_path / "nothere"))
    )
    with pytest.raises(FileNotFoundError, match="train first"):
        cli_main(args)


def test_compare_cli(tmp_path, capsys):
    img = np.abs(np.random.default_rng(0).normal(size=(8, 8, 3))).astype(
        np.float32
    )
    a = str(tmp_path / "x.Side.PT.exr")
    b = str(tmp_path / "x.Side.NN.exr")
    exr.write_exr(a, img)
    exr.write_exr(b, img * 1.05)
    assert cli_main(["compare", a, b]) == 0
    result = json.loads(capsys.readouterr().out)
    assert result  # one entry per comparison image
