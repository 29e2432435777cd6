"""Standalone butteraugli distance CLI (butteraugli_main.cc analog)."""

import numpy as np
import pytest

from tests.conftest import FIXTURES

from guetzli_tpu import butteraugli_cli as bcli


def test_distance_png_vs_ref_jpeg(tmp_path, capsys):
    """PNG vs the reference encoder's own q95 output of the same crop:
    distance must land in the q95 target band (the reference reported
    ~0.97 distances for its q95 outputs), and the heatmap must be a
    valid PGM with the image dimensions."""
    hm = tmp_path / "heat.pgm"
    rc = bcli.main([str(FIXTURES / "bees96x64.png"),
                    str(FIXTURES / "bees96x64_ref_q95.jpg"), str(hm)])
    assert rc == 0
    d = float(capsys.readouterr().out.strip())
    assert 0.5 < d < 1.2, d
    data = hm.read_bytes()
    assert data.startswith(b"P5\n96 64\n255\n")
    pix = np.frombuffer(data.split(b"255\n", 1)[1], dtype=np.uint8)
    assert pix.size == 96 * 64 and pix.max() == 255


def test_identical_images_zero_distance(capsys):
    p = str(FIXTURES / "bees96x64.png")
    assert bcli.main([p, p]) == 0
    assert float(capsys.readouterr().out.strip()) == 0.0


def test_size_mismatch_and_usage(capsys):
    rc = bcli.main([str(FIXTURES / "bees96x64.png"),
                    str(FIXTURES / "bees160x120.png")])
    assert rc == 1
    assert "same size" in capsys.readouterr().err
    assert bcli.main(["one.png"]) == 1
    assert "Usage" in capsys.readouterr().err
