"""CLI flag-parsing and guard tests (no encodes)."""

import numpy as np
import pytest

from guetzli_tpu import cli


def test_usage_on_bad_flag(capsys):
    assert cli.main(["--bogus", "a.png", "b.jpg"]) == 1
    assert "Usage" in capsys.readouterr().err


def test_usage_on_missing_args(capsys):
    assert cli.main(["onearg.png"]) == 1


def test_memory_guard():
    assert cli._check_memory(1000 * 1000, 6000)
    assert not cli._check_memory(100_000_000, 200)   # 100 MPix over 200 MB
    assert cli._check_memory(100_000_000, -1)        # --nomemlimit
    assert not cli._check_memory(10, 50)             # below min 100 MB


def test_jpeg_memlimit_guard(tmp_path, capsys):
    """JPEG inputs are gated by the SOF dimensions before decoding."""
    import io

    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(np.zeros((64, 96, 3), np.uint8)).save(
        buf, format="JPEG")
    p = tmp_path / "in.jpg"
    p.write_bytes(buf.getvalue())
    # 96*64 pixels is tiny, but a limit below the 100 MB floor fails
    # the guard (reference contract).
    assert cli.main(["--memlimit", "50", str(p),
                     str(tmp_path / "o.jpg")]) == 1
    assert "Memory limit" in capsys.readouterr().err


def test_checkcl_runs_kernel_verification(capsys):
    """--checkcl runs the dual-execution kernel check (clguetzli_test.cpp
    analog) on the input image: Pallas tile-compare vs the XLA pipeline,
    and the halo-exchange sharded blur vs single-device blur (the conftest
    provides 8 virtual devices)."""
    from pathlib import Path

    from guetzli_tpu.checkcl import run_checkcl
    from guetzli_tpu.io.png import read_png
    rgb, w, h = read_png(
        (Path(__file__).parent / "fixtures" / "bees96x64.png").read_bytes())
    assert run_checkcl(rgb, w, h) == 0
    err = capsys.readouterr().err
    assert "tile_compare(pallas): 0/" in err
    assert "blur(sharded): 0/" in err
