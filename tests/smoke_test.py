"""Smoke test driver: the reference smoke matrix ({png,jpeg} x
{file,stdin} x {file,stdout} x flags) through the CLI entry point in ONE
process, so jit caches are shared across cases (a fresh process pays
minutes of XLA compilation per geometry on remote-compile deployments).

Run: python tests/smoke_test.py  (or via tests/smoke_test.sh)
"""

import contextlib
import io
import os
import pathlib
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from guetzli_tpu.cli import main  # noqa: E402

PNG = str(REPO / "tests" / "fixtures" / "bees96x64.png")


def check_jpg(path, label, failures):
    try:
        from PIL import Image
        im = Image.open(path)
        im.load()
        assert im.size == (96, 64), im.size
        print(f"OK {label}")
    except Exception as e:
        print(f"FAIL {label}: {e}")
        failures.append(label)


def run(argv, stdin_path=None, stdout_path=None):
    old_in, old_out = sys.stdin, sys.stdout
    try:
        if stdin_path:
            sys.stdin = type("S", (), {"buffer": open(stdin_path, "rb")})()
        if stdout_path:
            sys.stdout = type("S", (), {"buffer": open(stdout_path, "wb")})()
        code = main(argv)
        if stdout_path:
            sys.stdout.buffer.close()
        return code
    finally:
        if stdin_path:
            sys.stdin.buffer.close()
        sys.stdin, sys.stdout = old_in, old_out




def _ensure_backend():
    """Fall back to CPU when the accelerator tunnel is wedged or silently
    absent (see runtime.accelerator_reachable)."""
    from guetzli_tpu import runtime
    if not runtime.accelerator_reachable():
        runtime.force_cpu()
        print("accelerator unreachable; running on CPU")

def main_smoke():
    _ensure_backend()
    failures = []
    with tempfile.TemporaryDirectory() as tmp:
        tmp = pathlib.Path(tmp)
        from PIL import Image
        Image.open(PNG).save(tmp / "in.jpg", quality=90, subsampling=0)

        assert run(["--quality", "95", PNG, str(tmp / "o1.jpg")]) == 0
        check_jpg(tmp / "o1.jpg", "png file->file", failures)

        assert run(["--verbose", "--quality", "95", PNG,
                    str(tmp / "o2.jpg")]) == 0
        check_jpg(tmp / "o2.jpg", "png verbose", failures)

        assert run(["--quality", "95", "-", str(tmp / "o3.jpg")],
                   stdin_path=PNG) == 0
        check_jpg(tmp / "o3.jpg", "png stdin", failures)

        assert run(["--quality", "95", PNG, "-"],
                   stdout_path=str(tmp / "o4.jpg")) == 0
        check_jpg(tmp / "o4.jpg", "png stdout", failures)

        assert run(["--quality", "85", PNG, str(tmp / "o5.jpg")]) == 0
        check_jpg(tmp / "o5.jpg", "quality 85", failures)

        assert run(["--nomemlimit", "--quality", "95", PNG,
                    str(tmp / "o6.jpg")]) == 0
        check_jpg(tmp / "o6.jpg", "nomemlimit", failures)

        assert run(["--memlimit", "100", "--quality", "95", PNG,
                    str(tmp / "o7.jpg")]) == 0
        check_jpg(tmp / "o7.jpg", "memlimit 100", failures)

        assert run(["--quality", "95", str(tmp / "in.jpg"),
                    str(tmp / "o8.jpg")]) == 0
        check_jpg(tmp / "o8.jpg", "jpeg file->file", failures)

        if run(["--quality", "95", "/dev/null", str(tmp / "bad.jpg")]) == 0:
            print("FAIL /dev/null input did not fail")
            failures.append("devnull")
        else:
            print("OK /dev/null fails cleanly")

    if failures:
        print("smoke test FAILED:", failures)
        return 1
    print("smoke test OK")
    return 0


if __name__ == "__main__":
    sys.exit(main_smoke())
