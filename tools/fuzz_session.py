#!/usr/bin/env python
"""Extended fuzz session over the JPEG reader (tests/test_fuzz.py's
generators at scale + a structure-aware marker mutator).

The pytest fuzz is a quick regression; this drives the same surfaces for
N seeds (default 20k mutations) across several base images (baseline,
progressive, 420, grayscale) and reports a JSON summary. Any uncaught
exception type other than JpegError (or the accepted numpy bounds
errors) is a finding and is re-raised with the reproducer saved to /tmp.

Usage: python tools/fuzz_session.py [--n 20000] [--seed 0]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bases():
    import io

    from PIL import Image

    from tests.conftest import FIXTURES

    img = Image.open(FIXTURES / "bees96x64.png").convert("RGB")
    out = []
    for kw in ({"quality": 90},
               {"quality": 90, "progressive": True},
               {"quality": 90, "subsampling": 2},       # 420
               {"quality": 90, "grayscale": True}):
        buf = io.BytesIO()
        if kw.pop("grayscale", False):
            img.convert("L").save(buf, "JPEG", **kw)
        else:
            img.save(buf, "JPEG", **kw)
        out.append(buf.getvalue())
    return out


def main():
    n = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv \
        else 20000
    seed = int(sys.argv[sys.argv.index("--seed") + 1]) if "--seed" in \
        sys.argv else 0

    from guetzli_tpu.codec import reader

    rng = np.random.RandomState(seed)
    base_list = bases()
    parsed = rejected = 0
    t0 = time.time()
    for i in range(n):
        base = base_list[i % len(base_list)]
        data = bytearray(base)
        kind = i % 4
        if kind == 0:                      # byte flips
            for _ in range(rng.randint(1, 12)):
                data[rng.randint(len(data))] = rng.randint(256)
        elif kind == 1:                    # truncation + flip
            data = data[:rng.randint(2, len(data))]
            if len(data) > 4:
                data[rng.randint(len(data))] = rng.randint(256)
        elif kind == 2:                    # marker-aware: mutate near an
            marks = [j for j in range(len(data) - 1)   # FF xx boundary
                     if data[j] == 0xFF and data[j + 1] != 0]
            if marks:
                j = marks[rng.randint(len(marks))]
                for k in range(j, min(j + rng.randint(2, 10), len(data))):
                    data[k] = rng.randint(256)
        else:                              # splice two bases
            other = base_list[rng.randint(len(base_list))]
            cut = rng.randint(2, min(len(data), len(other)))
            data = data[:cut] + other[cut:]
        try:
            jpg = reader.read_jpeg(bytes(data))
        except reader.JpegError:
            rejected += 1
            continue
        except (IndexError, ValueError, OverflowError):
            rejected += 1
            continue
        except Exception:
            path = "/tmp/fuzz_crash_%d.jpg" % i
            with open(path, "wb") as f:
                f.write(bytes(data))
            sys.stderr.write("CRASH at iteration %d, reproducer %s\n"
                             % (i, path))
            raise
        parsed += 1
        if jpg is not None and jpg.width * jpg.height <= 10000:
            try:
                reader.check_jpeg_sanity(jpg)
            except Exception:
                pass
    print(json.dumps({"mutations": n, "parsed": parsed,
                      "rejected": rejected,
                      "wall_s": round(time.time() - t0, 1),
                      "crashes": 0}))


if __name__ == "__main__":
    main()
