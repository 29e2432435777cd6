"""Corpus-scale golden regression (reference tests/golden_test.sh analog).

tests/corpus/ holds 33 deterministic images x {png, 444, progressive,
420} = 132 encode variants x qualities {84, 90, 95} = 396 rows;
tests/golden_corpus.txt pins the local reference build's output size for
each (tools/golden_corpus.py). The default run checks a spread sample
across all variant classes inside the 2% size band (SURVEY.md §4 item
2; the BASELINE band is quality 84-95); GUETZLI_TPU_GOLDEN_FULL=1
checks all rows (tools/golden_corpus.py run does the same outside
pytest).
"""

import os
import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
CORPUS = REPO / "tests" / "corpus"
GOLDEN = REPO / "tests" / "golden_corpus.txt"


def _rows():
    rows = []
    for line in GOLDEN.read_text().splitlines():
        if not line.strip() or line.startswith("#"):
            continue
        name, q, size = line.split()
        rows.append((name, int(q), int(size)))
    if os.environ.get("GUETZLI_TPU_GOLDEN_FULL") == "1":
        return rows
    # Spread sample. The >=1 MPix photo_mosaic rows cost minutes each on
    # the CPU test backend, so the default sample takes the (natural
    # photo) hopper row instead; the mosaics run via
    # `tools/golden_corpus.py run --match photo` (banked log) and under
    # GUETZLI_TPU_GOLDEN_FULL=1.
    fast = [r for r in rows if "photo_mosaic" not in r[0]]
    sample = fast[::11]
    if not any("photo" in r[0] for r in sample):
        sample += [r for r in rows if r[0] == "photo_hopper.png"]
    return sample


@pytest.mark.parametrize("name,q,ref_size", _rows())
def test_golden_corpus_row(name, q, ref_size):
    from guetzli_tpu.parallel.api import encode_bytes

    out = encode_bytes((CORPUS / name).read_bytes(), quality=q)
    assert out is not None, name
    dev = abs(len(out) - ref_size) / ref_size
    assert dev <= 0.02, (name, len(out), ref_size, dev)
