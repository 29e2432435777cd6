"""The encoder's tuning-knob registry: one documented dataclass, with
environment-variable overrides (SURVEY.md §5 "one dataclass config").

Every knob the package reads from the environment is declared here with
its default and the evidence behind it; call sites go through
``config.current().<field>`` instead of scattering ``os.environ`` reads.
``current()`` re-reads the environment on each call (knobs stay
overridable per-process and per-test exactly as before); the A/B tools'
caveat still applies: flags read at TRACE time need a fresh process to
take effect after a change (NOTES.md).

Tri-state fields use None = "auto" (decided per backend at the call
site); the table below names the deciding function.

Knob (env var)            | Default | Evidence / rationale
--------------------------|---------|------------------------------------
pipeline_lag (PIPELINE)   | auto    | lag-1 on accelerators: back-end is
                          |         | RTT-bound (NOTES r03: fetch 1.34s of
                          |         | 1.84s); 0 (exact) on CPU.
speculate (SPECULATE)     | auto    | quant-trial speculation wins when
                          |         | RTT >> compute (accelerators only).
tree_quant (TREE_QUANT)   | auto    | whole-subtree waves: one pull per
                          |         | round; pure extra compute on CPU.
sparse (SPARSE)           | True    | per-coefficient deltas ~8 B/coeff vs
                          |         | full-plane re-uploads (r03 corpus
                          |         | back-end dominant tunnel cost).
staged_zeroing (STAGED_ZEROING) | True | device work tracks the sorted
                          |         | candidate curve (1.34x -> 1.17x of
                          |         | ideal area, zeroing.py).
lanes (LANES)             | True    | lane-major eval: blocks in lanes is
                          |         | the natural (8,128) VPU layout.
pallas (PALLAS)           | auto    | lane-major fused kernel (2) on
                          |         | accelerators: chained-timing A/B
                          |         | r04: 7.2 vs 9.3 ms/wave at 1 MPix
                          |         | scale (tpu_r04_zeroing_ab.json
                          |         | correction); XLA (0) on CPU. The
                          |         | blocks-leading kernel (1) stays
                          |         | opt-in.
exact_lut (EXACT_LUT)     | False   | closed-form masking LUTs match the
                          |         | table read to float32 noise and
                          |         | avoid gathers; =1 restores tables.
lane_safe (LANE_SAFE)     | auto    | layout guard for whole-image ops;
                          |         | ops/layout.py decides per backend.
padded (PAD)              | True    | bucketed pad geometry: one compile
                          |         | per bucket, not per image size.
mesh (MESH)               | 0       | GSPMD multi-chip encode width
                          |         | (CLI --mesh N maps here).
native (NO_NATIVE unset)  | True    | C++ host kernels (flips, scan
                          |         | codec, quantize) 5-7x the Python
                          |         | serialization path.
incr_save (NO_INCR_SAVE unset) | True | incremental jpeg_data updates,
                          |         | byte-identical (processor tests).
histo_reuse (NO_HISTO_REUSE unset) | True | DC histogram reuse across
                          |         | flip iterations, byte-identical.
pallas_tile (PALLAS_TILE) | 128     | blocks-leading kernel tile.
pallas_tile_n (PALLAS_TILE_N) | 512 | lane-major kernel lane tile.
pallas_vmem_mb (PALLAS_VMEM_MB) | 100 | scoped-VMEM budget; r03 bisect
                          |         | blocker class was the 16 MB default.
(deleted r05: LANES_DOT / LANES_QUAD / PALLAS_DOT -- the MXU-contraction
variants failed Mosaic lowering inside the production kernels and their
XLA fallback lost the A/B, tpu_r05_dot_fused_1m.json; per VERDICT r04
item 5 losing flags are deleted, not left "pending".)
zeroing_fused (ZEROING_FUSED) | auto | whole greedy loop inside ONE
                          |         | Pallas kernel (zeroing_loop.py);
                          |         | auto = on exactly where the fused
                          |         | lane kernel is the default (TPU
                          |         | 444, no mesh). The r04 shell
                          |         | overhead (~50 ms/iter around a
                          |         | ~7 ms eval) motivates it; banked
                          |         | r05 A/B decides the default.
zeroing_tile_n (ZEROING_TILE_N) | 512 | greedy-loop kernel lane tile.
zeroing_debug (ZEROING_DEBUG) | False | stage-wall stderr diagnostics.

Repo-level tools keep two bench-only env knobs outside this dataclass
(they configure the benchmark, not the encoder): GUETZLI_TPU_BENCH_BATCH
and GUETZLI_TPU_BENCH_1MPIX (bench.py).
"""

import os
from dataclasses import dataclass

_PREFIX = "GUETZLI_TPU_"


def _flag(name, default):
    v = os.environ.get(_PREFIX + name)
    if v is None:
        return default
    return v != "0"


def _int(name, default):
    v = os.environ.get(_PREFIX + name)
    return default if v in (None, "") else int(v)


def _opt_int(name):
    v = os.environ.get(_PREFIX + name)
    return None if v in (None, "") else int(v)


def _opt_flag(name):
    v = os.environ.get(_PREFIX + name)
    return None if v is None else v != "0"


@dataclass(frozen=True)
class Config:
    # Search pipelining / speculation (None = auto by backend).
    pipeline_lag: "int | None"
    speculate: "bool | None"
    tree_quant: "bool | None"
    sparse: bool
    staged_zeroing: bool
    # Evaluation layout / kernels.
    lanes: bool
    pallas: "int | None"
    exact_lut: bool
    lane_safe: "bool | None"
    padded: bool
    # Parallelism.
    mesh: int
    # Host-side paths.
    native: bool
    incr_save: bool
    histo_reuse: bool
    # Kernel shape/budget constants (read at kernel-module import).
    pallas_tile: int
    pallas_tile_n: int
    pallas_vmem_mb: int
    zeroing_fused: "bool | None"
    zeroing_tile_n: int
    # Diagnostics.
    zeroing_debug: bool


def current() -> Config:
    """Build the configuration from the environment (cheap; called at
    decision points so monkeypatched env vars keep working)."""
    return Config(
        pipeline_lag=_opt_int("PIPELINE"),
        speculate=_opt_flag("SPECULATE"),
        tree_quant=_opt_flag("TREE_QUANT"),
        sparse=_flag("SPARSE", True),
        staged_zeroing=_flag("STAGED_ZEROING", True),
        lanes=_flag("LANES", True),
        pallas=_opt_int("PALLAS"),
        exact_lut=os.environ.get(_PREFIX + "EXACT_LUT") == "1",
        lane_safe=_opt_flag("LANE_SAFE"),
        padded=_flag("PAD", True),
        mesh=_int("MESH", 0),
        native=not os.environ.get(_PREFIX + "NO_NATIVE"),
        incr_save=os.environ.get(_PREFIX + "NO_INCR_SAVE") != "1",
        histo_reuse=os.environ.get(_PREFIX + "NO_HISTO_REUSE") != "1",
        pallas_tile=_int("PALLAS_TILE", 128),
        pallas_tile_n=_int("PALLAS_TILE_N", 512),
        pallas_vmem_mb=_int("PALLAS_VMEM_MB", 100),
        zeroing_fused=_opt_flag("ZEROING_FUSED"),
        zeroing_tile_n=_int("ZEROING_TILE_N", 512),
        zeroing_debug=os.environ.get(_PREFIX + "ZEROING_DEBUG") == "1",
    )
