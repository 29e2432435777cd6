"""guetzli-tpu command line, flag-compatible with the reference CLI
(guetzli/guetzli.cc:221-366).

All compute paths run on the XLA default backend (TPU when present), so
the reference's backend-selection flags map onto their *semantic* effect:
--c/--opencl/--cuda enable the early-exit zeroing trade-off those modes
had (slightly larger output, faster search; our fast output is within
0.05% of the reference's --c output size), and --checkcl/--checkcuda run
the runtime dual-execution kernel verification harness (checkcl.py:
per-stage device results vs the float64 oracle, Pallas and sharded-blur
dual execution) on the input image before encoding -- the
clguetzli_test.cpp analog, complementing the test suite's parity
fixtures.
"""

import sys

from guetzli_tpu import consts

_USAGE = """Guetzli-TPU JPEG compressor. Usage:
guetzli-tpu [flags] input_filename output_filename

Flags:
  --verbose    - Print a verbose trace of all attempts to standard output.
  --quality Q  - Visual quality to aim for, expressed as a JPEG quality value.
                 Default value is 95.
  --memlimit M - Memory limit in MB. Guetzli will fail if unable to stay under
                 the limit. Default limit is 6000 MB.
  --nomemlimit - Do not limit memory usage.
  --cpu        - Run on the CPU backend (skip accelerator initialization).
  --mesh N     - Shard this encode over N devices (XLA GSPMD over a 1-D
                 tile mesh; byte-identical to single-device output).
"""

# Host-memory guard thresholds: the reference's CONTRACT values
# (guetzli.cc:42-45) so --memlimit behaves identically to the reference
# CLI for existing workflows. The reference's 110 B/px describes its
# single-process CPU encoder; this encoder's own algorithmic working
# set is comparable (tracemalloc over a full 0.5 MPix encode: 84 MB of
# Python/numpy state, NOTES.md), but the measured PROCESS envelope adds
# the JAX runtime (~1 GB of executables/arenas) and, on the tunneled
# deployment, the device client's per-allocation host mirrors that it
# never frees (~1.3-2.2 kB/px across 2-8 MPix, banked RSS timelines).
# The guard therefore keeps the reference thresholds for compatibility
# and WARNS when the measured envelope exceeds the limit.
K_BYTES_PER_PIXEL = 110          # guetzli.cc:42 (contract)
K_LOWEST_MEMUSAGE_MB = 100       # guetzli.cc:43 (contract)
K_DEFAULT_MEMLIMIT_MB = 6000     # guetzli.cc:45 (contract)
K_MEASURED_BYTES_PER_PIXEL = 1400   # r04 measured envelope, 2-8 MPix
K_MEASURED_BASE_MB = 1100           # runtime base (imports+executables)
K_DEFAULT_QUALITY = 95


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    verbose = False
    fast_zeroing = False
    check_kernels = False
    quality = K_DEFAULT_QUALITY
    memlimit_mb = K_DEFAULT_MEMLIMIT_MB
    opt_idx = 0
    while opt_idx < len(argv) and argv[opt_idx].startswith("-") \
            and argv[opt_idx] != "-":
        flag = argv[opt_idx]
        if flag == "--verbose":
            verbose = True
        elif flag == "--quality":
            opt_idx += 1
            quality = int(argv[opt_idx])
        elif flag == "--memlimit":
            opt_idx += 1
            memlimit_mb = int(argv[opt_idx])
        elif flag == "--nomemlimit":
            memlimit_mb = -1
        elif flag in ("--c", "--opencl", "--cuda"):
            # The reference's accelerated modes early-exit the per-block
            # zeroing at the error limit (processor.cc:458-465,
            # clguetzli.cl:849-852); same speed/quality trade here.
            fast_zeroing = True
        elif flag in ("--checkcl", "--checkcuda"):
            # Runtime dual-execution verification of the alternative
            # kernels on this input (clguetzli_test.cpp analog).
            check_kernels = True
        elif flag == "--cpu":
            # Escape hatch when the accelerator tunnel is unreachable
            # (pins the platform before any backend init; no probe cost).
            from guetzli_tpu.runtime import force_cpu
            force_cpu()
        elif flag == "--mesh":
            opt_idx += 1
            import os
            os.environ["GUETZLI_TPU_MESH"] = argv[opt_idx]
        elif flag == "--profile":
            # gperftools analog (guetzli.cc:32-34): dump an XLA/TPU trace.
            opt_idx += 1
            import jax
            jax.profiler.start_trace(argv[opt_idx])
            import atexit
            atexit.register(jax.profiler.stop_trace)
        else:
            sys.stderr.write(_USAGE)
            return 1
        opt_idx += 1
    if len(argv) - opt_idx != 2:
        sys.stderr.write(_USAGE)
        return 1

    # After flag parsing so --cpu's platform pin is visible (the
    # persistent compile cache is accelerator-only; see runtime.configure).
    from guetzli_tpu.runtime import configure
    configure()

    in_name, out_name = argv[opt_idx], argv[opt_idx + 1]
    if in_name == "-":
        data = sys.stdin.buffer.read()
    else:
        with open(in_name, "rb") as f:
            data = f.read()

    from guetzli_tpu.search.processor import Params, ProcessStats

    params = Params()
    params.butteraugli_target = consts.butteraugli_score_for_quality(quality)
    params.zeroing_early_exit = fast_zeroing
    stats = ProcessStats(debug=verbose)

    if data[:2] == b"\xff\xd8":
        from guetzli_tpu.codec.reader import peek_dimensions
        from guetzli_tpu.search.processor import process_jpeg_bytes
        dims = peek_dimensions(data)
        if dims is not None and not _check_memory(dims[0] * dims[1],
                                                 memlimit_mb):
            return 1
        if check_kernels:
            from guetzli_tpu.checkcl import run_checkcl
            from guetzli_tpu.codec.reader import read_jpeg
            from guetzli_tpu.search.processor import decode_jpeg_to_rgb
            jpg = read_jpeg(data)
            run_checkcl(decode_jpeg_to_rgb(jpg), jpg.width, jpg.height)
        out = process_jpeg_bytes(params, data, stats)
        if out is None:
            return 1
    else:
        from guetzli_tpu.io.png import read_png
        try:
            rgb, w, h = read_png(data)
        except Exception:
            sys.stderr.write("Can't decode input image\n")
            return 1
        if not _check_memory(w * h, memlimit_mb):
            return 1
        if check_kernels:
            from guetzli_tpu.checkcl import run_checkcl
            run_checkcl(rgb, w, h)
        from guetzli_tpu.search.processor import process_rgb
        try:
            out = process_rgb(params, rgb, w, h, stats)
        except ValueError:
            # e.g. quality below 84 (butteraugli target above 2.0); the
            # processor already printed the reason (processor.cc:939-945).
            return 1

    if out_name == "-":
        sys.stdout.buffer.write(out)
    else:
        with open(out_name, "wb") as f:
            f.write(out)
    return 0


def _check_memory(pixels, memlimit_mb) -> bool:
    """guetzli.cc:333-356 memory guard (reference contract), plus an
    honest warning from the measured envelope of this runtime."""
    if memlimit_mb == -1:
        return True
    estimate_mb = max(K_LOWEST_MEMUSAGE_MB,
                      pixels * K_BYTES_PER_PIXEL // (1 << 20))
    if memlimit_mb < estimate_mb or memlimit_mb < K_LOWEST_MEMUSAGE_MB:
        sys.stderr.write("Memory limit would be exceeded. Failing.\n")
        return False
    measured_mb = max(K_MEASURED_BASE_MB,
                      pixels * K_MEASURED_BYTES_PER_PIXEL // (1 << 20))
    if memlimit_mb < measured_mb:
        sys.stderr.write(
            "Warning: the measured process envelope on this runtime is "
            "~%d MB for this image (JAX runtime + device-client "
            "buffers; see NOTES.md), above the %d MB limit. Proceeding "
            "per the reference guard model.\n"
            % (measured_mb, memlimit_mb))
    return True


if __name__ == "__main__":
    sys.exit(main())
