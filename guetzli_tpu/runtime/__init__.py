"""Runtime configuration: XLA compilation cache + profiling hooks.

The reference JIT-compiles its OpenCL program / loads PTX at startup
(ocl.cpp:26-43, ocu.cpp:41-54) and caches nothing; XLA compiles of the
diffmap + zeroing programs take minutes for a new image geometry, so the
persistent compilation cache is enabled process-wide (second runs of any
geometry start hot).
"""

import os


def accelerator_reachable(timeout_s=180):
    """Probe (in a subprocess -- a wedged tunnel hangs in-process forever)
    whether a non-cpu backend can actually run a computation. jax falls
    back to CPU silently when a plugin fails, so the exit code alone is a
    false positive."""
    import subprocess
    import sys
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform); "
             "import jax.numpy as jnp; "
             "assert float(jnp.ones((64, 64)).sum()) == 4096.0"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0 and r.stdout.decode().strip() != "cpu"
    except (OSError, subprocess.SubprocessError):
        return False


def force_cpu():
    """Pin the CPU backend both via the environment (read at jax import;
    overwrites any value a plugin's sitecustomize set at interpreter
    start) and the config (when jax is already imported)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        import jax
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


# RPC status-code prefixes that mean the remote device worker died or the
# link to it dropped (device buffers lost, host state intact -- the
# recoverable class). jax surfaces runtime failures as JaxRuntimeError
# (alias XlaRuntimeError) whose message is prefixed with the absl status
# code name; anything else (XlaRuntimeError INVALID_ARGUMENT, Python
# errors, OOM) is a real bug and must propagate.
_CRASH_PREFIXES = (
    "UNAVAILABLE",          # worker process gone / tunnel reset
    "DEADLINE_EXCEEDED",    # RPC timed out against a dead worker
    "ABORTED",              # server-side session torn down
)


def is_worker_crash(e):
    """Typed predicate for device-worker-crash recovery (shared by every
    recovery site: processor._recoverable, the zeroing retry loops, the
    pipelined back-end joins, and the lockstep corpus driver).

    True only for jax runtime errors whose status code is a
    connectivity-loss code -- NOT for arbitrary exceptions whose text
    happens to contain the word (the r04 string-match was
    `"UNAVAILABLE" in str(e)` on ANY exception type)."""
    try:
        from jax.errors import JaxRuntimeError
    except ImportError:                              # very old jax
        JaxRuntimeError = RuntimeError
    if not isinstance(e, JaxRuntimeError):
        return False
    msg = str(e)
    return msg.startswith(_CRASH_PREFIXES) \
        or any(("%s:" % p) in msg.split("\n", 1)[0]
               for p in _CRASH_PREFIXES)


def configure(cache_dir=None):
    """Enable the persistent XLA compilation cache. Call before first jit."""
    import jax
    # The axon TPU plugin patches get_backend and force-initializes its
    # client even when JAX_PLATFORMS names another platform, which hangs
    # forever when the tunnel is down. It does respect the jax config, so
    # mirror the env var there to keep `JAX_PLATFORMS=cpu guetzli-tpu ...`
    # honest.
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
    cache_dir = cache_dir or os.path.expanduser("~/.cache/guetzli_tpu_xla")
    try:
        # Persistent cache only off-CPU: CPU compiles are cheap, and
        # XLA:CPU AOT reload warns about pseudo-feature mismatches
        # (+prefer-no-scatter etc.) with a stated SIGILL risk.
        if os.environ.get("JAX_PLATFORMS") != "cpu":
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5)
            jax.config.update(
                "jax_persistent_cache_min_entry_size_bytes", 0)
        # Strip caller tracebacks + source paths from lowered modules.
        # The Mosaic custom-call payload embeds the API call-site frames
        # verbatim (measured: the payload bytes contained the caller's
        # file path), so WITHOUT this every entrypoint (cli / bench /
        # corpus tool / any line-number shift in a caller) produces a
        # different persistent-cache key for the SAME kernel and repays
        # its ~33 s Mosaic compile. With locations stripped the lowered
        # module is byte-identical across call contexts (verified by
        # md5 of lowered text from two different processes/call sites).
        # Cost: XLA error messages lose Python source attribution.
        jax.config.update("jax_traceback_in_locations_limit", 0)
        jax.config.update("jax_hlo_source_file_canonicalization_regex",
                          ".*")
    except Exception:
        pass  # cache is an optimization; never fail startup on it
