"""runtime.is_worker_crash: the typed recovery predicate.

Every recovery site (processor._recoverable, zeroing retries, pipelined
back-end joins, lockstep corpus driver) shares this one function; it must
fire on jax runtime errors carrying a connectivity-loss RPC status and on
NOTHING else -- a ValueError whose text merely mentions UNAVAILABLE is a
real bug that must propagate (the r04 string-match got this wrong).
"""

from jax.errors import JaxRuntimeError

from guetzli_tpu.runtime import is_worker_crash


def test_crash_statuses_detected():
    for msg in (
        "UNAVAILABLE: Socket closed",
        "UNAVAILABLE: failed to connect to all addresses; last error: "
        "UNKNOWN: ipv4:127.0.0.1:9999: Failed to connect",
        "DEADLINE_EXCEEDED: RPC timed out",
        "ABORTED: session torn down",
        "Error executing computation: UNAVAILABLE: tunnel reset",
    ):
        assert is_worker_crash(JaxRuntimeError(msg)), msg


def test_real_errors_propagate():
    for e in (
        JaxRuntimeError("INVALID_ARGUMENT: shapes do not match"),
        JaxRuntimeError("RESOURCE_EXHAUSTED: out of memory while "
                        "allocating 1g"),
        JaxRuntimeError("INTERNAL: Mosaic failed to compile"),
        ValueError("UNAVAILABLE mentioned in an unrelated message"),
        RuntimeError("UNAVAILABLE: but not a jax error type"),
        KeyError("UNAVAILABLE"),
    ):
        assert not is_worker_crash(e), repr(e)


def test_second_line_status_ignored():
    # Status names buried past the first line (e.g. a traceback quoted
    # inside an INVALID_ARGUMENT message) must not trigger recovery.
    e = JaxRuntimeError(
        "INVALID_ARGUMENT: bad operand\nearlier attempt said "
        "UNAVAILABLE: socket closed")
    assert not is_worker_crash(e)
