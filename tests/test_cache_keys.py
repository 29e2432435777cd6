"""runtime.configure() must make lowered modules call-site independent.

The persistent compile cache keys on the lowered module bytes; the
Mosaic custom-call payload embeds API call-site traceback locations, so
without location stripping the SAME kernel re-keys (and recompiles,
~33 s) for every entrypoint. configure() pins
jax_traceback_in_locations_limit=0 + source-path canonicalization;
this test locks the invariant at the jax level: the same function
lowered from two different call sites yields byte-identical modules.
"""

import jax
import jax.numpy as jnp

from guetzli_tpu.runtime import configure


def _lower_from_site_a(f, x):
    return f.lower(x).as_text()


def _lower_from_site_b(f, x):
    # A different function, file position, and stack shape than site A.
    def inner():
        return f.lower(x).as_text()
    return inner()


def test_lowered_module_is_call_site_independent():
    configure()
    f = jax.jit(lambda x: (x * 2.0 + 1.0).sum())
    x = jnp.ones((16, 16))
    a = _lower_from_site_a(f, x)
    # A fresh jit wrapper so the second lowering cannot reuse site A's
    # cached trace (tracing is where locations are captured).
    g = jax.jit(lambda x: (x * 2.0 + 1.0).sum())
    b = _lower_from_site_b(g, x)
    assert a == b


def test_no_source_paths_in_lowered_text():
    configure()
    f = jax.jit(lambda x: x + 1.0)
    txt = f.lower(jnp.ones((8,))).as_text()
    assert "test_cache_keys.py" not in txt
