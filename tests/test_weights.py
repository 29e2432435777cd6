"""Device block-error-adjustment weights vs the host reference port."""

import numpy as np
import pytest

from guetzli_tpu.comparator import Comparator


@pytest.mark.parametrize("direction", [1, -1])
@pytest.mark.parametrize("factor", [1, 2])
def test_weights_device_matches_host(direction, factor):
    rng = np.random.RandomState(42)
    w, h = 96, 64
    rgb = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    comp = Comparator(rgb, w, h, target_distance=1.0)
    distmap = (rng.rand(h, w) * 2.0).astype(np.float32)
    import jax.numpy as jnp
    comp.distmap = jnp.asarray(distmap)

    w4 = comp.weights_all_radii(direction, 0.97, factor, factor)
    for rblock in range(1, 5):
        want = comp.compute_block_error_adjustment_weights(
            direction, rblock, 0.97, factor, factor, distmap)
        np.testing.assert_allclose(w4[rblock - 1], want, atol=1e-6,
                                   err_msg=f"rblock={rblock}")
