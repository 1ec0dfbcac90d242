"""Debug-mode tests: NaN trapping fires and can be disabled."""

import jax
import jax.numpy as jnp
import pytest

from hm_retrieval_tpu.utils.debugging import (
    disable_debug_checks,
    enable_debug_checks,
)


def test_nan_trap_fires_and_clears():
    enable_debug_checks(nans=True)
    try:
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: x / 0.0 * 0.0)(
                jnp.ones(())
            ).block_until_ready()
    finally:
        disable_debug_checks()
    # after disabling, the same computation silently yields nan
    out = jax.jit(lambda x: x / 0.0 * 0.0)(jnp.ones(()))
    assert jnp.isnan(out)
