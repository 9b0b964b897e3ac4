"""Debug-utility guards (SURVEY.md §5.2): assert_finite_weights must actually
raise — eagerly outside jit, via checkify inside jit."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import checkify

from sequential_monte_carlo_tpu.utils.debug import (
    assert_finite_weights,
    check_state,
    debug_nans,
)


def test_assert_finite_weights_passes():
    lw = jnp.log(jnp.full((4, 8), 0.125))
    out = assert_finite_weights(lw)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(lw))


def test_assert_finite_weights_raises_eager():
    lw = jnp.full((2, 8), -jnp.inf).at[0].set(0.0)  # row 1 fully degenerate
    with pytest.raises(FloatingPointError, match="degenerate"):
        assert_finite_weights(lw)


def test_assert_finite_weights_raises_under_jit():
    def f(lw):
        return jnp.sum(assert_finite_weights(lw, "test-weights"))

    checked = jax.jit(checkify.checkify(f))
    good = jnp.zeros((2, 8))
    err, _ = checked(good)
    err.throw()  # no error

    bad = jnp.full((2, 8), jnp.nan)
    err, _ = checked(bad)
    with pytest.raises(Exception, match="degenerate"):
        err.throw()


def test_check_state_reports_finite_fraction():
    state = {"w": jnp.array([0.5, jnp.nan]), "t": jnp.asarray(3)}
    diag = check_state(state)
    (k,) = [k for k in diag if "w" in k]
    assert diag[k]["finite_frac"] == 0.5


def test_debug_nans_context_restores():
    before = jax.config.jax_debug_nans
    with debug_nans(True):
        assert jax.config.jax_debug_nans
    assert jax.config.jax_debug_nans == before
