"""Quarantined ablation kernels (benchmarks/ablations/) stay correct.

``resample_banded`` (gen 2, superseded at every size) and
``resample_take_walk`` (gen 5, loses 2× to the matmul walk) live outside
the shipped package as measured ablation records (PERF_NOTES.md). Nothing
routes to them, but while they are in the tree they must remain
bitwise-exact against the searchsorted+take oracle.
"""
import jax
import jax.numpy as jnp
import pytest

from sequential_monte_carlo_tpu.kernels.resample_pallas import (
    systematic_uniforms,
)
from sequential_monte_carlo_tpu.ops.resampling import _inverse_cdf


@pytest.mark.parametrize("concentration", [2.0, 8.0])
def test_resample_gather_banded_bitwise(concentration):
    """Banded sub-N² kernel ≡ dense ≡ searchsorted+take (both cond paths)."""
    from benchmarks.ablations.resample_banded import resample_gather_banded
    from jax.experimental.pallas import tpu as pltpu

    M, N, C = 4, 2048, 3
    w = jax.nn.softmax(
        jax.random.normal(jax.random.key(0), (M, N)) * concentration
    )
    xs = jax.random.normal(jax.random.key(1), (M, C, N))
    u = systematic_uniforms(jax.random.key(2), M, N)
    with pltpu.force_tpu_interpret_mode():
        out = resample_gather_banded(u, w, xs)
    anc = jax.vmap(lambda uu, ww: _inverse_cdf(uu, ww))(u, w)
    ref = jax.vmap(lambda x, a: x[:, a])(xs, anc)
    assert bool(jnp.all(out == ref))


def test_resample_gather_banded_small_n_falls_back():
    from benchmarks.ablations.resample_banded import resample_gather_banded
    from jax.experimental.pallas import tpu as pltpu

    M, N, C = 2, 512, 2  # N < 2*win → routes to the dense kernel
    w = jax.nn.softmax(jax.random.normal(jax.random.key(0), (M, N)))
    xs = jax.random.normal(jax.random.key(1), (M, C, N))
    u = systematic_uniforms(jax.random.key(2), M, N)
    with pltpu.force_tpu_interpret_mode():
        out = resample_gather_banded(u, w, xs)
    anc = jax.vmap(lambda uu, ww: _inverse_cdf(uu, ww))(u, w)
    ref = jax.vmap(lambda x, a: x[:, a])(xs, anc)
    assert bool(jnp.all(out == ref))


@pytest.mark.parametrize("concentration", [0.0, 8.0])
def test_resample_gather_take_bitwise(concentration):
    """Gen-5 lane-gather walk ≡ searchsorted+take."""
    from benchmarks.ablations.resample_take_walk import resample_gather_take
    from jax.experimental.pallas import tpu as pltpu

    M, N, C = 4, 2048, 3
    w = jax.nn.softmax(
        jax.random.normal(jax.random.key(0), (M, N)) * concentration
    )
    xs = jax.random.normal(jax.random.key(1), (M, C, N))
    u = systematic_uniforms(jax.random.key(2), M, N)
    with pltpu.force_tpu_interpret_mode():
        out = resample_gather_take(u, w, xs, tm=2)
    anc = jax.vmap(lambda uu, ww: _inverse_cdf(uu, ww))(u, w)
    ref = jax.vmap(lambda x, a: x[:, a])(xs, anc)
    assert bool(jnp.all(out == ref))
