"""L0 distribution kit: sampling moments, densities, support, products."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from sequential_monte_carlo_tpu.distributions import (
    LogNormal,
    MvNormal,
    Normal,
    Product,
    TruncatedNormal,
    TupleProduct,
    Uniform,
    product_distribution,
)

N = 200_000
TOL = 0.02


def test_normal_moments_and_logpdf(key):
    d = Normal(jnp.asarray(1.5), jnp.asarray(0.7))
    s = d.sample(key, (N,))
    assert abs(float(s.mean()) - 1.5) < TOL
    assert abs(float(s.std()) - 0.7) < TOL
    x = np.linspace(-2, 4, 7)
    np.testing.assert_allclose(
        np.asarray(d.log_prob(jnp.asarray(x))),
        stats.norm.logpdf(x, 1.5, 0.7),
        rtol=1e-4, atol=1e-4,
    )


def test_normal_quantile():
    d = Normal(jnp.asarray(0.0), jnp.asarray(2.0))
    np.testing.assert_allclose(
        np.asarray(d.quantile(jnp.asarray([0.25, 0.5, 0.975]))),
        stats.norm.ppf([0.25, 0.5, 0.975], 0, 2),
        rtol=1e-4,
    )


def test_lognormal(key):
    d = LogNormal(jnp.asarray(0.0), jnp.asarray(1.0))
    s = d.sample(key, (N,))
    assert abs(float(jnp.log(s).mean())) < TOL
    x = np.array([0.1, 1.0, 3.0])
    np.testing.assert_allclose(
        np.asarray(d.log_prob(jnp.asarray(x))),
        stats.lognorm.logpdf(x, 1.0),
        rtol=1e-4, atol=1e-4,
    )
    assert float(d.log_prob(jnp.asarray(-1.0))) == -np.inf
    assert not bool(d.in_support(jnp.asarray(-1.0)))


def test_uniform(key):
    d = Uniform(jnp.asarray(-1.0), jnp.asarray(3.0))
    s = d.sample(key, (N,))
    assert float(s.min()) >= -1.0 and float(s.max()) <= 3.0
    assert abs(float(s.mean()) - 1.0) < 2 * TOL
    assert float(d.log_prob(jnp.asarray(0.0))) == pytest.approx(-np.log(4.0))
    assert float(d.log_prob(jnp.asarray(5.0))) == -np.inf


def test_truncated_normal(key):
    d = TruncatedNormal(
        jnp.asarray(0.0), jnp.asarray(1.0), jnp.asarray(-1.0), jnp.asarray(1.0)
    )
    s = d.sample(key, (N,))
    assert float(s.min()) >= -1.0 and float(s.max()) <= 1.0
    x = np.array([-0.5, 0.0, 0.7])
    np.testing.assert_allclose(
        np.asarray(d.log_prob(jnp.asarray(x))),
        stats.truncnorm.logpdf(x, -1.0, 1.0),
        rtol=1e-4,
    )
    assert abs(float(s.mean())) < TOL


def test_truncated_normal_variance_and_quantile():
    """Parity with scipy.stats.truncnorm (Distributions.jl usage in the
    README priors, README.md:82) — including asymmetric and one-sided."""
    cases = [
        (0.0, 1.0, -1.0, 1.0),
        (0.5, 2.0, 0.0, 3.0),
        (-1.0, 0.7, -jnp.inf, 0.0),
    ]
    ps = np.array([0.05, 0.25, 0.5, 0.9])
    for loc, scale, low, high in cases:
        d = TruncatedNormal(*(jnp.asarray(v) for v in (loc, scale, low, high)))
        a = (float(low) - loc) / scale
        b = (float(high) - loc) / scale
        ref = stats.truncnorm(a, b, loc=loc, scale=scale)
        assert float(d.variance()) == pytest.approx(ref.var(), rel=1e-3)
        assert float(d.mean()) == pytest.approx(ref.mean(), rel=1e-3, abs=1e-5)
        np.testing.assert_allclose(
            np.asarray(d.quantile(jnp.asarray(ps))), ref.ppf(ps),
            rtol=1e-3, atol=1e-5,
        )


def test_mvnormal_full_rank(key):
    mean = jnp.asarray([1.0, -2.0])
    cov = jnp.asarray([[2.0, 0.5], [0.5, 1.0]])
    d = MvNormal(mean, cov)
    s = d.sample(key, (N,))
    np.testing.assert_allclose(np.asarray(s.mean(0)), np.asarray(mean), atol=0.03)
    np.testing.assert_allclose(np.cov(np.asarray(s).T), np.asarray(cov), atol=0.05)
    x = np.array([[0.0, 0.0], [1.0, -2.0]])
    np.testing.assert_allclose(
        np.asarray(d.log_prob(jnp.asarray(x))),
        stats.multivariate_normal.logpdf(x, np.asarray(mean), np.asarray(cov)),
        rtol=1e-4,
    )


def test_mvnormal_singular_cov(key):
    """Hodrick–Prescott's Q = [[1/λ,0],[0,0]] (state_space_models.jl:197)."""
    cov = jnp.asarray([[0.5, 0.0], [0.0, 0.0]])
    d = MvNormal(jnp.zeros(2), cov)
    s = d.sample(key, (N,))
    assert np.allclose(np.asarray(s[:, 1]), 0.0)  # null direction is exact
    assert abs(float(s[:, 0].std()) - np.sqrt(0.5)) < TOL
    # density on the support subspace matches the 1-d marginal
    lp = float(d.log_prob(jnp.asarray([0.3, 0.0])))
    assert lp == pytest.approx(stats.norm.logpdf(0.3, 0, np.sqrt(0.5)), rel=1e-4)


def test_mvnormal_allow_singular_false_matches(key):
    """The static full-rank-only switch skips the eigh path but must agree
    bitwise-closely with the default on full-rank covariances."""
    mean = jnp.asarray([1.0, -2.0])
    cov = jnp.asarray([[2.0, 0.5], [0.5, 1.0]])
    d_auto = MvNormal(mean, cov)
    d_fast = MvNormal(mean, cov, allow_singular=False)
    x = jnp.asarray([[0.0, 0.0], [1.0, -2.0], [3.0, 1.0]])
    np.testing.assert_allclose(
        np.asarray(d_fast.log_prob(x)), np.asarray(d_auto.log_prob(x)), rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(d_fast.sample(key, (8,))), np.asarray(d_auto.sample(key, (8,)))
    )


def test_product(key):
    base = Normal(jnp.asarray([0.0, 2.0]), jnp.asarray([1.0, 0.5]))
    d = Product(base)
    s = d.sample(key, (N,))
    assert s.shape == (N, 2)
    lp = d.log_prob(jnp.zeros(2))
    expect = stats.norm.logpdf(0, 0, 1) + stats.norm.logpdf(0, 2, 0.5)
    assert float(lp) == pytest.approx(expect, rel=1e-4, abs=1e-4)


def test_tuple_product(key):
    d = TupleProduct(
        (
            Normal(jnp.asarray(0.0), jnp.asarray(1.0)),
            Uniform(jnp.asarray(0.0), jnp.asarray(1.0)),
            LogNormal(jnp.asarray(0.0), jnp.asarray(1.0)),
        )
    )
    s = d.sample(key, (N,))
    assert s.shape == (N, 3)
    x = jnp.asarray([0.5, 0.5, 0.5])
    expect = (
        stats.norm.logpdf(0.5)
        + 0.0
        + stats.lognorm.logpdf(0.5, 1.0)
    )
    assert float(d.log_prob(x)) == pytest.approx(expect, rel=1e-4, abs=1e-4)
    assert bool(d.in_support(x))
    assert not bool(d.in_support(jnp.asarray([0.5, 2.0, 0.5])))


def test_tuple_product_batched_components(key):
    """Per-particle parameters (the UC-SV transition pattern)."""
    n = 64
    locs = jnp.linspace(-1, 1, n)
    d = TupleProduct(
        (Normal(locs, jnp.ones(n)), Normal(jnp.zeros(n), jnp.ones(n)))
    )
    s = d.sample(key)
    assert s.shape == (n, 2)
    lp = d.log_prob(s)
    assert lp.shape == (n,)


def test_product_distribution_alias():
    d = product_distribution(
        [Normal(jnp.asarray(0.0), jnp.asarray(1.0)), Uniform(jnp.asarray(0.0), jnp.asarray(4.0))]
    )
    assert isinstance(d, TupleProduct)
    assert d.event_dim == 2


def test_distributions_are_pytrees():
    d = Normal(jnp.asarray(0.0), jnp.asarray(1.0))
    leaves = jax.tree_util.tree_leaves(d)
    assert len(leaves) == 2

    def f(dist, x):
        return dist.log_prob(x)

    g = jax.jit(f)(d, jnp.asarray(0.5))
    assert np.isfinite(float(g))
