"""Resampler properties: unbiasedness (E[offspring] = n·w) and variance
ordering (systematic ≤ stratified ≤ multinomial) — the rebuild's
formalization of reference particles.jl:17-19 (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sequential_monte_carlo_tpu.ops import get_resampler, resample

N = 64
TRIALS = 2000


@pytest.fixture
def weights():
    rng = np.random.default_rng(0)
    w = rng.gamma(1.0, size=N)
    return jnp.asarray(w / w.sum())


def _offspring_counts(scheme, weights, trials=TRIALS):
    fn = get_resampler(scheme)
    keys = jax.random.split(jax.random.key(42), trials)
    anc = jax.vmap(lambda k: fn(k, weights))(keys)
    counts = jax.vmap(lambda a: jnp.bincount(a, length=N))(anc)
    return np.asarray(counts)


@pytest.mark.parametrize("scheme", ["multinomial", "systematic", "stratified", "residual"])
def test_unbiased(scheme, weights):
    counts = _offspring_counts(scheme, weights)
    expected = N * np.asarray(weights)
    got = counts.mean(0)
    se = counts.std(0).max() / np.sqrt(TRIALS)
    np.testing.assert_allclose(got, expected, atol=max(6 * se, 0.15))


@pytest.mark.parametrize("scheme", ["multinomial", "systematic", "stratified"])
def test_valid_indices(scheme, weights):
    a = get_resampler(scheme)(jax.random.key(0), weights)
    assert a.shape == (N,)
    assert a.dtype == jnp.int32
    assert int(a.min()) >= 0 and int(a.max()) < N


def test_variance_ordering(weights):
    v = {
        s: _offspring_counts(s, weights).var(0).sum()
        for s in ["multinomial", "stratified", "systematic"]
    }
    assert v["systematic"] <= v["stratified"] * 1.1
    assert v["stratified"] <= v["multinomial"] * 1.1


def test_systematic_preserves_floor(weights):
    """Systematic guarantees ≥ floor(n·w_i) offspring per particle."""
    counts = _offspring_counts("systematic", weights, trials=50)
    floors = np.floor(N * np.asarray(weights))
    assert (counts >= floors[None, :]).all()


def test_residual_preserves_floor(weights):
    """Residual deterministically copies floor(n·w_i) offspring."""
    counts = _offspring_counts("residual", weights, trials=50)
    floors = np.floor(N * np.asarray(weights))
    assert (counts >= floors[None, :]).all()
    assert (counts.sum(axis=1) == N).all()


def test_residual_differs_from_systematic():
    """Residual (multinomial remainder) ≠ systematic: with w uniform over 4
    particles and n=10, n·w = 2.5 each and R=2 remainder draws. The
    multinomial remainder puts both draws on one particle w.p. 1/4 per trial
    (count 4 > ceil(n·w) = 3), which systematic can never do."""
    w = jnp.full(4, 0.25)
    n, trials = 10, 200
    keys = jax.random.split(jax.random.key(7), trials)

    def counts(scheme):
        fn = get_resampler(scheme)
        anc = jax.vmap(lambda k: fn(k, w, n))(keys)
        return np.asarray(jax.vmap(lambda a: jnp.bincount(a, length=4))(anc))

    c_res = counts("residual")
    c_sys = counts("systematic")
    assert (c_res.sum(axis=1) == n).all() and (c_sys.sum(axis=1) == n).all()
    assert (c_res >= 2).all() and (c_sys >= 2).all()  # floor guarantee, both
    assert c_sys.max() == 3  # systematic caps at ceil(n·w)
    assert c_res.max() == 4  # remainder-multinomial exceeds it w.p. 1/4/trial


def test_residual_systematic_is_systematic(weights):
    """The documented identity: residual + systematic remainder ≡ systematic
    pointwise for the same key (floor-decomposition proof in the docstring)."""
    for i in range(5):
        k = jax.random.key(i)
        a = get_resampler("residual_systematic")(k, weights)
        b = get_resampler("systematic")(k, weights)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_degenerate_weight_vector():
    w = jnp.zeros(N).at[7].set(1.0)
    for scheme in ["multinomial", "systematic", "stratified"]:
        a = get_resampler(scheme)(jax.random.key(1), w)
        assert (np.asarray(a) == 7).all()


def test_resample_n_override(weights):
    a = resample(jax.random.key(0), weights, n=2 * N, scheme="systematic")
    assert a.shape == (2 * N,)


def test_metropolis_approximately_unbiased(weights):
    """Metropolis resampler (Murray 2012): bias decays in chain length."""
    counts = _offspring_counts("metropolis", weights, trials=TRIALS)
    expected = N * np.asarray(weights)
    got = counts.mean(0)
    # biased scheme: looser tolerance, but must clearly track the weights
    assert np.corrcoef(got, expected)[0, 1] > 0.99
    np.testing.assert_allclose(got, expected, atol=1.0)
