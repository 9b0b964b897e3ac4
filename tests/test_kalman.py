"""Kalman filter vs literal NumPy transcription of kalman_filter.jl math."""
import jax.numpy as jnp
import numpy as np
import pytest

import jax
from sequential_monte_carlo_tpu.models import (
    hodrick_prescott,
    lg_model,
    multivariate_linear_gaussian,
    simulate,
    univariate_linear_gaussian,
)
from sequential_monte_carlo_tpu.ops import (
    kalman_filter,
    kalman_log_likelihood,
    kalman_log_likelihood_masked,
)


def _ref_kalman_univariate(A, B, Q, R, x0, s0, y):
    """Literal float64 transcription of kalman_filter.jl:29-53."""
    xt, St = x0, s0
    logZ = 0.0
    for yt in y:
        xt = A * xt
        St = A * A * St + Q
        st = B * B * St + R
        dy = yt - B * xt
        xt = xt + (St * B) / st * dy
        St = St - (St * B) ** 2 / st
        logZ += -0.5 * (np.log(2 * np.pi) + np.log(st) + dy * dy / st)
    return xt, St, logZ


def _ref_kalman_multivariate(A, B, Q, R, x0, S0, y):
    """Literal transcription of kalman_filter.jl:3-27 (univariate obs)."""
    xt, St = x0.copy(), S0.copy()
    logZ = 0.0
    for yt in y:
        xt = A @ xt
        St = A @ St @ A.T + Q
        st = B @ St @ B + R
        dy = yt - B @ xt
        xt = xt + (St @ B) / st * dy
        St = St - np.outer(St @ B, B @ St) / st
        logZ += -0.5 * (np.log(2 * np.pi) + np.log(st) + dy * dy / st)
    return xt, St, logZ


def test_univariate_matches_reference_math(key):
    m = univariate_linear_gaussian(A=0.5, B=1.0, Q=0.9, R=0.8, x0=0.0, sigma0=1.0)
    _, y = simulate(key, m, 100)
    y64 = np.asarray(y, dtype=np.float64)
    (mean, cov), logz = kalman_log_likelihood(m, y)
    rx, rs, rz = _ref_kalman_univariate(0.5, 1.0, 0.9, 0.8, 0.0, 1.0, y64)
    assert float(logz) == pytest.approx(rz, rel=1e-4)
    assert float(mean[0]) == pytest.approx(rx, rel=1e-3)
    assert float(cov[0, 0]) == pytest.approx(rs, rel=1e-3)


def test_multivariate_matches_reference_math(key):
    A = np.array([[0.9, 0.1], [0.0, 0.8]])
    B = np.array([1.0, 0.5])
    Q = np.array([[0.4, 0.1], [0.1, 0.3]])
    m = multivariate_linear_gaussian(A=A, B=B, Q=Q, R=0.5)
    _, y = simulate(key, m, 60)
    y64 = np.asarray(y, dtype=np.float64)
    (mean, cov), logz = kalman_log_likelihood(m, y)
    rx, rs, rz = _ref_kalman_multivariate(A, B, Q, 0.5, np.zeros(2), np.eye(2), y64)
    assert float(logz) == pytest.approx(rz, rel=1e-4)
    np.testing.assert_allclose(np.asarray(mean), rx, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cov), rs, rtol=1e-3, atol=1e-4)


def test_hodrick_prescott_singular_q(key):
    """HP model (state_space_models.jl:193-202): filter must run with the
    singular Q and stay finite."""
    rng_y = np.cos(np.linspace(0, 8, 80)) + np.linspace(0, 2, 80)
    m = hodrick_prescott(1600.0, rng_y)
    means, covs, ll, logz = kalman_filter(m, jnp.asarray(rng_y))
    assert np.isfinite(float(logz))
    assert np.isfinite(np.asarray(means)).all()
    # trend should track the smooth component reasonably
    assert abs(float(means[-1, 0]) - rng_y[-1]) < 2.0


def test_masked_prefix_equals_sliced(key):
    m = lg_model(jnp.asarray([0.5, 0.9, 0.8]))
    _, y = simulate(key, m, 50)
    t = 23
    (mean_a, cov_a), za = kalman_log_likelihood(m, y[:t])
    mask = jnp.arange(50) < t
    (mean_b, cov_b), zb = kalman_log_likelihood_masked(m, y, mask.astype(y.dtype))
    assert float(za) == pytest.approx(float(zb), rel=1e-5)
    np.testing.assert_allclose(np.asarray(mean_a), np.asarray(mean_b), rtol=1e-5)


def test_batched_kalman_vmap(key):
    """vmap over a θ-cloud of models — the IBIS inner filter bank."""
    thetas = jnp.asarray([[0.5, 0.9, 0.8], [0.7, 0.5, 1.0], [0.2, 1.5, 0.3]])
    m0 = lg_model(thetas[0])
    _, y = simulate(key, m0, 40)
    models = jax.vmap(lg_model)(thetas)
    logzs = jax.vmap(lambda mm: kalman_log_likelihood(mm, y)[1])(models)
    assert logzs.shape == (3,)
    _, z0 = kalman_log_likelihood(m0, y)
    assert float(logzs[0]) == pytest.approx(float(z0), rel=1e-5)
