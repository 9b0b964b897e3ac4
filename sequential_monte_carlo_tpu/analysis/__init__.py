from .summaries import (
    cycle_quantiles,
    estimated_trend,
    ibis_estimated_trend,
    ibis_predictive_quantiles,
    observation_dist,
    posterior_histograms,
    predictive_quantiles,
    state_quantiles,
    state_variance,
    weighted_mean,
    weighted_quantile,
    weighted_var,
)

__all__ = [
    "weighted_quantile",
    "weighted_mean",
    "weighted_var",
    "state_quantiles",
    "cycle_quantiles",
    "state_variance",
    "estimated_trend",
    "predictive_quantiles",
    "observation_dist",
    "ibis_estimated_trend",
    "ibis_predictive_quantiles",
    "posterior_histograms",
]
