from .base import StateSpaceModel, simulate
from .dsl import DSLModel, ModelSpec, linear_ssm_model, ssm_model
from .linear_gaussian import (
    LinearGaussianModel,
    hodrick_prescott,
    lg_model,
    multivariate_linear_gaussian,
    uc_model,
    univariate_linear_gaussian,
    unobserved_components,
)
from .stochastic_volatility import (
    StochasticVolatilityModel,
    stochastic_volatility,
    sv_model,
)
from .ucsv import UCSVModel, ucsv_model, unobserved_components_stochastic_volatility

__all__ = [
    "StateSpaceModel",
    "simulate",
    "LinearGaussianModel",
    "univariate_linear_gaussian",
    "multivariate_linear_gaussian",
    "unobserved_components",
    "hodrick_prescott",
    "uc_model",
    "lg_model",
    "UCSVModel",
    "unobserved_components_stochastic_volatility",
    "ucsv_model",
    "StochasticVolatilityModel",
    "stochastic_volatility",
    "sv_model",
    "DSLModel",
    "ModelSpec",
    "ssm_model",
    "linear_ssm_model",
]
