"""Canonical stochastic-volatility SSM (BASELINE.md config 2).

Not present in the reference model zoo but required by the north-star
benchmark set ("bootstrap filter on stochastic-volatility SSM (nonlinear obs
density), 4096 particles" — BASELINE.json configs[1]). Standard AR(1)
log-volatility model:

  x_1 ~ N(mu, sigma² / (1 − phi²))
  x_t ~ N(mu + phi (x_{t-1} − mu), sigma²)
  y_t ~ N(0, exp(x_t))               (nonlinear observation density)
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from ..distributions import Normal, Product
from ..utils.struct import pytree_dataclass

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


def _sv_update(par, y, state, normals):
    """Per-particle SV step, traced into the fused Pallas kernel
    (kernels/propagate_pallas.py): AR(1) log-vol transition + the
    N(0, exp(x'))-observation log-density."""
    mu, phi, sigma = par
    (x,) = state
    (z,) = normals
    x_new = mu + phi * (x - mu) + sigma * z
    logw = -0.5 * (y * y) * jnp.exp(-x_new) - 0.5 * x_new - _HALF_LOG_2PI
    return (x_new,), logw


@pytree_dataclass
class StochasticVolatilityModel:
    mu: jnp.ndarray
    phi: jnp.ndarray
    sigma: jnp.ndarray  # std of log-vol innovations

    @property
    def state_dim(self) -> int:
        return 1

    def initial_distribution(self):
        scale = self.sigma / jnp.sqrt(1.0 - self.phi**2)
        return Product(
            Normal(
                jnp.reshape(self.mu, (-1,))[:1],
                jnp.reshape(scale, (-1,))[:1],
            )
        )

    def transition_distribution(self, x):
        loc = self.mu + self.phi * (x - self.mu)
        return Product(Normal(loc, jnp.broadcast_to(self.sigma, loc.shape)))

    def observation_distribution(self, x):
        return Normal(jnp.zeros(x.shape[:-1]), jnp.exp(0.5 * x[..., 0]))

    # -- fused fast path (kernels/propagate_pallas.py) -----------------------
    # Same contract as UCSVModel.fused_propagate_reweight: called by
    # ops/batched_filter.py with a θ-stacked model (fields (M,)) and the
    # whole (M, N, 1) cloud.
    def fused_propagate_reweight(self, seed, y, particles, tile_offset=0,
                                 interpret: bool = False,
                                 normalize: bool = False, carry_logw=None):
        from ..kernels.propagate_pallas import fused_elementwise_step

        x = particles[..., 0]
        m = x.shape[0]
        params = tuple(
            jnp.broadcast_to(p, (m,)) for p in (self.mu, self.phi, self.sigma)
        )
        out = fused_elementwise_step(
            _sv_update, seed, y, params, (x,), n_normals=1,
            tile_offset=tile_offset, normalize=normalize, interpret=interpret,
            carry_logw=carry_logw,
        )
        if normalize:
            planes, log_norm, row_lse, ess = out
            return planes[0][..., None], log_norm, row_lse[:, 0], ess[:, 0]
        planes, logw = out
        return planes[0][..., None], logw

    @staticmethod
    def fused_tiles(m: int) -> int:
        """Grid tiles of the fused kernel for an M-row block (TILE_M=8 when
        divisible) — see UCSVModel.fused_tiles."""
        return m // 8 if m % 8 == 0 else 1


def stochastic_volatility(mu=-1.0, phi=0.95, sigma=0.3):
    f = lambda v: jnp.asarray(v, dtype=jnp.result_type(float))
    return StochasticVolatilityModel(mu=f(mu), phi=f(phi), sigma=f(sigma))


def sv_model(theta):
    """θ ↦ SV model with θ = (mu, phi, sigma)."""
    return StochasticVolatilityModel(mu=theta[0], phi=theta[1], sigma=theta[2])
