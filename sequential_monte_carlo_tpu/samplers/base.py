"""Sampler state and configuration (L3).

≡ the reference's mutable ``SMC``/``IBIS`` containers
(/root/reference/src/smc_samplers.jl:5-59, /root/reference/src/ibis.jl:3-58)
redesigned as an immutable pytree that flows through ``jit``/``scan``/
``shard_map`` and checkpoints as-is (SURVEY.md §5.4). All the reference's
hard-coded constants (RW scale 2.83², covariance floor/jitter, bisection
tolerance, exchange cap — SURVEY.md §5.6) are named config fields.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.particle_filter import PFConfig
from ..utils.struct import pytree_dataclass, static_field


class SMCConfig(NamedTuple):
    """Static sampler configuration (hashable).

    Mirrors ``SMC(N, M, model, prior, chain, ess_threshold, min_ar)``
    (smc_samplers.jl:29-36) plus the constants hard-coded in the reference.
    """

    n_particles: int = 1024  # N: state particles per θ
    n_theta: int = 512  # M: θ-particles
    chain: int = 3  # MCMC steps per rejuvenation
    ess_threshold: float = 0.5  # θ-ESS trigger: ess_min = M·threshold
    acc_threshold: float = -1.0  # exchange trigger (min_ar; -1 disables)
    # elastic (acc_threshold > 0) padding policy — DEVIATIONS.md §5:
    #   "grow": arrays stay at the live size; a triggered doubling raises
    #           state.exchange_pending, serviced host-side (maybe_exchange /
    #           run_segmented boundaries) by re-padding + refiltering —
    #           ≤ log2(cap/N) recompiles, ZERO steady-state padding tax;
    #   "full": arrays padded once to the doubling cap; active_n doubles
    #           inside the compiled scan (zero host sync, but every step
    #           runs at the padded shape — up to 8× dead compute until the
    #           cloud actually grows).
    elastic_pad: str = "grow"
    inner: PFConfig = PFConfig("systematic", 1.0)  # inner-PF config
    theta_resampling: str = "multinomial"  # ≡ resample! smc_samplers.jl:74-84
    # adaptive random-walk kernel constants (smc_samplers.jl:87-101)
    rw_scale: float = 2.83**2
    cov_floor_norm: float = 1e-8
    cov_floor_value: float = 1e-2
    cov_jitter: float = 1e-10
    # rejuvenation proposal-scale annealing: 0.5·reverse(1:chain) (:109)
    anneal_base: float = 0.5
    # density-tempered bisection (smc_samplers.jl:243-245)
    bisection_tol: float = 1e-6
    bisection_upper: float = 2.0
    # exchange step (smc_samplers.jl:163-189)
    exchange_max_n: int = 4096  # double N while N ≤ this

    @property
    def ess_min(self) -> float:
        return self.n_theta * self.ess_threshold


@pytree_dataclass
class SMC2State:
    """θ-cloud + per-θ particle clouds — the full SMC² posterior state.

    A pure pytree: checkpointing is serializing it; resume is feeding it
    back into the jitted step (SURVEY.md §5.4).
    """

    theta: jax.Array  # (M, dθ)
    log_omega: jax.Array  # (M,) unnormalized θ log-weights
    particles: jax.Array  # (M, N_pad, dx)
    log_w: jax.Array  # (M, N_pad) normalized per-θ particle log-weights
    log_z: jax.Array  # (M,) running per-θ marginal-likelihood estimate
    ess: jax.Array  # scalar θ-ESS
    acc_ratio: jax.Array  # scalar: last rejuvenation acceptance rate
    key: jax.Array  # PRNG state
    t: jax.Array  # int32: number of observations assimilated
    # int32: live state particles per θ. Equal to N_pad in the fixed-N case;
    # with an in-graph exchange step (acc_threshold > 0, elastic_pad="full")
    # the particle arrays are padded to the doubling cap and this carries the
    # active count — slots ≥ active_n hold log_w = -inf (the static-shape
    # form of the reference's N-doubling, smc_samplers.jl:163-189). In
    # "grow" mode it always equals the array size.
    active_n: jax.Array = None
    # bool: an exchange trigger fired but could not double in-graph (grow
    # mode) — serviced host-side at the next maybe_exchange call or
    # run_segmented boundary (DEVIATIONS.md §5).
    exchange_pending: jax.Array = None

    @property
    def n_theta(self) -> int:
        return self.theta.shape[0]

    @property
    def n_particles(self) -> int:
        return self.particles.shape[1]

    def __repr__(self):
        return _sampler_repr(self)


def _sampler_repr(state) -> str:
    """≡ ``Base.show(io, smc::SMC)`` (smc_samplers.jl:67-72): the θ-ESS and
    the ω-weighted posterior mean of θ. Falls back to the generic repr for
    traced (abstract) states inside jit."""
    try:
        import numpy as np

        ess = round(float(state.ess), 3)
        w = jax.nn.softmax(state.log_omega)
        mean = np.asarray(w @ state.theta).round(5)
    except (jax.errors.TracerArrayConversionError, jax.errors.ConcretizationTypeError, TypeError):
        return object.__repr__(state)
    return f"{type(state).__name__}: ess     = {ess}\n" + " " * len(
        type(state).__name__
    ) + "  mean(θ) = {}".format(mean)


@pytree_dataclass
class IBISState:
    """θ-cloud with per-θ exact Kalman states — ≡ IBIS (ibis.jl:3-24)."""

    theta: jax.Array  # (M, dθ)
    log_omega: jax.Array  # (M,)
    mean: jax.Array  # (M, dx) Kalman filtered means
    cov: jax.Array  # (M, dx, dx) Kalman filtered covariances
    log_z: jax.Array  # (M,)
    ess: jax.Array
    acc_ratio: jax.Array
    key: jax.Array
    t: jax.Array

    @property
    def n_theta(self) -> int:
        return self.theta.shape[0]

    def __repr__(self):
        return _sampler_repr(self)


class StepInfo(NamedTuple):
    """Structured per-step telemetry — replaces the reference's @printf
    traces (SURVEY.md §5.1,5.5)."""

    ess: jax.Array
    rejuvenated: jax.Array  # bool: degeneracy branch taken
    acc_ratio: jax.Array  # acceptance rate of the last rejuvenation
    log_evidence_incr: jax.Array  # log p̂(y_t | y_{1:t-1}) (model evidence)
