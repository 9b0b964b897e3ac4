"""Density-tempered SMC (Duan & Fulop) — batch joint inference (L3).

≡ ``density_tempered`` (/root/reference/src/smc_samplers.jl:222-281):

  1. init — one full inner PF per θ for logẐ(θ) (the reference's threaded
     loop :223-229 → one batched (M,N,T) program), reweight by logZ;
  2. temper ξ → 1: bisection search (tolerance 1e-6, upper bound 2.0,
     :240-258) for the next ξ pinning the incremental-weight ESS at
     ess_min; corner-solution clamp to ξ=1 without resampling (:261-266);
  3. θ-resample + PMMH rejuvenation at temper ξ (:274-277).

The outer temper loop is host-driven (data-dependent, ≤ ~10 iterations, each
O(M) scalar math); all heavy compute — the batched filters and the
rejuvenation — is the jitted resample-move core shared with SMC².

The golden run in the reference docstring (smc_samplers.jl:197-220:
θ̂ ≈ [0.5033, 1.0246, 0.9753], ξ-schedule .00825/.03895/.11587/.27741/
.67719/1.0) is the acceptance test for this module (tests/test_samplers.py).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.batched_filter import batched_log_likelihood
from ..ops.weights import ess_from_log_weights
from ..utils.struct import replace
from .base import SMC2State
from .smc2 import SMC2


class TemperStage(NamedTuple):
    xi: float
    ess: float
    acc_ratio: float


def _np_normalize(logw: np.ndarray):
    """Host-side reference normalize (particles.jl:5-15) in float64."""
    maxw = logw.max()
    w = np.exp(logw - maxw)
    sumw = w.sum()
    w = w / sumw
    ess = 1.0 / np.sum(w**2)
    return w, ess


def density_tempered(sampler: SMC2, key, y, verbose: bool = False):
    """Run density-tempered SMC to ξ=1. Returns (state, [TemperStage...])."""
    cfg = sampler.config
    y = jnp.asarray(y)
    T = y.shape[0]

    # ---- init: θ ~ prior, full-sequence PF per θ (≡ :223-232) ----
    k_theta, k_pf, k_state = jax.random.split(key, 3)
    state = _dt_init(sampler)(k_theta, k_pf, k_state, y)

    ess_min = cfg.ess_min
    trace = []
    xi = 0.0
    full_mask = jnp.ones(T, dtype=y.dtype)

    while xi < 1.0:
        old_xi = xi
        logz = np.asarray(state.log_z, dtype=np.float64)

        # ---- bisection for the next ξ (≡ :240-258) ----
        lower, upper = old_xi, cfg.bisection_upper
        new_xi = upper
        ess = float(state.ess)
        while upper - lower > cfg.bisection_tol:
            new_xi = (upper + lower) / 2.0
            _, ess = _np_normalize((new_xi - old_xi) * logz)
            if ess == ess_min:
                break
            elif ess < ess_min:
                upper = new_xi
            else:
                lower = new_xi

        # corner solution: clamp to 1 without resampling (≡ :261-266)
        resample_flag = True
        if new_xi >= 1.0:
            resample_flag = False
            new_xi = 1.0
            _, ess = _np_normalize((new_xi - old_xi) * logz)

        xi = new_xi
        log_omega = jnp.asarray(
            (new_xi - old_xi) * logz, dtype=state.log_omega.dtype
        )
        state = replace(
            state, log_omega=log_omega, ess=jnp.asarray(ess, dtype=state.ess.dtype)
        )

        if resample_flag:
            state = sampler._resample_move_jit(
                state, y, full_mask, jnp.asarray(xi, dtype=y.dtype)
            )

        stage = TemperStage(xi=xi, ess=ess, acc_ratio=float(state.acc_ratio))
        trace.append(stage)
        if verbose:
            print(
                f"ξ = {stage.xi:.5f}\tess = {stage.ess:.3f}"
                + (f"\t[rejuvenating]\tacc_rate: {stage.acc_ratio:.5f}" if resample_flag else "")
            )

    return state, trace


def _dt_init(sampler: SMC2):
    """Jitted batched-PF initializer, cached on the sampler instance."""
    fn = getattr(sampler, "_dt_init_jit", None)
    if fn is not None:
        return fn
    cfg = sampler.config

    def impl(k_theta, k_pf, k_state, y):
        theta = sampler.prior.sample(k_theta, (cfg.n_theta,))
        models = jax.vmap(sampler.model_fn)(theta)
        particles, log_w, log_z = batched_log_likelihood(
            k_pf, models, cfg.n_particles, cfg.n_theta, y, cfg.inner
        )
        # initial reweight by logZ for the displayed ESS (≡ :232; the first
        # bisection replaces these weights)
        ess = ess_from_log_weights(log_z)
        return SMC2State(
            theta=theta,
            log_omega=log_z,
            particles=particles,
            log_w=log_w,
            log_z=log_z,
            ess=ess,
            acc_ratio=jnp.asarray(0.0),
            key=k_state,
            t=jnp.asarray(y.shape[0], dtype=jnp.int32),
            active_n=jnp.asarray(cfg.n_particles, dtype=jnp.int32),
            exchange_pending=jnp.asarray(False),
        )

    fn = jax.jit(impl)
    sampler._dt_init_jit = fn
    return fn
