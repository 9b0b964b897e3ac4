"""Linear-Gaussian golden workflow — the reference README end-to-end.

≡ /root/reference/README.md:12-104: construct the univariate LG model
``lg_mod(θ) = LinearGaussian(θ₁, 1, θ₂, θ₃, 0)`` with θ=[0.5, 0.9, 0.8],
simulate 100 periods, run the bootstrap filter with per-step quantiles, the
full-sequence ``log_likelihood``, then joint inference with density-tempered
SMC and online SMC² under the TruncatedNormal/LogNormal/LogNormal prior —
validated here against the exact Kalman filter and the exact-IS posterior
oracle (the rebuild's formalization of the golden run in
smc_samplers.jl:197-220).

Run: python examples/linear_gaussian_example.py  [--m 512 --n 1024]
"""
from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sequential_monte_carlo_tpu as smc  # noqa: E402
from sequential_monte_carlo_tpu.analysis import weighted_quantile  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=256, help="θ-particles")
    p.add_argument("--n", type=int, default=512, help="state particles")
    p.add_argument("--t", type=int, default=100)
    args = p.parse_args()

    # -- model + data (README.md:12-24) --
    theta_true = jnp.array([0.5, 0.9, 0.8])
    model = smc.lg_model(theta_true)
    x_true, y = smc.simulate(jax.random.key(1998), model, args.t)
    print(f"simulated T={args.t} with θ* = {np.asarray(theta_true)}")

    # -- bootstrap filter with per-step summaries (README.md:33-57) --
    qs = jnp.array([0.25, 0.5, 0.75])
    state, logz, series = smc.filter_sequence(
        jax.random.key(0), model, args.n, y,
        summarize=lambda s: weighted_quantile(
            s.particles[:, 0], jnp.exp(s.log_weights), qs
        ),
    )
    print(f"bootstrap filter: logZ = {float(logz):.3f}; "
          f"final ess = {float(series['ess'][-1]):.1f}")

    # -- exact check (the rebuild's oracle, kalman_filter.jl) --
    (_, _), kz = smc.kalman_log_likelihood(model, y)
    print(f"exact Kalman logZ = {float(kz):.3f} "
          f"(PF error {float(logz) - float(kz):+.3f})")

    # -- joint inference (README.md:74-104) --
    prior = smc.product_distribution(
        [
            smc.TruncatedNormal(jnp.asarray(0.0), jnp.asarray(1.0),
                                jnp.asarray(-1.0), jnp.asarray(1.0)),
            smc.LogNormal(jnp.asarray(0.0), jnp.asarray(1.0)),
            smc.LogNormal(jnp.asarray(0.0), jnp.asarray(1.0)),
        ]
    )
    cfg = smc.SMCConfig(
        n_particles=args.n, n_theta=args.m, chain=3, ess_threshold=0.5
    )
    sampler = smc.SMC2(smc.lg_model, prior, cfg)

    dt_state, trace = smc.density_tempered(
        sampler, jax.random.key(1), y, verbose=True
    )
    print("density-tempered θ̂ =", np.asarray(smc.expected_parameters(dt_state)).round(4))

    smc2_state, infos = sampler.run(jax.random.key(2), y)
    print("online SMC²    θ̂ =", np.asarray(smc.expected_parameters(smc2_state)).round(4),
          f"(ess {float(smc2_state.ess):.1f}, "
          f"{int(np.asarray(infos.rejuvenated).sum())} rejuvenations)")

    ibis = smc.IBIS(smc.lg_model, prior, cfg)
    ibis_state, _ = ibis.run(jax.random.key(3), y)
    print("IBIS (exact)   θ̂ =", np.asarray(smc.expected_parameters(ibis_state)).round(4))

    # -- exact-IS oracle --
    th = prior.sample(jax.random.key(77), (50_000,))
    lz = jax.vmap(lambda m: smc.kalman_log_likelihood(m, y)[1])(
        jax.vmap(smc.lg_model)(th)
    )
    w = jax.nn.softmax(lz)
    print("exact-IS oracle θ̄ =", np.asarray(w @ th).round(4))


if __name__ == "__main__":
    main()
