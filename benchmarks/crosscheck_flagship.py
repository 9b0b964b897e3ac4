"""Flagship statistical cross-check (VERDICT r3 #8): density-tempered SMC
vs online SMC² on the SAME UC-SV data at the same (M, N).

There is no exact oracle for UC-SV (nonlinear/heteroskedastic), so the
flagship posterior is pinned the way the reference pins its own golden
runs (/root/reference/src/smc_samplers.jl:197-220): two INDEPENDENT
samplers — the batch density-tempered algorithm (Duan–Fulop) and the
online SMC² (Chopin) — must land on the same θ-posterior within
Monte-Carlo error. Agreement is asserted per-dimension on the posterior
mean, scaled by the pooled posterior std: |Δmean| ≤ tol·sd (the MC error
of an M=512 mean is ~sd/√ESS ≪ sd, so tol=0.5 is loose but decisive —
a wrong sampler misses by multiples of sd).

Runs on the vendored PCE series (the flagship example's data). Opt-in
slow check — minutes at the flagship size on 1× v5e:

  python benchmarks/crosscheck_flagship.py [--m 512] [--n 8192] [--quick]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import sequential_monte_carlo_tpu as smc

HERE = os.path.dirname(os.path.abspath(__file__))
PCE = os.path.join(HERE, os.pardir, "examples", "data", "pce_inflation.csv")


def ucsv_prior():
    return smc.product_distribution(
        [
            smc.Uniform(jnp.asarray(0.0), jnp.asarray(1.0)),
            smc.Normal(jnp.asarray(3.0), jnp.asarray(2.0)),
            smc.Uniform(jnp.asarray(0.0), jnp.asarray(2.0)),
            smc.Uniform(jnp.asarray(0.0), jnp.asarray(2.0)),
        ]
    )


def weighted_moments(theta, log_omega):
    w = np.asarray(jax.nn.softmax(log_omega))
    th = np.asarray(theta)
    mean = w @ th
    var = w @ (th - mean) ** 2
    return mean, np.sqrt(var)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=512)
    p.add_argument("--n", type=int, default=8192)
    p.add_argument("--chain", type=int, default=5)
    p.add_argument("--tol", type=float, default=0.5,
                   help="|Δ posterior mean| per dim ≤ tol · pooled sd")
    p.add_argument("--quick", action="store_true",
                   help="small sizes for a CPU smoke run")
    args = p.parse_args()
    if args.quick:
        args.m, args.n, args.chain = 64, 256, 2
        # MC error of an M=64 posterior mean is ~sd/√ESS_θ ≈ 0.2–0.3 sd
        # per sampler — the flagship tol would flag pure noise here
        args.tol = max(args.tol, 1.25)

    import csv

    with open(PCE) as f:
        rows = list(csv.DictReader(f))
    y = jnp.asarray([float(r["value"]) for r in rows], dtype=jnp.float32)
    if args.quick:
        y = y[:60]

    cfg = smc.SMCConfig(
        n_particles=args.n, n_theta=args.m, chain=args.chain,
        ess_threshold=0.5,
    )
    prior = ucsv_prior()

    t0 = time.time()
    smc2 = smc.SMC2(smc.ucsv_model, prior, cfg)
    s_online, _ = smc2.run_segmented(jax.random.key(1998), y, segment_size=16)
    jax.block_until_ready(s_online.log_omega)
    t_online = time.time() - t0
    m_on, sd_on = weighted_moments(s_online.theta, s_online.log_omega)

    t0 = time.time()
    s_batch, stages = smc.density_tempered(
        smc.SMC2(smc.ucsv_model, prior, cfg), jax.random.key(4242), y
    )
    jax.block_until_ready(s_batch.log_omega)
    t_batch = time.time() - t0
    m_bt, sd_bt = weighted_moments(s_batch.theta, s_batch.log_omega)

    sd_pool = np.sqrt(0.5 * (sd_on**2 + sd_bt**2))
    delta = np.abs(m_on - m_bt) / sd_pool
    ok = bool((delta <= args.tol).all())
    print(json.dumps({
        "metric": f"ucsv_flagship_crosscheck_{args.m}x{args.n}",
        "theta_smc2": [round(float(v), 4) for v in m_on],
        "theta_density_tempered": [round(float(v), 4) for v in m_bt],
        "posterior_sd": [round(float(v), 4) for v in sd_pool],
        "delta_in_sd": [round(float(v), 3) for v in delta],
        "tol_sd": args.tol,
        "agree": ok,
        "t_smc2_s": round(t_online, 1),
        "t_density_tempered_s": round(t_batch, 1),
    }))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
