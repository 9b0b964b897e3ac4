"""Armed-elastic overhead: acc_threshold armed-but-never-fires vs unarmed.

VERDICT r2 #2 / r3 #2 done-criterion: the pay-as-you-grow exchange mode
must cost ≤10% when armed and idle, at BOTH the headline (512×1024) and
flagship (512×8192) sizes. The trajectory is identical until an exchange
fires, so the comparison is apples-to-apples per key.

Usage: python benchmarks/bench_elastic_overhead.py [--m 512] [--n 1024]
"""
from __future__ import annotations

import argparse
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


def run_config(y, m, n, chain, acc_threshold, repeats=2):
    prior = smc.product_distribution(
        [
            smc.Uniform(jnp.asarray(0.0), jnp.asarray(1.0)),
            smc.Normal(jnp.asarray(3.0), jnp.asarray(2.0)),
            smc.Uniform(jnp.asarray(0.0), jnp.asarray(2.0)),
            smc.Uniform(jnp.asarray(0.0), jnp.asarray(2.0)),
        ]
    )
    cfg = smc.SMCConfig(
        n_particles=n, n_theta=m, chain=chain, ess_threshold=0.5,
        acc_threshold=acc_threshold,
    )
    sampler = smc.SMC2(smc.ucsv_model, prior, cfg)
    state, _ = sampler.run(jax.random.key(99), y)  # warm compile
    jax.block_until_ready(state)
    best = float("inf")
    for r in range(repeats):
        t0 = time.perf_counter()
        state, _ = sampler.run(jax.random.key(r), y)
        jax.block_until_ready(state)
        best = min(best, time.perf_counter() - t0)
    assert bool(jnp.isfinite(state.ess))
    if acc_threshold > 0:
        assert not bool(state.exchange_pending), "exchange fired: not idle"
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=512)
    p.add_argument("--n", type=int, default=1024)
    p.add_argument("--t", type=int, default=241)
    p.add_argument("--chain", type=int, default=5)
    p.add_argument("--armed", type=float, default=0.10,
                   help="acc_threshold for the armed run (low enough that "
                        "no exchange fires on the synthetic series)")
    args = p.parse_args()

    rng = np.random.default_rng(1998)
    y = jnp.asarray(
        3.0 + np.cumsum(rng.normal(0, 0.3, args.t)) + rng.normal(0, 0.5, args.t),
        dtype=jnp.float32,
    )
    base = run_config(y, args.m, args.n, args.chain, -1.0)
    armed = run_config(y, args.m, args.n, args.chain, args.armed)
    print(f"({args.m}, {args.n}) T={args.t}: unarmed {base:.3f} s, "
          f"armed-idle {armed:.3f} s, overhead "
          f"{100.0 * (armed - base) / base:+.1f}%")


if __name__ == "__main__":
    main()
