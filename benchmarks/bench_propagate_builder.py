"""A/B: bespoke ucsv_pallas kernel vs the generic builder kernel for the
UC-SV propagate+reweight (round 4).

The builder passes per-θ params as (M, 1) VMEM columns (lane-broadcast
in-kernel) where the bespoke kernel streams full (M, N) broadcasts of
γε/γη from HBM — at 512×8192 that is 2×16 MB of reads per step the
builder skips. Draw order is identical (two Box–Muller pairs, first
three normals used), so outputs must be BITWISE equal at the same seed.

  python benchmarks/bench_propagate_builder.py [--m 512] [--n 8192]
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

from sequential_monte_carlo_tpu.kernels.propagate_pallas import (
    fused_elementwise_step,
)
from sequential_monte_carlo_tpu.kernels.ucsv_pallas import (
    ucsv_propagate_reweight,
)
from sequential_monte_carlo_tpu.models.ucsv import _ucsv_update


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=512)
    p.add_argument("--n", type=int, default=8192)
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args()
    m, n = args.m, args.n

    planar = jax.random.normal(jax.random.key(1), (m, 3, n)).astype(jnp.float32)
    ge = jnp.full((m,), 0.3, jnp.float32)
    gn = jnp.full((m,), 0.2, jnp.float32)

    # bitwise check at the same seed
    xa, la, na, lwa = ucsv_propagate_reweight(
        7, 1.3, ge, gn, planar[:, 0], planar[:, 1], planar[:, 2]
    )
    (xb, lb, nb), lwb = fused_elementwise_step(
        _ucsv_update, 7, 1.3, (ge, gn),
        (planar[:, 0], planar[:, 1], planar[:, 2]), n_normals=3,
    )
    same = all(
        bool(jnp.all(a == b))
        for a, b in [(xa, xb), (la, lb), (na, nb), (lwa, lwb)]
    )
    print(f"bitwise builder == bespoke: {same}", flush=True)

    def timed(fn):
        @jax.jit
        def chain(x0, l0, n0):
            def body(carry, seed):
                x, l, nn = carry
                return fn(seed, x, l, nn), None

            (x, l, nn), _ = jax.lax.scan(
                body, (x0, l0, n0),
                jnp.arange(args.iters, dtype=jnp.int32),
            )
            return x, l, nn

        def run(k):
            out = chain(planar[:, 0], planar[:, 1], planar[:, 2])
            return float(jnp.sum(out[0][0, :8]))

        run(0)
        t0 = time.perf_counter()
        run(1)
        return (time.perf_counter() - t0) / args.iters * 1e3

    def bespoke(seed, x, l, nn):
        xo, lo, no, _ = ucsv_propagate_reweight(seed, 1.3, ge, gn, x, l, nn)
        return xo, lo, no

    def builder(seed, x, l, nn):
        (xo, lo, no), _ = fused_elementwise_step(
            _ucsv_update, seed, 1.3, (ge, gn), (x, l, nn), n_normals=3
        )
        return xo, lo, no

    def builder_norm(seed, x, l, nn):
        (xo, lo, no), _, _, _ = fused_elementwise_step(
            _ucsv_update, seed, 1.3, (ge, gn), (x, l, nn), n_normals=3,
            normalize=True,
        )
        return xo, lo, no

    ms_a = timed(bespoke)
    ms_b = timed(builder)
    ms_c = timed(builder_norm)
    print(f"(M={m}, N={n}) bespoke {ms_a:.3f} ms | builder {ms_b:.3f} ms | "
          f"builder+norm {ms_c:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
