"""A/B harness: gen-4 matmul walk vs gen-5 lane-gather walk on real TPU.

Checks bitwise correctness of both kernels against the XLA
searchsorted+take oracle, then times them with the PERF_NOTES timing
discipline (scan-serialized, host-fetch sync).

Usage: python benchmarks/bench_take_walk.py [--m 512] [--n 8192]
"""
from __future__ import annotations

import argparse
import os
import sys

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

from roofline import timed_chain, report

from sequential_monte_carlo_tpu.kernels.resample_pallas import (
    systematic_uniforms,
)
from sequential_monte_carlo_tpu.kernels.resample_walk import (
    resample_gather_walk,
)
from benchmarks.ablations.resample_take_walk import (
    resample_gather_take,
)


def oracle(u, w, xs):
    cdf = jnp.cumsum(w, axis=-1)
    cdf = cdf / cdf[..., -1:]
    cdf = cdf.at[..., -1].set(jnp.float32(1.0) + 1e-6)
    anc = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="left"))(cdf, u)
    anc = jnp.clip(anc, 0, u.shape[-1] - 1)
    return jax.vmap(lambda x, a: jnp.take(x, a, axis=1))(xs, anc)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=512)
    p.add_argument("--n", type=int, default=8192)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()
    m, n, iters = args.m, args.n, args.iters

    c = 3
    xs = jax.random.normal(jax.random.key(1), (m, c, n), jnp.float32)
    # skewed weights (realistic post-reweight distribution)
    logw = jax.random.normal(jax.random.key(2), (m, n)) * 2.0
    w = jnp.exp(logw - logw.max(axis=-1, keepdims=True))
    u = systematic_uniforms(jax.random.key(3), m, n, dtype=jnp.float32)

    ref = oracle(u, w, xs)
    for name, fn in [
        ("walk(gen4)", lambda: resample_gather_walk(u, w, xs)),
        ("take(gen5)", lambda: resample_gather_take(u, w, xs)),
    ]:
        out = fn()
        ok = bool(jnp.all(out == ref))
        print(f"correct[{name}] at ({m},{n}): {ok}", flush=True)
        if not ok:
            bad = jnp.sum(jnp.any(out != ref, axis=1))
            print(f"  mismatched (row,col) slots: {int(bad)}")

    def body_of(kernel):
        def body(carry, k):
            xs, w = carry
            uu = systematic_uniforms(k, m, n, dtype=w.dtype)
            out = kernel(uu, w, xs)
            w2 = jnp.abs(out[:, 0, :])
            w2 = w2 / jnp.sum(w2, axis=-1, keepdims=True)
            return (out, w2), None
        return body

    for name, kern in [
        ("resample_gather_walk (gen4, incl prep)", resample_gather_walk),
        ("resample_gather_take (gen5, incl prep)", resample_gather_take),
    ]:
        ms = timed_chain(body_of(kern), (xs, w), iters,
                         lambda o: float(jnp.sum(o[0][0, 0, :8])))
        report(name, ms)

    # gen-5 tiling sweep
    for ocw in (128, 256, 512):
        for tm in (4, 8, 16):
            if m % tm:
                continue
            if n % ocw or n < 2 * ocw:
                continue
            kern = lambda uu, ww, xx: resample_gather_take(  # noqa: E731
                uu, ww, xx, tm=tm, ot=ocw, cw=ocw)
            try:
                ms = timed_chain(body_of(kern), (xs, w), iters,
                                 lambda o: float(jnp.sum(o[0][0, 0, :8])))
            except Exception as e:  # VMEM OOM configs: report, keep sweeping
                print(f"  gen5 tm={tm} ot=cw={ocw}: {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:100]}", flush=True)
                continue
            report(f"  gen5 tm={tm} ot=cw={ocw}", ms)


if __name__ == "__main__":
    main()
