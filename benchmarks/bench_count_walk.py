"""A/B harness: gen-4 band-mask walk (u0 route) vs the gen-6 count-driven
walk (promoted to production in round 5 — VERDICT r4 #3) on real TPU.

Both take the (M, 1) systematic offsets — the production SMC² resample
route. Hardware-bitwise-checks each kernel against ITS OWN oracle first
(interpret mode cannot certify Mosaic lowering — the round-3 float-iota
lesson), then times both with the PERF_NOTES discipline (scan-serialized,
host-fetch sync), including each formulation's full host prep: gen-4 pays
cumsum + cdf_prev pad + the (M, OT, n_tiles) u-grid materialization; the
count walk pays cumsum + ceil-span streams and NO u grid.

Usage: python benchmarks/bench_count_walk.py [--m 512] [--n 8192]
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

from sequential_monte_carlo_tpu.kernels.resample_walk import (
    count_ancestors,
    resample_gather_walk,
)


def resample_gather_count_walk(u0, w, xs, tm=16, ot=128, cw=128,
                               span_dtype="int32"):
    return resample_gather_walk(None, w, xs, tm=tm, ot=ot, cw=cw, u0=u0,
                                span_dtype=span_dtype)


def oracle_gen4(u0, w, xs):
    n = w.shape[-1]
    u = (jnp.arange(n, dtype=w.dtype)[None, :] + u0) / n
    cdf = jnp.cumsum(w, axis=-1)
    cdf = cdf / cdf[..., -1:]
    cdf = cdf.at[..., -1].set(jnp.float32(1.0) + 1e-6)
    anc = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="left"))(cdf, u)
    anc = jnp.clip(anc, 0, n - 1)
    return jax.vmap(lambda x, a: jnp.take(x, a, axis=1))(xs, anc)


def oracle_count(u0, w, xs):
    anc = count_ancestors(u0, w)
    return jax.vmap(lambda x, a: jnp.take(x, a, axis=1))(xs, anc)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=512)
    p.add_argument("--n", type=int, default=8192)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--skew", type=float, default=2.0)
    args = p.parse_args()
    m, n, iters = args.m, args.n, args.iters

    c = 3
    xs = jax.random.normal(jax.random.key(1), (m, c, n), jnp.float32)
    logw = jax.random.normal(jax.random.key(2), (m, n)) * args.skew
    w = jnp.exp(logw - logw.max(axis=-1, keepdims=True))
    u0 = jax.random.uniform(jax.random.key(3), (m, 1), dtype=jnp.float32)

    gen4 = lambda u0_, w_, x_: resample_gather_walk(  # noqa: E731
        None, w_, x_, u0=u0_, formulation="band"
    )
    variants = [("walk(gen4,u0)", gen4, oracle_gen4)]
    for tm in (8, 16, 32):
        if m % tm == 0:
            variants.append((
                f"count_walk tm={tm}",
                lambda u0_, w_, x_, tm=tm: resample_gather_count_walk(
                    u0_, w_, x_, tm=tm
                ),
                oracle_count,
            ))
    for tm in (16,):
        if m % tm == 0 and n <= 16384:
            variants.append((
                f"count_walk tm={tm} i16-spans",
                lambda u0_, w_, x_, tm=tm: resample_gather_count_walk(
                    u0_, w_, x_, tm=tm, span_dtype="int16"
                ),
                oracle_count,
            ))
    for tm, ot, cw in ((16, 256, 128), (16, 128, 256), (8, 256, 256)):
        if m % tm == 0 and n % ot == 0 and n % cw == 0 and n >= 2 * cw:
            variants.append((
                f"count_walk tm={tm} ot={ot} cw={cw}",
                lambda u0_, w_, x_, tm=tm, ot=ot, cw=cw:
                    resample_gather_count_walk(u0_, w_, x_, tm=tm, ot=ot,
                                               cw=cw),
                oracle_count,
            ))

    for name, fn, orc in variants:
        try:
            out = fn(u0, w, xs)
            ok = bool(jnp.all(out == orc(u0, w, xs)))
        except Exception as e:  # Mosaic compile failures: report, keep going
            print(f"correct[{name}]: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:110]}", flush=True)
            continue
        print(f"correct[{name}] at ({m},{n}): {ok}", flush=True)

    def body_of(kernel):
        def body(carry, k):
            xs, w = carry
            u0_ = jax.random.uniform(k, (m, 1), dtype=w.dtype)
            out = kernel(u0_, w, xs)
            w2 = jnp.abs(out[:, 0, :])
            w2 = w2 / jnp.sum(w2, axis=-1, keepdims=True)
            return (out, w2), None
        return body

    for name, fn, _ in variants:
        try:
            ms = timed_chain(body_of(fn), (xs, w), iters,
                             lambda o: float(jnp.sum(o[0][0, 0, :8])))
        except Exception as e:
            print(f"  {name}: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:110]}", flush=True)
            continue
        report(f"{name} (incl prep)", ms)


if __name__ == "__main__":
    main()
