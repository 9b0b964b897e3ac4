"""Sweep chunk-walk resample kernel tile params at the flagship size.

Scan-serialized timing (async dispatch under-reports; a lax.scan chain of
dependent calls measures real per-call latency, PERF_NOTES.md). Usage:

  python benchmarks/sweep_walk_kernel.py [--m 512] [--n 8192] [--iters 50]
"""
from __future__ import annotations

import argparse
import itertools
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from sequential_monte_carlo_tpu.kernels.resample_pallas import (
    systematic_uniforms,
)
from sequential_monte_carlo_tpu.kernels.resample_walk import (
    resample_gather_walk,
)


def time_config(m, n, c, tm, ot, cw, iters, skew=0.3, xor_mask=False):
    key = jax.random.key(0)
    xs = jax.random.normal(jax.random.key(1), (m, c, n), jnp.float32)
    logw = jax.random.normal(jax.random.key(2), (m, n)) * skew
    w = jnp.exp(logw - logw.max(axis=-1, keepdims=True))

    @jax.jit
    def chain(key, xs, w):
        def body(carry, k):
            xs, w = carry
            u = systematic_uniforms(k, m, n, dtype=w.dtype)
            out = resample_gather_walk(u, w, xs, tm=tm, ot=ot, cw=cw,
                                       xor_mask=xor_mask)
            # cheap dependency so the next iteration waits on this one
            w2 = jnp.abs(out[:, 0, :])
            w2 = w2 / jnp.sum(w2, axis=-1, keepdims=True)
            return (out, w2), None

        keys = jax.random.split(key, iters)
        (xs, w), _ = jax.lax.scan(body, (xs, w), keys)
        return xs, w

    def run_once(k):
        out = chain(k, xs, w)
        # host fetch: block_until_ready does not reliably block over the
        # axon tunnel (PERF_NOTES.md) — a value fetch does
        return float(jnp.sum(out[0][0, 0, :8]))

    run_once(key)
    t0 = time.perf_counter()
    run_once(jax.random.key(3))
    dt = time.perf_counter() - t0
    return dt / iters * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=512)
    p.add_argument("--n", type=int, default=8192)
    p.add_argument("--c", type=int, default=3)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--tms", type=int, nargs="*", default=[4, 8])
    p.add_argument("--ots", type=int, nargs="*", default=[128, 256, 512])
    p.add_argument("--cws", type=int, nargs="*", default=[128, 256])
    p.add_argument("--skew", type=float, default=0.3)
    p.add_argument("--xor", action="store_true")
    args = p.parse_args()

    for tm, ot, cw in itertools.product(args.tms, args.ots, args.cws):
        try:
            ms = time_config(args.m, args.n, args.c, tm, ot, cw, args.iters,
                             args.skew, args.xor)
            print(f"tm={tm} ot={ot} cw={cw}: {ms:.3f} ms/call", flush=True)
        except Exception as e:  # noqa: BLE001 — sweep survives bad configs
            print(f"tm={tm} ot={ot} cw={cw}: FAIL {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
