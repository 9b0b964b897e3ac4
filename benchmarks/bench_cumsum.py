"""Micro-bench: the resample wrapper's cdf prep, component by component.

What exactly costs what in the ~1.6 ms "cumsum + chunk bounds" stage at
(512, 8192), and whether a two-level MXU (triangular-matmul) prefix sum
could beat XLA's cumsum if the bitwise contract were re-pinned to it.

Usage: python benchmarks/bench_cumsum.py [--m 512] [--n 8192]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=512)
    p.add_argument("--n", type=int, default=8192)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()
    m, n, iters = args.m, args.n, args.iters

    logw = jax.random.normal(jax.random.key(2), (m, n)) * 0.3
    w0 = jnp.exp(logw - logw.max(axis=-1, keepdims=True))

    def renorm(c, w):
        w2 = w + c[:, -1:] * 1e-12
        return w2 / jnp.sum(w2, -1, keepdims=True)

    def b_cumsum(carry, k):
        w = carry
        cdf = jnp.cumsum(w, axis=-1)
        return renorm(cdf, w), None

    def b_full_prep(carry, k):
        # exactly the walk wrapper's prep: cumsum, normalize, set-last, pad
        w = carry
        cdf = jnp.cumsum(w, axis=-1)
        cdf = cdf / cdf[..., -1:]
        cdf = cdf.at[..., -1].set(jnp.float32(1.0) + 1e-6)
        cdfp = jnp.pad(cdf[..., :-1], ((0, 0), (1, 0)), constant_values=-1.0)
        return renorm(cdf + cdfp * 1e-20, w), None

    def b_exp_cumsum(carry, k):
        w = carry
        cdf = jnp.cumsum(jnp.exp(jnp.log(w + 1e-30)), axis=-1)
        return renorm(cdf, w), None

    cw = 128
    nc = n // cw
    tri = jnp.tril(jnp.ones((cw, cw), jnp.float32)).T  # (j≤i) upper for x@tri

    def b_tri_matmul(carry, k):
        # two-level prefix: intra-chunk via (128,128) triangular matmul on
        # the MXU + exclusive chunk-offset scan; NOT bitwise == jnp.cumsum
        w = carry
        wc = w.reshape(m, nc, cw)
        intra = jax.lax.dot_general(
            wc, tri, dimension_numbers=(((2,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # (m, nc, cw) prefix within chunk
        sums = intra[:, :, -1]  # (m, nc)
        offs = jnp.cumsum(sums, axis=-1) - sums  # exclusive
        cdf = (intra + offs[:, :, None]).reshape(m, n)
        return renorm(cdf, w), None

    def b_tri_matmul_mono(carry, k):
        w = carry
        wc = w.reshape(m, nc, cw)
        intra = jax.lax.dot_general(
            wc, tri, dimension_numbers=(((2,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        sums = intra[:, :, -1]
        offs = jnp.cumsum(sums, axis=-1) - sums
        cdf = (intra + offs[:, :, None]).reshape(m, n)
        cdf = jax.lax.cummax(cdf, axis=1)  # enforce monotone
        return renorm(cdf, w), None

    for name, body in [
        ("jnp.cumsum alone", b_cumsum),
        ("full wrapper prep (cumsum/div/set/pad)", b_full_prep),
        ("exp fused into cumsum read", b_exp_cumsum),
        ("two-level tri-matmul prefix", b_tri_matmul),
        ("tri-matmul + cummax monotone guard", b_tri_matmul_mono),
    ]:
        ms = timed_chain(body, w0, iters, lambda o: float(jnp.sum(o[0, :8])))
        report(name, ms)


if __name__ == "__main__":
    main()
