"""Ablation: where does the walk kernel's time go at N=8192?

Times three kernel variants (identical walk/loop structure):
  full    — the real kernel (extract + compare + xor + int8 dot_general)
  nodot   — dot_general replaced by a sublane-sum accumulate (mask cost only)
  dotonly — compare replaced by a constant mask (dot cost only)

  python benchmarks/ablate_walk_kernel.py [--m 512] [--n 8192]
"""
from __future__ import annotations

import argparse
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

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sequential_monte_carlo_tpu.kernels.resample_pallas import (
    _to_byte_planes,
    systematic_uniforms,
)


def make_kernel(variant):
    def _kernel(ks_ref, ke_ref, u_ref, cdfs_ref, cdfps_ref, xb_ref, out_ref):
        tm = u_ref.shape[0]
        n = u_ref.shape[2]
        cw = cdfs_ref.shape[1]
        c4 = xb_ref.shape[1]
        n_tiles = ks_ref.shape[0] // pl.num_programs(0)
        ot = n // n_tiles
        g = pl.program_id(0)

        def tile_body(t, _):
            u_t = u_ref[:, 0, pl.ds(t * ot, ot)]
            ks = ks_ref[g * n_tiles + t]
            ke = ke_ref[g * n_tiles + t]
            n_ch = cdfs_ref.shape[2]

            def extract(ref, k):
                sel = (
                    jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_ch), 2) == k
                ).astype(jnp.float32)
                return jnp.sum(ref[...] * sel, axis=2, keepdims=True)

            def chunk_body(k, state):
                acc, c_prev = state
                if variant == "dotonly":
                    wt = jnp.ones((tm, cw, ot), jnp.int8)
                    c_last = c_prev
                else:
                    hi = extract(cdfs_ref, k)
                    c = (u_t[:, None, :] <= hi).astype(jnp.int8)
                    c_shift = jnp.concatenate([c_prev, c[:, :-1, :]], axis=1)
                    wt = jnp.bitwise_xor(c, c_shift)
                    c_last = c[:, cw - 1 : cw, :]
                if variant == "nodot":
                    acc = acc + jnp.pad(
                        jnp.sum(wt.astype(jnp.int32), axis=1, keepdims=True),
                        ((0, 0), (0, c4 - 1), (0, 0)),
                    )
                else:
                    acc = acc + jax.lax.dot_general(
                        xb_ref[:, :, pl.ds(k * cw, cw)],
                        wt,
                        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.int32,
                    )
                return acc, c_last

            acc = jnp.zeros((tm, c4, ot), jnp.int32)
            lo0 = extract(cdfps_ref, ks)[:, 0:1, :]
            c0 = (u_t[:, None, :] <= lo0).astype(jnp.int8)
            acc, _ = jax.lax.fori_loop(ks, ke, chunk_body, (acc, c0))
            out_ref[:, :, pl.ds(t * ot, ot)] = acc
            return 0

        jax.lax.fori_loop(0, n_tiles, tile_body, 0)

    return _kernel


@functools.partial(jax.jit, static_argnames=("variant", "tm", "ot", "cw"))
def walk_variant(u, weights, xs, variant, tm=4, ot=256, cw=128):
    m, n = u.shape
    c = xs.shape[1]
    c_pad = -(-c // 8) * 8
    xs_p = jnp.pad(xs, ((0, 0), (0, c_pad - c), (0, 0))) if c_pad != c else xs
    xb = _to_byte_planes(xs_p)
    cdf = jnp.cumsum(weights, axis=-1)
    cdf = cdf / cdf[..., -1:]
    cdf = cdf.at[..., -1].set(jnp.float32(1.0) + 1e-6)
    cdf_prev = jnp.pad(cdf[..., :-1], ((0, 0), (1, 0)), constant_values=-1.0)
    n_groups, n_tiles, n_chunks = m // tm, n // ot, n // cw
    cdf_sub = jnp.swapaxes(cdf.reshape(m, n_chunks, cw), 1, 2)
    cdfp_sub = jnp.swapaxes(cdf_prev.reshape(m, n_chunks, cw), 1, 2)
    chunk_ends = cdf[:, cw - 1 :: cw]
    u_first = u[:, ::ot]
    u_last = u[:, ot - 1 :: ot]
    k_start = jnp.minimum(jnp.sum(
        chunk_ends[:, :, None] < u_first[:, None, :], axis=1, dtype=jnp.int32
    ), n_chunks - 1)
    k_last = jnp.minimum(jnp.sum(
        chunk_ends[:, :, None] < u_last[:, None, :], axis=1, dtype=jnp.int32
    ), n_chunks - 1)
    gks = k_start.reshape(n_groups, tm, n_tiles).min(axis=1)
    gke = k_last.reshape(n_groups, tm, n_tiles).max(axis=1) + 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((tm, 1, n), lambda g, ks, ke: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, cw, n_chunks), lambda g, ks, ke: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, cw, n_chunks), lambda g, ks, ke: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 4 * c_pad, n), lambda g, ks, ke: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, 4 * c_pad, n), lambda g, ks, ke: (g, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        make_kernel(variant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, 4 * c_pad, n), jnp.int32),
    )(gks.reshape(-1), gke.reshape(-1), u[:, None, :], cdf_sub, cdfp_sub, xb)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=512)
    p.add_argument("--n", type=int, default=8192)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--tm", type=int, default=4)
    p.add_argument("--ot", type=int, default=256)
    args = p.parse_args()
    m, n = args.m, args.n

    xs = jax.random.normal(jax.random.key(1), (m, 3, n), jnp.float32)
    logw = jax.random.normal(jax.random.key(2), (m, n)) * 0.3
    w = jnp.exp(logw - logw.max(axis=-1, keepdims=True))

    for variant in ("full", "nodot", "dotonly"):
        @jax.jit
        def chain(key, w, variant=variant):
            def body(carry, k):
                w = carry
                u = systematic_uniforms(k, m, n, dtype=w.dtype)
                out = walk_variant(u, w, xs, variant, tm=args.tm, ot=args.ot)
                w2 = jnp.abs(out[:, 0, :]).astype(jnp.float32) + 1.0
                w2 = w2 / jnp.sum(w2, axis=-1, keepdims=True)
                return w2, None
            keys = jax.random.split(key, args.iters)
            w, _ = jax.lax.scan(body, w, keys)
            return w

        def run_once(k):
            out = chain(k, w)
            return float(jnp.sum(out[0, :8]))

        run_once(jax.random.key(3))
        t0 = time.perf_counter()
        run_once(jax.random.key(4))
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{variant}: {dt:.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()
