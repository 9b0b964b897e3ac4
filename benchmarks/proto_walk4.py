"""Prototype: 4th-gen chunk-walk resample kernel ("free-slice walk").

Hypothesis (PERF_NOTES.md round-2 sweep): the v3 walk kernel is per-visit
overhead-bound (~0.83 us/visit), and the biggest per-visit items are the
one-hot lane extraction of the CDF chunk (a full sweep over the transposed
CDF) plus the sublane shift/concat carry bookkeeping of the xor mask.

v4 removes both:
  * cdf / cdf_prev ride FLAT on lanes; chunk k is a free dynamic lane slice
    at a provably 128-multiple offset (pl.ds(k*CW, CW)) — zero extraction.
  * u rides host-transposed as (M, OT, n_tiles): the tile's uniforms land
    on SUBLANES, extracted once per tile by a one-hot over n_tiles lanes
    (amortized over the tile's chunk visits).
  * the band mask is two broadcast compares (u > cdf_prev) & (u <= cdf)
    oriented (TM, OT, CW) — no carry, no shift, no concat.
  * the gather matmul contracts both operands' LANE dims (NT layout):
    (TM, 4C, CW) . (TM, OT, CW) -> (TM, 4C, OT).

Run:  python benchmarks/proto_walk4.py [--m 512] [--n 8192] [--iters 50]
"""
from __future__ import annotations

import argparse
import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sequential_monte_carlo_tpu.kernels.resample_pallas import (
    _to_byte_planes,
    systematic_uniforms,
)
from sequential_monte_carlo_tpu.kernels.resample_walk import (
    resample_gather_walk,
)


def _kernel_v4(ks_ref, ke_ref, ut_ref, cdf_ref, cdfp_ref, xb_ref, out_ref,
               *, cw: int):
    tm, ot, n_tiles = ut_ref.shape
    c4 = xb_ref.shape[1]
    g = pl.program_id(0)

    def tile_body(t, _):
        # tile's uniforms on sublanes: one-hot over the n_tiles lane axis
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_tiles), 2) == t
        ).astype(jnp.float32)
        u_t = jnp.sum(ut_ref[...] * sel, axis=2, keepdims=True)  # (TM, OT, 1)
        ks = ks_ref[g * n_tiles + t]
        ke = ke_ref[g * n_tiles + t]

        def chunk_body(k, acc):
            lo = cdfp_ref[:, :, pl.ds(k * cw, cw)]  # (TM, 1, CW)
            hi = cdf_ref[:, :, pl.ds(k * cw, cw)]
            band = ((u_t > lo) & (u_t <= hi)).astype(jnp.int8)  # (TM, OT, CW)
            return acc + jax.lax.dot_general(
                xb_ref[:, :, pl.ds(k * cw, cw)],  # (TM, 4C, CW)
                band,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )

        acc = jax.lax.fori_loop(
            ks, ke, chunk_body, jnp.zeros((tm, c4, ot), jnp.int32)
        )

        c = c4 // 4
        b0 = acc[:, 0 * c : 1 * c, :] & 0xFF
        b1 = acc[:, 1 * c : 2 * c, :] & 0xFF
        b2 = acc[:, 2 * c : 3 * c, :] & 0xFF
        b3 = acc[:, 3 * c : 4 * c, :] & 0xFF
        word = b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)
        out_ref[:, :, pl.ds(t * ot, ot)] = jax.lax.bitcast_convert_type(
            word, jnp.float32
        )
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)


@functools.partial(jax.jit, static_argnames=("tm", "ot", "cw", "interpret"))
def resample_gather_walk4(u, weights, xs, tm: int = 4, ot: int = 256,
                          cw: int = 128, interpret: bool = False):
    m, n = u.shape
    c = xs.shape[1]
    c_pad = -(-c // 8) * 8
    xs_p = jnp.pad(xs, ((0, 0), (0, c_pad - c), (0, 0))) if c_pad != c else xs
    xb = _to_byte_planes(xs_p)  # (M, 4C, N) int8

    cdf = jnp.cumsum(weights, axis=-1)
    cdf = cdf / cdf[..., -1:]
    cdf = cdf.at[..., -1].set(jnp.float32(1.0) + 1e-6)
    cdf_prev = jnp.pad(cdf[..., :-1], ((0, 0), (1, 0)), constant_values=-1.0)

    n_groups = m // tm
    n_tiles = n // ot
    n_chunks = n // cw

    # per-(row, tile) chunk bounds — identical host prep to v3
    chunk_ends = cdf[:, cw - 1 :: cw]  # (M, n_chunks)
    u_first = u[:, ::ot]  # (M, n_tiles)
    u_last = u[:, ot - 1 :: ot]
    k_start = jnp.sum(
        chunk_ends[:, :, None] < u_first[:, None, :], axis=1, dtype=jnp.int32
    )
    k_last = jnp.sum(
        chunk_ends[:, :, None] < u_last[:, None, :], axis=1, dtype=jnp.int32
    )
    k_start = jnp.minimum(k_start, n_chunks - 1)
    k_last = jnp.minimum(k_last, n_chunks - 1)
    gks = k_start.reshape(n_groups, tm, n_tiles).min(axis=1)
    gke = (k_last.reshape(n_groups, tm, n_tiles).max(axis=1) + 1)

    # host-transposed u: (M, OT, n_tiles); tile t's uniforms on sublanes
    u_t = jnp.swapaxes(u.reshape(m, n_tiles, ot), 1, 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((tm, ot, n_tiles), lambda g, ks, ke: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1, n), lambda g, ks, ke: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1, n), lambda g, ks, ke: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 4 * c_pad, n), lambda g, ks, ke: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, c_pad, n), lambda g, ks, ke: (g, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_v4, cw=cw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, c_pad, n), jnp.float32),
        interpret=interpret,
    )(
        gks.reshape(-1),
        gke.reshape(-1),
        u_t,
        cdf[:, None, :],
        cdf_prev[:, None, :],
        xb,
    )
    return out[:, :c, :]


def time_fn(fn, m, n, c, iters, **kw):
    xs = jax.random.normal(jax.random.key(1), (m, c, n), jnp.float32)
    logw = jax.random.normal(jax.random.key(2), (m, n)) * 0.3
    w = jnp.exp(logw - logw.max(axis=-1, keepdims=True))

    @jax.jit
    def chain(key, xs, w):
        def body(carry, k):
            xs, w = carry
            u = systematic_uniforms(k, m, n, dtype=w.dtype)
            out = fn(u, w, xs, **kw)
            w2 = jnp.abs(out[:, 0, :])
            w2 = w2 / jnp.sum(w2, axis=-1, keepdims=True)
            return (out, w2), None

        keys = jax.random.split(key, iters)
        (xs, w), _ = jax.lax.scan(body, (xs, w), keys)
        return xs, w

    def run_once(k):
        out = chain(k, xs, w)
        return float(jnp.sum(out[0][0, 0, :8]))

    run_once(jax.random.key(0))
    t0 = time.perf_counter()
    run_once(jax.random.key(3))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=512)
    p.add_argument("--n", type=int, default=8192)
    p.add_argument("--c", type=int, default=3)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--tms", type=int, nargs="*", default=[4])
    p.add_argument("--ots", type=int, nargs="*", default=[256, 512])
    p.add_argument("--skip-check", action="store_true")
    args = p.parse_args()
    m, n, c = args.m, args.n, args.c

    if not args.skip_check:
        # correctness vs the v3 champion (bitwise)
        import numpy as np

        xs = jax.random.normal(jax.random.key(1), (m, c, n), jnp.float32)
        logw = jax.random.normal(jax.random.key(2), (m, n)) * 2.0
        w = jnp.exp(logw - logw.max(axis=-1, keepdims=True))
        u = systematic_uniforms(jax.random.key(0), m, n, dtype=w.dtype)
        ref = np.asarray(resample_gather_walk(u, w, xs))
        got = np.asarray(resample_gather_walk4(u, w, xs, tm=4, ot=256))
        assert (ref == got).all(), (
            f"MISMATCH: {np.mean(ref != got):.4%} elements differ"
        )
        print("bitwise check vs v3: OK", flush=True)

    ms3 = time_fn(resample_gather_walk, m, n, c, args.iters)
    print(f"v3 champion: {ms3:.3f} ms/call", flush=True)
    for tm in args.tms:
        for ot in args.ots:
            try:
                ms = time_fn(resample_gather_walk4, m, n, c, args.iters,
                             tm=tm, ot=ot)
                print(f"v4 tm={tm} ot={ot}: {ms:.3f} ms/call", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"v4 tm={tm} ot={ot}: FAIL {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()


# ---------------------------------------------------------------------------
# v5: telescoping (Abel-summation) walk — ONE compare per chunk, no band mask.
#
#   ancestor gather = x[ks*CW] + sum_{j >= ks*CW} (x[j+1] - x[j]) * d_j,
#   d_j = (u > cdf_j)  (monotone decreasing in j; 0 past the walked window;
#   the prefix j < ks*CW telescopes into the x[ks*CW] base term).
#
# Exact in integer byte-plane arithmetic: each plane accumulates
# b[ks*CW] + sum (b[j+1]-b[j]) d_j = b[ancestor] in Z, final value in
# [0, 255]. The shifted and unshifted byte clouds stack on sublanes so the
# difference rides ONE (TM, 8C, CW) . (TM, OT, CW) dot (2x the MXU row
# utilization of v4), split and subtracted in int32 after the matmul.
# ---------------------------------------------------------------------------


def _kernel_v5(ks_ref, ke_ref, ut_ref, cdf_ref, xb2_ref, out_ref, *, cw: int):
    tm, ot, n_tiles = ut_ref.shape
    c8 = xb2_ref.shape[1]  # 8C: [shifted planes; unshifted planes]
    c4 = c8 // 2
    g = pl.program_id(0)

    def tile_body(t, _):
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_tiles), 2) == t
        ).astype(jnp.float32)
        u_t = jnp.sum(ut_ref[...] * sel, axis=2, keepdims=True)  # (TM, OT, 1)
        ks = ks_ref[g * n_tiles + t]
        ke = ke_ref[g * n_tiles + t]

        # base: byte planes of x[ks*CW] (free 128-multiple dynamic lane slice)
        base = xb2_ref[:, c4:, pl.ds(ks * cw, 1)].astype(jnp.int32)

        def chunk_body(k, acc):
            hi = cdf_ref[:, :, pl.ds(k * cw, cw)]  # (TM, 1, CW)
            d = (u_t > hi).astype(jnp.int8)  # (TM, OT, CW)
            both = jax.lax.dot_general(
                xb2_ref[:, :, pl.ds(k * cw, cw)],  # (TM, 8C, CW)
                d,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )  # (TM, 8C, OT)
            return acc + both[:, :c4, :] - both[:, c4:, :]

        acc = jax.lax.fori_loop(
            ks, ke, chunk_body, jnp.broadcast_to(base, (tm, c4, ot))
        )

        c = c4 // 4
        b0 = acc[:, 0 * c : 1 * c, :] & 0xFF
        b1 = acc[:, 1 * c : 2 * c, :] & 0xFF
        b2 = acc[:, 2 * c : 3 * c, :] & 0xFF
        b3 = acc[:, 3 * c : 4 * c, :] & 0xFF
        word = b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)
        out_ref[:, :, pl.ds(t * ot, ot)] = jax.lax.bitcast_convert_type(
            word, jnp.float32
        )
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)


@functools.partial(jax.jit, static_argnames=("tm", "ot", "cw", "interpret"))
def resample_gather_walk5(u, weights, xs, tm: int = 8, ot: int = 256,
                          cw: int = 256, interpret: bool = False):
    m, n = u.shape
    c = xs.shape[1]
    c_pad = -(-c // 8) * 8
    xs_p = jnp.pad(xs, ((0, 0), (0, c_pad - c), (0, 0))) if c_pad != c else xs
    xb = _to_byte_planes(xs_p)  # (M, 4C, N) int8
    # shifted-left cloud: xbs[..., j] = xb[..., j+1]; tail never contributes
    # (d_{N-1} = (u > 1+eps) = 0)
    xbs = jnp.concatenate([xb[:, :, 1:], xb[:, :, -1:]], axis=2)
    xb2 = jnp.concatenate([xbs, xb], axis=1)  # (M, 8C, N)

    cdf = jnp.cumsum(weights, axis=-1)
    cdf = cdf / cdf[..., -1:]
    cdf = cdf.at[..., -1].set(jnp.float32(1.0) + 1e-6)

    n_groups = m // tm
    n_tiles = n // ot
    n_chunks = n // cw

    chunk_ends = cdf[:, cw - 1 :: cw]
    u_first = u[:, ::ot]
    u_last = u[:, ot - 1 :: ot]
    k_start = jnp.sum(
        chunk_ends[:, :, None] < u_first[:, None, :], axis=1, dtype=jnp.int32
    )
    k_last = jnp.sum(
        chunk_ends[:, :, None] < u_last[:, None, :], axis=1, dtype=jnp.int32
    )
    k_start = jnp.minimum(k_start, n_chunks - 1)
    k_last = jnp.minimum(k_last, n_chunks - 1)
    gks = k_start.reshape(n_groups, tm, n_tiles).min(axis=1)
    gke = (k_last.reshape(n_groups, tm, n_tiles).max(axis=1) + 1)

    u_t = jnp.swapaxes(u.reshape(m, n_tiles, ot), 1, 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((tm, ot, n_tiles), lambda g, ks, ke: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1, n), lambda g, ks, ke: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 8 * c_pad, n), lambda g, ks, ke: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, c_pad, n), lambda g, ks, ke: (g, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_v5, cw=cw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, c_pad, n), jnp.float32),
        interpret=interpret,
    )(
        gks.reshape(-1),
        gke.reshape(-1),
        u_t,
        cdf[:, None, :],
        xb2,
    )
    return out[:, :c, :]


# ---------------------------------------------------------------------------
# v6: index-walk + hardware dynamic gather.
#
# Mosaic lowers 2D jnp.take_along_axis(x, idx, axis=1) to tpu.dynamic_gather
# (per-sublane-row lane gather). So: compute ancestor INDICES by the chunk
# walk — a[i] = #{j: cdf_j < u_i} = ks*CW + sum over walked chunks of
# (u_i > cdf_j) — one compare + one int8 add per visit, NO matmuls and NO
# byte planes — then gather the raw f32 cloud with the hardware shuffle.
# (int16 accumulator: Mosaic only vectorizes i16/i32 adds.)
# ---------------------------------------------------------------------------


def _kernel_v6(ks_ref, ke_ref, ut_ref, cdf_ref, x_ref, out_ref, a_ref,
               *, cw: int):
    tm, ot, n_tiles = ut_ref.shape
    n = cdf_ref.shape[2]
    cp = x_ref.shape[1]
    g = pl.program_id(0)

    def tile_body(t, _):
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_tiles), 2) == t
        ).astype(jnp.float32)
        u_t = jnp.sum(ut_ref[...] * sel, axis=2, keepdims=True)  # (TM, OT, 1)
        ks = ks_ref[g * n_tiles + t]
        ke = ke_ref[g * n_tiles + t]

        def chunk_body(k, acc):
            hi = cdf_ref[:, :, pl.ds(k * cw, cw)]  # (TM, 1, CW)
            # Mosaic vectorizes only i16/i32 adds (no i8)
            return acc + (u_t > hi).astype(jnp.int16)

        acc = jax.lax.fori_loop(
            ks, ke, chunk_body, jnp.zeros((tm, ot, cw), jnp.int16)
        )
        cnt = jnp.sum(acc.astype(jnp.int32), axis=2)  # (TM, OT)
        a_ref[:, pl.ds(t * ot, ot)] = cnt + ks * cw
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)

    idx = jnp.broadcast_to(a_ref[...][:, None, :], (tm, cp, n))
    out_ref[...] = jnp.take_along_axis(
        x_ref[...].reshape(tm * cp, n), idx.reshape(tm * cp, n), axis=1
    ).reshape(tm, cp, n)


@functools.partial(jax.jit, static_argnames=("tm", "ot", "cw", "interpret"))
def resample_gather_walk6(u, weights, xs, tm: int = 8, ot: int = 256,
                          cw: int = 256, interpret: bool = False):
    m, n = u.shape
    c = xs.shape[1]
    c_pad = -(-c // 8) * 8
    xs_p = jnp.pad(xs, ((0, 0), (0, c_pad - c), (0, 0))) if c_pad != c else xs

    cdf = jnp.cumsum(weights, axis=-1)
    cdf = cdf / cdf[..., -1:]
    cdf = cdf.at[..., -1].set(jnp.float32(1.0) + 1e-6)

    n_groups = m // tm
    n_tiles = n // ot
    n_chunks = n // cw

    chunk_ends = cdf[:, cw - 1 :: cw]
    u_first = u[:, ::ot]
    u_last = u[:, ot - 1 :: ot]
    k_start = jnp.sum(
        chunk_ends[:, :, None] < u_first[:, None, :], axis=1, dtype=jnp.int32
    )
    k_last = jnp.sum(
        chunk_ends[:, :, None] < u_last[:, None, :], axis=1, dtype=jnp.int32
    )
    k_start = jnp.minimum(k_start, n_chunks - 1)
    k_last = jnp.minimum(k_last, n_chunks - 1)
    gks = k_start.reshape(n_groups, tm, n_tiles).min(axis=1)
    gke = (k_last.reshape(n_groups, tm, n_tiles).max(axis=1) + 1)

    u_t = jnp.swapaxes(u.reshape(m, n_tiles, ot), 1, 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((tm, ot, n_tiles), lambda g, ks, ke: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1, n), lambda g, ks, ke: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, c_pad, n), lambda g, ks, ke: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, c_pad, n), lambda g, ks, ke: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tm, n), jnp.int32)],
    )
    out = pl.pallas_call(
        functools.partial(_kernel_v6, cw=cw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, c_pad, n), jnp.float32),
        interpret=interpret,
    )(
        gks.reshape(-1),
        gke.reshape(-1),
        u_t,
        cdf[:, None, :],
        xs_p,
    )
    return out[:, :c, :]


# ---------------------------------------------------------------------------
# v7: v4 + in-kernel systematic uniforms.
#
# For systematic resampling u_i = (i + u0)/N is an affine grid: the kernel
# rebuilds each tile's uniforms from a per-row SCALAR u0 via iota
# (i = t*OT + local is integer-exact in f32 for N <= 2^24; the add and the
# IEEE division match systematic_uniforms bit-for-bit). Kills the u array
# input, the host transpose, AND the per-tile one-hot extraction sweep.
# ---------------------------------------------------------------------------


def _kernel_v7(ks_ref, ke_ref, u0_ref, cdf_ref, cdfp_ref, xb_ref, out_ref,
               *, cw: int, ot: int, n: int):
    tm = u0_ref.shape[0]
    c4 = xb_ref.shape[1]
    n_tiles = n // ot
    g = pl.program_id(0)

    iota = jax.lax.broadcasted_iota(jnp.int32, (1, ot, 1), 1)
    u0 = u0_ref[...]  # (TM, 1, 1)

    def tile_body(t, _):
        i_f = (iota + t * ot).astype(jnp.float32)
        u_t = (i_f + u0) / jnp.float32(n)  # (TM, OT, 1)
        ks = ks_ref[g * n_tiles + t]
        ke = ke_ref[g * n_tiles + t]

        def chunk_body(k, acc):
            lo = cdfp_ref[:, :, pl.ds(k * cw, cw)]  # (TM, 1, CW)
            hi = cdf_ref[:, :, pl.ds(k * cw, cw)]
            band = ((u_t > lo) & (u_t <= hi)).astype(jnp.int8)
            return acc + jax.lax.dot_general(
                xb_ref[:, :, pl.ds(k * cw, cw)],  # (TM, 4C, CW)
                band,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )

        acc = jax.lax.fori_loop(
            ks, ke, chunk_body, jnp.zeros((tm, c4, ot), jnp.int32)
        )

        c = c4 // 4
        b0 = acc[:, 0 * c : 1 * c, :] & 0xFF
        b1 = acc[:, 1 * c : 2 * c, :] & 0xFF
        b2 = acc[:, 2 * c : 3 * c, :] & 0xFF
        b3 = acc[:, 3 * c : 4 * c, :] & 0xFF
        word = b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)
        out_ref[:, :, pl.ds(t * ot, ot)] = jax.lax.bitcast_convert_type(
            word, jnp.float32
        )
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)


@functools.partial(jax.jit, static_argnames=("tm", "ot", "cw", "interpret"))
def resample_gather_walk7(u0, weights, xs, tm: int = 4, ot: int = 256,
                          cw: int = 128, interpret: bool = False):
    m, n = weights.shape
    c = xs.shape[1]
    c_pad = -(-c // 8) * 8
    xs_p = jnp.pad(xs, ((0, 0), (0, c_pad - c), (0, 0))) if c_pad != c else xs
    xb = _to_byte_planes(xs_p)  # (M, 4C, N) int8

    cdf = jnp.cumsum(weights, axis=-1)
    cdf = cdf / cdf[..., -1:]
    cdf = cdf.at[..., -1].set(jnp.float32(1.0) + 1e-6)
    cdf_prev = jnp.pad(cdf[..., :-1], ((0, 0), (1, 0)), constant_values=-1.0)

    n_groups = m // tm
    n_tiles = n // ot
    n_chunks = n // cw

    # chunk bounds from the affine grid directly — no u materialization
    t_idx = jnp.arange(n_tiles, dtype=jnp.float32) * ot
    u_first = (t_idx[None, :] + u0) / n  # (M, n_tiles)
    u_last = (t_idx[None, :] + (ot - 1) + u0) / n
    chunk_ends = cdf[:, cw - 1 :: cw]  # (M, n_chunks)
    k_start = jnp.sum(
        chunk_ends[:, :, None] < u_first[:, None, :], axis=1, dtype=jnp.int32
    )
    k_last = jnp.sum(
        chunk_ends[:, :, None] < u_last[:, None, :], axis=1, dtype=jnp.int32
    )
    k_start = jnp.minimum(k_start, n_chunks - 1)
    k_last = jnp.minimum(k_last, n_chunks - 1)
    gks = k_start.reshape(n_groups, tm, n_tiles).min(axis=1)
    gke = (k_last.reshape(n_groups, tm, n_tiles).max(axis=1) + 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((tm, 1, 1), lambda g, ks, ke: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1, n), lambda g, ks, ke: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1, n), lambda g, ks, ke: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 4 * c_pad, n), lambda g, ks, ke: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, c_pad, n), lambda g, ks, ke: (g, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_v7, cw=cw, ot=ot, n=n),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, c_pad, n), jnp.float32),
        interpret=interpret,
    )(
        gks.reshape(-1),
        gke.reshape(-1),
        u0[:, :, None],
        cdf[:, None, :],
        cdf_prev[:, None, :],
        xb,
    )
    return out[:, :c, :]


def time_fn_u0(fn, m, n, c, iters, **kw):
    """Timing harness for the u0-scalar entry points (v7/v8)."""
    xs = jax.random.normal(jax.random.key(1), (m, c, n), jnp.float32)
    logw = jax.random.normal(jax.random.key(2), (m, n)) * 0.3
    w = jnp.exp(logw - logw.max(axis=-1, keepdims=True))

    @jax.jit
    def chain(key, xs, w):
        def body(carry, k):
            xs, w = carry
            u0 = jax.random.uniform(k, (m, 1), jnp.float32)
            out = fn(u0, w, xs, **kw)
            w2 = jnp.abs(out[:, 0, :])
            w2 = w2 / jnp.sum(w2, axis=-1, keepdims=True)
            return (out, w2), None

        keys = jax.random.split(key, iters)
        (xs, w), _ = jax.lax.scan(body, (xs, w), keys)
        return xs, w

    def run_once(k):
        out = chain(k, xs, w)
        return float(jnp.sum(out[0][0, 0, :8]))

    run_once(jax.random.key(0))
    t0 = time.perf_counter()
    run_once(jax.random.key(3))
    return (time.perf_counter() - t0) / iters * 1e3
