"""Pallas TPU kernel: fused systematic/stratified resample + ancestor gather.

Measured on TPU v5e, the XLA path for the inner-PF resampling step —
``cumsum`` → vmapped ``searchsorted`` (binary search with dynamic-slice
gathers) → ``jnp.take`` ancestor gather — costs ~63 ms per (M=512, N=1024)
filter step, 97% of the whole step (propagate+reweight is 1.8 ms). Dynamic
gathers are the one primitive TPUs hate (SURVEY.md §7 hard part (c)).

This kernel eliminates both the search and the gather by computing the
resampled cloud as a matmul against an implicit selection matrix:

  W[i, j] = 1{ cdf_{j-1} ≤ u_i < cdf_j }        (u sorted ⇒ W is banded)
  x'[c, i] = Σ_j x[c, j] · W[i, j]

For sorted uniforms (systematic: u_i = (i+u0)/N; stratified likewise) W is
exactly the ancestor one-hot matrix, so x' = x[ancestors] *bitwise exactly*
(0/1 coefficients select f32 values without rounding). W tiles are built
on-the-fly in VMEM from two broadcast compares and consumed immediately by
the MXU — never materialized in HBM. Per (M,N)=(512,1024) step this is
~8.6 GFLOP of 8×128×1024 matmuls + ~2G VPU compare-ops ≈ 1-2 ms, a ~40×
speedup of the resampling stage.

Layout: the particle cloud rides as (M, C, N) — components in sublanes,
particles in lanes — with C padded to 8. The CDF is additionally fed in a
(M, N, 1) sublane layout so each j-tile loads as a (128, 1) column without
an in-kernel transpose.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_JT = 128  # j-tile (input-particle tile) size


def _kernel(u_ref, cdf_ref, cdfp_ref, xs_ref, out_ref, acc_ref):
    # Blocks carry TM θ-rows per grid step (grid overhead ~3 µs/step on v5e
    # dominates the per-row compute, so batching rows is the win).
    @pl.when(pl.program_id(1) == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    u = u_ref[:, 0, :]  # (TM, N) lanes
    lo = cdfp_ref[:, :, 0]  # (TM, JT) sublanes: cdf_{j-1}
    hi = cdf_ref[:, :, 0]  # (TM, JT) sublanes: cdf_j
    # W^T tiles: (TM, JT_j, N_i) — banded 0/1 selection coefficients.
    # Buckets are (cdf_{j-1}, cdf_j], matching searchsorted(side="left") tie
    # behavior so results are bitwise-equal to the XLA gather path.
    wt = (
        (u[:, None, :] > lo[:, :, None]) & (u[:, None, :] <= hi[:, :, None])
    ).astype(jnp.float32)
    x_tile = xs_ref[...]  # (TM, C, JT)
    # Precision.HIGHEST: the MXU's default f32 path truncates inputs to
    # bf16, which would corrupt the copied particle values; the 0/1
    # selection matrix must reproduce them bitwise.
    acc_ref[...] += jax.lax.dot_general(
        x_tile,
        wt,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _emit():
        out_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("interpret", "jt", "tm"))
def resample_gather(u, weights, xs, interpret: bool = False,
                    jt: int | None = None, tm: int | None = None):
    """Fused sorted-uniform resample + gather.

    Args:
      u: (M, N) SORTED uniforms in [0,1) (systematic/stratified grids).
      weights: (M, N) normalized linear weights.
      xs: (M, C, N) particle components (any C; padded to 8 internally).
      jt: j-tile size (input-particle tile); None → auto.
      tm: θ-rows per grid step; None → auto. Auto keeps the (tm, jt, N)
        selection block ≤ ~8 MB of VMEM while minimizing grid steps (grid
        overhead, not compute, dominates at small N).
    Returns:
      (M, C, N) resampled components, bitwise-equal to gather-by-ancestors.
    """
    m, n = u.shape
    if jt is None or tm is None:
        budget = (1 << 21) // n  # tm*jt elements so wt ≤ 8 MB f32
        if jt is None:
            jt = min(n, max(_JT, budget))
            while n % jt:
                jt //= 2
        if tm is None:
            tm = max(1, min(m, budget // jt))
            while m % tm:
                tm -= 1
    c = xs.shape[1]
    c_pad = -(-c // 8) * 8
    if c_pad != c:
        xs = jnp.pad(xs, ((0, 0), (0, c_pad - c), (0, 0)))

    cdf = jnp.cumsum(weights, axis=-1)
    cdf = cdf / cdf[..., -1:]
    # final bucket covers u → 1; first bucket's lower edge sits below u = 0
    # (u == 0 must land in bucket 0, as searchsorted-left does)
    cdf = cdf.at[..., -1].set(jnp.float32(1.0) + 1e-6)
    cdf_prev = jnp.pad(
        cdf[..., :-1], ((0, 0), (1, 0)), constant_values=-1.0
    )

    grid = (m // tm, n // jt)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, 1, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, jt, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, jt, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, c_pad, jt), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tm, c_pad, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, c_pad, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm, c_pad, n), jnp.float32)],
        interpret=interpret,
    )(u[:, None, :], cdf[..., None], cdf_prev[..., None], xs)
    return out[:, :c, :]


def _kernel_bytes(u_ref, cdf_ref, cdfp_ref, xb_ref, out_ref, acc_ref):
    """Byte-plane variant: the one-hot selection matmul runs on the MXU's
    int8 path instead of six f32 passes. The f32 cloud is pre-split into 4
    int8 byte planes (exact bit decomposition); selection by a 0/1 matrix
    copies each byte unchanged, so reassembling the planes reproduces the
    f32 values bitwise — at ~1/6 the MXU work of Precision.HIGHEST and 4×
    the output columns (better systolic-array utilization at small C)."""
    @pl.when(pl.program_id(1) == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    u = u_ref[:, 0, :]  # (TM, N)
    lo = cdfp_ref[:, :, 0]  # (TM, JT)
    hi = cdf_ref[:, :, 0]
    wt = (
        (u[:, None, :] > lo[:, :, None]) & (u[:, None, :] <= hi[:, :, None])
    ).astype(jnp.int8)
    acc_ref[...] += jax.lax.dot_general(
        xb_ref[...],  # (TM, 4C, JT) int8
        wt,  # (TM, JT, N) int8
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _emit():
        acc = acc_ref[...]  # (TM, 4C, N) i32; each entry is a selected byte
        c = acc.shape[1] // 4
        # bytes may carry int8 sign — mask to [0, 255] before packing
        b0 = acc[:, 0 * c : 1 * c, :] & 0xFF
        b1 = acc[:, 1 * c : 2 * c, :] & 0xFF
        b2 = acc[:, 2 * c : 3 * c, :] & 0xFF
        b3 = acc[:, 3 * c : 4 * c, :] & 0xFF
        word = b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)
        out_ref[...] = jax.lax.bitcast_convert_type(word, jnp.float32)


def _to_byte_planes(xs):
    """(M, C, N) f32 → (M, 4C, N) int8: plane k holds bits [8k, 8k+8)."""
    bits = jax.lax.bitcast_convert_type(xs, jnp.uint32)
    planes = [((bits >> (8 * k)) & 0xFF).astype(jnp.uint8) for k in range(4)]
    stacked = jnp.concatenate(planes, axis=1)  # (M, 4C, N) u8
    return jax.lax.bitcast_convert_type(stacked, jnp.int8)


@functools.partial(jax.jit, static_argnames=("interpret", "jt", "tm"))
def resample_gather_bytes(u, weights, xs, interpret: bool = False,
                          jt: int | None = None, tm: int | None = None):
    """Fused sorted-uniform resample + gather via int8 byte-plane matmuls.

    Same contract and bitwise-exact results as :func:`resample_gather`;
    measured faster at large N where the MXU passes dominate (the f32 path
    needs Precision.HIGHEST = 6 passes; this runs one int8 pass over 4×
    the columns at 2× the rate).
    """
    m, n = u.shape
    if tm is None:
        # measured-best on v5e: the (tm, 4C, n) i32 accumulator is the VMEM
        # limiter — tm=16 at n=1024, tm=4 at n=8192 compile and win
        tm = max(1, min(m, 16 if n <= 2048 else 4))
        while m % tm:
            tm -= 1
    if jt is None:
        jt = 256 if n % 256 == 0 else _JT
        while n % jt:
            jt //= 2
    c = xs.shape[1]
    c_pad = -(-c // 8) * 8
    if c_pad != c:
        xs = jnp.pad(xs, ((0, 0), (0, c_pad - c), (0, 0)))
    xb = _to_byte_planes(xs)  # (M, 4C, N) int8

    cdf = jnp.cumsum(weights, axis=-1)
    cdf = cdf / cdf[..., -1:]
    cdf = cdf.at[..., -1].set(jnp.float32(1.0) + 1e-6)
    cdf_prev = jnp.pad(
        cdf[..., :-1], ((0, 0), (1, 0)), constant_values=-1.0
    )

    grid = (m // tm, n // jt)
    out = pl.pallas_call(
        _kernel_bytes,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, 1, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, jt, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, jt, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 4 * c_pad, jt), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tm, c_pad, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, c_pad, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm, 4 * c_pad, n), jnp.int32)],
        interpret=interpret,
    )(u[:, None, :], cdf[..., None], cdf_prev[..., None], xb)
    return out[:, :c, :]


def systematic_uniforms(key, m, n, dtype=jnp.float32):
    """Per-θ systematic grids u_i = (i + u0)/n (one u0 per row)."""
    u0 = jax.random.uniform(key, (m, 1), dtype=dtype)
    i = jnp.arange(n, dtype=dtype)[None, :]
    return (i + u0) / n


def stratified_uniforms(key, m, n, dtype=jnp.float32):
    """Per-θ stratified grids u_i = (i + v_i)/n."""
    v = jax.random.uniform(key, (m, n), dtype=dtype)
    i = jnp.arange(n, dtype=dtype)[None, :]
    return (i + v) / n
