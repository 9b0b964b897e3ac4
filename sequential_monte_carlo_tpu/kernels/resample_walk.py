"""Pallas TPU kernel: monotone chunk-walk fused resample + gather.

Third-generation resample kernel (after ``resample_pallas.resample_gather``
/ ``resample_gather_bytes`` — dense N² selection — and
``resample_banded.resample_gather_banded`` — windowed, with fallback).
Replaces both at every size. Reference semantics: the ancestor-gather of
particles.jl:117-119 for sorted uniforms, bitwise-equal to
searchsorted(side="left") + take.

Why the previous kernels plateaued (measured, v5e, M=512 N=8192):
dense-bytes ≈ 58 ms is VPU-bound on the N² compare-mask build; banded cut
the compares 8× but measured ≈ 56 ms anyway — its (θ-group, output-tile)
grid runs 4096 steps of ~13 µs dominated by per-step windowed DMAs, and its
sublane-major ``(tm, win, 1)`` CDF blocks pad the lane axis 128×, while the
host-side per-tile ``searchsorted`` prep cost another ~30 ms.

This kernel exploits the same sortedness globally instead of per-tile:

  * the grid is just ``(M/TM,)`` — each step holds TM whole rows in VMEM
    (cloud byte-planes, CDF, uniforms, output; ~1.3 MB/row at N=8192);
  * ancestors of consecutive output tiles are non-decreasing, so one
    monotone pointer walks the CDF in CW-wide chunks as an inner
    ``fori_loop`` over output tiles with per-tile dynamic chunk bounds
    (scalar-prefetched; computed host-side by a vectorized compare-sum —
    no ``searchsorted``, no binary-search gathers);
  * per (tile, chunk): a (TM, CW, OT) int8 one-hot mask + one int8 MXU
    matmul against the byte-plane cloud (bitwise-exact f32 reassembly,
    same trick as ``resample_gather_bytes``);
  * the CDF rides in a lane-transposed (TM, CW, N/CW) layout so a chunk is
    one width-1 lane slice — sublane-major without the 128× lane padding.

Total mask/matmul work per row is bounded by (N/CW + N/OT + spread) · CW·OT
≈ 2·N·OT — independent of the weight distribution (the pointer only moves
forward), so there is NO fallback path and NO coverage predicate: the
kernel is exact for any weights, including fully degenerate ones.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .resample_pallas import _to_byte_planes, resample_gather_bytes


def _kernel(ks_ref, ke_ref, u_ref, cdfs_ref, cdfps_ref, xb_ref, out_ref):
    tm = u_ref.shape[0]
    n = u_ref.shape[2]
    cw = cdfs_ref.shape[1]
    c4 = xb_ref.shape[1]
    n_tiles = ks_ref.shape[0] // pl.num_programs(0)
    ot = n // n_tiles
    g = pl.program_id(0)

    def tile_body(t, _):
        u_t = u_ref[:, 0, pl.ds(t * ot, ot)]  # (TM, OT)
        ks = ks_ref[g * n_tiles + t]
        ke = ke_ref[g * n_tiles + t]
        n_ch = cdfs_ref.shape[2]

        def extract(ref, k):
            # chunk k = lane k of the transposed CDF; Mosaic only allows
            # 128-multiple dynamic lane offsets, so extract the width-1
            # column by one-hot multiply + lane reduction instead
            sel = (
                jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_ch), 2) == k
            ).astype(jnp.float32)
            return jnp.sum(ref[...] * sel, axis=2, keepdims=True)

        # the band mask (u > cdf[j-1]) & (u ≤ cdf[j]) needs only ONE compare
        # per chunk: with c_j = (u ≤ cdf[j]) int8 and cdf monotone,
        # c_{j-1} ≤ c_j elementwise, so the mask is c_j XOR c_{j-1}
        # (≡ c_j − c_{j-1} for 0/1; Mosaic legalizes xori but not subi on
        # int8 vectors), where the j−1 term is c shifted one particle down
        # the sublane axis with a carry row crossing chunk boundaries
        # (chunks walk contiguously). Halves both the compare volume and
        # the one-hot extractions vs the two-sided form.
        def chunk_body(k, state):
            acc, c_prev = state
            hi = extract(cdfs_ref, k)
            c = (u_t[:, None, :] <= hi).astype(jnp.int8)  # (TM, CW, OT)
            c_shift = jnp.concatenate([c_prev, c[:, :-1, :]], axis=1)
            acc = acc + jax.lax.dot_general(
                xb_ref[:, :, pl.ds(k * cw, cw)],  # (TM, 4C, CW) int8
                jnp.bitwise_xor(c, c_shift),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )
            return acc, c[:, cw - 1 : cw, :]

        acc = jnp.zeros((tm, c4, ot), jnp.int32)
        # carry-in for the first chunk: c_{-1} = (u ≤ cdf_prev[ks·CW]) —
        # one extraction of the transposed prev-CDF's first sublane row
        lo0 = extract(cdfps_ref, ks)[:, 0:1, :]
        c0 = (u_t[:, None, :] <= lo0).astype(jnp.int8)
        acc, _ = jax.lax.fori_loop(ks, ke, chunk_body, (acc, c0))

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
def resample_gather_walk(u, weights, xs, tm: int | None = None,
                         ot: int = 256, cw: int = 128,
                         interpret: bool = False):
    """Fused sorted-uniform resample + ancestor gather, chunk-walk kernel.

    Args:
      u:       (M, N) SORTED uniforms in [0, 1) per row (systematic /
               stratified grids — ``systematic_uniforms``).
      weights: (M, N) non-negative, need not be normalized.
      xs:      (M, C, N) f32 particle cloud, components in sublanes.
      tm:      θ-rows per grid step (VMEM-bound; default by N).
      ot:      output-tile width (lane multiple).
      cw:      CDF chunk width (lane multiple).

    Returns (M, C, N) f32: ``xs`` gathered by the systematic ancestors —
    bitwise-equal to searchsorted(cdf, u, side="left") + take, the same tie
    semantics as ``resample_gather`` / ``resample_gather_bytes``.
    """
    m, n = u.shape
    if tm is None and n >= 4096:
        # swept on v5e (2026-08-19, host-fetch-synced, xor-mask kernel): at
        # N=8192 (tm=4, ot=256, cw=128) = 8.49 ms is best; ot=512 within 1%,
        # ot=128 loses (13 ms), ot≥1024 loses, cw=256 loses at every ot,
        # tm=8 ≈ +1%
        tm = 4
    if tm is None:
        # small-N default (swept 2026-08-18): tm=8, ot=256, cw=128 is at or
        # within 3% of best at N=1024 (1.25 ms); tm=16 fails to compile at
        # large N (VMEM)
        tm = 8
    while m % tm:
        tm -= 1
    if n % ot or n % cw or m % tm or n < 2 * cw:
        return resample_gather_bytes(u, weights, xs, interpret=interpret)
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

    # lane-transposed CDF: (M, CW, N/CW); chunk k = lane k (width-1 slice)
    cdf_sub = jnp.swapaxes(cdf.reshape(m, n_chunks, cw), 1, 2)
    cdfp_sub = jnp.swapaxes(cdf_prev.reshape(m, n_chunks, cw), 1, 2)

    # per-(row, tile) chunk bounds by vectorized compare-sum (no
    # searchsorted): first chunk whose end-CDF covers the tile's first /
    # last uniform; ancestors are sorted so these bracket every output.
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
    # group-shared bounds: min start / max end over the TM rows
    gks = k_start.reshape(n_groups, tm, n_tiles).min(axis=1)
    gke = (k_last.reshape(n_groups, tm, n_tiles).max(axis=1) + 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # gks, gke (flat)
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
        out_specs=pl.BlockSpec((tm, c_pad, n), lambda g, ks, ke: (g, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, c_pad, n), jnp.float32),
        interpret=interpret,
    )(
        gks.reshape(-1),
        gke.reshape(-1),
        u[:, None, :],
        cdf_sub,
        cdfp_sub,
        xb,
    )
    return out[:, :c, :]
