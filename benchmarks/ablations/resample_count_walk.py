"""ABLATION (VERDICT r4 #3): count-driven systematic resample+gather walk.

The systematic grid u_o = (o + u0)/N makes offspring counts closed-form:

    count_j = ⌈N·cdf_j − u0⌉ − ⌈N·cdf_{j−1} − u0⌉

so input j's contiguous output span is [S_lo_j, S_hi_j) with
S_hi_j = ⌈N·cdf_j − u0⌉ and S_lo_j = S_hi_{j−1} — located WITHOUT
comparing uniforms against the CDF. Relative to the shipped gen-4 walk
(``kernels/resample_walk.py``) this formulation:

  * drops the (M, OT, n_tiles) transposed u-grid stream entirely (one
    less M·N f32 HBM write + VMEM read + the per-tile one-hot sublane
    extraction): the kernel compares the spans against a CONSTANT output
    iota built once per group, shifted per tile by a scalar subtract on
    the (SB, 1, CW) span chunks;
  * keeps the identical monotone chunk-walk control flow, scalar-
    prefetched per-(group, tile) chunk bounds, int8 byte-plane selection
    matmul, and f32 reassembly.

It is NOT bitwise-equal to gen-4: the count formulation's tie semantics
are #{j: cdf_j ≤ u_o} evaluated through f32 ⌈N·cdf − u0⌉, which can
disagree with searchsorted(cdf, u, "left") on f32 rounding boundaries
(measure-zero for random u0; both are exact draws of the systematic
scheme). The bitwise oracle for THIS kernel is the ceil-count ancestor
construction (``_count_ancestors`` below).

Status: see PERF_NOTES.md round 5 for the measured verdict vs gen-4.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sequential_monte_carlo_tpu.kernels.resample_pallas import _to_byte_planes


def _count_ancestors(u0, weights):
    """XLA oracle: ancestors by closed-form systematic counts.

    a_o = #{j : S_hi_j ≤ o},  S_hi_j = ⌈N·cdf_j − u0⌉ (last forced to N).
    Returns (M, N) int32 — the exact output of the count-walk kernel.
    """
    m, n = weights.shape
    cdf = jnp.cumsum(weights, axis=-1)
    cdf = cdf / cdf[..., -1:]
    s_hi = jnp.ceil(n * cdf - u0)
    s_hi = s_hi.at[..., -1].set(float(n))
    o = jnp.arange(n, dtype=s_hi.dtype)[None, :]
    # searchsorted(s_hi, o, side="right") per row == #{j: s_hi_j <= o}
    return jax.vmap(
        lambda s, oo: jnp.clip(
            jnp.searchsorted(s, oo, side="right"), 0, n - 1
        ).astype(jnp.int32)
    )(s_hi, o * jnp.ones((m, 1), s_hi.dtype))


def _kernel(ks_ref, ke_ref, slo_ref, shi_ref, xs_ref, out_ref, *, cw: int,
            ot: int):
    tm = slo_ref.shape[0]
    c4 = xs_ref.shape[1]
    c = c4 // 4
    n_tiles = out_ref.shape[2] // ot
    g = pl.program_id(0)

    # constant output iota, built ONCE per group: lane index within a tile.
    # MUST be integer — Mosaic's tpu.iota rejects float element types (the
    # round-3 float-iota lesson, re-learned here on first hardware compile)
    o_iota = jax.lax.broadcasted_iota(jnp.int32, (1, ot, 1), 1)

    def tile_body(t, _):
        base = t * ot
        ks = ks_ref[g * n_tiles + t]
        ke = ke_ref[g * n_tiles + t]

        def chunk_body(k, acc):
            # shift the span chunk by the tile's base instead of building a
            # per-tile global iota: two (TM, 1, CW) subtracts ≪ mask volume
            lo = slo_ref[:, :, pl.ds(k * cw, cw)] - base  # (TM, 1, CW) int32
            hi = shi_ref[:, :, pl.ds(k * cw, cw)] - base
            band = ((o_iota >= lo) & (o_iota < hi)).astype(jnp.int8)
            return acc + jax.lax.dot_general(
                xs_ref[:, :, pl.ds(k * cw, cw)],  # (TM, 4C, CW)
                band,  # (TM, OT, CW)
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )

        acc = jax.lax.fori_loop(
            ks, ke, chunk_body, jnp.zeros((tm, c4, ot), jnp.int32)
        )
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
def resample_gather_count_walk(u0, weights, xs, tm: int = 16, ot: int = 128,
                               cw: int = 128, interpret: bool = False):
    """Count-driven systematic resample+gather (ablation — see module doc).

    Args mirror ``resample_gather_walk``'s u0 route: ``u0`` (M, 1)
    systematic offsets, ``weights`` (M, N), ``xs`` (M, C, N) f32.
    Returns (M, C, N) f32 gathered by the ceil-count ancestors
    (bitwise ≡ ``_count_ancestors`` + take).
    """
    m, n = weights.shape
    if n % ot or n % cw or m % tm or n < 2 * cw:
        raise ValueError("ablation kernel: divisible shapes only")
    c = xs.shape[1]
    c_pad = -(-c // 4) * 4
    xs_p = jnp.pad(xs, ((0, 0), (0, c_pad - c), (0, 0))) if c_pad != c else xs
    xb = _to_byte_planes(xs_p)
    cdf = jnp.cumsum(weights, axis=-1)
    cdf = cdf / cdf[..., -1:]
    s_hi = jnp.ceil(n * cdf - u0)
    s_hi = s_hi.at[..., -1].set(jnp.float32(n))
    s_lo = jnp.pad(s_hi[..., :-1], ((0, 0), (1, 0)), constant_values=0.0)

    n_groups = m // tm
    n_tiles = n // ot
    n_chunks = n // cw

    # per-(row, tile) chunk bounds: first chunk whose END span covers the
    # tile's first output index / last chunk starting at or before the
    # tile's last output index — same vectorized compare-sum as gen-4,
    # but against integer output indices instead of uniforms
    chunk_ends = s_hi[:, cw - 1 :: cw]  # (M, n_chunks)
    o_first = (jnp.arange(n_tiles, dtype=s_hi.dtype) * ot)[None, :]
    o_last = o_first + (ot - 1)
    k_start = jnp.sum(
        chunk_ends[:, :, None] <= o_first[:, None, :], axis=1,
        dtype=jnp.int32,
    )
    k_last = jnp.sum(
        chunk_ends[:, :, None] <= o_last[:, None, :], axis=1, dtype=jnp.int32
    )
    k_start = jnp.minimum(k_start, n_chunks - 1)
    k_last = jnp.minimum(k_last, n_chunks - 1)
    gks = k_start.reshape(n_groups, tm, n_tiles).min(axis=1)
    gke = k_last.reshape(n_groups, tm, n_tiles).max(axis=1) + 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_groups,),
        in_specs=[
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
        functools.partial(_kernel, cw=cw, ot=ot),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, c_pad, n), jnp.float32),
        interpret=interpret,
    )(
        gks.reshape(-1),
        gke.reshape(-1),
        s_lo[:, None, :].astype(jnp.int32),
        s_hi[:, None, :].astype(jnp.int32),
        xb,
    )
    return out if c_pad == c else out[:, :c, :]
