"""Pallas TPU kernel: chunk-walk resample + UC-SV propagate + reweight,
fused into ONE kernel.

Replaces ``ucsv_step_pallas.py`` (the first-generation mega-kernel, dense
f32 selection, measured slower than the two-kernel route) with the design
PERF_NOTES.md §"Mega-kernel pipelining" called for: the monotone chunk-walk
gather of ``resample_walk.py`` runs tile-by-tile, and each output tile is
propagated and reweighted IMMEDIATELY after its gather completes — the
propagate work rides the walk loop instead of a second kernel launch, so
the (M, 8, N) cloud makes exactly one HBM round trip per filter step
(byte-plane read in, propagated planar + logw out) and the gathered
intermediate never touches HBM.

Reference semantics: one ``bootstrap_filter!`` step of the UC-SV model for
all M θ-rows (particles.jl:107-129 × state_space_models.jl:233-247), with
systematic/stratified resampling (sorted uniforms) in place of the
reference's multinomial draw.

PRNG streams: seeded per θ-group — ``prng_seed(seed, group_offset + g)`` —
so a θ-sharded run (shard_map over the theta axis, ``group_offset`` = the
shard's first global group index) draws the same randoms as the unsharded
one when the local M stays a multiple of TM.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .resample_pallas import _to_byte_planes
from .ucsv_pallas import _normals

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


def _kernel(ks_ref, ke_ref, seed_ref, y_ref, gam_ref, u_ref, cdfs_ref,
            cdfps_ref, xb_ref, out_ref, logw_ref, z_ref):
    tm = u_ref.shape[0]
    n = u_ref.shape[2]
    cw = cdfs_ref.shape[1]
    c4 = xb_ref.shape[1]
    n_tiles = ks_ref.shape[0] // pl.num_programs(0)
    ot = n // n_tiles
    g = pl.program_id(0)

    # all propagation randomness drawn up front, per θ-group — one stream
    # per (seed, group_offset + g) — and staged through a VMEM scratch so
    # the tile loop can slice it with pl.ds (Mosaic lowers dynamic_slice on
    # refs but not on values; interpret mode additionally yields zero bits
    # for prng ops under a fori_loop, so the draws cannot move in-loop).
    pltpu.prng_seed(seed_ref[0], seed_ref[1] + g)
    z0_all, z1_all = _normals((tm, 1, n))
    z2_all, _ = _normals((tm, 1, n))
    z_ref[:, 0:1, :] = z0_all
    z_ref[:, 1:2, :] = z1_all
    z_ref[:, 2:3, :] = z2_all

    def tile_body(t, _):
        # ---- chunk-walk gather (≡ resample_walk._kernel) ----
        u_t = u_ref[:, 0, pl.ds(t * ot, ot)]  # (TM, OT)
        ks = ks_ref[g * n_tiles + t]
        ke = ke_ref[g * n_tiles + t]

        n_ch = cdfs_ref.shape[2]

        def extract(ref, k):
            sel = (
                jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_ch), 2) == k
            ).astype(jnp.float32)
            return jnp.sum(ref[...] * sel, axis=2, keepdims=True)

        # single-compare xor band mask — see resample_walk._kernel
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
        lo0 = extract(cdfps_ref, ks)[:, 0:1, :]
        c0 = (u_t[:, None, :] <= lo0).astype(jnp.int8)
        acc, _ = jax.lax.fori_loop(ks, ke, chunk_body, (acc, c0))

        c = c4 // 4
        b0 = acc[:, 0 * c : 1 * c, :] & 0xFF
        b1 = acc[:, 1 * c : 2 * c, :] & 0xFF
        b2 = acc[:, 2 * c : 3 * c, :] & 0xFF
        b3 = acc[:, 3 * c : 4 * c, :] & 0xFF
        word = b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)
        gathered = jax.lax.bitcast_convert_type(word, jnp.float32)

        # ---- UC-SV propagate + reweight on the fresh tile ----
        x = gathered[:, 0:1, :]  # (TM, 1, OT)
        lse = gathered[:, 1:2, :]
        lsn = gathered[:, 2:3, :]
        ge = jax.lax.broadcast_in_dim(gam_ref[:, 0, 0:1], (tm, 1, ot), (0, 1))
        gn = jax.lax.broadcast_in_dim(gam_ref[:, 0, 1:2], (tm, 1, ot), (0, 1))
        y = y_ref[0]

        z0 = z_ref[:, 0:1, pl.ds(t * ot, ot)]
        z1 = z_ref[:, 1:2, pl.ds(t * ot, ot)]
        z2 = z_ref[:, 2:3, pl.ds(t * ot, ot)]
        x_new = x + jnp.exp(0.5 * lse) * z0
        lse_new = lse + ge * z1
        lsn_new = lsn + gn * z2
        s_inv = jnp.exp(-0.5 * lsn_new)
        zz = (y - x_new) * s_inv
        logw = -0.5 * zz * zz - 0.5 * lsn_new - _HALF_LOG_2PI

        out_ref[:, :, pl.ds(t * ot, ot)] = jnp.concatenate(
            [x_new, lse_new, lsn_new, gathered[:, 3:, :]], axis=1
        )
        logw_ref[:, :, pl.ds(t * ot, ot)] = logw
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)


@functools.partial(
    jax.jit, static_argnames=("tm", "ot", "cw", "interpret")
)
def ucsv_walk_step(seed, y, gammas, u, weights, planar,
                   tm: int | None = None, ot: int = 256, cw: int = 128,
                   tile_offset=0, interpret: bool = False):
    """One fused UC-SV filter step (resample+propagate+reweight).

    Args:
      seed: int32 scalar PRNG seed for this step.
      y: scalar observation.
      gammas: (M, 2) per-θ (γε, γη) std devs.
      u: (M, N) SORTED uniforms (systematic/stratified grid).
      weights: (M, N) non-negative linear weights (need not be normalized).
      planar: (M, 8, N) f32 cloud, rows 0..2 = (x, log σε, log ση).
      tile_offset: int32 added to the per-group PRNG stream index (sharding).
    Returns:
      (new_planar (M, 8, N), logw (M, N) raw observation log-weights).
    """
    m, n = u.shape
    if ot == 256 and n % 512 == 0 and n >= 4096:
        # large-N tiling per the resample_walk sweep (2026-08-19): tm=4
        # halves VMEM per group (the (TM, 1, N) blocks pad sublanes 1→8, so
        # tm=8 at N=8192 overflows the 16 MB scoped-VMEM limit) and tightens
        # the group-shared chunk bounds
        ot = 512
        if tm is None:
            tm = 4
    if tm is None:
        tm = 8
    while m % tm:
        tm -= 1
    if n % ot or n % cw or m % tm or n < 2 * cw:
        raise ValueError(
            f"ucsv_walk_step needs ot|N, cw|N, tm|M, N≥2·cw; got "
            f"M={m} N={n} tm={tm} ot={ot} cw={cw}"
        )
    xb = _to_byte_planes(planar)  # (M, 32, N) int8

    cdf = jnp.cumsum(weights, axis=-1)
    cdf = cdf / cdf[..., -1:]
    cdf = cdf.at[..., -1].set(jnp.float32(1.0) + 1e-6)
    cdf_prev = jnp.pad(cdf[..., :-1], ((0, 0), (1, 0)), constant_values=-1.0)

    n_groups = m // tm
    n_tiles = n // ot
    n_chunks = n // cw

    cdf_sub = jnp.swapaxes(cdf.reshape(m, n_chunks, cw), 1, 2)
    cdfp_sub = jnp.swapaxes(cdf_prev.reshape(m, n_chunks, cw), 1, 2)

    chunk_ends = cdf[:, cw - 1 :: cw]  # (M, n_chunks)
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
    gke = k_last.reshape(n_groups, tm, n_tiles).max(axis=1) + 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # gks, gke (flat)
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # [seed, tile_offset]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # y (1,)
            pl.BlockSpec((tm, 1, 2), lambda g, ks, ke: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1, n), lambda g, ks, ke: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, cw, n_chunks), lambda g, ks, ke: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, cw, n_chunks), lambda g, ks, ke: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 32, n), lambda g, ks, ke: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, 8, n), lambda g, ks, ke: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1, n), lambda g, ks, ke: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((tm, 3, n), jnp.float32)],
    )
    out, logw = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((m, 8, n), jnp.float32),
            jax.ShapeDtypeStruct((m, 1, n), jnp.float32),
        ],
        interpret=interpret,
    )(
        gks.reshape(-1),
        gke.reshape(-1),
        jnp.stack([jnp.asarray(seed, jnp.int32),
                   jnp.asarray(tile_offset, jnp.int32)]),
        jnp.asarray([y], dtype=jnp.float32).reshape(1),
        jnp.asarray(gammas, dtype=jnp.float32)[:, None, :],
        u[:, None, :],
        cdf_sub,
        cdfp_sub,
        xb,
    )
    return out, logw[:, 0, :]
