"""Pallas TPU kernel: chunk-walk resample via in-kernel lane gather (gen 5).

Fifth-generation resample kernel (lineage: dense f32 selection →
byte-plane int8 selection → banded → lane-transposed walk → free-slice
walk, ``resample_walk.py``). Reference semantics: the ancestor gather of
/root/reference/src/particles.jl:117-119 for sorted uniforms — bitwise
equal to ``searchsorted(cdf, u, side="left") + take``.

Why a new generation (roofline, PERF_NOTES.md round 3): the free-slice
walk kernel measures 8.1 ms at (M, N) = (512, 8192) against a 0.43 ms HBM
floor — 5% of peak. Its per-visit cost is VPU-bound band-mask
construction (two f32 compares + and + int8 cast over (TM, OT, CW) ≈
0.5 µs/visit × ~8k visits ≈ 4.4 ms) plus the MXU issue latency of the
TM-batched small int8 matmuls; on top sit 1.5 ms of byte-plane conversion
and a second (cdf_prev) CDF stream.

This generation replaces the selection *matmul* with the hardware lane
**gather** (Mosaic ``tpu.dynamic_gather``, reachable as a 2-D
``take_along_axis`` whose index lanes stay within the 128-lane chunk):

  * per (output-tile, chunk) visit: ONE compare ``u > cdf`` (the lo-side
    band compare and the xor/shift bookkeeping of gen ≤ 4 are gone — a
    lane-sum of the hi-side compare IS the local ancestor index);
  * ``land`` = first visited chunk whose count < CW (outputs and chunk
    CDFs are both sorted, so each output lands exactly once);
  * the landing outputs gather their particles straight from the f32
    planar cloud chunk — no byte planes, no int8 accumulator, no f32
    reassembly, and the MXU stays free for the propagate kernel;
  * everything else (free-slice chunk walk, scalar-prefetched per-tile
    chunk bounds, host-transposed uniforms, (M/TM,) grid) is inherited
    from gen 4.

OUTCOME (measured on v5e, 2026-08-20, `benchmarks/bench_take_walk.py`):
the theory did not survive contact — **16.2 ms at (512, 8192) vs 7.5 ms
for gen 4** (incl. prep), every tm ∈ {4, 8}. The single count-compare is
real, but the design pays for it twice elsewhere: the walk runs TWO
fori_loops per tile (count + gather) instead of one, and the per-visit
`take_along_axis` + masked-select over (TM·C8, OT) costs more VPU time
than the int8 selection matmul it replaces (the MXU issue latency gen 4
pays is cheaper than gen 5's gather+select ALU volume). `ot=cw` is also
pinned at 128 — Mosaic's `dynamic_gather` cannot span >128 lanes, so the
wider tilings that help gen 4 don't compile here. Kept un-routed as the
recorded ablation; gen 4 (`resample_walk.py`) remains the champion.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sequential_monte_carlo_tpu.kernels.resample_pallas import resample_gather_bytes


def _kernel(ks_ref, ke_ref, ut_ref, cdf_ref, xs_ref, out_ref, *, cw: int):
    tm, ot, n_tiles = ut_ref.shape
    c8 = xs_ref.shape[1]
    g = pl.program_id(0)

    def tile_body(t, _):
        # tile's uniforms to sublanes: one-hot over the n_tiles lane axis
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_tiles), 2) == t
        ).astype(jnp.float32)
        u_t = jnp.sum(ut_ref[...] * sel, axis=2, keepdims=True)  # (TM, OT, 1)
        ks = ks_ref[g * n_tiles + t]
        ke = ke_ref[g * n_tiles + t]

        # -- phase A: absolute ancestor index by chunk-walk counting -------
        # anc[o] = #(cdf < u_o) = ks·CW + Σ_{k∈[ks,ke)} #(chunk_k cdf < u_o):
        # entries before chunk ks are < u for every output in the tile (ks
        # is the group-min start bound) and entries from ke on are ≥ u (ke
        # is the group-max end bound), so the visited window is exact.
        # f32 keepdims reductions — int/bool lane reductions unroll badly
        # in Mosaic (multi-kB scf.yield dumps) while this lowers clean.
        def count_body(k, anc):
            # cdf ref is (1, TM, N): a (TM, 1, N) block would pay the 1→8
            # sublane padding (2 MB instead of 256 KB at N=8192) and blow
            # the 16 MB scoped-VMEM limit — see PERF_NOTES "VMEM discipline"
            hi = cdf_ref[0, :, pl.ds(k * cw, cw)][:, None, :]  # (TM, 1, CW)
            return anc + jnp.sum(
                (u_t > hi).astype(jnp.float32), axis=2, keepdims=True
            )

        anc = jax.lax.fori_loop(
            ks, ke, count_body,
            jnp.zeros((tm, ot, 1), jnp.float32),
        ) + ks.astype(jnp.float32) * cw  # (TM, OT, 1), sublane layout

        # one sublane→lane relayout per tile (amortized over the chunk
        # visits; gen 4 got this transpose "for free" from its selection
        # matmul, at the price of the full band one-hot + MXU issue)
        anc_l = jnp.swapaxes(anc, 1, 2)  # (TM, 1, OT), lanes = outputs

        # -- phase B: gather each chunk's landing outputs ------------------
        def gather_body(k, acc):
            base = (k * cw).astype(jnp.float32)
            in_k = jnp.logical_and(anc_l >= base, anc_l < base + cw)
            idx = jnp.where(in_k, anc_l - base, 0.0).astype(jnp.int32)
            data = xs_ref[:, :, pl.ds(k * cw, cw)]  # (TM, C8, CW)
            idx_b = jnp.broadcast_to(idx, (tm, c8, ot))
            gathered = jnp.take_along_axis(
                data.reshape(tm * c8, cw),
                idx_b.reshape(tm * c8, ot),
                axis=-1,
            ).reshape(tm, c8, ot)
            return jnp.where(
                jnp.broadcast_to(in_k, (tm, c8, ot)), gathered, acc
            )

        acc = jax.lax.fori_loop(
            ks, ke, gather_body, jnp.zeros((tm, c8, ot), jnp.float32)
        )
        out_ref[:, :, pl.ds(t * ot, ot)] = acc
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)


@functools.partial(jax.jit, static_argnames=("tm", "ot", "cw", "interpret"))
def resample_gather_take(u, weights, xs, tm: int | None = None,
                         ot: int = 128, cw: int = 128,
                         interpret: bool = False):
    """Fused sorted-uniform resample + ancestor gather, lane-gather kernel.

    Args:
      u:       (M, N) SORTED uniforms in [0, 1) per row.
      weights: (M, N) non-negative, need not be normalized.
      xs:      (M, C, N) f32 particle cloud, components in sublanes.
      tm:      θ-rows per grid step.
      ot:      output-tile width. Must equal ``cw`` (the gather index lanes
               must line up with the chunk lanes) and be a 128-multiple.
      cw:      CDF chunk width (128-multiple).

    Returns (M, C, N) f32: ``xs`` gathered by the systematic ancestors —
    bitwise-equal to ``searchsorted(cdf, u, side="left") + take`` (same tie
    semantics as every earlier kernel generation).
    """
    m, n = u.shape
    if tm is None:
        # large N: halve the θ-rows per grid step to stay inside the 16 MB
        # scoped-VMEM limit (the (tm, 8, N) f32 cloud + out blocks dominate)
        tm = 4 if n >= 4096 else 8
    while m % tm:
        tm -= 1
    if ot != cw or n % ot or n % cw or m % tm or n < 2 * cw:
        return resample_gather_bytes(u, weights, xs, interpret=interpret)
    c = xs.shape[1]
    c8 = -(-c // 8) * 8
    xs_p = jnp.pad(xs, ((0, 0), (0, c8 - c), (0, 0))) if c8 != c else xs

    cdf = jnp.cumsum(weights, axis=-1)
    cdf = cdf / cdf[..., -1:]
    cdf = cdf.at[..., -1].set(jnp.float32(1.0) + 1e-6)

    n_groups = m // tm
    n_tiles = n // ot
    n_chunks = n // cw

    # per-(row, tile) chunk bounds by vectorized compare-sum ≡ gen 4
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
    gke = k_last.reshape(n_groups, tm, n_tiles).max(axis=1) + 1

    # host-transposed u: (M, OT, n_tiles); tile t's uniforms on sublanes
    u_t = jnp.swapaxes(u.reshape(m, n_tiles, ot), 1, 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # gks, gke (flat)
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((tm, ot, n_tiles), lambda g, ks, ke: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, n), lambda g, ks, ke: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, c8, n), lambda g, ks, ke: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, c8, n), lambda g, ks, ke: (g, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, cw=cw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, c8, n), jnp.float32),
        interpret=interpret,
    )(
        gks.reshape(-1),
        gke.reshape(-1),
        u_t,
        cdf.reshape(n_groups, tm, n),
        xs_p,
    )
    return out[:, :c, :]
