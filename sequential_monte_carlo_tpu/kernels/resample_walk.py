"""Pallas TPU kernel: monotone chunk-walk fused resample + gather.

Sixth-generation resample kernel — the gen-4 band-mask walk (after
``resample_pallas.resample_gather`` / ``resample_gather_bytes`` — dense
N² selection — ``resample_banded`` — windowed, with fallback — and the
lane-transposed third-gen walk) plus the round-5 gen-6 COUNT formulation
that replaces it on the systematic (u0) route; gen 5, a lane-gather
variant, lost and lives in ``benchmarks/ablations/``. Replaces every
predecessor at every size. Reference semantics: the ancestor-gather of
particles.jl:117-119 for sorted uniforms — explicit-u routes bitwise ≡
searchsorted(side="left") + take; the count route bitwise ≡ its
closed-form :func:`count_ancestors` oracle.

Kernel evolution (measured at M=512, N=8192, v5e; PERF_NOTES.md):
dense-bytes ≈ 58 ms (VPU-bound N² mask build) → banded ≈ 56 ms (per-step
windowed-DMA latency + host searchsorted prep) → v3 walk 8.5 ms → this
"free-slice" walk **6.2 ms incl. prep** (tm=16, c_pad=4; a gen-5
lane-gather variant, ``benchmarks/ablations/resample_take_walk.py``,
measured 16 ms and is kept only as the recorded ablation). v3 kept the CDF lane-transposed
``(TM, CW, N/CW)`` so a chunk was a width-1 lane column, but extracting it
cost a full one-hot sweep per chunk visit, and its xor band mask needed
sublane shift/concat carry bookkeeping — together ~2/3 of per-visit cost.

This generation removes both:

  * the grid is just ``(M/TM,)`` — each step holds TM whole rows in VMEM
    (cloud byte-planes, CDF, output; ~1.3 MB/row at N=8192);
  * ``cdf`` / ``cdf_prev`` ride FLAT on lanes; chunk k is a free dynamic
    lane slice at a provably 128-multiple offset (``pl.ds(k*CW, CW)``) —
    zero extraction cost (Mosaic allows 128-multiple dynamic lane offsets,
    and CW is a 128-multiple);
  * ``u`` rides host-transposed as (M, OT, n_tiles): a tile's uniforms
    land on SUBLANES, extracted once per tile by a one-hot over the
    n_tiles lane axis (amortized over the tile's chunk visits);
  * the band mask is two broadcast compares (u > cdf_prev) & (u ≤ cdf)
    oriented (TM, OT, CW) — no carry, no shift, no concat;
  * ancestors of consecutive output tiles are non-decreasing, so one
    monotone pointer walks the CDF in CW-wide chunks as an inner
    ``fori_loop`` over output tiles with per-tile dynamic chunk bounds
    (scalar-prefetched; computed host-side by a vectorized compare-sum);
  * per (tile, chunk): one int8 MXU matmul contracting both operands'
    LANE dims (NT layout): (TM, 4C, CW) · (TM, OT, CW) → (TM, 4C, OT)
    against the byte-plane cloud (bitwise-exact f32 reassembly, same
    trick as ``resample_gather_bytes``).

Total mask/matmul work per row is bounded by (N/CW + N/OT + spread) · CW·OT
≈ 2·N·OT — independent of the weight distribution (the pointer only moves
forward), so there is NO fallback path and NO coverage predicate: the
kernel is exact for any weights, including fully degenerate ones.

Rejected follow-ups (measured, PERF_NOTES.md): a telescoping
Abel-summation mask (one compare/chunk but 2× MXU traffic — slower), an
in-kernel ``tpu.dynamic_gather`` of walked indices (Mosaic's gather cannot
span >128 lanes), and in-kernel systematic-uniform generation from the
scalar u0 (the (1, OT, 1) sublane-thin f32 arithmetic costs more than the
one-hot tile extraction it replaces).

Round 5 — the COUNT formulation (gen 6) replaces the band mask on the
systematic (u0) route. The systematic grid u_o = (o + u0)/N makes
offspring counts closed-form, so input j's contiguous output span is
[S_lo_j, S_hi_j) with S_hi_j = ⌈N·cdf_j − u0⌉ — located without ever
materializing or comparing uniforms. The kernel keeps the identical
monotone chunk-walk + int8 selection-matmul structure but compares the
int32 span streams against ONE constant output iota (shifted per tile by
a scalar subtract), killing the (M, OT, n_tiles) u-grid stream (an M·N
HBM write + VMEM block) and the per-tile one-hot sublane extraction.
Measured (v5e, incl. prep): **5.72 vs 7.03 ms** at 512×8192 and
**1.35 vs 1.46 ms** at 512×1024 — the first formulation to beat the
band-mask walk's VPU floor, by changing what the compares are against.
Tie semantics are #{cdf_j ≤ u_o} through f32 ⌈·⌉ (the textbook count
definition of systematic resampling) — NOT bitwise-equal to
searchsorted(cdf, u, "left") at f32 rounding boundaries (< 1e-3 of
slots; both are exact draws of the scheme). The band formulation stays
production for explicit-u routes (stratified / elastic sorted grids,
where no closed-form span exists) and reachable on the u0 route via
``formulation="band"``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .resample_pallas import _to_byte_planes, resample_gather_bytes


def _autotune_tm(c: int, n: int, has_u: bool = True) -> int:
    """θ-rows per grid step, by measured speed + an explicit VMEM model.

    Speed (v5e sweeps, skew-2 log-weights): tm=16 beats tm=8 at every
    size (32 grid steps pipeline better than 64, round 3), and at
    N ≤ 2048 one more doubling wins for the BAND route (round 4,
    512×1024: tm=32 1.056 ms < tm=16 1.105 < tm=64 1.138 — beyond that
    the wider group-union chunk bounds eat the grid savings). The count
    route (``has_u=False``, round 5) prefers tm=16 at EVERY size
    (512×1024: tm=16 1.375 < tm=8 1.436 < tm=32 1.491; 512×8192: tm=16
    5.608 < tm=32 5.709 < tm=8 6.174) — without the u-grid block its
    per-group working set is smaller, and the band route's small-N tm=32
    win came from amortizing the per-tile u extraction the count route
    doesn't have.

    VMEM: the per-group blocks (int8 planes + f32 out + two
    sublane-padded cdf/span streams +, band route only, the u grid) grow
    with BOTH the padded component count and N; tm=16 at (c_pad=8,
    N=8192) exceeds the 16 MB scoped-VMEM limit (a Mosaic compile error,
    not a fallback). Halve tm while the per-group byte estimate exceeds
    a budget calibrated so (tm=16, c_pad=4, N=8192) sits AT it (measured
    to fit) and (tm=16, c_pad=8, N=8192) exceeds it (measured OOM). Per
    element of the tm·n tile: u grid 4 B (band route) + two cdf/span
    streams at 8-sublane padding (2·8·4 B) + 4·c_pad int8 planes + the
    8-sublane-rounded f32 output.
    """
    c_pad = -(-c // 4) * 4
    per_el = (4 if has_u else 0) + 64 + 4 * c_pad + (-(-c_pad // 8) * 8) * 4
    budget = 16 * 8192 * (4 + 64 + 16 + 32)  # the calibration point
    tm = (32 if n <= 2048 else 16) if has_u else 16
    while tm > 1 and tm * n * per_el > budget:
        tm //= 2
    return tm


def _kernel(ks_ref, ke_ref, ut_ref, cdf_ref, cdfp_ref, xs_ref, out_ref,
            *, cw: int, n_sub: int, xor_mask: bool):
    tm, ot, n_tiles = ut_ref.shape
    c4 = xs_ref.shape[1]  # byte planes = 4 · padded components
    c = c4 // 4
    sb = tm // n_sub  # subgroup row width (8 = one f32 sublane tile)
    g = pl.program_id(0)

    def tile_body(t, _):
        # tile's uniforms on sublanes: one-hot over the n_tiles lane
        # axis of the host-transposed (M, OT, n_tiles) grid.
        # (An in-kernel systematic grid from the scalar u0 was tried TWICE
        # and measured SLOWER both times — round 3: 10.7 vs 7.5 ms/call at
        # 512×8192; the (TM, OT, 1) sublane-thin f32 arithmetic per tile
        # costs more than this one-hot extraction. Don't re-add it.)
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_tiles), 2) == t
        ).astype(jnp.float32)
        u_t = jnp.sum(ut_ref[...] * sel, axis=2, keepdims=True)

        # subgroup loop (n_sub=1 in production — one union-bounds walk per
        # group). Per-8-row-subgroup bounds (n_sub=tm//8) are
        # bitwise-identical but measured SLOWER in real runs (see
        # _autotune_tm / PERF_NOTES round 4): when row spans coincide the
        # per-(tile, subgroup) fixed costs double while the mask volume
        # stays equal. Kept as the parameterized ablation.
        for s in range(n_sub):
            rows = slice(s * sb, (s + 1) * sb)
            u_s = u_t[rows]
            ks = ks_ref[(g * n_sub + s) * n_tiles + t]
            ke = ke_ref[(g * n_sub + s) * n_tiles + t]

            if xor_mask:
                # single-compare band mask: c_j = (u ≤ cdf_j) is monotone
                # in j, so band_j = c_j & ¬c_{j-1} = c_j XOR c_{j-1} with
                # c_{j-1} = c lane-shifted right by one, the carry column
                # riding the fori_loop (c_{-1} of the FIRST chunk comes
                # from one narrow compare against cdfp's first column).
                # ABLATION RECORD — interpret-mode-correct but DOES NOT
                # COMPILE on hardware (round 4): the odd-width lane
                # slices/concat (CW−1 and width-1) do not legalize in
                # Mosaic. This is the lane-major analog of gen-3's
                # sublane xor mask (which DID win, in the layout that
                # lost overall); on this layout every legal substitute
                # for the shift (roll+select+one-hot extract) costs more
                # ops than the compare it saves. Do not flip on.
                lo0 = cdfp_ref[rows, :, pl.ds(ks * cw, cw)][:, :, :1]
                prev0 = u_s <= lo0  # (SB, OT, 1)

                def chunk_body(k, carry, rows=rows, u_s=u_s):
                    acc, prev_col = carry
                    hi = cdf_ref[rows, :, pl.ds(k * cw, cw)]
                    cle = u_s <= hi  # (SB, OT, CW)
                    shifted = jnp.concatenate(
                        [prev_col, cle[:, :, :-1]], axis=2
                    )
                    band = (cle ^ shifted).astype(jnp.int8)
                    acc = acc + jax.lax.dot_general(
                        xs_ref[rows, :, pl.ds(k * cw, cw)],
                        band,
                        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.int32,
                    )
                    return acc, cle[:, :, -1:]

                acc, _ = jax.lax.fori_loop(
                    ks, ke, chunk_body,
                    (jnp.zeros((sb, c4, ot), jnp.int32), prev0),
                )
            else:
                def chunk_body(k, acc, rows=rows, u_s=u_s):
                    lo = cdfp_ref[rows, :, pl.ds(k * cw, cw)]  # (SB, 1, CW)
                    hi = cdf_ref[rows, :, pl.ds(k * cw, cw)]
                    band = ((u_s > lo) & (u_s <= hi)).astype(jnp.int8)
                    return acc + jax.lax.dot_general(
                        xs_ref[rows, :, pl.ds(k * cw, cw)],  # (SB, 4C, CW)
                        band,  # (SB, OT, CW)
                        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.int32,
                    )

                acc = jax.lax.fori_loop(
                    ks, ke, chunk_body, jnp.zeros((sb, c4, ot), jnp.int32)
                )

            b0 = acc[:, 0 * c : 1 * c, :] & 0xFF
            b1 = acc[:, 1 * c : 2 * c, :] & 0xFF
            b2 = acc[:, 2 * c : 3 * c, :] & 0xFF
            b3 = acc[:, 3 * c : 4 * c, :] & 0xFF
            word = b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)
            out_ref[rows, :, pl.ds(t * ot, ot)] = jax.lax.bitcast_convert_type(
                word, jnp.float32
            )
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)


def _autotune_width(n: int, count_route: bool) -> int:
    """Default ot/cw: 128 at the reference sizes (the r3 sweep's
    mask-volume minimum); at N ≥ 16384 the count route measured 256²
    faster (12.41 vs 14.79 ms at 512×16384, r5 — fewer per-visit fixed
    costs once rows span many chunks). Widen ONLY when 256 divides N —
    otherwise a 128-divisible N would fall through to the dense fallback
    kernel, an order-of-magnitude silent regression (r5 review)."""
    if count_route and n >= 16384 and n % 256 == 0:
        return 256
    return 128


def count_ancestors(u0, weights):
    """XLA oracle for the count formulation: systematic ancestors by
    closed-form offspring counts.

    a_o = #{j : S_hi_j ≤ o},  S_hi_j = ⌈N·cdf_j − u0⌉ (last forced to N)
    — the textbook count definition of systematic resampling
    (≡ the scheme of /root/reference/src/particles.jl:17-19 with sorted
    systematic uniforms). Returns (M, N) int32, bitwise ≡ the count-walk
    kernel's gather indices.
    """
    m, n = weights.shape
    cdf = jnp.cumsum(weights, axis=-1)
    cdf = cdf / cdf[..., -1:]
    s_hi = jnp.ceil(n * cdf - u0)
    s_hi = s_hi.at[..., -1].set(float(n))
    o = jnp.arange(n, dtype=s_hi.dtype)[None, :] * jnp.ones((m, 1), s_hi.dtype)
    return jax.vmap(
        lambda s, oo: jnp.clip(
            jnp.searchsorted(s, oo, side="right"), 0, n - 1
        ).astype(jnp.int32)
    )(s_hi, o)


def _count_kernel(ks_ref, ke_ref, slo_ref, shi_ref, xs_ref, out_ref, *,
                  cw: int, ot: int):
    """Count-formulation walk body (gen 6, round 5 — see module doc):
    identical chunk-walk + int8 selection matmul as ``_kernel``, but the
    band mask compares the span streams against one constant output iota
    instead of per-tile-extracted uniforms against the CDF. The span
    element type follows the refs (int32 production; int16 reachable via
    ``span_dtype`` for the measured throughput experiment)."""
    tm = slo_ref.shape[0]
    c4 = xs_ref.shape[1]
    c = c4 // 4
    n_tiles = out_ref.shape[2] // ot
    g = pl.program_id(0)
    sdt = slo_ref.dtype

    # constant output iota, built ONCE per group: lane index within a
    # tile. MUST be integer — Mosaic's tpu.iota rejects float element
    # types (the round-3 float-iota lesson, re-hit on this kernel's first
    # hardware compile).
    o_iota = jax.lax.broadcasted_iota(jnp.int32, (1, ot, 1), 1).astype(sdt)

    def tile_body(t, _):
        base = (t * ot).astype(sdt)
        ks = ks_ref[g * n_tiles + t]
        ke = ke_ref[g * n_tiles + t]

        def chunk_body(k, acc):
            # shift the span chunk by the tile's base instead of building
            # a per-tile global iota: two (TM, 1, CW) subtracts ≪ mask
            # volume (the in-kernel per-tile u-grid, by contrast, lost
            # twice — see tile_body in ``_kernel``)
            lo = slo_ref[:, :, pl.ds(k * cw, cw)] - base  # (TM, 1, CW)
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


@functools.partial(jax.jit, static_argnames=("tm", "ot", "cw", "interpret",
                                             "xor_mask", "n_sub",
                                             "formulation", "span_dtype"))
def resample_gather_walk(u, weights, xs, tm: int | None = None,
                         ot: int | None = None, cw: int | None = None,
                         interpret: bool = False, u0=None,
                         xor_mask: bool = False, n_sub: int = 1,
                         formulation: str = "count",
                         span_dtype: str = "int32"):
    """Fused sorted-uniform resample + ancestor gather, chunk-walk kernel.

    Args:
      u:       (M, N) SORTED uniforms in [0, 1) per row (systematic /
               stratified grids — ``systematic_uniforms``). May be None
               when ``u0`` is given.
      weights: (M, N) non-negative, need not be normalized.
      xs:      (M, C, N) f32 particle cloud, components in sublanes.
      tm:      θ-rows per grid step (VMEM-bound; default by N).
      ot:      output-tile width (lane multiple; also the dynamic output
               write offset stride, so must be a 128-multiple).
               None = autotuned: 128 at reference sizes, 256 on the
               count route at N ≥ 16384 (measured, PERF_NOTES r5).
      cw:      CDF chunk width (128-multiple — chunk slices must sit at
               128-multiple lane offsets). None = autotuned with ``ot``.
      n_sub:   subgroups per TM-row group walking their OWN chunk bounds
               (must divide tm). 1 = production (group-union bounds);
               >1 is the measured-slower round-4 ablation, kept reachable
               for tests.
      u0:      (M, 1) systematic offsets. Dispatches the gen-6 COUNT
               route (round 5, default): int32 offspring-span streams
               S = ⌈N·cdf − u0⌉ compared against a constant output iota —
               no uniforms are materialized at all. Bitwise oracle:
               :func:`count_ancestors` + take. CAVEAT: non-divisible
               shapes (n % ot, n % cw, n < 2·cw) fall back to the dense
               kernel, which materializes the grid and uses the
               searchsorted-left tie semantics — the two differ only at
               f32 rounding ties (< 1e-3 of slots), but reproducibility
               checks against ``count_ancestors`` hold for divisible
               shapes only.
      formulation: u0-route selector. "count" (production) or "band" —
               the gen-4 band-mask route, which builds the grid
               u_i = (i + u0)/N host-side in the kernel's transposed
               (M, OT, n_tiles) layout, bitwise-equal to passing
               ``systematic_uniforms`` output (kept as the measured A/B
               reference; it IS the production path for explicit-u
               routes, where no closed-form span exists).

    Returns (M, C, N) f32: ``xs`` gathered by the systematic ancestors.
    Explicit-u and ``formulation="band"`` routes are bitwise-equal to
    searchsorted(cdf, u, side="left") + take — the same tie semantics as
    ``resample_gather`` / ``resample_gather_bytes``; the count route's
    tie semantics are ``count_ancestors`` (see module doc — both exact
    systematic draws, differing on < 1e-3 of slots at f32 rounding ties).
    """
    m, n = weights.shape
    if formulation not in ("count", "band"):
        raise ValueError(
            f"unknown formulation {formulation!r}; one of ['count', 'band']"
        )
    sys_u = u0 is not None
    count_route = sys_u and formulation == "count"
    if count_route and xor_mask:
        raise ValueError(
            "xor_mask is a band-formulation ablation; pass "
            "formulation='band' to exercise it on the u0 route"
        )
    if ot is None or cw is None:
        wide = _autotune_width(n, count_route)
        ot = wide if ot is None else ot
        cw = wide if cw is None else cw
    if tm is None:
        tm = _autotune_tm(xs.shape[1], n, has_u=not count_route)
    while m % tm:
        tm -= 1
    if tm % n_sub:
        raise ValueError(f"n_sub {n_sub} must divide tm {tm}")
    if count_route and n_sub != 1:
        raise ValueError(
            "n_sub subgroups are a band-formulation ablation; the count "
            "route walks union bounds only (pass formulation='band')"
        )
    if n % ot or n % cw or m % tm or n < 2 * cw:
        if u is None:
            i = jnp.arange(n, dtype=weights.dtype)[None, :]
            u = (i + u0) / n
        return resample_gather_bytes(u, weights, xs, interpret=interpret)
    c = xs.shape[1]
    # byte-plane the cloud, padding components only to the next multiple
    # of 4 (not 8): the matmul LHS carries 4·c_pad int8 rows, and halving
    # the dead planes halves both the conversion pass and the per-visit
    # operand streaming (roofline, PERF_NOTES.md round 3)
    c_pad = -(-c // 4) * 4
    xs_p = jnp.pad(xs, ((0, 0), (0, c_pad - c), (0, 0))) if c_pad != c else xs
    xb = _to_byte_planes(xs_p)  # (M, 4·c_pad, N) int8
    cdf = jnp.cumsum(weights, axis=-1)
    cdf = cdf / cdf[..., -1:]

    n_groups = m // tm
    n_tiles = n // ot
    n_chunks = n // cw

    if count_route:
        # -- gen-6 count route (round 5): int32 span streams, no u grid --
        s_hi = jnp.ceil(n * cdf - u0)
        s_hi = s_hi.at[..., -1].set(jnp.float32(n))  # exact coverage
        s_lo = jnp.pad(s_hi[..., :-1], ((0, 0), (1, 0)),
                       constant_values=0.0)
        # per-(row, tile) chunk bounds against integer output indices:
        # chunk k is spent once its end-span ≤ the tile's first output;
        # the last needed chunk is the one whose end-span first exceeds
        # the tile's last output
        chunk_ends = s_hi[:, cw - 1 :: cw]  # (M, n_chunks)
        o_first = (jnp.arange(n_tiles, dtype=s_hi.dtype) * ot)[None, :]
        o_last = o_first + (ot - 1)
        k_start = jnp.sum(
            chunk_ends[:, :, None] <= o_first[:, None, :], axis=1,
            dtype=jnp.int32,
        )
        k_last = jnp.sum(
            chunk_ends[:, :, None] <= o_last[:, None, :], axis=1,
            dtype=jnp.int32,
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
            out_specs=pl.BlockSpec((tm, c_pad, n),
                                   lambda g, ks, ke: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        # span element type: int32 production. "int16" is the narrower-
        # lane throughput experiment (legal while spans |·| < 2^15, i.e.
        # N ≤ 16384) — ABLATION RECORD: interpret-bitwise-correct but
        # crashes the Mosaic compiler internally on hardware (round 5,
        # PERF_NOTES); kept reachable for when the toolchain moves.
        sdt = jnp.dtype(span_dtype)
        if sdt == jnp.int16 and n > 16384:
            sdt = jnp.dtype(jnp.int32)
        out = pl.pallas_call(
            functools.partial(_count_kernel, cw=cw, ot=ot),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((m, c_pad, n), jnp.float32),
            interpret=interpret,
        )(
            gks.reshape(-1),
            gke.reshape(-1),
            s_lo[:, None, :].astype(sdt),
            s_hi[:, None, :].astype(sdt),
            xb,
        )
        return out if c_pad == c else out[:, :c, :]

    cdf = cdf.at[..., -1].set(jnp.float32(1.0) + 1e-6)
    cdf_prev = jnp.pad(cdf[..., :-1], ((0, 0), (1, 0)), constant_values=-1.0)

    # per-(row, tile) chunk bounds by vectorized compare-sum (no
    # searchsorted): first chunk whose end-CDF covers the tile's first /
    # last uniform; ancestors are sorted so these bracket every output.
    chunk_ends = cdf[:, cw - 1 :: cw]  # (M, n_chunks)
    if sys_u:
        # the systematic grid's tile edges, computed from u0 alone
        base = jnp.arange(n_tiles, dtype=weights.dtype)[None, :] * ot
        u_first = (base + u0) / n  # (M, n_tiles)
        u_last = (base + (ot - 1) + u0) / n
    else:
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
    # group-shared bounds: min start / max end over the TM rows (n_sub=1,
    # the production default). Per-8-row-subgroup bounds (n_sub = tm // 8)
    # were built and measured in round 4 — bitwise-equal, and SLOWER in
    # real runs (flagship bench 12.1 → 13.5 s; per-call parity at mild
    # skew): when row spans coincide the per-(tile, subgroup) fixed costs
    # (fori_loop setup, 2× output writes, matmul issue latency) double
    # while the mask volume stays equal, eating the narrower-span win.
    # The ablation stays reachable through the ``n_sub`` argument
    # (test-only; must divide tm — validated at entry) — ADVICE r4.
    sb = tm // n_sub
    gks = k_start.reshape(n_groups * n_sub, sb, n_tiles).min(axis=1)
    gke = (k_last.reshape(n_groups * n_sub, sb, n_tiles).max(axis=1) + 1)

    if sys_u:
        # systematic grid u_i = (i + u0)/n built DIRECTLY in the kernel's
        # transposed (M, OT, n_tiles) layout: one fused XLA elementwise
        # pass writing the M·N values; the reshape+swapaxes RELAYOUT of a
        # lane-major grid is what's avoided (that, not the write, was the
        # measured cost — an in-KERNEL grid lost twice, see tile_body).
        # Bitwise ≡
        # systematic_uniforms(...) then reshape+swapaxes: the index
        # i = t·ot + o is exact in f32 and the (i + u0)/n ops are identical.
        idx = (
            jnp.arange(ot, dtype=weights.dtype)[None, :, None]
            + jnp.arange(n_tiles, dtype=weights.dtype)[None, None, :] * ot
        )
        u_in = (idx + u0[:, :, None]) / n
    else:
        # host-transposed u: (M, OT, n_tiles); tile t's uniforms on sublanes
        u_in = jnp.swapaxes(u.reshape(m, n_tiles, ot), 1, 2)
    u_spec = pl.BlockSpec((tm, ot, n_tiles), lambda g, ks, ke: (g, 0, 0),
                          memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # gks, gke (flat)
        grid=(n_groups,),
        in_specs=[
            u_spec,
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
        functools.partial(_kernel, cw=cw, n_sub=n_sub, xor_mask=xor_mask),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, c_pad, n), jnp.float32),
        interpret=interpret,
    )(
        gks.reshape(-1),
        gke.reshape(-1),
        u_in,
        cdf[:, None, :],
        cdf_prev[:, None, :],
        xb,
    )
    return out if c_pad == c else out[:, :c, :]
