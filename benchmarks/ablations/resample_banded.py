"""Pallas TPU kernel: banded (sub-N²) fused resample + gather.

The dense kernels (``resample_pallas.py``) build the full (N, N) selection
matrix — N² compare-ops per θ-row, the measured per-step floor at large N.
But for sorted uniforms the ancestors are SORTED: each tile of OT
consecutive outputs draws from one contiguous input window. This kernel
exploits that:

  * host-side (XLA, a few thousand scalars): the ancestor of each tile's
    first output via ``searchsorted``, rounded down to WIN-blocks and
    shared across a group of TM θ-rows (min over the group);
  * the grid runs over (θ-group, output-tile); scalar-prefetched block
    indices steer each tile's TWO consecutive WIN-wide input blocks of the
    cloud and CDF into VMEM (``PrefetchScalarGridSpec``);
  * in-kernel: two (TM, WIN, OT) int8 selection tiles + byte-plane int8
    matmuls summed (the sum over both blocks equals the product against
    the concatenated window — each output's ancestor lies in exactly one
    block; Mosaic has no cross-tile VREG concatenate). The f32 cloud rides
    as 4 int8 byte planes, exactly as in ``resample_gather_bytes``, so the
    selection runs one int8 MXU pass instead of six f32 passes and stays
    bitwise-exact.

Work drops from N² to 2·N·WIN compares/MACs per row — ~8× at the
reference's UC-SV size N=8192 (WIN=512) — and TM-row batching amortizes
the ~2-3 µs/step grid overhead that otherwise dominates. Exactness: the
shared window covers a group's ancestors iff every row's tile span fits;
the wrapper computes the exact coverage predicate and falls back to the
dense byte-plane kernel via ``lax.cond`` otherwise (resampled weights are
well-spread in the common case, so the banded path dominates). Results
are bitwise-equal to gather-by-ancestors, same tie semantics as the dense
kernels.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sequential_monte_carlo_tpu.kernels.resample_pallas import _to_byte_planes, resample_gather_bytes


_CW = 128  # in-kernel window chunk: bounds live compare-mask VREGs


def _kernel(jblk_ref, valid2_ref, u_ref, cdf_a, cdf_b, cdfp_a, cdfp_b,
            xb_a, xb_b, out_ref):
    u = u_ref[:, 0, :]  # (TM, OT)
    tm, ot = u.shape
    c4 = xb_a.shape[1]
    win = cdf_a.shape[1]

    # when the second block is a clamped duplicate of the first (window at
    # the end of the input axis), void its selection tile to avoid double
    # hits (folded into the boolean mask — int8 vector×scalar multiply does
    # not legalize in Mosaic)
    g_i = pl.program_id(0)
    t_i = pl.program_id(1)
    n_t = pl.num_programs(1)
    v2 = valid2_ref[g_i * n_t + t_i] != 0

    # Chunk the compare + matmul over the window axis: the (TM, W, OT)
    # boolean masks live as full vregs, so un-chunked they dominate scoped
    # VMEM (measured OOM at TM=8, W=512, OT=256). Buckets are
    # (cdf_{j-1}, cdf_j], matching searchsorted(side="left") tie behavior —
    # bitwise-equal to the XLA gather path.
    def accumulate(cdf_ref, cdfp_ref, xb_ref, mask_ok, acc):
        def chunk(k, acc):
            sl = pl.ds(k * _CW, _CW)
            lo = cdfp_ref[:, sl, 0]  # (TM, CW)
            hi = cdf_ref[:, sl, 0]
            wt = (
                (u[:, None, :] > lo[:, :, None])
                & (u[:, None, :] <= hi[:, :, None])
                & mask_ok
            ).astype(jnp.int8)  # (TM, CW, OT)
            return acc + jax.lax.dot_general(
                xb_ref[:, :, sl],  # (TM, 4C, CW) int8
                wt,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )
        return jax.lax.fori_loop(0, win // _CW, chunk, acc)

    acc = jnp.zeros((tm, c4, ot), jnp.int32)
    acc = accumulate(cdf_a, cdfp_a, xb_a, True, acc)
    acc = accumulate(cdf_b, cdfp_b, xb_b, v2, acc)
    c = acc.shape[1] // 4
    b0 = acc[:, 0 * c : 1 * c, :] & 0xFF
    b1 = acc[:, 1 * c : 2 * c, :] & 0xFF
    b2 = acc[:, 2 * c : 3 * c, :] & 0xFF
    b3 = acc[:, 3 * c : 4 * c, :] & 0xFF
    word = b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)
    out_ref[...] = jax.lax.bitcast_convert_type(word, jnp.float32)


def _banded_call(jblk, valid2, u, cdf, cdf_prev, xb, c_pad, tm, ot, win):
    m, n = u.shape
    n_groups = m // tm
    n_tiles = n // ot
    n_blocks = n // win

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # jblk (flat), valid2 (flat)
        grid=(n_groups, n_tiles),
        in_specs=[
            pl.BlockSpec((tm, 1, ot), lambda g, t, jb, v2: (g, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, win, 1), lambda g, t, jb, v2: (g, jb[g * n_tiles + t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, win, 1),
                         lambda g, t, jb, v2: (g, jnp.minimum(jb[g * n_tiles + t] + 1, n_blocks - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, win, 1), lambda g, t, jb, v2: (g, jb[g * n_tiles + t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, win, 1),
                         lambda g, t, jb, v2: (g, jnp.minimum(jb[g * n_tiles + t] + 1, n_blocks - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 4 * c_pad, win), lambda g, t, jb, v2: (g, 0, jb[g * n_tiles + t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 4 * c_pad, win),
                         lambda g, t, jb, v2: (g, 0, jnp.minimum(jb[g * n_tiles + t] + 1, n_blocks - 1)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, c_pad, ot), lambda g, t, jb, v2: (g, 0, t),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, c_pad, n), jnp.float32),
    )(
        jblk.reshape(-1),
        valid2.reshape(-1),
        u[:, None, :],
        cdf[..., None],
        cdf[..., None],
        cdf_prev[..., None],
        cdf_prev[..., None],
        xb,
        xb,
    )


@functools.partial(jax.jit, static_argnames=("tm", "ot", "win"))
def resample_gather_banded(u, weights, xs, tm: int = 8, ot: int = 256,
                           win: int = 512):
    """Banded resample+gather with exact dense fallback.

    Same contract as :func:`resample_pallas.resample_gather`; ``tm`` is the
    θ-rows per grid step (sharing one input window), ``ot`` the output-tile
    width, ``win`` the input window block size (window = 2·win).
    """
    m, n = u.shape
    # require a genuinely sub-N window (n ≥ 4·win): below that the banded
    # path saves nothing over the dense bytes kernel, and its lax.cond
    # branch output (~16MB at M=512, N=1024) gets stack-allocated in
    # scoped VMEM by XLA and blows the 16MB limit
    if n % ot or n % win or n < 4 * win or m % tm:
        return resample_gather_bytes(u, weights, xs)
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
    n_blocks = n // win
    # ancestors of each tile's first and last output (tiny searchsorted)
    starts = u[:, ::ot]  # (M, n_tiles)
    ends = u[:, ot - 1 :: ot]
    a_start = jax.vmap(lambda cc, q: jnp.searchsorted(cc, q, side="left"))(cdf, starts)
    a_end = jax.vmap(lambda cc, q: jnp.searchsorted(cc, q, side="left"))(cdf, ends)
    a_start = jnp.clip(a_start, 0, n - 1)
    a_end = jnp.clip(a_end, 0, n - 1)
    # shared window per TM-row group: lowest start block over the group
    grp_start = a_start.reshape(n_groups, tm, n_tiles).min(axis=1)
    grp_end = a_end.reshape(n_groups, tm, n_tiles).max(axis=1)
    jblk = (grp_start // win).astype(jnp.int32)  # (n_groups, n_tiles)
    # exact coverage: every row's last ancestor must sit inside the 2-block
    # window actually loaded
    hi_block = jnp.minimum(jblk + 1, n_blocks - 1)
    covered = grp_end < (hi_block + 1) * win
    fits = jnp.all(covered)
    valid2 = (hi_block != jblk).astype(jnp.int32)

    def banded(_):
        out = _banded_call(jblk, valid2, u, cdf, cdf_prev, xb, c_pad, tm, ot, win)
        return out[:, :c, :]

    def dense(_):
        return resample_gather_bytes(u, weights, xs)

    return jax.lax.cond(fits, banded, dense, None)
