"""Pallas TPU kernel: the COMPLETE UC-SV filter step, fused.

One kernel = resample (banded one-hot matmul gather, as in
``resample_pallas.py``) + UC-SV propagate with on-chip PRNG + observation
reweight. The (M, N) particle cloud makes exactly one HBM→VMEM→HBM round
trip per filter step; everything else — selection matmuls on the MXU,
Box–Muller draws, the three state updates, the Gaussian log-density — stays
in VMEM. This is the steady-state inner loop of online SMC² on the headline
UC-SV workload (SURVEY.md §3.4) driven to its bandwidth floor.

Layout: the cloud rides planar as (M, 8, N) — rows 0..2 = (x, log σε,
log ση), rows 3..7 padding — components in sublanes, particles in lanes.
``ops/batched_filter.py`` keeps the planar layout across the whole scan in
its UC-SV fast path, so no per-step transposes either.

Weight normalization (a pair of (M, N) reductions) stays outside in XLA,
which fuses it with the cumsum feeding the next step's CDF.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ucsv_pallas import _normals

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)
_JT = 128


def _kernel(seed_ref, y_ref, gam_ref, u_ref, cdf_ref, cdfp_ref, xs_ref,
            out_ref, logw_ref, acc_ref):
    @pl.when(pl.program_id(1) == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    u = u_ref[0, 0, :]
    lo = cdfp_ref[0, :, 0][:, None]
    hi = cdf_ref[0, :, 0][:, None]
    wt = ((u[None, :] > lo) & (u[None, :] <= hi)).astype(jnp.float32)
    acc_ref[...] += jax.lax.dot_general(
        xs_ref[0, :, :],
        wt,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _propagate():
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        x = acc_ref[0:1, :]
        lse = acc_ref[1:2, :]
        lsn = acc_ref[2:3, :]
        ge = gam_ref[0, 0, 0]
        gn = gam_ref[0, 0, 1]
        y = y_ref[0]

        z0, z1 = _normals(x.shape)
        z2, _ = _normals(x.shape)

        x_new = x + jnp.exp(0.5 * lse) * z0
        lse_new = lse + ge * z1
        lsn_new = lsn + gn * z2

        s_inv = jnp.exp(-0.5 * lsn_new)
        zz = (y - x_new) * s_inv
        logw = -0.5 * zz * zz - 0.5 * lsn_new - _HALF_LOG_2PI

        out_ref[0, 0:1, :] = x_new
        out_ref[0, 1:2, :] = lse_new
        out_ref[0, 2:3, :] = lsn_new
        out_ref[0, 3:8, :] = jnp.zeros_like(out_ref[0, 3:8, :])
        logw_ref[0, 0, :] = logw[0, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def ucsv_fused_step(seed, y, gammas, u, weights, xs_planar,
                    interpret: bool = False):
    """Fused resample+propagate+reweight for UC-SV.

    Args:
      seed: int32 scalar.
      y: scalar observation.
      gammas: (M, 2) — per-θ (γε, γη) std devs.
      u: (M, N) SORTED uniforms (systematic/stratified grid).
      weights: (M, N) normalized linear weights.
      xs_planar: (M, 8, N) planar cloud, rows 0..2 = (x, logσε, logση).
    Returns:
      (new_planar (M, 8, N), logw (M, N)) — raw observation log-weights.
    """
    m, n = u.shape
    cdf = jnp.cumsum(weights, axis=-1)
    cdf = cdf / cdf[..., -1:]
    cdf = cdf.at[..., -1].set(jnp.float32(1.0) + 1e-6)
    cdf_prev = jnp.pad(cdf[..., :-1], ((0, 0), (1, 0)), constant_values=-1.0)

    grid = (m, n // _JT)
    out, logw = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # y (1,)
            pl.BlockSpec((1, 1, 2), lambda i, j: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _JT, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _JT, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, _JT), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, 8, n), jnp.float32),
            jax.ShapeDtypeStruct((m, 1, n), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((8, n), jnp.float32)],
        interpret=interpret,
    )(
        jnp.asarray([seed], dtype=jnp.int32).reshape(1),
        jnp.asarray([y], dtype=jnp.float32).reshape(1),
        jnp.asarray(gammas, dtype=jnp.float32)[:, None, :],
        u[:, None, :],
        cdf[..., None],
        cdf_prev[..., None],
        xs_planar,
    )
    return out, logw[:, 0, :]
