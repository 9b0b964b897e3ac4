"""Pallas TPU kernel: fused UC-SV propagate + reweight (L5).

The steady-state cost of online SMC² is the per-step propagate/reweight over
the (M, N) particle tensor (SURVEY.md §3.4: O(M·N) per observation). For the
UC-SV model that is pure elementwise math — three Gaussian draws and one
Gaussian log-density per particle (state_space_models.jl:233-247). This
kernel fuses the whole thing into one VMEM-resident pass per (M-tile, N)
block: on-chip PRNG (Box–Muller over ``pltpu.prng_random_bits``), the three
state updates, and the observation log-weight — one HBM read of the cloud,
one write, no intermediate tensors.

Shapes: x (M, N, 3) is carried as three planar (M, N) arrays so every load
is a native (sublane, lane) tile; M tiles of 8 rows map the grid.

The XLA path (models/ucsv.py via ops/particle_filter.py) remains the
reference implementation; parity is tested in interpret mode on CPU and on
real TPU in the benchmark suite.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)
_TWO_PI = 2.0 * math.pi


def _uniforms(shape):
    """U(0,1) floats from the on-chip PRNG (never exactly 0)."""
    # prng_random_bits yields int32 on TPU — bitcast to uint32 BEFORE
    # shifting (arithmetic shift on negatives corrupts the high bit), then
    # back to int32 for the float convert (Mosaic has no uint32→f32 cast;
    # after >>8 the value fits in 24 bits, so int32 is exact).
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    bits24 = pltpu.bitcast(bits >> 8, jnp.int32)
    u = bits24.astype(jnp.float32) * (1.0 / (1 << 24))
    return jnp.maximum(u, 1e-7)


def _normals(shape):
    """Standard normals via Box–Muller from two uniform draws."""
    u1 = _uniforms(shape)
    u2 = _uniforms(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(_TWO_PI * u2), r * jnp.sin(_TWO_PI * u2)


@functools.partial(jax.jit, static_argnames=("interpret", "normalize"))
def ucsv_propagate_reweight(seed, y, gamma_eps, gamma_eta, x, log_se, log_sn,
                            interpret: bool = False, tile_offset=0,
                            normalize: bool = False):
    """Fused UC-SV propagate+reweight (+ optional normalize epilogue).

    Args:
      seed: int32 scalar PRNG seed for this step.
      y: scalar observation.
      gamma_eps, gamma_eta: (M,) per-θ vol-of-vol std devs.
      x, log_se, log_sn: (M, N) planar state components.
      tile_offset: int32 scalar added to the per-tile PRNG stream index —
        under θ-sharding (shard_map) each shard passes its global first-tile
        index so the sharded run draws the same randoms as the unsharded one.
      normalize: also run the per-row log-sum-exp normalize + ESS on the
        resident (TILE_M, N) block — valid for the always-resample path
        where the pre-propagate log-weights are the constant −log N, so the
        normalized weights depend on the increments alone. Saves the
        separate XLA normalize/ESS sweeps over the (M, N) tensor (the
        step-glue headroom identified by the round-3 device profile,
        PERF_NOTES.md).
    Returns:
      ``normalize=False``: (x', log_se', log_sn', logw) each (M, N).
      ``normalize=True``:  (x', log_se', log_sn', log_norm (M, N),
      lse (M, 1) row log-sum-exp of the increments — the caller subtracts
      log N for the evidence, ess (M, 1)).
    """
    M, N = x.shape
    TILE_M = 8 if M % 8 == 0 else M
    grid = (M // TILE_M,)

    def row_spec():
        return pl.BlockSpec((TILE_M, N), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def col_spec():
        return pl.BlockSpec((TILE_M, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)

    # broadcast per-θ γ to (M, N) lanes once outside (cheap, fused by XLA)
    ge = jnp.broadcast_to(gamma_eps[:, None], (M, N))
    gn = jnp.broadcast_to(gamma_eta[:, None], (M, N))

    def kernel(seed_ref, y_ref, ge_ref, gn_ref, x_ref, lse_ref, lsn_ref,
               xo_ref, lseo_ref, lsno_ref, logw_ref, *norm_refs):
        pltpu.prng_seed(seed_ref[0], seed_ref[1] + pl.program_id(0))
        x_ = x_ref[:]
        lse_ = lse_ref[:]
        lsn_ = lsn_ref[:]
        z0, z1 = _normals(x_.shape)
        z2, _ = _normals(x_.shape)
        x_new = x_ + jnp.exp(0.5 * lse_) * z0
        lse_new = lse_ + ge_ref[:] * z1
        lsn_new = lsn_ + gn_ref[:] * z2
        s_inv = jnp.exp(-0.5 * lsn_new)
        zz = (y_ref[0] - x_new) * s_inv
        logw = -0.5 * zz * zz - 0.5 * lsn_new - _HALF_LOG_2PI
        xo_ref[:] = x_new
        lseo_ref[:] = lse_new
        lsno_ref[:] = lsn_new
        if not norm_refs:
            logw_ref[:] = logw
            return
        lseo, esso = norm_refs
        # per-row log-sum-exp over the resident block (logw is a Gaussian
        # log-density — always finite, no −inf guard needed)
        mx = jnp.max(logw, axis=-1, keepdims=True)
        e = jnp.exp(logw - mx)
        s = jnp.sum(e, axis=-1, keepdims=True)
        row_lse = mx + jnp.log(s)
        log_norm = logw - row_lse
        logw_ref[:] = log_norm
        lseo[:] = row_lse
        esso[:] = 1.0 / jnp.sum(e * e, axis=-1, keepdims=True) * (s * s)

    out_shape = [jax.ShapeDtypeStruct((M, N), x.dtype)] * 4
    out_specs = [row_spec()] * 4
    if normalize:
        out_shape += [jax.ShapeDtypeStruct((M, 1), x.dtype)] * 2
        out_specs += [col_spec()] * 2
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # [seed, tile_offset] (2,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # y (1,)
            row_spec(),  # ge
            row_spec(),  # gn
            row_spec(),  # x
            row_spec(),  # log_se
            row_spec(),  # log_sn
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(
        jnp.stack([jnp.asarray(seed, jnp.int32), jnp.asarray(tile_offset, jnp.int32)]),
        jnp.asarray([y], dtype=x.dtype),
        ge,
        gn,
        x,
        log_se,
        log_sn,
    )
    return tuple(outs)
