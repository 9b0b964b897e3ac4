"""Pallas TPU kernel builder: fused elementwise propagate + reweight for
ANY model whose particle update is per-particle elementwise math (L5).

Generalizes the hand-written UC-SV kernel (``ucsv_pallas.py``) to the rest
of the model zoo (VERDICT r3 #3): the steady-state cost of online SMC² is
the per-step propagate/reweight over the (M, N) particle tensor
(SURVEY.md §3.4, ≡ the model-generic hot loop
/root/reference/src/particles.jl:122-125). For state-space models whose
transition is a deterministic function of (θ, x, iid normals) and whose
observation density is elementwise — the whole reference zoo qualifies —
the step is one VMEM-resident pass per (M-tile, N) block: on-chip PRNG
(Box–Muller over ``pltpu.prng_random_bits``), the state update, the
observation log-weight, and optionally the per-row normalize epilogue.

The model contributes a pure ``update_fn`` that is traced INTO the kernel:

    update_fn(params, y, state, normals) -> (new_state, logw)

where ``params`` is a tuple of per-θ (TM, 1) columns (lane-broadcast
against the (TM, N) planes), ``state`` a tuple of (TM, N) state planes,
``normals`` a tuple of (TM, N) standard-normal draws. All ops must be
elementwise jnp — no reductions over N (except the built-in normalize
epilogue), no gathers.

PRNG stream discipline matches ``ucsv_pallas``: seeded per (seed,
tile_offset + program_id) so θ-sharded runs draw the same randoms as
unsharded ones (tile_offset = shard's global first tile).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ucsv_pallas import _normals

__all__ = ["fused_elementwise_step"]


@functools.partial(
    jax.jit,
    static_argnames=("update_fn", "n_normals", "normalize", "interpret"),
)
def fused_elementwise_step(update_fn, seed, y, params, state_planes,
                           n_normals: int, tile_offset=0,
                           normalize: bool = False, interpret: bool = False,
                           carry_logw=None):
    """Run one fused propagate+reweight step for all (M, N) particles.

    Args:
      update_fn: static pure function (see module docstring).
      seed: int32 scalar PRNG seed for this step.
      y: scalar observation.
      params: tuple of per-θ (M,) arrays (model parameters).
      state_planes: tuple of (M, N) planar state components.
      n_normals: number of iid N(0,1) draws per particle the update needs.
      tile_offset: int32 scalar PRNG stream offset (θ-sharding).
      normalize: also run the per-row log-sum-exp + ESS epilogue on the
        resident block (valid for the always-resample path — see
        ``ucsv_pallas.ucsv_propagate_reweight``).
      carry_logw: optional (M, N) CARRIED log-weights added to the
        increment before the normalize epilogue — the adaptive-resampling
        route (ess_threshold < 1, VERDICT r4 #2), where the pre-propagate
        weights are not the constant −log N. Requires ``normalize=True``;
        the epilogue then normalizes lw + incr and its lse IS the step's
        incremental evidence (no −log N shift — the carry is normalized).

    Returns:
      ``normalize=False``: (new_planes tuple of (M, N), logw (M, N)).
      ``normalize=True``: (new_planes, log_norm (M, N), lse (M, 1),
      ess (M, 1)).
    """
    if carry_logw is not None and not normalize:
        raise ValueError("carry_logw requires normalize=True")
    x0 = state_planes[0]
    M, N = x0.shape
    TILE_M = 8 if M % 8 == 0 else M
    grid = (M // TILE_M,)
    n_state = len(state_planes)
    n_par = len(params)
    has_carry = carry_logw is not None
    n_in = n_par + n_state + (1 if has_carry else 0)

    def row_spec():
        return pl.BlockSpec((TILE_M, N), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def col_spec():
        return pl.BlockSpec((TILE_M, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def kernel(seed_ref, y_ref, *refs):
        par_refs = refs[:n_par]
        st_refs = refs[n_par : n_par + n_state]
        carry_ref = refs[n_par + n_state] if has_carry else None
        out_refs = refs[n_in : n_in + n_state]
        logw_ref = refs[n_in + n_state]
        norm_refs = refs[n_in + n_state + 1 :]

        pltpu.prng_seed(seed_ref[0], seed_ref[1] + pl.program_id(0))
        shape = st_refs[0].shape
        draws = []
        for _ in range((n_normals + 1) // 2):
            za, zb = _normals(shape)
            draws += [za, zb]
        normals = tuple(draws[:n_normals])
        par = tuple(r[:] for r in par_refs)  # (TM, 1) columns
        state = tuple(r[:] for r in st_refs)
        new_state, logw = update_fn(par, y_ref[0], state, normals)
        for r, v in zip(out_refs, new_state):
            r[:] = v
        if not norm_refs:
            logw_ref[:] = logw
            return
        if has_carry:
            logw = logw + carry_ref[:]
        lseo, esso = norm_refs
        mx = jnp.max(logw, axis=-1, keepdims=True)
        e = jnp.exp(logw - mx)
        s = jnp.sum(e, axis=-1, keepdims=True)
        row_lse = mx + jnp.log(s)
        logw_ref[:] = logw - row_lse
        lseo[:] = row_lse
        esso[:] = (s * s) / jnp.sum(e * e, axis=-1, keepdims=True)

    out_shape = [jax.ShapeDtypeStruct((M, N), x0.dtype)] * (n_state + 1)
    out_specs = [row_spec()] * (n_state + 1)
    if normalize:
        out_shape += [jax.ShapeDtypeStruct((M, 1), x0.dtype)] * 2
        out_specs += [col_spec()] * 2

    operands = (
        [jnp.reshape(p, (M, 1)).astype(x0.dtype) for p in params]
        + list(state_planes)
        + ([carry_logw] if has_carry else [])
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2  # seeds, y
            + [col_spec()] * n_par
            + [row_spec()] * (n_state + (1 if has_carry else 0))
        ),
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(
        jnp.stack([
            jnp.asarray(seed, jnp.int32), jnp.asarray(tile_offset, jnp.int32)
        ]),
        jnp.asarray([y], dtype=x0.dtype),
        *operands,
    )
    new_planes = tuple(outs[:n_state])
    if normalize:
        return new_planes, outs[n_state], outs[n_state + 1], outs[n_state + 2]
    return new_planes, outs[n_state]
