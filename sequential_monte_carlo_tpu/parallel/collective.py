"""Manual-collective building blocks for particle-axis sharding (L4).

The GSPMD path (``parallel/sharded.py``) lets XLA insert collectives; this
module is the explicit ``shard_map`` formulation of the same algorithms —
the collectives named in SURVEY.md §5.8 written out by hand:

  * ``pmax``/``psum``   — log-sum-exp normalize + ESS across particle shards
  * ``all_gather``      — global CDF assembly for distributed resampling and
                          cross-shard ancestor exchange (O(N) scalars; for
                          the reference's N ≤ 8192 this is ≤ 32 KB over ICI)
  * ``psum`` over θ     — global θ-ESS / evidence across hosts

Usage: wrap a step in ``jax.shard_map`` with the particle axis mapped to a
mesh axis and call these inside. ``distributed_pf_step`` is a worked example
used by the tests on the virtual 8-device mesh.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.weights import normalize_sharded  # noqa: F401  (re-export)


def distributed_systematic_resample(key, w_local, axis_name: str):
    """Systematic resampling of a particle axis sharded over ``axis_name``.

    Each shard holds ``n_local`` of N = n_local · n_shards particles with
    *globally* normalized weights. Returns, per shard, the GLOBAL ancestor
    indices for its own output slice (sorted, since the systematic grid is
    sorted) — combine with :func:`gather_global` to fetch the particles.

    One ``all_gather`` of the local CDFs builds the global CDF; the shared
    uniform offset u0 comes from the (replicated) key, so every shard draws
    the same grid — no cross-shard RNG coordination needed.
    """
    n_local = w_local.shape[-1]
    idx = jax.lax.axis_index(axis_name)
    n_shards = jax.lax.axis_size(axis_name)
    n_total = n_local * n_shards

    # global CDF: gather local weights (tiny), cumsum once per shard
    w_all = jax.lax.all_gather(w_local, axis_name)  # (n_shards, n_local)
    cdf = jnp.cumsum(w_all.reshape(-1))
    cdf = cdf / cdf[-1]

    u0 = jax.random.uniform(key, (), dtype=w_local.dtype)
    i0 = idx * n_local
    u = (i0 + jnp.arange(n_local, dtype=w_local.dtype) + u0) / n_total
    anc = jnp.searchsorted(cdf, u, side="left")
    return jnp.clip(anc, 0, n_total - 1).astype(jnp.int32)


def gather_global(x_local, ancestors_global, axis_name: str):
    """Fetch particles by GLOBAL ancestor index across shards.

    ``all_gather`` + local take: the ancestor exchange is all-to-all in
    general (a global resample can move any particle to any shard). For the
    particle counts this framework targets (N ≤ 16k per θ) the gathered
    buffer is ≤ a few hundred KB over ICI; a ``ppermute`` ring pipeline is
    the scale-out upgrade path.
    """
    x_all = jax.lax.all_gather(x_local, axis_name)  # (n_shards, n_local, ...)
    x_flat = x_all.reshape((-1,) + x_all.shape[2:])
    return jnp.take(x_flat, ancestors_global, axis=0)


def distributed_pf_step(key, model, x_local, log_w_local, y, axis_name: str):
    """One bootstrap-PF step with the particle axis sharded over a mesh axis.

    The shard-level twin of ``ops.particle_filter.pf_step`` (always-resample
    semantics): normalize with ``pmax``/``psum``, resample with the global
    systematic grid, exchange ancestors, propagate/reweight locally.
    Returns (x_local', log_w_local', log_mean, ess) — log_mean/ess are
    replicated scalars.
    """
    n_local = x_local.shape[0]
    n_total = n_local * jax.lax.psum(1, axis_name)
    k_res, k_prop = jax.random.split(key)
    # fold in the shard index so each shard propagates with its own stream
    k_prop = jax.random.fold_in(k_prop, jax.lax.axis_index(axis_name))

    # globally-normalized weights
    maxw = jax.lax.pmax(jnp.max(log_w_local), axis_name)
    w = jnp.exp(log_w_local - maxw)
    sumw = jax.lax.psum(jnp.sum(w), axis_name)
    w = w / sumw

    anc = distributed_systematic_resample(k_res, w, axis_name)
    xp = gather_global(x_local, anc, axis_name)

    x_new = model.transition_distribution(xp).sample(k_prop)
    incr = model.observation_distribution(x_new).log_prob(y)

    # incremental evidence: log(1/N Σ g) across shards
    gmax = jax.lax.pmax(jnp.max(incr), axis_name)
    gsum = jax.lax.psum(jnp.sum(jnp.exp(incr - gmax)), axis_name)
    log_mean = gmax + jnp.log(gsum) - jnp.log(jnp.asarray(n_total, x_local.dtype))

    log_norm = incr - (gmax + jnp.log(gsum))
    ess = 1.0 / jax.lax.psum(jnp.sum(jnp.exp(2.0 * log_norm)), axis_name)
    return x_new, log_norm, log_mean, ess
