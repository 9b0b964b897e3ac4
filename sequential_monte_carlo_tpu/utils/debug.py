"""Numerical-debugging helpers (SURVEY.md §5.2).

The reference has data patterns a sanitizer would flag (shared arrays from
``fill``, ω/logZ aliasing, global RNG under @threads — smc_samplers.jl:41,
297,114). The pure-functional design removes that class; what remains worth
guarding is numerics: NaN/Inf creep in log-weights and degenerate clouds.
"""
from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Enable jax's NaN debugger for a scope: any NaN-producing primitive
    raises with the offending jaxpr (slow — use for diagnosis only)."""
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


def check_state(state, name: str = "state"):
    """Host-side structural check of a sampler/filter state pytree: asserts
    all leaves finite where they should be. Returns a dict of diagnostics."""
    diag = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(state)[0]:
        key = name + "".join(str(p) for p in path)
        arr = jnp.asarray(leaf)
        if jnp.issubdtype(arr.dtype, jnp.floating):
            diag[key] = {
                "finite_frac": float(jnp.mean(jnp.isfinite(arr))),
                "min": float(jnp.min(arr)),
                "max": float(jnp.max(arr)),
            }
    return diag


def assert_finite_weights(log_w, what: str = "log-weights"):
    """In-graph guard: error out (jax.debug) if a weight vector is fully
    degenerate. Usable inside jit via jax.debug.check-like printing."""
    finite = jnp.any(jnp.isfinite(log_w), axis=-1)
    jax.debug.print(
        "[smc-debug] {} fully degenerate rows: {}",
        what,
        jnp.sum(~finite),
        ordered=False,
    )
    return log_w
