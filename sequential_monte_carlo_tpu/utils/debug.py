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
    """Guard that no weight row is fully degenerate (all −inf/NaN) — raises.

    Eager (outside jit): raises ``FloatingPointError`` immediately. Inside
    jit: uses ``checkify.check``, so wrap the caller with
    ``jax.experimental.checkify.checkify`` and raise via ``err.throw()``::

        checked = checkify.checkify(step_fn)
        err, out = jax.jit(checked)(state, y)
        err.throw()   # raises if any weight row degenerated
    """
    from jax.experimental import checkify

    log_w = jnp.asarray(log_w)
    finite_rows = jnp.any(jnp.isfinite(log_w), axis=-1)
    n_bad = jnp.sum(~finite_rows)
    if isinstance(n_bad, jax.core.Tracer):
        checkify.check(
            jnp.all(finite_rows),
            what + ": {n} fully degenerate weight row(s)",
            n=n_bad,
        )
    elif int(n_bad):
        raise FloatingPointError(
            f"{what}: {int(n_bad)} fully degenerate weight row(s)"
        )
    return log_w
