"""Checkpoint/resume for sampler states (SURVEY.md §5.4).

The reference has no persistence, but its online API is designed for it
(the sampler object is self-contained between ``smc²!`` calls —
README.md:95-104; the example deep-copies snapshots mid-run,
examples/inflation_example.jl:70-73). Here the sampler state IS a pytree,
so checkpointing is serialization: orbax when available, a numpy ``.npz``
fallback otherwise. Resume = feed the restored pytree back into the jitted
step (works across hosts — combine with ``parallel.shard_state``).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_with_paths(state):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return leaves, treedef


def save_checkpoint(path: str, state) -> None:
    """Write a sampler state (any pytree) to ``path`` (.npz archive)."""
    leaves, _ = _flatten_with_paths(state)
    arrays = {}
    for i, leaf in enumerate(leaves):
        arr = np.asarray(
            jax.random.key_data(leaf)
            if jnp.issubdtype(jnp.asarray(leaf).dtype, jax.dtypes.prng_key)
            else leaf
        )
        arrays[f"leaf_{i}"] = arr
        arrays[f"leaf_{i}_is_key"] = np.asarray(
            jnp.issubdtype(jnp.asarray(leaf).dtype, jax.dtypes.prng_key)
        )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **arrays)


def load_checkpoint(path: str, template):
    """Restore a state saved by :func:`save_checkpoint`; ``template`` is any
    state with the same structure (e.g. a freshly-built init state)."""
    data = np.load(path)
    leaves, treedef = _flatten_with_paths(template)
    restored = []
    for i, leaf in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if bool(data[f"leaf_{i}_is_key"]):
            restored.append(jax.random.wrap_key_data(jnp.asarray(arr)))
        else:
            restored.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, restored)


# -- orbax backend (multi-host-capable, async) -------------------------------

def save_checkpoint_orbax(path: str, state) -> None:
    """Orbax-backed save — use for multi-host runs (each host writes its
    shard) or when async checkpointing matters; the npz path is the
    zero-dependency default."""
    import orbax.checkpoint as ocp

    with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
        ckptr.save(os.path.abspath(path), _dekey(state), force=True)


def load_checkpoint_orbax(path: str, template):
    import orbax.checkpoint as ocp

    with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
        restored = ckptr.restore(os.path.abspath(path), _dekey(template))
    return _rekey(restored, template)


def _dekey(state):
    """PRNG keys → raw uint32 data (orbax can't serialize key arrays)."""
    return jax.tree_util.tree_map(
        lambda leaf: jax.random.key_data(leaf)
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jax.dtypes.prng_key)
        else leaf,
        state,
    )


def _rekey(restored, template):
    return jax.tree_util.tree_map(
        lambda r, t: jax.random.wrap_key_data(jnp.asarray(r))
        if jnp.issubdtype(jnp.asarray(t).dtype, jax.dtypes.prng_key)
        else jnp.asarray(r),
        restored,
        template,
    )
