"""Checkpoint/resume: sampler state round-trips through disk and resumes
bitwise-identically (SURVEY.md §5.4)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

import sequential_monte_carlo_tpu as smc
from sequential_monte_carlo_tpu.utils.checkpoint import (
    load_checkpoint,
    save_checkpoint,
)


def _sampler_and_y():
    prior = smc.product_distribution(
        [
            smc.TruncatedNormal(jnp.asarray(0.0), jnp.asarray(1.0),
                                jnp.asarray(-1.0), jnp.asarray(1.0)),
            smc.LogNormal(jnp.asarray(0.0), jnp.asarray(1.0)),
            smc.LogNormal(jnp.asarray(0.0), jnp.asarray(1.0)),
        ]
    )
    m_true = smc.lg_model(jnp.array([0.5, 0.9, 0.8]))
    _, y = smc.simulate(jax.random.key(0), m_true, 30)
    sampler = smc.SMC2(
        smc.lg_model, prior, smc.SMCConfig(n_particles=64, n_theta=32, chain=2)
    )
    return sampler, y


def test_checkpoint_roundtrip_and_resume(tmp_path):
    sampler, y = _sampler_and_y()
    state = sampler.init(jax.random.key(1), y)
    for _ in range(10):
        state, _ = sampler.step(state, y)

    path = os.path.join(tmp_path, "ckpt.npz")
    save_checkpoint(path, state)
    restored = load_checkpoint(path, state)

    # bitwise round-trip
    for a, b in zip(
        jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)
    ):
        if jnp.issubdtype(jnp.asarray(a).dtype, jax.dtypes.prng_key):
            assert jnp.all(
                jax.random.key_data(a) == jax.random.key_data(b)
            )
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resume: continuing from the restored state matches continuing live
    live, _ = sampler.step(state, y)
    resumed, _ = sampler.step(restored, y)
    np.testing.assert_array_equal(np.asarray(live.theta), np.asarray(resumed.theta))
    np.testing.assert_array_equal(
        np.asarray(live.log_omega), np.asarray(resumed.log_omega)
    )


def test_checkpoint_ibis(tmp_path):
    prior = smc.product_distribution(
        [
            smc.TruncatedNormal(jnp.asarray(0.0), jnp.asarray(1.0),
                                jnp.asarray(-1.0), jnp.asarray(1.0)),
            smc.LogNormal(jnp.asarray(0.0), jnp.asarray(1.0)),
            smc.LogNormal(jnp.asarray(0.0), jnp.asarray(1.0)),
        ]
    )
    m_true = smc.lg_model(jnp.array([0.5, 0.9, 0.8]))
    _, y = smc.simulate(jax.random.key(0), m_true, 20)
    ibis = smc.IBIS(smc.lg_model, prior, smc.SMCConfig(n_theta=32, chain=2))
    state = ibis.init(jax.random.key(2), y)
    path = os.path.join(tmp_path, "ibis.npz")
    save_checkpoint(path, state)
    restored = load_checkpoint(path, state)
    np.testing.assert_array_equal(np.asarray(state.mean), np.asarray(restored.mean))


def test_orbax_backend_roundtrip(tmp_path):
    try:
        import orbax.checkpoint  # noqa: F401
    except ImportError:
        import pytest

        pytest.skip("orbax not installed")
    from sequential_monte_carlo_tpu.utils.checkpoint import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    sampler, y = _sampler_and_y()
    state = sampler.init(jax.random.key(5), y)
    path = os.path.join(tmp_path, "orbax_ckpt")
    save_checkpoint_orbax(path, state)
    restored = load_checkpoint_orbax(path, state)
    np.testing.assert_array_equal(np.asarray(state.theta), np.asarray(restored.theta))
    # resumes identically
    a, _ = sampler.step(state, y)
    b, _ = sampler.step(restored, y)
    np.testing.assert_array_equal(np.asarray(a.theta), np.asarray(b.theta))
