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


def test_midrun_segmented_checkpoint_resume_bitwise(tmp_path):
    """Mid-run checkpoint/resume as a first-class recovery path (VERDICT
    r4 #5): saving a segmented grow-mode run at step k — INCLUDING at the
    step where an exchange_pending doubling trigger is raised but not yet
    serviced — and resuming from the restored state reproduces the
    uninterrupted run bitwise (final state AND per-step infos)."""
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
    cfg = smc.SMCConfig(
        n_particles=64, n_theta=32, chain=2, ess_threshold=0.5,
        acc_threshold=1.1, exchange_max_n=128,  # grow mode, doublings fire
    )
    sampler = smc.SMC2(smc.lg_model, prior, cfg)

    full_state, full_infos = sampler.run_segmented(
        jax.random.key(1), y, segment_size=8
    )
    assert int(full_state.active_n) > 64  # at least one doubling fired

    # locate the step at which the first doubling trigger is RAISED, so one
    # split lands exactly on an unserviced exchange_pending state
    st = sampler.init(jax.random.key(1), y)
    k_pend = None
    for i in range(1, y.shape[0] - 1):
        st, info = sampler.step(st, y)
        if bool(st.exchange_pending):
            k_pend = i
            break
        st = sampler.maybe_exchange(st, y, info)
    assert k_pend is not None, "config must fire a doubling for this test"

    def assert_states_equal(a, b):
        for la, lb in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
        ):
            if jnp.issubdtype(jnp.asarray(la).dtype, jax.dtypes.prng_key):
                assert jnp.all(
                    jax.random.key_data(la) == jax.random.key_data(lb)
                )
            else:
                np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    for k in (k_pend, 5, 17):
        s1, i1 = sampler.run_segmented(
            jax.random.key(1), y, segment_size=8, max_steps=k
        )
        if k == k_pend:
            assert bool(s1.exchange_pending)  # saved mid-flight, unserviced
        path = os.path.join(tmp_path, f"mid{k}.npz")
        save_checkpoint(path, s1)
        restored = load_checkpoint(path, s1)
        s2, i2 = sampler.run_segmented(
            None, y, segment_size=8, state=restored
        )
        assert_states_equal(s2, full_state)
        cat = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), i1, i2
        )
        for la, lb in zip(
            jax.tree_util.tree_leaves(cat),
            jax.tree_util.tree_leaves(full_infos),
        ):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    # resuming a FINISHED run keeps the (state, infos) contract: infos is
    # an empty (0-length) StepInfo pytree, not None, so accumulation
    # loops that tree-concatenate across resumes don't crash (r5 review)
    s3, i3 = sampler.run_segmented(None, y, segment_size=8, state=s2)
    assert i3 is not None and int(i3.ess.shape[0]) == 0
    jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0), i2, i3)
    assert_states_equal(s3, s2)
