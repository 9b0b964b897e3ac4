"""L4 distributed: mesh-sharded SMC² on the 8-device virtual CPU mesh
(SURVEY.md §4: 'multi-device tests on CPU via xla_force_host_platform_device_count')."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sequential_monte_carlo_tpu as smc
from sequential_monte_carlo_tpu.parallel import (
    PARTICLE_AXIS,
    THETA_AXIS,
    ShardedSMC2,
    make_mesh,
    shard_state,
    smc2_state_shardings,
)


@pytest.fixture(scope="module")
def setup():
    prior = smc.product_distribution(
        [
            smc.TruncatedNormal(jnp.asarray(0.0), jnp.asarray(1.0),
                                jnp.asarray(-1.0), jnp.asarray(1.0)),
            smc.LogNormal(jnp.asarray(0.0), jnp.asarray(1.0)),
            smc.LogNormal(jnp.asarray(0.0), jnp.asarray(1.0)),
        ]
    )
    m_true = smc.lg_model(jnp.array([0.5, 0.9, 0.8]))
    _, y = smc.simulate(jax.random.key(1998), m_true, 40)
    cfg = smc.SMCConfig(n_particles=128, n_theta=64, chain=2, ess_threshold=0.5)
    return prior, y, cfg


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh(n_theta_shards=4, n_particle_shards=2)
    assert mesh.shape[THETA_AXIS] == 4
    assert mesh.shape[PARTICLE_AXIS] == 2
    with pytest.raises(ValueError):
        make_mesh(n_theta_shards=3, n_particle_shards=2)


def test_sharded_state_placement(setup):
    prior, y, cfg = setup
    mesh = make_mesh(4, 2)
    sh = ShardedSMC2(smc.SMC2(smc.lg_model, prior, cfg), mesh)
    state = sh.init(jax.random.key(0), y)
    # θ sharded over the theta axis, particles over (theta, particle)
    assert state.theta.sharding.spec == jax.sharding.PartitionSpec(THETA_AXIS, None)
    assert state.particles.sharding.spec == jax.sharding.PartitionSpec(
        THETA_AXIS, PARTICLE_AXIS, None
    )


def test_sharded_matches_single_device(setup):
    """Sharding must not change the numerics (same keys ⇒ same posterior)."""
    prior, y, cfg = setup
    mesh = make_mesh(4, 2)
    sh = ShardedSMC2(smc.SMC2(smc.lg_model, prior, cfg), mesh)
    state = sh.init(jax.random.key(0), y)
    for _ in range(1, y.shape[0]):
        state, _ = sh.step(state, y)

    base = smc.SMC2(smc.lg_model, prior, cfg)
    ref = base.init(jax.random.key(0), y)
    for _ in range(1, y.shape[0]):
        ref, _ = base.step(ref, y)

    np.testing.assert_allclose(
        np.asarray(state.theta), np.asarray(ref.theta), rtol=1e-3, atol=1e-4
    )
    assert abs(float(state.ess) - float(ref.ess)) < 1.0


def test_sharded_fused_run(setup):
    prior, y, cfg = setup
    mesh = make_mesh(8, 1)
    sh = ShardedSMC2(smc.SMC2(smc.lg_model, prior, cfg), mesh)
    state, infos = sh.run(jax.random.key(1), y)
    assert np.isfinite(float(state.ess))
    assert infos.ess.shape == (39,)


def test_reshard_roundtrip(setup):
    prior, y, cfg = setup
    base = smc.SMC2(smc.lg_model, prior, cfg)
    state = base.init(jax.random.key(2), y)
    mesh = make_mesh(2, 4)
    sh = ShardedSMC2(base, mesh)
    placed = sh.reshard(state)
    np.testing.assert_array_equal(np.asarray(placed.theta), np.asarray(state.theta))
    t_before = int(state.t)  # read before step: donation may alias buffers
    stepped, _ = sh.step(placed, y)
    assert int(stepped.t) == t_before + 1


def test_theta_only_mesh_ibis(setup):
    """IBIS θ-sharding over all 8 devices."""
    prior, y, cfg = setup
    from sequential_monte_carlo_tpu.parallel import ibis_state_shardings

    mesh = make_mesh(8, 1)
    ibis = smc.IBIS(smc.lg_model, prior, smc.SMCConfig(n_theta=64, chain=2))
    state = ibis.init(jax.random.key(3), y)
    placed = shard_state(state, ibis_state_shardings(mesh))
    stepped, _ = ibis.step(placed, y)
    assert np.isfinite(float(stepped.ess))
