"""Conditional SMC + particle Gibbs — validated against the exact
oracles: CSMC's invariant distribution p(x_{1:T} | y, θ) against the RTS
smoother, and the PG θ-chain against the Kalman prior-IS posterior (the
same oracle as tests/test_samplers.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sequential_monte_carlo_tpu as smc


@pytest.fixture(scope="module")
def lg_setup():
    theta = jnp.array([0.5, 0.9, 0.8])
    model = smc.lg_model(theta)
    _, y = smc.simulate(jax.random.key(1998), model, 40)
    ms, ps = smc.kalman_smooth(model, y)
    return model, y, np.asarray(ms)[:, 0], np.sqrt(np.asarray(ps)[:, 0, 0])


@pytest.mark.parametrize("method", ["bs", "as"])
def test_csmc_invariance_matches_rts(lg_setup, method):
    """Iterating the CSMC kernel at fixed θ samples p(x_{1:T} | y, θ):
    the pooled path mean over the chain's tail must match the exact RTS
    smoothed mean within MC error."""
    model, y, ms, sd = lg_setup
    n, n_iter, burn = 256, 120, 40

    def sweep(path, k):
        out = smc.csmc_sweep(k, model, n, y, path, method=method)
        return out.path, out.path

    path0 = jnp.zeros((y.shape[0], 1))  # deliberately bad start
    keys = jax.random.split(jax.random.key(7), n_iter)
    _, paths = jax.lax.scan(sweep, path0, keys)
    pooled = np.asarray(jnp.mean(paths[burn:, :, 0], axis=0))

    # tail of 80 correlated draws; CSMC-BS/AS at N=256 mixes fast on this
    # model, so the pooled-mean SE is well under 0.25·sd per step
    err = np.abs(pooled - ms) / sd
    assert err.max() < 0.75, (err.max(), err.mean())
    assert err.mean() < 0.3, err.mean()


def test_csmc_pins_reference_slot(lg_setup):
    """Slot 0 of every forward cloud IS the conditioned trajectory."""
    model, y, _, _ = lg_setup
    ref = smc.simulate(jax.random.key(3), model, y.shape[0])[0]
    cloud, anc = smc.csmc_forward(jax.random.key(0), model, 64, y, ref)
    np.testing.assert_allclose(
        np.asarray(cloud.particles[:, 0, :]), np.asarray(ref)
    )
    assert anc.shape == (y.shape[0] - 1, 64)
    assert anc.dtype == jnp.int32
    # without ancestor sampling, slot 0's ancestor is slot 0
    assert np.all(np.asarray(anc[:, 0]) == 0)


def test_csmc_reproducible_and_validates_method(lg_setup):
    model, y, _, _ = lg_setup
    ref = jnp.zeros((y.shape[0], 1))
    a = smc.csmc_sweep(jax.random.key(5), model, 64, y, ref)
    b = smc.csmc_sweep(jax.random.key(5), model, 64, y, ref)
    np.testing.assert_array_equal(np.asarray(a.path), np.asarray(b.path))
    with pytest.raises(ValueError, match="method"):
        smc.csmc_sweep(jax.random.key(0), model, 64, y, ref, method="nope")


@pytest.fixture(scope="module")
def pg_setup():
    prior = smc.product_distribution(
        [
            smc.TruncatedNormal(
                jnp.asarray(0.0), jnp.asarray(1.0),
                jnp.asarray(-1.0), jnp.asarray(1.0),
            ),
            smc.LogNormal(jnp.asarray(0.0), jnp.asarray(1.0)),
            smc.LogNormal(jnp.asarray(0.0), jnp.asarray(1.0)),
        ]
    )
    m_true = smc.lg_model(jnp.array([0.5, 0.9, 0.8]))
    _, y = smc.simulate(jax.random.key(1998), m_true, 60)
    theta = prior.sample(jax.random.key(77), (100_000,))
    models = jax.vmap(smc.lg_model)(theta)
    logz = jax.vmap(lambda m: smc.kalman_log_likelihood(m, y)[1])(models)
    w = jax.nn.softmax(logz)
    return prior, y, np.asarray(w @ theta)


def test_particle_gibbs_posterior_matches_oracle(pg_setup):
    prior, y, oracle = pg_setup
    cfg = smc.PGConfig(n_particles=128, sweeps=400, chain=3)
    res = smc.particle_gibbs(jax.random.key(11), smc.lg_model, prior, y, cfg)
    assert res.theta.shape == (400, 3)
    # diminishing adaptation steers the mean acceptance toward 0.234
    assert 0.1 < float(res.acc_ratio) < 0.6, float(res.acc_ratio)
    got = np.asarray(jnp.mean(res.theta[150:], axis=0))
    assert np.all(np.abs(got - oracle) < 0.3), (got, oracle)


def test_particle_gibbs_on_nonlinear_ucsv():
    """PG composes with the nonlinear 3-dim UC-SV model (TupleProduct
    transition) — the model class CSMC exists for, where no Kalman
    conditional is available."""
    m_true = smc.ucsv_model(jnp.array([0.2, 3.0, 0.5, 0.5]))
    _, y = smc.simulate(jax.random.key(1), m_true, 50)
    prior = smc.product_distribution(
        [
            smc.Uniform(jnp.asarray(0.0), jnp.asarray(1.0)),
            smc.Normal(jnp.asarray(3.0), jnp.asarray(2.0)),
            smc.Uniform(jnp.asarray(0.0), jnp.asarray(2.0)),
            smc.Uniform(jnp.asarray(0.0), jnp.asarray(2.0)),
        ]
    )
    cfg = smc.PGConfig(n_particles=64, sweeps=40, chain=2, method="as")
    res = smc.particle_gibbs(jax.random.key(4), smc.ucsv_model, prior, y, cfg)
    assert res.theta.shape == (40, 4)
    assert np.isfinite(np.asarray(res.theta)).all()
    assert np.isfinite(np.asarray(res.final_path)).all()
    assert prior.in_support(res.theta[-1])


def test_particle_gibbs_rejects_zero_chain(pg_setup):
    prior, y, _ = pg_setup
    with pytest.raises(ValueError, match="chain"):
        smc.particle_gibbs(
            jax.random.key(0), smc.lg_model, prior, y,
            smc.PGConfig(n_particles=16, sweeps=2, chain=0),
        )


def test_particle_gibbs_collect_paths_and_reproducible(pg_setup):
    prior, y, _ = pg_setup
    cfg = smc.PGConfig(n_particles=64, sweeps=8, collect_paths=True)
    a = smc.particle_gibbs(jax.random.key(2), smc.lg_model, prior, y, cfg)
    b = smc.particle_gibbs(jax.random.key(2), smc.lg_model, prior, y, cfg)
    assert a.paths.shape == (8, y.shape[0], 1)
    np.testing.assert_array_equal(np.asarray(a.theta), np.asarray(b.theta))
    np.testing.assert_array_equal(
        np.asarray(a.paths[-1]), np.asarray(a.final_path)
    )
