"""Model-construction DSL ≡ the @model macro capability (macros.jl:28-145)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sequential_monte_carlo_tpu as smc
from sequential_monte_carlo_tpu.distributions import Normal
from sequential_monte_carlo_tpu.models import ssm_model


@pytest.fixture(scope="module")
def ucsv_spec():
    """The macro docstring's UCSV program (macros.jl:9-26)."""
    return ssm_model(
        "ucsv",
        params=("gamma", "sx0", "sy0"),
        defaults=dict(x0=0.0),
        init=lambda p: dict(
            x=Normal(p["x0"], jnp.exp(0.5 * p["sx0"])),
            sx=Normal(p["sx0"], p["gamma"]),
            sy=Normal(p["sy0"], p["gamma"]),
        ),
        transition=lambda p, prev: dict(
            x=Normal(prev["x"], jnp.exp(0.5 * prev["sx"])),
            sx=Normal(prev["sx"], p["gamma"]),
            sy=Normal(prev["sy"], p["gamma"]),
        ),
        observe=lambda p, s: Normal(s["x"], jnp.exp(0.5 * s["sy"])),
    )


def test_introspection(ucsv_spec):
    # ≡ get_parameters / get_states (macros.jl:130-136)
    assert ucsv_spec.get_parameters() == ("gamma", "sx0", "sy0", "x0")
    assert ucsv_spec.get_states() == ("x", "sx", "sy")


def test_free_parameter_inference():
    """``params`` omitted → free symbols inferred by probing, in first-access
    order (≡ extract_parameters, macros.jl:190-213); defaults excluded."""
    spec = ssm_model(
        "ucsv_inferred",
        defaults=dict(x0=0.0),
        init=lambda p: dict(
            x=Normal(p["x0"], jnp.exp(0.5 * p["sx0"])),
            sx=Normal(p["sx0"], p["gamma"]),
            sy=Normal(p["sy0"], p["gamma"]),
        ),
        transition=lambda p, prev: dict(
            x=Normal(prev["x"], jnp.exp(0.5 * prev["sx"])),
            sx=Normal(prev["sx"], p["gamma"]),
            sy=Normal(prev["sy"], p["gamma"]),
        ),
        observe=lambda p, s: Normal(s["x"], jnp.exp(0.5 * s["sy"])),
    )
    assert spec.get_states() == ("x", "sx", "sy")
    # first-access order: x0 is a default → not free
    assert spec.get_parameters() == ("sx0", "gamma", "sy0", "x0")
    model = spec(jnp.asarray([-1.0, 0.2, -1.0]))
    x, y = smc.simulate(jax.random.key(0), model, 20)
    assert x.shape == (20, 3)


def test_inference_observe_only_param():
    """A parameter read only by ``observe`` is still discovered."""
    spec = ssm_model(
        "ar_noise",
        init=lambda p: dict(x=Normal(0.0, 1.0)),
        transition=lambda p, prev: dict(x=Normal(p["a"] * prev["x"], 1.0)),
        observe=lambda p, s: Normal(s["x"], p["r"]),
    )
    assert spec.get_parameters() == ("a", "r")
    assert spec.get_states() == ("x",)


def test_wrong_theta_length(ucsv_spec):
    with pytest.raises(ValueError, match="expected 3 free parameters"):
        ucsv_spec(jnp.zeros(5))


def test_simulate_and_filter(ucsv_spec):
    model = ucsv_spec(jnp.asarray([0.2, -1.0, -1.0]))
    assert model.state_dim == 3
    x, y = smc.simulate(jax.random.key(0), model, 50)
    assert x.shape == (50, 3)
    st, z = smc.log_likelihood(jax.random.key(1), model, 512, y)
    assert np.isfinite(float(z))


def test_default_override(ucsv_spec):
    m = ucsv_spec(jnp.asarray([0.2, -1.0, -1.0]), x0=5.0)
    x0 = m.initial_distribution().sample(jax.random.key(0), (4000,))[:, 0]
    assert abs(float(x0.mean()) - 5.0) < 0.1


def test_dsl_matches_native_ucsv():
    """DSL-built UCSV ≡ hand-written UCSVModel: same logZ distribution."""
    spec = ssm_model(
        "ucsv4",
        params=("gamma", "x0", "lse0", "lsn0"),
        init=lambda p: dict(
            x=Normal(p["x0"], jnp.exp(0.5 * p["lse0"])),
            lse=Normal(p["lse0"], p["gamma"]),
            lsn=Normal(p["lsn0"], p["gamma"]),
        ),
        transition=lambda p, prev: dict(
            x=Normal(prev["x"], jnp.exp(0.5 * prev["lse"])),
            lse=Normal(prev["lse"], p["gamma"]),
            lsn=Normal(prev["lsn"], p["gamma"]),
        ),
        observe=lambda p, s: Normal(s["x"], jnp.exp(0.5 * s["lsn"])),
    )
    theta = jnp.asarray([0.2, 3.0, -1.0, -1.0])
    native = smc.ucsv_model(theta)
    dsl = spec(theta)
    _, y = smc.simulate(jax.random.key(3), native, 60)
    zs_native = np.asarray(
        jax.vmap(lambda k: smc.log_likelihood(k, native, 512, y)[1])(
            jax.random.split(jax.random.key(4), 8)
        )
    )
    zs_dsl = np.asarray(
        jax.vmap(lambda k: smc.log_likelihood(k, dsl, 512, y)[1])(
            jax.random.split(jax.random.key(5), 8)
        )
    )
    assert abs(zs_native.mean() - zs_dsl.mean()) < 2.0


def test_single_state_model(ucsv_spec):
    """Single-state DSL model gets a (1,)-axis state (macros.jl:95-99)."""
    spec = ssm_model(
        "ar1",
        params=("a", "q"),
        init=lambda p: dict(x=Normal(jnp.asarray(0.0), jnp.asarray(1.0))),
        transition=lambda p, prev: dict(x=Normal(p["a"] * prev["x"], jnp.sqrt(p["q"]))),
        observe=lambda p, s: Normal(s["x"], jnp.asarray(1.0)),
    )
    m = spec(jnp.asarray([0.5, 0.9]))
    x, y = smc.simulate(jax.random.key(0), m, 30)
    assert x.shape == (30, 1)


def test_dsl_in_smc2(ucsv_spec):
    """DSL constructor works as an SMC² model_fn (vmappable pytree)."""
    prior = smc.product_distribution(
        [
            smc.Uniform(jnp.asarray(0.01), jnp.asarray(1.0)),
            smc.Normal(jnp.asarray(-1.0), jnp.asarray(1.0)),
            smc.Normal(jnp.asarray(-1.0), jnp.asarray(1.0)),
        ]
    )
    m_true = ucsv_spec(jnp.asarray([0.2, -1.0, -1.0]))
    _, y = smc.simulate(jax.random.key(6), m_true, 30)
    sampler = smc.SMC2(
        ucsv_spec, prior, smc.SMCConfig(n_particles=64, n_theta=32, chain=2)
    )
    state, _ = sampler.run(jax.random.key(7), y)
    assert np.isfinite(float(state.ess))


def test_linear_dsl_builds_kalman_capable_model():
    """linear_ssm_model realizes the reference's unimplemented '@model
    linear' variant (macros.jl:148-151): declared model gets the exact
    Kalman filter."""
    from sequential_monte_carlo_tpu.models import linear_ssm_model
    from sequential_monte_carlo_tpu.models.linear_gaussian import (
        LinearGaussianModel,
    )

    ar1 = linear_ssm_model(
        "ar1", params=("a", "q", "r"),
        A=lambda p: p["a"], B=lambda p: 1.0,
        Q=lambda p: p["q"], R=lambda p: p["r"],
        x0=lambda p: 0.0, sigma0=lambda p: 1.0,
    )
    assert ar1.get_parameters() == ("a", "q", "r")
    model = ar1(jnp.asarray([0.5, 0.9, 0.8]))
    assert isinstance(model, LinearGaussianModel)
    ref = smc.lg_model(jnp.asarray([0.5, 0.9, 0.8]))
    _, y = smc.simulate(jax.random.key(0), ref, 50)
    (_, _), z1 = smc.kalman_log_likelihood(model, y)
    (_, _), z2 = smc.kalman_log_likelihood(ref, y)
    assert float(z1) == pytest.approx(float(z2), rel=1e-5)
    # and works inside IBIS
    prior = smc.product_distribution([
        smc.TruncatedNormal(jnp.asarray(0.0), jnp.asarray(1.0),
                            jnp.asarray(-1.0), jnp.asarray(1.0)),
        smc.LogNormal(jnp.asarray(0.0), jnp.asarray(1.0)),
        smc.LogNormal(jnp.asarray(0.0), jnp.asarray(1.0)),
    ])
    ibis = smc.IBIS(ar1, prior, smc.SMCConfig(n_theta=32, chain=2))
    state, _ = ibis.run(jax.random.key(1), y)
    assert np.isfinite(float(state.ess))
