"""L2.5 batched filter + L5 Pallas resample kernel (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sequential_monte_carlo_tpu as smc
from sequential_monte_carlo_tpu.kernels.resample_pallas import (
    resample_gather,
    stratified_uniforms,
    systematic_uniforms,
)
from sequential_monte_carlo_tpu.ops.batched_filter import (
    batched_log_likelihood,
    batched_log_likelihood_masked,
    batched_pf_init,
    batched_pf_step,
)
from sequential_monte_carlo_tpu.ops.resampling import _inverse_cdf


@pytest.fixture(scope="module")
def setup():
    m_true = smc.lg_model(jnp.array([0.5, 0.9, 0.8]))
    _, y = smc.simulate(jax.random.key(7), m_true, 60)
    M = 16
    thetas = jnp.stack(
        [jnp.asarray([0.5, 0.9, 0.8]) * (1 + 0.02 * i) for i in range(M)]
    )
    models = jax.vmap(smc.lg_model)(thetas)
    return models, y, M


def test_batched_init_shapes(setup):
    models, y, M = setup
    out = batched_pf_init(jax.random.key(0), models, 128, M, y[0])
    assert out.particles.shape == (M, 128, 1)
    assert out.log_weights.shape == (M, 128)
    assert out.log_mean.shape == (M,)
    np.testing.assert_allclose(
        np.asarray(jnp.exp(out.log_weights).sum(-1)), np.ones(M), rtol=1e-4
    )


def test_batched_step_and_ll_match_kalman(setup):
    models, y, M = setup
    particles, log_w, logz = batched_log_likelihood(
        jax.random.key(1), models, 512, M, y
    )
    kz = jax.vmap(lambda m: smc.kalman_log_likelihood(m, y)[1])(models)
    assert np.abs(np.asarray(logz - kz)).max() < 2.5


def test_batched_masked_equals_prefix_target(setup):
    models, y, M = setup
    t = 30
    mask = (jnp.arange(60) < t).astype(y.dtype)
    _, _, logz = batched_log_likelihood_masked(
        jax.random.key(2), models, 512, M, y, mask
    )
    kz = jax.vmap(lambda m: smc.kalman_log_likelihood(m, y[:t])[1])(models)
    assert np.abs(np.asarray(logz - kz)).max() < 2.5


def test_batched_adaptive_resampling(setup):
    models, y, M = setup
    cfg = smc.PFConfig("systematic", 0.5)
    _, _, logz = batched_log_likelihood(jax.random.key(3), models, 256, M, y, cfg)
    kz = jax.vmap(lambda m: smc.kalman_log_likelihood(m, y)[1])(models)
    assert np.abs(np.asarray(logz - kz)).max() < 3.0


# ---- Pallas kernel (interpret mode) ----------------------------------------

@pytest.mark.parametrize("make_u", [systematic_uniforms, stratified_uniforms])
def test_resample_gather_bitwise(make_u):
    M, N, C = 4, 256, 3
    key = jax.random.key(0)
    w = jax.nn.softmax(jax.random.normal(key, (M, N)) * 2)
    xs = jax.random.normal(jax.random.key(1), (M, C, N))
    u = make_u(jax.random.key(2), M, N)
    out = resample_gather(u, w, xs, interpret=True)
    anc = jax.vmap(lambda uu, ww: _inverse_cdf(uu, ww))(u, w)
    ref = jax.vmap(lambda x, a: x[:, a])(xs, anc)
    assert bool(jnp.all(out == ref))


def test_resample_gather_degenerate_weight():
    """Point-mass weights: every output particle is the heavy one."""
    M, N, C = 2, 256, 2
    w = jnp.zeros((M, N)).at[:, 17].set(1.0)
    xs = jax.random.normal(jax.random.key(1), (M, C, N))
    u = systematic_uniforms(jax.random.key(2), M, N)
    out = resample_gather(u, w, xs, interpret=True)
    expect = jnp.broadcast_to(xs[:, :, 17:18], (M, C, N))
    assert bool(jnp.all(out == expect))


def test_resample_gather_uniform_weights_identity_counts():
    """Uniform weights + systematic grid ⇒ every particle exactly once."""
    M, N, C = 2, 128, 1
    w = jnp.full((M, N), 1.0 / N)
    xs = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.float32)[None, None, :], (M, C, N)
    )
    u = systematic_uniforms(jax.random.key(0), M, N)
    out = resample_gather(u, w, xs, interpret=True)
    # ancestors are 0..N-1 in order
    np.testing.assert_array_equal(
        np.asarray(out[0, 0]), np.arange(N, dtype=np.float32)
    )


def test_resample_gather_c_padding():
    """C not a multiple of 8 pads internally and unpads on return."""
    M, N, C = 2, 128, 5
    w = jax.nn.softmax(jax.random.normal(jax.random.key(0), (M, N)))
    xs = jax.random.normal(jax.random.key(1), (M, C, N))
    u = systematic_uniforms(jax.random.key(2), M, N)
    out = resample_gather(u, w, xs, interpret=True)
    assert out.shape == (M, C, N)


def test_fused_config_off_on_cpu_matches_statistics(setup):
    """'off' (XLA path) and 'on' (interpret Pallas) agree statistically."""
    models, y, M = setup
    cfg_off = smc.PFConfig("systematic", 1.0, "off")
    _, _, z_off = batched_log_likelihood(jax.random.key(5), models, 256, M, y, cfg_off)
    kz = jax.vmap(lambda m: smc.kalman_log_likelihood(m, y)[1])(models)
    assert np.abs(np.asarray(z_off - kz)).max() < 3.0


@pytest.mark.parametrize("concentration", [0.0, 2.0, 8.0])
def test_resample_gather_walk_bitwise(concentration):
    """Chunk-walk kernel ≡ searchsorted+take at any weight concentration."""
    from sequential_monte_carlo_tpu.kernels.resample_walk import (
        resample_gather_walk,
    )
    from jax.experimental.pallas import tpu as pltpu

    M, N, C = 4, 2048, 3
    w = jax.nn.softmax(
        jax.random.normal(jax.random.key(0), (M, N)) * concentration
    )
    xs = jax.random.normal(jax.random.key(1), (M, C, N))
    u = systematic_uniforms(jax.random.key(2), M, N)
    with pltpu.force_tpu_interpret_mode():
        out = resample_gather_walk(u, w, xs, tm=2)
    anc = jax.vmap(lambda uu, ww: _inverse_cdf(uu, ww))(u, w)
    ref = jax.vmap(lambda x, a: x[:, a])(xs, anc)
    assert bool(jnp.all(out == ref))



def test_resample_gather_walk_u0_route_bitwise():
    """The (M, 1)-offset route (the one the samplers dispatch for
    systematic resampling) ≡ passing the materialized grid ≡ the
    searchsorted+take oracle. NB: interpret mode cannot certify Mosaic
    lowering — round 3 shipped a float-iota here that was interpret-green
    and failed hardware compilation; `benchmarks/validate_tpu.py` repeats
    this check on the chip."""
    from sequential_monte_carlo_tpu.kernels.resample_walk import (
        resample_gather_walk,
    )
    from jax.experimental.pallas import tpu as pltpu

    M, N, C = 4, 2048, 3
    w = jax.nn.softmax(jax.random.normal(jax.random.key(0), (M, N)) * 2)
    xs = jax.random.normal(jax.random.key(1), (M, C, N))
    u0 = jax.random.uniform(jax.random.key(2), (M, 1))
    u = (jnp.arange(N, dtype=jnp.float32)[None, :] + u0) / N
    with pltpu.force_tpu_interpret_mode():
        out_u0 = resample_gather_walk(None, w, xs, tm=2, u0=u0)
        out_u = resample_gather_walk(u, w, xs, tm=2)
    anc = jax.vmap(lambda uu, ww: _inverse_cdf(uu, ww))(u, w)
    ref = jax.vmap(lambda x, a: x[:, a])(xs, anc)
    assert bool(jnp.all(out_u0 == out_u))
    assert bool(jnp.all(out_u0 == ref))


def test_resample_gather_walk_degenerate_weight():
    """Point-mass weights: the walk needs no fallback (bounded work)."""
    from sequential_monte_carlo_tpu.kernels.resample_walk import (
        resample_gather_walk,
    )
    from jax.experimental.pallas import tpu as pltpu

    M, N, C = 2, 1024, 2
    w = jnp.zeros((M, N)).at[:, 900].set(1.0)
    xs = jax.random.normal(jax.random.key(1), (M, C, N))
    u = systematic_uniforms(jax.random.key(2), M, N)
    with pltpu.force_tpu_interpret_mode():
        out = resample_gather_walk(u, w, xs, tm=2)
    expect = jnp.broadcast_to(xs[:, :, 900:901], (M, C, N))
    assert bool(jnp.all(out == expect))


def test_resample_gather_walk_non_divisible_falls_back():
    from sequential_monte_carlo_tpu.kernels.resample_walk import (
        resample_gather_walk,
    )
    from jax.experimental.pallas import tpu as pltpu

    M, N, C = 3, 384, 2  # M % tm and N % cw both awkward → dense fallback
    w = jax.nn.softmax(jax.random.normal(jax.random.key(0), (M, N)))
    xs = jax.random.normal(jax.random.key(1), (M, C, N))
    u = systematic_uniforms(jax.random.key(2), M, N)
    with pltpu.force_tpu_interpret_mode():
        out = resample_gather_walk(u, w, xs)
    anc = jax.vmap(lambda uu, ww: _inverse_cdf(uu, ww))(u, w)
    ref = jax.vmap(lambda x, a: x[:, a])(xs, anc)
    assert bool(jnp.all(out == ref))


# ---- fused UC-SV propagate+reweight kernel (interpret mode) ----------------
# (The whole-step walk+propagate mega-kernel was deleted in round 3: it lost
# to this two-kernel route at every measured size — PERF_NOTES.md.)

def _ucsv_prop_setup(M=2, N=1024, gamma=(0.0, 0.0), seed=7):
    from jax.experimental.pallas import tpu as pltpu

    from sequential_monte_carlo_tpu.kernels.ucsv_pallas import (
        ucsv_propagate_reweight,
    )

    planar = jax.random.normal(
        jax.random.key(1), (M, 3, N)
    ).astype(jnp.float32)
    ge = jnp.full((M,), gamma[0], jnp.float32)
    gn = jnp.full((M,), gamma[1], jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        x, lse, lsn, logw = ucsv_propagate_reweight(
            seed, 1.3, ge, gn, planar[:, 0], planar[:, 1], planar[:, 2]
        )
    return planar, x, lse, lsn, logw


def test_ucsv_propagate_gamma_zero_freezes_vols():
    """γ=0 makes both log-vol random walks degenerate: the returned lse/lsn
    must be bitwise the inputs, independent of the PRNG draws."""
    planar, x, lse, lsn, _ = _ucsv_prop_setup(gamma=(0.0, 0.0))
    assert bool(jnp.all(lse == planar[:, 1]))
    assert bool(jnp.all(lsn == planar[:, 2]))


def test_ucsv_propagate_logw_consistent():
    """logw must equal the N(x', exp(½ logσn'))-density of y at the
    returned state — deterministic given the outputs."""
    import math

    _, x, _, lsn, logw = _ucsv_prop_setup(gamma=(0.3, 0.2))
    zz = (1.3 - x) * jnp.exp(-0.5 * lsn)
    expect = -0.5 * zz * zz - 0.5 * lsn - 0.5 * math.log(2 * math.pi)
    np.testing.assert_allclose(np.asarray(logw), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="interpret-mode prng_random_bits is a zeros stub in jax "
    "(mosaic/interpret/interpret_pallas_call.py: 'TODO: Implement this "
    "properly?') — the draw statistics are only real on hardware; "
    "benchmarks/validate_tpu.py runs this check on the chip",
)
def test_ucsv_propagate_trend_increment_statistics():
    """(x' − x)·exp(−½ logσε) ≈ N(0, 1) — on-chip PRNG statistics."""
    planar, x, _, _, _ = _ucsv_prop_setup(M=2, N=2048, gamma=(0.0, 0.0))
    z = np.asarray((x - planar[:, 0]) * jnp.exp(-0.5 * planar[:, 1]))
    assert abs(z.mean()) < 0.05
    assert abs(z.std() - 1.0) < 0.05
