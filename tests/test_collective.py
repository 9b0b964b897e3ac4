"""shard_map manual-collective particle sharding (SURVEY.md §5.8) on the
virtual 8-device mesh."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

import sequential_monte_carlo_tpu as smc
from sequential_monte_carlo_tpu.parallel.collective import (
    distributed_pf_step,
    distributed_systematic_resample,
    gather_global,
)
from sequential_monte_carlo_tpu.ops.resampling import systematic


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.asarray(jax.devices()).reshape(8), ("p",))


def test_distributed_resample_matches_single_device(mesh):
    """Sharded systematic resample ≡ single-device systematic resample
    (same key, same grid) — the ancestors must be identical."""
    n_total = 512
    key = jax.random.key(3)
    w = jax.nn.softmax(jax.random.normal(jax.random.key(1), (n_total,)) * 2)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=P("p"), out_specs=P("p")
    )
    def sharded(w_local):
        return distributed_systematic_resample(key, w_local, "p")

    anc_sharded = np.asarray(sharded(w))
    anc_ref = np.asarray(systematic(key, w))
    # same u0 draw (same key) and same CDF ⇒ identical ancestors
    np.testing.assert_array_equal(anc_sharded, anc_ref)


def test_gather_global_roundtrip(mesh):
    n_total = 256
    x = jnp.arange(n_total, dtype=jnp.float32)[:, None]
    anc = jnp.flip(jnp.arange(n_total, dtype=jnp.int32))

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(P("p"), P("p")), out_specs=P("p")
    )
    def sharded(x_local, anc_local):
        return gather_global(x_local, anc_local, "p")

    out = np.asarray(sharded(x, anc))
    np.testing.assert_array_equal(out[:, 0], np.flip(np.arange(n_total)))


def test_distributed_pf_step_statistics(mesh):
    """Full sharded PF run tracks the Kalman logZ."""
    model = smc.lg_model(jnp.array([0.5, 0.9, 0.8]))
    _, y = smc.simulate(jax.random.key(7), model, 60)
    (_, _), kz = smc.kalman_log_likelihood(model, y)
    n_total = 1024

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("p"), P("p")),
        out_specs=(P("p"), P("p"), P(), P()),
    )
    def step_sharded(x_local, lw_local):
        # scan over time INSIDE the shard_map: collectives per step
        def body(carry, inp):
            x, lw, acc = carry
            k, yt = inp
            x, lw, lm, ess = distributed_pf_step(k, model, x, lw, yt, "p")
            return (x, lw, acc + lm), ess

        keys = jax.random.split(jax.random.key(11), y.shape[0] - 1)
        (x, lw, logz), esss = jax.lax.scan(
            body, (x_local, lw_local, 0.0), (keys, y[1:])
        )
        return x, lw, logz, esss

    # init replicated-split: draw on host, shard
    x0 = model.initial_distribution().sample(jax.random.key(0), (n_total,))
    lw0 = model.observation_distribution(x0).log_prob(y[0])
    lm0, lw0n, _ = smc.log_normalize(lw0)

    x, lw, logz, esss = jax.jit(step_sharded)(x0, lw0n)
    total = float(lm0) + float(logz)
    assert abs(total - float(kz)) < 2.0, (total, float(kz))
    assert np.isfinite(np.asarray(esss)).all()
