"""Roofline / stage-level profile of the SMC² hot path on one TPU chip.

For each stage of the steady-state inner-filter step (the hot loop replacing
/root/reference/src/particles.jl:117-125) this prints: measured ms/call
(scan-serialized + host-fetch sync, PERF_NOTES.md timing discipline), the
HBM bytes it must move, the bandwidth-floor time at v5e peak, and the
%-of-peak achieved — the accounting VERDICT r2 #1 asked for.

Also times the candidate building blocks for the next kernel generation
(XLA searchsorted, scatter+cummax ancestor construction, gather-by-index)
and the collect_fn quantile variants (sort vs binned).

Usage: python benchmarks/roofline.py [--m 512] [--n 8192] [--iters 30]
"""
from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

HBM_PEAK = 819e9  # v5e HBM bandwidth, bytes/s


def timed_chain(make_body, carry0, iters, fetch, warm=True):
    """Scan-serialize `iters` dependent calls; time with a host value fetch."""

    @jax.jit
    def chain(key, carry):
        keys = jax.random.split(key, iters)
        carry, _ = jax.lax.scan(make_body, carry, keys)
        return carry

    def run(k):
        out = chain(k, carry0)
        return fetch(out)

    if warm:
        run(jax.random.key(0))
    t0 = time.perf_counter()
    run(jax.random.key(1))
    return (time.perf_counter() - t0) / iters * 1e3


def report(name, ms, bytes_moved=None):
    if bytes_moved is None:
        print(f"{name:44s} {ms:8.3f} ms", flush=True)
        return
    floor_ms = bytes_moved / HBM_PEAK * 1e3
    pct = floor_ms / ms * 100
    print(
        f"{name:44s} {ms:8.3f} ms   {bytes_moved/1e6:7.1f} MB  "
        f"floor {floor_ms:6.3f} ms  {pct:5.1f}% of HBM peak",
        flush=True,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=512)
    p.add_argument("--n", type=int, default=8192)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()
    m, n, iters = args.m, args.n, args.iters

    from sequential_monte_carlo_tpu.kernels.resample_pallas import (
        _to_byte_planes,
        systematic_uniforms,
    )
    from sequential_monte_carlo_tpu.kernels.resample_walk import (
        resample_gather_walk,
    )

    c = 3
    xs = jax.random.normal(jax.random.key(1), (m, c, n), jnp.float32)
    logw = jax.random.normal(jax.random.key(2), (m, n)) * 0.3
    w = jnp.exp(logw - logw.max(axis=-1, keepdims=True))

    print(f"== stage profile at (M={m}, N={n}) on {jax.devices()[0]} ==")

    # -- 1. walk kernel (current champion) ----------------------------------
    def walk_body(carry, k):
        xs, w = carry
        u = systematic_uniforms(k, m, n, dtype=w.dtype)
        out = resample_gather_walk(u, w, xs)
        w2 = jnp.abs(out[:, 0, :])
        w2 = w2 / jnp.sum(w2, axis=-1, keepdims=True)
        return (out, w2), None

    ms = timed_chain(walk_body, (xs, w), iters,
                     lambda o: float(jnp.sum(o[0][0, 0, :8])))
    c_pad = 8
    bytes_walk = (
        m * n * 4          # u
        + m * n * 4        # weights (cumsum read)
        + m * 4 * c_pad * n  # byte planes in
        + m * n * 4 * 2    # cdf + cdf_prev in
        + m * n * 4        # u_t in
        + m * c_pad * n * 4  # out
    )
    report("resample_gather_walk (incl. XLA prep)", ms, bytes_walk)

    # -- 2. byte-plane conversion alone --------------------------------------
    def bp_body(carry, k):
        xs = carry
        xb = _to_byte_planes(jnp.pad(xs, ((0, 0), (0, 5), (0, 0))))
        return xs + xb[:, 0, :].astype(jnp.float32)[:, None, :] * 1e-9, None

    ms = timed_chain(bp_body, xs, iters, lambda o: float(jnp.sum(o[0, 0, :8])))
    report("  _to_byte_planes (M,8,N)", ms, m * c_pad * n * 4 * 2)

    # -- 3. cumsum + chunk-bound prep alone ----------------------------------
    def prep_body(carry, k):
        w = carry
        u = systematic_uniforms(k, m, n, dtype=w.dtype)
        cdf = jnp.cumsum(w, axis=-1)
        cdf = cdf / cdf[..., -1:]
        chunk_ends = cdf[:, 127::128]
        u_first = u[:, ::128]
        ks = jnp.sum(chunk_ends[:, :, None] < u_first[:, None, :], axis=1)
        w2 = w + ks.astype(w.dtype).mean() * 1e-12
        return w2 / jnp.sum(w2, -1, keepdims=True), None

    ms = timed_chain(prep_body, w, iters, lambda o: float(jnp.sum(o[0, :8])))
    report("  cumsum + chunk bounds", ms, m * n * 4 * 3)

    # -- 4. XLA searchsorted (sorted queries) --------------------------------
    def ss_body(carry, k):
        w = carry
        u = systematic_uniforms(k, m, n, dtype=w.dtype)
        cdf = jnp.cumsum(w, axis=-1)
        cdf = cdf / cdf[..., -1:]
        anc = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="left"))(
            cdf, u
        )
        w2 = w + anc.astype(w.dtype).mean() * 1e-12
        return w2 / jnp.sum(w2, -1, keepdims=True), None

    ms = timed_chain(ss_body, w, iters, lambda o: float(jnp.sum(o[0, :8])))
    report("  XLA searchsorted (M,N)", ms, m * n * 4 * 3)

    # -- 5. scatter+cummax ancestor construction -----------------------------
    def sc_body(carry, k):
        w = carry
        off = jax.random.uniform(k, (m, 1), dtype=w.dtype)
        cdf = jnp.cumsum(w, axis=-1)
        cdf = cdf / cdf[..., -1:]
        # counts r_i = #uniforms in (cdf[i-1], cdf[i]] for u_j=(j+off)/n
        hi = jnp.ceil(cdf * n - off).astype(jnp.int32)
        lo = jnp.concatenate([jnp.zeros((m, 1), jnp.int32), hi[:, :-1]], -1)
        starts = jnp.where(hi > lo, lo, n)  # drop zero-count entries
        iot = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (m, n))
        a0 = jnp.zeros((m, n), jnp.int32)
        anc = jax.vmap(
            lambda a, s, i: a.at[s].max(i, mode="drop")
        )(a0, starts, iot)
        anc = jax.lax.cummax(anc, axis=1)
        w2 = w + anc.astype(w.dtype).mean() * 1e-12
        return w2 / jnp.sum(w2, -1, keepdims=True), None

    ms = timed_chain(sc_body, w, iters, lambda o: float(jnp.sum(o[0, :8])))
    report("  scatter+cummax ancestors (M,N)", ms, m * n * 4 * 4)

    # -- 6. XLA take (gather by ancestor index) ------------------------------
    anc0 = jnp.clip(
        jax.random.randint(jax.random.key(5), (m, n), 0, n), 0, n - 1
    ).astype(jnp.int32)
    anc0 = jnp.sort(anc0, axis=-1)

    def take_body(carry, k):
        xs, anc = carry
        out = jax.vmap(lambda x, a: jnp.take(x, a, axis=1))(xs, anc)
        return (out, anc), None

    ms = timed_chain(take_body, (xs, anc0), iters,
                     lambda o: float(jnp.sum(o[0][0, 0, :8])))
    report("  XLA take (M,3,N) by sorted anc", ms, m * c * n * 4 * 2 + m * n * 4)

    # -- 7. UCSV fused propagate+reweight kernel ------------------------------
    from sequential_monte_carlo_tpu.models.ucsv import ucsv_model

    theta = jnp.tile(jnp.asarray([[0.5, 3.0, 0.2, 0.2]]), (m, 1))
    models = jax.vmap(ucsv_model)(theta)
    xp0 = jax.random.normal(jax.random.key(6), (m, n, 3), jnp.float32)

    def prop_body(carry, k):
        xp = carry
        seed = jax.random.randint(k, (), 0, 2**31 - 1)
        x_new, incr = models.fused_propagate_reweight(seed, jnp.float32(2.5), xp)
        return x_new, None

    ms = timed_chain(prop_body, xp0, iters,
                     lambda o: float(jnp.sum(o[0, :8, 0])))
    report("ucsv fused propagate+reweight", ms, m * n * 3 * 4 * 2 + m * n * 4)

    # -- 8. whole batched_pf_step --------------------------------------------
    from sequential_monte_carlo_tpu.ops.batched_filter import batched_pf_step
    from sequential_monte_carlo_tpu.ops.particle_filter import PFConfig

    cfg = PFConfig("systematic", 1.0)
    lw0 = jnp.full((m, n), -jnp.log(float(n)))

    def step_body(carry, k):
        xp, lw = carry
        out = batched_pf_step(k, models, xp, lw, jnp.float32(2.5), cfg)
        return (out.particles, out.log_weights), None

    ms = timed_chain(step_body, (xp0, lw0), iters,
                     lambda o: float(jnp.sum(o[0][0, :8, 0])))
    # step traffic: resample(walk bytes) + propagate + normalize reads
    report("whole batched_pf_step", ms, bytes_walk + m * n * 3 * 4 * 2 + m * n * 4 * 3)

    # -- 9. collect_fn quantiles: sort vs binned ------------------------------
    from sequential_monte_carlo_tpu.analysis.summaries import (
        weighted_quantile,
        weighted_quantile_binned,
    )

    ps = jnp.asarray([0.25, 0.5, 0.75])

    def qsort_body(carry, k):
        x, w = carry
        q = jax.vmap(lambda xx, ww: weighted_quantile(xx, ww, ps))(x, w)
        return (x + q.mean() * 1e-12, w), None

    x0 = xs[:, 0, :]
    ms = timed_chain(qsort_body, (x0, w), iters,
                     lambda o: float(jnp.sum(o[0][0, :8])))
    report("collect quantiles — sort (M,N)", ms, m * n * 4 * 4)

    def qbin_body(carry, k):
        x, w = carry
        q = weighted_quantile_binned(x, w, ps)
        return (x + q.mean() * 1e-12, w), None

    ms = timed_chain(qbin_body, (x0, w), iters,
                     lambda o: float(jnp.sum(o[0][0, :8])))
    report("collect quantiles — binned (M,N)", ms, m * n * 4 * 2)


if __name__ == "__main__":
    main()
