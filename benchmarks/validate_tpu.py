"""On-chip validation + timing of the UC-SV hot path (two-kernel route).

The pieces interpret mode cannot check (jax's TPU-interpret
``prng_random_bits`` is a zeros stub): draw statistics of the fused
propagate+reweight kernel's on-chip PRNG, plus bitwise gather equality of
the chunk-walk resample kernel and per-step timing on real hardware.
Referenced by the TPU-gated statistics test in tests/test_batched_filter.py.

  python benchmarks/validate_tpu.py [--n 8192] [--iters 50]
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
import numpy as np

from sequential_monte_carlo_tpu.kernels.resample_pallas import (
    systematic_uniforms,
)
from sequential_monte_carlo_tpu.kernels.resample_walk import (
    resample_gather_walk,
)
from sequential_monte_carlo_tpu.kernels.ucsv_pallas import (
    ucsv_propagate_reweight,
)


def _inverse_cdf(u, w):
    cdf = jnp.cumsum(w)
    cdf = cdf / cdf[-1]
    return jnp.clip(jnp.searchsorted(cdf, u, side="left"), 0, w.shape[0] - 1)


def validate(m, n):
    w = jax.nn.softmax(jax.random.normal(jax.random.key(0), (m, n)) * 2)
    planar = jax.random.normal(jax.random.key(1), (m, 3, n)).astype(jnp.float32)
    u = systematic_uniforms(jax.random.key(2), m, n)

    # 1. the walk kernel's gather is bitwise searchsorted+take on hardware
    g = resample_gather_walk(u, w, planar)
    anc = jax.vmap(lambda uu, ww: _inverse_cdf(uu, ww))(u, w)
    ref = jax.vmap(lambda x, a: x[:, a])(planar, anc)
    ok_gather = bool(jnp.all(g == ref))

    # 1b. the u0 route the samplers actually dispatch is the gen-6 COUNT
    # formulation (round 5): bitwise ≡ its ceil-count ancestor oracle ON
    # HARDWARE. The band formulation stays and must still match the
    # host-grid route bitwise (it is production for explicit-u routes).
    # (Interpret mode cannot certify either: round 3 found a float-iota
    # op that verified on CPU interpret but failed Mosaic compilation —
    # round 5 re-hit the same class in the count kernel's first compile.)
    from sequential_monte_carlo_tpu.kernels.resample_walk import (
        count_ancestors,
    )

    u0 = jax.random.uniform(jax.random.key(3), (m, 1), dtype=jnp.float32)
    u_grid = (jnp.arange(n, dtype=jnp.float32)[None, :] + u0) / n
    anc_cnt = count_ancestors(u0, w)
    ref_cnt = jax.vmap(lambda x, a: x[:, a])(planar, anc_cnt)
    ok_u0 = bool(
        jnp.all(resample_gather_walk(None, w, planar, u0=u0) == ref_cnt)
    ) and bool(
        jnp.all(
            resample_gather_walk(None, w, planar, u0=u0,
                                 formulation="band")
            == resample_gather_walk(u_grid, w, planar)
        )
    )

    # 1c. degenerate point-mass weights ON HARDWARE at the production
    # tiling (interpret-mode covers tm=2 only): every output must copy
    # the single massive ancestor — the walk's bounded-work guarantee.
    # Checked on BOTH formulations (band via explicit u, count via u0).
    w_deg = jnp.zeros((m, n)).at[:, n // 2].set(1.0)
    expect_deg = jnp.broadcast_to(planar[:, :, n // 2 : n // 2 + 1],
                                  planar.shape)
    ok_deg_cnt = bool(
        jnp.all(resample_gather_walk(None, w_deg, planar, u0=u0)
                == expect_deg)
    )
    g_deg = resample_gather_walk(u, w_deg, planar)
    ok_deg = ok_deg_cnt and bool(
        jnp.all(g_deg == jnp.broadcast_to(planar[:, :, n // 2 : n // 2 + 1],
                                          planar.shape))
    )

    # 2. propagate kernel on the gathered cloud: trend-increment statistics
    # (x' − x_anc)·exp(−½ logσε_anc) ≈ N(0, 1) exercises the on-chip PRNG
    gam = jnp.full((m,), 0.2, jnp.float32)
    x, lse, lsn, logw = ucsv_propagate_reweight(
        7, 1.3, gam, gam, g[:, 0], g[:, 1], g[:, 2]
    )
    z = np.asarray((x - ref[:, 0]) * jnp.exp(-0.5 * ref[:, 1]))
    ok_stats = abs(z.mean()) < 0.05 and abs(z.std() - 1.0) < 0.05

    # 3. logw is the N(x', exp(½ logσn'))-density of y — deterministic
    zz = (1.3 - x) * jnp.exp(-0.5 * lsn)
    expect = -0.5 * zz * zz - 0.5 * lsn - 0.5 * np.log(2 * np.pi)
    ok_logw = bool(jnp.allclose(logw, expect, rtol=1e-5, atol=1e-5))

    print(f"validate (M={m}, N={n}): gather_bitwise={ok_gather} "
          f"u0_route_bitwise={ok_u0} degenerate={ok_deg} "
          f"stats(mean={z.mean():+.4f}, std={z.std():.4f})={ok_stats} "
          f"logw={ok_logw}", flush=True)

    # 4. the normalize epilogue (round 4) ≡ kernel logw + XLA normalize
    x1, lse1, lsn1, log_norm, row_lse, ess = ucsv_propagate_reweight(
        7, 1.3, gam, gam, g[:, 0], g[:, 1], g[:, 2], normalize=True
    )
    lse_ref = jax.scipy.special.logsumexp(logw, axis=-1, keepdims=True)
    ok_norm = (
        bool(jnp.all(x1 == x))  # same seed → identical draws
        and bool(jnp.allclose(log_norm, logw - lse_ref, rtol=1e-5, atol=1e-5))
        and bool(jnp.allclose(row_lse, lse_ref, rtol=1e-5, atol=1e-5))
    )

    # 4b. the ADAPTIVE carry epilogue (round 5, VERDICT r4 #2): feeding
    # carried log-weights into the builder kernel normalizes lw + incr —
    # ≡ the no-carry call at the same seed + XLA normalize, ON HARDWARE.
    import sequential_monte_carlo_tpu as smc_pkg

    th_ucsv = jnp.tile(jnp.asarray([0.5, 3.0, 0.2, 0.2]), (m, 1))
    ucsv_models = jax.vmap(smc_pkg.ucsv_model)(th_ucsv)
    cloud = jnp.stack([g[:, 0], g[:, 1], g[:, 2]], axis=-1)
    lw_carry = jax.nn.log_softmax(
        jax.random.normal(jax.random.key(8), (m, n)), axis=-1
    )
    xc, log_norm_c, row_lse_c, ess_c = ucsv_models.fused_propagate_reweight(
        21, 1.3, cloud, normalize=True, carry_logw=lw_carry
    )
    xnc, incr_nc = ucsv_models.fused_propagate_reweight(21, 1.3, cloud)
    tot = lw_carry + incr_nc
    lse_c_ref = jax.scipy.special.logsumexp(tot, axis=-1, keepdims=True)
    ok_carry = (
        bool(jnp.all(xc == xnc))
        and bool(jnp.allclose(log_norm_c, tot - lse_c_ref,
                              rtol=1e-5, atol=1e-5))
        and bool(jnp.allclose(row_lse_c, lse_c_ref[:, 0],
                              rtol=1e-5, atol=1e-5))
    )

    # 5. generic builder kernels (round 4): SV + LG draws on-chip.
    # σ-scaled increment of the fused SV step must be N(0, 1).
    import sequential_monte_carlo_tpu as smc

    thetas = jnp.tile(jnp.asarray([-1.0, 0.9, 0.3]), (m, 1))
    sv = jax.vmap(smc.sv_model)(thetas)
    xs0 = jax.random.normal(jax.random.key(9), (m, n, 1)).astype(jnp.float32)
    xs1, lw_sv = sv.fused_propagate_reweight(11, 0.7, xs0)
    zs = np.asarray(
        (xs1[..., 0] - (-1.0 + 0.9 * (xs0[..., 0] + 1.0))) / 0.3
    )
    ok_sv = abs(zs.mean()) < 0.05 and abs(zs.std() - 1.0) < 0.05

    thetas_lg = jnp.tile(jnp.asarray([0.5, 0.81, 0.8]), (m, 1))
    lg = jax.vmap(smc.lg_model)(thetas_lg)
    xl0 = jax.random.normal(jax.random.key(10), (m, n, 1)).astype(jnp.float32)
    xl1, lw_lg = lg.fused_propagate_reweight(12, 0.3, xl0)
    zl = np.asarray((xl1[..., 0] - 0.5 * xl0[..., 0]) / 0.9)
    ok_lg = abs(zl.mean()) < 0.05 and abs(zl.std() - 1.0) < 0.05

    print(f"  norm_epilogue={ok_norm} carry_epilogue={ok_carry} "
          f"sv_builder(mean={zs.mean():+.4f}, std={zs.std():.4f})={ok_sv} "
          f"lg_builder(mean={zl.mean():+.4f}, std={zl.std():.4f})={ok_lg}",
          flush=True)
    return (ok_gather and ok_u0 and ok_deg and ok_stats and ok_logw
            and ok_norm and ok_carry and ok_sv and ok_lg)


def time_two_kernel(m, n, iters):
    planar = jax.random.normal(jax.random.key(1), (m, 3, n)).astype(jnp.float32)
    logw0 = jnp.zeros((m, n), jnp.float32)
    gam = jnp.full((m,), 0.2, jnp.float32)

    @jax.jit
    def chain(key, planar, logw):
        def body(carry, inp):
            planar, logw = carry
            k, seed = inp
            u = systematic_uniforms(k, m, n, dtype=jnp.float32)
            w = jnp.exp(logw - jax.scipy.special.logsumexp(logw, axis=-1,
                                                           keepdims=True))
            g = resample_gather_walk(u, w, planar)
            x, lse, lsn, lw = ucsv_propagate_reweight(
                seed, 1.3, gam, gam, g[:, 0], g[:, 1], g[:, 2]
            )
            planar = jnp.stack([x, lse, lsn], axis=1)
            return (planar, lw), None

        keys = jax.random.split(key, iters)
        seeds = jnp.arange(iters, dtype=jnp.int32)
        (planar, logw), _ = jax.lax.scan(body, (planar, logw), (keys, seeds))
        return planar, logw

    def run_once(k):
        out = chain(k, planar, logw0)
        # host fetch: block_until_ready does not reliably block over the
        # axon tunnel (PERF_NOTES.md) — a value fetch does
        return float(jnp.sum(out[1][0, :8]))

    run_once(jax.random.key(3))
    t0 = time.perf_counter()
    run_once(jax.random.key(4))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=512)
    p.add_argument("--n", type=int, default=8192)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--skip-validate", action="store_true")
    args = p.parse_args()

    if not args.skip_validate:
        ok = validate(16, 2048)
        if not ok:
            raise SystemExit("validation FAILED")

    ms_two = time_two_kernel(args.m, args.n, args.iters)
    print(f"(M={args.m}, N={args.n}) two-kernel resample+propagate: "
          f"{ms_two:.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
