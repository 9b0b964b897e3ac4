"""Device-time profile of the scanned SMC² inner step via jax.profiler.

Traces a jitted ``lax.scan`` chain of ``batched_pf_step`` on the real TPU
(the profiler works over the axon tunnel), then aggregates per-op device
durations from the Chrome trace — the measured (not modeled) step
breakdown. Round-3 result at (512, 8192), tm=16 (PERF_NOTES.md):
device-busy 7.67 ms/step, of which the walk kernel proper is 6.22 ms
(81%), the UCSV propagate 0.30 ms, and all XLA fusions (cumsum, exp,
normalize, byte-planing, u-grid) ≈ 1.15 ms combined.

Usage: python benchmarks/profile_step.py [--m 512] [--n 8192] [--iters 20]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=512)
    p.add_argument("--n", type=int, default=8192)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--top", type=int, default=16)
    p.add_argument("--ess-threshold", type=float, default=1.0,
                   help="<1 profiles the ADAPTIVE route (VERDICT r4 #2): "
                        "steps where no row's ESS trigger fires take the "
                        "lax.cond skip branch and drop the walk kernel")
    p.add_argument("--uniform-weights", action="store_true",
                   help="reset log-weights to -log N before every step: "
                        "with --ess-threshold < 1 the trigger provably "
                        "never fires, profiling the pure SKIP branch "
                        "(this synthetic chain otherwise degenerates and "
                        "fires every step)")
    args = p.parse_args()
    m, n, iters = args.m, args.n, args.iters

    from sequential_monte_carlo_tpu.models.ucsv import ucsv_model
    from sequential_monte_carlo_tpu.ops.batched_filter import batched_pf_step
    from sequential_monte_carlo_tpu.ops.particle_filter import PFConfig

    theta = jnp.tile(jnp.asarray([[0.5, 3.0, 0.2, 0.2]]), (m, 1))
    models = jax.vmap(ucsv_model)(theta)
    cfg = PFConfig("systematic", args.ess_threshold)
    xp = jax.random.normal(jax.random.key(6), (m, n, 3), jnp.float32)
    lw = jnp.full((m, n), -jnp.log(float(n)))

    @jax.jit
    def chain(key, xp, lw):
        def body(carry, k):
            xp, lw = carry
            if args.uniform_weights:
                lw = jnp.full_like(lw, -jnp.log(float(n)))
            out = batched_pf_step(k, models, xp, lw, jnp.float32(2.5), cfg)
            return (out.particles, out.log_weights), None

        keys = jax.random.split(key, iters)
        (xp, lw), _ = jax.lax.scan(body, (xp, lw), keys)
        return xp, lw

    out = chain(jax.random.key(0), xp, lw)
    jax.block_until_ready(out)

    tracedir = tempfile.mkdtemp(prefix="smc_profile_")
    with jax.profiler.trace(tracedir):
        out = chain(jax.random.key(1), xp, lw)
        # host value fetch: forces completion inside the trace window
        print(f"fetch: {float(out[0][0, 0, 0]):.4f}")

    f = sorted(glob.glob(f"{tracedir}/**/*.trace.json.gz", recursive=True))[-1]
    events = json.load(gzip.open(f))["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "args" in e
    }
    agg = collections.Counter()
    total = 0.0
    for e in events:
        if (e.get("ph") == "X" and "dur" in e
                and "TPU" in pids.get(e.get("pid"), "")):
            name = e.get("name", "?")
            # skip the enclosing program/while/cond wrappers (their
            # duration re-counts every child op inside them)
            if (name.startswith("jit_chain") or name.startswith("while")
                    or name.startswith("conditional")):
                continue
            agg[name] += e["dur"]
            total += e["dur"]
    print(f"device-busy total: {total / 1e3:.2f} ms over {iters} steps "
          f"= {total / iters:.0f} us/step")
    for name, us in agg.most_common(args.top):
        print(f"{us / iters:9.1f} us/step  {name[:80]}")


if __name__ == "__main__":
    main()
