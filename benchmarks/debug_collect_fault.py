"""Minimize the N=8192 UC-SV TPU fault (inflation example faults; bench.py
at identical size passes). Variants over data/key/T/fusion.

  python benchmarks/debug_collect_fault.py <data:pce|synth> <key> <T> [fused]
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sequential_monte_carlo_tpu as smc

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "examples"))
from inflation_example import load_pce, ucsv_prior  # noqa: E402

data = sys.argv[1] if len(sys.argv) > 1 else "pce"
key_i = int(sys.argv[2]) if len(sys.argv) > 2 else 1998
t_len = int(sys.argv[3]) if len(sys.argv) > 3 else 241
fused = sys.argv[4] if len(sys.argv) > 4 else "auto"
n = int(sys.argv[5]) if len(sys.argv) > 5 else 8192

if data == "pce":
    _, y = load_pce()
else:
    rng = np.random.default_rng(1998)
    y = jnp.asarray(3.0 + np.cumsum(rng.normal(0, 0.3, 241))
                    + rng.normal(0, 0.5, 241), dtype=jnp.float32)
y = y[:t_len]

from sequential_monte_carlo_tpu.ops.particle_filter import PFConfig

cfg = smc.SMCConfig(n_particles=n, n_theta=512, chain=5, ess_threshold=0.5,
                    inner=PFConfig("systematic", 1.0, fused))
sampler = smc.SMC2(smc.ucsv_model, ucsv_prior(), cfg)
try:
    state, infos = sampler.run(jax.random.key(key_i), y)
    jax.block_until_ready(state)
    print(f"{data} key={key_i} T={t_len} fused={fused} N={n}: PASS "
          f"ess={float(state.ess):.1f}", flush=True)
except Exception as e:  # noqa: BLE001
    print(f"{data} key={key_i} T={t_len} fused={fused} N={n}: "
          f"FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)
