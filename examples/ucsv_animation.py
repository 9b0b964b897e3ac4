"""UC-SV filtering animation — parity artifact for the reference's
``visuals/ucsv_animation.gif`` (the Stock–Watson trend + stochastic
volatilities filtered online over the PCE inflation series).

Runs a bootstrap PF on the UC-SV model (state = trend x, log σε, log ση;
/root/reference/src/state_space_models.jl:215-263) at the posterior-mean θ̂
from the flagship SMC² run (BASELINE.md), collecting per-step weighted
quantile bands of the trend and of both volatilities, then renders a GIF:
left panel — inflation observations with the filtered trend band growing
through time; right panel — the two filtered volatility paths
σε,t = exp(½ log σε,t) and ση,t = exp(½ log ση,t) with 68% bands.

The vendored series is a synthetic stand-in for FRED PCECTPI (zero-egress
build) — stamped on the figure.

  python examples/ucsv_animation.py [--n 4096] [--out PATH]
"""
from __future__ import annotations

import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import sequential_monte_carlo_tpu as smc
from sequential_monte_carlo_tpu.analysis import weighted_quantile

HERE = os.path.dirname(os.path.abspath(__file__))
ANNOT = "synthetic stand-in series — not FRED PCECTPI"
# flagship SMC² posterior mean (BASELINE.md round 2): (γ, x0, log σε0, log ση0)
THETA_HAT = [0.4248, 1.8959, 0.3342, 0.3291]


def load_pce():
    path = os.path.join(HERE, "data", "pce_inflation.csv")
    from sequential_monte_carlo_tpu.utils.dataio import read_csv_column

    values = read_csv_column(path, 1)
    with open(path) as f:
        dates = np.array(
            [row["date"] for row in csv.DictReader(f)], dtype="datetime64[D]"
        )
    return dates, jnp.asarray(values, dtype=jnp.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--fps", type=int, default=12)
    p.add_argument("--stride", type=int, default=2,
                   help="animate every k-th quarter")
    p.add_argument("--out", default=os.path.join(
        HERE, "out", "ucsv_animation.gif"))
    args = p.parse_args()

    dates, y = load_pce()
    T = int(y.shape[0])
    model = smc.ucsv_model(jnp.asarray(THETA_HAT))
    ps = jnp.array([0.16, 0.5, 0.84])

    def summarize(state):
        w = jnp.exp(state.log_weights)
        x = state.particles[:, 0]
        se = jnp.exp(0.5 * state.particles[:, 1])  # trend vol σε
        sn = jnp.exp(0.5 * state.particles[:, 2])  # obs vol ση
        return {
            "xq": weighted_quantile(x, w, ps),
            "seq": weighted_quantile(se, w, ps),
            "snq": weighted_quantile(sn, w, ps),
        }

    _, logz, series = smc.filter_sequence(
        jax.random.key(0), model, args.n, y, summarize=summarize
    )
    s = series["summary"]
    xq = np.asarray(s["xq"])  # (T, 3)
    seq = np.asarray(s["seq"])
    snq = np.asarray(s["snq"])
    y_np = np.asarray(y)
    print(f"filtered T={T} N={args.n}; logZ={float(logz):.2f}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.dates as mdates
    import matplotlib.pyplot as plt
    from matplotlib import animation

    fig, (ax1, ax2) = plt.subplots(
        1, 2, figsize=(10.5, 4), gridspec_kw={"width_ratios": [2.0, 1.2]}
    )
    fig.text(0.995, 0.005, ANNOT, ha="right", va="bottom", fontsize=7,
             color="0.45", style="italic")
    frames = list(range(1, T, args.stride)) + [T - 1]
    ylo = float(y_np.min()) - 1.0
    yhi = float(y_np.max()) + 1.0
    vhi = float(max(seq[:, 2].max(), snq[:, 2].max())) * 1.1

    def draw(t):
        ax1.clear()
        ax2.clear()
        d = dates[: t + 1]
        ax1.plot(d, y_np[: t + 1], ".", color="0.4", ms=3, label="inflation")
        ax1.fill_between(d, xq[: t + 1, 0], xq[: t + 1, 2],
                         color="tab:red", alpha=0.25,
                         label="filtered trend 68% band")
        ax1.plot(d, xq[: t + 1, 1], color="tab:red", lw=1.2)
        ax1.set_xlim(dates[0], dates[-1])
        ax1.set_ylim(ylo, yhi)
        ax1.xaxis.set_major_locator(mdates.AutoDateLocator())
        ax1.xaxis.set_major_formatter(mdates.DateFormatter("%Y"))
        ax1.legend(loc="upper right", fontsize=8)
        ax1.set_title(f"UC-SV bootstrap filter, t={t}")
        ax2.fill_between(d, seq[: t + 1, 0], seq[: t + 1, 2],
                         color="tab:blue", alpha=0.25)
        ax2.plot(d, seq[: t + 1, 1], color="tab:blue", lw=1.2,
                 label="trend vol σε")
        ax2.fill_between(d, snq[: t + 1, 0], snq[: t + 1, 2],
                         color="tab:green", alpha=0.25)
        ax2.plot(d, snq[: t + 1, 1], color="tab:green", lw=1.2,
                 label="obs vol ση")
        ax2.set_xlim(dates[0], dates[-1])
        ax2.set_ylim(0.0, vhi)
        ax2.xaxis.set_major_locator(mdates.AutoDateLocator())
        ax2.xaxis.set_major_formatter(mdates.DateFormatter("%Y"))
        ax2.legend(loc="upper right", fontsize=8)
        ax2.set_title("filtered stochastic volatilities")

    anim = animation.FuncAnimation(fig, draw, frames=frames, interval=80)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    anim.save(args.out, writer=animation.PillowWriter(fps=args.fps))
    plt.close(fig)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
