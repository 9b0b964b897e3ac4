"""Stochastic-volatility filtering animation — the parity artifact for the
reference's ``visuals/stochastic_volatility_animation.gif`` (stripped from
its tree, listed in .MISSING_LARGE_BLOBS).

Simulates the SV model (x = log-volatility AR(1), y ~ N(0, exp(x/2)));
runs a bootstrap PF collecting the per-step filtering distribution
(weighted quantile band + particle histogram), then renders a GIF: the
left panel draws returns and the filtered ±1σ volatility band growing
through time, the right panel the current filtering histogram of x_t.

  python examples/sv_animation.py [--t 150] [--n 4096] [--out PATH]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import sequential_monte_carlo_tpu as smc
from sequential_monte_carlo_tpu.analysis import weighted_quantile

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--t", type=int, default=150)
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--bins", type=int, default=40)
    p.add_argument("--fps", type=int, default=12)
    p.add_argument("--out", default=os.path.join(
        HERE, "out", "stochastic_volatility_animation.gif"))
    args = p.parse_args()

    model = smc.stochastic_volatility(mu=-1.0, phi=0.95, sigma=0.3)
    x_true, y = smc.simulate(jax.random.key(7), model, args.t)

    lo_edge, hi_edge = -4.0, 2.0
    edges = jnp.linspace(lo_edge, hi_edge, args.bins + 1)
    ps = jnp.array([0.16, 0.5, 0.84])

    def summarize(state):
        x = state.particles[:, 0]
        w = jnp.exp(state.log_weights)
        # weighted histogram of the filtering distribution over x_t
        idx = jnp.clip(
            jnp.searchsorted(edges, x, side="right") - 1, 0, args.bins - 1
        )
        hist = jnp.zeros(args.bins).at[idx].add(w)
        return {"q": weighted_quantile(x, w, ps), "hist": hist}

    _, logz, series = smc.filter_sequence(
        jax.random.key(0), model, args.n, y, summarize=summarize
    )
    q = np.asarray(series["summary"]["q"])  # (T, 3)
    hists = np.asarray(series["summary"]["hist"])  # (T, bins)
    y_np, x_np = np.asarray(y), np.asarray(x_true[:, 0])
    print(f"filtered T={args.t} N={args.n}; logZ={float(logz):.2f}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation

    fig, (ax1, ax2) = plt.subplots(
        1, 2, figsize=(10, 4), gridspec_kw={"width_ratios": [2.2, 1]}
    )
    centers = 0.5 * (np.asarray(edges[:-1]) + np.asarray(edges[1:]))
    tt = np.arange(args.t)

    def draw(t):
        ax1.clear()
        ax2.clear()
        ax1.plot(tt[: t + 1], y_np[: t + 1], ".", color="0.4", ms=3,
                 label="returns y")
        ax1.fill_between(tt[: t + 1], q[: t + 1, 0], q[: t + 1, 2],
                         color="tab:red", alpha=0.25,
                         label="filtered log-vol 68% band")
        ax1.plot(tt[: t + 1], q[: t + 1, 1], color="tab:red", lw=1.2)
        ax1.plot(tt[: t + 1], x_np[: t + 1], color="k", lw=0.8, ls="--",
                 label="true log-vol")
        ax1.set_xlim(0, args.t)
        ax1.set_ylim(min(lo_edge, float(y_np.min()) - 0.5),
                     max(hi_edge, float(y_np.max()) + 0.5))
        ax1.legend(loc="upper right", fontsize=8)
        ax1.set_title(f"SV bootstrap filter, t={t}")
        ax2.bar(centers, hists[t], width=centers[1] - centers[0],
                color="tab:red", alpha=0.6)
        ax2.axvline(x_np[t], color="k", ls="--", lw=0.8)
        ax2.set_title("p(x_t | y_1:t)")
        ax2.set_xlim(lo_edge, hi_edge)

    anim = animation.FuncAnimation(fig, draw, frames=args.t, interval=80)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    anim.save(args.out, writer=animation.PillowWriter(fps=args.fps))
    plt.close(fig)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
