"""Plotting of inference results (reference: smcsmc/plot.py:17-196)."""

from __future__ import annotations

import numpy as np


def plot_rainbow(
    results_file: str,
    output_file: str,
    g: float = 30,
    ymax: float = 50000,
    xmax: float = 2e6,
    pop_id: int = 0,
    truth=None,
):
    """Per-EM-iteration Ne trajectories colored along a rainbow
    (plot.py ``plot_rainbow``); optional truth overlay as step curve."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from .output import Output

    out = Output(results_file)
    d = out.data
    iters = sorted(d["Iter"].unique())
    cmap = plt.get_cmap("rainbow")
    fig, ax = plt.subplots(figsize=(7, 5))
    for i, it in enumerate(iters):
        ne = d[(d["Type"] == "Coal") & (d["Iter"] == it) & (d["From"] == pop_id)]
        ax.step(
            np.maximum(ne["Start"] * g, 1.0),
            ne["Ne"],
            where="post",
            color=cmap(i / max(len(iters) - 1, 1)),
            lw=1,
            label=f"iter {it}" if it in (iters[0], iters[-1]) else None,
        )
    if truth is not None:
        t, ne_t = truth
        ax.step(np.maximum(np.asarray(t) * g, 1.0), ne_t, where="post",
                color="black", lw=2, label="truth")
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlim(1e3, xmax)
    ax.set_ylim(100, ymax)
    ax.set_xlabel("Years ago")
    ax.set_ylabel("Effective population size")
    ax.legend()
    fig.tight_layout()
    fig.savefig(output_file, dpi=150)
    plt.close(fig)


def plot_migration(
    results_file: str,
    output_file: str,
    g: float = 30,
    ymax: float = 0.00025,
    source: int = 0,
    dest: int = 1,
):
    """Directional migration rates over time (plot.py ``plot_migration``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from .output import Output

    out = Output(results_file)
    mig = out.migration()
    fig, ax = plt.subplots(figsize=(7, 4))
    for (s, t), style in (((source, dest), "-"), ((dest, source), "--")):
        m = mig[(mig["From"] == s) & (mig["To"] == t)]
        ax.step(
            np.maximum(m["Start"] * g, 1.0), m["Rate"], where="post",
            linestyle=style, label=f"{s} -> {t}",
        )
    ax.set_xscale("log")
    ax.set_ylim(0, ymax)
    ax.set_xlabel("Years ago")
    ax.set_ylabel("Migration rate (per generation)")
    ax.legend()
    fig.tight_layout()
    fig.savefig(output_file, dpi=150)
    plt.close(fig)


def plot_with_guide(
    results_file: str,
    guide: tuple,
    output_file: str,
    g: float = 30,
    ymax: float = 50000,
    pop_id: int = 0,
):
    """Final Ne trajectory with a truth/guide overlay (plot.py
    ``plot_with_guide``); guide = (times_in_4N0_or_gen, Ne values)."""
    plot_rainbow(
        results_file, output_file, g=g, ymax=ymax, pop_id=pop_id, truth=guide
    )
