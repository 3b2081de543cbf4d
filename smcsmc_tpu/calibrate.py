"""Lag/delay calibration: median genomic survival distance of tree nodes.

Reference: ``calculate_median_survival_distances`` (smcsmc.cpp:169-263) runs
a Monte-Carlo pre-pass simulating ARGs along the sequence and measures, per
epoch, the median distance a coalescent node survives before an SPR removes
it; ``lag[e] = lag_fraction * median_survival[e]`` and the delayed-IW
application delays are ``delay * survival`` (smcsmc.cpp:307,
model->lags_to_application_delays).

Here the same measurement runs on-device: a population of Q genealogies
advances through the clocked SMC' process; a transition that displaces node
``p = parent[c]`` ends that node's life, and the survival distance is
scattered into per-epoch log-spaced histograms from which medians are read.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .kernels.transition import recombination_transition
from .kernels.tree import Epochs, make_initial_trees, total_branch_length


def calibrate_survival(
    key,
    epochs: Epochs,
    sample_pop: np.ndarray,
    rho: float,
    num_particles: int = 256,
    distance: float = 2e6,
    num_windows: int = 20,
    has_migration: bool = False,
    num_bins: int = 64,
    max_mig: int = 16,
) -> np.ndarray:
    """[E] median survival distance (bp) of nodes whose height falls in each
    epoch.  Epochs with no observed deaths fall back to the global median."""
    E = epochs.num_epochs
    P = num_particles
    window = distance / num_windows
    # log-spaced distance bins from 100 bp to 10 * distance
    bin_edges = jnp.asarray(
        np.logspace(2, np.log10(distance * 10), num_bins - 1), jnp.float32
    )

    trees = make_initial_trees(
        key, epochs, P, jnp.asarray(sample_pop),
        max_mig=max_mig if has_migration else 0,
    )
    N = trees.parent.shape[1]
    k1, k2, key = jax.random.split(key, 3)
    tl0 = jax.vmap(total_branch_length)(trees.time, trees.parent)
    next_rec = jax.random.exponential(k1, (P,)) / (rho * tl0)
    birth = jnp.zeros((P, N))
    hist = jnp.zeros((E, num_bins), jnp.int32)

    @jax.jit
    def run_window(carry, _):
        trees, next_rec, birth, hist, key, x0 = carry

        def cond(c):
            return jnp.any(c[1] < window)

        def body(c):
            trees, nr, birth, hist, key, x0 = c
            active = nr < window
            key, s1, s2 = jax.random.split(key, 3)
            keys = jax.random.split(s1, P)
            pre_time = trees.time
            pre_parent = trees.parent
            trees2, rec = recombination_transition(
                keys, trees, epochs, active, has_migration=has_migration
            )
            # node p = parent[c] dies when its height changed (non-noop SPR)
            rows = jnp.arange(P)
            p_idx = pre_parent[rows, rec.c_node]
            p_safe = jnp.clip(p_idx, 0, N - 1)
            old_t = pre_time[rows, p_safe]
            new_t = trees2.time[rows, p_safe]
            died = active & (p_idx >= 0) & (jnp.abs(new_t - old_t) > 1e-3)
            pos = x0 + nr
            surv = pos - birth[rows, p_safe]
            e_old = jnp.clip(
                jnp.searchsorted(epochs.start, old_t, side="right") - 1, 0, E - 1
            )
            b_idx = jnp.searchsorted(bin_edges, surv, side="left")
            flat = e_old * hist.shape[1] + b_idx
            upd = jax.ops.segment_sum(
                died.astype(jnp.int32), flat, num_segments=E * hist.shape[1]
            ).reshape(E, hist.shape[1])
            hist = hist + upd
            # the replacement node (slot p) is born here
            birth = birth.at[rows, p_safe].set(
                jnp.where(died, pos, birth[rows, p_safe])
            )
            tl = jax.vmap(total_branch_length)(trees2.time, trees2.parent)
            gap = jax.random.exponential(s2, (P,)) / (rho * tl)
            nr = jnp.where(active, nr + gap, nr)
            return trees2, nr, birth, hist, key, x0

        trees, next_rec, birth, hist, key, x0 = jax.lax.while_loop(
            cond, body, (trees, next_rec, birth, hist, key, x0)
        )
        return (trees, next_rec - window, birth, hist, key, x0 + window), None

    carry = (trees, next_rec, birth, hist, k2, jnp.float32(0.0))
    (trees, next_rec, birth, hist, key, _), _ = jax.lax.scan(
        run_window, carry, None, length=num_windows
    )

    h = np.asarray(hist, dtype=np.float64)
    edges = np.concatenate([[0.0], np.asarray(bin_edges), [distance * 10]])
    centers = 0.5 * (edges[:-1] + edges[1:])
    medians = np.zeros(E)
    all_counts = h.sum(axis=0)
    global_med = _hist_median(all_counts, centers)
    for e in range(E):
        medians[e] = (
            _hist_median(h[e], centers) if h[e].sum() >= 10 else global_med
        )
    return medians


def _hist_median(counts: np.ndarray, centers: np.ndarray) -> float:
    total = counts.sum()
    if total == 0:
        return float("nan")
    cum = np.cumsum(counts)
    i = int(np.searchsorted(cum, total / 2.0))
    return float(centers[min(i, len(centers) - 1)])


def terminal_branch_quantiles(
    key,
    epochs: Epochs,
    sample_pop: np.ndarray,
    num_trees: int = 100_000,
    batch: int = 25_000,
    probs=None,
):
    """(lengths [n, Q], bin widths [Q], mean total branch length).

    Reference: ``calculate_terminal_branch_length_quantiles``
    (smcsmc.cpp:128-166) simulates 1e6 trees from the model and records, per
    leaf, quantiles of the leaf's parent height (the terminal branch length)
    plus the mean local tree length — the inputs of the APF lookahead.  Here
    the simulation is the vmapped structured-coalescent initial-tree kernel;
    our trees have no unary migration nodes, so the leaf parent *is*
    ``parent_height_ignoring_migrations`` (smcsmc.cpp:116-125).
    """
    from .kernels.lookahead import TBLQ_PROBS, tblq_bin_widths

    probs = tuple(probs) if probs is not None else TBLQ_PROBS
    n = len(sample_pop)
    sample_pop = jnp.asarray(sample_pop)

    @jax.jit
    def sim(k):
        trees = make_initial_trees(k, epochs, batch, sample_pop, max_mig=0)
        pt = jnp.take_along_axis(
            trees.time, jnp.clip(trees.parent[:, :n], 0, None), axis=1
        )  # [batch, n] leaf parent heights
        tl = jax.vmap(total_branch_length)(trees.time, trees.parent)
        return pt, tl

    pts, tls = [], []
    for i in range((num_trees + batch - 1) // batch):
        key, sub = jax.random.split(key)
        pt, tl = sim(sub)
        pts.append(np.asarray(pt))
        tls.append(np.asarray(tl))
    pt = np.concatenate(pts)  # [T, n]
    lengths = np.quantile(pt, np.asarray(probs), axis=0).T  # [n, Q]
    return (
        lengths.astype(np.float32),
        tblq_bin_widths(probs).astype(np.float32),
        float(np.mean(np.concatenate(tls))),
    )


def default_bias_strengths(
    key,
    epochs: Epochs,
    sample_pop: np.ndarray,
    bias_heights,
    num_trees: int = 20_000,
    batch: int = 10_000,
    max_strength: float = 10.0,
) -> tuple:
    """Model-derived default ``bias_strengths`` for the given section
    boundaries — the equivalent of the reference's ``getBiasRatio``
    machinery (model_summary.hpp:119-133 + ModelSummary's
    avg_B_within_bias_section pre-pass), which measures expected branch
    length within each bias section by simulating trees from the model.

    getBiasRatio gives section idx's share of sampled recombination mass:
    ``B_total * s_idx / sum_j B_j * s_j``.  Choosing ``s_j = B_K / B_j``
    (normalized so the last section keeps strength 1, as in the reference's
    recommended usage, e.g. ``-bias_strengths 2 1``) equalizes the expected
    sampling mass across sections: recent sections with little branch
    length get proportionally more proposal attention.  Strengths are
    clipped to [1, max_strength] so no section is *down*-weighted and the
    importance-weight variance stays bounded."""
    from .kernels.tree import branch_length_per_epoch

    heights = np.concatenate([[0.0], np.asarray(bias_heights, np.float64)])
    starts = jnp.asarray(heights, jnp.float32)
    ends = jnp.concatenate([starts[1:], jnp.asarray([3e38], jnp.float32)])
    sample_pop = jnp.asarray(sample_pop)

    @jax.jit
    def sim(k):
        trees = make_initial_trees(k, epochs, batch, sample_pop, max_mig=0)
        return jnp.mean(
            jax.vmap(
                lambda t, p: branch_length_per_epoch(t, p, starts, ends)
            )(trees.time, trees.parent),
            axis=0,
        )

    acc = np.zeros(len(heights))
    reps = (num_trees + batch - 1) // batch
    for _ in range(reps):
        key, sub = jax.random.split(key)
        acc += np.asarray(sim(sub), np.float64)
    b = acc / reps
    b = np.maximum(b, 1e-6 * b.sum() + 1e-30)
    s = b[-1] / b
    return tuple(float(x) for x in np.clip(s, 1.0, max_strength))


def calibrated_lags_and_delays(
    key, epochs, sample_pop, rho, lag_fraction=2.0, delay=0.5, **kw
):
    """(lags [E], delays [E]) per the reference composition: lag =
    lag_fraction * survival; application delay = delay * survival."""
    surv = calibrate_survival(key, epochs, sample_pop, rho, **kw)
    surv = np.nan_to_num(surv, nan=20000.0)
    return lag_fraction * surv, delay * surv
