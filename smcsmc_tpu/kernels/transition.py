"""SMC' recombination transition kernel, batched over particles.

Replaces the reference's pointer-walking proposal
(scrm ``Forest::sampleNextGenealogy``; its event logic is spelled out in the
trial-sampling replica at /root/reference/src/particle.cpp:1266-1488) with a
fixed-shape, fully vectorized formulation:

1. sample a recombination point (node ``c``, height ``h_r``) uniformly on the
   local tree (reference ``samplePoint``, particle.cpp:1060; bias weighting
   enters here later);
2. the lineage above the cut re-coalesces with the *original* tree: the
   coalescence intensity at time t is ``k(t) / (2 Ne(t))`` where ``k(t)``
   counts branches crossing t (incl. the root's ancestral lineage); landing
   back on the detached segment of c's own branch regenerates the same tree —
   this is exactly the SMC' transition (the piece-count of the original and
   the spliced tree agree everywhere except on the detached segment);
3. the topology update is a constant-time SPR on the index arrays.

Opportunity/event records (reference: particle.cpp:193-302,
coalevent.hpp:209-244) fall out of the same piecewise decomposition:
coalescence opportunity = Σ pieces k_same_pop·dt, migration opportunity =
Σ dt, both scattered into [E, Pp] tensors.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .tree import INF, Epochs, Trees, branch_lengths, parent_time


class TransitionRecord(NamedTuple):
    """Per-particle sufficient-statistic increments from one transition."""

    coal_opp: jnp.ndarray  # [E, Pp]
    coal_cnt: jnp.ndarray  # [E, Pp]
    mig_opp: jnp.ndarray  # [E, Pp]
    recomb_cnt: jnp.ndarray  # [E]
    recomb_height: jnp.ndarray  # scalar h_r
    coal_height: jnp.ndarray  # scalar t_c


def _epoch_index(epoch_start: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(
        jnp.searchsorted(epoch_start, t, side="right") - 1, 0, epoch_start.shape[0] - 1
    )


def _sample_recomb_point(key, tree_time, tree_parent):
    """Uniform point on the local tree: returns (node c, height h_r)."""
    bl = branch_lengths(tree_time, tree_parent)
    cum = jnp.cumsum(bl)
    total = cum[-1]
    u = jax.random.uniform(key, (), minval=1e-7, maxval=1.0 - 1e-7)
    x = u * total
    c = jnp.searchsorted(cum, x, side="left").astype(jnp.int32)
    c = jnp.clip(c, 0, bl.shape[0] - 1)
    prev = jnp.where(c > 0, cum[jnp.maximum(c - 1, 0)], 0.0)
    h_r = tree_time[c] + (x - prev)
    return c, h_r


def _transition_one(
    key: jnp.ndarray,
    parent: jnp.ndarray,
    time: jnp.ndarray,
    pop: jnp.ndarray,
    children: jnp.ndarray,
    epochs: Epochs,
):
    """Single-particle SMC' transition; vmapped by :func:`recombination_transition`."""
    N = parent.shape[0]
    E = epochs.num_epochs
    Pp = epochs.num_pops
    k_rec, k_coal, k_tgt = jax.random.split(key, 3)

    # ---- 1. recombination point --------------------------------------
    c, h_r = _sample_recomb_point(k_rec, time, parent)

    # ---- 2. piecewise decomposition ----------------------------------
    # breakpoints: every node height and epoch start; pieces are constant in
    # both lineage count and demographic rates.
    b = jnp.sort(jnp.concatenate([time, epochs.start]))  # [I]
    b_end = jnp.append(b[1:], INF)
    e_idx = _epoch_index(epochs.start, b)  # [I]
    pt = parent_time(time, parent)
    crossing = (time[None, :] <= b[:, None]) & (b[:, None] < pt[None, :])  # [I, N]

    # population of each branch / of the floating lineage, per piece (follows
    # the epoch pop_map, which folds -ej splits)
    mp = epochs.pop_map[e_idx]  # [I, Pp]
    branch_pop = jnp.take_along_axis(
        mp, jnp.broadcast_to(pop[None, :], (b.shape[0], N)), axis=1
    )  # [I, N]
    float_pop = jnp.take_along_axis(mp, pop[c][None, None].repeat(b.shape[0], 0), axis=1)[
        :, 0
    ]  # [I]

    same = crossing & (branch_pop == float_pop[:, None])
    k_same = jnp.sum(same, axis=1).astype(jnp.float32)  # [I]
    ne = epochs.ne[e_idx, float_pop]  # [I]
    rate = k_same / (2.0 * ne)

    # ---- 3. coalescence time -----------------------------------------
    from .tree import sample_piecewise_exponential

    u = jax.random.uniform(k_coal, (), minval=1e-7, maxval=1.0 - 1e-7)
    t_c = sample_piecewise_exponential(u, h_r, b, b_end, rate)
    # guard: hazard diverges above the root, so t_c is finite
    t_c = jnp.minimum(t_c, jnp.float32(0.99 * INF))

    # ---- 4. target branch --------------------------------------------
    e_c = _epoch_index(epochs.start, t_c)
    mp_c = epochs.pop_map[e_c]
    fpop_c = mp_c[pop[c]]
    cross_c = (time <= t_c) & (t_c < pt) & (mp_c[pop] == fpop_c)  # [N]
    kc = jnp.sum(cross_c)
    r = jax.random.randint(k_tgt, (), 0, jnp.maximum(kc, 1))
    csum = jnp.cumsum(cross_c.astype(jnp.int32)) - 1
    d = jnp.argmax((csum == r) & cross_c).astype(jnp.int32)

    # ---- 5. SPR update -----------------------------------------------
    p = parent[c]
    sib = children[jnp.clip(p, 0, N - 1)]
    o = jnp.where(sib[0] == c, sib[1], sib[0])
    g = parent[jnp.clip(p, 0, N - 1)]
    noop = d == c
    d_eff = jnp.where(d == p, o, d)
    gp = jnp.where(d_eff == o, g, parent[jnp.clip(d_eff, 0, N - 1)])

    # splice o up to g
    new_parent = parent.at[o].set(g)
    g_i = jnp.clip(g, 0, N - 1)
    g_row = children[g_i]
    g_row = jnp.where(g_row == p, o, g_row)
    new_children = children.at[g_i].set(
        jnp.where(g >= 0, g_row, children[g_i])
    )
    # insert node q (reusing slot p) on the branch above d_eff
    new_parent = new_parent.at[d_eff].set(p).at[p].set(gp)
    new_children = new_children.at[p].set(jnp.stack([c, d_eff]))
    gp_i = jnp.clip(gp, 0, N - 1)
    gp_row = new_children[gp_i]
    gp_row = jnp.where(gp_row == d_eff, p, gp_row)
    new_children = new_children.at[gp_i].set(
        jnp.where(gp >= 0, gp_row, new_children[gp_i])
    )
    new_time = time.at[p].set(t_c)
    new_pop = pop.at[p].set(fpop_c)

    parent_f = jnp.where(noop, parent, new_parent)
    time_f = jnp.where(noop, time, new_time)
    pop_f = jnp.where(noop, pop, new_pop)
    children_f = jnp.where(noop, children, new_children)

    # ---- 6. opportunity / event records ------------------------------
    ov = jnp.clip(jnp.minimum(b_end, t_c) - jnp.maximum(b, h_r), 0.0, None)
    ov = jnp.where(jnp.isfinite(ov), ov, 0.0)
    flat = e_idx * Pp + float_pop
    coal_opp = jax.ops.segment_sum(k_same * ov, flat, num_segments=E * Pp).reshape(
        E, Pp
    )
    mig_opp = jax.ops.segment_sum(ov, flat, num_segments=E * Pp).reshape(E, Pp)
    coal_cnt = jnp.zeros((E, Pp)).at[e_c, fpop_c].add(1.0)
    e_r = _epoch_index(epochs.start, h_r)
    recomb_cnt = jnp.zeros((E,)).at[e_r].add(1.0)

    rec = TransitionRecord(
        coal_opp=coal_opp,
        coal_cnt=coal_cnt,
        mig_opp=mig_opp,
        recomb_cnt=recomb_cnt,
        recomb_height=h_r,
        coal_height=t_c,
    )
    return (parent_f, time_f, pop_f, children_f), rec


def recombination_transition(
    keys: jnp.ndarray, trees: Trees, epochs: Epochs, active: jnp.ndarray
):
    """Apply one masked SMC' transition to every active particle.

    ``active`` [P] bool — particles whose next recombination position falls
    inside the current update window; inactive particles pass through
    untouched and record zeros.
    """

    def one(key, parent, time, pop, children, act):
        (pf, tf, popf, cf), rec = _transition_one(
            key, parent, time, pop, children, epochs
        )
        pf = jnp.where(act, pf, parent)
        tf = jnp.where(act, tf, time)
        popf = jnp.where(act, popf, pop)
        cf = jnp.where(act, cf, children)
        rec = jax.tree_util.tree_map(lambda x: jnp.where(act, x, 0.0), rec)
        return (pf, tf, popf, cf), rec

    (pf, tf, popf, cf), rec = jax.vmap(one)(
        keys, trees.parent, trees.time, trees.pop, trees.children, active
    )
    return Trees(parent=pf, time=tf, pop=popf, children=cf), rec
