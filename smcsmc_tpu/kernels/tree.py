"""Array-encoded genealogies and batched coalescent primitives.

The reference represents each particle as a linked scrm ``Forest``
(/root/reference/src/particle.hpp:118, scrm ``node.h``/``forest.cc``); here a
particle population is a structure-of-arrays pytree with fixed shapes so the
entire population advances in lock-step under ``jit``/``vmap``/``shard_map``.

Node layout for ``n`` sampled haplotypes: nodes ``0..n-1`` are leaves,
``n..2n-2`` are internal; the root is the node with ``parent == -1``.  The
"branch above" node ``i`` spans ``[time[i], time[parent[i]])``; the root's
branch above is its (infinite) ancestral lineage, which is how the SMC'
transition kernel exposes re-coalescence above the root.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

NO_NODE = jnp.int32(-1)
INF = jnp.float32(3e38)


class Trees(NamedTuple):
    """Batched genealogy state. Leading axis = particles.

    parent   : [P, N] i32 — parent index, -1 at root
    time     : [P, N] f32 — node height (generations)
    pop      : [P, N] i32 — population of the lineage at the node's own time
    children : [P, N, 2] i32 — child indices, -1 for leaves
    """

    parent: jnp.ndarray
    time: jnp.ndarray
    pop: jnp.ndarray
    children: jnp.ndarray

    @property
    def num_nodes(self) -> int:
        return self.parent.shape[-1]

    @property
    def num_leaves(self) -> int:
        return (self.num_nodes + 1) // 2


class Epochs(NamedTuple):
    """Device-side demography (piecewise constant; times in generations).

    start : [E] f32 — epoch start times, start[0] == 0
    ne    : [E, Pp] f32 — diploid population sizes
    mig   : [E, Pp, Pp] f32 — per-generation backwards migration rates
    pop_map : [E, Pp] i32 — population relabeling per epoch (folds -ej splits)
    """

    start: jnp.ndarray
    ne: jnp.ndarray
    mig: jnp.ndarray
    pop_map: jnp.ndarray

    @property
    def num_epochs(self) -> int:
        return self.start.shape[0]

    @property
    def num_pops(self) -> int:
        return self.ne.shape[1]

    @property
    def end(self) -> jnp.ndarray:
        return jnp.append(self.start[1:], INF)


def epochs_from_demography(demo) -> Epochs:
    """Build device Epochs from a host :class:`~smcsmc_tpu.demography.Demography`."""
    return Epochs(
        start=jnp.asarray(demo.change_times, dtype=jnp.float32),
        ne=jnp.asarray(demo.pop_sizes, dtype=jnp.float32),
        mig=jnp.asarray(demo.mig_rates, dtype=jnp.float32),
        pop_map=jnp.asarray(demo.pop_map_at_epoch(), dtype=jnp.int32),
    )


# ---------------------------------------------------------------------------
# per-particle helpers (written for a single particle; vmap over particles)
# ---------------------------------------------------------------------------


def parent_time(tree_time: jnp.ndarray, tree_parent: jnp.ndarray) -> jnp.ndarray:
    """[N] time of each node's parent; INF for the root (its branch above is
    the unbounded ancestral lineage)."""
    pt = tree_time[jnp.clip(tree_parent, 0, None)]
    return jnp.where(tree_parent < 0, INF, pt)


def branch_lengths(tree_time: jnp.ndarray, tree_parent: jnp.ndarray) -> jnp.ndarray:
    """[N] finite branch lengths (0 for the root's infinite lineage)."""
    pt = parent_time(tree_time, tree_parent)
    return jnp.where(tree_parent < 0, 0.0, pt - tree_time)


def total_branch_length(tree_time: jnp.ndarray, tree_parent: jnp.ndarray) -> jnp.ndarray:
    """Scalar local tree length (scrm ``getLocalTreeLength``)."""
    return jnp.sum(branch_lengths(tree_time, tree_parent))


def lineage_count_at(
    tree_time: jnp.ndarray, tree_parent: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """Number of lineages (branches, incl. the root's ancestral lineage)
    crossing each time in ``t``: k(s) = #{i : time[i] <= s < parent_time[i]}.

    Uses two sorted searches instead of an [|t|, N] comparison so the batched
    version stays O(P·|t|·log N) in time and O(P·(|t|+N)) in memory.
    """
    starts = jnp.sort(tree_time)
    pt = parent_time(tree_time, tree_parent)
    ends = jnp.sort(jnp.where(jnp.isinf(pt) | (pt >= INF), INF, pt))
    n_started = jnp.searchsorted(starts, t, side="right")
    n_ended = jnp.searchsorted(ends, t, side="right")
    return (n_started - n_ended).astype(jnp.int32)


def branch_length_per_epoch(
    tree_time: jnp.ndarray,
    tree_parent: jnp.ndarray,
    epoch_start: jnp.ndarray,
    epoch_end: jnp.ndarray,
) -> jnp.ndarray:
    """[E] total (finite) branch length inside each epoch.

    Feeds the recombination-opportunity record (reference: coalevent.hpp:221
    ``recomb_opportunity = weight * dt * dx`` summed over time slices — the
    sum over slices of contemporaries×slice-length is exactly the local tree
    length restricted to the epoch)."""
    pt = parent_time(tree_time, tree_parent)
    lo = jnp.maximum(tree_time[None, :], epoch_start[:, None])  # [E, N]
    hi = jnp.minimum(pt[None, :], epoch_end[:, None])
    overlap = jnp.clip(hi - lo, 0.0, None)
    overlap = jnp.where(tree_parent[None, :] < 0, 0.0, overlap)
    return jnp.sum(overlap, axis=1)


def count_data_leaves_below(
    tree_children: jnp.ndarray,
    tree_time: jnp.ndarray,
    has_data: jnp.ndarray,
) -> jnp.ndarray:
    """[N] number of data-carrying leaves below (and including) each node.

    Processes internal nodes in height order (parents are always higher than
    children in a coalescent tree), replacing the reference's recursion
    (particle.cpp:706-730)."""
    N = tree_time.shape[0]
    n = (N + 1) // 2
    cnt = jnp.concatenate([has_data.astype(jnp.int32), jnp.zeros(n - 1, jnp.int32)])
    order = jnp.argsort(tree_time[n:]) + n  # internal nodes, lowest first

    def body(i, cnt):
        v = order[i]
        c0, c1 = tree_children[v, 0], tree_children[v, 1]
        return cnt.at[v].set(cnt[c0] + cnt[c1])

    return jax.lax.fori_loop(0, n - 1, body, cnt)


def data_branch_length(
    tree_time: jnp.ndarray,
    tree_parent: jnp.ndarray,
    tree_children: jnp.ndarray,
    has_data: jnp.ndarray,
) -> jnp.ndarray:
    """Total length of branches informative about mutations: branches with at
    least one data-carrying descendant, below the MRCA of the data leaves
    (reference: particle.cpp:699-730, ``trackLocalTreeBranchLength``)."""
    cnt = count_data_leaves_below(tree_children, tree_time, has_data)
    total = jnp.sum(has_data.astype(jnp.int32))
    bl = branch_lengths(tree_time, tree_parent)
    informative = (cnt >= 1) & (cnt < total)
    return jnp.sum(jnp.where(informative, bl, 0.0))


def descendant_bitmask(
    tree_children: jnp.ndarray, tree_time: jnp.ndarray
) -> jnp.ndarray:
    """[N] u64 bitmask of sample leaves below each node (reference:
    src/descendants.hpp:22-33)."""
    N = tree_time.shape[0]
    n = (N + 1) // 2
    mask = jnp.concatenate(
        [
            (jnp.uint64(1) << jnp.arange(n, dtype=jnp.uint64)),
            jnp.zeros(n - 1, dtype=jnp.uint64),
        ]
    )
    order = jnp.argsort(tree_time[n:]) + n

    def body(i, mask):
        v = order[i]
        return mask.at[v].set(mask[tree_children[v, 0]] | mask[tree_children[v, 1]])

    return jax.lax.fori_loop(0, n - 1, body, mask)


# ---------------------------------------------------------------------------
# piecewise-exponential sampling
# ---------------------------------------------------------------------------


def sample_piecewise_exponential(
    u: jnp.ndarray,
    t0: jnp.ndarray,
    seg_start: jnp.ndarray,
    seg_end: jnp.ndarray,
    seg_rate: jnp.ndarray,
) -> jnp.ndarray:
    """Invert a unit-exponential draw through a piecewise-constant hazard.

    ``u`` in (0,1); pieces ``[seg_start_j, seg_end_j)`` with rates
    ``seg_rate_j`` must tile ``[t0, inf)`` (pieces before ``t0`` are clipped
    away).  Returns the event time (INF if total hazard is finite and the
    draw survives it).  This replaces scrm's per-event
    ``sampleExpoLimit``/``TimeInterval`` walk with one vectorized inversion.
    """
    x = -jnp.log1p(-u)  # Exp(1)
    lo = jnp.maximum(seg_start, t0)
    ln = jnp.clip(seg_end - lo, 0.0, None)
    haz = jnp.where(ln > 0, seg_rate * ln, 0.0)
    # piece with infinite length and positive rate has infinite hazard
    haz = jnp.where((ln >= INF) & (seg_rate > 0), INF, haz)
    cum = jnp.cumsum(haz)
    idx = jnp.searchsorted(cum, x, side="left")
    idx = jnp.clip(idx, 0, seg_rate.shape[0] - 1)
    prev = jnp.where(idx > 0, cum[jnp.maximum(idx - 1, 0)], 0.0)
    rate = seg_rate[idx]
    t = lo[idx] + jnp.where(rate > 0, (x - prev) / jnp.maximum(rate, 1e-30), INF)
    return jnp.where(x > cum[-1], INF, t)


# ---------------------------------------------------------------------------
# initial tree sampling (reference: scrm buildInitialTree, used at
# particleContainer.cpp:33-65)
# ---------------------------------------------------------------------------


def _sample_initial_tree(
    key: jnp.ndarray, epochs: Epochs, n: int, sample_pop: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-particle structured-coalescent tree draw (no continuous
    migration inside the draw yet: lineage populations follow the epoch
    pop_map, which covers single-pop and clean-split models; migration in the
    prior draw arrives with the migration transition kernel)."""
    N = 2 * n - 1
    parent = jnp.full((N,), NO_NODE, dtype=jnp.int32)
    time = jnp.zeros((N,), dtype=jnp.float32)
    pop = jnp.concatenate([sample_pop, jnp.zeros(n - 1, jnp.int32)])
    children = jnp.full((N, 2), NO_NODE, dtype=jnp.int32)
    active = jnp.arange(n, dtype=jnp.int32)  # slots 0..k-1 valid

    E = epochs.num_epochs
    ep_start, ep_end = epochs.start, epochs.end

    def body(s, carry):
        key, parent, time, pop, children, active, t = carry
        k = n - s
        key, k1, k2, k3 = jax.random.split(key, 4)
        # populations of active lineages in this epoch regime
        kf = jnp.float32(k)
        # single-pop rate per epoch: C(k,2) / (2 Ne_e); multi-pop lineages are
        # mapped through pop_map per epoch.  For the common single/merged case
        # we use pairwise counts per population.
        act_mask = jnp.arange(n) < k
        act_pop = jnp.where(act_mask, pop[jnp.clip(active, 0, N - 1)], -1)

        def epoch_rate(e):
            pm = epochs.pop_map[e]
            mapped = jnp.where(act_pop >= 0, pm[jnp.clip(act_pop, 0, None)], -1)
            counts = jnp.sum(
                (mapped[None, :] == jnp.arange(epochs.num_pops)[:, None]), axis=1
            ).astype(jnp.float32)
            return jnp.sum(counts * (counts - 1) / 2.0 / (2.0 * epochs.ne[e]))

        rates = jax.vmap(epoch_rate)(jnp.arange(E))
        u = jax.random.uniform(k1, (), minval=1e-7, maxval=1.0 - 1e-7)
        t_new = sample_piecewise_exponential(u, t, ep_start, ep_end, rates)
        # choose a population for the coalescence proportional to its pair rate
        e_new = jnp.clip(
            jnp.searchsorted(ep_start, t_new, side="right") - 1, 0, E - 1
        )
        pm = epochs.pop_map[e_new]
        mapped = jnp.where(act_pop >= 0, pm[jnp.clip(act_pop, 0, None)], -1)
        counts = jnp.sum(
            (mapped[None, :] == jnp.arange(epochs.num_pops)[:, None]), axis=1
        ).astype(jnp.float32)
        pop_w = counts * (counts - 1) / (2.0 * epochs.ne[e_new])
        cpop = jax.random.categorical(k2, jnp.log(jnp.maximum(pop_w, 1e-30)))
        # choose two distinct active lineages from that population
        in_pop = (mapped == cpop) & act_mask
        m = jnp.sum(in_pop)
        r1 = jax.random.randint(k3, (), 0, jnp.maximum(m, 1))
        key, k4 = jax.random.split(key)
        r2 = jax.random.randint(k4, (), 0, jnp.maximum(m - 1, 1))
        r2 = jnp.where(r2 >= r1, r2 + 1, r2)
        csum = jnp.cumsum(in_pop.astype(jnp.int32)) - 1
        slot1 = jnp.argmax(csum == r1)
        slot2 = jnp.argmax(csum == r2)
        a, b = active[slot1], active[slot2]
        m_id = jnp.int32(n + s)
        parent = parent.at[a].set(m_id).at[b].set(m_id)
        children = children.at[m_id, 0].set(a).at[m_id, 1].set(b)
        time = time.at[m_id].set(t_new)
        pop = pop.at[m_id].set(cpop)
        # compact active set: slot1 <- merged node, slot2 <- last active
        lo = jnp.minimum(slot1, slot2)
        hi = jnp.maximum(slot1, slot2)
        active = active.at[lo].set(m_id)
        active = active.at[hi].set(active[k - 1])
        return key, parent, time, pop, children, active, t_new

    carry = (key, parent, time, pop, children, active, jnp.float32(0.0))
    _, parent, time, pop, children, _, _ = jax.lax.fori_loop(0, n - 1, body, carry)
    return parent, time, pop, children


def make_initial_trees(
    key: jnp.ndarray, epochs: Epochs, num_particles: int, sample_pop: jnp.ndarray
) -> Trees:
    """Draw the initial particle population of genealogies at sequence
    position 0 (reference: particleContainer.cpp:33-65)."""
    n = sample_pop.shape[0]
    keys = jax.random.split(key, num_particles)
    parent, time, pop, children = jax.vmap(
        lambda k: _sample_initial_tree(k, epochs, n, sample_pop)
    )(keys)
    return Trees(parent=parent, time=time, pop=pop, children=children)
