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
    mig_time : [P, N, M] f32 — migration-event times on the branch above each
               node, ascending, INF-padded (None for migration-free models)
    mig_dest : [P, N, M] i32 — destination population of each event
               (backwards in time; scrm stores these as unary Nodes with
               ``is_migrating()``, SURVEY.md §2.3)
    """

    parent: jnp.ndarray
    time: jnp.ndarray
    pop: jnp.ndarray
    children: jnp.ndarray
    mig_time: jnp.ndarray = None
    mig_dest: jnp.ndarray = None

    @property
    def num_nodes(self) -> int:
        return self.parent.shape[-1]

    @property
    def num_leaves(self) -> int:
        return (self.num_nodes + 1) // 2


def branch_pop_at(
    tree_pop: jnp.ndarray,
    mig_time: jnp.ndarray,
    mig_dest: jnp.ndarray,
    pop_map_e: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """[N] population of each branch (the lineage above each node) at time t,
    accounting for that branch's migration events below t and the epoch's
    -ej relabeling."""
    if mig_time is None:
        return pop_map_e[tree_pop]
    k = jnp.sum(mig_time <= t, axis=-1)  # [N] events applied
    last = jnp.where(
        k > 0,
        jnp.take_along_axis(
            mig_dest, jnp.maximum(k - 1, 0)[:, None], axis=-1
        )[:, 0],
        tree_pop,
    )
    return pop_map_e[last]


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
    """[N] u32 bitmask of sample leaves below each node (reference:
    src/descendants.hpp:22-33 uses u64; u32 here keeps the kernel x64-free
    on TPU, capping ARG descendant recording at 32 leaves)."""
    N = tree_time.shape[0]
    n = (N + 1) // 2
    mask = jnp.concatenate(
        [
            (jnp.uint32(1) << jnp.arange(n, dtype=jnp.uint32)),
            jnp.zeros(n - 1, dtype=jnp.uint32),
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
    key: jnp.ndarray,
    epochs: Epochs,
    n: int,
    sample_pop: jnp.ndarray,
    sample_time: jnp.ndarray,
    max_mig: int,
    max_iters: int,
) -> tuple:
    """Single-particle structured-coalescent draw: event-driven walk over
    {epoch boundary, sample activation, migration, coalescence} events with
    per-branch migration-event recording.  Replaces scrm's
    ``buildInitialTree`` (used at particleContainer.cpp:33-65)."""
    N = 2 * n - 1
    E = epochs.num_epochs
    Pp = epochs.num_pops
    parent = jnp.full((N,), NO_NODE, dtype=jnp.int32)
    time = jnp.concatenate([sample_time.astype(jnp.float32), jnp.zeros(n - 1)])
    pop = jnp.concatenate([sample_pop, jnp.zeros(n - 1, jnp.int32)])
    children = jnp.full((N, 2), NO_NODE, dtype=jnp.int32)
    mig_time = jnp.full((N, max_mig), INF, dtype=jnp.float32)
    mig_dest = jnp.zeros((N, max_mig), dtype=jnp.int32)
    # slot arrays over leaves+merges: node id / alive / current raw pop
    node_id = jnp.arange(n, dtype=jnp.int32)
    alive = sample_time <= 0.0
    cur_pop = sample_pop.astype(jnp.int32)
    state = dict(
        key=key,
        parent=parent,
        time=time,
        pop=pop,
        children=children,
        mig_time=mig_time,
        mig_dest=mig_dest,
        node_id=node_id,
        alive=alive,
        cur_pop=cur_pop,
        t=jnp.float32(0.0),
        next_id=jnp.int32(n),
        it=jnp.int32(0),
    )

    def cond(s):
        return (jnp.sum(s["alive"]) + jnp.sum(sample_time > s["t"]) > 1) & (
            s["it"] < max_iters
        )

    def body(s):
        key, k1, k2, k3, k4 = jax.random.split(s["key"], 5)
        t = s["t"]
        e = jnp.clip(jnp.searchsorted(epochs.start, t, side="right") - 1, 0, E - 1)
        pm = epochs.pop_map[e]
        mapped = jnp.where(s["alive"], pm[s["cur_pop"]], -1)
        counts = jnp.sum(
            mapped[None, :] == jnp.arange(Pp)[:, None], axis=1
        ).astype(jnp.float32)
        coal_rates = counts * (counts - 1) / 2.0 / (2.0 * epochs.ne[e])  # [Pp]
        mig_out = jnp.sum(epochs.mig[e], axis=1)  # [Pp] total out-rate
        lin_mig = jnp.where(s["alive"], mig_out[pm[s["cur_pop"]]], 0.0)  # [n]
        total = jnp.sum(coal_rates) + jnp.sum(lin_mig)
        # next breakpoint: epoch end or next sample activation
        e_end = jnp.where(e + 1 < E, epochs.start[jnp.minimum(e + 1, E - 1)], INF)
        future = jnp.where(sample_time > t, sample_time.astype(jnp.float32), INF)
        t_bk = jnp.minimum(e_end, jnp.min(future))
        u = jax.random.uniform(k1, (), minval=1e-7, maxval=1.0 - 1e-7)
        dt = jnp.where(total > 0, -jnp.log1p(-u) / jnp.maximum(total, 1e-30), INF)
        hit_bk = t + dt >= t_bk

        def at_breakpoint(s):
            # activate any samples at t_bk
            act = jnp.isclose(sample_time.astype(jnp.float32), t_bk)
            return {
                **s,
                "alive": s["alive"] | act,
                "t": t_bk,
                "key": key,
                "it": s["it"] + 1,
            }

        def at_event(s):
            t_new = t + dt
            # choose coalescence-in-pop vs per-lineage migration
            weights = jnp.concatenate([coal_rates, lin_mig])
            idx = jax.random.categorical(k2, jnp.log(jnp.maximum(weights, 1e-30)))

            def coalesce(s):
                cpop = idx
                in_pop = (mapped == cpop) & s["alive"]
                m = jnp.sum(in_pop)
                r1 = jax.random.randint(k3, (), 0, jnp.maximum(m, 1))
                r2 = jax.random.randint(k4, (), 0, jnp.maximum(m - 1, 1))
                r2 = jnp.where(r2 >= r1, r2 + 1, r2)
                csum = jnp.cumsum(in_pop.astype(jnp.int32)) - 1
                slot1 = jnp.argmax((csum == r1) & in_pop)
                slot2 = jnp.argmax((csum == r2) & in_pop)
                a, b = s["node_id"][slot1], s["node_id"][slot2]
                m_id = s["next_id"]
                parent = s["parent"].at[a].set(m_id).at[b].set(m_id)
                children = s["children"].at[m_id, 0].set(a).at[m_id, 1].set(b)
                time = s["time"].at[m_id].set(t_new)
                pop = s["pop"].at[m_id].set(cpop)
                node_id = s["node_id"].at[slot1].set(m_id)
                alive = s["alive"].at[slot2].set(False)
                cur_pop = s["cur_pop"].at[slot1].set(cpop)
                return {
                    **s,
                    "parent": parent,
                    "children": children,
                    "time": time,
                    "pop": pop,
                    "node_id": node_id,
                    "alive": alive,
                    "cur_pop": cur_pop,
                    "next_id": m_id + 1,
                    "t": t_new,
                    "key": key,
                    "it": s["it"] + 1,
                }

            def migrate(s):
                slot = idx - Pp
                src = pm[s["cur_pop"][slot]]
                w = epochs.mig[e, src]
                dest = jax.random.categorical(
                    k3, jnp.log(jnp.maximum(w, 1e-30))
                ).astype(jnp.int32)
                node = s["node_id"][slot]
                cnt = jnp.sum(s["mig_time"][node] < INF)
                cnt = jnp.minimum(cnt, max_mig - 1)
                mig_time = s["mig_time"].at[node, cnt].set(t_new)
                mig_dest = s["mig_dest"].at[node, cnt].set(dest)
                cur_pop = s["cur_pop"].at[slot].set(dest)
                return {
                    **s,
                    "mig_time": mig_time,
                    "mig_dest": mig_dest,
                    "cur_pop": cur_pop,
                    "t": t_new,
                    "key": key,
                    "it": s["it"] + 1,
                }

            return jax.lax.cond(idx < Pp, coalesce, migrate, s)

        return jax.lax.cond(hit_bk, at_breakpoint, at_event, s)

    s = jax.lax.while_loop(cond, body, state)
    return (
        s["parent"],
        s["time"],
        s["pop"],
        s["children"],
        s["mig_time"],
        s["mig_dest"],
    )


def make_initial_trees(
    key: jnp.ndarray,
    epochs: Epochs,
    num_particles: int,
    sample_pop: jnp.ndarray,
    sample_time: jnp.ndarray | None = None,
    max_mig: int = 16,
    max_iters: int = 256,
) -> Trees:
    """Draw the initial particle population of genealogies at sequence
    position 0 (reference: particleContainer.cpp:33-65)."""
    n = sample_pop.shape[0]
    if sample_time is None:
        sample_time = jnp.zeros((n,), dtype=jnp.float32)
    keys = jax.random.split(key, num_particles)
    parent, time, pop, children, mig_time, mig_dest = jax.vmap(
        lambda k: _sample_initial_tree(
            k, epochs, n, sample_pop, sample_time, max_mig, max_iters
        )
    )(keys)
    return Trees(
        parent=parent,
        time=time,
        pop=pop,
        children=children,
        mig_time=mig_time,
        mig_dest=mig_dest,
    )
