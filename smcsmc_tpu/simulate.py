"""Sequence simulator: the framework's equivalent of the reference's bundled
``scrm`` binary (CMakeLists.txt:77; used for test data at
populationmodels.py:439-500).

A deliberately independent numpy implementation of the coalescent + SMC'
process (piecewise-constant structured demography, recombination along the
sequence, infinite-sites mutations), so that the JAX inference kernels are
validated against separately-written code.  Output is .seg data
(convert_scrm_to_seg format, populationmodels.py:502-577).
"""

from __future__ import annotations

import numpy as np

from .demography import Demography
from .segio import SegData


class _Sim:
    """One genealogy under SMC' along the sequence (numpy, single instance)."""

    def __init__(self, demo: Demography, rng: np.random.Generator):
        self.demo = demo
        self.rng = rng
        n = demo.num_samples
        self.n = n
        N = 2 * n - 1
        self.parent = np.full(N, -1, dtype=np.int64)
        self.time = np.zeros(N)
        self.pop = np.zeros(N, dtype=np.int64)
        self.children = np.full((N, 2), -1, dtype=np.int64)
        self.pop[:n] = demo.sample_pops
        self._pop_map = demo.pop_map_at_epoch()
        self._build_initial()

    # -- demography helpers -------------------------------------------------

    def _epoch(self, t: float) -> int:
        return self.demo.epoch_of(t)

    def _mapped_pop(self, raw_pop: int, t: float) -> int:
        return int(self._pop_map[self._epoch(t), raw_pop])

    # -- initial tree -------------------------------------------------------

    def _build_initial(self):
        demo = self.demo
        n = self.n
        active = list(range(n))
        pops = [int(p) for p in demo.sample_pops]
        t = 0.0
        next_id = n
        ct = demo.change_times
        while len(active) > 1:
            # piecewise-constant total pair rate (plus migration)
            e = self._epoch(t)
            while True:
                pm = self._pop_map[e]
                mapped = [int(pm[p]) for p in pops]
                rates = []
                for p in range(demo.num_populations):
                    k = mapped.count(p)
                    rates.append(k * (k - 1) / 2.0 / (2.0 * demo.pop_sizes[e, p]))
                mig_out = [
                    float(np.sum(demo.mig_rates[e, pm[pops[i]]]))
                    for i in range(len(active))
                ]
                total = sum(rates) + sum(mig_out)
                e_end = ct[e + 1] if e + 1 < len(ct) else np.inf
                if total <= 0:
                    t = e_end
                    e += 1
                    continue
                dt = self.rng.exponential(1.0 / total)
                if t + dt < e_end:
                    t = t + dt
                    break
                t = e_end
                e += 1
            # choose event
            u = self.rng.uniform() * total
            acc = 0.0
            event = None
            for p in range(demo.num_populations):
                acc += rates[p]
                if u < acc:
                    event = ("coal", p)
                    break
            if event is None:
                for i in range(len(active)):
                    acc += mig_out[i]
                    if u < acc:
                        event = ("mig", i)
                        break
            if event is None:
                event = ("coal", int(np.argmax(rates)))
            if event[0] == "mig":
                i = event[1]
                src = int(self._pop_map[e, pops[i]])
                w = demo.mig_rates[e, src].copy()
                w[src] = 0
                dest = self.rng.choice(demo.num_populations, p=w / w.sum())
                pops[i] = int(dest)
                continue
            p = event[1]
            members = [i for i, mp in enumerate(mapped) if mp == p]
            i, j = self.rng.choice(len(members), size=2, replace=False)
            a, b = members[i], members[j]
            node_a, node_b = active[a], active[b]
            m = next_id
            next_id += 1
            self.parent[node_a] = m
            self.parent[node_b] = m
            self.children[m] = [node_a, node_b]
            self.time[m] = t
            self.pop[m] = p
            for idx in sorted([a, b], reverse=True):
                del active[idx]
                del pops[idx]
            active.append(m)
            pops.append(p)

    # -- tree queries -------------------------------------------------------

    def root(self) -> int:
        return int(np.where(self.parent == -1)[0][0])

    def parent_time(self) -> np.ndarray:
        pt = np.where(self.parent >= 0, self.time[np.clip(self.parent, 0, None)], np.inf)
        return pt

    def branch_lengths(self) -> np.ndarray:
        pt = self.parent_time()
        bl = np.where(self.parent >= 0, pt - self.time, 0.0)
        return bl

    def total_length(self) -> float:
        return float(self.branch_lengths().sum())

    def leaves_below(self, v: int) -> np.ndarray:
        out = []
        stack = [v]
        while stack:
            x = stack.pop()
            if x < self.n:
                out.append(x)
            else:
                stack += [int(c) for c in self.children[x]]
        return np.array(sorted(out))

    # -- SMC' transition ----------------------------------------------------

    def recombine(self):
        bl = self.branch_lengths()
        x = self.rng.uniform() * bl.sum()
        c = int(np.searchsorted(np.cumsum(bl), x))
        h_r = self.time[c] + (x - (np.cumsum(bl)[c - 1] if c > 0 else 0.0))
        # re-coalesce floating lineage from h_r against the original tree
        demo = self.demo
        pt = self.parent_time()
        t = h_r
        lineage_pop = self._mapped_pop(int(self.pop[c]), h_r)
        while True:
            e = self._epoch(t)
            ct = demo.change_times
            e_end = ct[e + 1] if e + 1 < len(ct) else np.inf
            pm = self._pop_map[e]
            lineage_pop = int(pm[lineage_pop])
            crossing = (self.time <= t) & (t < pt)
            cross_pops = pm[self.pop]
            k_same = int(np.sum(crossing & (cross_pops == lineage_pop)))
            coal_rate = k_same / (2.0 * demo.pop_sizes[e, lineage_pop])
            mig_rate = float(np.sum(demo.mig_rates[e, lineage_pop]))
            total = coal_rate + mig_rate
            # next structural change: a node time above t, or epoch end
            nts = self.time[(self.time > t)]
            next_bk = min(
                float(nts.min()) if len(nts) else np.inf,
                e_end,
            )
            if total <= 0:
                t = next_bk
                continue
            dt = self.rng.exponential(1.0 / total)
            if t + dt >= next_bk:
                t = next_bk
                continue
            t = t + dt
            if self.rng.uniform() * total < mig_rate:
                w = demo.mig_rates[e, lineage_pop].copy()
                w[lineage_pop] = 0
                lineage_pop = int(self.rng.choice(len(w), p=w / w.sum()))
                continue
            # coalescence at time t with a uniformly chosen same-pop branch
            cands = np.where(crossing & (cross_pops == lineage_pop))[0]
            d = int(self.rng.choice(cands))
            break
        t_c = t
        if d == c:
            return  # SMC' self-coalescence: unchanged tree
        p = int(self.parent[c])
        o = int(self.children[p][0] if self.children[p][1] == c else self.children[p][1])
        g = int(self.parent[p])
        d_eff = o if d == p else d
        gp = g if d_eff == o else int(self.parent[d_eff])
        # splice o up
        self.parent[o] = g
        if g >= 0:
            self.children[g][self.children[g] == p] = o
        # insert node p on branch above d_eff
        self.parent[d_eff] = p
        self.parent[p] = gp
        self.children[p] = [c, d_eff]
        if gp >= 0:
            self.children[gp][self.children[gp] == d_eff] = p
        self.time[p] = t_c
        self.pop[p] = lineage_pop


def simulate_seg(
    demo: Demography,
    seed: int = 1,
    missing_leaves: list[int] | None = None,
    phased: bool = True,
) -> SegData:
    """Simulate haplotypes and return .seg data (the reference's
    ``Population.simulate`` + ``convert_scrm_to_seg`` path)."""
    rng = np.random.default_rng(seed)
    sim = _Sim(demo, rng)
    L = int(demo.sequence_length)
    mu = demo.mutation_rate
    rho = demo.recombination_rate
    n = demo.num_samples

    var_positions = []
    var_alleles = []
    x = 0.0
    while x < L:
        tl = sim.total_length()
        d_rec = rng.exponential(1.0 / max(rho * tl, 1e-300)) if rho > 0 else np.inf
        seg_end = min(x + d_rec, L)
        # mutations on this tree over [x, seg_end)
        n_mut = rng.poisson(mu * tl * (seg_end - x))
        if n_mut:
            positions = np.sort(rng.uniform(x, seg_end, size=n_mut))
            bl = sim.branch_lengths()
            cum = np.cumsum(bl)
            for pos in positions:
                b = int(np.searchsorted(cum, rng.uniform() * cum[-1]))
                carriers = sim.leaves_below(b)
                if 0 < len(carriers) < n:
                    al = np.zeros(n, dtype=np.int8)
                    al[carriers] = 1
                    var_positions.append(int(pos) + 1)
                    var_alleles.append(al)
        x = seg_end
        if x < L:
            sim.recombine()

    # dedupe integer positions
    seen = {}
    for p, a in zip(var_positions, var_alleles):
        seen[p] = a
    var_positions = sorted(seen)
    var_alleles = [seen[p] for p in var_positions]

    # build .seg rows: same layout as convert_scrm_to_seg
    # (populationmodels.py:533-577): row covers [pos, next_pos), allele column
    # = variant at the row's final position
    positions = [1] + var_positions
    rows_pos, rows_len, rows_al = [], [], []
    for idx in range(len(positions) - 1):
        rows_pos.append(positions[idx])
        rows_len.append(positions[idx + 1] - positions[idx])
        rows_al.append(var_alleles[idx])
    # final invariant row to the end of the sequence
    rows_pos.append(positions[-1])
    rows_len.append(L - positions[-1] + 1)
    rows_al.append(np.full(n, -1, dtype=np.int8))

    alleles = np.array(rows_al, dtype=np.int8)
    if missing_leaves:
        alleles[:, missing_leaves] = -1
    if not phased:
        for i in range(0, n - 1, 2):
            het = alleles[:, i] != alleles[:, i + 1]
            known = (alleles[:, i] >= 0) & (alleles[:, i + 1] >= 0)
            unph = het & known
            alleles[unph, i] = 2
            alleles[unph, i + 1] = 2

    return SegData(
        positions=np.array(rows_pos, dtype=np.int64),
        lengths=np.array(rows_len, dtype=np.int64),
        states=np.zeros(len(rows_pos), dtype=np.int8),
        alleles=alleles,
        phased=np.array([phased] * n),
    )
