"""Structured-coalescent (migration) kernel tests.

Island-model expectations for two demes of diploid size Ne with
per-generation backwards migration rate m per lineage:
  E[T_within] = 4*Ne generations (independent of m),
  E[T_between] = 4*Ne + 1/(2m).
(Standard strong-migration/island results, cf. Wakeley Coalescent Theory.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smcsmc_tpu.demography import Demography
from smcsmc_tpu.kernels.transition import recombination_transition
from smcsmc_tpu.kernels.tree import (
    branch_pop_at,
    epochs_from_demography,
    make_initial_trees,
    total_branch_length,
)


def island_demo(ne=10000.0, m=1e-4, sample_pops=(0, 1)):
    return Demography(
        change_times=np.array([0.0]),
        pop_sizes=np.array([[ne, ne]]),
        mig_rates=np.array([[[0.0, m], [m, 0.0]]]),
        sample_pops=np.array(sample_pops, dtype=np.int32),
    )


class TestIslandModel:
    def test_within_pair_tmrca(self):
        ne = 10000.0
        demo = island_demo(ne=ne, m=1e-4, sample_pops=(0, 0))
        epochs = epochs_from_demography(demo)
        trees = make_initial_trees(
            jax.random.PRNGKey(0), epochs, 8000, jnp.asarray(demo.sample_pops)
        )
        tmrca = np.asarray(trees.time[:, 2])
        assert tmrca.mean() == pytest.approx(4 * ne, rel=0.08)

    def test_between_pair_tmrca(self):
        ne, m = 10000.0, 1e-4
        demo = island_demo(ne=ne, m=m, sample_pops=(0, 1))
        epochs = epochs_from_demography(demo)
        trees = make_initial_trees(
            jax.random.PRNGKey(1), epochs, 8000, jnp.asarray(demo.sample_pops)
        )
        tmrca = np.asarray(trees.time[:, 2])
        expected = 4 * ne + 1.0 / (2 * m)
        assert tmrca.mean() == pytest.approx(expected, rel=0.08)

    def test_branch_pop_consistency(self):
        """Branch pop just below a parent node must match a sibling: two
        lineages can only coalesce in the same population."""
        demo = island_demo(sample_pops=(0, 0, 1, 1))
        epochs = epochs_from_demography(demo)
        trees = make_initial_trees(
            jax.random.PRNGKey(2), epochs, 500, jnp.asarray(demo.sample_pops)
        )
        pm = jnp.arange(2, dtype=jnp.int32)  # identity (no splits)
        par = np.asarray(trees.parent)
        tm = np.asarray(trees.time)
        ok = 0
        for p_i in range(100):
            for v in range(4, 7):  # internal nodes
                c0, c1 = np.asarray(trees.children)[p_i, v]
                t_v = tm[p_i, v]
                bp = np.asarray(
                    branch_pop_at(
                        trees.pop[p_i],
                        trees.mig_time[p_i],
                        trees.mig_dest[p_i],
                        pm,
                        jnp.float32(t_v - 1e-3),
                    )
                )
                # both children's branches must be in the parent's population
                assert bp[c0] == bp[c1] == np.asarray(trees.pop)[p_i, v]
                ok += 1
        assert ok == 300

    @pytest.mark.slow
    def test_sequence_invariance_with_migration(self):
        """Clocked SMC' process with the migration walk preserves the
        structured-coalescent prior (tree length and TMRCA)."""
        ne, m = 10000.0, 1e-4
        rho = 1e-8
        window = 7.5e4
        demo = island_demo(ne=ne, m=m, sample_pops=(0, 1))
        epochs = epochs_from_demography(demo)
        P = 2000
        trees = make_initial_trees(
            jax.random.PRNGKey(3), epochs, P, jnp.asarray(demo.sample_pops)
        )
        key = jax.random.PRNGKey(4)
        tl0 = jax.vmap(total_branch_length)(trees.time, trees.parent)
        next_rec = jax.random.exponential(jax.random.PRNGKey(5), (P,)) / (rho * tl0)

        @jax.jit
        def step(trees, next_rec, key):
            def cond(c):
                _, nr, _ = c
                return jnp.any(nr < window)

            def body(c):
                trees, nr, key = c
                active = nr < window
                key, s1, s2 = jax.random.split(key, 3)
                keys = jax.random.split(s1, P)
                trees, _ = recombination_transition(
                    keys, trees, epochs, active, has_migration=True
                )
                tl = jax.vmap(total_branch_length)(trees.time, trees.parent)
                gap = jax.random.exponential(s2, (P,)) / (rho * tl)
                nr = jnp.where(active, nr + gap, nr)
                return trees, nr, key

            trees, next_rec, key = jax.lax.while_loop(
                cond, body, (trees, next_rec, key)
            )
            return trees, next_rec - window, key

        for _ in range(20):
            trees, next_rec, key = step(trees, next_rec, key)

        tmrca = np.asarray(trees.time[:, 2])
        expected = 4 * ne + 1.0 / (2 * m)
        assert tmrca.mean() == pytest.approx(expected, rel=0.08)
        # migration-event buffers stay consistent: sibling branch pops match
        # at the coalescence (rare exceptions allowed from graceful event-
        # buffer overflow folding, which coarsens the path below a branch's
        # earliest retained event)
        tm = np.asarray(trees.time)
        ch = np.asarray(trees.children)
        pm = jnp.arange(2, dtype=jnp.int32)
        bad = 0
        for p_i in range(100):
            v = 2
            c0, c1 = ch[p_i, v]
            bp = np.asarray(
                branch_pop_at(
                    trees.pop[p_i],
                    trees.mig_time[p_i],
                    trees.mig_dest[p_i],
                    pm,
                    jnp.float32(tm[p_i, v] - 1e-3),
                )
            )
            bad += int(bp[c0] != bp[c1])
        assert bad <= 3, f"{bad}/100 sibling-pop mismatches"

    def test_migration_records(self):
        """The walk records migration counts consistent with opportunity:
        E[count] = m * E[opportunity]."""
        ne, m = 10000.0, 2e-4
        demo = island_demo(ne=ne, m=m, sample_pops=(0, 1))
        epochs = epochs_from_demography(demo)
        P = 4000
        trees = make_initial_trees(
            jax.random.PRNGKey(6), epochs, P, jnp.asarray(demo.sample_pops)
        )
        keys = jax.random.split(jax.random.PRNGKey(7), P)
        _, rec = recombination_transition(
            keys, trees, epochs, jnp.ones(P, bool), has_migration=True
        )
        mig_opp = np.asarray(rec.mig_opp).sum()
        mig_cnt = np.asarray(rec.mig_cnt).sum()
        assert mig_cnt / mig_opp == pytest.approx(m, rel=0.1)
        # coalescence E-step consistency
        coal_opp = np.asarray(rec.coal_opp).sum(axis=(1, 2))
        assert coal_opp.mean() / (2 * ne) == pytest.approx(1.0, rel=0.1)
