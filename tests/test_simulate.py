"""Tests for the numpy reference simulator (oracle for the JAX kernels)."""

import numpy as np
import pytest

from smcsmc_tpu.demography import Demography
from smcsmc_tpu.simulate import _Sim, simulate_seg


def const_demo(ne=10000.0, n=2, L=1e6, mu=1e-8, rho=1e-9):
    return Demography(
        change_times=np.array([0.0]),
        pop_sizes=np.array([[ne]]),
        mig_rates=np.zeros((1, 1, 1)),
        sample_pops=np.zeros(n, dtype=np.int32),
        mutation_rate=mu,
        recombination_rate=rho,
        sequence_length=L,
    )


class TestSim:
    def test_initial_tree_valid(self):
        demo = const_demo(n=4)
        sim = _Sim(demo, np.random.default_rng(0))
        # exactly one root; parents above children
        assert np.sum(sim.parent == -1) == 1
        for i in range(7):
            if sim.parent[i] >= 0:
                assert sim.time[sim.parent[i]] >= sim.time[i]

    def test_tmrca_mean(self):
        demo = const_demo(ne=10000.0, n=2)
        rng = np.random.default_rng(1)
        tm = [
            _Sim(demo, rng).time[2]
            for _ in range(2000)
        ]
        assert np.mean(tm) == pytest.approx(20000.0, rel=0.08)

    def test_smc_invariance(self):
        """The *sequence process* preserves the coalescent prior: transitions
        fire at rate rho*treelen, so bigger trees transition more often.
        (Applying the kernel a fixed number of times is NOT invariant.)"""
        demo = const_demo(ne=10000.0, n=3)
        rng = np.random.default_rng(2)
        rho = 1e-8
        D = 3e6  # expect ~ rho*L*D ~ 1.8 recombinations per replicate... scale up
        lens = []
        for _ in range(300):
            sim = _Sim(demo, rng)
            x = 0.0
            while True:
                d = rng.exponential(1.0 / (rho * sim.total_length()))
                x += d
                if x >= D:
                    break
                sim.recombine()
            lens.append(sim.total_length())
        expected = 4 * 10000 * (1 + 0.5)
        assert np.mean(lens) == pytest.approx(expected, rel=0.08)

    def test_segregating_sites_watterson(self):
        """#segregating sites ~ theta * L * H(n-1)."""
        demo = const_demo(ne=10000.0, n=2, L=1e6, mu=1e-8, rho=1e-8)
        # S has heavy genealogy-correlation variance: average over seeds
        n_var = 0
        for seed in range(8):
            seg = simulate_seg(demo, seed=seed)
            n_var += int(np.sum(np.any(seg.alleles == 1, axis=1)))
        # theta/site = 4 Ne mu = 4e-4; E[S] = theta*L = 400 per replicate
        assert n_var / 8 == pytest.approx(400, rel=0.2)
        # .seg structure: consecutive coverage of the sequence
        assert seg.positions[0] == 1
        np.testing.assert_array_equal(
            seg.positions[1:], seg.positions[:-1] + seg.lengths[:-1]
        )
        assert seg.end >= 1e6

    def test_unphased_output(self):
        demo = const_demo(ne=10000.0, n=4, L=5e5)
        seg = simulate_seg(demo, seed=4, phased=False)
        # any het pair site should carry code 2 in both members
        has2 = seg.alleles == 2
        assert has2.any()
        # code 2 always appears in pairs
        np.testing.assert_array_equal(has2[:, 0], has2[:, 1])
        np.testing.assert_array_equal(has2[:, 2], has2[:, 3])

    def test_missing_leaves(self):
        demo = const_demo(n=2, L=2e5)
        seg = simulate_seg(demo, seed=5, missing_leaves=[1])
        assert np.all(seg.alleles[:, 1] == -1)
