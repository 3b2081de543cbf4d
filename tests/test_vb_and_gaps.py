"""In-proposal VB correction (particle.cpp:266-272) and
max_epoch_to_update gap suppression (smcsmc.cpp:266-275)."""

import numpy as np
import pytest

from smcsmc_tpu.demography import Demography
from smcsmc_tpu.em import (
    EMConfig,
    prepare_blocks,
    prior_pseudostats,
    run_chunk,
    vb_log_tables,
)
from smcsmc_tpu.segio import SegData
from smcsmc_tpu.simulate import simulate_seg


def single_pop(num_epochs=1, L=2e5, n=4):
    change = (
        np.array([0.0])
        if num_epochs == 1
        else np.concatenate([[0.0], np.logspace(3.3, 4.7, num_epochs - 1)])
    )
    return Demography(
        change_times=change,
        pop_sizes=np.full((num_epochs, 1), 10000.0),
        mig_rates=np.zeros((num_epochs, 1, 1)),
        sample_pops=np.zeros(n, dtype=np.int32),
        mutation_rate=1e-8,
        recombination_rate=1e-9,
        sequence_length=L,
    )


class TestVB:
    def test_tables(self):
        demo = single_pop()
        # default (pre-first-M-step) counts are huge: factor ~ 1
        c0, m0 = vb_log_tables(demo)
        assert np.all(np.abs(c0) < 1e-6)
        # small counts: psi(C) - log(C) < 0, decreasing with C
        c1, _ = vb_log_tables(demo, (np.full((1, 1), 1.0), np.zeros((1, 1, 1))))
        c4, _ = vb_log_tables(demo, (np.full((1, 1), 4.0), np.zeros((1, 1, 1))))
        assert c1[0, 0] < c4[0, 0] < 0

    def test_vb_neutral_at_large_counts(self):
        """counts=1e10 (iteration 0 default): VB run == non-VB run."""
        demo = single_pop()
        seg = simulate_seg(demo, seed=11)
        s0, _, l0, _ = run_chunk(demo, seg, EMConfig(num_particles=64), seed=5)
        s1, _, l1, _ = run_chunk(
            demo, seg, EMConfig(num_particles=64, vb=True), seed=5
        )
        assert l1 == pytest.approx(l0, rel=1e-4)
        np.testing.assert_allclose(s1.coal_cnt, s0.coal_cnt, rtol=1e-3)

    def test_vb_penalizes_low_count_epoch(self):
        """Tiny event count for an epoch: genealogies coalescing there are
        down-weighted (factor exp_digamma(C)/C << 1), so that epoch's share
        of the posterior coal count drops relative to the huge-count run
        (same seed -> paired proposal streams)."""
        demo = single_pop(num_epochs=3)
        demo.change_times = np.array([0.0, 1585.0, 19952.0])
        seg = simulate_seg(demo, seed=12)
        # tiny pseudocount so the penalized epoch's C stays near zero:
        # psi(C) - log(C) ~ -1/C per event (a strong, unambiguous penalty;
        # with the default pseudocount of 1 the effect is within CPU
        # reduction-order noise)
        cfg = EMConfig(num_particles=128, vb=True, vb_pseudocount=1e-2)
        E = demo.num_epochs
        big = (np.full((E, 1), 1e10), np.full((E, 1, 1), 1e10))
        small = (np.full((E, 1), 1e10), np.full((E, 1, 1), 1e10))
        small[0][1, 0] = 0.05  # epoch 1 coalescences heavily penalized
        sb, _, _, _ = run_chunk(demo, seg, cfg, seed=9, vb_counts=big)
        ss, _, _, _ = run_chunk(demo, seg, cfg, seed=9, vb_counts=small)
        pseudo = prior_pseudostats(demo)
        eb = np.sum(sb.coal_cnt - pseudo.coal_cnt, axis=1)
        es = np.sum(ss.coal_cnt - pseudo.coal_cnt, axis=1)
        frac_b = eb[1] / max(eb.sum(), 1e-12)
        frac_s = es[1] / max(es.sum(), 1e-12)
        assert frac_s < frac_b


class TestGapSuppression:
    def test_dist_mut_columns(self):
        """prepare_blocks computes the distance from each segment start to
        the next informative site end (segdata.cpp:234-241)."""
        seg = SegData(
            positions=np.array([1, 1001, 2001, 52001], dtype=np.int64),
            lengths=np.array([1000, 1000, 50000, 1000], dtype=np.int64),
            states=np.array([0, 0, 2, 0], dtype=np.int8),  # third = missing
            alleles=np.array(
                [[0, 1], [1, 0], [-1, -1], [0, 1]], dtype=np.int8
            ),
            phased=np.ones(2, dtype=bool),
        )
        blocks = list(prepare_blocks(seg, 8, 1))
        dist = np.asarray(blocks[0][5])[:4]
        np.testing.assert_allclose(dist, [1000.0, 1000.0, 51000.0, 1000.0])

    def test_all_missing_records_nothing(self):
        """No informative site ahead: every epoch is beyond
        max_epoch_to_update, so committed stats stay at the prior
        pseudocounts exactly (smcsmc.cpp:266-275 + particle.cpp:219)."""
        demo = single_pop(num_epochs=2, L=1e5)
        seg = SegData(
            positions=np.array([1], dtype=np.int64),
            lengths=np.array([100000], dtype=np.int64),
            states=np.array([2], dtype=np.int8),
            alleles=np.array([[-1, -1, -1, -1]], dtype=np.int8),
            phased=np.ones(4, dtype=bool),
        )
        stats, _, logl, _ = run_chunk(
            demo, seg, EMConfig(num_particles=32), seed=3
        )
        pseudo = prior_pseudostats(demo)
        np.testing.assert_allclose(stats.coal_cnt, pseudo.coal_cnt, rtol=1e-6)
        np.testing.assert_allclose(
            stats.recomb_cnt, pseudo.recomb_cnt, rtol=1e-6
        )
        assert logl == pytest.approx(0.0, abs=1e-3)

    def test_gap_suppresses_short_lag_epochs_only(self):
        """Recording is suppressed where the distance to the next
        informative site exceeds half the lag.  Two runs over the same
        gappy data differ only in the (fixed) lag — proposals are identical
        — so the short-lag run must record a small fraction of the
        long-lag run's opportunity (only ~20 kb of 300 kb lie within
        lag/2 = 25 kb of an informative site)."""
        demo = single_pop(num_epochs=2, L=3e5)
        seg = SegData(
            positions=np.array([1, 1001, 281001], dtype=np.int64),
            lengths=np.array([1000, 280000, 19000], dtype=np.int64),
            states=np.array([0, 2, 0], dtype=np.int8),
            alleles=np.array(
                [[0, 1, 0, 0], [-1, -1, -1, -1], [0, 0, 1, 0]], dtype=np.int8
            ),
            phased=np.ones(4, dtype=bool),
        )
        long_lag, _, _, _ = run_chunk(
            demo, seg, EMConfig(num_particles=32, lag=1e6), seed=4
        )
        short_lag, _, _, _ = run_chunk(
            demo, seg, EMConfig(num_particles=32, lag=5e4), seed=4
        )
        pseudo = prior_pseudostats(demo)
        opp_long = np.sum(long_lag.recomb_opp - pseudo.recomb_opp)
        opp_short = np.sum(short_lag.recomb_opp - pseudo.recomb_opp)
        assert opp_long > 0
        assert opp_short < 0.3 * opp_long
