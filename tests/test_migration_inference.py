"""End-to-end migration-rate recovery (reference: test_migration.py /
TwoPopUniDirMigr targets, SURVEY.md §4)."""

import numpy as np
import pytest

from smcsmc_tpu.demography import Demography
from smcsmc_tpu.em import EMConfig, m_step, run_chunk
from smcsmc_tpu.simulate import simulate_seg


def island(ne, m01, m10, n_per_pop=2, L=1e6):
    return Demography(
        change_times=np.array([0.0]),
        pop_sizes=np.array([[ne, ne]]),
        mig_rates=np.array([[[0.0, m01], [m10, 0.0]]]),
        sample_pops=np.array([0] * n_per_pop + [1] * n_per_pop, dtype=np.int32),
        mutation_rate=1e-8,
        recombination_rate=1e-9,
        sequence_length=L,
    )


@pytest.mark.slow
class TestMigrationInference:
    def test_island_rate_recovery(self):
        """Simulate symmetric island data; the E-step migration rate
        estimate (count/opportunity) should recover the truth."""
        ne, m = 10000.0, 1e-4
        demo = island(ne, m, m, n_per_pop=2, L=1e6)
        seg = simulate_seg(demo, seed=31)
        cfg = EMConfig(num_particles=200, block_size=256)
        stats, _, logl, _ = run_chunk(demo, seg, cfg, seed=6)
        assert np.isfinite(logl) and logl < 0
        m_hat = float(stats.mig_cnt.sum() / (2 * stats.mig_opp.mean() + 1e-300))
        # per-direction estimate
        m01 = float(stats.mig_cnt[0, 0, 1] / stats.mig_opp[0, 0])
        m10 = float(stats.mig_cnt[0, 1, 0] / stats.mig_opp[0, 1])
        assert m01 == pytest.approx(m, rel=0.5)
        assert m10 == pytest.approx(m, rel=0.5)
        # M-step produces a sane updated model
        new = m_step(demo, stats, cfg)
        assert np.all(new.mig_rates[:, 0, 1] > 0)

    def test_unidirectional_detects_asymmetry(self):
        """Simulate with backwards migration only 1 -> 0; infer starting from
        a SYMMETRIC model: the data must pull the estimates apart in the
        right direction (the real inference test — the reference's
        TwoPopUniDirMigr scenario, test_migration.py:27-41).

        Multi-seed gate (round-3 verdict #3): at Np=200 over 1 Mb a single
        seed's directional signal is weak enough to flip on FP-level
        reorderings; the event counts and opportunities are therefore
        POOLED over three (data, filter) seed pairs before comparing
        directions — the aggregate is what the reference's 30 Mb scenario
        measures with one long genome."""
        ne, m = 10000.0, 2e-4
        truth = island(ne, 0.0, m, n_per_pop=2, L=1e6)
        start = island(ne, m / 2, m / 2, n_per_pop=2, L=1e6)
        cfg = EMConfig(num_particles=200, block_size=256)
        cnt = np.zeros((2, 2))
        opp = np.zeros(2)
        for dseed, fseed in [(32, 7), (34, 9), (36, 11)]:
            seg = simulate_seg(truth, seed=dseed)
            stats, _, _, _ = run_chunk(start, seg, cfg, seed=fseed)
            cnt += np.asarray(stats.mig_cnt[0])
            opp += np.asarray(stats.mig_opp[0])
        m01 = cnt[0, 1] / opp[0]
        m10 = cnt[1, 0] / opp[1]
        assert m10 > m01, f"expected asymmetry: m10={m10:.3g} m01={m01:.3g}"


class TestMigrationTracts:
    def test_m_rows_and_tracts(self, tmp_path):
        """The sampled ARG carries M rows for realized migration hops
        (particleContainer.cpp:541-547) and find_segments reconstructs
        bed-like tracts with positive length from them."""
        from smcsmc_tpu.argout import (
            find_segments, read_trees, tract_fraction, write_trees,
        )

        ne, m = 10000.0, 1e-4
        demo = island(ne, m, m, n_per_pop=2, L=2e5)
        seg = simulate_seg(demo, seed=41)
        cfg = EMConfig(num_particles=32, block_size=64, record_arg=True)
        _, _, _, diag = run_chunk(demo, seg, cfg, seed=13)
        a = diag["arg"]
        path = str(tmp_path / "chunk0.trees.gz")
        write_trees(path, a["pos"], a["code"], a["time"], a["from"],
                    a["to"], a["desc"], a["n"], start_position=a["start"])
        ev = read_trees(path)
        assert np.sum(ev["code"] == "M") > 0, "no migration rows recorded"
        # M rows carry a real direction and a nonempty descendant set
        mrow = ev[ev["code"] == "M"]
        assert np.all(mrow["from"] != mrow["to"])
        assert np.all(mrow["desc"] > 0)
        tr01 = find_segments(path, 0, 1, sequence_length=2e5)
        tr10 = find_segments(path, 1, 0, sequence_length=2e5)
        tracts = tr01 if len(tr01) else tr10
        assert len(tracts) > 0
        assert np.all(tracts["right"] > tracts["left"])
        # overlapping tracts can push the raw covered-bp ratio past 1 at
        # high rates; require a positive, finite coverage signal
        frac = tract_fraction(tracts, 2e5, 4)
        assert np.isfinite(frac) and frac > 0.0
