"""Flag round-trip tests for the smc2 option surface (round-3 verdict #6:
-P rewriting, Watterson default N0, -maxgap/-minseg/-startpos chunk windows,
recording-time -xr/-xc, the .resample contract, and the NaN policy)."""

import numpy as np
import pytest

from smcsmc_tpu.cli import build_demography, parse_smc2_args
from smcsmc_tpu.demography import Demography
from smcsmc_tpu.em import EMConfig, run_chunk, run_em, _stats_from_outdata
from smcsmc_tpu.segio import define_chunks, watterson_estimate
from smcsmc_tpu.simulate import simulate_seg


def _demo(L=2e5, n=2, ne=10000.0):
    return Demography(
        change_times=np.array([0.0]),
        pop_sizes=np.array([[ne]]),
        mig_rates=np.zeros((1, 1, 1)),
        sample_pops=np.zeros(n, dtype=np.int32),
        mutation_rate=1e-8,
        recombination_rate=1e-9,
        sequence_length=L,
    )


class TestPatternRewrite:
    def test_user_en_times_snap_to_grid(self):
        """-P must rewrite user -eN sizes onto the log-spaced grid
        (model.py:470-536): the grid epoch at/above the user time carries
        the user's size, and the user's own time disappears."""
        cfg, demo_args, io = parse_smc2_args(
            ["-seg", "/dev/null", "-nsam", "2", "-N0", "10000",
             "-mu", "1e-8", "-rho", "1e-9", "-length", "1000000",
             "-P", "133", "133016", "4*1",
             "-eN", "0.05", "3.0"]
        )
        demo = build_demography(cfg, demo_args, io)
        times = np.asarray(demo.change_times)
        sizes = np.asarray(demo.pop_sizes)[:, 0]
        # grid: 0 + 4 interior pattern times + final; user time 0.05 (in
        # 4N0 units = 2000 gens) must NOT appear verbatim
        assert not np.any(np.isclose(times, 0.05 * 4 * 10000))
        # epochs starting at/above 2000 gens carry size 3.0 * N0
        above = times >= 0.05 * 4 * 10000 - 1e-9
        assert np.all(np.isclose(sizes[above], 30000.0))
        below = ~above
        assert np.all(np.isclose(sizes[below], 10000.0))

    def test_ej_time_snaps_down(self):
        """-ej split times snap to the largest grid time <= t."""
        cfg, demo_args, io = parse_smc2_args(
            ["-seg", "/dev/null", "-N0", "10000",
             "-mu", "1e-8", "-rho", "1e-9", "-length", "1000000",
             "-I", "2", "1", "1",
             "-P", "133", "133016", "4*1",
             "-ej", "0.07", "2", "1"]
        )
        demo = build_demography(cfg, demo_args, io)
        times = np.asarray(demo.change_times) / (4 * 10000)  # 4N0 units
        # the -ej epoch time must be one of the grid times, not 0.07
        assert not np.any(np.isclose(times, 0.07))
        pm = demo.pop_map_at_epoch()
        merged = np.array([pm[e, 1] == 0 for e in range(len(times))])
        assert merged.any(), "-ej was dropped"
        first_merged = times[np.argmax(merged)]
        assert first_merged <= 0.07


class TestWattersonN0:
    def test_default_n0_from_watterson(self):
        demo = _demo(L=5e5)
        seg = simulate_seg(demo, seed=5)
        theta = watterson_estimate(seg)
        # theta ~ 4 N0 mu = 4e-4; loose (stochastic, small L)
        assert 0.3 * 4e-4 < theta < 3 * 4e-4
        cfg, demo_args, io = parse_smc2_args(
            ["-seg", "/dev/null", "-mu", "1e-8", "-rho", "1e-9",
             "-length", "500000"]
        )
        built = build_demography(cfg, demo_args, io, seg=seg)
        n0 = io["N0"]
        assert np.isclose(n0, theta / (4 * 1e-8))
        assert np.isclose(built.pop_sizes[0, 0], n0)

    def test_missing_n0_and_mu_raises(self):
        cfg, demo_args, io = parse_smc2_args(
            ["-seg", "/dev/null", "-rho", "1e-9", "-length", "500000"]
        )
        with pytest.raises(SystemExit, match="N0 required"):
            build_demography(cfg, demo_args, io)


class TestChunkWindow:
    def test_startpos_and_length_clip(self):
        demo = _demo(L=4e5)
        seg = simulate_seg(demo, seed=9)
        chunks = define_chunks(
            seg, 2, maxgap=200000, minseg=1000,
            startpos=100000, length=200000,
        )
        assert chunks[0].start >= 100000
        assert chunks[-1].end <= 300000 + 1
        assert len(chunks) == 2

    def test_window_without_data_raises(self):
        demo = _demo(L=1e5)
        seg = simulate_seg(demo, seed=9)
        from smcsmc_tpu.segio import SegError

        with pytest.raises(SegError):
            define_chunks(seg, 1, startpos=10**9, length=1000)


class TestRecordingMasks:
    def test_xc_epoch_records_nothing(self):
        """-xc epochs must carry ONLY the pseudocounts in the committed
        statistics — the reference masks recording itself
        (record_event_in_epoch, pfparam.cpp:82-99), not just the M-step."""
        ne = 10000.0
        demo = Demography(
            change_times=np.array([0.0, 5000.0, 50000.0]),
            pop_sizes=np.full((3, 1), ne),
            mig_rates=np.zeros((3, 1, 1)),
            sample_pops=np.zeros(2, dtype=np.int32),
            mutation_rate=1e-8,
            recombination_rate=1e-9,
            sequence_length=2e5,
        )
        seg = simulate_seg(demo, seed=13)
        cfg = EMConfig(num_particles=50, block_size=128, xc_epochs=(1,),
                       xr_epochs=(0,))
        stats, _, logl, _ = run_chunk(demo, seg, cfg, seed=3)
        assert np.isfinite(logl)
        # pseudocounts: opp 1, cnt = prior rate (em.prior_pseudostats)
        assert np.isclose(stats.coal_opp[1, 0], 1.0)
        assert np.isclose(stats.coal_cnt[1, 0], 1.0 / (2 * ne))
        # non-excluded epoch recorded something real
        assert stats.coal_opp[0, 0] > 1.0
        # -xr masked epoch 0's recombination recording
        assert np.isclose(stats.recomb_opp[0], 1.0)
        assert stats.recomb_opp[1] > 1.0

    def test_resume_spreads_recomb_over_kept_epochs(self):
        demo = Demography(
            change_times=np.array([0.0, 5000.0, 50000.0]),
            pop_sizes=np.full((3, 1), 10000.0),
            mig_rates=np.zeros((3, 1, 1)),
            sample_pops=np.zeros(2, dtype=np.int32),
            mutation_rate=1e-8,
            recombination_rate=1e-9,
            sequence_length=1e5,
        )
        data = {
            (("Recomb", -1, -1, -1, -1), "Count"): 30.0,
            (("Recomb", -1, -1, -1, -1), "Opp"): 3e9,
        }
        st = _stats_from_outdata(data, demo, xr_epochs=(0,))
        assert st.recomb_cnt[0] == 0.0
        np.testing.assert_allclose(st.recomb_cnt[1:], 15.0)
        np.testing.assert_allclose(st.recomb_opp[1:], 1.5e9)


class TestResampleFile:
    def test_positions_are_genomic(self, tmp_path):
        demo = _demo(L=3e5)
        seg = simulate_seg(demo, seed=21)
        cfg = EMConfig(num_particles=30, block_size=128, record_ess=True,
                       ess_threshold=0.9, outdir=str(tmp_path))
        run_em(demo, seg, cfg)
        rows = [
            line.split("\t")
            for line in open(tmp_path / "emiter0" / "chunkfinal.resample")
        ]
        assert rows, "no resample events recorded at ESS threshold 0.9"
        pos = np.array([float(r[0]) for r in rows])
        ess = np.array([float(r[1]) for r in rows])
        assert np.all(np.diff(pos) > 0), "positions must increase"
        assert pos[-1] <= 3e5 and pos[0] >= 0
        assert np.all((ess > 0) & (ess <= 30))


class TestNaNPolicy:
    def test_poisoned_input_fails_loudly(self):
        demo = _demo(L=5e4)
        seg = simulate_seg(demo, seed=3)
        bad = Demography(
            change_times=demo.change_times,
            pop_sizes=demo.pop_sizes,
            mig_rates=demo.mig_rates,
            sample_pops=demo.sample_pops,
            mutation_rate=float("nan"),
            recombination_rate=1e-9,
            sequence_length=demo.sequence_length,
        )
        cfg = EMConfig(num_particles=16, block_size=64)
        with pytest.raises(FloatingPointError, match="non-finite"):
            run_chunk(bad, seg, cfg, seed=2)
