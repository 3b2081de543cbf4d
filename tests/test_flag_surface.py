"""Round-4 flag-surface parity (VERDICT r3 item 5): -tmax/-p, -delay_coal/
-delay_migr, -no_infer_recomb/-no_m_step, -log FILE, -c/-C, the Clump
column, posterior-drawn -arg particles, and getBiasRatio-default
bias_strengths."""

import numpy as np
import pytest

from smcsmc_tpu.cli import build_demography, parse_smc2_args
from smcsmc_tpu.demography import Demography
from smcsmc_tpu.em import (
    EMConfig,
    _sample_arg_particle,
    m_step,
    prior_pseudostats,
    run_chunk,
    run_em,
)
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


class TestPatternTmax:
    def test_p_and_tmax_build_epoch_grid(self):
        """-p PATT -tmax T: binary-style log-spaced epochs on [0, tmax]
        (pfparam.cpp:103-107 + pattern.cpp:139-149)."""
        cfg, demo_args, io = parse_smc2_args(
            ["-seg", "/dev/null", "-nsam", "2", "-N0", "10000",
             "-mu", "1e-8", "-rho", "1e-9", "-length", "1000000",
             "-p", "2*1+2", "-tmax", "4"]
        )
        assert io["tmax"] == 4.0 and io["p_pattern"] == "2*1+2"
        demo = build_demography(cfg, demo_args, io)
        times = np.asarray(demo.change_times) / (4 * 10000)  # 4N0 units
        # pattern 2*1+2 = 3 epochs over 4 segments; t_0 = 0, interior
        # boundaries at the reference's log spacing on [0, tmax]
        assert len(times) == 3
        n_seg = 4
        expect = [
            0.1 * np.exp(i / (n_seg - 1) * np.log(1 + 10 * 4.0)) - 0.1
            for i in range(n_seg)
        ]
        np.testing.assert_allclose(times, [expect[0], expect[1], expect[2]],
                                   rtol=1e-5)

    def test_P_takes_precedence_over_p(self):
        cfg, demo_args, io = parse_smc2_args(
            ["-seg", "/dev/null", "-N0", "10000", "-mu", "1e-8",
             "-rho", "1e-9", "-length", "1000000", "-nsam", "2",
             "-P", "133", "133016", "4*1", "-p", "2*1", "-tmax", "4"]
        )
        demo = build_demography(cfg, demo_args, io)
        # -P grid: 0 + 4 interior + final = 6 epochs, not -p's 2
        assert demo.num_epochs == 6


class TestDelayType:
    def test_flags_set_delay_type(self):
        for flag, want in [("-delay_coal", "coal"), ("-delay_migr", "migr")]:
            cfg, _, _ = parse_smc2_args(
                ["-seg", "/dev/null", "-N0", "1e4", flag]
            )
            assert cfg.delay_type == want
        cfg, _, _ = parse_smc2_args(["-seg", "/dev/null", "-N0", "1e4"])
        assert cfg.delay_type == "recomb"

    @pytest.mark.parametrize("delay_type", ["coal", "migr"])
    def test_biased_sweep_runs_with_delay_type(self, delay_type):
        """The delayed-IW path keyed off coal/first-event heights
        (particle.cpp:874-876) must run and stay finite under bias."""
        demo = _demo(L=1e5)
        seg = simulate_seg(demo, seed=17)
        cfg = EMConfig(
            num_particles=32, block_size=64,
            bias_heights=(2000.0,), bias_strengths=(2.0, 1.0),
            delay_type=delay_type,
        )
        stats, _, logl, _ = run_chunk(demo, seg, cfg, seed=5)
        assert np.isfinite(logl) and logl < 0
        assert np.all(np.isfinite(stats.coal_opp))


class TestMStepGates:
    def test_no_infer_recomb_keeps_rho(self):
        demo = _demo()
        cfg = EMConfig(infer_recomb=False)
        stats = prior_pseudostats(demo)
        stats.recomb_cnt[:] = 100.0  # would shift rho if inferred
        new = m_step(demo, stats, cfg)
        assert new.recombination_rate == demo.recombination_rate

    def test_no_m_step_freezes_parameters(self):
        demo = _demo(L=1e5)
        seg = simulate_seg(demo, seed=19)
        cfg = EMConfig(num_particles=16, block_size=64, em_iters=1,
                       do_m_step=False)
        res = run_em(demo, seg, cfg)
        for d in res.demos:
            np.testing.assert_allclose(d.pop_sizes, demo.pop_sizes)
            assert d.recombination_rate == demo.recombination_rate

    def test_cli_flags(self):
        cfg, _, _ = parse_smc2_args(
            ["-seg", "/dev/null", "-N0", "1e4", "-no_infer_recomb",
             "-no_m_step", "-c", "-C", "P highmem"]
        )
        assert cfg.infer_recomb is False
        assert cfg.do_m_step is False

    def test_log_file_flag(self):
        cfg, _, io = parse_smc2_args(
            ["-seg", "/dev/null", "-N0", "1e4", "-log", "mylog.txt"]
        )
        assert io["logfile"] == "mylog.txt"
        # bare -log (binary bool form) parses too
        cfg, _, io = parse_smc2_args(
            ["-seg", "/dev/null", "-N0", "1e4", "-log", "-Np", "50"]
        )
        assert io["logfile"] is None and cfg.num_particles == 50


class TestClumpColumn:
    def test_chunked_out_carries_clump_rows(self, tmp_path):
        demo = _demo(L=4e5)
        seg = simulate_seg(demo, seed=23)
        cfg = EMConfig(num_particles=24, block_size=64, chunks=2,
                       minseg=1000, chunk_workers=1, outdir=str(tmp_path))
        run_em(demo, seg, cfg)
        out = (tmp_path / "emiter0" / "chunkfinal.out").read_text()
        lines = out.strip().split("\n")
        header = lines[0].split()
        assert header[-1] == "Clump"
        clumps = {int(ln.split()[-1]) for ln in lines[1:]}
        assert clumps == {-1, 0, 1}
        # aggregate Coal row equals the sum of its per-chunk rows
        from smcsmc_tpu.outfmt import parse_outfile

        data = parse_outfile(out, from_text=True)
        agg = data[(("Coal", 0, 0, -1, -1), "Opp")]
        parts = sum(
            data[(("Coal", 0, 0, -1, c), "Opp")] for c in (0, 1)
        )
        assert agg == pytest.approx(parts, rel=1e-6)
        # result.out passes through only aggregate rows
        res = (tmp_path / "result.out").read_text().strip().split("\n")
        assert all(ln.split()[-1] == "-1" for ln in res[1:] if ln)

    def test_resume_with_clump_rows_matches(self, tmp_path):
        """Resuming from a Clump-columned chunkfinal.out must reconstruct
        the aggregate statistics, not double-count per-chunk rows."""
        demo = _demo(L=4e5)
        seg = simulate_seg(demo, seed=23)
        cfg = EMConfig(num_particles=24, block_size=64, chunks=2,
                       minseg=1000, chunk_workers=1, outdir=str(tmp_path))
        res1 = run_em(demo, seg, cfg)
        # second run resumes from the .out on disk
        res2 = run_em(demo, seg, cfg)
        # .out text carries ~7 significant digits (format_double), so the
        # roundtrip is only as precise as the file format
        np.testing.assert_allclose(
            res1.stats[0].coal_opp, res2.stats[0].coal_opp, rtol=1e-3
        )
        np.testing.assert_allclose(
            res1.demos[0].pop_sizes, res2.demos[0].pop_sizes, rtol=1e-3
        )


class TestArgDraw:
    def test_draw_is_weighted_not_argmax(self):
        log_w = np.log(np.array([0.05, 0.9, 0.05]))
        picks = {_sample_arg_particle(log_w, seed) for seed in range(40)}
        assert 1 in picks  # the mode is drawn often...
        assert len(picks) > 1  # ...but not exclusively (not argmax)

    def test_uniform_weights_vary_by_seed(self):
        log_w = np.zeros(64)
        picks = {_sample_arg_particle(log_w, seed) for seed in range(20)}
        assert len(picks) > 10


class TestBiasDefaults:
    def test_default_strengths_shape_and_bounds(self):
        import jax

        from smcsmc_tpu.calibrate import default_bias_strengths
        from smcsmc_tpu.kernels.tree import epochs_from_demography

        demo = _demo(n=4)
        epochs = epochs_from_demography(demo)
        s = default_bias_strengths(
            jax.random.PRNGKey(0), epochs, demo.sample_pops,
            (500.0, 5000.0), num_trees=4000, batch=2000,
        )
        assert len(s) == 3
        assert all(x >= 1.0 for x in s)
        assert s[-1] == 1.0
        # the most recent section holds far less branch mass than the last
        assert s[0] > s[-1]

    def test_run_chunk_autocalibrates_strengths(self):
        demo = _demo(L=1e5)
        seg = simulate_seg(demo, seed=29)
        cfg = EMConfig(num_particles=24, block_size=64,
                       bias_heights=(1000.0,))  # no strengths given
        stats, _, logl, _ = run_chunk(demo, seg, cfg, seed=7)
        assert np.isfinite(logl) and logl < 0
