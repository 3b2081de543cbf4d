"""Feature tests: -arg output, resume, unphased marginalization, delayed
factors, record_ess, online EM plumbing."""

import gzip
import os

import numpy as np
import pytest

from smcsmc_tpu.argout import _desc_string, read_trees, write_trees
from smcsmc_tpu.demography import Demography
from smcsmc_tpu.em import EMConfig, run_em
from smcsmc_tpu.simulate import simulate_seg


def tiny_demo(n=2, L=5e4):
    return Demography(
        change_times=np.array([0.0]),
        pop_sizes=np.array([[10000.0]]),
        mig_rates=np.zeros((1, 1, 1)),
        sample_pops=np.zeros(n, dtype=np.int32),
        mutation_rate=1e-8,
        recombination_rate=1e-9,
        sequence_length=L,
    )


class TestArgOutput:
    def test_desc_string(self):
        assert _desc_string(0) == "0"
        assert _desc_string(1) == "1"
        assert _desc_string(2) == "01"
        assert _desc_string(5) == "101"

    def test_write_read_roundtrip(self, tmp_path):
        p = str(tmp_path / "t.trees.gz")
        write_trees(
            p,
            arg_pos=np.array([10.0, 20.0]),
            arg_code=np.array([0, 1]),
            arg_time=np.array([100.0, 5000.0]),
            arg_from=np.array([-1, 0]),
            arg_to=np.array([-1, -1]),
            arg_desc=np.array([1, 3]),
            arg_n=2,
        )
        ev = read_trees(p)
        assert len(ev) == 2
        assert ev["code"][0] == "R"
        assert ev["code"][1] == "C"
        assert ev["desc"][1] == 3

    def test_ring_overflow_order(self, tmp_path):
        p = str(tmp_path / "t2.trees.gz")
        # capacity 4, 6 pushed: slots hold [4,5,2,3]; oldest-first = 2,3,4,5
        write_trees(
            p,
            arg_pos=np.array([4.0, 5.0, 2.0, 3.0]),
            arg_code=np.zeros(4, int),
            arg_time=np.zeros(4),
            arg_from=np.full(4, -1),
            arg_to=np.full(4, -1),
            arg_desc=np.ones(4, int),
            arg_n=6,
        )
        ev = read_trees(p)
        np.testing.assert_allclose(ev["pos"], [2, 3, 4, 5])


class TestArgSweep:
    @pytest.mark.parametrize("n", [4, 36])
    def test_sweep_records_desc(self, tmp_path, n):
        """End-to-end -arg recording through the sweep: every R/C event row
        carries a nonempty descendant bitstring, and with n > 32 leaves the
        two-word (u64) masks must reach bits above 32 (descendants.hpp:16 —
        round-1 capped silently at 32)."""
        from smcsmc_tpu.em import run_chunk

        demo = tiny_demo(n=n, L=3e4)
        seg = simulate_seg(demo, seed=17)
        cfg = EMConfig(num_particles=8, record_arg=True, block_size=64)
        _, _, _, diag = run_chunk(demo, seg, cfg, seed=2)
        a = diag["arg"]
        assert a["n"] > 0
        desc = a["desc"][: min(a["n"], len(a["desc"]))]
        assert desc.dtype == np.uint64
        assert np.all(desc > 0)
        # full-tree events (pre-MRCA branches) must cover all n leaves
        full = np.uint64((1 << n) - 1)
        assert np.max(desc) <= full
        if n > 32:
            assert np.any(desc >> np.uint64(32) > 0)


class TestResume:
    @pytest.mark.slow
    def test_skip_finished_iteration(self, tmp_path):
        demo = tiny_demo()
        seg = simulate_seg(demo, seed=17)
        out = str(tmp_path / "resume")
        cfg = EMConfig(num_particles=32, block_size=64, em_iters=1, outdir=out)
        res1 = run_em(demo, seg, cfg)
        # re-run: both iterations must be skipped (loaded from disk)
        res2 = run_em(demo, seg, cfg)
        assert len(res2.log_likelihoods) == 2
        np.testing.assert_allclose(
            res2.log_likelihoods, res1.log_likelihoods, rtol=1e-4
        )


class TestCheckpoint:
    def test_midsweep_resume_matches_uninterrupted(self, tmp_path):
        """A chunk killed mid-sweep resumes from its block checkpoint and
        produces the same statistics as an uninterrupted run (the driver
        now actually calls the orbax layer — round 1 shipped it unwired)."""
        from smcsmc_tpu.em import EMConfig, run_chunk

        demo = tiny_demo(n=4, L=2e5)
        seg = simulate_seg(demo, seed=23)
        base = dict(num_particles=16, block_size=16)
        ref_stats, _, ref_logl, _ = run_chunk(
            demo, seg, EMConfig(**base), seed=5
        )
        # interrupted run: checkpoint every 2 blocks, abort after block 4
        cfg = EMConfig(**base, checkpoint_blocks=2, outdir=str(tmp_path))
        import smcsmc_tpu.em as em_mod

        calls = {"n": 0}
        real_sweep_builder = em_mod.build_sweep

        def aborting_builder(pfcfg):
            sweep = real_sweep_builder(pfcfg)

            def wrapped(*a, **k):
                if calls["n"] == 4:
                    raise RuntimeError("simulated crash")
                calls["n"] += 1
                return sweep(*a, **k)

            return wrapped

        em_mod.build_sweep = aborting_builder
        try:
            with pytest.raises(RuntimeError, match="simulated crash"):
                run_chunk(demo, seg, cfg, seed=5)
        finally:
            em_mod.build_sweep = real_sweep_builder
        # checkpoint must exist, then the re-run resumes and finishes
        assert any(p.name.endswith(".meta.json")
                   for p in (tmp_path / "ckpt").iterdir())
        stats, _, logl, _ = run_chunk(demo, seg, cfg, seed=5)
        assert logl == pytest.approx(ref_logl, rel=1e-4)
        np.testing.assert_allclose(
            np.asarray(stats.coal_cnt), np.asarray(ref_stats.coal_cnt),
            rtol=1e-4,
        )
        # consumed checkpoint is cleaned up
        assert not any((tmp_path / "ckpt").iterdir())

    @pytest.mark.slow
    def test_orbax_state_roundtrip(self, tmp_path):
        import jax

        from smcsmc_tpu.checkpoint import load_state, save_state
        from smcsmc_tpu.kernels.tree import epochs_from_demography
        from smcsmc_tpu.smc import PFConfig, init_state

        demo = tiny_demo()
        epochs = epochs_from_demography(demo)
        cfg = PFConfig(num_particles=16, num_leaves=2)
        state = init_state(
            jax.random.PRNGKey(0), epochs, cfg, demo.sample_pops, 1e-9
        )
        path = str(tmp_path / "ckpt")
        save_state(path, state, demo)
        restored = load_state(path, state)
        np.testing.assert_allclose(
            np.asarray(restored.trees.time), np.asarray(state.trees.time)
        )
        np.testing.assert_allclose(
            np.asarray(restored.log_w), np.asarray(state.log_w)
        )
        from smcsmc_tpu.checkpoint import load_demo

        d2 = load_demo(path)
        np.testing.assert_allclose(d2.pop_sizes, demo.pop_sizes)
