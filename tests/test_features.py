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
