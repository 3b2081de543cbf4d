"""Tests for the L4 python surface: recombination-guide smoothing, preset
population models, output analysis, popsim adapter, API arg handling."""

import gzip

import numpy as np
import pytest

from smcsmc_tpu.api import dict_to_args
from smcsmc_tpu.populationmodels import (
    Pop4,
    Population,
    TwoPopSplitNoMigr,
    TwoPopUniDirMigr,
)
from smcsmc_tpu.processrecombination import LocalRecombination


class TestLocalRecombination:
    def _write_recomb(self, path, rows):
        with gzip.open(path, "wt") as fh:
            fh.write("iter\tlocus\tsize\topp\t1\t2\n")
            for r in rows:
                fh.write("\t".join(map(str, r)) + "\n")

    def test_change_point_detection(self, tmp_path):
        # 100 windows of 100bp; rate jumps 10x in the middle third
        p = str(tmp_path / "t.recomb.gz")
        rows = []
        pos = 0
        for i in range(120):
            rate = 1e-8 if not 40 <= i < 80 else 1e-7
            # counts per nt per leaf; opportunity 1.0/nt
            rows.append([0, pos, 100, 1.0, rate / 2, rate / 2])
            pos += 100
        self._write_recomb(p, rows)
        lr = LocalRecombination(p)
        assert lr.leaves == 2
        assert lr.step == 100
        lr.smooth(alpha=1.0, beta=2.0)
        sd = lr.smoothed_data
        # smoothed overall rate should be high in the middle, low outside
        mid = sd[50:70].sum(axis=1).mean()
        outside = sd[:30].sum(axis=1).mean()
        assert mid > 3 * outside

    def test_alpha_zero_returns_prior(self, tmp_path):
        p = str(tmp_path / "t2.recomb.gz")
        rows = [[0, i * 100, 100, 1.0, 1e-8, 3e-8] for i in range(50)]
        self._write_recomb(p, rows)
        lr = LocalRecombination(p)
        lr.smooth(alpha=0.0, beta=2.0)
        np.testing.assert_allclose(
            lr.smoothed_data, lr.rate / lr.leaves, rtol=1e-10
        )

    def test_write_guide(self, tmp_path):
        p = str(tmp_path / "t3.recomb.gz")
        rows = [[0, i * 100, 100, 1.0, 1e-8, 1e-8] for i in range(30)]
        self._write_recomb(p, rows)
        lr = LocalRecombination(p)
        lr.smooth(alpha=0.5, beta=2.0)
        out = str(tmp_path / "guide.gz")
        lr.write_data(out)
        with gzip.open(out, "rt") as fh:
            header = fh.readline().split()
            assert header[:3] == ["locus", "size", "recomb_rate"]
            row = fh.readline().split()
            assert int(row[0]) == 0


class TestPopulationModels:
    def test_preset_roundtrip(self):
        pop = Pop4(N0=10000)
        demo = pop.to_demography()
        assert demo.num_epochs == 6
        assert demo.pop_sizes[1, 0] == pytest.approx(1000.0)
        assert demo.change_times[1] == pytest.approx(0.01 * 40000)

    def test_two_pop_split(self):
        pop = TwoPopSplitNoMigr(N0=10000)
        demo = pop.to_demography()
        assert demo.num_populations == 2
        assert len(demo.splits) == 1
        t, src, snk = demo.splits[0]
        assert t == pytest.approx(0.5 * 40000)
        assert (src, snk) == (1, 0)
        assert demo.num_samples == 8

    def test_unidir_migration(self):
        pop = TwoPopUniDirMigr(N0=10000)
        demo = pop.to_demography()
        # -em 2 1 1: backwards rate from pop 2 into pop 1 = 1/(4N0)
        assert demo.mig_rates[0, 1, 0] == pytest.approx(1.0 / 40000)
        assert demo.mig_rates[0, 0, 1] == 0.0

    def test_parse_command_line(self):
        pop = Population(N0=10000)
        rest = pop.parse_command_line("-nsam 4 -eN 0.5 2.0 -unknownflag 7")
        assert rest == ["-unknownflag", "7"]
        assert pop.num_samples == 4
        assert pop.population_sizes[-1][0] == pytest.approx(2.0)

    def test_simulate_writes_seg(self, tmp_path):
        pop = Population(
            N0=10000, num_samples=2, sequence_length=1e5,
            change_points=[0], population_sizes=[1],
            filename=str(tmp_path / "sim.seg"),
        )
        seg = pop.simulate(seed=5)
        assert (tmp_path / "sim.seg").exists()
        assert seg.num_samples == 2


class TestApi:
    def test_dict_to_args(self):
        args = dict_to_args({"EM": 10, "seg": "a.seg b.seg", "arg": ""})
        assert args == ["-EM", "10", "-seg", "a.seg", "b.seg", "-arg"]


class TestTsConvert:
    def test_variants_to_seg_roundtrip(self, tmp_path):
        """variants_to_seg writes rows read_seg parses back: spans cover
        [first, last) with the right genotype columns (utils.py:131-143)."""
        import numpy as np

        from smcsmc_tpu.segio import read_seg
        from smcsmc_tpu.tsconvert import variants_to_seg

        pos = np.array([100, 350, 900])
        gen = np.array([[0, 1, 0, 0], [1, 1, 0, 0], [0, 0, 0, 1]])
        out = str(tmp_path / "x.seg")
        variants_to_seg(pos, gen, out)
        seg = read_seg(out)
        assert seg.num_samples == 4
        np.testing.assert_array_equal(seg.positions, [1, 100, 350])
        np.testing.assert_array_equal(seg.lengths, [99, 250, 550])
        np.testing.assert_array_equal(seg.alleles[0], [0, 1, 0, 0])
        np.testing.assert_array_equal(seg.alleles[2], [0, 0, 0, 1])

    def test_mask_emits_missing(self, tmp_path):
        import numpy as np

        from smcsmc_tpu.segio import read_seg
        from smcsmc_tpu.tsconvert import variants_to_seg

        pos = np.array([100, 500])
        gen = np.array([[0, 1], [1, 0]])
        out = str(tmp_path / "m.seg")
        variants_to_seg(pos, gen, out, mask_intervals=[[200, 300]])
        seg = read_seg(out)
        # a '..' row must cover [200, 300)
        i = list(seg.positions).index(200)
        assert seg.lengths[i] == 100
        assert np.all(seg.alleles[i] == -1)

    def test_ts_to_seg_requires_tskit(self, tmp_path):
        import pytest as _pytest

        from smcsmc_tpu.tsconvert import prune_tree_sequence

        with _pytest.raises(ImportError, match="variants_to_seg"):
            prune_tree_sequence(str(tmp_path / "a.trees"), 4)
