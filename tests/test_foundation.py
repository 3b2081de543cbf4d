"""Tests for pattern parsing, demography flags, and .seg IO (golden-style,
mirroring test/test_conversions.py + unittest test_Pattern/test_Segment)."""

import numpy as np
import pytest

from smcsmc_tpu.demography import Demography, parse_scrm_args, watterson_theta
from smcsmc_tpu.pattern import PatternError, parse_pattern, smc2_pattern_times
from smcsmc_tpu.segio import (
    SegData,
    SegError,
    define_chunks,
    merge_segs,
    read_seg,
    slice_seg,
    write_seg,
)


class TestPattern:
    def test_segment_times_formula(self):
        # pattern.cpp:144: t_i = 0.1*exp(i/(n-1)*ln(1+10*top_t)) - 0.1
        pat = parse_pattern("4*1", top_t=2.0)
        times = pat.segment_times()
        assert times[0] == pytest.approx(0.0)
        assert times[-1] == pytest.approx(2.0, rel=1e-9)
        assert len(times) == 4

    def test_grouping(self):
        pat = parse_pattern("2*2+1*3", top_t=1.0)
        assert pat.num_segments == 7
        assert pat.num_epochs == 3
        starts = pat.epoch_start_times()
        seg = pat.segment_times()
        assert starts == [seg[0], seg[2], seg[4]]

    def test_bad_pattern(self):
        with pytest.raises(PatternError):
            parse_pattern("3*", top_t=1.0)

    def test_smc2_pattern(self):
        # model.py:470-536: -P 133 133016 31*1 style
        times = smc2_pattern_times(133, 133016, "31*1", n0=10000.0)
        # mask = [1] + [1]*31 + [1] -> 33 epochs
        assert len(times) == 33
        assert times[0] == 0.0
        assert times[1] == pytest.approx(133 / 40000.0)
        assert times[-1] == pytest.approx(133016 / 40000.0, rel=1e-9)

    def test_smc2_pattern_grouped(self):
        times = smc2_pattern_times(100, 10000, "2*2+1*2", n0=10000.0)
        # mask = [1, 1,0,1,0, 1,0, 1] -> epochs at positions 0,1,3,5,7
        assert len(times) == 5


class TestDemographyParse:
    def test_single_pop_eN(self):
        d = parse_scrm_args("-nsam 2 -N0 10000 -eN 0.5 2.0", n0=10000.0)
        assert d.num_epochs == 2
        assert d.change_times[1] == pytest.approx(0.5 * 40000)
        assert d.pop_sizes[0, 0] == pytest.approx(10000)
        assert d.pop_sizes[1, 0] == pytest.approx(20000)
        assert d.num_samples == 2

    def test_theta_rho(self):
        d = parse_scrm_args("-nsam 4 -t 400 -r 40 1000000", n0=10000.0)
        assert d.mutation_rate == pytest.approx(400 / (4e4 * 1e6))
        assert d.recombination_rate == pytest.approx(40 / (4e4 * 1e6))
        assert d.sequence_length == 1e6

    def test_two_pop_split_migration(self):
        d = parse_scrm_args(
            "-N0 10000 -I 2 2 2 -em 0 1 2 1.0 -ej 0.2 2 1", n0=10000.0
        )
        assert d.num_populations == 2
        assert d.num_samples == 4
        np.testing.assert_array_equal(d.sample_pops, [0, 0, 1, 1])
        assert d.mig_rates[0, 0, 1] == pytest.approx(1.0 / 40000)
        assert len(d.splits) == 1
        t, src, snk = d.splits[0]
        assert t == pytest.approx(0.2 * 40000)
        assert (src, snk) == (1, 0)
        pm = d.pop_map_at_epoch()
        e_split = d.epoch_of(t)
        assert pm[e_split, 1] == 0  # pop 2 folded into pop 1 after split
        assert pm[0, 1] == 1

    def test_round_trip_command_line(self):
        d = parse_scrm_args("-nsam 2 -N0 5000 -eN 0.1 0.5 -eN 1.0 2.0", n0=5000.0)
        d2 = parse_scrm_args(d.core_command_line(), n0=5000.0)
        np.testing.assert_allclose(d2.change_times, d.change_times, rtol=1e-6)
        np.testing.assert_allclose(d2.pop_sizes, d.pop_sizes, rtol=1e-6)

    def test_watterson(self):
        assert watterson_theta(2, 100, 1e6) == pytest.approx(1e-4)
        assert watterson_theta(4, 100, 1e6) == pytest.approx(100 / (11 / 6) / 1e6)


class TestSegIO:
    def _write(self, tmp_path, text):
        p = tmp_path / "t.seg"
        p.write_text(text)
        return str(p)

    def test_read_3col(self, tmp_path):
        p = self._write(tmp_path, "1\t100\t01\n101\t50\t1.\n")
        seg = read_seg(p)
        assert seg.num_segments == 2
        assert seg.num_samples == 2
        np.testing.assert_array_equal(seg.positions, [1, 101])
        np.testing.assert_array_equal(seg.lengths, [100, 50])
        np.testing.assert_array_equal(seg.alleles, [[0, 1], [1, -1]])

    def test_read_6col(self, tmp_path):
        p = self._write(tmp_path, "1\t100\tT\tF\t1\t0/\n101\t50\tT\tF\t1\t1.\n")
        seg = read_seg(p)
        np.testing.assert_array_equal(seg.alleles, [[0, 2], [1, -1]])
        # haplotype 1 is unphased somewhere -> phased False
        np.testing.assert_array_equal(seg.phased, [True, False])

    def test_non_consecutive_raises(self, tmp_path):
        p = self._write(tmp_path, "1\t100\t01\n150\t50\t10\n")
        with pytest.raises(SegError):
            read_seg(p)

    def test_bad_code_raises(self, tmp_path):
        p = self._write(tmp_path, "1\t100\t0X\n")
        with pytest.raises(SegError):
            read_seg(p)

    def test_split_long_segments(self, tmp_path):
        p = self._write(tmp_path, "1\t1000\t01\n")
        seg = read_seg(p, max_segment_length=300)
        # 1000 -> 300+300+300+100
        np.testing.assert_array_equal(seg.lengths, [300, 300, 300, 100])
        # only the last piece carries the site (INVARIANT); others PARTIAL
        np.testing.assert_array_equal(seg.states, [1, 1, 1, 0])

    def test_write_read_roundtrip(self, tmp_path):
        seg = SegData(
            positions=np.array([1, 101]),
            lengths=np.array([100, 200]),
            states=np.zeros(2, dtype=np.int8),
            alleles=np.array([[0, 1], [1, -1]], dtype=np.int8),
            phased=np.array([True, True]),
        )
        p = str(tmp_path / "rt.seg")
        write_seg(p, seg)
        seg2 = read_seg(p)
        np.testing.assert_array_equal(seg2.positions, seg.positions)
        np.testing.assert_array_equal(seg2.alleles, seg.alleles)

    def test_gzip(self, tmp_path):
        import gzip

        p = str(tmp_path / "t.seg.gz")
        with gzip.open(p, "wt") as fh:
            fh.write("1\t100\t01\n")
        seg = read_seg(p)
        assert seg.num_segments == 1

    def test_merge_and_chunks(self, tmp_path):
        p1 = self._write(tmp_path, "1\t1000000\t01\n")
        p2 = str(tmp_path / "t2.seg")
        with open(p2, "w") as fh:
            fh.write("1\t2000000\t10\n")
        merged, mapping = merge_segs([p1, p2], gap=500000)
        assert merged.num_segments == 2
        assert mapping[1][0] == 1000000 + 1 + 500000 - 1 or mapping[1][0] > 1000000
        chunks = define_chunks(merged, 2, maxgap=200000, minseg=100)
        assert len(chunks) == 2

    def test_slice(self):
        seg = SegData(
            positions=np.array([1, 101, 201]),
            lengths=np.array([100, 100, 100]),
            states=np.zeros(3, dtype=np.int8),
            alleles=np.array([[0], [1], [0]], dtype=np.int8),
            phased=np.array([True]),
        )
        s = slice_seg(seg, 101, 201)
        assert s.num_segments == 1
        assert s.positions[0] == 101
