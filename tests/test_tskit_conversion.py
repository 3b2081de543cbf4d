"""Event-stream -> node/edge/migration table reconstruction
(reference: trees2tskit.py:361-521; round-3 verdict #7)."""

import numpy as np
import pytest

from smcsmc_tpu.argout import (
    build_tables,
    find_segments,
    read_trees,
    tract_fraction,
    trees_to_tskit,
    write_trees,
)
from smcsmc_tpu.demography import Demography
from smcsmc_tpu.em import EMConfig, run_chunk
from smcsmc_tpu.simulate import simulate_seg


def _arg_run(demo, seed, fseed, tmp_path, P=32):
    cfg = EMConfig(num_particles=P, block_size=64, record_arg=True)
    _, _, _, diag = run_chunk(demo, seg=simulate_seg(demo, seed=seed),
                              cfg=cfg, seed=fseed)
    a = diag["arg"]
    path = str(tmp_path / "chunk0.trees.gz")
    write_trees(path, a["pos"], a["code"], a["time"], a["from"], a["to"],
                a["desc"], a["n"], start_position=a["start"])
    return path


def _single_pop(L=1e5, n=4):
    return Demography(
        change_times=np.array([0.0]),
        pop_sizes=np.array([[10000.0]]),
        mig_rates=np.zeros((1, 1, 1)),
        sample_pops=np.zeros(n, dtype=np.int32),
        mutation_rate=1e-8,
        recombination_rate=1e-9,
        sequence_length=L,
    )


def _island(L=1e5, m=1e-4):
    return Demography(
        change_times=np.array([0.0]),
        pop_sizes=np.array([[10000.0, 10000.0]]),
        mig_rates=np.array([[[0.0, m], [m, 0.0]]]),
        sample_pops=np.array([0, 0, 1, 1], dtype=np.int32),
        mutation_rate=1e-8,
        recombination_rate=1e-9,
        sequence_length=L,
    )


def _check_trees_valid(tb, L, n):
    """Every genome position must carry a full binary tree: 2n-2 edges,
    each non-root node with exactly one parent."""
    edges = tb["edges"]
    assert len(edges) >= 2 * n - 2
    assert np.all(edges["right"] > edges["left"])
    for x in np.linspace(1.0, L - 1.0, 7):
        cover = edges[(edges["left"] <= x) & (x < edges["right"])]
        assert len(cover) == 2 * n - 2, (x, len(cover))
        children, counts = np.unique(cover["child"], return_counts=True)
        assert np.all(counts == 1), "a child has two parents at one site"
        # all leaves present
        assert set(range(n)) <= set(children.tolist())
        # parents are later (higher) than children
        t = tb["nodes"]["time"]
        assert np.all(t[cover["parent"]] > t[cover["child"]])


class TestBuildTables:
    def test_single_pop_tables(self, tmp_path):
        n, L = 4, 1e5
        path = _arg_run(_single_pop(L, n), seed=61, fseed=8, tmp_path=tmp_path)
        ev = read_trees(path)
        # initial tree present: n-1 C rows at the first position
        first = ev[ev["pos"] == ev["pos"][0]]
        assert np.sum(first["code"] == "C") == n - 1
        tb = build_tables(ev, L)
        assert tb["num_leaves"] == n
        assert len(tb["nodes"]["time"]) >= 2 * n - 1
        _check_trees_valid(tb, L, n)

    def test_island_migrations(self, tmp_path):
        L = 2e5
        path = _arg_run(_island(L), seed=62, fseed=9, tmp_path=tmp_path)
        ev = read_trees(path)
        assert np.sum(ev["code"] == "M") > 0
        tb = build_tables(ev, L)
        _check_trees_valid(tb, L, 4)
        migs = tb["migrations"]
        assert len(migs) > 0
        assert np.all(migs["right"] > migs["left"])
        assert np.all(migs["source"] != migs["dest"])

    def test_tract_fraction_bounded(self, tmp_path):
        """Merged per-haplotype coverage must be <= 1 even at high rates
        (round-2 verdict weak #10)."""
        L = 2e5
        demo = _island(L, m=5e-4)
        path = _arg_run(demo, seed=63, fseed=10, tmp_path=tmp_path)
        tr01 = find_segments(path, 0, 1, sequence_length=L)
        tr10 = find_segments(path, 1, 0, sequence_length=L)
        for tr in (tr01, tr10):
            if len(tr):
                frac = tract_fraction(tr, L, 4)
                assert 0.0 <= frac <= 1.0, frac

    def test_tskit_assembly_or_skip(self, tmp_path):
        pytest.importorskip("tskit")
        L = 1e5
        path = _arg_run(_single_pop(L), seed=64, fseed=11, tmp_path=tmp_path)
        tables = trees_to_tskit(path, L)
        ts = tables.tree_sequence()
        assert ts.num_samples == 4
        assert ts.num_trees >= 1
