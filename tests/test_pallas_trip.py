"""The fused Pallas trip kernel vs the XLA oracle path.

Interpret mode runs the kernel's math on CPU, so these tests pin the
kernel's semantics without TPU hardware; the compiled (Mosaic) kernel is
gated on the real device by
``tests/test_tpu_smoke.py::test_pallas_compiled_matches_xla``
(run via ``make tpu-smoke``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smcsmc_tpu.demography import Demography
from smcsmc_tpu.em import EMConfig, run_chunk
from smcsmc_tpu.kernels.pallas_trip import fused_trip
from smcsmc_tpu.kernels.tree import epochs_from_demography, make_initial_trees
from smcsmc_tpu.simulate import simulate_seg
from smcsmc_tpu.smc import (
    PFConfig,
    _tree_summaries,
    init_state,
    stats_width,
    unpack_stats,
)


def _demo(E=3, n=4, ne=10000.0, L=2e5):
    change = (
        np.array([0.0]) if E == 1
        else np.concatenate([[0.0], np.logspace(3.2, 4.5, E - 1)])
    )
    return Demography(
        change_times=change,
        pop_sizes=np.full((E, 1), ne),
        mig_rates=np.zeros((E, 1, 1)),
        sample_pops=np.zeros(n, dtype=np.int32),
        mutation_rate=1e-8,
        recombination_rate=1e-9,
        sequence_length=L,
    )


def _run_trip(P=64, E=3, n=4, L_seg=30000.0, seed=0):
    demo = _demo(E=E, n=n)
    epochs = epochs_from_demography(demo)
    cfg = PFConfig(num_particles=P, num_leaves=n)
    state = init_state(
        jax.random.PRNGKey(seed), epochs, cfg, demo.sample_pops, 1e-9
    )
    trees = state.trees
    tl, tl_e, B = _tree_summaries(
        trees, epochs, jnp.int8(1), jnp.ones((n,), bool)
    )
    K = stats_width(E, 1)
    pending = jnp.zeros((P, K))
    # force every particle active: next recombination inside the window
    next_rec = jnp.minimum(state.next_rec, L_seg * 0.5)
    out = fused_trip(
        jax.random.uniform(jax.random.PRNGKey(seed + 99), (P, 4)), 1,
        trees.time, trees.parent, trees.child0, trees.child1,
        next_rec, jnp.zeros((P,)), state.log_w, tl, B, tl_e, pending,
        jnp.float32(L_seg), jnp.float32(1e-8), jnp.float32(1e-9),
        epochs.start, 1.0 / (2.0 * epochs.ne[:, 0]),
        jnp.ones((n,), jnp.float32),
        N=2 * n - 1, E=E, BLK=P, interpret=True,
    )
    return state, epochs, out, next_rec, tl, tl_e, B


class TestKernelInvariants:
    def test_trees_stay_valid(self):
        P, n, E = 64, 4, 3
        state, epochs, out, next_rec, tl0, tle0, B0 = _run_trip(P=P, E=E, n=n)
        (t2, p2, c02, c12, nr2, up2, lw2, tl2, B2, tle2, pend2) = out
        N = 2 * n - 1
        par = np.asarray(p2)
        t = np.asarray(t2)
        c0 = np.asarray(c02)
        c1 = np.asarray(c12)
        # exactly one root; parents above children; children consistent
        assert np.all(np.sum(par < 0, axis=1) == 1)
        for i in range(P):
            for v in range(N):
                if par[i, v] >= 0:
                    assert t[i, par[i, v]] >= t[i, v], (i, v)
            for v in range(n, N):
                assert c0[i, v] != c1[i, v]
                assert par[i, c0[i, v]] == v
                assert par[i, c1[i, v]] == v
        # next_rec advanced beyond the old position for all active
        assert np.all(np.asarray(nr2) > np.asarray(next_rec))
        assert np.all(np.asarray(up2) == np.asarray(next_rec))
        # refreshed summaries match a recompute on the new trees
        from smcsmc_tpu.kernels.tree import Trees

        trees2 = Trees(parent=p2, time=t2, pop=state.trees.pop,
                       child0=c02, child1=c12)
        tl_ref, tle_ref, B_ref = _tree_summaries(
            trees2, epochs, jnp.int8(1), jnp.ones((n,), bool)
        )
        np.testing.assert_allclose(np.asarray(tl2), np.asarray(tl_ref),
                                   rtol=2e-5)
        np.testing.assert_allclose(np.asarray(tle2), np.asarray(tle_ref),
                                   rtol=2e-5, atol=1e-2)
        np.testing.assert_allclose(np.asarray(B2), np.asarray(B_ref),
                                   rtol=2e-5)

    def test_pending_records_match_topology(self):
        P, n, E = 64, 4, 3
        state, epochs, out, next_rec, tl0, tle0, B0 = _run_trip(P=P, E=E, n=n)
        pend = unpack_stats(np.asarray(out[10]), E, 1)
        # one recombination and one coalescence recorded per particle
        np.testing.assert_allclose(pend.recomb_cnt.sum(axis=1), 1.0)
        np.testing.assert_allclose(pend.coal_cnt.sum(axis=(1, 2)), 1.0)
        # opportunities are positive and finite
        assert np.all(pend.coal_opp.sum(axis=(1, 2)) > 0)
        assert np.all(np.isfinite(pend.coal_opp))
        # recomb opportunity = delta * tree length (delta = next_rec here)
        np.testing.assert_allclose(
            pend.recomb_opp.sum(axis=1),
            np.asarray(next_rec) * np.asarray(tl0),
            rtol=2e-4,
        )

    def test_weight_update_matches(self):
        P, n, E = 64, 4, 3
        state, epochs, out, next_rec, tl0, tle0, B0 = _run_trip(P=P, E=E, n=n)
        lw2 = np.asarray(out[6])
        expect = np.asarray(state.log_w) - 1e-8 * np.asarray(B0) * np.asarray(
            next_rec
        )
        np.testing.assert_allclose(lw2, expect, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
class TestPallasSweepAgreement:
    def test_estep_agrees_with_xla_path(self):
        """Full sweep with the pallas body (interpret mode) vs the XLA body:
        same data, same model — the committed sufficient statistics and
        log-likelihood must agree distributionally (different RNG streams,
        so compare estimates, not trajectories)."""
        demo = _demo(E=1, n=4, L=2e5)
        seg = simulate_seg(demo, seed=71)
        ref = run_chunk(demo, seg, EMConfig(num_particles=128, block_size=64),
                        seed=9)
        import smcsmc_tpu.smc as smc
        import dataclasses

        orig = smc.PFConfig

        # force the pallas body (interpret mode on CPU)
        class ForcePallas(orig):
            pass

        cfg = EMConfig(num_particles=128, block_size=64)
        # monkeypatch: run_chunk builds PFConfig internally; flip use_pallas
        # via environment of the dataclass default
        made = {}
        real_init = smc.PFConfig.__new__

        stats_p = None
        import functools
        old_pfconfig = smc.PFConfig
        try:
            def patched(**kw):
                kw["use_pallas"] = True
                return old_pfconfig(**kw)

            import smcsmc_tpu.em as em
            em.PFConfig = patched
            out_p = run_chunk(demo, seg, cfg, seed=9)
        finally:
            import smcsmc_tpu.em as em
            em.PFConfig = old_pfconfig
        ne_ref = float(ref[0].coal_opp.sum() / (2 * ref[0].coal_cnt.sum()))
        ne_p = float(out_p[0].coal_opp.sum() / (2 * out_p[0].coal_cnt.sum()))
        assert np.isfinite(out_p[2])
        assert ne_p == pytest.approx(ne_ref, rel=0.25), (ne_ref, ne_p)
        # log-likelihoods in the same ballpark
        assert out_p[2] == pytest.approx(ref[2], rel=0.05)
