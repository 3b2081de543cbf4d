"""TPU smoke tier (round-3 verdict #8): run with ``make tpu-smoke`` after
any TPU-touching change.  One serial pytest job against the real device —
the vmap/while miscompile class of bug (round-2's P>=1024 corruption) is
invisible to the CPU tiers and previously only surfaced at driver-bench
time, a full round later.

Also hosts the reference-scale statistical gate (verdict #3): 1e7 bp at
Np=1000 (the reference CI config, test_const_pop_size.py:17-32) finishes in
seconds on the TPU but would take ~an hour in the CPU tier.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def _const_demo(ne=10000.0, n=4, L=2e6, E=1):
    from smcsmc_tpu.demography import Demography

    change = (
        np.array([0.0])
        if E == 1
        else np.concatenate([[0.0], np.logspace(2.5, 5.0, E - 1)])
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


def test_device_is_tpu():
    import jax

    dev = jax.devices()[0]
    assert "TPU" in str(dev) or dev.platform in ("tpu", "axon"), dev


def test_p1000_sweep_smoke():
    """One P=1000 sweep on the device: finite LogL, resamples happened,
    E-step Ne within 2x.  Exercises the population-batched while loops at a
    batch size where vmapped-while lane masking used to miscompile."""
    from smcsmc_tpu.em import EMConfig, run_chunk
    from smcsmc_tpu.simulate import simulate_seg

    ne = 10000.0
    demo = _const_demo(ne=ne, L=2e6, E=8)
    seg = simulate_seg(demo, seed=11)
    cfg = EMConfig(num_particles=1000, block_size=256)
    stats, _, logl, diag = run_chunk(demo, seg, cfg, seed=2)
    assert np.isfinite(logl) and logl < 0
    assert diag["num_resamples"] > 0
    ne_hat = float(stats.coal_opp.sum() / (2.0 * stats.coal_cnt.sum()))
    assert 0.5 * ne < ne_hat < 2.0 * ne, ne_hat


def test_pallas_compiled_matches_xla():
    """The fused Pallas trip kernel, COMPILED on the real device (Mosaic),
    must produce an E-step agreeing with the XLA oracle path (the
    interpret-mode twin lives in test_pallas_trip.py; this is the device
    half the round-3 verdict found missing — weak #3)."""
    import jax
    import jax.numpy as jnp

    from smcsmc_tpu.em import prepare_blocks
    from smcsmc_tpu.kernels.tree import epochs_from_demography
    from smcsmc_tpu.simulate import simulate_seg
    from smcsmc_tpu.smc import (
        PFConfig, build_sweep, default_lags, flush_pending, init_state,
        unpack_stats,
    )

    ne = 10000.0
    demo = _const_demo(ne=ne, n=4, L=5e5, E=3)
    seg = simulate_seg(demo, seed=17)
    epochs = epochs_from_demography(demo)
    rho = demo.recombination_rate
    lags = jnp.asarray(default_lags(epochs, rho))
    blocks = list(prepare_blocks(seg, 256, int(seg.positions[0])))

    results = {}
    for use_pallas in (False, True):
        cfg = PFConfig(num_particles=512, num_leaves=4,
                       use_pallas=use_pallas)
        state = init_state(
            jax.random.PRNGKey(5), epochs, cfg, demo.sample_pops, rho
        )
        sweep = build_sweep(cfg)
        for blk in blocks:
            state, _ = sweep(state, blk, epochs, demo.mutation_rate, rho,
                             lags)
        state = jax.jit(flush_pending)(state)
        st = unpack_stats(np.asarray(state.stats), 3, 1)
        ne_hat = float(st.coal_opp.sum() / (2.0 * st.coal_cnt.sum()))
        results[use_pallas] = (float(state.ln_norm), ne_hat)

    ln_x, ne_x = results[False]
    ln_p, ne_p = results[True]
    assert np.isfinite(ln_p) and ln_p < 0
    # different RNG consumption => statistical, not bitwise, agreement
    assert ln_p == pytest.approx(ln_x, abs=max(30.0, 0.02 * abs(ln_x)))
    assert ne_p == pytest.approx(ne_x, rel=0.10)
    assert ne_p == pytest.approx(ne, rel=0.25)


def test_reference_scale_recovery():
    """Reference-scale gate: 1e7 bp, Np=1000, constant Ne — pooled estimate
    within ±5% of truth (cf. the reference's ±1% at test_const_pop_size.py:
    42-49; that precision uses lag calibration + 1000 particles + repeated
    EM, so ±5% for one E-step is the appropriate pre-registered bound)."""
    from smcsmc_tpu.em import EMConfig, run_chunk
    from smcsmc_tpu.simulate import simulate_seg

    ne = 10000.0
    demo = _const_demo(ne=ne, n=4, L=1e7, E=1)
    seg = simulate_seg(demo, seed=31)
    cfg = EMConfig(num_particles=1000, block_size=512)
    stats, _, logl, diag = run_chunk(demo, seg, cfg, seed=3)
    assert np.isfinite(logl) and logl < 0
    ne_hat = float(stats.coal_opp.sum() / (2.0 * stats.coal_cnt.sum()))
    assert ne_hat == pytest.approx(ne, rel=0.05), ne_hat
    r_hat = float(stats.recomb_cnt.sum() / stats.recomb_opp.sum())
    assert r_hat == pytest.approx(1e-9, rel=0.25), r_hat


def test_apf_sweep_on_device():
    """VERDICT r4 item 9: APF (-apf 2) exercised ON DEVICE — the CPU tier's
    invariance tests are slow-marked and no APF throughput was ever
    recorded.  One P=1000 lookahead-weighted sweep: finite LogL, resamples,
    E-step Ne within 2x, and the pilot-weight machinery actually engaged
    (APF changes the resampling distribution, so ln_norm must differ from
    the plain run on the same data/seed)."""
    from smcsmc_tpu.em import EMConfig, run_chunk
    from smcsmc_tpu.simulate import simulate_seg

    ne = 10000.0
    demo = _const_demo(ne=ne, L=2e6, E=8)
    seg = simulate_seg(demo, seed=11)
    cfg = EMConfig(num_particles=1000, block_size=256, apf=2)
    stats, _, logl, diag = run_chunk(demo, seg, cfg, seed=2)
    assert np.isfinite(logl) and logl < 0
    assert diag["num_resamples"] > 0
    ne_hat = float(stats.coal_opp.sum() / (2.0 * stats.coal_cnt.sum()))
    assert 0.5 * ne < ne_hat < 2.0 * ne, ne_hat
    cfg0 = EMConfig(num_particles=1000, block_size=256)
    _, _, logl0, _ = run_chunk(demo, seg, cfg0, seed=2)
    assert logl != logl0
