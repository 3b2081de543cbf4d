"""Attribute per-segment device time to the sweep's components.

Times, at the bench config (P=10k, n=4, E=8, real TPU):
  1. full sweep per segment (block repeat, steady state)
  2. recombination_transition alone (per call, all particles)
  3. _tree_summaries alone
  4. site_log_likelihood alone
  5. systematic resample + ancestry gather alone
  6. sweep with max_recomb_iters=1 (trip-count contribution)

Usage: python tools/profile_trip.py [P]
"""

import sys
import time

sys.path.insert(0, ".")
import numpy as np

from smcsmc_tpu._cache import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp

from smcsmc_tpu.demography import Demography
from smcsmc_tpu.em import prepare_blocks
from smcsmc_tpu.kernels.likelihood import site_log_likelihood
from smcsmc_tpu.kernels.transition import recombination_transition
from smcsmc_tpu.kernels.tree import epochs_from_demography
from smcsmc_tpu.simulate import simulate_seg
from smcsmc_tpu.smc import (
    PFConfig,
    _gather_particles,
    _tree_summaries,
    build_sweep,
    default_lags,
    init_state,
    systematic_resample,
)


def timeit(fn, *args, reps=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / reps


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    n = 4
    num_epochs = 8
    change = np.concatenate([[0.0], np.logspace(2.5, 5.0, num_epochs - 1)])
    demo = Demography(
        change_times=change,
        pop_sizes=np.full((num_epochs, 1), 10000.0),
        mig_rates=np.zeros((num_epochs, 1, 1)),
        sample_pops=np.zeros(n, dtype=np.int32),
        mutation_rate=1e-8,
        recombination_rate=1e-9,
        sequence_length=2e6,
    )
    seg = simulate_seg(demo, seed=11)
    epochs = epochs_from_demography(demo)
    rho = demo.recombination_rate
    lags = jnp.asarray(default_lags(epochs, rho))
    print(f"device: {jax.devices()[0]}, P={P}")

    bs = 512
    blocks = list(prepare_blocks(seg, bs, int(seg.positions[0])))

    for label, iters in [("full sweep", 64), ("max 1 trip", 1),
                         ("max 2 trips", 2)]:
        cfg = PFConfig(num_particles=P, num_leaves=n, max_recomb_iters=iters)
        state = init_state(
            jax.random.PRNGKey(0), epochs, cfg, demo.sample_pops, rho
        )
        sweep = build_sweep(cfg)
        run = lambda st: sweep(
            st, blocks[0], epochs, demo.mutation_rate, rho, lags
        )[0]
        dt = timeit(run, state, reps=5)
        print(f"{label:>12}: {dt/bs*1e3:.3f} ms/segment "
              f"({P*bs/dt/1e6:.1f}M updates/s)")

    cfg = PFConfig(num_particles=P, num_leaves=n)
    state = init_state(jax.random.PRNGKey(0), epochs, cfg, demo.sample_pops, rho)
    trees = state.trees
    active = jnp.ones((P,), bool)

    @jax.jit
    def trans(key, trees):
        keys = jax.random.split(key, P)
        return recombination_transition(keys, trees, epochs, active)

    dt = timeit(trans, jax.random.PRNGKey(1), trees)
    print(f"  transition: {dt*1e3:.3f} ms/call")

    @jax.jit
    def summ(trees):
        return _tree_summaries(trees, epochs, jnp.int8(1), jnp.ones((n,), bool))

    dt = timeit(summ, trees)
    print(f"   summaries: {dt*1e3:.3f} ms/call")

    cfgs = jnp.zeros((n,), jnp.int8)

    @jax.jit
    def lik(trees):
        return site_log_likelihood(trees, cfgs, jnp.float32(1e-8), False)

    dt = timeit(lik, trees)
    print(f"  site lik  : {dt*1e3:.3f} ms/call")

    @jax.jit
    def resamp(key, state):
        idx = systematic_resample(key, state.log_w)
        return _gather_particles(state, idx)

    dt = timeit(resamp, jax.random.PRNGKey(2), state)
    print(f"  resample  : {dt*1e3:.3f} ms/call")


if __name__ == "__main__":
    main()
