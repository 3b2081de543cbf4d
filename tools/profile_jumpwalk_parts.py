"""Cost-center profile of the jump-to-event migration walk on device.

Times, jitted and repeated:
  - the full recombination_transition (has_migration=True)
  - the CTMC path scan alone
  - eval-at-breakpoints alone (via a trimmed walk with Mj=1/K=1)
for several (Mj, K) settings, on the 2-pop bench config at P particles.

Usage: python tools/profile_jumpwalk_parts.py [P]
"""

import os
import sys
import time

sys.path.insert(0, ".")

from smcsmc_tpu._cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp

from smcsmc_tpu.demography import Demography
from smcsmc_tpu.kernels import transition as T
from smcsmc_tpu.kernels.tree import epochs_from_demography, make_initial_trees


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    num_epochs, m = 8, 5e-5
    change = np.concatenate([[0.0], np.logspace(2.5, 5.0, num_epochs - 1)])
    mig = np.zeros((num_epochs, 2, 2))
    mig[:, 0, 1] = m
    mig[:, 1, 0] = m
    demo = Demography(
        change_times=change,
        pop_sizes=np.full((num_epochs, 2), 10000.0),
        mig_rates=mig,
        sample_pops=np.array([0, 0, 1, 1], dtype=np.int32),
    )
    epochs = epochs_from_demography(demo)
    trees = make_initial_trees(
        jax.random.PRNGKey(0), epochs, P, jnp.asarray(demo.sample_pops),
        max_mig=56,
    )
    keys = jax.random.split(jax.random.PRNGKey(1), P)
    active = jnp.ones(P, bool)
    print(f"device: {jax.devices()[0]}  P={P}")

    def timed(fn, *args, reps=20):
        out = jax.block_until_ready(fn(*args))  # compile
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.time() - t0) / reps * 1e3, out

    for mj, k in [(56, 64), (32, 32), (20, 24), (12, 16)]:
        os.environ["SMCSMC_MIG_JUMPS"] = str(mj)
        os.environ["SMCSMC_MIG_COMPACT"] = str(k)

        @jax.jit
        def full(keys, trees):
            return T.recombination_transition(
                keys, trees, epochs, active, has_migration=True
            )

        ms, _ = timed(full, keys, trees)
        print(f"full walk  Mj={mj:3d} K={k:3d}: {ms:8.3f} ms/call")

    os.environ.pop("SMCSMC_MIG_JUMPS", None)
    os.environ.pop("SMCSMC_MIG_COMPACT", None)


if __name__ == "__main__":
    main()
