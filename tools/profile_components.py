"""Per-component timing of the sweep's hot ops at bench shapes.

Each component is jitted standalone and timed over many iterations, giving
a cost breakdown to compare against the full sweep's per-segment time.
Run: python tools/profile_components.py [P]
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
from smcsmc_tpu.kernels.transition import recombination_transition
from smcsmc_tpu.kernels.tree import epochs_from_demography
from smcsmc_tpu.smc import (
    PFConfig,
    _gather_particles,
    _tree_summaries,
    init_state,
    systematic_resample,
)


def timeit(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    n, E = 4, 8
    change = np.concatenate([[0.0], np.logspace(2.5, 5.0, E - 1)])
    demo = Demography(
        change_times=change,
        pop_sizes=np.full((E, 1), 10000.0),
        mig_rates=np.zeros((E, 1, 1)),
        sample_pops=np.zeros(n, dtype=np.int32),
        mutation_rate=1e-8,
        recombination_rate=1e-9,
        sequence_length=2e6,
    )
    epochs = epochs_from_demography(demo)
    cfg = PFConfig(num_particles=P, num_leaves=n)
    state = init_state(
        jax.random.PRNGKey(0), epochs, cfg, demo.sample_pops, 1e-9
    )
    trees = state.trees
    dev = jax.devices()[0]
    print(f"# device={dev} P={P} n={n} E={E}")

    ls = jnp.int8(0)  # mixed-data branch: the expensive path
    hd = jnp.ones((n,), bool)
    f_sum = jax.jit(lambda t: _tree_summaries(t, epochs, ls, hd))
    print(f"tree_summaries: {timeit(f_sum, trees):8.3f} ms")

    keys = jax.random.split(jax.random.PRNGKey(1), P)
    active = jnp.ones((P,), bool)

    f_trans = jax.jit(
        lambda k, t, a: recombination_transition(k, t, epochs, a)
    )
    print(f"transition:     {timeit(f_trans, keys, trees, active):8.3f} ms")

    from smcsmc_tpu.kernels.likelihood import site_log_likelihood

    al = jnp.zeros((n,), jnp.int8).at[0].set(1)
    f_lik = jax.jit(lambda t: site_log_likelihood(t, al, 1e-8))
    print(f"site_loglik:    {timeit(f_lik, trees):8.3f} ms")

    lw = jax.random.normal(jax.random.PRNGKey(2), (P,))
    f_rs = jax.jit(
        lambda k, w, s: _gather_particles(s, systematic_resample(k, w))
    )
    print(
        f"resample+gather:{timeit(f_rs, jax.random.PRNGKey(3), lw, state):8.3f} ms"
    )

    # elementwise-layout microbench: [P, 7] vs [7, P] vs [7P]
    for shape, tag in [((P, 7), "[P,7] "), ((7, P), "[7,P] "),
                       ((7 * P,), "[7P]  ")]:
        x = jnp.ones(shape)

        @jax.jit
        def chain(x):
            for _ in range(50):
                x = x * 1.000001 + 1e-9
            return x

        print(f"ew50 {tag}:    {timeit(chain, x):8.3f} ms")

    # gather-layout microbench: take_along_axis on node axis
    idx = jax.random.randint(jax.random.PRNGKey(4), (P,), 0, 7)
    a_pn = jnp.ones((P, 7))
    f_g1 = jax.jit(
        lambda a, i: jnp.take_along_axis(a, i[:, None], axis=1)[:, 0]
    )
    print(f"gather [P,7]:   {timeit(f_g1, a_pn, idx):8.3f} ms")
    a_np = jnp.ones((7, P))
    f_g2 = jax.jit(
        lambda a, i: jnp.sum(
            a * (jnp.arange(7)[:, None] == i[None, :]), axis=0
        )
    )
    print(f"onehot [7,P]:   {timeit(f_g2, a_np, idx):8.3f} ms")


if __name__ == "__main__":
    main()
