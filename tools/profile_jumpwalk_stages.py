"""Stage-level timing of the jump walk's pieces on device (dev tool)."""

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
    print(f"device: {jax.devices()[0]}  P={P}")

    def timed(name, fn, *args, reps=30):
        out = jax.block_until_ready(fn(*args))
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        print(f"{name:24s}: {(time.time() - t0) / reps * 1e3:8.3f} ms")
        return out

    N = trees.parent.shape[1]
    Mw = trees.mig_time.shape[2]
    E, Pp = epochs.num_epochs, epochs.num_pops
    K, Mj = 32, 24

    @jax.jit
    def topk_stage(mig_time, mig_dest):
        NM = N * Mw
        flat_t = mig_time.reshape(P, NM)
        negv, idxk = jax.lax.top_k(-flat_t, K)
        cev_t = -negv
        oh_idx = idxk[:, :, None] == jnp.arange(NM)[None, None, :]
        cev_d = jnp.sum(
            jnp.where(oh_idx, mig_dest.reshape(P, NM)[:, None, :], 0), axis=2
        )
        return cev_t, cev_d

    timed("top_k compaction", topk_stage, trees.mig_time, trees.mig_dest)

    start, end = epochs.start, epochs.end
    pm_i = epochs.pop_map.astype(jnp.int32)
    rate_es = jnp.take_along_axis(jnp.sum(epochs.mig, axis=2), pm_i, axis=1)
    arangePp, arangeE = jnp.arange(Pp), jnp.arange(E)
    BIG = jnp.float32(1e30)

    @jax.jit
    def ctmc_stage(ck, t0v, s0):
        def step(carry, kk):
            t, s, dead = carry
            k1, k2 = jax.random.split(kk)
            oh_s = s[:, None] == arangePp[None, :]
            rate_pe = jnp.sum(
                jnp.where(oh_s[:, None, :], rate_es[None], 0.0), axis=2
            )
            lo = jnp.maximum(start[None, :], t[:, None])
            ln = jnp.clip(
                jnp.minimum(end[None, :], BIG) - jnp.minimum(lo, BIG),
                0.0, None,
            )
            cum = jnp.cumsum(rate_pe * ln, axis=1)
            u = jax.random.uniform(k1, (P,), minval=1e-7, maxval=1 - 1e-7)
            x = -jnp.log1p(-u)
            idx = jnp.clip(jnp.sum(cum < x[:, None], axis=1), 0, E - 1)
            oh_i = idx[:, None] == arangeE[None, :]
            prev = jnp.sum(
                jnp.where(arangeE[None, :] == idx[:, None] - 1, cum, 0.0),
                axis=1,
            )
            rate_i = jnp.sum(jnp.where(oh_i, rate_pe, 0.0), axis=1)
            lo_i = jnp.sum(jnp.where(oh_i, lo, 0.0), axis=1)
            t_next = lo_i + jnp.where(
                rate_i > 0, (x - prev) / jnp.maximum(rate_i, 1e-30), BIG
            )
            live = (~dead) & (x <= cum[:, -1]) & (t_next < 0.5 * BIG)
            dest = jax.random.categorical(
                k2, jnp.zeros((P, Pp)), axis=-1
            ).astype(jnp.int32)
            return (
                jnp.where(live, t_next, t),
                jnp.where(live, dest, s),
                dead | ~live,
            ), (jnp.where(live, t_next, T.INF), dest)

        ks = jax.random.split(ck, Mj)
        _, (jt, jd) = jax.lax.scan(
            step, (t0v, s0, jnp.zeros((P,), bool)), ks
        )
        return jt.T, jd.T

    h_r = jnp.full((P,), 100.0)
    s0 = jnp.zeros((P,), jnp.int32)
    timed("ctmc scan (one path)", ctmc_stage, jax.random.PRNGKey(2), h_r, s0)

    # full walk for reference
    import os
    os.environ["SMCSMC_MIG_JUMPS"] = str(Mj)
    os.environ["SMCSMC_MIG_COMPACT"] = str(K)
    active = jnp.ones(P, bool)

    @jax.jit
    def full(keys, trees):
        return T.recombination_transition(
            keys, trees, epochs, active, has_migration=True
        )

    timed("full transition", full, keys, trees)

    # walk minus point sampling / SPR: call _walk_mig_jump directly
    c = jnp.zeros((P,), jnp.int32)
    hr2 = trees.time[:, 0] + 10.0

    @jax.jit
    def walk_only(key, trees):
        return T._walk_mig_jump(
            key, trees.time, trees.parent, trees.pop, trees.mig_time,
            trees.mig_dest, c, hr2, epochs, 256, active,
        )

    timed("_walk_mig_jump only", walk_only, jax.random.PRNGKey(3), trees)


if __name__ == "__main__":
    main()
