"""Batched 2-state Felsenstein pruning on array trees.

Model parity with the reference (particle.cpp:625-680): infinite-sites-style
two-state likelihood where ``p_nomut = exp(-mu * branch_length)`` per branch,
leaf states 0/1, missing (-1) scores [1, 1], root prior 1/2:1/2 (or 1:0 for
``ancestral_aware``).  Unphased genotypes (allele code 2) are marginalized
over phase configurations by the caller (particleContainer.cpp:138-224).

The recursion is replaced by a height-ordered fori_loop over internal nodes
(parents are strictly higher than children), vmapped over particles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .tree import parent_time


def _site_likelihood_one(
    tree_time: jnp.ndarray,  # [N]
    tree_children: jnp.ndarray,  # [N, 2]
    alleles: jnp.ndarray,  # [n] int: 0/1/-1 (2 handled by caller)
    mutation_rate: jnp.ndarray,
    ancestral_prior: jnp.ndarray,  # [2]
) -> jnp.ndarray:
    N = tree_time.shape[0]
    n = (N + 1) // 2
    # leaf partials (particle.cpp:632-634): state 1 -> [0,1]; 0 -> [1,0];
    # missing -> [1,1]
    l0 = jnp.where(alleles == 1, 0.0, 1.0)
    l1 = jnp.where(alleles == 0, 0.0, 1.0)
    partial = jnp.zeros((N, 2))
    partial = partial.at[:n, 0].set(l0).at[:n, 1].set(l1)

    order = jnp.argsort(tree_time[n:]) + n

    # unrolled height-ordered combine (n is static; the loop machinery of a
    # fori_loop costs more than the 3-15 gather/fma steps it would hide).
    # Each internal node's partial is rescaled to max 1 with the log-scale
    # accumulated: for n >= ~24 the raw product underflows float32 to exact
    # zero (the reference computes in double, particle.cpp:625-680), which
    # both floors the filter's signal and poisons log-weights with -inf.
    acc = jnp.float32(0.0)
    for i in range(n - 1):
        v = order[i]
        c0, c1 = tree_children[v, 0], tree_children[v, 1]
        t0 = tree_time[v] - tree_time[c0]
        t1 = tree_time[v] - tree_time[c1]
        p0 = jnp.exp(-t0 * mutation_rate)
        p1 = jnp.exp(-t1 * mutation_rate)
        a0, a1 = partial[c0], partial[c1]
        m0 = a0 * p0 + a0[::-1] * (1.0 - p0)
        m1 = a1 * p1 + a1[::-1] * (1.0 - p1)
        val = m0 * m1
        s = jnp.maximum(jnp.maximum(val[0], val[1]), 1e-30)
        partial = partial.at[v].set(val / s)
        acc = acc + jnp.log(s)

    # root = highest internal node; for n == 1 the single leaf is the root
    root = order[n - 2] if n > 1 else jnp.int32(0)
    return jnp.dot(partial[root], ancestral_prior), acc


def site_log_likelihood(
    trees,
    alleles: jnp.ndarray,
    mutation_rate: float,
    ancestral_aware: bool = False,
) -> jnp.ndarray:
    """[P] per-particle site log-likelihood (particle.cpp:667-680), exact in
    log space via per-node rescaling — no underflow floor at large n."""
    prior = jnp.where(
        ancestral_aware, jnp.array([1.0, 0.0]), jnp.array([0.5, 0.5])
    )

    def one(t, c):
        lik, acc = _site_likelihood_one(t, c, alleles, mutation_rate, prior)
        return jnp.log(jnp.maximum(lik, 1e-30)) + acc

    return jax.vmap(one)(trees.time, trees.children)


def site_likelihood(
    trees,
    alleles: jnp.ndarray,
    mutation_rate: float,
    ancestral_aware: bool = False,
) -> jnp.ndarray:
    """[P] per-particle site likelihood (linear space; may underflow for
    large n — prefer :func:`site_log_likelihood` in weight updates)."""
    return jnp.exp(
        site_log_likelihood(trees, alleles, mutation_rate, ancestral_aware)
    )


def phase_configurations(alleles: jnp.ndarray, max_unphased_pairs: int):
    """Host-side helper: enumerate phase configurations for a site with
    unphased genotypes (allele code 2 marks both members of an unphased
    heterozygous pair; reference particleContainer.cpp:138-181).

    Returns an array [C, n] of phased allele vectors (0/1/-1) to average
    over; C = 2^(#unphased het pairs), padded with repeats to a fixed power
    of two so shapes stay static under jit.
    """
    import numpy as np

    alleles = np.asarray(alleles)
    n = len(alleles)
    pair_idx = [i for i in range(0, n - 1, 2) if alleles[i] == 2]
    base = alleles.copy()
    for i in pair_idx:
        base[i], base[i + 1] = 0, 1
    configs = [base]
    for i in pair_idx:
        new = []
        for c in configs:
            flipped = c.copy()
            flipped[i], flipped[i + 1] = c[i + 1], c[i]
            new.append(flipped)
        configs += new
    cmax = 2 ** max_unphased_pairs
    while len(configs) < cmax:
        configs.append(configs[0])
    return np.stack(configs[:cmax]), len(pair_idx)
