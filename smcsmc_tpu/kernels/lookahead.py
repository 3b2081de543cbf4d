"""Device-side APF lookahead likelihood, batched over particles.

Reimplements ``ForestState::includeLookaheadLikelihood``
(/root/reference/src/particle.cpp:439-617) as a fixed-shape vectorized
computation over the array-tree encoding:

- **singletons** (apf >= 1): for each leaf, the probability of the observed
  distance to its first singleton given the leaf's terminal branch length,
  integrating over two recombination-rate regimes (expected and half, to
  model branch-length autocorrelation) and over the model's terminal-branch
  length quantile distribution (particle.cpp:473-525);
- **doubletons/cherries** (apf >= 2): for each observed doubleton, the
  probability of keeping/acquiring the corresponding cherry given the
  evidence distances (particle.cpp:526-570);
- **splits** (apf >= 3): the probability of the first >2-carrier variant
  given the current topology (particle.cpp:572-608); apf == 4 switches the
  equilibrium split probability to 1/C(n,k) (particle.cpp:593-595).

The result is a per-particle log-likelihood added to the *pilot* weight only
(resampling guide); the posterior correction divides it back out, so the
estimator stays unbiased (auxiliary particle filter).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .likelihood import _site_likelihood_one

# two recombination-rate regimes (particle.cpp:455-456)
_REL_RHO = (1.0, 0.5)
_REL_RHO_P = (0.5, 0.5)
_TINY = 1e-30

# terminal-branch-length quantile probabilities (smcsmc.cpp:134)
TBLQ_PROBS = (0.001, 0.003, 0.01, 0.03, 0.1, 0.5, 0.95)


def tblq_bin_widths(probs=TBLQ_PROBS):
    """Integration weights per quantile bin: qbot = prev (0 for the first),
    qtop = next (1 for the last) — particle.cpp:497-499."""
    import numpy as np

    probs = np.asarray(probs, dtype=np.float32)
    qbot = np.concatenate([[0.0], probs[:-1]])
    qtop = np.concatenate([probs[:-1], [1.0]])
    return qtop - qbot


def _singleton_loglik(pt_leaf, fsd, rel_mu, unph, mu, rho, tblq_len, tblq_w, n):
    """[scalar] log-probability of the per-leaf first-singleton distances.

    pt_leaf [n]: leaf parent heights; fsd/rel_mu/unph [n]; tblq_len [n, Q];
    tblq_w [Q].  Also returns mut_prob [n] (used by the doubleton term)."""
    # unphased-het pairs: the even index carries the combined branch length
    # (particle.cpp:475-480); the odd partner is skipped (particle.cpp:522-524)
    li_next = jnp.concatenate([pt_leaf[1:], jnp.zeros(1)])
    li = jnp.where(unph, pt_leaf + li_next, pt_leaf)
    skip = jnp.concatenate([jnp.zeros(1, bool), unph[:-1]])

    rho_tbl = 2.0 * rho * (n - 1) / n
    li_mu = li * mu * rel_mu  # [n]
    # mut_prob mirrors onto the skipped partner (particle.cpp:484-488)
    li_mu_prev = jnp.concatenate([jnp.zeros(1), li_mu[:-1]])
    mut_prob = jnp.where(skip, li_mu_prev, li_mu)

    si = fsd  # signed
    asi = jnp.abs(si)
    lprime_mu = tblq_len * mu * rel_mu[:, None]  # [n, Q]

    p = jnp.zeros(li.shape)
    for r, rp in zip(_REL_RHO, _REL_RHO_P):
        li_rho = li * rho_tbl * r  # [n]
        fe = jnp.exp(-(li_rho + li_mu) * asi)  # [n]
        a = (li_rho + li_mu)[:, None]  # [n, 1]
        # guard near-singular divisor (particle.cpp:502-504)
        near = jnp.abs(a - lprime_mu) < (a + lprime_mu) * 1e-5
        lpm = jnp.where(near, lprime_mu * 1.0001, lprime_mu)
        div = a - lpm
        term_mut = (
            li_rho[:, None] * lpm * jnp.exp(-lpm * asi[:, None])
            + (li_mu[:, None] - lpm) * a * fe[:, None]
        ) / div
        term_miss = (
            li_rho[:, None] * jnp.exp(-lpm * asi[:, None])
            + (li_mu[:, None] - lpm) * fe[:, None]
        ) / div
        term = jnp.where((si > 0)[:, None], term_mut, term_miss)  # [n, Q]
        p = p + rp * jnp.sum(term * tblq_w[None, :], axis=1)

    logp = jnp.where(skip, 0.0, jnp.log(jnp.maximum(p, _TINY)))
    return jnp.sum(logp), mut_prob


def _doubleton_loglik(
    parent, pt_leaf, mut_prob, dbl, mu, rho, l_mean, n
):
    """[scalar] log-probability of the observed doubletons
    (particle.cpp:526-570)."""
    s1, s2, first_ev, last_ev, u1, u2 = dbl
    D = s1.shape[0]
    valid = s1 >= 0
    s1c = jnp.clip(s1, 0, n - 1)
    s2c = jnp.clip(s2, 0, n - 1)

    rho_c = 4.0 * rho * (n - 2) / n
    rhoprime_c = rho * (n - 1)
    p_eq = 2.0 / (3.0 * (n - 1))

    # greedy phasing search for the cherry (particle.cpp:536-543): first
    # match in (ph1, ph2) = (0,0),(0,1),(1,0),(1,1) order wins
    def phased(ph1, ph2):
        i1 = jnp.clip(s1c + ph1, 0, n - 1)
        i2 = jnp.clip(s2c + ph2, 0, n - 1)
        ok = (ph1 <= u1.astype(jnp.int32)) & (ph2 <= u2.astype(jnp.int32))
        ok &= (s1c + ph1 <= n - 1) & (s2c + ph2 <= n - 1)
        return (parent[i1] == parent[i2]) & ok, i1

    m00, i00 = phased(0, 0)
    m01, i01 = phased(0, 1)
    m10, i10 = phased(1, 0)
    m11, i11 = phased(1, 1)
    match = jnp.stack([m00, m01, m10, m11])  # [4, D]
    idx1 = jnp.stack([i00, i01, i10, i11])
    has_cherry = jnp.any(match, axis=0)
    which = jnp.argmax(match, axis=0)  # first True (greedy)
    cherry_leaf = jnp.take_along_axis(idx1, which[None, :], axis=0)[0]
    l_ch = pt_leaf[jnp.clip(cherry_leaf, 0, n - 1)]  # [D]

    p_ch = jnp.zeros((D,))
    p_noch = jnp.zeros((D,))
    mutprob = 0.5 * (mut_prob[s1c] + mut_prob[s2c])
    for r, rp in zip(_REL_RHO, _REL_RHO_P):
        exp_rho = jnp.exp(-rho_c * r * l_ch * last_ev)
        # NB the equilibrium term is NOT weighted by rel_rho_p in the
        # reference (particle.cpp:550): p += rp*exp_rho + p_eq*(1-exp_rho)
        p_ch = p_ch + rp * exp_rho + p_eq * (1.0 - exp_rho)
        p_noch = p_noch + rp * (
            mutprob
            + (1.0 - mutprob)
            * p_eq
            * (1.0 - jnp.exp(-rhoprime_c * r * l_mean * first_ev))
        )
    p = jnp.where(has_cherry, p_ch, p_noch)
    return jnp.sum(jnp.where(valid, jnp.log(jnp.maximum(p, _TINY)), 0.0))


def _split_loglik(
    time, children, treelen, split_dist, split_alleles, split_k, mu, rho,
    etbl, n, apf_level,
):
    """[scalar] log-probability of the first split (particle.cpp:572-608)."""
    valid = split_dist > -0.5
    rate_of_change = treelen * rho / 2.0
    p_nochange = jnp.exp(-rate_of_change * jnp.maximum(split_dist, 0.0))
    prior = jnp.array([0.5, 0.5])
    p_sd, p_acc = _site_likelihood_one(time, children, split_alleles, mu, prior)
    p_splitdata = p_sd * jnp.exp(p_acc)
    k = split_k.astype(jnp.float32)
    if apf_level == 4:
        # 1 / nchoosek(n, k) via lgamma (particle.cpp:594-595)
        logc = (
            jax.scipy.special.gammaln(n + 1.0)
            - jax.scipy.special.gammaln(k + 1.0)
            - jax.scipy.special.gammaln(n - k + 1.0)
        )
        p_correct = jnp.exp(-logc)
    else:
        p_correct = k / (4.0 * n * n)
    # reproduces the reference expression literally, 2n * (0.577 * ln n)
    # (particle.cpp:605; the comment says gamma + ln n but the code multiplies)
    sbl = k * etbl / (2.0 * n * (0.577 * jnp.log(float(n))))
    p = p_nochange * p_splitdata + (1.0 - p_nochange) * p_correct * mu * sbl
    return jnp.where(valid, jnp.log(jnp.maximum(p, _TINY)), 0.0)


def lookahead_loglik(
    trees,
    treelen,  # [P]
    la_seg,  # tuple of per-segment arrays (see smc.py seg layout)
    tblq_len,  # [n, Q] terminal branch length quantiles
    tblq_w,  # [Q] quantile bin widths
    etbl,  # scalar mean total branch length
    mu,
    rho,
    apf_level: int,
):
    """[P] per-particle lookahead log-likelihood for one segment."""
    (fsd, rel_mu, unph, d_s1, d_s2, d_first, d_last, d_u1, d_u2,
     sp_dist, sp_alleles, sp_k) = la_seg
    n = fsd.shape[0]
    l_mean = jnp.mean(tblq_len[:, -1])  # particle.cpp:529-530

    def one(time, parent, children, tl):
        pt_leaf = time[jnp.clip(parent[:n], 0, time.shape[0] - 1)]
        ll, mut_prob = _singleton_loglik(
            pt_leaf, fsd, rel_mu, unph, mu, rho, tblq_len, tblq_w, n
        )
        if apf_level >= 2:
            ll = ll + _doubleton_loglik(
                parent, pt_leaf, mut_prob,
                (d_s1, d_s2, d_first, d_last, d_u1, d_u2),
                mu, rho, l_mean, n,
            )
        if apf_level >= 3:
            ll = ll + _split_loglik(
                time, children, tl, sp_dist, sp_alleles, sp_k, mu, rho,
                etbl, n, apf_level,
            )
        return ll

    return jax.vmap(one)(trees.time, trees.parent, trees.children, treelen)
