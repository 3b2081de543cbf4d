"""EM orchestration: chunk sweeps -> sufficient statistics -> M-step.

Mirrors the reference's two EM layers: the in-binary loop
(/root/reference/src/smcsmc.cpp:80-90 + count.cpp:44-63
``reset_model_parameters``) and the Python driver
(smcsmc/model.py:1102-1184 ``do_iteration`` / :989-1048 ``m_step``), but as a
single in-process driver: chunks are independent sweeps whose [E, ...]
statistic tensors are summed (the reference sums .out files across chunk
processes, model.py:903-910).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from . import outfmt
from .demography import Demography
from .kernels.tree import epochs_from_demography
from .segio import SegData, slice_seg, split_long_segments
from .smc import (
    PFConfig,
    SuffStats,
    default_lags,
    flush_pending,
    init_state,
    make_segment_step,
)


@dataclass
class EMConfig:
    """Driver options (reference defaults: pfparam.cpp:193-255, model.py:44-81)."""

    num_particles: int = 100
    em_iters: int = 0  # number of EM updates (0 = a single E-step pass)
    ess_threshold: float = 0.5
    lag: float = 0.0  # 0 -> per-epoch default 4/(rho*top_t)
    ne_cap: float = 200000.0
    use_cap: bool = False
    ancestral_aware: bool = False
    block_size: int = 2048  # segments per device scan
    fifo_slots: int = 4
    seed: int = 1
    infer_recomb: bool = True
    infer_migration: bool = True
    vb: bool = False  # Dirichlet/VB pseudocount smoothing (model.py:997-1001)
    vb_pseudocount: float = 1.0
    chunks: int = 1
    outdir: str | None = None


def prior_pseudostats(demo: Demography):
    """Initial pseudocounts (count.cpp:161-227): each accumulator starts with
    opportunity 1 and count = the current model rate, so empty epochs return
    the prior rate from the M-step instead of 0/0."""
    E, Pp = demo.num_epochs, demo.num_populations
    coal_opp = np.ones((E, Pp), dtype=np.float64)
    coal_cnt = 1.0 / (2.0 * demo.pop_sizes)
    mig_opp = np.ones((E, Pp), dtype=np.float64)
    mig_cnt = demo.mig_rates.copy()
    recomb_opp = np.ones((E,), dtype=np.float64)
    recomb_cnt = np.full((E,), demo.recombination_rate, dtype=np.float64)
    return SuffStats(
        coal_opp=coal_opp,
        coal_cnt=coal_cnt,
        mig_opp=mig_opp,
        mig_cnt=mig_cnt,
        recomb_opp=recomb_opp,
        recomb_cnt=recomb_cnt,
    )


def _leaf_status(alleles: np.ndarray) -> np.ndarray:
    """Per-segment data class: -1 all-missing, 1 complete, 0 mixed
    (particle.cpp:748-758)."""
    missing = alleles < 0
    all_missing = np.all(missing, axis=1)
    none_missing = np.all(~missing, axis=1)
    return np.where(all_missing, -1, np.where(none_missing, 1, 0)).astype(np.int8)


def prepare_blocks(seg: SegData, block_size: int, chunk_start: int):
    """Host-side: fixed-shape device blocks from .seg records.

    Positions become chunk-relative; zero-length rows pad the final block."""
    S = seg.num_segments
    lengths = seg.lengths.astype(np.int32)
    alleles = seg.alleles.astype(np.int8)
    states = seg.states.astype(np.int8)
    leaf_status = _leaf_status(alleles)
    # clip the first segment to the chunk window
    first_off = chunk_start - int(seg.positions[0])
    if first_off > 0:
        lengths = lengths.copy()
        lengths[0] = max(int(lengths[0]) - first_off, 0)
    n_blocks = (S + block_size - 1) // block_size
    pad = n_blocks * block_size - S
    if pad:
        lengths = np.concatenate([lengths, np.zeros(pad, np.int32)])
        alleles = np.concatenate(
            [alleles, np.full((pad, alleles.shape[1]), -1, np.int8)]
        )
        states = np.concatenate([states, np.full(pad, 2, np.int8)])
        leaf_status = np.concatenate([leaf_status, np.full(pad, -1, np.int8)])
    for b in range(n_blocks):
        sl = slice(b * block_size, (b + 1) * block_size)
        yield (
            jnp.asarray(lengths[sl]),
            jnp.asarray(alleles[sl]),
            jnp.asarray(states[sl]),
            jnp.asarray(leaf_status[sl]),
        )


def run_chunk(
    demo: Demography,
    seg: SegData,
    cfg: EMConfig,
    chunk=(None, None),
    seed: int = 1,
):
    """One particle-filter sweep over (a chunk of) the genome; returns host
    SuffStats, the w^2 stats, the log-likelihood, and diagnostics.

    Equivalent of one `smcsmc -EM 0` subprocess in the reference
    (model.py:1050-1100 e_step -> smcsmc.cpp:278 pfARG_core)."""
    start, end = chunk
    if start is not None:
        seg = slice_seg(seg, start, end)
        chunk_start = start
    else:
        chunk_start = int(seg.positions[0])

    # bound per-step recombination work (pfparam.cpp:364: 2/(4*N0*rho))
    max_seg_len = 2.0 / max(4.0 * demo.n0 * demo.recombination_rate, 1e-30)
    seg = split_long_segments(seg, max_seg_len)

    epochs = epochs_from_demography(demo)
    pfcfg = PFConfig(
        num_particles=cfg.num_particles,
        num_leaves=demo.num_samples,
        ess_threshold=cfg.ess_threshold,
        fifo_slots=cfg.fifo_slots,
        ancestral_aware=cfg.ancestral_aware,
    )
    rho = demo.recombination_rate
    if cfg.lag > 0:
        lags = jnp.full((epochs.num_epochs,), cfg.lag, dtype=jnp.float32)
    else:
        lags = jnp.asarray(default_lags(epochs, rho))

    key = jax.random.PRNGKey(seed)
    state = init_state(key, epochs, pfcfg, demo.sample_pops, rho)
    step = make_segment_step(pfcfg, epochs, demo.mutation_rate, rho, lags)

    @jax.jit
    def run_block_jit(state, block):
        return jax.lax.scan(step, state, block)

    ess_traces = []
    for block in prepare_blocks(seg, cfg.block_size, chunk_start):
        state, ess = run_block_jit(state, block)
        ess_traces.append(np.asarray(ess))

    state = jax.jit(flush_pending)(state)

    pseudo = prior_pseudostats(demo)
    stats = jax.tree_util.tree_map(
        lambda x, p: np.asarray(x, dtype=np.float64) + p, state.stats, pseudo
    )
    ones = jax.tree_util.tree_map(np.ones_like, pseudo)
    stats_wt = jax.tree_util.tree_map(
        lambda x, p: np.asarray(x, dtype=np.float64) + p, state.stats_wt, ones
    )
    logl = float(state.ln_norm)
    diag = {
        "num_resamples": int(state.num_resamples),
        "ess": np.concatenate(ess_traces) if ess_traces else np.array([]),
        "final_front": float(state.front),
    }
    return stats, stats_wt, logl, diag


def sum_stats(stats_list: list[SuffStats]) -> SuffStats:
    """Cross-chunk reduction (model.py:903-910)."""
    return jax.tree_util.tree_map(lambda *xs: sum(xs), *stats_list)


def m_step(
    demo: Demography, stats: SuffStats, cfg: EMConfig
) -> Demography:
    """Parameter update from sufficient statistics (count.cpp:267-352
    reset_Ne / reset_recomb_rate / reset_mig_rate; VB pseudocounts
    model.py:997-1001)."""
    coal_opp = np.asarray(stats.coal_opp, dtype=np.float64)
    coal_cnt = np.asarray(stats.coal_cnt, dtype=np.float64)
    if cfg.vb:
        # Dirichlet pseudocounts: add prior-rate-matching mass
        prior_rate = 1.0 / (2.0 * demo.pop_sizes)
        coal_cnt = coal_cnt + cfg.vb_pseudocount
        coal_opp = coal_opp + cfg.vb_pseudocount / np.maximum(prior_rate, 1e-300)
    rate = coal_cnt / np.maximum(coal_opp, 1e-300)
    ne = 1.0 / (2.0 * np.maximum(rate, 1e-300))
    if cfg.use_cap:
        ne = np.minimum(ne, cfg.ne_cap)

    new_mig = demo.mig_rates
    if cfg.infer_migration and demo.num_populations > 1:
        mig_opp = np.asarray(stats.mig_opp, dtype=np.float64)
        mig_cnt = np.asarray(stats.mig_cnt, dtype=np.float64)
        new_mig = mig_cnt / np.maximum(mig_opp[:, :, None], 1e-300)
        for i in range(demo.num_populations):
            new_mig[:, i, i] = 0.0

    new_rho = demo.recombination_rate
    if cfg.infer_recomb:
        r_opp = float(np.sum(np.asarray(stats.recomb_opp, dtype=np.float64)))
        r_cnt = float(np.sum(np.asarray(stats.recomb_cnt, dtype=np.float64)))
        if r_opp > 0:
            new_rho = r_cnt / r_opp

    return demo.with_updated_rates(
        pop_sizes=ne, mig_rates=new_mig, recombination_rate=new_rho
    )


@dataclass
class EMResult:
    demos: list  # per-iteration models (post-update)
    stats: list  # per-iteration summed SuffStats
    stats_wt: list
    log_likelihoods: list
    out_text: list = field(default_factory=list)


def run_em(demo: Demography, seg: SegData, cfg: EMConfig) -> EMResult:
    """Full EM driver (model.py:1102-1184 + cli.py run sequence)."""
    from .segio import define_chunks

    result = EMResult(demos=[], stats=[], stats_wt=[], log_likelihoods=[])
    if cfg.outdir:
        os.makedirs(cfg.outdir, exist_ok=True)

    chunks = (
        [(c.start, c.end) for c in define_chunks(seg, cfg.chunks)]
        if cfg.chunks > 1
        else [(None, None)]
    )

    current = demo
    for it in range(cfg.em_iters + 1):
        per_chunk = [
            run_chunk(current, seg, cfg, chunk=ch, seed=cfg.seed + 1000 * it + ci)
            for ci, ch in enumerate(chunks)
        ]
        stats = sum_stats([pc[0] for pc in per_chunk])
        stats_wt = sum_stats([pc[1] for pc in per_chunk])
        logl = sum(pc[2] for pc in per_chunk)
        n_resample = sum(pc[3]["num_resamples"] for pc in per_chunk)

        text = outfmt.stats_to_out(
            it,
            current.change_times,
            stats,
            stats_wt,
            logl,
            cfg.num_particles,
            num_resamples=n_resample,
            sequence_len=float(seg.end),
        )
        result.out_text.append(text)
        if cfg.outdir:
            os.makedirs(os.path.join(cfg.outdir, f"emiter{it}"), exist_ok=True)
            with open(
                os.path.join(cfg.outdir, f"emiter{it}", "chunkfinal.out"), "w"
            ) as fh:
                fh.write(text)

        current = m_step(current, stats, cfg)
        result.demos.append(current)
        result.stats.append(stats)
        result.stats_wt.append(stats_wt)
        result.log_likelihoods.append(logl)

    if cfg.outdir:
        with open(os.path.join(cfg.outdir, "result.out"), "w") as fh:
            fh.write(result.out_text[0].split("\n")[0] + "\n")
            for it in range(len(result.out_text) - 1, -1, -1):
                fh.write("\n".join(result.out_text[it].split("\n")[1:]))
    return result
