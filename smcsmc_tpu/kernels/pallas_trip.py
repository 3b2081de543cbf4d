"""Pallas TPU mega-kernel: one fused recombination-trip of the sweep.

One ``pallas_call`` replaces the ~100 XLA kernels of the inner while-loop
body for the common configuration (single population, no continuous
migration, no bias/guide/VB, no event recording, n <= 8 haplotypes): the
no-mutation weight update, recombination-point sampling, the SMC'
re-coalescence hazard inversion, opportunity/count recording, the SPR
topology update, tree-summary refresh, and the next-gap draw — all on
VMEM-resident blocks (SURVEY.md §7.1: "Pallas fusion of
extend+likelihood+weight update"; reference hot loop particle.cpp:743-918).

Everything is computed in particle-on-lanes layout ([N, BLK] after an
in-kernel transpose): per-node tensors put the tiny node axis on sublanes
and the particle block on the 128-lane axis, so each op uses full VPU
lanes; measured cost of a 50-op chain at [2048, 8] is ~1.4 us.

Randomness comes in as four pre-drawn uniforms per particle (one XLA
threefry call per trip, ~10 us at P=10k): one RNG system across both
paths, and the TPU-interpret tests exercise the kernel's full semantics
(the interpret-mode pltpu PRNG is a zero stub).

Semantics mirror kernels/transition.py ``_walk_fast`` + ``_apply_spr`` and
the surrounding body in smc.make_segment_step; tests/test_pallas_trip.py
pins the two paths against each other in interpret mode and
distributionally.

Status: correct and compiled-verified on the real v5e device, but OPT-IN
(PFConfig.use_pallas=True).  On the axon remote runtime one fused call
measures ~117 us/trip of device time (vs ~100 us for the XLA op chain it
replaces) plus operand-marshaling copies, making it net slower there —
the XLA hot path is already gather/scatter/sort-free.  Hard-won backend
findings are recorded inline: operands must all be particle-blocked
(any constant-index_map operand — SMEM or tiny VMEM — costs ~300 us per
call), bool selects/minor-dim inserts on i1 do not lower, cumsum and
scatter-add have no Mosaic lowering, and [1, E] -> [E, B] broadcasts hit
relayout bugs (route them through the aux columns instead).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 3e38  # python float: jnp constants would be captured tracers in the kernel


def _cumsum0(x):
    """Cumulative sum along axis 0 via a triangular masked sum (Mosaic has
    no cumsum primitive; the node axis is tiny).  The mask is built at 3-D
    directly — reshaping an i1 vector to add a minor dim is unsupported."""
    N, B = x.shape
    tri3 = (
        jax.lax.broadcasted_iota(jnp.int32, (N, N, B), 1)
        <= jax.lax.broadcasted_iota(jnp.int32, (N, N, B), 0)
    )  # tri3[i, j, :] = j <= i
    return jnp.sum(jnp.where(tri3, x[None, :, :], jnp.zeros_like(x)[None]),
                   axis=1)


def _first_true_oh(mask):
    """[N, B] bool -> one-hot of the first true row per column (all-false
    columns give all-false)."""
    cum = _cumsum0(mask.astype(jnp.int32))
    return mask & (cum == 1)


def _idx_of(oh, N):
    """one-hot [N, B] -> index [B] (i32); -1 if all false."""
    idx = jnp.sum(
        jnp.where(oh, jax.lax.broadcasted_iota(jnp.int32, oh.shape, 0), 0),
        axis=0,
    )
    return jnp.where(jnp.any(oh, axis=0), idx, -1)


def _oh_of(idx, N, B):
    """index [B] -> one-hot [N, B]."""
    return jax.lax.broadcasted_iota(jnp.int32, (N, B), 0) == idx[None, :]


def _pick(arr, oh):
    """[N, B] values x [N, B] one-hot -> [B]."""
    return jnp.sum(jnp.where(oh, arr, jnp.zeros_like(arr)), axis=0)


def _trip_kernel(
    # VMEM inputs — NOTE: every operand is particle-blocked and advances
    # with the grid.  Aux data (scalars, epoch vectors) is EMBEDDED in the
    # aux operand's extra columns: on this backend any operand whose block
    # does not advance with the grid (constant index_map, SMEM or tiny
    # VMEM) costs ~300 us per pallas_call in re-fetch overhead.
    aux_ref,  # [BLK, W]: cols 0-3 uniforms; 4-7 (L, mu, rho, leaf_status);
    # 8..8+E estart; +E eend; +2E inv2ne; then n has_data flags
    time_ref, parent_ref, c0_ref, c1_ref,  # [BLK, N]
    nr_ref, upd_ref, lw_ref, tl_ref, b_ref,  # [BLK]
    tle_ref,  # [BLK, E]
    pend_ref,  # [BLK, 6E]
    # outputs
    time_o, parent_o, c0_o, c1_o, nr_o, upd_o, lw_o, tl_o, b_o, tle_o,
    pend_o,
    *, N: int, E: int, BLK: int,
):
    """All epoch math is vectorized over a merged (epoch x node) axis so the
    kernel contains NO scalar reads inside loops — per-element SMEM/VMEM
    scalar loads cost ~microseconds each in Mosaic and dominated an earlier
    formulation (~350 us/trip; this one runs ~10 us)."""
    n = (N + 1) // 2
    EN = E * N
    aux = aux_ref[:].T  # [W, B]
    u = jnp.clip(aux[0:4], 1e-7, 1.0 - 1e-7)  # [4, B]
    u_pt = u[0]
    u_exp = u[1]
    u_tgt = u[2]
    u_gap = u[3]

    L = aux[4]  # [B] vectors (replicated values; vector ops throughout)
    mu = aux[5]
    rho = aux[6]
    leaf_status = aux[7]

    tB = time_ref[:].T  # [N, B]
    par = parent_ref[:].T
    ch0 = c0_ref[:].T
    ch1 = c1_ref[:].T
    # per-particle scalars travel as [BLK, 1] blocks (1-D blocks would
    # constrain BLK to multiples of 128, which P=10000 etc. cannot satisfy)
    next_rec = nr_ref[:].T[0]
    upd = upd_ref[:].T[0]
    log_w = lw_ref[:].T[0]
    tl = tl_ref[:].T[0]
    B_len = b_ref[:].T[0]
    tle = tle_ref[:].T  # [E, B]
    pend = pend_ref[:].T  # [6E, B]
    est2 = aux[8:8 + E]  # [E, B]
    eend2 = aux[8 + E:8 + 2 * E]  # epoch ends, INF-capped
    i2n2 = aux[8 + 2 * E:8 + 3 * E]

    active = next_rec < L  # [B]
    delta = jnp.where(active, next_rec - upd, 0.0)

    # ---- extension: no-mutation likelihood + recombination opportunity ---
    log_w = log_w - mu * B_len * delta
    recomb_opp_add = delta[None, :] * tle  # [E, B]

    # ---- recombination point: uniform on the local tree ------------------
    oh_par = par[:, None, :] == jax.lax.broadcasted_iota(
        jnp.int32, (N, N, BLK), 1
    )  # [N(child), N(parent), B]
    pt = jnp.sum(jnp.where(oh_par, tB[None, :, :], 0.0), axis=1)
    pt = jnp.where(par < 0, INF, pt)
    bl = jnp.where(par < 0, 0.0, pt - tB)  # [N, B]
    cum = _cumsum0(bl)  # [N, B]
    total = cum[N - 1]
    x_pt = u_pt * total
    # x_pt = u * total with u < 1 and cum[N-1] == total, so a first-true row
    # always exists (bool select_n does not lower in Mosaic anyway)
    c_oh = _first_true_oh(cum >= x_pt[None, :])
    c_idx = _idx_of(c_oh, N)
    prev = _pick(cum, c_oh) - _pick(bl, c_oh)
    h_r = _pick(tB, c_oh) + (x_pt - prev)

    # ---- hazard inversion over the merged (epoch x node) axis ------------
    # lam(v) = sum_{e,b} inv2ne_e * |branch_b ∩ epoch_e ∩ [h_r, v]|
    def en(x_eb):  # [E, B] -> [EN, B] (repeat each epoch row N times)
        return jnp.broadcast_to(
            x_eb[:, None, :], (E, N, BLK)
        ).reshape(EN, BLK)

    def nb(x_nb):  # [N, B] -> [EN, B] (tile across epochs)
        return jnp.broadcast_to(
            x_nb[None, :, :], (E, N, BLK)
        ).reshape(EN, BLK)

    lo_en = jnp.maximum(nb(tB), jnp.maximum(en(est2), h_r[None, :]))
    hi_en = jnp.minimum(nb(pt), en(eend2))
    w_en = en(i2n2)
    x_exp = -jnp.log1p(-u_exp)
    V = N + E
    vcand = jnp.concatenate([tB, est2], axis=0)  # [V, B]
    ov_v = jnp.clip(
        jnp.minimum(hi_en[None, :, :], vcand[:, None, :]) - lo_en[None, :, :],
        0.0, None,
    )  # [V, EN, B]
    lam_v = jnp.sum(ov_v * w_en[None, :, :], axis=1)  # [V, B]
    t_lo = jnp.max(jnp.where(lam_v <= x_exp[None, :], vcand, -INF), axis=0)
    t_lo = jnp.maximum(t_lo, h_r)
    lam_lo = jnp.sum(
        jnp.clip(jnp.minimum(hi_en, t_lo[None, :]) - lo_en, 0.0, None)
        * w_en,
        axis=0,
    )
    in_e_lo = (t_lo[None, :] >= est2) & (t_lo[None, :] < eend2)  # [E, B]
    inv2ne_lo = jnp.sum(jnp.where(in_e_lo, i2n2, 0.0), axis=0)
    k_lo = jnp.sum(
        ((tB <= t_lo[None, :]) & (t_lo[None, :] < pt)).astype(jnp.float32),
        axis=0,
    )
    rate_lo = k_lo * inv2ne_lo
    t_c = t_lo + jnp.where(
        rate_lo > 0, (x_exp - lam_lo) / jnp.maximum(rate_lo, 1e-30), INF
    )
    t_c = jnp.minimum(t_c, jnp.float32(0.99 * INF))

    # ---- coalescence target ---------------------------------------------
    cross = (tB <= t_c[None, :]) & (t_c[None, :] < pt)  # [N, B]
    kc = jnp.sum(cross.astype(jnp.float32), axis=0)
    r = jnp.floor(u_tgt * jnp.maximum(kc, 1.0)).astype(jnp.int32)
    csum = _cumsum0(cross.astype(jnp.int32)) - 1
    d_oh = (csum == r[None, :]) & cross
    d_idx = _idx_of(d_oh, N)

    # ---- opportunity / count records ------------------------------------
    # pending layout (Pp=1): [coal_opp E | coal_cnt E | mig_opp E |
    #                          mig_cnt E | recomb_opp E | recomb_cnt E]
    actf = active.astype(jnp.float32)
    ov_c = jnp.clip(
        jnp.minimum(hi_en, t_c[None, :]) - lo_en, 0.0, None
    ).reshape(E, N, BLK)
    coal_opp_add = actf[None, :] * jnp.sum(ov_c, axis=1)  # [E, B]
    span_e = jnp.clip(
        jnp.minimum(eend2, t_c[None, :]) - jnp.maximum(est2, h_r[None, :]),
        0.0, None,
    )
    mig_opp_add = actf[None, :] * span_e
    in_e_c = (t_c[None, :] >= est2) & (t_c[None, :] < eend2)
    in_e_r = (h_r[None, :] >= est2) & (h_r[None, :] < eend2)
    coal_cnt_add = actf[None, :] * in_e_c.astype(jnp.float32)
    recomb_cnt_add = actf[None, :] * in_e_r.astype(jnp.float32)
    pend = pend + jnp.concatenate(
        [
            coal_opp_add,
            coal_cnt_add,
            mig_opp_add,
            jnp.zeros((E, BLK)),
            recomb_opp_add,
            recomb_cnt_add,
        ],
        axis=0,
    )

    # ---- SPR (one-hot index algebra; transition.py _apply_spr) -----------
    p_idx = _pick(par, c_oh)  # parent of c (c is never the root)
    p_oh = _oh_of(p_idx, N, BLK)
    sib0 = _pick(ch0, p_oh)
    sib1 = _pick(ch1, p_oh)
    o_idx = jnp.where(sib0 == c_idx, sib1, sib0)
    o_oh = _oh_of(o_idx, N, BLK)
    g_idx = _pick(par, p_oh)
    noop = d_idx == c_idx
    d_eff = jnp.where(d_idx == p_idx, o_idx, d_idx)
    deff_oh = _oh_of(d_eff, N, BLK)
    gp = jnp.where(d_eff == o_idx, g_idx, _pick(par, deff_oh))

    new_par = jnp.where(o_oh, g_idx[None, :], par)
    new_par = jnp.where(deff_oh, p_idx[None, :], new_par)
    new_par = jnp.where(p_oh, gp[None, :], new_par)
    g_oh = _oh_of(g_idx, N, BLK)
    gp_oh = _oh_of(gp, N, BLK)
    new_c0 = jnp.where(g_oh & (ch0 == p_idx[None, :]), o_idx[None, :], ch0)
    new_c1 = jnp.where(g_oh & (ch1 == p_idx[None, :]), o_idx[None, :], ch1)
    new_c0 = jnp.where(p_oh, c_idx[None, :], new_c0)
    new_c1 = jnp.where(p_oh, d_eff[None, :], new_c1)
    new_c0 = jnp.where(gp_oh & (new_c0 == d_eff[None, :]), p_idx[None, :],
                       new_c0)
    new_c1 = jnp.where(gp_oh & (new_c1 == d_eff[None, :]), p_idx[None, :],
                       new_c1)
    new_time = jnp.where(p_oh, t_c[None, :], tB)

    chg = active & ~noop  # particles whose tree actually changed
    par2 = jnp.where(chg[None, :], new_par, par)
    ch0_2 = jnp.where(chg[None, :], new_c0, ch0)
    ch1_2 = jnp.where(chg[None, :], new_c1, ch1)
    t2 = jnp.where(chg[None, :], new_time, tB)

    # ---- refreshed tree summaries ---------------------------------------
    oh_par2 = par2[:, None, :] == jax.lax.broadcasted_iota(
        jnp.int32, (N, N, BLK), 1
    )
    pt2 = jnp.sum(jnp.where(oh_par2, t2[None, :, :], 0.0), axis=1)
    pt2 = jnp.where(par2 < 0, INF, pt2)
    bl2 = jnp.where(par2 < 0, 0.0, pt2 - t2)
    valid2 = (par2 >= 0).astype(jnp.float32)
    ov2_en = jnp.clip(
        jnp.minimum(nb(pt2), en(eend2)) - jnp.maximum(nb(t2), en(est2)),
        0.0, None,
    ) * nb(valid2)  # [EN, B]
    # per-epoch reduction as a tiny MXU matmul (reshape(E,N,B)+sum hits a
    # Mosaic relayout bug): sel[e, en] = 1 iff en belongs to epoch e
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (E, EN), 1) // N
        == jax.lax.broadcasted_iota(jnp.int32, (E, EN), 0)
    ).astype(jnp.float32)
    tle2 = jnp.dot(sel, ov2_en, preferred_element_type=jnp.float32)  # [E, B]
    tl2 = jnp.sum(ov2_en, axis=0)
    # data branch length by leaf_status: -1 -> 0; 1 -> tl; 0 -> informative
    # branches only (>= 1 and < total data leaves below), via batched
    # ancestor chains over all leaves at once
    hd = aux[8 + 3 * E:8 + 3 * E + n]  # [n, B]
    total_data = jnp.sum(hd, axis=0)  # [B]
    cur_oh = jax.lax.broadcasted_iota(
        jnp.int32, (n, N, BLK), 1
    ) == jax.lax.broadcasted_iota(jnp.int32, (n, N, BLK), 0)  # leaf l -> l
    cnt = jnp.zeros((N, BLK))
    for _ in range(n):
        cnt = cnt + jnp.sum(
            jnp.where(cur_oh, hd[:, None, :], 0.0), axis=0
        )
        nxt = jnp.sum(jnp.where(cur_oh, par2[None, :, :], 0), axis=1)  # [n,B]
        cur_oh = (
            jax.lax.broadcasted_iota(jnp.int32, (n, N, BLK), 1)
            == nxt[:, None, :]
        ) & (nxt >= 0)[:, None, :]
    informative = (cnt >= 1.0) & (cnt < total_data[None, :])
    B_mixed = jnp.sum(jnp.where(informative, bl2, 0.0), axis=0)
    B2 = jnp.where(
        leaf_status == 1.0, tl2,
        jnp.where(leaf_status == -1.0, jnp.zeros_like(tl2), B_mixed),
    )

    tl_out = jnp.where(active, tl2, tl)
    B_out = jnp.where(active, B2, B_len)

    # ---- next recombination gap -----------------------------------------
    gap = -jnp.log1p(-u_gap) / jnp.maximum(rho * tl_out, 1e-30)
    upd_out = jnp.where(active, next_rec, upd)
    nr_out = jnp.where(active, next_rec + gap, next_rec)

    # ---- write back (inactive particles keep their state) ----------------
    keep = active[None, :]
    time_o[:] = jnp.where(keep, t2, tB).T
    parent_o[:] = jnp.where(keep, par2, par).T
    c0_o[:] = jnp.where(keep, ch0_2, ch0).T
    c1_o[:] = jnp.where(keep, ch1_2, ch1).T
    nr_o[:] = nr_out[:, None]
    upd_o[:] = upd_out[:, None]
    lw_o[:] = log_w[:, None]
    tl_o[:] = tl_out[:, None]
    b_o[:] = B_out[:, None]
    # row-major arithmetic mix: a select mixing the transposed input tle
    # with the computed tle2 hits a Mosaic relayout bug, and adding a minor
    # dim to a bool is unsupported — blend with f32 instead
    actf2 = active.astype(jnp.float32)[:, None]  # [BLK, 1]
    tle_o[:] = actf2 * tle2.T + (1.0 - actf2) * tle_ref[:]
    pend_o[:] = pend.T


@functools.partial(
    jax.jit,
    static_argnames=("N", "E", "BLK", "interpret"),
)
def fused_trip(
    uniforms, leaf_status,
    time, parent, child0, child1,
    next_rec, upd, log_w, tl, B,
    tl_e, pending,
    L, mu, rho, epoch_start, inv2ne, has_data,
    *, N: int, E: int, BLK: int = 1024, interpret: bool = False,
):
    """One fused recombination trip over the whole population.

    All array args are [P, ...]; P must be a multiple of BLK.  Returns the
    updated (time, parent, child0, child1, next_rec, upd, log_w, tl, B,
    tl_e, pending).
    """
    P = time.shape[0]
    assert P % BLK == 0, (P, BLK)
    grid = (P // BLK,)
    n_leaves = has_data.shape[0]
    W = 8 + 3 * E + n_leaves
    # aux block: uniforms + all scalars/epoch vectors replicated per row —
    # every operand must be particle-blocked (see kernel docstring)
    row_const = jnp.concatenate(
        [
            jnp.stack([
                jnp.asarray(L, jnp.float32), jnp.asarray(mu, jnp.float32),
                jnp.asarray(rho, jnp.float32),
                jnp.asarray(leaf_status, jnp.float32),
            ]),
            jnp.asarray(epoch_start, jnp.float32),
            jnp.concatenate(
                [jnp.asarray(epoch_start, jnp.float32)[1:],
                 jnp.full((1,), jnp.float32(INF))]
            ),
            jnp.asarray(inv2ne, jnp.float32),
            has_data.astype(jnp.float32),
        ]
    )  # [W - 4]
    aux = jnp.concatenate(
        [uniforms, jnp.broadcast_to(row_const[None, :], (P, W - 4))], axis=1
    )  # [P, W]

    def bspec(cols=1):
        return pl.BlockSpec((BLK, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    K = pending.shape[1]
    kernel = functools.partial(_trip_kernel, N=N, E=E, BLK=BLK)
    grid_spec = pl.GridSpec(
        grid=grid,
        in_specs=[
            bspec(W),
            bspec(N), bspec(N), bspec(N), bspec(N),
            bspec(), bspec(), bspec(), bspec(), bspec(),
            bspec(E), bspec(K),
        ],
        out_specs=[
            bspec(N), bspec(N), bspec(N), bspec(N),
            bspec(), bspec(), bspec(), bspec(), bspec(),
            bspec(E), bspec(K),
        ],
    )
    out_shapes = [
        jax.ShapeDtypeStruct(time.shape, time.dtype),
        jax.ShapeDtypeStruct(parent.shape, parent.dtype),
        jax.ShapeDtypeStruct(child0.shape, child0.dtype),
        jax.ShapeDtypeStruct(child1.shape, child1.dtype),
        jax.ShapeDtypeStruct((P, 1), jnp.float32),
        jax.ShapeDtypeStruct((P, 1), jnp.float32),
        jax.ShapeDtypeStruct((P, 1), jnp.float32),
        jax.ShapeDtypeStruct((P, 1), jnp.float32),
        jax.ShapeDtypeStruct((P, 1), jnp.float32),
        jax.ShapeDtypeStruct(tl_e.shape, tl_e.dtype),
        jax.ShapeDtypeStruct(pending.shape, pending.dtype),
    ]
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        # the TPU-semantics interpreter (supports pltpu.prng_* etc.), used
        # for CPU-side tests; compiled Mosaic on the real device
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        aux,
        time, parent, child0, child1,
        next_rec.astype(jnp.float32)[:, None],
        upd.astype(jnp.float32)[:, None],
        log_w.astype(jnp.float32)[:, None],
        tl.astype(jnp.float32)[:, None],
        B.astype(jnp.float32)[:, None],
        tl_e, pending,
    )
    return (
        out[0], out[1], out[2], out[3],
        out[4][:, 0], out[5][:, 0], out[6][:, 0], out[7][:, 0],
        out[8][:, 0], out[9], out[10],
    )
