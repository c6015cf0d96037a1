"""The gene-path dynamic program as a batched `lax.scan`.

Semantics follow the reference connection scoring exactly
(reference: _connection.h:94-408, lib.pyx:1205-1311): for each node *i*,
relax over a bounded window of predecessor nodes with a branch-free
formulation of the four (strand, type) connection cases, the six
skip-connection rules, the intergenic modifiers, and the `>=`/last-winner
tie rule.  The node index is the scan carry (scores/traceback update in
sequence); contigs × metagenomic bins form the batch axis.

Final-mode (prediction) scoring only; the training-mode DP runs in the C
engine (it is a one-shot per genome).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .._constants import MAX_NODE_DIST, OPER_DIST, MAX_OPP_OVLP, STOP

NEG = jnp.float32(-1e30)


def window_starts(ndx, stop_val, typ, strand):
    """Host-side precompute of each node's DP window start
    (reference: lib.pyx:1221-1233 incl. the giant-ORF extension)."""
    nn = len(ndx)
    idx = np.arange(nn)
    min0 = np.maximum(idx - MAX_NODE_DIST, 0)
    ext = (
        ((strand == -1) & (typ != STOP)) | ((strand == 1) & (typ == STOP))
    ) & (ndx[min0] > stop_val)
    # find the largest index whose ndx equals stop_val (the paired stop);
    # nodes are sorted by ndx so a binary search gives the match
    pos = np.searchsorted(ndx, stop_val, side="right") - 1
    matched = (pos >= 0) & (ndx[np.clip(pos, 0, nn - 1)] == stop_val)
    target = np.where(matched, np.clip(pos, 0, nn - 1), 0)
    m = np.where(ext, target, min0)
    return np.maximum(m - MAX_NODE_DIST, 0).astype(np.int32)


def _igm_same(ndx1, strand1, rscore1, uscore1, ndx2, rscore2, uscore2, st_wt):
    """(reference: _connection.h:52-78)"""
    dist = jnp.abs(ndx1 - ndx2)
    overlap = ndx1 + 2 * strand1 >= ndx2
    adjacent = (ndx1 + 2 == ndx2) | (ndx1 == ndx2 + 1)
    fwd = strand1 == 1
    r_n = jnp.where(fwd, rscore2, rscore1)
    u_n = jnp.where(fwd, uscore2, uscore1)
    rval = jnp.where(
        adjacent,
        jnp.where(r_n < 0, -r_n, 0.0) + jnp.where(u_n < 0, -u_n, 0.0),
        0.0,
    )
    far = dist > 3 * OPER_DIST
    operon = ((dist <= OPER_DIST) & ~overlap) | (dist * 4 < OPER_DIST)
    bonus = (2.0 - dist.astype(jnp.float32) / OPER_DIST) * 0.15 * st_wt
    return rval + jnp.where(far, -0.15 * st_wt, jnp.where(operon, bonus, 0.0))


def make_dp_step(W):
    """Build the scan step for window size W.  All per-node tensors are
    closed over; the carry is (score, traceb, ov_mark)."""

    def step(carry, i, *, ndx, stop_val, typ, strand, cs, rscore, uscore,
             star_ptr, win_lo, valid, st_wt):
        score, traceb, ov_mark = carry

        nn = ndx.shape[0]
        js = i - 1 - jnp.arange(W, dtype=jnp.int32)
        in_win = (js >= win_lo[i]) & (js >= 0)
        jc = jnp.clip(js, 0, nn - 1)

        n1_ndx = ndx[jc]
        n1_sv = stop_val[jc]
        n1_ty = typ[jc]
        n1_st = strand[jc]
        n1_cs = cs[jc]
        n1_r = rscore[jc]
        n1_u = uscore[jc]
        n1_score = score[jc]
        n1_tb = traceb[jc]

        i_ndx = ndx[i]
        i_sv = stop_val[i]
        i_ty = typ[i]
        i_st = strand[i]
        i_fr = i_ndx % 3

        f1_stop = (n1_st == 1) & (n1_ty == STOP)
        f1_start = (n1_st == 1) & (n1_ty != STOP)
        r1_stop = (n1_st == -1) & (n1_ty == STOP)
        r1_start = (n1_st == -1) & (n1_ty != STOP)

        # --- skip rules (reference: impl/generic.h:13-37) -------------------
        n1f = n1_ndx % 3
        skip = (
            ((n1_ty != STOP) & (i_ty != STOP) & (n1_st == i_st))
            | ((n1_st == 1) & (n1_ty != STOP) & (i_st != 1))
            | ((n1_st != 1) & (n1_ty == STOP) & (i_st == 1))
            | ((n1_st != 1) & (n1_ty != STOP) & (i_st == 1) & (i_ty == STOP))
            | ((n1_st == i_st) & (n1_st == 1) & (n1_ty != STOP)
               & (i_ty == STOP) & (n1f != i_fr))
            | ((n1_st == i_st) & (n1_st != 1) & (n1_ty == STOP)
               & (i_ty != STOP) & (n1f != i_fr))
        )
        # edge artifact (reference: _connection.h:110-114)
        artifact = (n1_tb == -1) & (f1_stop | r1_start)
        ok = in_win & ~skip & ~artifact

        igm_j_i = _igm_same(n1_ndx, n1_st, n1_r, n1_u,
                            i_ndx, rscore[i], uscore[i], st_wt)
        igm_diff = jnp.float32(-0.15) * st_wt

        # --- case 0: i is a forward start (intergenic) ----------------------
        c0_fstop_ok = (n1_ndx + 2) < i_ndx
        c0_rstart_ok = n1_ndx < i_ndx
        c0_score = jnp.where(f1_stop, igm_j_i, igm_diff)
        c0_ok = jnp.where(f1_stop, c0_fstop_ok, c0_rstart_ok)
        cand0 = jnp.where(ok & c0_ok, c0_score, NEG)
        mfr0 = jnp.full((W,), -1, dtype=jnp.int32)

        # --- case 1: i is a forward stop (gene / operon) --------------------
        c1_gene_ok = i_sv < n1_ndx
        c1_gene_score = n1_cs
        sp = star_ptr[jc, i_fr]
        spc = jnp.clip(sp, 0, nn - 1)
        c1_op_ok = (i_sv < n1_ndx) & (sp != -1)
        c1_op_score = cs[spc] + _igm_same(
            n1_ndx, n1_st, n1_r, n1_u, ndx[spc], rscore[spc], uscore[spc], st_wt
        )
        cand1 = jnp.where(
            ok & jnp.where(f1_start, c1_gene_ok, c1_op_ok),
            jnp.where(f1_start, c1_gene_score, c1_op_score),
            NEG,
        )

        # --- case 2: i is a reverse start (gene / opposite-strand overlap) --
        c2_gene_ok = n1_sv > i_ndx
        c2_gene_score = cs[i]
        ovlp = (n1_ndx + 2) - (i_sv - 2) + 1
        bnd = jnp.where(n1_tb == -1, 0, ndx[jnp.clip(n1_tb, 0, nn - 1)])
        c2_ov_ok = (
            ((i_sv - 2) < (n1_ndx + 2))
            & (ovlp < MAX_OPP_OVLP)
            & ((n1_ndx - i_sv) < (i_ndx - n1_ndx + 3))
            & ((n1_ndx - i_sv) < (i_sv - 3 - bnd))
        )
        c2_ov_score = cs[i] + igm_diff
        cand2 = jnp.where(
            ok & jnp.where(r1_stop, c2_gene_ok, c2_ov_ok),
            jnp.where(r1_stop, c2_gene_score, c2_ov_score),
            NEG,
        )

        # --- case 3: i is a reverse stop (intergenic / triple / operon) -----
        left = n1_ndx + 2
        right = i_ndx - 2
        c3_int_ok = left < right
        # triple overlap f-r-r via i's three recorded overlapping starts
        # (reference: _connection.h:299-334)
        def triple(k):
            n3 = star_ptr[i, k]
            n3c = jnp.clip(n3, 0, nn - 1)
            o = left - stop_val[n3c] + 3
            vald = (
                (n3 != -1)
                & (o > 0) & (o < MAX_OPP_OVLP)
                & (o < ndx[n3c] - left)
                & (n1_tb != -1)
                & (o < stop_val[n3c] - bnd - 2)
            )
            curval = cs[n3c] + _igm_same(
                ndx[n3c], strand[n3c], rscore[n3c], uscore[n3c],
                i_ndx, rscore[i], uscore[i], st_wt,
            )
            return vald, curval

        v0, s0 = triple(0)
        v1, s1 = triple(1)
        v2, s2 = triple(2)
        # pick the max curval > 0 among valid frames (strict >, first wins on
        # ties as in the sequential reference loop)
        best_val = jnp.full((W,), 0.0, dtype=jnp.float32)
        best_fr = jnp.full((W,), -1, dtype=jnp.int32)
        for k, (vk, sk) in enumerate(((v0, s0), (v1, s1), (v2, s2))):
            better = vk & (sk > best_val)
            best_val = jnp.where(better, sk, best_val)
            best_fr = jnp.where(better, k, best_fr)
        c3_f_score = jnp.where(best_fr != -1, best_val, igm_diff)
        c3_f_ok = c3_int_ok

        c3_rstart_ok = n1_ndx < right
        c3_rstart_score = igm_j_i

        spi = star_ptr[i, n1f]
        spic = jnp.clip(spi, 0, nn - 1)
        c3_op_ok = (n1_sv > i_ndx) & (spi != -1)
        c3_op_score = cs[spic] + _igm_same(
            ndx[spic], strand[spic], rscore[spic], uscore[spic],
            i_ndx, rscore[i], uscore[i], st_wt,
        )
        c3_score = jnp.where(f1_stop, c3_f_score,
                             jnp.where(r1_start, c3_rstart_score, c3_op_score))
        c3_okm = jnp.where(f1_stop, c3_f_ok,
                           jnp.where(r1_start, c3_rstart_ok, c3_op_ok))
        cand3 = jnp.where(ok & c3_okm, c3_score, NEG)
        mfr3 = jnp.where(f1_stop, best_fr, -1)

        # --- select the case of node i --------------------------------------
        kind = 2 * (i_st != 1).astype(jnp.int32) + (i_ty == STOP).astype(jnp.int32)
        cand = jnp.select(
            [kind == 0, kind == 1, kind == 2], [cand0, cand1, cand2], cand3
        )
        mfr = jnp.where(kind == 3, mfr3, -1)

        # --- relaxation: total = score[j] + cand; last max wins, update if
        # >= current (reference: _connection.h:135-139) ----------------------
        total = jnp.where(cand > NEG / 2, n1_score + cand, NEG)
        best = jnp.max(total)
        # smallest arange position among maxima = largest j (js descending)
        w_iota = jnp.arange(W)
        pick = jnp.min(jnp.where(total == best, w_iota, W))
        pick = jnp.clip(pick, 0, W - 1)
        j_best = jc[pick]
        do = valid[i] & (best > NEG / 2) & (best >= score[i])
        score = score.at[i].set(jnp.where(do, best, score[i]))
        traceb = traceb.at[i].set(jnp.where(do, j_best, traceb[i]))
        ov_mark = ov_mark.at[i].set(
            jnp.where(do, mfr[pick].astype(jnp.int8), ov_mark[i])
        )
        return (score, traceb, ov_mark), None

    return step


@functools.partial(jax.jit, static_argnames=("W",))
def dp_scores(ndx, stop_val, typ, strand, cs, rscore, uscore, star_ptr,
              win_lo, valid, st_wt, W):
    """Run the forward DP for one (contig, bin); returns (score, traceb,
    ov_mark) arrays.  vmap over a leading axis for batching."""
    nn = ndx.shape[0]
    step = make_dp_step(W)

    def body(carry, i):
        return step(
            carry, i, ndx=ndx, stop_val=stop_val, typ=typ, strand=strand,
            cs=cs, rscore=rscore, uscore=uscore, star_ptr=star_ptr,
            win_lo=win_lo, valid=valid, st_wt=st_wt,
        )

    init = (
        jnp.zeros(nn, jnp.float32),
        jnp.full(nn, -1, jnp.int32),
        jnp.full(nn, -1, jnp.int8),
    )
    (score, traceb, ov_mark), _ = jax.lax.scan(
        body, init, jnp.arange(nn, dtype=jnp.int32)
    )
    return score, traceb, ov_mark
