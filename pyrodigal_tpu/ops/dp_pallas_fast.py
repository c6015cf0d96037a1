"""Optimized VMEM-resident DP kernel: one contig x B bins per launch.

Compared to `dp_pallas._dp_kernel`(_b):

* geometry is shared by all bins in the launch, so the (strand, type) case
  of node *i* is a **scalar** — each step runs exactly one of four lean
  predicated bodies (`pl.when`) instead of evaluating all four cases;
* geometry-only predicates (skip rules, coordinate guards) are computed at
  (1, WP) and only per-bin score terms at (B, WP);
* the per-case connection rules are pre-simplified: e.g. a forward-stop
  target only ever connects to same-frame forward starts and forward stops
  (reference: impl/generic.h:13-37 + _connection.h:143-202), so the
  six-rule skip mask collapses per case.

Semantics identical to dp_pallas (differentially tested).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._constants import OPER_DIST, MAX_OPP_OVLP, STOP
from .dp_pallas import precompute_tables_v2, _pad

NEGF = float(np.float32(-1e30))


def _dp_kernel_fast(  # noqa: C901
    # geometry, (1, NP) int32
    ndx_ref, sv_ref, kind_ref, frame_ref, winlo_ref, valid_ref,
    # per-bin, (B, NP)
    cs_ref, rsc_ref, usc_ref,
    opv10_ref, opv11_ref, opv12_ref,
    val30_ref, val31_ref, val32_ref,
    tsv0_ref, tsv1_ref, tsv2_ref,
    tndx0_ref, tndx1_ref, tndx2_ref,
    stwt_ref,
    _i0, _i1, _i2, _i3,
    score_ref, traceb_ref, ovmark_ref, tbndx_ref,
    *, W, NP, B,
):
    WP = W + 128
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, WP), 1)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, WP), 1)
    l128 = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
    l128_1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def colB(ref, ip):
        base = pl.multiple_of((ip // 128) * 128, 128)
        tile = ref[:, pl.ds(base, 128)]
        return jnp.sum(jnp.where(l128 == (ip - base), tile, 0), axis=1,
                       keepdims=True)

    def colG(ref, ip):
        base = pl.multiple_of((ip // 128) * 128, 128)
        tile = ref[0:1, pl.ds(base, 128)]
        return jnp.sum(jnp.where(l128_1 == (ip - base), tile, 0))

    def relax_update(ip, best, bestj, bestf, bestn):
        base = pl.multiple_of((ip // 128) * 128, 128)
        selc = l128 == (ip - base)
        cur = score_ref[:, pl.ds(base, 128)]
        cur_tb = traceb_ref[:, pl.ds(base, 128)]
        cur_ov = ovmark_ref[:, pl.ds(base, 128)]
        cur_tn = tbndx_ref[:, pl.ds(base, 128)]
        cur_col = jnp.sum(jnp.where(selc, cur, 0), axis=1)
        do = (best > jnp.float32(NEGF / 2)) & (best >= cur_col)
        doc = selc & do[:, None]
        score_ref[:, pl.ds(base, 128)] = jnp.where(doc, best[:, None], cur)
        traceb_ref[:, pl.ds(base, 128)] = jnp.where(doc, bestj[:, None], cur_tb)
        ovmark_ref[:, pl.ds(base, 128)] = jnp.where(doc, bestf[:, None], cur_ov)
        tbndx_ref[:, pl.ds(base, 128)] = jnp.where(doc, bestn[:, None], cur_tn)

    def pick_best(total, m, n1_ndx, al, carry):
        best, bestj, bestf, bestn = carry
        cmax = jnp.max(total, axis=1, keepdims=True)
        pick = jnp.max(jnp.where(total == cmax, lane, -1), axis=1,
                       keepdims=True)
        sel = lane == pick
        pickf = jnp.max(jnp.where(sel, m, -1), axis=1, keepdims=True)
        pickn = jnp.max(jnp.where(sel, jnp.broadcast_to(n1_ndx, (B, WP)), -1),
                        axis=1, keepdims=True)
        cmaxv = cmax[:, 0]
        upd = cmaxv > best
        return (jnp.where(upd, cmaxv, best),
                jnp.where(upd, al + pick[:, 0], bestj),
                jnp.where(upd, pickf[:, 0], bestf),
                jnp.where(upd, pickn[:, 0], bestn))

    def igm_geom(n1_ndx, n1_fwd_sign, i_ndx, st_wt):
        """distance/operon part of igm_same; (1,WP) x (B,1) -> (B,WP)."""
        dist = jnp.abs(n1_ndx - i_ndx)
        overlap = n1_ndx + 2 * n1_fwd_sign >= i_ndx
        far = dist > 3 * OPER_DIST
        operon = ((dist <= OPER_DIST) & ~overlap) | (dist * 4 < OPER_DIST)
        bonus = (2.0 - dist.astype(jnp.float32) / OPER_DIST) * 0.15 * st_wt
        return jnp.where(far, -0.15 * st_wt,
                         jnp.where(operon, bonus, jnp.float32(0.0)))

    def body(i, carry):
        ip = i + W
        valid_i = colG(valid_ref, ip)
        i_kind = colG(kind_ref, ip)
        i_ndx = colG(ndx_ref, ip)
        i_sv = colG(sv_ref, ip)
        i_fr = colG(frame_ref, ip)
        win_lo = colG(winlo_ref, ip) + W
        st_wt = stwt_ref[:, 0:1]
        n_chunks = jnp.maximum((ip - win_lo + W - 1) // W, 0)

        init = (
            jnp.full((B,), jnp.float32(NEGF), jnp.float32),
            jnp.full((B,), -1, jnp.int32),
            jnp.full((B,), -1, jnp.int32),
            jnp.full((B,), 0, jnp.int32),
        )

        def chunk_geom(c):
            lo = ip - (c + 1) * W
            hi = ip - c * W
            al = pl.multiple_of(jnp.maximum((lo // 128) * 128, 0), 128)
            sl = pl.ds(al, WP)
            jp1 = al + lane1
            inwin = (jp1 >= lo) & (jp1 < hi) & (jp1 >= win_lo) & (jp1 < ip)
            return al, sl, inwin

        # ------------------------------------------------------------------
        @pl.when((valid_i != 0) & (i_kind == 0))
        def _case_fwd_start():
            rsc_i = colB(rsc_ref, ip)
            usc_i = colB(usc_ref, ip)

            def chunk(c, carry):
                al, sl, inwin = chunk_geom(c)
                n1_ndx = ndx_ref[0:1, sl]
                n1_kind = kind_ref[0:1, sl]
                n1_tb = traceb_ref[:, sl]
                n1_score = score_ref[:, sl]
                ok_stop = inwin & (n1_kind == 1) & ((n1_ndx + 2) < i_ndx)
                ok_rst = inwin & (n1_kind == 2) & (n1_ndx < i_ndx)
                okg = ok_stop | ok_rst
                okm = okg & (n1_tb != -1)
                # igm: same-strand (n1 fwd stop) or flat diff (n1 rev start)
                n1_rsc = rsc_ref[:, sl]
                n1_usc = usc_ref[:, sl]
                adjacent = (n1_ndx + 2 == i_ndx) | (n1_ndx == i_ndx + 1)
                rval = jnp.where(
                    adjacent,
                    jnp.where(rsc_i < 0, -rsc_i, 0.0)
                    + jnp.where(usc_i < 0, -usc_i, 0.0),
                    0.0,
                )
                igm_s = rval + igm_geom(n1_ndx, 1, i_ndx, st_wt)
                sc = jnp.where(ok_stop, igm_s, jnp.float32(-0.15) * st_wt)
                total = jnp.where(okm, n1_score + sc, jnp.float32(NEGF))
                return pick_best(total, jnp.full((B, WP), -1, jnp.int32),
                                 n1_ndx, al, carry)

            best, bestj, bestf, bestn = jax.lax.fori_loop(
                0, n_chunks, chunk, init)
            relax_update(ip, best, bestj, bestf, bestn)

        # ------------------------------------------------------------------
        @pl.when((valid_i != 0) & (i_kind == 1))
        def _case_fwd_stop():
            opv_sel = [opv10_ref, opv11_ref, opv12_ref]

            def chunk(c, carry):
                al, sl, inwin = chunk_geom(c)
                n1_ndx = ndx_ref[0:1, sl]
                n1_kind = kind_ref[0:1, sl]
                n1_fr = frame_ref[0:1, sl]
                n1_tb = traceb_ref[:, sl]
                n1_score = score_ref[:, sl]
                n1_cs = cs_ref[:, sl]
                opv = jnp.where(
                    i_fr == 0, opv_sel[0][:, sl],
                    jnp.where(i_fr == 1, opv_sel[1][:, sl],
                              opv_sel[2][:, sl]))
                gene_ok = inwin & (i_sv < n1_ndx)
                ok_start = gene_ok & (n1_kind == 0) & (n1_fr == i_fr)
                ok_op = gene_ok & (n1_kind == 1) & (n1_tb != -1)
                sc = jnp.where(ok_start, n1_cs, opv)
                okm = ok_start | (ok_op & (opv > jnp.float32(NEGF / 2)))
                total = jnp.where(okm, n1_score + sc, jnp.float32(NEGF))
                return pick_best(total, jnp.full((B, WP), -1, jnp.int32),
                                 n1_ndx, al, carry)

            best, bestj, bestf, bestn = jax.lax.fori_loop(
                0, n_chunks, chunk, init)
            relax_update(ip, best, bestj, bestf, bestn)

        # ------------------------------------------------------------------
        @pl.when((valid_i != 0) & (i_kind == 2))
        def _case_rev_start():
            cs_i = colB(cs_ref, ip)

            def chunk(c, carry):
                al, sl, inwin = chunk_geom(c)
                n1_ndx = ndx_ref[0:1, sl]
                n1_sv = sv_ref[0:1, sl]
                n1_kind = kind_ref[0:1, sl]
                n1_fr = frame_ref[0:1, sl]
                n1_tb = traceb_ref[:, sl]
                n1_tbndx = tbndx_ref[:, sl]
                n1_score = score_ref[:, sl]
                ok_gene = (inwin & (n1_kind == 3) & (n1_fr == i_fr)
                           & (n1_sv > i_ndx))
                bnd = jnp.where(n1_tb == -1, 0, n1_tbndx)
                ovlp = (n1_ndx + 2) - (i_sv - 2) + 1
                ok_ov = (
                    inwin & (n1_kind == 1) & (n1_tb != -1)
                    & ((i_sv - 2) < (n1_ndx + 2))
                    & (ovlp < MAX_OPP_OVLP)
                    & ((n1_ndx - i_sv) < (i_ndx - n1_ndx + 3))
                    & ((n1_ndx - i_sv) < (i_sv - 3 - bnd))
                )
                sc = jnp.where(ok_ov, cs_i + jnp.float32(-0.15) * st_wt, cs_i)
                okm = ok_gene | ok_ov
                total = jnp.where(okm, n1_score + sc, jnp.float32(NEGF))
                return pick_best(total, jnp.full((B, WP), -1, jnp.int32),
                                 n1_ndx, al, carry)

            best, bestj, bestf, bestn = jax.lax.fori_loop(
                0, n_chunks, chunk, init)
            relax_update(ip, best, bestj, bestf, bestn)

        # ------------------------------------------------------------------
        @pl.when((valid_i != 0) & (i_kind == 3))
        def _case_rev_stop():
            rsc_i = colB(rsc_ref, ip)
            usc_i = colB(usc_ref, ip)
            v30 = colB(val30_ref, ip)
            v31 = colB(val31_ref, ip)
            v32 = colB(val32_ref, ip)
            sv30 = colB(tsv0_ref, ip)
            sv31 = colB(tsv1_ref, ip)
            sv32 = colB(tsv2_ref, ip)
            nd30 = colB(tndx0_ref, ip)
            nd31 = colB(tndx1_ref, ip)
            nd32 = colB(tndx2_ref, ip)

            def chunk(c, carry):
                al, sl, inwin = chunk_geom(c)
                n1_ndx = ndx_ref[0:1, sl]
                n1_sv = sv_ref[0:1, sl]
                n1_kind = kind_ref[0:1, sl]
                n1_fr = frame_ref[0:1, sl]
                n1_tb = traceb_ref[:, sl]
                n1_tbndx = tbndx_ref[:, sl]
                n1_score = score_ref[:, sl]
                n1_rsc = rsc_ref[:, sl]
                n1_usc = usc_ref[:, sl]
                artifact_free = n1_tb != -1

                left = n1_ndx + 2
                right = i_ndx - 2
                igm_d = jnp.float32(-0.15) * st_wt

                # n1 fwd stop: intergenic + possible f-r-r triple overlap
                bnd = jnp.where(n1_tb == -1, 0, n1_tbndx)
                bv = jnp.zeros((B, WP), jnp.float32)
                bf = jnp.full((B, WP), -1, jnp.int32)
                for k, (v_i, sv_i3, ndx_i3) in enumerate((
                    (v30, sv30, nd30), (v31, sv31, nd31), (v32, sv32, nd32),
                )):
                    o = left - sv_i3 + 3
                    vald = (
                        (ndx_i3 >= 0)
                        & (o > 0) & (o < MAX_OPP_OVLP)
                        & (o < ndx_i3 - left)
                        & (n1_tb != -1)
                        & (o < sv_i3 - bnd - 2)
                    )
                    better = vald & (v_i > bv)
                    bv = jnp.where(better, v_i, bv)
                    bf = jnp.where(better, k, bf)
                sc_f = jnp.where(bf != -1, bv, igm_d)
                ok_f = inwin & (n1_kind == 1) & artifact_free & (left < right)

                # n1 rev start: intergenic same-strand
                adjacent = (n1_ndx + 2 == i_ndx) | (n1_ndx == i_ndx + 1)
                rval = jnp.where(
                    adjacent,
                    jnp.where(n1_rsc < 0, -n1_rsc, 0.0)
                    + jnp.where(n1_usc < 0, -n1_usc, 0.0),
                    0.0,
                )
                igm_s = rval + igm_geom(n1_ndx, -1, i_ndx, st_wt)
                ok_r = (inwin & (n1_kind == 2) & artifact_free
                        & (n1_ndx < right))

                # n1 rev stop: operon via i's recorded starts (by n1 frame)
                v3 = jnp.where(n1_fr == 0, v30,
                               jnp.where(n1_fr == 1, v31, v32))
                nd3 = jnp.where(n1_fr == 0, nd30,
                                jnp.where(n1_fr == 1, nd31, nd32))
                ok_op = (inwin & (n1_kind == 3) & (n1_sv > i_ndx)
                         & (nd3 >= 0))

                sc = jnp.where(ok_f, sc_f, jnp.where(ok_r, igm_s, v3))
                m = jnp.where(ok_f, bf, -1)
                okm = ok_f | ok_r | ok_op
                total = jnp.where(okm, n1_score + sc, jnp.float32(NEGF))
                return pick_best(total, m, n1_ndx, al, carry)

            best, bestj, bestf, bestn = jax.lax.fori_loop(
                0, n_chunks, chunk, init)
            relax_update(ip, best, bestj, bestf, bestn)

        return 0

    jax.lax.fori_loop(0, NP - W - 128, body, 0)


@functools.partial(jax.jit, static_argnames=("W", "NP", "B", "interpret"))
def _run_kernel_fast(args, W, NP, B, interpret=False):
    kernel = functools.partial(_dp_kernel_fast, W=W, NP=NP, B=B)
    n_in = len(args)
    out_shapes = [
        jax.ShapeDtypeStruct((B, NP), jnp.float32),
        jax.ShapeDtypeStruct((B, NP), jnp.int32),
        jax.ShapeDtypeStruct((B, NP), jnp.int32),
        jax.ShapeDtypeStruct((B, NP), jnp.int32),
    ]
    init_shapes = [(B, NP)] * 4
    grid_spec = pl.GridSpec(
        grid=(1,),
        in_specs=(
            [pl.BlockSpec(a.shape, lambda i: tuple([0] * a.ndim),
                          memory_space=pltpu.VMEM)
             for a in args]
            + [pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
               for s in init_shapes]
        ),
        out_specs=[
            pl.BlockSpec(s.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for s in out_shapes
        ],
    )
    init_score = jnp.zeros((B, NP), jnp.float32)
    init_tb = jnp.full((B, NP), -1, jnp.int32)
    init_ov = jnp.full((B, NP), -1, jnp.int32)
    init_tn = jnp.zeros((B, NP), jnp.int32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases={n_in + 0: 0, n_in + 1: 1, n_in + 2: 2,
                              n_in + 3: 3},
        interpret=interpret,
    )(*args, init_score, init_tb, init_ov, init_tn)


def dp_pallas_fast(ndx, stop_val, typ, strand, cs, rscore, uscore, star_ptr,
                   win_lo, st_wt, W=1024, interpret=False,
                   return_device=False):
    """One contig (shared geometry) x B bins.  Same contract as
    dp_pallas.dp_pallas."""
    B, n = cs.shape
    NP = W + int(np.ceil(n / 128) * 128) + 128

    kind = (2 * (strand != 1) + (typ == STOP)).astype(np.int32)
    frame = (ndx % 3).astype(np.int32)
    valid = np.zeros(NP - W, dtype=np.int32)
    valid[:n] = 1
    win_lo_pad = np.arange(NP - W, dtype=np.int32)
    win_lo_pad[:n] = win_lo

    def padg(a, fill=0):
        a = np.pad(a.astype(np.int32), (0, NP - W - len(a)),
                   constant_values=fill)
        return _pad(a, W, value=fill)[None, :]

    def pad_bin(a, fill=0):
        a = np.pad(a, ((0, 0), (0, NP - W - a.shape[1])),
                   constant_values=fill)
        return _pad(a, W, value=fill)

    tabs = [
        precompute_tables_v2(
            ndx.astype(np.int64), stop_val.astype(np.int64),
            strand.astype(np.int64), cs[b].astype(np.float64),
            rscore[b].astype(np.float64), uscore[b].astype(np.float64),
            star_ptr[b], float(st_wt[b]),
        )
        for b in range(B)
    ]
    opv1 = np.stack([t[0] for t in tabs])
    opv1ok = np.stack([t[1] for t in tabs])
    val3 = np.stack([t[2] for t in tabs])
    t_sv = np.stack([t[3] for t in tabs])
    t_ndx = np.stack([t[4] for t in tabs])
    t_ok = np.stack([t[5] for t in tabs])
    # fold validity into sentinels: invalid operon -> NEG value / ndx -1
    opv1 = np.where(opv1ok != 0, opv1, np.float32(NEGF))
    t_ndx = np.where(t_ok != 0, t_ndx, -1)

    args = [
        jnp.asarray(padg(ndx)), jnp.asarray(padg(stop_val)),
        jnp.asarray(padg(kind)), jnp.asarray(padg(frame)),
        jnp.asarray(_pad(win_lo_pad, W)[None, :]),
        jnp.asarray(_pad(valid, W)[None, :]),
        jnp.asarray(pad_bin(cs.astype(np.float32))),
        jnp.asarray(pad_bin(rscore.astype(np.float32))),
        jnp.asarray(pad_bin(uscore.astype(np.float32))),
    ]
    for k in range(3):
        args.append(jnp.asarray(pad_bin(opv1[:, k, :], fill=NEGF)))
    for k in range(3):
        args.append(jnp.asarray(pad_bin(val3[:, k, :])))
    for k in range(3):
        args.append(jnp.asarray(pad_bin(t_sv[:, k, :].astype(np.int32))))
    for k in range(3):
        args.append(jnp.asarray(pad_bin(t_ndx[:, k, :].astype(np.int32),
                                        fill=-1)))
    args.append(jnp.asarray(np.tile(st_wt.astype(np.float32)[:, None],
                                    (1, NP))))

    score, traceb, ov, _ = _run_kernel_fast(tuple(args), W, NP, B, interpret)
    if return_device:
        return score[:, W:W + n], traceb[:, W:W + n], ov[:, W:W + n]
    score = np.asarray(score)[:, W:W + n]
    traceb = np.asarray(traceb)[:, W:W + n] - W
    traceb = np.where(traceb >= -1, traceb, -1)
    ov = np.asarray(ov)[:, W:W + n]
    return score, traceb, ov
