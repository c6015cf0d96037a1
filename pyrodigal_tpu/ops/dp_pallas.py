"""The gene-path dynamic program as a single VMEM-resident Pallas kernel.

Design (see also dp_jax.py for the reference scan formulation):

* the whole node tensor set for one contig x B metagenomic bins lives in
  VMEM (struct-of-arrays, bins on the sublane axis), the node loop is a
  `fori_loop` *inside* the kernel -- no per-step dispatch or HBM traffic;
* every predecessor access is a contiguous dynamic *slice* `[i-W, i)` --
  the star-pointer operon/triple-overlap gathers of the reference
  (reference: _connection.h:180-357) are folded into precomputed (B, N)
  tables, and the one remaining data-dependent gather (`ndx[traceb[j]]`)
  is eliminated by carrying a `tb_ndx` shadow array updated alongside the
  traceback;
* arrays are front-padded by W so window slices never clamp, and the
  giant-ORF window extension (reference: lib.pyx:1221-1233) becomes an
  inner chunk loop with a data-dependent trip count (almost always 1).

Numerics are float32; the final gene set is validated against the exact
float64 C engine by the differential tests.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._constants import MAX_NODE_DIST, OPER_DIST, MAX_OPP_OVLP, STOP

NEG = np.float32(-1e30)
NEGF = float(np.float32(-1e30))


# --------------------------------------------------------------------------
# host/JAX-side precomputation of the star-pointer tables
# --------------------------------------------------------------------------

def _igm_same_np(ndx1, strand1, rsc1, usc1, ndx2, rsc2, usc2, st_wt):
    """Vectorized intergenic modifier (reference: _connection.h:52-78)."""
    dist = np.abs(ndx1 - ndx2)
    overlap = ndx1 + 2 * strand1 >= ndx2
    adjacent = (ndx1 + 2 == ndx2) | (ndx1 == ndx2 + 1)
    fwd = strand1 == 1
    r_n = np.where(fwd, rsc2, rsc1)
    u_n = np.where(fwd, usc2, usc1)
    rval = np.where(
        adjacent,
        np.where(r_n < 0, -r_n, 0.0) + np.where(u_n < 0, -u_n, 0.0),
        0.0,
    )
    far = dist > 3 * OPER_DIST
    operon = ((dist <= OPER_DIST) & ~overlap) | (dist * 4 < OPER_DIST)
    bonus = (2.0 - dist.astype(np.float64) / OPER_DIST) * 0.15 * st_wt
    return rval + np.where(far, -0.15 * st_wt, np.where(operon, bonus, 0.0))


def precompute_tables_v2(ndx, stop_val, strand, cs, rscore, uscore,
                         star_ptr, st_wt):
    n = len(ndx)
    opv1 = np.zeros((3, n), dtype=np.float32)
    opv1_ok = np.zeros((3, n), dtype=np.int32)
    val3 = np.zeros((3, n), dtype=np.float32)
    t_sv = np.zeros((3, n), dtype=np.int32)
    t_ndx = np.zeros((3, n), dtype=np.int32)
    t_ok = np.zeros((3, n), dtype=np.int32)
    for k in range(3):
        sp = star_ptr[:, k]
        okm = sp != -1
        spc = np.clip(sp, 0, n - 1)
        igm_j_n3 = _igm_same_np(
            ndx, strand, rscore, uscore,
            ndx[spc], rscore[spc], uscore[spc], st_wt,
        )
        opv1[k] = (cs[spc] + igm_j_n3).astype(np.float32)
        opv1_ok[k] = okm
        igm_n3_i = _igm_same_np(
            ndx[spc], strand[spc], rscore[spc], uscore[spc],
            ndx, rscore, uscore, st_wt,
        )
        val3[k] = (cs[spc] + igm_n3_i).astype(np.float32)
        t_sv[k] = np.where(okm, stop_val[spc], 0)
        t_ndx[k] = np.where(okm, ndx[spc], 0)
        t_ok[k] = okm
    return opv1, opv1_ok, val3, t_sv, t_ndx, t_ok


# --------------------------------------------------------------------------
# the kernel
# --------------------------------------------------------------------------

def _dp_kernel(  # noqa: C901 - one kernel, intentionally monolithic
    # geometry, shape (1, NP) int32
    ndx_ref, sv_ref, kind_ref, frame_ref, strand_ref, winlo_ref, valid_ref,
    # per-bin tensors, shape (B, NP) f32 / i32
    cs_ref, rsc_ref, usc_ref,
    opv10_ref, opv11_ref, opv12_ref, opv1ok0_ref, opv1ok1_ref, opv1ok2_ref,
    val30_ref, val31_ref, val32_ref,
    tsv0_ref, tsv1_ref, tsv2_ref,
    tndx0_ref, tndx1_ref, tndx2_ref,
    tok0_ref, tok1_ref, tok2_ref,
    stwt_ref,
    # aliased initial values (unused; the outputs alias them)
    _i0, _i1, _i2, _i3,
    # outputs, shape (B, NP)
    score_ref, traceb_ref, ovmark_ref, tbndx_ref,
    *, W, NP, B,
):
    # Mosaic constraint: lane-dimension slice offsets must be 128-aligned,
    # so every window load is widened to WP = W + 128 lanes at an aligned
    # base and masked; dynamic per-column scalar reads go through an
    # aligned 128-lane tile + one-hot reduction.
    WP = W + 128
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, WP), 1)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, WP), 1)
    l128 = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
    l128_1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def colB(ref, ip):
        """(B,) column ip of a (B, NP) ref."""
        base = pl.multiple_of((ip // 128) * 128, 128)
        tile = ref[:, pl.ds(base, 128)]
        sel = l128 == (ip - base)
        return jnp.sum(jnp.where(sel, tile, 0), axis=1, keepdims=True)

    def colG(ref, ip):
        """scalar at column ip of a (1, NP) geometry ref."""
        base = pl.multiple_of((ip // 128) * 128, 128)
        tile = ref[0:1, pl.ds(base, 128)]
        sel = l128_1 == (ip - base)
        return jnp.sum(jnp.where(sel, tile, 0))

    def igm_same(ndx1, strand1, rsc1, usc1, ndx2, rsc2, usc2, st_wt):
        dist = jnp.abs(ndx1 - ndx2)
        overlap = ndx1 + 2 * strand1 >= ndx2
        adjacent = (ndx1 + 2 == ndx2) | (ndx1 == ndx2 + 1)
        fwd = strand1 == 1
        r_n = jnp.where(fwd, rsc2, rsc1)
        u_n = jnp.where(fwd, usc2, usc1)
        rval = jnp.where(
            adjacent,
            jnp.where(r_n < 0, -r_n, 0.0) + jnp.where(u_n < 0, -u_n, 0.0),
            0.0,
        )
        far = dist > 3 * OPER_DIST
        operon = ((dist <= OPER_DIST) & ~overlap) | (dist * 4 < OPER_DIST)
        bonus = (2.0 - dist.astype(jnp.float32) / OPER_DIST) * 0.15 * st_wt
        return rval + jnp.where(far, -0.15 * st_wt, jnp.where(operon, bonus, 0.0))

    def body(i, carry):
        ip = i + W  # physical index (front-padded by W)
        valid_i = colG(valid_ref, ip)

        @pl.when(valid_i != 0)
        def _():
            i_ndx = colG(ndx_ref, ip)
            i_sv = colG(sv_ref, ip)
            i_kind = colG(kind_ref, ip)
            i_fr = colG(frame_ref, ip)
            win_lo = colG(winlo_ref, ip) + W  # physical
            st_wt = stwt_ref[:, 0:1]          # (B,1)

            cs_i = colB(cs_ref, ip)
            rsc_i = colB(rsc_ref, ip)
            usc_i = colB(usc_ref, ip)

            n_chunks = (ip - win_lo + W - 1) // W
            n_chunks = jnp.maximum(n_chunks, 0)

            def chunk_body(c, carry):
                best, bestj, bestf, bestn = carry
                lo = ip - (c + 1) * W          # logical chunk window start
                hi = ip - c * W
                al = pl.multiple_of((lo // 128) * 128, 128)
                sl = pl.ds(al, WP)
                jp = al + lane                  # physical j per lane
                jp1 = al + lane1

                bb = lambda a: jnp.broadcast_to(a, (B, WP))
                n1_ndx = bb(ndx_ref[0:1, sl])
                n1_sv = bb(sv_ref[0:1, sl])
                n1_kind = bb(kind_ref[0:1, sl])
                n1_fr = bb(frame_ref[0:1, sl])
                n1_strand = bb(strand_ref[0:1, sl])
                n1_valid = bb(valid_ref[0:1, sl])
                n1_cs = cs_ref[:, sl]
                n1_rsc = rsc_ref[:, sl]
                n1_usc = usc_ref[:, sl]
                n1_score = score_ref[:, sl]
                n1_tb = traceb_ref[:, sl]
                n1_tbndx = tbndx_ref[:, sl]

                okm = ((jp >= lo) & (jp < hi) & (jp >= win_lo) & (jp < ip)
                       & (n1_valid != 0))

                f1_stop = n1_kind == 1
                f1_start = n1_kind == 0
                r1_stop = n1_kind == 3
                r1_start = n1_kind == 2

                # skip rules (reference: impl/generic.h:13-37)
                i_is_stop = (i_kind == 1) | (i_kind == 3)
                i_fwd = i_kind < 2
                n1_is_stop = f1_stop | r1_stop
                n1_fwd = n1_kind < 2
                skip = (
                    (~n1_is_stop & ~i_is_stop & (n1_fwd == i_fwd))
                    | (n1_fwd & ~n1_is_stop & ~i_fwd)
                    | (~n1_fwd & n1_is_stop & i_fwd)
                    | (~n1_fwd & ~n1_is_stop & i_fwd & i_is_stop)
                    | ((n1_fwd == i_fwd) & n1_fwd & ~n1_is_stop & i_is_stop
                       & (n1_fr != i_fr))
                    | ((n1_fwd == i_fwd) & ~n1_fwd & n1_is_stop & ~i_is_stop
                       & (n1_fr != i_fr))
                )
                artifact = (n1_tb == -1) & (f1_stop | r1_start)
                okm = okm & ~skip & ~artifact

                igm_j_i = igm_same(
                    n1_ndx, n1_strand, n1_rsc, n1_usc,
                    i_ndx, rsc_i, usc_i, st_wt,
                )
                igm_diff = jnp.float32(-0.15) * st_wt
                mfr = jnp.full((B, WP), -1, dtype=jnp.int32)

                def case_fwd_start():
                    c_ok = ((f1_stop & ((n1_ndx + 2) < i_ndx))
                            | (~f1_stop & (n1_ndx < i_ndx)))
                    sc = jnp.where(f1_stop, igm_j_i, igm_diff)
                    return jnp.where(okm & c_ok, sc, jnp.float32(NEGF)), mfr

                def case_fwd_stop():
                    gene_ok = i_sv < n1_ndx
                    opv = jnp.where(
                        i_fr == 0, opv10_ref[:, sl],
                        jnp.where(i_fr == 1, opv11_ref[:, sl],
                                  opv12_ref[:, sl]))
                    opok = jnp.where(
                        i_fr == 0, opv1ok0_ref[:, sl],
                        jnp.where(i_fr == 1, opv1ok1_ref[:, sl],
                                  opv1ok2_ref[:, sl]))
                    c_ok = ((f1_start & gene_ok)
                            | (~f1_start & gene_ok & (opok != 0)))
                    sc = jnp.where(f1_start, n1_cs, opv)
                    return jnp.where(okm & c_ok, sc, jnp.float32(NEGF)), mfr

                def case_rev_start():
                    gene_ok = n1_sv > i_ndx
                    ovlp = (n1_ndx + 2) - (i_sv - 2) + 1
                    bnd = jnp.where(n1_tb == -1, 0, n1_tbndx)
                    ov_ok = (
                        ((i_sv - 2) < (n1_ndx + 2))
                        & (ovlp < MAX_OPP_OVLP)
                        & ((n1_ndx - i_sv) < (i_ndx - n1_ndx + 3))
                        & ((n1_ndx - i_sv) < (i_sv - 3 - bnd))
                    )
                    c_ok = (r1_stop & gene_ok) | (~r1_stop & ov_ok)
                    sc = jnp.where(r1_stop, cs_i + 0 * igm_diff,
                                   cs_i + igm_diff)
                    return jnp.where(okm & c_ok, sc, jnp.float32(NEGF)), mfr

                def case_rev_stop():
                    left = n1_ndx + 2
                    right = i_ndx - 2
                    int_ok = left < right
                    bnd = jnp.where(n1_tb == -1, 0, n1_tbndx)
                    bv = jnp.zeros((B, WP), jnp.float32)
                    bf = jnp.full((B, WP), -1, jnp.int32)
                    for k, (vr, svr, ndr, okr) in enumerate((
                        (val30_ref, tsv0_ref, tndx0_ref, tok0_ref),
                        (val31_ref, tsv1_ref, tndx1_ref, tok1_ref),
                        (val32_ref, tsv2_ref, tndx2_ref, tok2_ref),
                    )):
                        v_i = colB(vr, ip)
                        sv_i3 = colB(svr, ip)
                        ndx_i3 = colB(ndr, ip)
                        ok_i3 = colB(okr, ip)
                        o = left - sv_i3 + 3
                        vald = (
                            (ok_i3 != 0)
                            & (o > 0) & (o < MAX_OPP_OVLP)
                            & (o < ndx_i3 - left)
                            & (n1_tb != -1)
                            & (o < sv_i3 - bnd - 2)
                        )
                        better = vald & (v_i > bv)
                        bv = jnp.where(better, v_i, bv)
                        bf = jnp.where(better, k, bf)
                    f_sc = jnp.where(bf != -1, bv, igm_diff)
                    rstart_sc = igm_j_i
                    v30 = colB(val30_ref, ip)
                    v31 = colB(val31_ref, ip)
                    v32 = colB(val32_ref, ip)
                    o30 = colB(tok0_ref, ip)
                    o31 = colB(tok1_ref, ip)
                    o32 = colB(tok2_ref, ip)
                    v3 = jnp.where(n1_fr == 0, v30,
                                   jnp.where(n1_fr == 1, v31, v32))
                    ok3 = jnp.where(n1_fr == 0, o30,
                                    jnp.where(n1_fr == 1, o31, o32))
                    op_ok = (n1_sv > i_ndx) & (ok3 != 0)
                    sc = jnp.where(f1_stop, f_sc,
                                   jnp.where(r1_start, rstart_sc, v3))
                    c_ok = ((f1_stop & int_ok)
                            | (r1_start & (n1_ndx < right))
                            | (~f1_stop & ~r1_start & op_ok))
                    m = jnp.where(f1_stop, bf, -1)
                    return jnp.where(okm & c_ok, sc, jnp.float32(NEGF)), m

                cand0, m0 = case_fwd_start()
                cand1, m1 = case_fwd_stop()
                cand2, m2 = case_rev_start()
                cand3, m3 = case_rev_stop()
                cand = jnp.where(i_kind == 0, cand0,
                                 jnp.where(i_kind == 1, cand1,
                                           jnp.where(i_kind == 2, cand2,
                                                     cand3)))
                m = jnp.where(i_kind == 3, m3, -1)

                total = jnp.where(cand > jnp.float32(NEGF / 2),
                                  n1_score + cand, jnp.float32(NEGF))
                cmax = jnp.max(total, axis=1, keepdims=True)
                is_max = total == cmax
                pick = jnp.max(jnp.where(is_max, lane, -1), axis=1,
                               keepdims=True)
                sel = lane == pick
                pickf = jnp.max(jnp.where(sel, m, -1), axis=1, keepdims=True)
                pickn = jnp.max(jnp.where(sel, n1_ndx, -1), axis=1,
                                keepdims=True)
                cmaxv = cmax[:, 0]
                upd = cmaxv > best
                bestj = jnp.where(upd, al + pick[:, 0], bestj)
                bestf = jnp.where(upd, pickf[:, 0], bestf)
                bestn = jnp.where(upd, pickn[:, 0], bestn)
                best = jnp.where(upd, cmaxv, best)
                return best, bestj, bestf, bestn

            init = (
                jnp.full((B,), jnp.float32(NEGF), jnp.float32),
                jnp.full((B,), -1, jnp.int32),
                jnp.full((B,), -1, jnp.int32),
                jnp.full((B,), 0, jnp.int32),
            )
            best, bestj, bestf, bestn = jax.lax.fori_loop(
                0, n_chunks, chunk_body, init)

            # write back: one-hot masked update of column ip
            base = pl.multiple_of((ip // 128) * 128, 128)
            selc = l128 == (ip - base)
            cur = score_ref[:, pl.ds(base, 128)]
            cur_tb = traceb_ref[:, pl.ds(base, 128)]
            cur_ov = ovmark_ref[:, pl.ds(base, 128)]
            cur_tn = tbndx_ref[:, pl.ds(base, 128)]
            cur_col = jnp.sum(jnp.where(selc, cur, 0), axis=1)
            do = (best > jnp.float32(NEGF / 2)) & (best >= cur_col)
            doc = selc & do[:, None]
            score_ref[:, pl.ds(base, 128)] = jnp.where(
                doc, best[:, None], cur)
            traceb_ref[:, pl.ds(base, 128)] = jnp.where(
                doc, bestj[:, None], cur_tb)
            ovmark_ref[:, pl.ds(base, 128)] = jnp.where(
                doc, bestf[:, None], cur_ov)
            tbndx_ref[:, pl.ds(base, 128)] = jnp.where(
                doc, bestn[:, None], cur_tn)

        return 0

    jax.lax.fori_loop(0, NP - W - 128, body, 0)


def _pad(a, W, value=0, axis=-1):
    pad_width = [(0, 0)] * a.ndim
    pad_width[axis] = (W, 0)
    return np.pad(a, pad_width, constant_values=value)


@functools.partial(jax.jit, static_argnames=("W", "NP", "B", "interpret"))
def _run_kernel(args, W, NP, B, interpret=False):
    kernel = functools.partial(_dp_kernel, W=W, NP=NP, B=B)
    n_in = len(args)
    out_shapes = [
        jax.ShapeDtypeStruct((B, NP), jnp.float32),   # score
        jax.ShapeDtypeStruct((B, NP), jnp.int32),     # traceb
        jax.ShapeDtypeStruct((B, NP), jnp.int32),     # ovmark
        jax.ShapeDtypeStruct((B, NP), jnp.int32),     # tbndx
    ]
    init_shapes = [(B, NP)] * 4
    grid_spec = pl.GridSpec(
        grid=(1,),
        in_specs=(
            [pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
             for a in args]
            + [pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
               for s in init_shapes]
        ),
        out_specs=[
            pl.BlockSpec(s.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for s in out_shapes
        ],
    )
    # initial outputs: score 0, traceb -1, ovmark -1, tbndx 0
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


def dp_pallas(ndx, stop_val, typ, strand, cs, rscore, uscore, star_ptr,
              win_lo, st_wt, W=1024, interpret=False):
    """Run the Pallas DP for one contig over B bins.

    Parameters are numpy arrays: geometry of shape (n,), per-bin tensors of
    shape (B, n) (cs/rscore/uscore), star_ptr (B, n, 3), st_wt (B,).
    Returns (score, traceb, ov_mark) of shape (B, n).
    """
    B, n = cs.shape
    NP = W + int(np.ceil(n / 128) * 128) + 128

    kind = (2 * (strand != 1) + (typ == STOP)).astype(np.int32)
    frame = (ndx % 3).astype(np.int32)
    valid = np.zeros(NP - W, dtype=np.int32)
    valid[:n] = 1

    geo = {
        "ndx": ndx, "sv": stop_val, "kind": kind, "frame": frame,
        "strand": strand.astype(np.int32), "winlo": win_lo,
    }
    geo_padded = {
        k: _pad(np.pad(v.astype(np.int32), (0, NP - W - n)), W)[None, :]
        for k, v in geo.items()
    }
    geo_padded["valid"] = _pad(np.pad(valid, (0, 0)), W)[None, :]

    def pad_bin(a, fill=0):
        a = np.pad(a, ((0, 0), (0, NP - W - n)), constant_values=fill)
        return _pad(a, W, value=fill)

    tables = [
        precompute_tables_v2(
            ndx.astype(np.int64), stop_val.astype(np.int64),
            strand.astype(np.int64), cs[b].astype(np.float64),
            rscore[b].astype(np.float64), uscore[b].astype(np.float64),
            star_ptr[b], float(st_wt[b]),
        )
        for b in range(B)
    ]
    opv1 = np.stack([t[0] for t in tables])      # (B,3,n)
    opv1ok = np.stack([t[1] for t in tables])
    val3 = np.stack([t[2] for t in tables])
    t_sv = np.stack([t[3] for t in tables])
    t_ndx = np.stack([t[4] for t in tables])
    t_ok = np.stack([t[5] for t in tables])

    args = [
        jnp.asarray(geo_padded["ndx"]), jnp.asarray(geo_padded["sv"]),
        jnp.asarray(geo_padded["kind"]), jnp.asarray(geo_padded["frame"]),
        jnp.asarray(geo_padded["strand"]), jnp.asarray(geo_padded["winlo"]),
        jnp.asarray(geo_padded["valid"]),
        jnp.asarray(pad_bin(cs.astype(np.float32))),
        jnp.asarray(pad_bin(rscore.astype(np.float32))),
        jnp.asarray(pad_bin(uscore.astype(np.float32))),
    ]
    for k in range(3):
        args.append(jnp.asarray(pad_bin(opv1[:, k, :])))
    for k in range(3):
        args.append(jnp.asarray(pad_bin(opv1ok[:, k, :].astype(np.int32))))
    for k in range(3):
        args.append(jnp.asarray(pad_bin(val3[:, k, :])))
    for k in range(3):
        args.append(jnp.asarray(pad_bin(t_sv[:, k, :].astype(np.int32))))
    for k in range(3):
        args.append(jnp.asarray(pad_bin(t_ndx[:, k, :].astype(np.int32))))
    for k in range(3):
        args.append(jnp.asarray(pad_bin(t_ok[:, k, :].astype(np.int32))))
    args.append(jnp.asarray(np.tile(st_wt.astype(np.float32)[:, None], (1, NP))))

    score, traceb, ov, _tbndx = _run_kernel(tuple(args), W, NP, B, interpret)
    score = np.asarray(score)[:, W:W + n]
    traceb = np.asarray(traceb)[:, W:W + n] - W
    traceb = np.where(traceb >= -1, traceb, -1)
    ov = np.asarray(ov)[:, W:W + n]
    return score, traceb, ov


# --------------------------------------------------------------------------
# fully batched variant: geometry per batch element (mixed contigs x bins)
# --------------------------------------------------------------------------

def _dp_kernel_b(  # noqa: C901
    # nmax: (n_blocks,) SMEM scalar-prefetch — per-block max valid node
    # count (indexed by program_id)
    nmax_ref,
    # all tensors shape (B, NP)
    ndx_ref, sv_ref, kind_ref, winlo_ref,
    cs_ref, rsc_ref, usc_ref,
    opv10_ref, opv11_ref, opv12_ref,
    val30_ref, val31_ref, val32_ref,
    tsv0_ref, tsv1_ref, tsv2_ref,
    tndx0_ref, tndx1_ref, tndx2_ref,
    stwt_ref,
    score_ref, traceb_ref, ovmark_ref, tbndx_ref,
    *, W, NP, B, MAX_CHUNKS,
):
    """Like _dp_kernel but every per-i scalar is a (B, 1) vector, so one
    launch sweeps a heterogeneous batch of (contig, bin) work items.
    Outputs are self-initialized so the kernel can run as one block of a
    larger grid (node scores start at 0, reference: lib.pyx:2496).

    The operand set is trimmed to fit wider blocks in VMEM: kind 4 marks
    padding (valid == kind != 4), strand and frame derive from kind / ndx
    in-kernel, and the star tables carry validity sentinels (opv1 / val3 =
    NEGF, t_sv = -10^9) instead of separate ok arrays."""
    score_ref[...] = jnp.zeros((B, NP), jnp.float32)
    traceb_ref[...] = jnp.full((B, NP), -1, jnp.int32)
    ovmark_ref[...] = jnp.full((B, NP), -1, jnp.int32)
    tbndx_ref[...] = jnp.zeros((B, NP), jnp.int32)
    WP = W + 128
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, WP), 1)
    l128 = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)

    def colB(ref, ip):
        base = pl.multiple_of((ip // 128) * 128, 128)
        tile = ref[:, pl.ds(base, 128)]
        sel = l128 == (ip - base)
        return jnp.sum(jnp.where(sel, tile, 0), axis=1, keepdims=True)

    def igm_same(ndx1, strand1, rsc1, usc1, ndx2, rsc2, usc2, st_wt):
        dist = jnp.abs(ndx1 - ndx2)
        overlap = ndx1 + 2 * strand1 >= ndx2
        adjacent = (ndx1 + 2 == ndx2) | (ndx1 == ndx2 + 1)
        fwd = strand1 == 1
        r_n = jnp.where(fwd, rsc2, rsc1)
        u_n = jnp.where(fwd, usc2, usc1)
        rval = jnp.where(
            adjacent,
            jnp.where(r_n < 0, -r_n, 0.0) + jnp.where(u_n < 0, -u_n, 0.0),
            0.0,
        )
        far = dist > 3 * OPER_DIST
        operon = ((dist <= OPER_DIST) & ~overlap) | (dist * 4 < OPER_DIST)
        bonus = (2.0 - dist.astype(jnp.float32) / OPER_DIST) * 0.15 * st_wt
        return rval + jnp.where(far, -0.15 * st_wt,
                                jnp.where(operon, bonus, 0.0))

    def body(i, carry):
        ip = i + W

        i_ndx = colB(ndx_ref, ip)
        i_sv = colB(sv_ref, ip)
        i_kind = colB(kind_ref, ip)
        i_valid = i_kind != 4                   # (B,1) bool
        i_fr = i_ndx - (i_ndx // 3) * 3
        win_lo = colB(winlo_ref, ip) + W        # physical, (B,1)
        st_wt = stwt_ref[:, 0:1]

        cs_i = colB(cs_ref, ip)
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

        i_is_stop = (i_kind == 1) | (i_kind == 3)
        i_fwd = i_kind < 2

        def chunk_body(c, carry):
            best, bestj, bestf, bestn = carry
            lo = ip - (c + 1) * W
            hi = ip - c * W
            al = pl.multiple_of((lo // 128) * 128, 128)
            al = jnp.maximum(al, 0)
            al = pl.multiple_of(al, 128)
            sl = pl.ds(al, WP)
            jp = al + lane

            n1_ndx = ndx_ref[:, sl]
            n1_sv = sv_ref[:, sl]
            n1_kind = kind_ref[:, sl]
            n1_fr = n1_ndx - (n1_ndx // 3) * 3
            n1_cs = cs_ref[:, sl]
            n1_rsc = rsc_ref[:, sl]
            n1_usc = usc_ref[:, sl]
            n1_score = score_ref[:, sl]
            n1_tb = traceb_ref[:, sl]
            n1_tbndx = tbndx_ref[:, sl]

            okm = ((jp >= lo) & (jp < hi) & (jp >= win_lo) & (jp < ip)
                   & (n1_kind != 4) & i_valid)

            f1_stop = n1_kind == 1
            f1_start = n1_kind == 0
            r1_stop = n1_kind == 3
            r1_start = n1_kind == 2
            n1_is_stop = f1_stop | r1_stop
            n1_fwd = n1_kind < 2
            n1_strand = jnp.where(n1_fwd, 1, -1)
            skip = (
                (~n1_is_stop & ~i_is_stop & (n1_fwd == i_fwd))
                | (n1_fwd & ~n1_is_stop & ~i_fwd)
                | (~n1_fwd & n1_is_stop & i_fwd)
                | (~n1_fwd & ~n1_is_stop & i_fwd & i_is_stop)
                | ((n1_fwd == i_fwd) & n1_fwd & ~n1_is_stop & i_is_stop
                   & (n1_fr != i_fr))
                | ((n1_fwd == i_fwd) & ~n1_fwd & n1_is_stop & ~i_is_stop
                   & (n1_fr != i_fr))
            )
            artifact = (n1_tb == -1) & (f1_stop | r1_start)
            okm = okm & ~skip & ~artifact

            igm_j_i = igm_same(n1_ndx, n1_strand, n1_rsc, n1_usc,
                               i_ndx, rsc_i, usc_i, st_wt)
            igm_diff = jnp.float32(-0.15) * st_wt

            # case 0: i fwd start
            ok0 = ((f1_stop & ((n1_ndx + 2) < i_ndx))
                   | (~f1_stop & (n1_ndx < i_ndx)))
            sc0 = jnp.where(f1_stop, igm_j_i, igm_diff)

            # case 1: i fwd stop
            gene_ok = i_sv < n1_ndx
            opv = jnp.where(
                i_fr == 0, opv10_ref[:, sl],
                jnp.where(i_fr == 1, opv11_ref[:, sl], opv12_ref[:, sl]))
            ok1 = gene_ok
            sc1 = jnp.where(f1_start, n1_cs, opv)

            # case 2: i rev start
            bnd = jnp.where(n1_tb == -1, 0, n1_tbndx)
            ovlp = (n1_ndx + 2) - (i_sv - 2) + 1
            ov_ok = (
                ((i_sv - 2) < (n1_ndx + 2))
                & (ovlp < MAX_OPP_OVLP)
                & ((n1_ndx - i_sv) < (i_ndx - n1_ndx + 3))
                & ((n1_ndx - i_sv) < (i_sv - 3 - bnd))
            )
            ok2 = (r1_stop & (n1_sv > i_ndx)) | (~r1_stop & ov_ok)
            sc2 = jnp.where(r1_stop, cs_i + 0 * igm_diff, cs_i + igm_diff)

            # case 3: i rev stop
            left = n1_ndx + 2
            right = i_ndx - 2
            int_ok = left < right
            bv = jnp.zeros((B, WP), jnp.float32)
            bf = jnp.full((B, WP), -1, jnp.int32)
            for k, (v_i, sv_i3, ndx_i3) in enumerate((
                (v30, sv30, nd30), (v31, sv31, nd31), (v32, sv32, nd32),
            )):
                o = left - sv_i3 + 3
                vald = (
                    (o > 0) & (o < MAX_OPP_OVLP)
                    & (o < ndx_i3 - left)
                    & (n1_tb != -1)
                    & (o < sv_i3 - bnd - 2)
                )
                better = vald & (v_i > bv)
                bv = jnp.where(better, v_i, bv)
                bf = jnp.where(better, k, bf)
            f_sc = jnp.where(bf != -1, bv, igm_diff)
            v3 = jnp.where(n1_fr == 0, v30, jnp.where(n1_fr == 1, v31, v32))
            op_ok = n1_sv > i_ndx
            sc3 = jnp.where(f1_stop, f_sc, jnp.where(r1_start, igm_j_i, v3))
            ok3 = ((f1_stop & int_ok)
                   | (r1_start & (n1_ndx < right))
                   | (~f1_stop & ~r1_start & op_ok))
            m3 = jnp.where(f1_stop, bf, -1)

            cand = jnp.where(
                i_kind == 0, jnp.where(okm & ok0, sc0, jnp.float32(NEGF)),
                jnp.where(
                    i_kind == 1, jnp.where(okm & ok1, sc1, jnp.float32(NEGF)),
                    jnp.where(
                        i_kind == 2,
                        jnp.where(okm & ok2, sc2, jnp.float32(NEGF)),
                        jnp.where(okm & ok3, sc3, jnp.float32(NEGF)))))
            m = jnp.where(i_kind == 3, m3, -1)

            total = jnp.where(cand > jnp.float32(NEGF / 2),
                              n1_score + cand, jnp.float32(NEGF))
            cmax = jnp.max(total, axis=1, keepdims=True)
            is_max = total == cmax
            pick = jnp.max(jnp.where(is_max, lane, -1), axis=1, keepdims=True)
            sel = lane == pick
            pickf = jnp.max(jnp.where(sel, m, -1), axis=1, keepdims=True)
            pickn = jnp.max(jnp.where(sel, n1_ndx, -1), axis=1, keepdims=True)
            cmaxv = cmax[:, 0]
            upd = cmaxv > best
            bestj = jnp.where(upd, al + pick[:, 0], bestj)
            bestf = jnp.where(upd, pickf[:, 0], bestf)
            bestn = jnp.where(upd, pickn[:, 0], bestn)
            best = jnp.where(upd, cmaxv, best)
            return best, bestj, bestf, bestn

        carry4 = (
            jnp.full((B,), jnp.float32(NEGF), jnp.float32),
            jnp.full((B,), -1, jnp.int32),
            jnp.full((B,), -1, jnp.int32),
            jnp.full((B,), 0, jnp.int32),
        )
        # data-dependent trip count: almost every i needs a single chunk
        # (the giant-ORF window extension is rare), so the loop bound is
        # the batch-wide max — clamped to the compile-time budget.
        ext = jnp.max(jnp.where(i_valid != 0, ip - win_lo, 1))
        n_chunks = jnp.clip((ext + W - 1) // W, 1, MAX_CHUNKS)
        carry4 = jax.lax.fori_loop(0, n_chunks, chunk_body, carry4)
        best, bestj, bestf, bestn = carry4

        base = pl.multiple_of((ip // 128) * 128, 128)
        selc = l128 == (ip - base)
        cur = score_ref[:, pl.ds(base, 128)]
        cur_tb = traceb_ref[:, pl.ds(base, 128)]
        cur_ov = ovmark_ref[:, pl.ds(base, 128)]
        cur_tn = tbndx_ref[:, pl.ds(base, 128)]
        cur_col = jnp.sum(jnp.where(selc, cur, 0), axis=1)
        do = ((best > jnp.float32(NEGF / 2)) & (best >= cur_col)
              & i_valid[:, 0])
        doc = selc & do[:, None]
        score_ref[:, pl.ds(base, 128)] = jnp.where(doc, best[:, None], cur)
        traceb_ref[:, pl.ds(base, 128)] = jnp.where(doc, bestj[:, None], cur_tb)
        ovmark_ref[:, pl.ds(base, 128)] = jnp.where(doc, bestf[:, None], cur_ov)
        tbndx_ref[:, pl.ds(base, 128)] = jnp.where(doc, bestn[:, None], cur_tn)
        return 0

    # dynamic trip count: the padded node axis is NP - W - 128 wide, but
    # only the first max(nn) columns of this block hold real nodes
    nmax = nmax_ref[pl.program_id(0)]
    jax.lax.fori_loop(0, jnp.minimum(nmax, NP - W - 128), body, 0)


def _run_kernel_b(args, nmax, W, NP, BT, BLK, MAX_CHUNKS, interpret=False):
    """Grid-blocked launch: operands are (BT, NP); the grid walks blocks of
    BLK items, each DP'd fully in VMEM while Pallas double-buffers the next
    block's DMA.  One launch therefore sweeps BT = many-blocks work items
    with a single dispatch."""
    kernel = functools.partial(_dp_kernel_b, W=W, NP=NP, B=BLK,
                               MAX_CHUNKS=MAX_CHUNKS)
    out_shapes = [
        jax.ShapeDtypeStruct((BT, NP), jnp.float32),
        jax.ShapeDtypeStruct((BT, NP), jnp.int32),
        jax.ShapeDtypeStruct((BT, NP), jnp.int32),
        jax.ShapeDtypeStruct((BT, NP), jnp.int32),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BT // BLK,),
        in_specs=[
            pl.BlockSpec((BLK, a.shape[1]), lambda g, _nm: (g, 0),
                         memory_space=pltpu.VMEM)
            for a in args
        ],
        out_specs=[
            pl.BlockSpec((BLK, NP), lambda g, _nm: (g, 0),
                         memory_space=pltpu.VMEM)
            for _ in out_shapes
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(nmax, *args)


# --------------------------------------------------------------------------
# raw-transfer launch: ship only primary inputs, derive everything on device
# --------------------------------------------------------------------------
#
# The axon/remote-TPU tunnel moves ~125 MB/s and pays a round trip per
# dispatch, so the launch path is built around transfer volume, not FLOPs
# (the DP kernel itself is ~0.3 ms):
#   * only the PRIMARY per-item inputs cross the link — per-bin scores
#     (3 x f32) and star pointers (3 x i16) per node — plus each distinct
#     (contig, translation-table) geometry ONCE (6 x i32 per node, shared
#     by the ~13 bins of a contig);
#   * the 18 derived star-pointer tables (precompute_tables_v2) and all
#     padding are computed on device inside the jit;
#   * the kernel runs as a grid over blocks of BLK items, so one dispatch
#     sweeps hundreds of items;
#   * all shapes are fixed (G_MAX geometries, BT items) -> one compilation.
FIXED_CHUNKS = 3


def _igm_same_jnp(ndx1, strand1, rsc1, usc1, ndx2, rsc2, usc2, st_wt):
    """Batched f32 intergenic modifier (reference: _connection.h:52-78)."""
    dist = jnp.abs(ndx1 - ndx2)
    overlap = ndx1 + 2 * strand1 >= ndx2
    adjacent = (ndx1 + 2 == ndx2) | (ndx1 == ndx2 + 1)
    fwd = strand1 == 1
    r_n = jnp.where(fwd, rsc2, rsc1)
    u_n = jnp.where(fwd, usc2, usc1)
    rval = jnp.where(
        adjacent,
        jnp.where(r_n < 0, -r_n, 0.0) + jnp.where(u_n < 0, -u_n, 0.0),
        0.0,
    )
    far = dist > 3 * OPER_DIST
    operon = ((dist <= OPER_DIST) & ~overlap) | (dist * 4 < OPER_DIST)
    bonus = (2.0 - dist.astype(jnp.float32) / OPER_DIST) * 0.15 * st_wt
    return (rval + jnp.where(far, -0.15 * st_wt,
                             jnp.where(operon, bonus, 0.0))
            ).astype(jnp.float32)


def _dp_core(ndx, stop_val, typ, strand, win_lo, valid, cs, rsc, usc, sp,
             st_wt, W, NP, BT, BLK, MAX_CHUNKS, interpret=False,
             star_span=None):
    """Shared trace-level DP entry: all inputs are device tensors already
    expanded per work item — geometry/scores (BT, n), star pointers sp
    (3, BT, n) int, st_wt (BT,).  Computes the derived star-pointer tables
    on device, pads, runs the grid-blocked kernel, and returns
    (score, traceb, ovmark) over the padded axis + per-item best terminal
    path score.  `star_span` bounds |sp[k][b, i] - i| (the runner's
    geometry precompute guarantees it), letting the pointer gathers run as
    a masked-roll sweep instead of near-scalar general gathers."""
    n = ndx.shape[1]
    kind = 2 * (strand != 1).astype(jnp.int32) + (typ == STOP)
    stw = st_wt[:, None]
    iidx = jnp.arange(n)[None, :]

    def gather_near(arrays, tgt, okm):
        """[a[b, tgt[b, i]] for a in arrays] where |tgt - i| <= star_span
        whenever okm; entries with ~okm return 0.  With star_span=None
        (pointers of unknown span, e.g. recorded by the C engine) falls
        back to a general gather."""
        if star_span is None:
            spc = jnp.clip(tgt, 0, n - 1)
            return [jnp.where(okm, jnp.take_along_axis(a, spc, axis=1), 0)
                    for a in arrays]
        d = jnp.where(okm, tgt - iidx, star_span + 1)

        def body(t, outs):
            dd = t - star_span
            m = d == dd
            return tuple(jnp.where(m, jnp.roll(a, -dd, axis=1), o)
                         for a, o in zip(arrays, outs))

        return list(jax.lax.fori_loop(
            0, 2 * star_span + 1, body,
            tuple(jnp.zeros_like(a) for a in arrays)))

    opv1, val3, t_sv, t_ndx = [], [], [], []
    for k in range(3):
        spk = sp[k].astype(jnp.int32)
        okm = spk != -1
        g_ndx, g_cs, g_rs, g_us, g_str, g_sv = gather_near(
            (ndx, cs, rsc, usc, strand, stop_val), spk, okm)
        opv1.append(jnp.where(okm, g_cs + _igm_same_jnp(
            ndx, strand, rsc, usc, g_ndx, g_rs, g_us, stw), NEG))
        val3.append(jnp.where(okm, g_cs + _igm_same_jnp(
            g_ndx, g_str, g_rs, g_us, ndx, rsc, usc, stw), NEG))
        t_sv.append(jnp.where(okm, g_sv, -(10 ** 9)))
        t_ndx.append(jnp.where(okm, g_ndx, 0))

    # the kernel's trimmed operand set: kind 4 marks padding, the star
    # tables carry their validity as sentinels (see _dp_kernel_b)
    kind4 = jnp.where(valid != 0, kind, 4)

    def pad(a, fill=0):
        return jnp.pad(a, ((0, 0), (W, NP - W - n)), constant_values=fill)

    args = tuple(
        [pad(ndx), pad(stop_val), pad(kind4, 4), pad(win_lo)]
        + [pad(a) for a in (cs, rsc, usc)]
        + [pad(a, NEGF) for a in opv1] + [pad(a, NEGF) for a in val3]
        + [pad(a, -(10 ** 9)) for a in t_sv] + [pad(a) for a in t_ndx]
        + [jnp.broadcast_to(st_wt[:, None], (BT, 128))]
    )
    # per-block max valid node count bounds the kernel's node loop
    nn_item = jnp.sum((valid != 0).astype(jnp.int32), axis=1)
    nmax = jnp.max(nn_item.reshape(BT // BLK, BLK), axis=1).astype(jnp.int32)
    score, traceb, ov, _ = _run_kernel_b(args, nmax, W, NP, BT, BLK,
                                         MAX_CHUNKS, interpret)
    # best terminal path score per item: max over valid 3'fwd / 5'rev nodes
    terminal = (valid != 0) & ((kind == 1) | (kind == 2))
    terminal = jnp.pad(terminal, ((0, 0), (W, NP - W - n)))
    best = jnp.max(jnp.where(terminal, score, -1.0), axis=1)
    return score, traceb, ov, best


@functools.partial(
    jax.jit,
    static_argnames=("W", "NP", "BT", "BLK", "MAX_CHUNKS", "interpret"))
def _launch(geom, scores, sp, gidx, st_wt, W, NP, BT, BLK, MAX_CHUNKS,
            interpret=False):
    """geom: (6, G, n) int32 [ndx, stop_val, typ, strand, win_lo, valid];
    scores: (3, BT, n) f32 [cs, rscore, uscore]; sp: (3, BT, n) int16
    star pointers; gidx: (BT,) geometry index per item; st_wt: (BT,) f32.

    Returns (score, traceb, ovmark) over the full padded axis (physical
    indices) and the per-item best terminal path score, device-resident.
    """
    g = jnp.take(geom, gidx, axis=1)                  # (6, BT, n)
    ndx, stop_val, typ, strand, win_lo, valid = (g[k] for k in range(6))
    return _dp_core(ndx, stop_val, typ, strand, win_lo, valid,
                    scores[0], scores[1], scores[2], sp, st_wt,
                    W, NP, BT, BLK, MAX_CHUNKS, interpret)


@jax.jit
def _gather_rows(score, traceb, ov, idx):
    """Fixed-shape winner-row gather (idx padded to a constant length) so
    repeated pulls never trigger a recompile."""
    return score[idx], traceb[idx], ov[idx]


@functools.partial(jax.jit, static_argnames=("W", "NB"))
def _gather_rows_w(score, traceb, ov, idx, W, NB):
    """Winner-row gather sliced to the logical node columns on device, so
    only NB columns per row cross the device→host link (traceback VALUES
    stay physical; the caller shifts them by -W)."""
    return (score[idx, W:W + NB], traceb[idx, W:W + NB], ov[idx, W:W + NB])


@functools.partial(jax.jit, static_argnames=("W", "NB"))
def _gather_rows_packed(score, traceb, ov, idx, W, NB):
    """Winner rows packed into one int32 tensor (scores bitcast), so each
    pull costs a single device→host transfer — round trips through the
    device tunnel dominate small pulls."""
    s = jax.lax.bitcast_convert_type(score[idx, W:W + NB], jnp.int32)
    return jnp.stack([s, traceb[idx, W:W + NB], ov[idx, W:W + NB]])
