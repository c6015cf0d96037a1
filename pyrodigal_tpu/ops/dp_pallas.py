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

# Path scores accumulate in int32 FIXED POINT (score * FXS).  f32 adds lose
# ~1e-7 relative per step; absolute path scores on Mbp contigs reach 1e4-1e5,
# so f32 resolution (~0.01 there) approaches real connection-score deltas and
# flips near-tie tracebacks nondeterministically vs the f64 C anchor.  Fixed
# point makes every accumulation exact (per-edge quantization +-1/(2*FXS) is
# the only error, bounded and magnitude-independent), and integer compares
# give the reference's `>=`/last-wins relaxation exactly
# (_connection.h:135-139).  Range: |score| < 2^31/FXS = 1.05e6.
FXS = 2048
INT_NEG = -(2 ** 30)


# --------------------------------------------------------------------------
# host/JAX-side precomputation of the star-pointer tables
# --------------------------------------------------------------------------

def _igm_same(ndx1, strand1, rsc1, usc1, ndx2, rsc2, usc2, st_wt):
    """Same-strand intergenic modifier (reference: _connection.h:52-78);
    shared by both DP kernels and the trace-level star-table builder."""
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
    score_ref[...] = jnp.zeros((B, NP), jnp.int32)
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

    igm_same = _igm_same

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

            ok_cand = cand > jnp.float32(NEGF / 2)
            candq = jnp.round(jnp.where(ok_cand, cand, 0.0) * FXS
                              ).astype(jnp.int32)
            total = jnp.where(ok_cand, n1_score + candq, INT_NEG)
            cmax = jnp.max(total, axis=1, keepdims=True)
            is_max = total == cmax
            pick = jnp.max(jnp.where(is_max, lane, -1), axis=1, keepdims=True)
            sel = lane == pick
            # one packed reduction delivers both the ov_mark frame m (2 bits,
            # biased +1) and the predecessor ndx (< 2^28): meta = ndx*4+m+1
            meta = jnp.max(jnp.where(sel, n1_ndx * 4 + (m + 1), -1),
                           axis=1, keepdims=True)
            cmaxv = cmax[:, 0]
            upd = cmaxv > best
            metav = meta[:, 0]
            bestj = jnp.where(upd, al + pick[:, 0], bestj)
            bestf = jnp.where(upd, (metav & 3) - 1, bestf)
            bestn = jnp.where(upd, metav >> 2, bestn)
            best = jnp.where(upd, cmaxv, best)
            return best, bestj, bestf, bestn

        carry4 = (
            jnp.full((B,), INT_NEG, jnp.int32),
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
        do = ((best > INT_NEG // 2) & (best >= cur_col)
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
        jax.ShapeDtypeStruct((BT, NP), jnp.int32),   # score, fixed point
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
    """f32-cast `_igm_same` (trace-level callers mix int operands)."""
    return _igm_same(ndx1, strand1, rsc1, usc1, ndx2, rsc2, usc2,
                     st_wt).astype(jnp.float32)


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
    score_fx, traceb, ov, _ = _run_kernel_b(args, nmax, W, NP, BT, BLK,
                                            MAX_CHUNKS, interpret)
    score = score_fx.astype(jnp.float32) * (1.0 / FXS)
    # best terminal path score per item: max over valid 3'fwd / 5'rev nodes
    terminal = (valid != 0) & ((kind == 1) | (kind == 2))
    terminal = jnp.pad(terminal, ((0, 0), (W, NP - W - n)))
    best = jnp.max(jnp.where(terminal, score, -1.0), axis=1)
    return score, traceb, ov, best


# --------------------------------------------------------------------------
# mega variant: one long contig, node axis as the grid, scratch-carried state
# --------------------------------------------------------------------------
#
# For contigs whose node tensors exceed VMEM (> ~20k nodes), the node axis
# becomes the Pallas grid: each grid step DPs one TILE of nodes while
# 13 scratch buffers of shape (B, PREF + TILE) carry the trailing window
# state (geometry, per-bin scores, DP outputs) across steps — TPU grid
# iterations run sequentially on the core, so scratch persists.  PREF =
# MAX_CHUNKS_MEGA * W_MEGA bounds the giant-ORF window extension
# (reference: lib.pyx:1221-1233); the host geometry check guarantees it.

W_MEGA = 1024
MEGA_CHUNKS = 4                    # PREF = 4 * 1024 = 4096 node lookback
MEGA_TILE = 2048
# Ring capacity for the fwd-stop source ring (kind-0 targets): must cover
# every fwd stop inside any fwd start's [i-1000, i) window (host-checked
# in meta_tpu._mega_ok; real genomes peak around 80-150).
MEGA_RING = 256


def _dp_kernel_mega(  # noqa: C901
    nn_ref,
    ndx_ref, sv_ref, kind_ref, winlo_ref, ovlo_ref, hasov_ref,
    cs_ref, rsc_ref, usc_ref,
    opv10_ref, opv11_ref, opv12_ref,
    val30_ref, val31_ref, val32_ref,
    tsv0_ref, tsv1_ref, tsv2_ref,
    tndx0_ref, tndx1_ref, tndx2_ref,
    stwt_ref,
    s_ndx, s_sv, s_kind, s_winlo, s_ovlo, s_hasov,
    score_out, traceb_out, ovmark_out, tbndx_out,
    b_ndx, b_sv, b_kind, b_rsc, b_usc,
    b_score, b_tb, b_tbndx, b_ov,
    r_val, r_idx, r_ndx, r_sv,
    g_val, g_j, g_ndx, g_pos,
    *, W, TILE, PREF, B, MAX_CHUNKS, fxs,
):
    """Every row of a mega launch is a BIN over the SAME geometry, which
    buys two specializations over `_dp_kernel_b`: the per-i node metadata
    (ndx, stop_val, kind, win_lo) are true scalars read from (1, TILE)
    operands, and the 4-way (strand, type) case dispatch becomes a scalar
    `lax.switch` — each step computes ONLY its own case's scores and skip
    predicates (the generic kernel computes all four and selects).

    Class registers (mirroring the exact C driver, refcore.c
    rc_dynamic_programming): the reference's window scan decomposes by
    source class, and two whole target kinds collapse to O(1) register
    queries per step:

      * fwd-STOP targets connect only to nodes with ndx > stop_val[i]
        (their own ORF): per (bin, frame) running maxima of
        score[j]+cscore[j] over fwd starts (gene) and of
        score[j]+opv_f[j] over fwd stops (operon), reset whenever a
        frame-f fwd stop passes — exactly the ndx > stop_val range,
        with no window clipping because the reference's giant-ORF window
        extension always covers the full ORF.
      * rev-START targets connect to at most ONE rev stop (the unique
        enclosing same-frame stop, stop_val[j] > ndx[i]): per (bin,
        frame) latest-rev-stop registers (score, stop_val, index, ndx).
        Their opposite-strand fwd-stop sources cluster within 200 bp of
        the target's own stop_val: a single 384-lane window read at the
        precomputed node offset `ovlo[i]` (host searchsorted).

    Register layout (scratch, persists across tiles): (B, 128) lanes
    0-2 = gene maxima by frame, 3-5 = operon maxima by target frame,
    6-8 = latest rev stop by frame; r_sv carries the rev stops'
    stop_val (geometry-shared).  Candidate selection is everywhere the
    lexicographic (value, source index) maximum, which equals the
    reference's `>=` relaxation under ascending scans.

    fwd-START targets (the most numerous kind) avoid the full
    metadata-heavy window pass: their only sources are fwd stops
    (distance-only intergenic modifier — the adjacency term of
    _connection.h:52-78 cannot trigger because candidates require
    ndx_j + 2 < ndx_i on a position-sorted array) and rev starts (flat
    -0.15*st_wt modifier, so the argmax is just the windowed score
    max).  Fwd stops are kept in a MEGA_RING-slot ring buffer (g_val /
    g_j / g_ndx, rotating at g_pos) pushed at each fwd-stop commit; the
    host geometry check guarantees every [i-1000, i) window holds at
    most MEGA_RING fwd stops, so the ring always covers the window.
    Rev starts are a slim masked max over the score window (score +
    kind + traceb rows only).  Per-node scalars (ndx, stop_val, kind,
    win_lo, ovlo, has_ov) are read from SMEM copies instead of
    128-lane select-reductions."""
    t = pl.program_id(0)
    WP = W + 128
    OVW = 384                          # kind-2 overlap-window lanes
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, WP), 1)
    l128 = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
    l128_1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    lov1 = jax.lax.broadcasted_iota(jnp.int32, (1, OVW), 1)
    win_bufs_g = (b_ndx, b_sv, b_kind)             # (1, PREF+TILE)
    win_bufs_b = (b_rsc, b_usc,
                  b_score, b_tb, b_tbndx, b_ov)    # (B, PREF+TILE)

    @pl.when(t == 0)
    def _init():
        zi1 = jnp.zeros((1, PREF), jnp.int32)
        zf = jnp.zeros((B, PREF), jnp.float32)
        b_kind[:, :PREF] = jnp.full((1, PREF), 4, jnp.int32)
        b_ndx[:, :PREF] = zi1
        b_sv[:, :PREF] = zi1
        b_rsc[:, :PREF] = zf
        b_usc[:, :PREF] = zf
        b_score[:, :PREF] = jnp.zeros((B, PREF), jnp.int32)
        b_tb[:, :PREF] = jnp.full((B, PREF), -1, jnp.int32)
        b_tbndx[:, :PREF] = jnp.zeros((B, PREF), jnp.int32)
        b_ov[:, :PREF] = jnp.full((B, PREF), -1, jnp.int32)
        r_val[...] = jnp.full((B, 128), INT_NEG, jnp.int32)
        r_idx[...] = jnp.full((B, 128), -1, jnp.int32)
        r_ndx[...] = jnp.zeros((B, 128), jnp.int32)
        for _k in range(3):
            r_sv[6 + _k] = -(10 ** 9)
        g_val[...] = jnp.full((B, MEGA_RING), INT_NEG, jnp.int32)
        g_j[...] = jnp.full((1, MEGA_RING), -1, jnp.int32)
        g_ndx[...] = jnp.zeros((1, MEGA_RING), jnp.int32)
        g_pos[0] = 0

    @pl.when(t != 0)
    def _shift():
        for ref in win_bufs_g + win_bufs_b:
            tail = ref[:, TILE:]
            ref[:, :PREF] = tail

    # load the new tile
    b_ndx[:, PREF:] = ndx_ref[...]
    b_sv[:, PREF:] = sv_ref[...]
    b_kind[:, PREF:] = kind_ref[...]
    b_rsc[:, PREF:] = rsc_ref[...]
    b_usc[:, PREF:] = usc_ref[...]
    b_score[:, PREF:] = jnp.zeros((B, TILE), jnp.int32)
    b_tb[:, PREF:] = jnp.full((B, TILE), -1, jnp.int32)
    b_tbndx[:, PREF:] = jnp.zeros((B, TILE), jnp.int32)
    b_ov[:, PREF:] = jnp.full((B, TILE), -1, jnp.int32)

    def colB(ref, i):
        """(B, 1) column i of a (B, TILE) ref."""
        base = pl.multiple_of((i // 128) * 128, 128)
        tile = ref[:, pl.ds(base, 128)]
        sel = l128 == (i - base)
        return jnp.sum(jnp.where(sel, tile, 0), axis=1, keepdims=True)

    igm_same = _igm_same

    base_i = t * TILE                  # global node index of local column 0
    st_wt = stwt_ref[:, 0:1]
    igm_diff = jnp.float32(-0.15) * st_wt

    def regsel(ref, base, f):
        """(B,) register lane base+f for traced frame f in {0,1,2}."""
        return jnp.sum(jnp.where(l128 == base + f, ref[...], 0), axis=1)

    def lexmax(a, b):
        """(val, idx, fr, ndx) lexicographic max by (val, then idx)."""
        v1, j1, f1, n1 = a
        v2, j2, f2, n2 = b
        take2 = (v2 > v1) | ((v2 == v1) & (j2 > j1))
        return (jnp.where(take2, v2, v1), jnp.where(take2, j2, j1),
                jnp.where(take2, f2, f1), jnp.where(take2, n2, n1))

    def quant(x):
        return jnp.round(x * fxs).astype(jnp.int32)

    lring = jax.lax.broadcasted_iota(jnp.int32, (1, MEGA_RING), 1)

    def body(i, carry):
        ip = i + PREF                  # scratch coordinate

        i_ndx = s_ndx[0, i]
        i_sv = s_sv[0, i]
        i_kind = s_kind[0, i]
        i_fr = i_ndx % 3
        win_lo_g = s_winlo[0, i]
        win_lo = win_lo_g - base_i + PREF

        empty4 = (
            jnp.full((B,), INT_NEG, jnp.int32),
            jnp.full((B,), -1, jnp.int32),
            jnp.full((B,), -1, jnp.int32),
            jnp.full((B,), 0, jnp.int32),
        )

        def window_pass(case_fn, n_chunks):
            """Chunked window scan [win_lo, ip) with one case's scores;
            returns (val, GLOBAL idx, fr, ndx)."""

            def chunk_body(c, carry):
                best, bestj, bestf, bestn = carry
                lo = ip - (c + 1) * W
                hi = ip - c * W
                al = pl.multiple_of((lo // 128) * 128, 128)
                al = jnp.maximum(al, 0)
                al = pl.multiple_of(al, 128)
                sl = pl.ds(al, WP)
                jp = al + lane1                            # (1, WP)

                n1_ndx = b_ndx[0:1, sl]
                n1_sv = b_sv[0:1, sl]
                n1_kind = b_kind[0:1, sl]
                n1_score = b_score[:, sl]
                n1_tb = b_tb[:, sl]

                inwin = ((jp >= lo) & (jp < hi) & (jp >= win_lo)
                         & (jp < ip) & (n1_kind != 4))     # (1, WP)

                cand, m = case_fn(sl, jp, n1_ndx, n1_sv, n1_kind,
                                  n1_score, n1_tb, inwin)

                lane = jnp.broadcast_to(lane1, (B, WP))
                n1_ndx_b = jnp.broadcast_to(n1_ndx, (B, WP))
                ok_cand = cand > jnp.float32(NEGF / 2)
                candq = jnp.round(jnp.where(ok_cand, cand, 0.0) * fxs
                                  ).astype(jnp.int32)
                total = jnp.where(ok_cand, n1_score + candq, INT_NEG)
                cmax = jnp.max(total, axis=1, keepdims=True)
                is_max = total == cmax
                pick = jnp.max(jnp.where(is_max, lane, -1), axis=1,
                               keepdims=True)
                sel = lane == pick
                # one packed reduction delivers both the ov_mark frame m
                # (2 bits, biased +1) and the predecessor ndx (< 2^28)
                meta = jnp.max(jnp.where(sel, n1_ndx_b * 4 + (m + 1), -1),
                               axis=1, keepdims=True)
                cmaxv = cmax[:, 0]
                upd = cmaxv > best
                metav = meta[:, 0]
                bestj = jnp.where(upd, al + pick[:, 0], bestj)
                bestf = jnp.where(upd, (metav & 3) - 1, bestf)
                bestn = jnp.where(upd, metav >> 2, bestn)
                best = jnp.where(upd, cmaxv, best)
                return best, bestj, bestf, bestn

            if n_chunks is None:
                # kinds 0/3: the 1000-node window always fits one
                # W=1024 chunk — no dynamic trip count
                best, bestj, bestf, bestn = chunk_body(0, empty4)
            else:
                best, bestj, bestf, bestn = jax.lax.fori_loop(
                    0, n_chunks, chunk_body, empty4)
            bestj = jnp.where(best > INT_NEG // 2,
                              bestj - PREF + base_i, -1)
            return best, bestj, bestf, bestn

        def branch_fwd_start():
            # predecessors: fwd stops (distance-only modifier, via the
            # ring) or rev starts (flat modifier, via a slim masked max
            # over the [i-1000, i) window); see the kernel docstring
            # ---- rev starts: windowed score max -----------------------
            lo = ip - W
            al = pl.multiple_of(jnp.maximum((lo // 128) * 128, 0), 128)
            sl = pl.ds(al, WP)
            jp = al + lane1                            # (1, WP)
            n1_ndx = b_ndx[0:1, sl]
            n1_kind = b_kind[0:1, sl]
            n1_score = b_score[:, sl]
            n1_tb = b_tb[:, sl]
            okm = ((jp >= win_lo) & (jp < ip) & (n1_kind == 2)
                   & (n1_ndx < i_ndx))                 # (1, WP)
            ok = okm & (n1_tb != -1)                   # (B, WP)
            candq_d = quant(igm_diff)                  # (B, 1)
            total = jnp.where(ok, n1_score + candq_d, INT_NEG)
            cmax = jnp.max(total, axis=1, keepdims=True)
            lane_b = jnp.broadcast_to(lane1, (B, WP))
            pick = jnp.max(jnp.where(total == cmax, lane_b, -1),
                           axis=1, keepdims=True)
            nR = jnp.max(jnp.where(lane_b == pick,
                                   jnp.broadcast_to(n1_ndx, (B, WP)), 0),
                         axis=1)
            vR = cmax[:, 0]
            jR = jnp.where(vR > INT_NEG // 2,
                           al + pick[:, 0] - PREF + base_i, -1)

            # ---- fwd stops: ring query --------------------------------
            rv = g_val[...]                            # (B, RING)
            rj = g_j[...]                              # (1, RING) global
            rn = g_ndx[...]                            # (1, RING)
            okk = (rj >= win_lo_g) & (rj != -1) & (rn + 2 < i_ndx)
            dist = i_ndx - rn
            far = dist > 3 * OPER_DIST
            operon = (dist <= OPER_DIST) | (dist * 4 < OPER_DIST)
            bonus = (2.0 - dist.astype(jnp.float32) / OPER_DIST) \
                * 0.15 * st_wt                         # (B, RING)
            igm = jnp.where(far, jnp.float32(-0.15) * st_wt,
                            jnp.where(operon, bonus, 0.0))
            candq = jnp.round(jnp.where(okk, igm, 0.0) * fxs
                              ).astype(jnp.int32)
            totk = jnp.where(okk, rv + candq, INT_NEG)
            kmax = jnp.max(totk, axis=1, keepdims=True)
            pickj = jnp.max(jnp.where(totk == kmax,
                                      jnp.broadcast_to(rj, (B, MEGA_RING)),
                                      -1), axis=1, keepdims=True)
            nK = jnp.max(jnp.where(jnp.broadcast_to(rj, (B, MEGA_RING))
                                   == pickj,
                                   jnp.broadcast_to(rn, (B, MEGA_RING)),
                                   0), axis=1)
            vK = kmax[:, 0]
            jK = jnp.where(vK > INT_NEG // 2, pickj[:, 0], -1)

            neg1 = jnp.full((B,), -1, jnp.int32)
            return lexmax((vR, jR, neg1, nR), (vK, jK, neg1, nK))

        def branch_fwd_stop():
            # O(1): gene register (same-frame fwd starts with
            # ndx > stop_val[i]) + operon register (fwd stops via the
            # star table) — both maintained with exactly that range by
            # the reset-on-frame-stop rule below.  The j >= win_lo guard
            # is vacuous within a contig (the reference's giant-ORF
            # window extension always covers the full ORF) and filters
            # stale cross-contig entries in packed launches.
            gv = regsel(r_val, 0, i_fr)
            gj = regsel(r_idx, 0, i_fr)
            gn = regsel(r_ndx, 0, i_fr)
            ov = regsel(r_val, 3, i_fr)
            oj = regsel(r_idx, 3, i_fr)
            on = regsel(r_ndx, 3, i_fr)
            gv = jnp.where(gj >= win_lo_g, gv, INT_NEG)
            ov = jnp.where(oj >= win_lo_g, ov, INT_NEG)
            neg1 = jnp.full((B,), -1, jnp.int32)
            return lexmax((gv, gj, neg1, gn), (ov, oj, neg1, on))

        def branch_rev_start():
            # the unique enclosing same-frame rev stop via register,
            # plus fwd stops within 200 bp of stop_val[i] via one
            # OVW-lane window at the precomputed node offset
            cs_i = colB(cs_ref, i)
            rv = regsel(r_val, 6, i_fr)
            rj = regsel(r_idx, 6, i_fr)
            rn = regsel(r_ndx, 6, i_fr)
            rsv = r_sv[6 + i_fr]
            csq = quant(cs_i)[:, 0]                     # (B,)
            valid = (rsv > i_ndx) & (rj >= win_lo_g)
            cand_r = (jnp.where(valid, rv + csq, INT_NEG),
                      jnp.where(valid, rj, -1),
                      jnp.full((B,), -1, jnp.int32),
                      jnp.where(valid, rn, 0))

            def ov_window():
                olo = s_ovlo[0, i] - base_i + PREF        # scratch coord
                al = pl.multiple_of((jnp.maximum(olo, 0) // 128) * 128,
                                    128)
                # clamp so the OVW-lane slice stays inside the scratch
                # width; when clamped the window still covers [olo, ip)
                # because olo >= al was only possible with al > sw - OVW
                al = jnp.minimum(al, PREF + TILE - OVW)
                al = pl.multiple_of(al, 128)
                sl = pl.ds(al, OVW)
                jp = al + lov1                            # (1, OVW)
                n1_ndx = b_ndx[0:1, sl]
                n1_kind = b_kind[0:1, sl]
                n1_score = b_score[:, sl]
                n1_tb = b_tb[:, sl]
                n1_tbndx = b_tbndx[:, sl]
                bnd = jnp.where(n1_tb == -1, 0, n1_tbndx)
                ovlp = (n1_ndx + 2) - (i_sv - 2) + 1
                ov_ok = (
                    ((i_sv - 2) < (n1_ndx + 2))
                    & (ovlp < MAX_OPP_OVLP)
                    & ((n1_ndx - i_sv) < (i_ndx - n1_ndx + 3))
                    & ((n1_ndx - i_sv) < (i_sv - 3 - bnd))
                )
                okc = ((jp >= olo) & (jp < ip) & (jp >= win_lo)
                       & (n1_kind == 1) & (n1_tb != -1) & ov_ok)
                sc = cs_i + igm_diff
                candq = jnp.where(okc, n1_score + quant(
                    jnp.where(okc, jnp.broadcast_to(sc, okc.shape), 0.0)),
                    INT_NEG)
                lane = jnp.broadcast_to(jp, (B, OVW))
                cmax = jnp.max(candq, axis=1, keepdims=True)
                pick = jnp.max(jnp.where(candq == cmax, lane, -1), axis=1,
                               keepdims=True)
                nsel = jnp.max(jnp.where(lane == pick,
                                         jnp.broadcast_to(n1_ndx,
                                                          (B, OVW)),
                                         0), axis=1)
                cmaxv = cmax[:, 0]
                okv = cmaxv > INT_NEG // 2
                return (cmaxv,
                        jnp.where(okv, pick[:, 0] - PREF + base_i, -1),
                        jnp.full((B,), -1, jnp.int32),
                        nsel)

            # the window only matters when some fwd stop lies within
            # 200 bp of this rev start's own stop (host-precomputed
            # flag) — most rev starts have none
            cand_w = jax.lax.cond(s_hasov[0, i] != 0, ov_window,
                                  lambda: empty4)
            return lexmax(cand_r, cand_w)

        def branch_rev_stop():
            # fwd stops (triple-overlap star scan + intergenic), rev
            # starts (gene-before), rev stops (operon via star table);
            # window = [i-1000, i), never extended
            rsc_i = colB(rsc_ref, i)
            usc_i = colB(usc_ref, i)
            v30 = colB(val30_ref, i)
            v31 = colB(val31_ref, i)
            v32 = colB(val32_ref, i)
            sv30 = colB(tsv0_ref, i)
            sv31 = colB(tsv1_ref, i)
            sv32 = colB(tsv2_ref, i)
            nd30 = colB(tndx0_ref, i)
            nd31 = colB(tndx1_ref, i)
            nd32 = colB(tndx2_ref, i)

            def case(sl, jp, n1_ndx, n1_sv, n1_kind, n1_score, n1_tb,
                     inwin):
                f1_stop = n1_kind == 1
                r1_stop = n1_kind == 3
                r1_start = n1_kind == 2
                artifact = (n1_tb == -1) & (f1_stop | r1_start)
                n1_rsc = b_rsc[:, sl]
                n1_usc = b_usc[:, sl]
                n1_tbndx = b_tbndx[:, sl]
                bnd = jnp.where(n1_tb == -1, 0, n1_tbndx)
                left = n1_ndx + 2
                right = i_ndx - 2
                bv = jnp.zeros((B, WP), jnp.float32)
                bf = jnp.full((B, WP), -1, jnp.int32)
                for k, (v_i, sv_i3, ndx_i3) in enumerate((
                    (v30, sv30, nd30), (v31, sv31, nd31),
                    (v32, sv32, nd32),
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
                igm_j_i = igm_same(n1_ndx, -1, n1_rsc, n1_usc,
                                   i_ndx, rsc_i, usc_i, st_wt)
                n1_fr = n1_ndx % 3
                v3 = jnp.where(n1_fr == 0, v30,
                               jnp.where(n1_fr == 1, v31, v32))
                sc = jnp.where(f1_stop, f_sc,
                               jnp.where(r1_start, igm_j_i, v3))
                ok = ((f1_stop & (left < right))
                      | (r1_start & (n1_ndx < right))
                      | (r1_stop & (n1_sv > i_ndx)))
                cand = jnp.where(inwin & ok & ~artifact, sc,
                                 jnp.float32(NEGF))
                m = jnp.where(f1_stop, bf, -1)
                return (jnp.broadcast_to(cand, (B, WP)),
                        jnp.broadcast_to(m, (B, WP)))

            return window_pass(case, None)

        best, bestj, bestf, bestn = jax.lax.switch(
            i_kind, [branch_fwd_start, branch_fwd_stop, branch_rev_start,
                     branch_rev_stop])

        base = pl.multiple_of((ip // 128) * 128, 128)
        selc = l128 == (ip - base)
        cur = b_score[:, pl.ds(base, 128)]
        cur_tb = b_tb[:, pl.ds(base, 128)]
        cur_ov = b_ov[:, pl.ds(base, 128)]
        cur_tn = b_tbndx[:, pl.ds(base, 128)]
        # the pre-commit column always holds the (0, -1) baseline (each
        # column is committed exactly once, at its own step), so the
        # `>=` relaxation against the baseline is just best >= 0
        do = best >= 0
        doc = selc & do[:, None]
        b_score[:, pl.ds(base, 128)] = jnp.where(doc, best[:, None], cur)
        b_tb[:, pl.ds(base, 128)] = jnp.where(doc, bestj[:, None], cur_tb)
        b_ov[:, pl.ds(base, 128)] = jnp.where(doc, bestf[:, None], cur_ov)
        b_tbndx[:, pl.ds(base, 128)] = jnp.where(doc, bestn[:, None], cur_tn)

        # ---- register maintenance (this node as a future source) ---------
        sfin = jnp.where(do, best, 0)                  # committed score
        live = do                                      # traceb != -1
        ig = base_i + i

        def upd_fwd_start():
            # gene register, lane i_fr: score + quantized cscore;
            # >= keeps the larger index on ties (ascending pushes)
            cand = sfin + quant(colB(cs_ref, i))[:, 0]
            m = (l128 == i_fr) & (cand[:, None] >= r_val[...])
            r_val[...] = jnp.where(m, cand[:, None], r_val[...])
            r_idx[...] = jnp.where(m, ig, r_idx[...])
            r_ndx[...] = jnp.where(m, i_ndx, r_ndx[...])

        def upd_fwd_stop():
            # push this stop into the fwd-stop ring (source for later
            # fwd-start targets); non-live rows carry the INT_NEG
            # sentinel, mirroring the window pass's artifact exclusion
            slot = g_pos[0] % MEGA_RING
            ms = lring == slot                         # (1, RING)
            g_j[...] = jnp.where(ms, ig, g_j[...])
            g_ndx[...] = jnp.where(ms, i_ndx, g_ndx[...])
            g_val[...] = jnp.where(
                ms, jnp.where(live, best, INT_NEG)[:, None], g_val[...])
            g_pos[0] = g_pos[0] + 1
            # reset own-frame gene/operon ranges (sources must have
            # ndx > stop_val of later same-frame stops = this node's ndx),
            # then offer this stop to the OTHER frames' operon lanes
            rm = (l128 == i_fr) | (l128 == 3 + i_fr)
            r_val[...] = jnp.where(rm, INT_NEG, r_val[...])
            r_idx[...] = jnp.where(rm, -1, r_idx[...])
            opv0 = colB(opv10_ref, i)
            opv1 = colB(opv11_ref, i)
            opv2 = colB(opv12_ref, i)
            for f2 in range(3):
                opv = (opv0, opv1, opv2)[f2]
                okv = live[:, None] & (opv > jnp.float32(NEGF / 2)) \
                    & (i_fr != f2)
                cand = sfin[:, None] + quant(jnp.where(okv, opv, 0.0))
                m = (l128 == 3 + f2) & okv & (cand >= r_val[...])
                r_val[...] = jnp.where(m, cand, r_val[...])
                r_idx[...] = jnp.where(m, ig, r_idx[...])
                r_ndx[...] = jnp.where(m, i_ndx, r_ndx[...])

        def upd_rev_start():
            pass

        def upd_rev_stop():
            # latest rev stop per frame (the unique candidate for later
            # same-frame rev starts and the operon source for rev stops)
            m = l128 == 6 + i_fr
            r_val[...] = jnp.where(m, sfin[:, None], r_val[...])
            r_idx[...] = jnp.where(m, ig, r_idx[...])
            r_ndx[...] = jnp.where(m, i_ndx, r_ndx[...])
            r_sv[6 + i_fr] = i_sv

        jax.lax.switch(i_kind, [upd_fwd_start, upd_fwd_stop,
                                upd_rev_start, upd_rev_stop])
        return 0

    # per-tile real-node count (real nodes are a tile prefix by
    # construction: single geometries are front-compacted, packed
    # geometries pad each contig's node range to a tile multiple)
    jax.lax.fori_loop(0, nn_ref[t], body, 0)

    # flush this tile's DP state to the outputs
    score_out[...] = b_score[:, PREF:]
    traceb_out[...] = b_tb[:, PREF:]
    ovmark_out[...] = b_ov[:, PREF:]
    tbndx_out[...] = b_tbndx[:, PREF:]


def _run_kernel_mega(args, nn, NT, B, W, TILE, PREF, MAX_CHUNKS,
                     fxs, interpret=False):
    """Node-axis-gridded launch for one long contig: operands are (B, NT)
    streamed tile-by-tile; 13 VMEM scratch buffers carry the trailing
    PREF-node window of geometry + DP state across grid steps."""
    kernel = functools.partial(_dp_kernel_mega, W=W, TILE=TILE, PREF=PREF,
                               B=B, MAX_CHUNKS=MAX_CHUNKS, fxs=fxs)
    out_shapes = [
        jax.ShapeDtypeStruct((B, NT), jnp.int32),   # score, fixed point
        jax.ShapeDtypeStruct((B, NT), jnp.int32),
        jax.ShapeDtypeStruct((B, NT), jnp.int32),
        jax.ShapeDtypeStruct((B, NT), jnp.int32),
    ]
    n_tiles = NT // TILE
    sw = PREF + TILE
    # scratch order matches the kernel signature; geometry buffers are a
    # single shared row
    scratch = [
        pltpu.VMEM((1, sw), jnp.int32),    # b_ndx
        pltpu.VMEM((1, sw), jnp.int32),    # b_sv
        pltpu.VMEM((1, sw), jnp.int32),    # b_kind
        pltpu.VMEM((B, sw), jnp.float32),  # b_rsc
        pltpu.VMEM((B, sw), jnp.float32),  # b_usc
        pltpu.VMEM((B, sw), jnp.int32),    # b_score (fixed point)
        pltpu.VMEM((B, sw), jnp.int32),    # b_tb
        pltpu.VMEM((B, sw), jnp.int32),    # b_tbndx
        pltpu.VMEM((B, sw), jnp.int32),    # b_ov
        pltpu.VMEM((B, 128), jnp.int32),   # r_val (class registers)
        pltpu.VMEM((B, 128), jnp.int32),   # r_idx
        pltpu.VMEM((B, 128), jnp.int32),   # r_ndx
        pltpu.SMEM((16,), jnp.int32),      # r_sv
        pltpu.VMEM((B, MEGA_RING), jnp.int32),   # g_val (fwd-stop ring)
        pltpu.VMEM((1, MEGA_RING), jnp.int32),   # g_j
        pltpu.VMEM((1, MEGA_RING), jnp.int32),   # g_ndx
        pltpu.SMEM((4,), jnp.int32),             # g_pos
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, TILE), lambda g, _nn: (0, g),
                         memory_space=pltpu.VMEM)    # geometry, shared row
            for _ in range(6)
        ] + [
            pl.BlockSpec((B, TILE), lambda g, _nn: (0, g),
                         memory_space=pltpu.VMEM)
            for _ in range(15)
        ] + [
            pl.BlockSpec((B, 128), lambda g, _nn: (0, 0),
                         memory_space=pltpu.VMEM)    # stwt, constant
        ] + [
            pl.BlockSpec((1, TILE), lambda g, _nn: (0, g),
                         memory_space=pltpu.SMEM)    # per-node scalars
            for _ in range(6)
        ],
        out_specs=[
            pl.BlockSpec((B, TILE), lambda g, _nn: (0, g),
                         memory_space=pltpu.VMEM)
            for _ in out_shapes
        ],
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(nn, *args)


def _dp_core_mega(ndx, stop_val, typ, strand, win_lo, valid, cs, rsc, usc,
                  sp, st_wt, NT, interpret=False, star_span=None,
                  tables=None, fxs=FXS, node_bounds=None,
                  monotonic_ndx=False):
    """`_dp_core` for one long contig — or a PACK of contigs laid out
    end-to-end on the node axis (each contig's node range padded to a
    kernel-tile multiple, kind-4 pads as a per-tile suffix; window bounds
    and the kernel's register/ring guards keep the DPs independent).
    Same derived star tables, then the node-axis-gridded kernel.  All
    arrays are (B, NT); traceback values come back as global node indices
    (no front padding).  `tables` short-circuits the star-table gather
    when the fused star_pallas kernel already built them.  With
    `node_bounds` ((C2+1,) int32 contig node offsets) the best terminal
    path score is reduced per contig range → (C2, B)."""
    B, n = ndx.shape
    assert n == NT
    kind = 2 * (strand != 1).astype(jnp.int32) + (typ == STOP)
    stw = st_wt[:, None]
    iidx = jnp.arange(n)[None, :]

    def gather_near(arrays, tgt, okm):
        d = jnp.where(okm, tgt - iidx, star_span + 1)

        def body(t, outs):
            dd = t - star_span
            m = d == dd
            return tuple(jnp.where(m, jnp.roll(a, -dd, axis=1), o)
                         for a, o in zip(arrays, outs))

        return list(jax.lax.fori_loop(
            0, 2 * star_span + 1, body,
            tuple(jnp.zeros_like(a) for a in arrays)))

    if tables is not None:
        opv1, val3, t_sv, t_ndx = tables
    else:
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

    kind4 = jnp.where(valid != 0, kind, 4)
    # per-tile real-node counts (real nodes are a prefix of each tile)
    tile_nn = jnp.sum((valid[0] != 0).reshape(NT // MEGA_TILE, MEGA_TILE)
                      .astype(jnp.int32), axis=1)

    # kind-2 overlap-window offsets: first node with ndx >= stop_val[i]-3
    # (the fwd-stop sources of a rev-start target all satisfy
    # ndx > stop_val[i]-4).  Single geometries pad with zeros as a
    # suffix (keys substituted to sort last); packed geometries carry
    # monotonic duplicate ndx in their interior pads, so the raw row is
    # already sorted and duplicate keys cannot shift the result
    if monotonic_ndx:
        sort_key = ndx[0]
    else:
        sort_key = jnp.where(valid[0] != 0, ndx[0], 2 ** 30)
    ovlo = jnp.searchsorted(sort_key, stop_val[0] - 3,
                            method="sort").astype(jnp.int32)
    # does any fwd stop fall in (stop_val-4, stop_val+195)?  exact gate
    # for the kind-2 overlap window (candidates need ndx > sv-4 and
    # ovlp < MAX_OPP_OVLP, i.e. ndx < sv+195)
    fs_key = jnp.where((valid[0] != 0) & (kind[0] == 1), ndx[0], 2 ** 30)
    fs_sorted = jnp.sort(fs_key)
    lo_cnt = jnp.searchsorted(fs_sorted, stop_val[0] - 3, method="sort")
    hi_cnt = jnp.searchsorted(fs_sorted, stop_val[0] + 195, method="sort")
    has_ov = (hi_cnt > lo_cnt).astype(jnp.int32)

    # The kind-2 overlap window reads 384 lanes at `ovlo`, which covers
    # every candidate ONLY when no 200-bp span holds more than 250 nodes
    # (the host check in meta_tpu._mega_ok).  Recompute the bound here
    # and poison the terminal scores with NaN on violation, so an
    # unvetted caller fails loudly instead of silently dropping DP
    # candidates (ADVICE r4).
    hi_all = jnp.searchsorted(sort_key, stop_val[0] + 195, method="sort")
    # pad entries share their contig's last ndx (packed) or sort last
    # (single), so count only VALID nodes between the two offsets
    vcum = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum((valid[0] != 0).astype(jnp.int32))])
    dens_ok = jnp.all(jnp.where(
        (valid[0] != 0) & (kind[0] == 2) & (has_ov != 0),
        jnp.take(vcum, hi_all) - jnp.take(vcum, ovlo), 0) <= 250)

    # geometry operands are shared by every bin row -> ship (1, NT); the
    # trailing repeat feeds the kernel's SMEM per-node scalar copies
    args = tuple(
        [ndx[0:1], stop_val[0:1], kind4[0:1], win_lo[0:1], ovlo[None],
         has_ov[None]]
        + [cs, rsc, usc]
        + opv1 + val3 + t_sv + t_ndx
        + [jnp.broadcast_to(st_wt[:, None], (B, 128))]
        + [ndx[0:1], stop_val[0:1], kind4[0:1], win_lo[0:1], ovlo[None],
           has_ov[None]]
    )
    score_fx, traceb, ov, _ = _run_kernel_mega(
        args, tile_nn, NT, B, W_MEGA, MEGA_TILE, MEGA_CHUNKS * W_MEGA,
        MEGA_CHUNKS, fxs, interpret)
    score = score_fx.astype(jnp.float32) * (1.0 / fxs)
    terminal = (valid != 0) & ((kind == 1) | (kind == 2))
    tscore = jnp.where(terminal, score, -1.0)
    tscore = jnp.where(dens_ok, tscore, jnp.nan)   # loud unvetted-geometry
    if node_bounds is None:
        best = jnp.max(tscore, axis=1)                       # (B,)
    else:
        iidx2 = jnp.arange(NT)[None, :]
        best = jnp.stack([
            jnp.max(jnp.where((iidx2 >= node_bounds[c])
                              & (iidx2 < node_bounds[c + 1]),
                              tscore, -1.0), axis=1)
            for c in range(node_bounds.shape[0] - 1)])       # (C2, B)
    return score, traceb, ov, best
