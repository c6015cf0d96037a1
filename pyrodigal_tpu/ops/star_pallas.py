"""Fused star-pointer sweep + star-table construction as one Pallas kernel.

The XLA formulation (score_device.py star sweep + dp_pallas gather_near)
re-streams every (BT, n) operand from HBM on each of its 64 + 73 shift
iterations — ~4 GB of traffic per Mbp-scale launch, hopelessly HBM-bound.
Here each n-tile lives in VMEM (halo'd scratch windows assembled from the
neighboring blocks), and every shift is a dynamic slice of the resident
window, so the whole pass costs one read + one write of the operands.

Replays exactly:
* the flag=1 overlapping-start scan (reference: lib.pyx:2279-2329) — a
  global running max over the candidate window, walked fwd stops first
  (d = +3 .. 3-relk+1) then rev stops (d = -3 .. relk-3-1), strict `>`
  so the first-seen candidate wins ties, with per-frame pointers;
* the derived star tables of dp_pallas (opv1 / val3 / t_sv / t_ndx):
  per-frame gathered cscore+sscore plus the intergenic modifier, with
  the sentinel encodings the DP kernels expect.  Star pointers and the
  integer tables are bit-identical to the XLA formulation; the float
  tables can differ by last-ULP f32 fusion/rounding, absorbed by the
  winner-arbitration drift margin (tests/test_meta.py differential).

Halo lanes at the array edges carry neighboring-tile data that does not
exist; every consumer masks by the candidate's global bounds (the sweep
by 0 <= j < NT, the gather by sp != -1), so those lanes are never
selected.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dp_pallas import _igm_same, NEG

HALO = 128


def _star_kernel(  # noqa: C901
    ndx_l, sv_l, gm_l, cs_l, rsc_l, usc_l,
    ndx_c, sv_c, gm_c, cs_c, rsc_c, usc_c,
    ndx_r, sv_r, gm_r, cs_r, rsc_r, usc_r,
    stw_ref,
    sp0_o, sp1_o, sp2_o,
    opv0_o, opv1_o, opv2_o,
    v30_o, v31_o, v32_o,
    tsv0_o, tsv1_o, tsv2_o,
    tnd0_o, tnd1_o, tnd2_o,
    w_ndx, w_sv, w_gm, w_cs, w_rsc, w_usc,
    *, T, B, relk, mo, NT,
):
    g = pl.program_id(0)

    for w, al, ac, ar in (
        (w_ndx, ndx_l, ndx_c, ndx_r), (w_sv, sv_l, sv_c, sv_r),
        (w_gm, gm_l, gm_c, gm_r), (w_cs, cs_l, cs_c, cs_r),
        (w_rsc, rsc_l, rsc_c, rsc_r), (w_usc, usc_l, usc_c, usc_r),
    ):
        w[:, :HALO] = al[:, T - HALO:]
        w[:, HALO:HALO + T] = ac[...]
        w[:, HALO + T:] = ar[:, :HALO]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    iglob = lane + g * T                     # global node index of column
    stw = stw_ref[:, 0:1]

    def win(w, d):
        if isinstance(d, int):
            return w[:, HALO + d:HALO + d + T]
        return w[:, pl.ds(HALO + d, T)]

    ndx = win(w_ndx, 0)
    sv = win(w_sv, 0)
    gm = win(w_gm, 0)
    kind = gm & 7
    edgeb = (gm & 8) != 0
    fwd1 = kind < 2
    strand = jnp.where(fwd1, 1, -1)
    fstop = (kind == 1) & ~edgeb
    rstop = (kind == 3) & ~edgeb
    rsc_i = win(w_rsc, 0)
    usc_i = win(w_usc, 0)
    del sv

    # ---- flag=1 sweep: global running max, fwd stops then rev stops ----
    runmax = jnp.full((B, T), -100.0, jnp.float32)
    p0 = jnp.full((B, T), -1, jnp.int32)
    p1 = jnp.full((B, T), -1, jnp.int32)
    p2 = jnp.full((B, T), -1, jnp.int32)
    for t in range(2 * relk):
        is_f = t < relk
        k = t if is_f else t - relk
        d = (3 - k) if is_f else (k - 3)
        j = iglob + d
        ndx_j = win(w_ndx, d)
        kind_j = win(w_gm, d) & 7
        sc_j = win(w_cs, d)
        rsc_j = win(w_rsc, d)
        usc_j = win(w_usc, d)
        sv_j = win(w_sv, d)
        val_j = kind_j != 4
        typj_stop = (kind_j == 1) | (kind_j == 3)
        strj = jnp.where(kind_j < 2, 1, -1)
        if is_f:
            okd = (fstop & (strj == 1) & (ndx_j <= ndx + 2)
                   & (ndx_j + mo >= ndx) & (sv_j > ndx))
            igm = _igm_same(ndx, strand, rsc_i, usc_i,
                            ndx_j, rsc_j, usc_j, stw).astype(jnp.float32)
        else:
            okd = (rstop & (strj == -1) & (ndx_j >= ndx - 2)
                   & (ndx_j - mo <= ndx) & (sv_j < ndx))
            igm = _igm_same(ndx_j, -1, rsc_j, usc_j,
                            ndx, rsc_i, usc_i, stw).astype(jnp.float32)
        ok = (j >= 0) & (j < NT) & val_j & ~typj_stop & okd
        sc = sc_j + igm
        upd = ok & (sc > runmax)
        phj = ndx_j % 3
        p0 = jnp.where(upd & (phj == 0), j, p0)
        p1 = jnp.where(upd & (phj == 1), j, p1)
        p2 = jnp.where(upd & (phj == 2), j, p2)
        runmax = jnp.where(upd, sc, runmax)

    sp0_o[...] = p0
    sp1_o[...] = p1
    sp2_o[...] = p2

    # ---- star tables: banded gather at the recorded pointers ----------
    span = relk - 2
    for kk, sp in enumerate((p0, p1, p2)):
        okm = sp != -1
        dmat = jnp.where(okm, sp - iglob, span + 1)
        gn = jnp.zeros((B, T), jnp.int32)
        gc = jnp.zeros((B, T), jnp.float32)
        gr = jnp.zeros((B, T), jnp.float32)
        gu = jnp.zeros((B, T), jnp.float32)
        gs = jnp.zeros((B, T), jnp.int32)
        gv = jnp.zeros((B, T), jnp.int32)
        for d in range(-span, span + 1):
            m = dmat == d
            gn = jnp.where(m, win(w_ndx, d), gn)
            gc = jnp.where(m, win(w_cs, d), gc)
            gr = jnp.where(m, win(w_rsc, d), gr)
            gu = jnp.where(m, win(w_usc, d), gu)
            gs = jnp.where(m, jnp.where((win(w_gm, d) & 7) < 2, 1, -1), gs)
            gv = jnp.where(m, win(w_sv, d), gv)
        opv = jnp.where(okm, gc + _igm_same(
            ndx, strand, rsc_i, usc_i, gn, gr, gu, stw
        ).astype(jnp.float32), NEG)
        v3 = jnp.where(okm, gc + _igm_same(
            gn, gs, gr, gu, ndx, rsc_i, usc_i, stw
        ).astype(jnp.float32), NEG)
        tsv = jnp.where(okm, gv, -(10 ** 9))
        tnd = jnp.where(okm, gn, 0)
        (opv0_o, opv1_o, opv2_o)[kk][...] = opv
        (v30_o, v31_o, v32_o)[kk][...] = v3
        (tsv0_o, tsv1_o, tsv2_o)[kk][...] = tsv
        (tnd0_o, tnd1_o, tnd2_o)[kk][...] = tnd


def star_tables_mega(ndx, stop_val, kind4, edge, cs, rsc, usc, st_wt,
                     relk, max_overlap, interpret=False, TILE=None):
    """One-geometry (mega) star sweep + tables.

    ndx/stop_val/kind4/edge: (1, NT) geometry rows; cs (= cscore+sscore),
    rsc, usc: (B, NT) per-bin scores; st_wt: (B,).  Returns
    (star_ptr (3, B, NT) int32, opv1[3], val3[3], t_sv[3], t_ndx[3])
    matching score_device's sweep + dp_pallas's gather tables exactly.
    """
    B, NT = cs.shape
    if TILE is None:
        # wider row counts (packed launches) shrink the tile so the
        # kernel's live temporaries stay inside the scoped-VMEM limit
        TILE = 512 if B <= 16 else 256
    assert NT % TILE == 0, "NT must be a multiple of the star tile"
    n_tiles = NT // TILE
    gmeta = kind4 | jnp.where(edge != 0, 8, 0)
    arrays = (ndx, stop_val, gmeta, cs, rsc, usc)
    kernel = functools.partial(_star_kernel, T=TILE, B=B, relk=relk,
                               mo=max_overlap, NT=NT)
    out_shapes = (
        [jax.ShapeDtypeStruct((B, NT), jnp.int32)] * 3
        + [jax.ShapeDtypeStruct((B, NT), jnp.float32)] * 6
        + [jax.ShapeDtypeStruct((B, NT), jnp.int32)] * 6
    )

    def spec(a, which):
        rows = a.shape[0]
        if which == "l":
            imap = lambda g: (0, jnp.maximum(g - 1, 0))
        elif which == "r":
            imap = lambda g: (0, jnp.minimum(g + 1, n_tiles - 1))
        else:
            imap = lambda g: (0, g)
        return pl.BlockSpec((rows, TILE), imap, memory_space=pltpu.VMEM)

    in_specs = ([spec(a, "l") for a in arrays]
                + [spec(a, "c") for a in arrays]
                + [spec(a, "r") for a in arrays]
                + [pl.BlockSpec((B, 128), lambda g: (0, 0),
                                memory_space=pltpu.VMEM)])
    W = TILE + 2 * HALO
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((B, TILE), lambda g: (0, g),
                         memory_space=pltpu.VMEM)
            for _ in out_shapes
        ],
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((1, W), jnp.int32),     # w_ndx
            pltpu.VMEM((1, W), jnp.int32),     # w_sv
            pltpu.VMEM((1, W), jnp.int32),     # w_gm
            pltpu.VMEM((B, W), jnp.float32),   # w_cs
            pltpu.VMEM((B, W), jnp.float32),   # w_rsc
            pltpu.VMEM((B, W), jnp.float32),   # w_usc
        ],
        interpret=interpret,
    )(*arrays, *arrays, *arrays,
      jnp.broadcast_to(st_wt[:, None], (B, 128)))
    sp = jnp.stack(outs[0:3])
    return (sp, list(outs[3:6]), list(outs[6:9]), list(outs[9:12]),
            list(outs[12:15]))


def _phase_cumsum_kernel(x_ref, o_ref, carry, *, T, B):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        carry[...] = jnp.zeros((B, 128), jnp.float32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    l128 = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
    off = (g * T) % 3
    ph = (lane + off) % 3
    x = x_ref[...]
    c = carry[...]

    outs = []
    tots = []
    for r in range(3):
        v = jnp.where(ph == r, x, 0.0)
        tots.append(jnp.sum(v, axis=1))
        s = v
        sh = 1
        while sh < T:
            rolled = pltpu.roll(s, sh, axis=1)
            s = s + jnp.where(lane >= sh, rolled, 0.0)
            sh *= 2
        cr = jnp.sum(jnp.where(l128 == r, c, 0.0), axis=1)
        outs.append(s + cr[:, None])
    o_ref[...] = jnp.where(ph == 0, outs[0],
                           jnp.where(ph == 1, outs[1], outs[2]))
    upd = sum((l128 == r) * tots[r][:, None] for r in range(3))
    carry[...] = c + upd


def phase_cumsum(x, interpret=False, TILE=2048):
    """Per-phase (mod-3) inclusive prefix sums along the last axis of a
    (B, S) float32 array: out[b, p] = sum of x[b, q] over q <= p with
    q % 3 == p % 3 — the dc-score phase cumsum without the
    (B, S/3, 3)-layout reshapes (the minor-3 layout costs two relayout
    copies and a strided scan in XLA).  One HBM pass: each tile's three
    masked log-shift prefix sums run in VMEM with (B, 3) carries in
    scratch.

    Association order differs from jnp.cumsum, so values may drift by
    f32 rounding — inside the device scoring pipeline's drift contract.
    Falls back to the reshape formulation off-TPU or when S is not a
    tile multiple."""
    B, S = x.shape
    if interpret or S % TILE or jax.devices()[0].platform not in (
            "tpu", "gpu"):
        S3 = S // 3
        return jnp.cumsum(x.reshape(B, S3, 3), axis=1).reshape(B, S)
    kernel = functools.partial(_phase_cumsum_kernel, T=TILE, B=B)
    return pl.pallas_call(
        kernel,
        grid=(S // TILE,),
        in_specs=[pl.BlockSpec((B, TILE), lambda g: (0, g),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, TILE), lambda g: (0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, 128), jnp.float32)],
    )(x)


def _dc_chain_kernel(hi_ref, lo_ref, t_ref, o_ref, carry, *, T, B):
    """Fused hexamer-table lookup + mod-3 phase prefix sum for one tile.

    hi/lo: (1, T) int32 code parts, split 7/5 (hi = code >> 5) so the
    one-hot contraction's K dimension is a full 128 — the 6/6 split
    padded K 64->128 on the MXU and doubled the effective MACs; t_ref:
    (B, 4096) per-bin table pre-reshaped to (B*32lo, 128hi).

    The phase prefix sum runs as ONE stride-3 log-shift scan (shifts
    3*2^k): a stride-3 inclusive scan sums exactly the same-phase
    prefix, with no per-phase masking or recombination (3x fewer vector
    ops than three masked scans).  Association order differs from
    jnp.cumsum — inside the scoring drift contract."""
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        carry[...] = jnp.zeros((B, 128), jnp.float32)

    hi = hi_ref[...]                     # (1, T)
    lo = lo_ref[...]
    i128 = jax.lax.broadcasted_iota(jnp.int32, (128, T), 0)
    i32 = jax.lax.broadcasted_iota(jnp.int32, (32, T), 0)
    ohh = (i128 == hi).astype(jnp.float32)         # (128h, T)
    ohl = (i32 == lo).astype(jnp.float32)          # (32l, T)

    rows = jax.lax.dot_general(
        t_ref[...], ohh, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)        # (B*32l, T)
    x = jnp.sum(rows.reshape(B, 32, T) * ohl[None], axis=1)   # (B, T)

    lane = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    l128 = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
    ph = (lane + (g * T) % 3) % 3
    c = carry[...]
    s = x
    sh = 3
    while sh < T:
        rolled = pltpu.roll(s, sh, axis=1)
        s = s + jnp.where(lane >= sh, rolled, 0.0)
        sh *= 2
    # incoming carry: add this row's phase total from the previous tiles
    c0 = jnp.sum(jnp.where(l128 == 0, c, 0.0), axis=1)[:, None]
    c1 = jnp.sum(jnp.where(l128 == 1, c, 0.0), axis=1)[:, None]
    c2 = jnp.sum(jnp.where(l128 == 2, c, 0.0), axis=1)[:, None]
    o_ref[...] = s + jnp.where(ph == 0, c0, jnp.where(ph == 1, c1, c2))
    # new carry: the inclusive scan's last three lanes hold the three
    # phase totals of this tile (lane T-1-k has phase (T-1-k+off)%3)
    tail = s[:, T - 128:]
    lt = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
    upd = jnp.zeros((B, 128), jnp.float32)
    for k in range(3):
        tot = jnp.sum(jnp.where(lt == 127 - k, tail, 0.0), axis=1)
        phk = (T - 1 - k + (g * T) % 3) % 3
        upd = upd + jnp.where(l128 == phk, tot[:, None], 0.0)
    carry[...] = c + upd


def dc_phase_cumsum(table, codes, TILE=2048):
    """Cf/Cr in one pass: `phase_cumsum(lookup(table, codes))` for a
    geometry-shared (1, S) code row and a (B, 4096) per-bin table.

    The separate lookup materializes a (B, S, 64) one-hot row
    intermediate in HBM (~10 GB of traffic on a 2.5 Mbp contig); fused,
    only the codes stream in and the prefix sums stream out.  Same
    f32-rounding caveat as phase_cumsum.  Caller guarantees S % TILE ==
    0 and a TPU backend."""
    B = table.shape[0]
    S = codes.shape[1]
    assert S % TILE == 0
    hi = (codes >> 5).astype(jnp.int32)
    lo = (codes & 31).astype(jnp.int32)
    kernel = functools.partial(_dc_chain_kernel, T=TILE, B=B)
    return pl.pallas_call(
        kernel,
        grid=(S // TILE,),
        in_specs=[
            pl.BlockSpec((1, TILE), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B * 32, 128), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, TILE), lambda g: (0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, 128), jnp.float32)],
    )(hi, lo,
      table.reshape(B, 128, 32).transpose(0, 2, 1).reshape(B * 32, 128))
