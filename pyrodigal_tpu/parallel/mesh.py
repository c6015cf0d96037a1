"""Device-mesh primitives: contig sharding and psum-merged training stats."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import dp_jax

CONTIG_AXIS = "contigs"


def make_mesh(n_devices=None):
    """A 1-D mesh over all (or the first n) devices, axis "contigs"."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (CONTIG_AXIS,))


def hexamer_background_counts(digits, comp_digits):
    """Hexamer counts over both strands of a digit tensor (padded with N=6).

    Device analog of the background pass of `calc_dicodon_gene`
    (reference: lib.pyx:4309-4318): every position i contributes the 6-mer
    at i on the forward strand and the reverse 6-mer read from the
    complement.  Padding positions (digit > 3) are excluded.
    """
    d = digits.astype(jnp.int32)
    c = comp_digits.astype(jnp.int32)
    n = d.shape[0]

    def mer6(x):
        idx = jnp.zeros(n - 5, jnp.int32)
        ok = jnp.ones(n - 5, bool)
        for j in range(6):
            b = jax.lax.dynamic_slice(x, (j,), (n - 5,))
            idx = idx | ((b & 3) << (2 * j))
            ok = ok & (b <= 6)
        return idx, ok

    fwd_idx, fwd_ok = mer6(d)
    valid = jnp.ones(n - 5, bool)
    # positions containing any padding sentinel (7) are dropped
    for j in range(6):
        b = jax.lax.dynamic_slice(d, (j,), (n - 5,))
        valid = valid & (b != 7)
    counts = jnp.zeros(4096, jnp.int32).at[fwd_idx].add(valid.astype(jnp.int32))
    rev_idx, _ = mer6(c)
    validr = jnp.ones(n - 5, bool)
    for j in range(6):
        b = jax.lax.dynamic_slice(c, (j,), (n - 5,))
        validr = validr & (b != 7)
    counts = counts.at[rev_idx].add(validr.astype(jnp.int32))
    return counts


def distributed_training_step(mesh, digits_batch, comp_batch):
    """One data-parallel training-statistics step over a contig shard.

    Each device computes the hexamer background table for its shard of
    contigs and the tables are `psum`-merged across the mesh — the TPU
    equivalent of accumulating `calc_mer_bg` over all training contigs
    (BASELINE.json: "hexamer count accumulation during training merged via
    psum").
    """

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(CONTIG_AXIS, None), P(CONTIG_AXIS, None)),
        out_specs=P(),
    )
    def step(digits, comp):
        local = jax.vmap(hexamer_background_counts)(digits, comp).sum(axis=0)
        return jax.lax.psum(local, CONTIG_AXIS)

    return jax.jit(step)(digits_batch, comp_batch)


def distributed_training_tallies(mesh, digits, comp, fwd_mask, rev_mask,
                                 type_ids, type_ok, rbs_ids, rbs_ok,
                                 ups_codes, ups_ok):
    """All of training's count tables for a contig shard, psum-merged.

    Per device, from its shard of contigs: background + gene hexamer
    tallies (reference: lib.pyx:4284-4358), start-type counts
    (lib.pyx:4432-4452), RBS-motif counts (lib.pyx:4456-4475) and the
    32x4 upstream-composition tally (lib.pyx:4360-4389) — every table a
    pure sum, so the cross-device merge is one `psum` each (the TPU
    analog of accumulating the `_training` counters over all training
    contigs on one host).

    digits/comp: (G, L) uint8; fwd_mask/rev_mask: (G, L) bool marking
    coding positions per strand; type_ids/rbs_ids: (G, NG) int with
    validity masks; ups_codes: (G, NG, 32) int in [0, 4) with ups_ok.
    Returns dict of replicated tables: bg (4096,), gene_dc (4096,),
    type (3,), rbs (28,), ups (32, 4).
    """

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(CONTIG_AXIS, None),) * 4
        + (P(CONTIG_AXIS, None),) * 4
        + (P(CONTIG_AXIS, None, None),) * 2,
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )
    def step(d, c, fm, rm, ty, tok, rb, rok, up, uok):
        bg = jax.vmap(hexamer_background_counts)(d, c).sum(axis=0)

        def gene_counts(dd, cc, fmm, rmm):
            n = dd.shape[0]

            def mer6(x):
                idx = jnp.zeros(n - 5, jnp.int32)
                for j in range(6):
                    b = jax.lax.dynamic_slice(x, (j,), (n - 5,))
                    idx = idx | ((b.astype(jnp.int32) & 3) << (2 * j))
                return idx
            fidx = mer6(dd)
            ridx = mer6(cc)
            cnt = jnp.zeros(4096, jnp.int32)
            cnt = cnt.at[fidx].add(fmm[:n - 5].astype(jnp.int32))
            cnt = cnt.at[ridx].add(rmm[:n - 5].astype(jnp.int32))
            return cnt

        gdc = jax.vmap(gene_counts)(d, c, fm, rm).sum(axis=0)
        tcnt = jnp.sum(
            jax.nn.one_hot(ty, 3, dtype=jnp.int32)
            * tok[..., None].astype(jnp.int32), axis=(0, 1))
        rcnt = jnp.sum(
            jax.nn.one_hot(rb, 28, dtype=jnp.int32)
            * rok[..., None].astype(jnp.int32), axis=(0, 1))
        ucnt = jnp.sum(
            jax.nn.one_hot(up, 4, dtype=jnp.int32)
            * uok[..., None].astype(jnp.int32), axis=(0, 1))
        return (jax.lax.psum(bg, CONTIG_AXIS),
                jax.lax.psum(gdc, CONTIG_AXIS),
                jax.lax.psum(tcnt, CONTIG_AXIS),
                jax.lax.psum(rcnt, CONTIG_AXIS),
                jax.lax.psum(ucnt, CONTIG_AXIS))

    bg, gdc, tcnt, rcnt, ucnt = jax.jit(step)(
        digits, comp, fwd_mask, rev_mask, type_ids, type_ok, rbs_ids,
        rbs_ok, ups_codes, ups_ok)
    return {"bg": bg, "gene_dc": gdc, "type": tcnt, "rbs": rcnt,
            "ups": ucnt}


def sharded_dp(mesh, geometry, per_bin, st_wt, W):
    """Run the scan DP for a batch of (contig, bin) work items sharded over
    the mesh contig axis.

    geometry: dict of (G, n) arrays (ndx, stop_val, typ, strand, win_lo,
    valid), per_bin: dict of (G, n[, 3]) arrays (cs, rscore, uscore,
    star_ptr); G must be divisible by the mesh size.
    """
    ndx, sv, typ, strand, win_lo, valid = (
        geometry["ndx"], geometry["stop_val"], geometry["typ"],
        geometry["strand"], geometry["win_lo"], geometry["valid"],
    )
    cs, rs, us, sp = (
        per_bin["cs"], per_bin["rscore"], per_bin["uscore"],
        per_bin["star_ptr"],
    )

    spec_g = P(CONTIG_AXIS, None)
    spec_sp = P(CONTIG_AXIS, None, None)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec_g,) * 6 + (spec_g, spec_g, spec_g, spec_sp, P(CONTIG_AXIS)),
        out_specs=(spec_g, spec_g, spec_g),
        check_vma=False,
    )
    def run(ndx_, sv_, typ_, strand_, winlo_, valid_, cs_, rs_, us_, sp_, wt_):
        fn = jax.vmap(
            lambda a, b, c, d, e, f, g, h, i, j, k: dp_jax.dp_scores.__wrapped__(
                a, b, c, d, e, f, g, h, i, j, k, W
            )
        )
        return fn(ndx_, sv_, typ_, strand_, cs_, rs_, us_, sp_, winlo_,
                  valid_, wt_)[0:3]

    return jax.jit(run)(ndx, sv, typ, strand, win_lo, valid, cs, rs, us,
                        sp, st_wt)
