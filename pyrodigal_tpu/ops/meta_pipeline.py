"""Batched metagenomic gene calling: the bin sweep as a device batch axis.

The reference's meta mode runs a full scoring + DP pass per candidate bin,
sequentially (reference: lib.pyx:5317-5396).  Here all bins that share a
translation table reuse one node geometry, their per-bin score tensors are
stacked, and a single vmapped scan computes every bin's dynamic program at
once.  The winning bin (highest terminal path score, first on ties, like
the sequential reference) is then finished on the host with the exact C
tail (traceback, disentangling, bad-gene elimination, start tweaking).
"""

import ctypes
import functools

import numpy as np
import jax
import jax.numpy as jnp

from .._constants import STOP
from .. import _native
from ..sequence import Sequence
from ..nodes import Nodes
from ..genes import Genes
from . import dp_jax


@functools.partial(jax.jit, static_argnames=("W",))
def _dp_batched(ndx, stop_val, typ, strand, cs, rscore, uscore, star_ptr,
                win_lo, valid, st_wt, W):
    """vmapped DP over the bin axis; geometry tensors are shared."""
    fn = jax.vmap(
        lambda c, r, u, sp, w: dp_jax.dp_scores.__wrapped__(
            ndx, stop_val, typ, strand, c, r, u, sp, win_lo, valid, w, W
        ),
        in_axes=(0, 0, 0, 0, 0),
    )
    score, traceb, ov = fn(cs, rscore, uscore, star_ptr, st_wt)
    # terminal path score per bin: max over 3'fwd / 5'rev nodes
    terminal = valid & (
        ((strand == 1) & (typ == STOP)) | ((strand == -1) & (typ != STOP))
    )
    best = jnp.max(jnp.where(terminal[None, :], score, -1.0), axis=1)
    return score, traceb, ov, best


class MetaRunner:
    """Device-batched meta-mode runner over a fixed set of bins."""

    def __init__(self, metagenomic_bins, *, closed=False, min_gene=90,
                 min_edge_gene=60, max_overlap=60, mask=False, min_mask=50):
        self.bins = metagenomic_bins
        self.closed = closed
        self.min_gene = min_gene
        self.min_edge_gene = min_edge_gene
        self.max_overlap = max_overlap
        self.mask = mask
        self.min_mask = min_mask

    def _candidate_bins(self, seq):
        low = min(0.65, 0.88495 * seq.gc - 0.0102337)
        high = max(0.35, 0.86596 * seq.gc + 0.1131991)
        out = []
        for i in range(len(self.bins)):
            tinf = self.bins[i].training_info
            if low <= tinf.gc <= high:
                out.append(i)
        return out

    def _extract(self, seq, tt):
        nodes = Nodes()
        nodes.extract(
            seq, translation_table=tt, closed=self.closed,
            min_gene=self.min_gene, min_edge_gene=self.min_edge_gene,
        )
        nodes.sort()
        return nodes

    def find_genes(self, sequence, num_seq=1):
        seq = Sequence(sequence, mask=self.mask, mask_size=self.min_mask)
        genes = Genes()
        genes._num_seq = num_seq
        genes.meta = True
        genes.sequence = seq

        cand = self._candidate_bins(seq)
        if not cand:
            genes.nodes = Nodes()
            genes.metagenomic_bin = None
            genes.training_info = None
            return genes

        # group candidate bins by translation table, preserving order
        groups = []
        for i in cand:
            tt = self.bins[i].training_info.translation_table
            if groups and groups[-1][0] == tt:
                groups[-1][1].append(i)
            else:
                groups.append((tt, [i]))

        best_bin = -1
        best_score = -100.0
        best_state = None

        for tt, bin_ids in groups:
            nodes = self._extract(seq, tt)
            n = nodes.length
            if n == 0:
                continue
            ndx = nodes.ndx[:n].astype(np.int32)
            sv = nodes.stop_val[:n].astype(np.int32)
            typ = nodes.type[:n].astype(np.int32)
            strand = nodes.strand[:n].astype(np.int32)
            win_lo = dp_jax.window_starts(ndx, sv, typ, strand)
            ext = int((np.arange(n) - win_lo).max()) if n else 1
            W = max(256, int(np.ceil(ext / 256) * 256))

            # per-bin host scoring (C engine); snapshots feed the device DP
            snaps = []
            for b in bin_ids:
                tinf = self.bins[b].training_info
                nodes.reset_scores()
                nodes.score_nodes(seq, tinf, closed=self.closed, is_meta=True)
                nodes.record_overlapping_starts(tinf, 1, self.max_overlap)
                snaps.append({
                    "cs": (nodes.cscore[:n] + nodes.sscore[:n]).astype(np.float32),
                    "cscore": nodes.cscore[:n].copy(),
                    "sscore": nodes.sscore[:n].copy(),
                    "rscore": nodes.rscore[:n].copy(),
                    "uscore": nodes.uscore[:n].copy(),
                    "tscore": nodes.tscore[:n].copy(),
                    "gc_cont": nodes.gc_cont[:n].copy(),
                    "rbs0": nodes.rbs0[:n].copy(),
                    "rbs1": nodes.rbs1[:n].copy(),
                    "mot": (nodes.mot_ndx[:n].copy(), nodes.mot_len[:n].copy(),
                            nodes.mot_spacer[:n].copy(),
                            nodes.mot_spacendx[:n].copy(),
                            nodes.mot_score[:n].copy()),
                    "star_ptr": nodes.star_ptr[:n * 3].reshape(n, 3).copy(),
                    "edge": nodes.edge[:n].copy(),
                })

            B = len(bin_ids)
            cs = np.stack([s["cs"] for s in snaps])
            rs = np.stack([s["rscore"].astype(np.float32) for s in snaps])
            us = np.stack([s["uscore"].astype(np.float32) for s in snaps])
            sp = np.stack([s["star_ptr"].astype(np.int32) for s in snaps])
            wt = np.array(
                [self.bins[b].training_info.start_weight for b in bin_ids],
                dtype=np.float32,
            )

            score, traceb, ov, best = _dp_batched(
                jnp.asarray(ndx), jnp.asarray(sv), jnp.asarray(typ),
                jnp.asarray(strand), jnp.asarray(cs), jnp.asarray(rs),
                jnp.asarray(us), jnp.asarray(sp), jnp.asarray(win_lo),
                jnp.ones(n, bool), jnp.asarray(wt), W=W,
            )
            best = np.asarray(best)
            for k, b in enumerate(bin_ids):
                if best[k] > best_score:
                    best_score = float(best[k])
                    best_bin = b
                    best_state = (tt, nodes, snaps[k],
                                  np.asarray(score[k], dtype=np.float64),
                                  np.asarray(traceb[k]), np.asarray(ov[k]))

        if best_bin < 0 or best_state is None:
            genes.nodes = Nodes()
            genes.metagenomic_bin = None
            genes.training_info = None
            return genes

        tt, nodes, snap, score, traceb, ov = best_state
        tinf = self.bins[best_bin].training_info
        n = nodes.length
        # restore the winning bin's node scoring state + DP arrays
        nodes.cscore[:n] = snap["cscore"]
        nodes.sscore[:n] = snap["sscore"]
        nodes.rscore[:n] = snap["rscore"]
        nodes.uscore[:n] = snap["uscore"]
        nodes.tscore[:n] = snap["tscore"]
        nodes.gc_cont[:n] = snap["gc_cont"]
        nodes.rbs0[:n] = snap["rbs0"]
        nodes.rbs1[:n] = snap["rbs1"]
        (nodes.mot_ndx[:n], nodes.mot_len[:n], nodes.mot_spacer[:n],
         nodes.mot_spacendx[:n], nodes.mot_score[:n]) = snap["mot"]
        nodes.star_ptr[:n * 3] = snap["star_ptr"].ravel()
        nodes.edge[:n] = snap["edge"]
        nodes.score[:n] = score
        nodes.traceb[:n] = traceb
        nodes.ov_mark[:n] = ov

        s = nodes._struct()
        ipath = _native.lib.rc_dp_finish(ctypes.byref(s))
        if n > 0:
            nodes.eliminate_bad_genes(ipath, tinf)
        genes._extract(nodes, ipath)
        genes._tweak_final_starts(nodes, tinf, self.max_overlap)

        # recover a clean rescored node state for the writers, mirroring the
        # reference (lib.pyx:5380-5394); gene records index into the same
        # deterministic node geometry
        final_nodes = self._extract(seq, tt)
        final_nodes.reset_scores()
        final_nodes.score_nodes(seq, tinf, closed=self.closed, is_meta=True)
        genes.nodes = final_nodes
        genes.metagenomic_bin = self.bins[best_bin]
        genes.training_info = tinf
        return genes
