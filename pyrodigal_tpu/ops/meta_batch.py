"""High-throughput meta mode: many contigs x bins in one Pallas launch.

Work items (contig, bin) are gathered across a stream of contigs and swept
by the grid-blocked VMEM-resident DP kernel in launches of `batch_size`
items.  The launch path is transfer-minimal (the device link is the
bottleneck, not the DP): per item only the three per-bin score vectors and
the star pointers cross the link, each distinct (contig, translation-table)
geometry crosses ONCE, and every derived table is computed on device
(dp_pallas._launch).  Host scoring runs in a thread pool on the exact C
engine (the C calls release the GIL); winning bins are finished with the
exact C tail.
"""

import ctypes
import concurrent.futures

import numpy as np
import jax.numpy as jnp

from .. import _native
from ..sequence import Sequence
from ..nodes import Nodes
from ..genes import Genes
from . import dp_jax, dp_pallas


class BatchMetaRunner:
    """Batched meta-mode gene calling over contig streams."""

    def __init__(self, metagenomic_bins, *, closed=False, min_gene=90,
                 min_edge_gene=60, max_overlap=60, mask=False, min_mask=50,
                 node_bucket=3072, batch_size=128, block_size=8,
                 max_geoms=16, scoring_threads=8, window=1024,
                 interpret=False):
        self.bins = metagenomic_bins
        self.closed = closed
        self.min_gene = min_gene
        self.min_edge_gene = min_edge_gene
        self.max_overlap = max_overlap
        self.mask = mask
        self.min_mask = min_mask
        self.node_bucket = node_bucket
        self.batch_size = (batch_size + block_size - 1) // block_size \
            * block_size
        self.block_size = block_size
        self.max_geoms = max_geoms
        self.window = window
        self.interpret = interpret
        self.pool = concurrent.futures.ThreadPoolExecutor(scoring_threads)

    # -- per-contig preparation (host, C engine) ---------------------------

    def _candidate_bins(self, seq):
        low = min(0.65, 0.88495 * seq.gc - 0.0102337)
        high = max(0.35, 0.86596 * seq.gc + 0.1131991)
        return [
            i for i in range(len(self.bins))
            if low <= self.bins[i].training_info.gc <= high
        ]

    def _extract(self, seq, tt):
        nodes = Nodes()
        nodes.extract(
            seq, translation_table=tt, closed=self.closed,
            min_gene=self.min_gene, min_edge_gene=self.min_edge_gene,
        )
        nodes.sort()
        return nodes

    def _score_item(self, seq, base_nodes, bin_id):
        """Score one (contig, bin) item on a private node copy."""
        tinf = self.bins[bin_id].training_info
        nodes = base_nodes.copy()
        nodes.reset_scores()
        nodes.score_nodes(seq, tinf, closed=self.closed, is_meta=True)
        nodes.record_overlapping_starts(tinf, 1, self.max_overlap)
        return nodes

    def _prepare_contig(self, seq):
        """Work items and geometries for one contig.

        Returns (items, geoms): items = [(bin_id, scored_nodes, tt)],
        geoms = {tt: geometry dict}.  Geometry (incl. the per-node DP
        window start with the giant-ORF extension) depends only on the
        node layout, so it is computed once per translation table and
        shared across bins.
        """
        cand = self._candidate_bins(seq)
        items = []
        geoms = {}
        by_tt = {}
        for b in cand:
            tt = self.bins[b].training_info.translation_table
            if tt not in by_tt:
                nodes = self._extract(seq, tt)
                by_tt[tt] = nodes
                nn = nodes.length
                win_lo = dp_jax.window_starts(
                    nodes.ndx[:nn].astype(np.int64),
                    nodes.stop_val[:nn].astype(np.int64),
                    nodes.type[:nn], nodes.strand[:nn],
                ).astype(np.int32)
                geoms[tt] = {
                    "ndx": nodes.ndx[:nn].astype(np.int32),
                    "stop_val": nodes.stop_val[:nn].astype(np.int32),
                    "typ": nodes.type[:nn].astype(np.int32),
                    "strand": nodes.strand[:nn].astype(np.int32),
                    "win_lo": win_lo,
                    "nn": nn,
                }
        futures = {
            b: self.pool.submit(
                self._score_item, seq,
                by_tt[self.bins[b].training_info.translation_table], b,
            )
            for b in cand
        }
        for b in cand:
            tt = self.bins[b].training_info.translation_table
            items.append((b, futures[b].result(), tt))
        return items, geoms

    # -- the batched sweep -------------------------------------------------

    def _sweep(self, work, geoms):
        """work: list of (contig_idx, bin_id, scored_nodes, geom_key);
        geoms: {geom_key: geometry dict}.  Packs the primary inputs, runs
        the fused on-device precompute + grid DP + terminal-best jit in a
        single dispatch, and leaves results device-resident."""
        if not work:
            return None
        BT = self.batch_size
        n = self.node_bucket
        W = self.window
        G = self.max_geoms
        assert len(work) <= BT and len(geoms) <= G

        geom = np.zeros((6, G, n), np.int32)
        geom[3] = 1  # strand pad: 1
        gmap = {}
        for gi, (key, gd) in enumerate(geoms.items()):
            gmap[key] = gi
            nn = gd["nn"]
            geom[0, gi, :nn] = gd["ndx"]
            geom[1, gi, :nn] = gd["stop_val"]
            geom[2, gi, :nn] = gd["typ"]
            geom[3, gi, :nn] = gd["strand"]
            geom[4, gi, :nn] = gd["win_lo"]
            geom[4, gi, nn:] = np.arange(nn, n, dtype=np.int32)
            geom[5, gi, :nn] = 1

        scores = np.zeros((3, BT, n), np.float32)
        sp = np.full((3, BT, n), -1, np.int16)
        gidx = np.zeros(BT, np.int32)
        st_wt = np.full(BT, 4.35, np.float32)

        for k, (_, bin_id, nodes, gkey) in enumerate(work):
            nn = nodes.length
            assert nn <= n, (nn, n)
            scores[0, k, :nn] = nodes.cscore[:nn] + nodes.sscore[:nn]
            scores[1, k, :nn] = nodes.rscore[:nn]
            scores[2, k, :nn] = nodes.uscore[:nn]
            sp[:, k, :nn] = nodes.star_ptr[:nn * 3].reshape(nn, 3).T
            gidx[k] = gmap[gkey]
            st_wt[k] = self.bins[bin_id].training_info.start_weight

        NP = W + int(np.ceil(n / 128) * 128) + 128
        score, traceb, ov, best = dp_pallas._launch(
            jnp.asarray(geom), jnp.asarray(scores), jnp.asarray(sp),
            jnp.asarray(gidx), jnp.asarray(st_wt),
            W, NP, BT, self.block_size, dp_pallas.FIXED_CHUNKS,
            self.interpret,
        )
        return {"score": score, "traceb": traceb, "ov": ov, "best": best,
                "work": work, "W": W}

    def _finish(self, genes, seq, bin_id, nodes, dp_state):
        tinf = self.bins[bin_id].training_info
        nn = nodes.length
        score, traceb, ov = dp_state
        nodes.score[:nn] = score.astype(np.float64)
        nodes.traceb[:nn] = traceb
        nodes.ov_mark[:nn] = ov
        s = nodes._struct()
        ipath = _native.lib.rc_dp_finish(ctypes.byref(s))
        if nn > 0:
            nodes.eliminate_bad_genes(ipath, tinf)
        genes._extract(nodes, ipath)
        genes._tweak_final_starts(nodes, tinf, self.max_overlap)
        genes.nodes = nodes
        genes.metagenomic_bin = self.bins[bin_id]
        genes.training_info = tinf
        return genes

    def find_genes_batch(self, sequences, num_seq_start=1):
        """Call genes on a list of sequences; returns a list of `Genes`.

        Contigs whose node count exceeds the kernel bucket (or whose
        giant-ORF window extension exceeds the fixed chunk budget) fall
        back to the sequential exact C meta path.
        """
        contigs = []
        oversized = {}
        per_contig = []  # (ci, items, geoms)
        budget = dp_pallas.FIXED_CHUNKS * self.window
        for ci, s in enumerate(sequences):
            seq = Sequence(s, mask=self.mask, mask_size=self.min_mask)
            contigs.append(seq)
            items, geoms = self._prepare_contig(seq)
            bad = any(
                gd["nn"] > self.node_bucket
                or (gd["nn"] and int(
                    (np.arange(gd["nn"]) - gd["win_lo"]).max()) > budget)
                for gd in geoms.values()
            )
            if bad:
                oversized[ci] = True
                continue
            per_contig.append((ci, items, geoms))

        # group into launches: <= batch_size items, <= max_geoms geometries
        # (a contig's items may be split across launches; winner selection
        # spans launches)
        launches = []
        cur_work, cur_geoms = [], {}
        for ci, items, geoms in per_contig:
            for (b, scored, tt) in items:
                key = (ci, tt)
                need_geom = key not in cur_geoms
                if cur_work and (
                    len(cur_work) + 1 > self.batch_size
                    or len(cur_geoms) + need_geom > self.max_geoms
                ):
                    launches.append(self._sweep(cur_work, cur_geoms))
                    cur_work, cur_geoms = [], {}
                if key not in cur_geoms:
                    cur_geoms[key] = geoms[tt]
                cur_work.append((ci, b, scored, key))
        if cur_work:
            launches.append(self._sweep(cur_work, cur_geoms))
        launches = [r for r in launches if r]

        # single D2H pull per launch of every item's terminal best score
        best = {}
        for li, r in enumerate(launches):
            lb = np.asarray(r["best"])
            for k, (ci, b, nodes, _g) in enumerate(r["work"]):
                sc = float(lb[k])
                if ci not in best or sc > best[ci][0]:
                    best[ci] = (sc, b, nodes, (li, k))

        # winner DP rows: one fixed-shape gather + D2H per launch
        win_by_launch = {}
        for ci, (_sc, _b, _nodes, (li, k)) in best.items():
            win_by_launch.setdefault(li, []).append((ci, k))
        for li, pairs in win_by_launch.items():
            r = launches[li]
            K = self.max_geoms
            idx = np.zeros(K, np.int32)
            for w, (_ci, k) in enumerate(pairs[:K]):
                idx[w] = k
            rows_s, rows_t, rows_o = dp_pallas._gather_rows(
                r["score"], r["traceb"], r["ov"], jnp.asarray(idx))
            rows_s, rows_t, rows_o = (
                np.asarray(rows_s), np.asarray(rows_t), np.asarray(rows_o))
            W = r["W"]
            for w, (ci, _k) in enumerate(pairs[:K]):
                sc, b, nodes, _lk = best[ci]
                # kernel outputs span the full padded axis: logical node j
                # lives at physical column W + j, and traceb VALUES are
                # physical too — shift both back to logical indices.
                nn = nodes.length
                tb = rows_t[w, W:W + nn] - W
                tb = np.where(tb >= -1, tb, -1)
                best[ci] = (sc, b, nodes,
                            (rows_s[w, W:W + nn], tb, rows_o[w, W:W + nn]))

        out = []
        for ci, seq in enumerate(contigs):
            if ci in oversized:
                from ..gene_finder import GeneFinder
                gf = GeneFinder(
                    meta=True, metagenomic_bins=self.bins,
                    closed=self.closed, mask=self.mask,
                    min_mask=self.min_mask, min_gene=self.min_gene,
                    min_edge_gene=self.min_edge_gene,
                    max_overlap=self.max_overlap,
                )
                gf._num_seq = num_seq_start + ci
                out.append(gf.find_genes(str(seq)))
                continue
            genes = Genes()
            genes._num_seq = num_seq_start + ci
            genes.meta = True
            genes.sequence = seq
            if ci in best and best[ci][0] > -100.0:
                _, b, nodes, state = best[ci]
                self._finish(genes, seq, b, nodes, state)
            else:
                genes.nodes = Nodes()
                genes.metagenomic_bin = None
                genes.training_info = None
            out.append(genes)
        return out
