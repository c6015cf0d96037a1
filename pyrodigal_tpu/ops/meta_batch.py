"""High-throughput meta mode: many contigs x bins in one Pallas launch.

Work items (contig, bin) are gathered across a stream of contigs, padded to
a fixed (B, N) shape (so a single kernel compilation serves the whole run,
with the persistent compilation cache making it a one-time cost), scored on
the host with the exact C engine in a thread pool (the C calls release the
GIL), and swept by the batched VMEM-resident DP kernel.  Winning bins are
finished with the exact C tail.
"""

import ctypes
import concurrent.futures
import functools

import numpy as np
import jax
import jax.numpy as jnp

from .. import _native
from ..sequence import Sequence
from ..nodes import Nodes
from ..genes import Genes
from . import dp_jax, dp_pallas


@jax.jit
def _terminal_best(score, terminal):
    return jnp.max(jnp.where(terminal, score, -1.0), axis=1)


class BatchMetaRunner:
    """Batched meta-mode gene calling over contig streams."""

    def __init__(self, metagenomic_bins, *, closed=False, min_gene=90,
                 min_edge_gene=60, max_overlap=60, mask=False, min_mask=50,
                 node_bucket=3072, batch_size=32, scoring_threads=8,
                 window=1024, interpret=False):
        self.bins = metagenomic_bins
        self.closed = closed
        self.min_gene = min_gene
        self.min_edge_gene = min_edge_gene
        self.max_overlap = max_overlap
        self.mask = mask
        self.min_mask = min_mask
        self.node_bucket = node_bucket
        self.batch_size = batch_size
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
        """All work items for one contig: [(bin_id, scored_nodes, win_lo)].

        `win_lo` (the per-node DP window start, incl. the giant-ORF
        extension) depends only on the node geometry, so it is computed
        once per translation table and shared across bins.
        """
        cand = self._candidate_bins(seq)
        items = []
        by_tt = {}
        winlo_tt = {}
        for b in cand:
            tt = self.bins[b].training_info.translation_table
            if tt not in by_tt:
                nodes = self._extract(seq, tt)
                by_tt[tt] = nodes
                nn = nodes.length
                winlo_tt[tt] = dp_jax.window_starts(
                    nodes.ndx[:nn].astype(np.int64),
                    nodes.stop_val[:nn].astype(np.int64),
                    nodes.type[:nn], nodes.strand[:nn],
                ).astype(np.int32)
        futures = {
            b: self.pool.submit(
                self._score_item, seq,
                by_tt[self.bins[b].training_info.translation_table], b,
            )
            for b in cand
        }
        for b in cand:
            tt = self.bins[b].training_info.translation_table
            items.append((b, futures[b].result(), winlo_tt[tt]))
        return items

    # -- the batched sweep -------------------------------------------------

    def _sweep(self, work):
        """work: list of (contig_idx, bin_id, scored_nodes, win_lo).  Packs
        the batch into two host stacks, runs the fused DP + terminal-best
        jit in a single dispatch, and leaves results device-resident."""
        if not work:
            return []
        B = self.batch_size
        n = self.node_bucket
        W = self.window

        geometry = {
            "ndx": np.zeros((B, n), np.int32),
            "stop_val": np.zeros((B, n), np.int32),
            "typ": np.zeros((B, n), np.int32),
            "strand": np.ones((B, n), np.int32),
            "win_lo": np.zeros((B, n), np.int32),
            "valid": np.zeros((B, n), np.int32),
        }
        per_bin = {
            "cs": np.zeros((B, n), np.float32),
            "rscore": np.zeros((B, n), np.float32),
            "uscore": np.zeros((B, n), np.float32),
            "star_ptr": np.full((B, n, 3), -1, np.int32),
        }
        st_wt = np.full(B, 4.35, np.float32)

        for k, (_, bin_id, nodes, win_lo) in enumerate(work):
            nn = nodes.length
            assert nn <= n, (nn, n)
            geometry["ndx"][k, :nn] = nodes.ndx[:nn]
            geometry["stop_val"][k, :nn] = nodes.stop_val[:nn]
            geometry["typ"][k, :nn] = nodes.type[:nn]
            geometry["strand"][k, :nn] = nodes.strand[:nn]
            geometry["win_lo"][k, :nn] = win_lo
            geometry["valid"][k, :nn] = 1
            geometry["win_lo"][k, nn:] = np.arange(nn, n, dtype=np.int32)
            per_bin["cs"][k, :nn] = nodes.cscore[:nn] + nodes.sscore[:nn]
            per_bin["rscore"][k, :nn] = nodes.rscore[:nn]
            per_bin["uscore"][k, :nn] = nodes.uscore[:nn]
            per_bin["star_ptr"][k, :nn] = (
                nodes.star_ptr[:nn * 3].reshape(nn, 3)
            )
            st_wt[k] = self.bins[bin_id].training_info.start_weight

        ints, flts, NP = dp_pallas.pack_batch(geometry, per_bin, st_wt, W)
        score, traceb, ov, best = dp_pallas._run_kernel_packed(
            jnp.asarray(ints), jnp.asarray(flts), W, NP, B,
            dp_pallas.FIXED_CHUNKS, self.interpret,
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

        Contigs whose node count exceeds the kernel bucket fall back to the
        sequential exact C meta path.
        """
        contigs = []
        all_items = []
        oversized = {}
        for ci, s in enumerate(sequences):
            seq = Sequence(s, mask=self.mask, mask_size=self.min_mask)
            contigs.append(seq)
            items = self._prepare_contig(seq)
            if any(
                sc.length > self.node_bucket
                or (sc.length and int(
                    (np.arange(sc.length) - wl).max()
                ) > dp_pallas.FIXED_CHUNKS * self.window)
                for (_b, sc, wl) in items
            ):
                oversized[ci] = True
                continue
            for (b, scored, win_lo) in items:
                all_items.append((ci, b, scored, win_lo))

        # sweep in fixed-size batches (device-resident results)
        launches = []
        for ofs in range(0, len(all_items), self.batch_size):
            chunk = all_items[ofs:ofs + self.batch_size]
            res = self._sweep(chunk)
            if res:
                launches.append(res)

        # single D2H pull of every item's terminal best score
        if launches:
            all_best = np.asarray(
                jnp.concatenate([r["best"] for r in launches])
            )
        else:
            all_best = np.zeros(0, np.float32)

        # pick each contig's best bin (first on ties, like the reference)
        best = {}
        pos = 0
        for li, r in enumerate(launches):
            for k, (ci, b, nodes, _wl) in enumerate(r["work"]):
                sc = float(all_best[pos])
                pos += 1
                if ci not in best or sc > best[ci][0]:
                    best[ci] = (sc, b, nodes, (li, k))

        # gather the winners' DP rows in one device op + one D2H pull
        winners = sorted(best.items())
        if winners:
            rows_s = jnp.stack([
                launches[li]["score"][k] for _, (_, _, _, (li, k)) in winners
            ])
            rows_t = jnp.stack([
                launches[li]["traceb"][k] for _, (_, _, _, (li, k)) in winners
            ])
            rows_o = jnp.stack([
                launches[li]["ov"][k] for _, (_, _, _, (li, k)) in winners
            ])
            rows_s = np.asarray(rows_s)
            rows_t = np.asarray(rows_t)
            rows_o = np.asarray(rows_o)
            for w, (ci, (sc, b, nodes, _lk)) in enumerate(winners):
                # kernel outputs span the full padded axis: logical node j
                # lives at physical column W + j, and traceb VALUES are
                # physical too — shift both back to logical indices.
                W = launches[0]["W"]
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
