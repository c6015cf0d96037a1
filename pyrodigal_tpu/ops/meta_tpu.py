"""Fully device-resident meta mode: scoring + DP fused in one dispatch.

The whole per-bin pipeline — node scoring, star pointers, connection DP —
runs on the accelerator (`score_device` + the Pallas kernel), so the host
cost per contig is node extraction plus the bin-independent index
precompute, and the exact C engine re-scores only the winning bin for
output fidelity (reference: lib.pyx:5317-5396 for the sequential bin
sweep this replaces).

Launch pipeline: work items are packed so a contig's bins never split
across launches, every launch selects each contig's winning bin ON DEVICE
(`score_device.pack_winners`) and returns one packed tensor, and the host
pulls launches in order while the device runs later launches — winner
rescore + finishing (exact C) overlaps device compute on a thread pool.
"""

import concurrent.futures

import numpy as np
import jax.numpy as jnp

from ..sequence import Sequence
from ..nodes import Nodes
from ..genes import Genes
from . import dp_pallas
from . import score_device as sd


class TpuMetaRunner:
    """Batched meta-mode gene calling with on-device per-bin scoring."""

    def __init__(self, metagenomic_bins, *, closed=False, min_gene=90,
                 min_edge_gene=60, max_overlap=60, mask=False, min_mask=50,
                 node_bucket=3072, seq_bucket=49152, batch_size=128,
                 block_size=16, max_geoms=16, relk=32, window=640,
                 prep_threads=8, interpret=False, mesh=None):
        self.bins = metagenomic_bins
        self.mesh = mesh
        self.closed = closed
        self.min_gene = min_gene
        self.min_edge_gene = min_edge_gene
        self.max_overlap = max_overlap
        self.mask = mask
        self.min_mask = min_mask
        self.node_bucket = node_bucket
        self.seq_bucket = (seq_bucket + 383) // 384 * 384
        self.batch_size = (batch_size + block_size - 1) // block_size \
            * block_size
        self.block_size = block_size
        self.max_geoms = max_geoms
        self.relk = relk
        self.window = window
        self.interpret = interpret
        self.tables = sd.BinTables(metagenomic_bins)
        self.pool = concurrent.futures.ThreadPoolExecutor(prep_threads)

    # -- host side -----------------------------------------------------------

    def _candidate_bins(self, seq):
        low = min(0.65, 0.88495 * seq.gc - 0.0102337)
        high = max(0.35, 0.86596 * seq.gc + 0.1131991)
        return [
            i for i in range(len(self.bins))
            if low <= self.bins[i].training_info.gc <= high
        ]

    def _prepare_contig(self, seq):
        """Returns (bin_ids, geoms, nodes_by_tt, fallback)."""
        cand = self._candidate_bins(seq)
        geoms, nodes_by_tt = {}, {}
        budget = dp_pallas.FIXED_CHUNKS * self.window
        fallback = seq.slen > self.seq_bucket
        for b in cand:
            tt = self.bins[b].training_info.translation_table
            if fallback or tt in geoms:
                continue
            nodes = Nodes()
            nodes.extract(
                seq, translation_table=tt, closed=self.closed,
                min_gene=self.min_gene, min_edge_gene=self.min_edge_gene,
            )
            nodes.sort()
            nodes_by_tt[tt] = nodes
            g = sd.prepare_geometry(seq, nodes, tt, self.closed,
                                    self.max_overlap, self.relk)
            nn = g["nn"]
            if (nn > self.node_bucket or g["star_overflow"]
                    or (nn and int((np.arange(nn) - g["win_lo"]).max())
                        > budget)):
                fallback = True
            geoms[tt] = g
        return cand, geoms, nodes_by_tt, fallback

    # -- device side -----------------------------------------------------------

    def _sweep(self, work, geoms, slots):
        """work: list of (ci, bin_id, geom_key); geoms: {key: geometry};
        slots: {ci: contig slot in [0, C)}.  Returns the device handle of
        the packed winner tensor (one pull per launch)."""
        # a single contig's bin list may exceed a small configured batch
        # size (tests); widen this launch to the next block multiple
        BT = max(self.batch_size,
                 (len(work) + self.block_size - 1)
                 // self.block_size * self.block_size)
        G = self.max_geoms
        n = self.node_bucket
        S = self.seq_bucket
        keys = list(geoms.keys())
        gmap = {k: i for i, k in enumerate(keys)}
        packed = sd.pack_geometries([geoms[k] for k in keys], G, n, S)
        bin_idx = np.zeros(BT, np.int32)
        gidx = np.zeros(BT, np.int32)
        slot_idx = np.full(BT, G, np.int32)      # G = "no slot" sentinel
        for k, (ci, b, gkey) in enumerate(work):
            bin_idx[k] = b
            gidx[k] = gmap[gkey]
            slot_idx[k] = slots[ci]
        geo = {k: jnp.asarray(v) for k, v in packed.items()}
        W = self.window
        NP = W + int(np.ceil(n / 128) * 128) + 128
        kwargs = dict(
            is_meta=True, closed=self.closed, S3=S // 3,
            has_nonsd=self.tables.any_nonsd, relk=self.relk,
            max_overlap=self.max_overlap, W=W, NP=NP,
            BLK=self.block_size, MAX_CHUNKS=dp_pallas.FIXED_CHUNKS,
            NB=n, C=G, interpret=self.interpret)
        if self.mesh is not None:
            from ..parallel.meta_shard import sharded_score_dp_launch_packed

            return sharded_score_dp_launch_packed(
                self.mesh, self.tables.as_tuple(), geo,
                jnp.asarray(bin_idx), jnp.asarray(gidx),
                jnp.asarray(slot_idx), **kwargs)
        return sd.score_dp_launch_packed(
            self.tables.as_tuple(), geo, jnp.asarray(bin_idx),
            jnp.asarray(gidx), jnp.asarray(slot_idx), **kwargs)

    # -- finishing (host, exact C on the winning bin) -------------------------

    def _finish(self, genes, seq, bin_id, nodes, dp_state):
        tinf = self.bins[bin_id].training_info
        nn = nodes.length
        score, traceb, ovm = dp_state
        nodes.score[:nn] = score.astype(np.float64)
        nodes.traceb[:nn] = traceb
        nodes.ov_mark[:nn] = ovm
        import ctypes
        from .. import _native
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

    def _score_winner(self, seq, nodes_by_tt, bin_id):
        tinf = self.bins[bin_id].training_info
        nodes = nodes_by_tt[tinf.translation_table].copy()
        nodes.reset_scores()
        # NOTE: runs concurrently on the prep pool — the refcore scoring /
        # finishing entry points are state-free (see refcore.c header)
        nodes.score_nodes(seq, tinf, closed=self.closed, is_meta=True)
        nodes.record_overlapping_starts(tinf, 1, self.max_overlap)
        return nodes

    # -- driver ----------------------------------------------------------------

    def _produce_fallback(self, seq, num_seq):
        """Oversized contig: sequential exact-C meta path."""
        from ..gene_finder import GeneFinder
        gf = GeneFinder(
            meta=True, metagenomic_bins=self.bins,
            closed=self.closed, mask=self.mask,
            min_mask=self.min_mask, min_gene=self.min_gene,
            min_edge_gene=self.min_edge_gene,
            max_overlap=self.max_overlap,
            backend="refcore",   # never back into this runner
        )
        gf._num_seq = num_seq
        return gf.find_genes(str(seq))

    def _produce_winner(self, seq, num_seq, bin_id, nodes_by_tt, rows):
        """Winner rescore (exact C) + finish for one contig."""
        genes = Genes()
        genes._num_seq = num_seq
        genes.meta = True
        genes.sequence = seq
        nodes = self._score_winner(seq, nodes_by_tt, bin_id)
        rows_s, rows_t, rows_o = rows
        nn = nodes.length
        W = self.window
        tb = rows_t[:nn] - W
        tb = np.where(tb >= -1, tb, -1)
        return self._finish(genes, seq, bin_id, nodes,
                            (rows_s[:nn], tb, rows_o[:nn]))

    def _produce_empty(self, seq, num_seq):
        genes = Genes()
        genes._num_seq = num_seq
        genes.meta = True
        genes.sequence = seq
        genes.nodes = Nodes()
        genes.metagenomic_bin = None
        genes.training_info = None
        return genes

    def find_genes_batch(self, sequences, num_seq_start=1):
        contigs, preps = [], []
        for s in sequences:
            seq = Sequence(s, mask=self.mask, mask_size=self.min_mask)
            contigs.append(seq)
            preps.append(self.pool.submit(self._prepare_contig, seq))

        futures = {}
        per_contig = []
        for ci, fut in enumerate(preps):
            cand, geoms, nodes_by_tt, fallback = fut.result()
            if fallback:
                futures[ci] = self.pool.submit(
                    self._produce_fallback, contigs[ci], num_seq_start + ci)
            elif not cand:
                futures[ci] = self.pool.submit(
                    self._produce_empty, contigs[ci], num_seq_start + ci)
            else:
                per_contig.append((ci, cand, geoms, nodes_by_tt))

        nodes_maps = {ci: nbt for ci, _c, _g, nbt in per_contig}

        # pack launches: a contig's bins never split across launches, and
        # each contig takes one winner slot (slots <= max_geoms because
        # every contig also consumes >= 1 geometry slot)
        launches = []      # each: {"work", "geoms", "slots"}
        cur_work, cur_geoms, cur_slots = [], {}, {}
        for ci, cand, geoms, _nbt in per_contig:
            tts = {self.bins[b].training_info.translation_table
                   for b in cand}
            if cur_work and (
                len(cur_work) + len(cand) > self.batch_size
                or len(cur_geoms) + len(tts) > self.max_geoms
            ):
                launches.append({"work": cur_work, "geoms": cur_geoms,
                                 "slots": cur_slots})
                cur_work, cur_geoms, cur_slots = [], {}, {}
            cur_slots[ci] = len(cur_slots)
            for b in cand:
                tt = self.bins[b].training_info.translation_table
                key = (ci, tt)
                if key not in cur_geoms:
                    cur_geoms[key] = geoms[tt]
                cur_work.append((ci, b, key))
        if cur_work:
            launches.append({"work": cur_work, "geoms": cur_geoms,
                             "slots": cur_slots})

        # dispatch every launch asynchronously; the device queue pipelines
        for L in launches:
            L["dev"] = self._sweep(L["work"], L["geoms"], L["slots"])

        # pull in order — while the host finishes launch k's contigs, the
        # device is already computing launch k+1
        NB = self.node_bucket
        for L in launches:
            arr = np.asarray(L["dev"])       # (C, 3*NB + 2), one transfer
            items_by_contig = {}
            for k, (ci, b, _g) in enumerate(L["work"]):
                items_by_contig.setdefault(ci, []).append((k, b))
            for ci, slot in L["slots"].items():
                row = arr[slot]
                win_item = int(row[3 * NB])
                best = float(np.int32(row[3 * NB + 1]).view(np.float32))
                win_bin = None
                if best > -100.0:
                    for k, b in items_by_contig[ci]:
                        if k == win_item:
                            win_bin = b
                            break
                if win_bin is None:
                    futures[ci] = self.pool.submit(
                        self._produce_empty, contigs[ci],
                        num_seq_start + ci)
                    continue
                rows_s = row[:NB].view(np.float32)
                rows_t = row[NB:2 * NB]
                rows_o = row[2 * NB:3 * NB]
                futures[ci] = self.pool.submit(
                    self._produce_winner, contigs[ci], num_seq_start + ci,
                    win_bin, nodes_maps[ci], (rows_s, rows_t, rows_o))

        return [futures[ci].result() for ci in range(len(contigs))]
