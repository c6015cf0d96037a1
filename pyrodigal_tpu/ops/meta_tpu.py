"""Fully device-resident meta mode: scoring + DP fused in one dispatch.

The whole per-bin pipeline — node scoring, star pointers, connection DP —
runs on the accelerator (`score_device` + the Pallas kernel), so the host cost
per contig is node extraction plus the bin-independent index precompute,
and the exact C engine re-scores only the winning bin for output fidelity
(reference: lib.pyx:5317-5396 for the sequential bin sweep this replaces).
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

    def _sweep(self, work, geoms):
        """work: list of (ci, bin_id, geom_key); geoms: {key: geometry}."""
        if not work:
            return None
        BT = self.batch_size
        G = self.max_geoms
        n = self.node_bucket
        S = self.seq_bucket
        keys = list(geoms.keys())
        gmap = {k: i for i, k in enumerate(keys)}
        packed = sd.pack_geometries([geoms[k] for k in keys], G, n, S)
        bin_idx = np.zeros(BT, np.int32)
        gidx = np.zeros(BT, np.int32)
        for k, (_ci, b, gkey) in enumerate(work):
            bin_idx[k] = b
            gidx[k] = gmap[gkey]
        geo = {k: jnp.asarray(v) for k, v in packed.items()}
        W = self.window
        NP = W + int(np.ceil(n / 128) * 128) + 128
        kwargs = dict(
            is_meta=True, closed=self.closed, S3=S // 3,
            has_nonsd=self.tables.any_nonsd, relk=self.relk,
            max_overlap=self.max_overlap, W=W, NP=NP,
            BLK=self.block_size, MAX_CHUNKS=dp_pallas.FIXED_CHUNKS,
            interpret=self.interpret)
        if self.mesh is not None:
            from ..parallel.meta_shard import sharded_score_dp_launch

            score, traceb, ov, best = sharded_score_dp_launch(
                self.mesh, self.tables.as_tuple(), geo,
                jnp.asarray(bin_idx), jnp.asarray(gidx), **kwargs)
        else:
            score, traceb, ov, best = sd.score_dp_launch(
                self.tables.as_tuple(), geo, jnp.asarray(bin_idx),
                jnp.asarray(gidx), **kwargs)
        return {"score": score, "traceb": traceb, "ov": ov, "best": best,
                "work": work, "W": W}

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
        nodes.score_nodes(seq, tinf, closed=self.closed, is_meta=True)
        nodes.record_overlapping_starts(tinf, 1, self.max_overlap)
        return nodes

    # -- driver ----------------------------------------------------------------

    def find_genes_batch(self, sequences, num_seq_start=1):
        contigs, preps = [], []
        for s in sequences:
            seq = Sequence(s, mask=self.mask, mask_size=self.min_mask)
            contigs.append(seq)
            preps.append(self.pool.submit(self._prepare_contig, seq))

        oversized = {}
        per_contig = []
        for ci, fut in enumerate(preps):
            cand, geoms, nodes_by_tt, fallback = fut.result()
            if fallback:
                oversized[ci] = True
                continue
            per_contig.append((ci, cand, geoms, nodes_by_tt))

        nodes_maps = {ci: nbt for ci, _c, _g, nbt in per_contig}

        # pack launches
        launches = []
        cur_work, cur_geoms = [], {}
        for ci, cand, geoms, _nbt in per_contig:
            for b in cand:
                tt = self.bins[b].training_info.translation_table
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
                cur_work.append((ci, b, key))
        if cur_work:
            launches.append(self._sweep(cur_work, cur_geoms))
        launches = [r for r in launches if r]

        # winner bin per contig: ONE stacked D2H for every launch's best
        # vector (tunnel round trips dominate small pulls)
        best = {}
        if launches:
            all_best = np.asarray(
                jnp.concatenate([r["best"] for r in launches]))
            for li, r in enumerate(launches):
                off = li * self.batch_size
                for k, (ci, b, _g) in enumerate(r["work"]):
                    sc = float(all_best[off + k])
                    if ci not in best or sc > best[ci][0]:
                        best[ci] = (sc, b, (li, k))

        # winner DP rows: fixed-shape packed gathers, ONE stacked D2H total
        win_rows = {}
        win_by_launch = {}
        for ci, (_sc, _b, (li, k)) in best.items():
            win_by_launch.setdefault(li, []).append((ci, k))
        pulls = []
        for li, pairs in win_by_launch.items():
            r = launches[li]
            K = self.max_geoms
            for base in range(0, len(pairs), K):
                chunk = pairs[base:base + K]
                idx = np.zeros(K, np.int32)
                for w, (_ci, k) in enumerate(chunk):
                    idx[w] = k
                pulls.append((chunk, r["W"], dp_pallas._gather_rows_packed(
                    r["score"], r["traceb"], r["ov"], jnp.asarray(idx),
                    W=r["W"], NB=self.node_bucket)))
        if pulls:
            stacked = np.asarray(jnp.stack([p[2] for p in pulls]))
            for pi, (chunk, W, _dev) in enumerate(pulls):
                rows_s = stacked[pi, 0].view(np.float32)
                rows_t = stacked[pi, 1]
                rows_o = stacked[pi, 2]
                for w, (ci, _k) in enumerate(chunk):
                    win_rows[ci] = (rows_s[w], rows_t[w], rows_o[w], W)

        # winner rescore + finish is exact-C host work per contig with no
        # shared state — run it on the prep thread pool
        def _produce(ci):
            seq = contigs[ci]
            if ci in oversized:
                from ..gene_finder import GeneFinder
                gf = GeneFinder(
                    meta=True, metagenomic_bins=self.bins,
                    closed=self.closed, mask=self.mask,
                    min_mask=self.min_mask, min_gene=self.min_gene,
                    min_edge_gene=self.min_edge_gene,
                    max_overlap=self.max_overlap,
                    backend="refcore",   # never back into this runner
                )
                gf._num_seq = num_seq_start + ci
                return gf.find_genes(str(seq))
            genes = Genes()
            genes._num_seq = num_seq_start + ci
            genes.meta = True
            genes.sequence = seq
            if ci in best and best[ci][0] > -100.0:
                _sc, b, _lk = best[ci]
                nodes = self._score_winner(seq, nodes_maps[ci], b)
                rows_s, rows_t, rows_o, W = win_rows[ci]
                nn = nodes.length
                tb = rows_t[:nn] - W
                tb = np.where(tb >= -1, tb, -1)
                self._finish(genes, seq, b, nodes,
                             (rows_s[:nn], tb, rows_o[:nn]))
            else:
                genes.nodes = Nodes()
                genes.metagenomic_bin = None
                genes.training_info = None
            return genes

        return list(self.pool.map(_produce, range(len(contigs))))
