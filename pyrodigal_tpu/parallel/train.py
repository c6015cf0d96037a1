"""Distributed training: the O(bp) statistics scans sharded over a mesh.

The reference trains on ONE joined sequence in a single process
(reference: lib.pyx:5471-5575).  The dominant O(bp) piece of that — the
background hexamer scan feeding `calc_dicodon_gene` (lib.pyx:4309-4318)
— is a pure count table, so it shards exactly: positions are split into
per-device chunks (with a 5-base halo so every hexamer is seen by
exactly one device) and the 4096-bin tables are `psum`-merged over ICI.
The merged counts are bit-identical to the host scan, so the final
`TrainingInfo` is bit-identical to `GeneFinder.train` — the node-level
passes (gc-bias recording, training DP, the SD/non-SD EM loops) stay on
the exact C engine, which is where the reference keeps them cheap
(O(nodes), not O(bp)).
"""

import ctypes
import functools

import numpy as np

from ..sequence import Sequence
from ..nodes import Nodes
from ..training import TrainingInfo
from .. import _native
from .mesh import CONTIG_AXIS


def sharded_background_counts(mesh, digits):
    """Background hexamer counts of one (joined) digit sequence, position
    shards psum-merged over the mesh.  Bit-identical to the C scan in
    `rc_calc_dicodon_gene` (both strands; N folds to C, complement of N
    folds to C)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    d = np.asarray(digits, np.uint8)
    slen = len(d)
    npos = max(slen - 5, 0)
    D = mesh.devices.size
    chunk = -(-npos // D) if npos else 1
    # per-device slices with a 5-base halo
    sl = np.zeros((D, chunk + 5), np.uint8)
    cnt = np.zeros(D, np.int32)
    comp = np.where(d < 4, 3 - d, d)[::-1].astype(np.uint8)
    slc = np.zeros((D, chunk + 5), np.uint8)
    for k in range(D):
        lo = k * chunk
        n = max(0, min(chunk, npos - lo))
        cnt[k] = n
        if n:
            sl[k, :n + 5] = d[lo:lo + n + 5]
            slc[k, :n + 5] = comp[lo:lo + n + 5]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(CONTIG_AXIS, None), P(CONTIG_AXIS, None),
                  P(CONTIG_AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    def step(fw, rv, n):
        def count(x, nn):
            L = x.shape[1]
            idx = jnp.zeros(L - 5, jnp.int32)
            for j in range(6):
                idx = idx | ((x[0, j:j + L - 5].astype(jnp.int32) & 3)
                             << (2 * j))
            ok = jnp.arange(L - 5) < nn[0]
            return jnp.zeros(4096, jnp.int64).at[idx].add(
                ok.astype(jnp.int64))
        import jax as _jax
        local = count(fw, n) + count(rv, n)
        return _jax.lax.psum(local, CONTIG_AXIS)

    import jax.numpy as jnp
    out = step(jnp.asarray(sl), jnp.asarray(slc), jnp.asarray(cnt))
    return np.asarray(out, np.int64)


def train_distributed(mesh, sequence, *sequences, translation_table=11,
                      start_weight=4.35, force_nonsd=False, closed=False,
                      mask=False, min_mask=50, min_gene=90,
                      min_edge_gene=60, max_overlap=60):
    """`GeneFinder.train` with the background-statistics scan sharded over
    the mesh — bit-identical output (the psum-merged counts equal the
    host scan's)."""
    from .._constants import WINDOW

    if sequences:
        sequence = "TTAATTAATTAA".join(
            [sequence, *sequences, ""])
    seq = Sequence(sequence, mask=mask, mask_size=min_mask)
    tinf = TrainingInfo(seq.gc, start_weight=start_weight,
                        translation_table=translation_table)
    bg = sharded_background_counts(mesh, seq.digits)

    nodes = Nodes()
    nodes.extract(seq, translation_table=translation_table, closed=closed,
                  min_gene=min_gene, min_edge_gene=min_edge_gene)
    nodes.sort()
    gc_plot = seq.max_gc_frame_plot(WINDOW)
    nodes.record_gc_bias(gc_plot, seq.slen, tinf)
    nodes.record_overlapping_starts(tinf, 0, max_overlap)
    ipath = nodes.dynamic_programming(tinf, final=False)
    s = nodes._struct()
    _native.lib.rc_calc_dicodon_gene_bg(
        _native.u8(tinf.raw), _native.u8(seq.digits), seq.slen,
        ctypes.byref(s), int(ipath), _native.i64(bg))
    _native.lib.rc_raw_coding_score(
        _native.u8(seq.digits), seq.slen, ctypes.byref(s),
        _native.u8(tinf.raw))
    _native.lib.rc_rbs_score(
        _native.u8(seq.digits), seq.slen, ctypes.byref(s),
        _native.u8(tinf.raw))
    _native.lib.rc_train_starts_sd(
        _native.u8(seq.digits), seq.slen, ctypes.byref(s),
        _native.u8(tinf.raw))
    if force_nonsd:
        tinf.uses_sd = False
    else:
        _native.lib.rc_determine_sd_usage(_native.u8(tinf.raw))
    if not tinf.uses_sd:
        _native.lib.rc_train_starts_nonsd(
            _native.u8(seq.digits), seq.slen, ctypes.byref(s),
            _native.u8(tinf.raw))
    return tinf
