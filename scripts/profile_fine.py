"""Fine-grained profile: prep sub-steps, C scoring, device sweep, D2H."""
import os
import sys
import time
import ctypes

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

from pyrodigal_tpu.fasta import parse
from pyrodigal_tpu.metagenomic import METAGENOMIC_BINS
from pyrodigal_tpu.sequence import Sequence
from pyrodigal_tpu.nodes import Nodes
from pyrodigal_tpu import _native
from pyrodigal_tpu.ops import dp_jax, dp_pallas
from pyrodigal_tpu.ops import score_device as sd

DATA = "/root/reference/src/pyrodigal/tests/data"
records = list(parse(os.path.join(DATA, "GCF_001457455.1_NCTC11397_genomic.fna.gz")))
genome = "".join(r.seq for r in records)
contig = genome[:40_000]
seq = Sequence(contig)

def t(label, fn, n=10):
    fn()
    t0 = time.time()
    for _ in range(n):
        fn()
    dt = (time.time() - t0) / n
    print(f"{label:42s} {dt*1e3:8.2f} ms")
    return dt

# --- node extraction ---------------------------------------------------------
def extract():
    nodes = Nodes()
    nodes.extract(seq, translation_table=11, closed=False)
    nodes.sort()
    return nodes
t("extract+sort (C)", extract)
nodes = extract()
nn = nodes.length
print(f"  nn={nn}")

# --- geometry prep sub-steps -------------------------------------------------
s = nodes._struct()
lib = _native.lib
slen = seq.slen

rbs_ex = np.zeros((nn, 15), np.int32); rbs_mm = np.zeros((nn, 15), np.int32)
t("rc_rbs_candidates", lambda: lib.rc_rbs_candidates(
    _native.u8(seq.digits), slen, ctypes.byref(s),
    _native.i32(rbs_ex), _native.i32(rbs_mm)))
ups = np.full((nn, 32), -1, np.int8)
t("rc_ups_mers", lambda: lib.rc_ups_mers(
    _native.u8(seq.digits), slen, ctypes.byref(s), _native.i8(ups)))
mot = np.full((nn, 52), -1, np.int32)
t("rc_motif_candidates", lambda: lib.rc_motif_candidates(
    _native.u8(seq.digits), slen, ctypes.byref(s), _native.i32(mot)))
star = np.full((nn, 24), -1, np.int32)
t("rc_star_candidates", lambda: lib.rc_star_candidates(
    ctypes.byref(s), 60, 24, _native.i32(star)))
sr = np.zeros(nn, np.uint8)
t("rc_stop_real", lambda: lib.rc_stop_real(
    _native.u8(seq.digits), slen, ctypes.byref(s), 11, _native.u8(sr)))
euf = np.zeros(nn, np.uint8)
t("rc_edge_ups_flags", lambda: lib.rc_edge_ups_flags(
    ctypes.byref(s), slen, 0, _native.u8(euf)))
t("window_starts (numpy)", lambda: dp_jax.window_starts(
    nodes.ndx[:nn].astype(np.int64), nodes.stop_val[:nn].astype(np.int64),
    nodes.type[:nn], nodes.strand[:nn]))
t("sixmer_codes (numpy)", lambda: sd.sixmer_codes(seq.digits))

def cups():
    c_ups = np.zeros((nn, 128), np.uint8)
    slots = np.arange(32)[None, :]
    validu = ups >= 0
    flat = slots * 4 + np.where(validu, ups, 0)
    rows = np.repeat(np.arange(nn)[:, None], 32, axis=1)
    np.add.at(c_ups, (rows[validu], flat[validu]), 1)
t("c_ups one-hot (np.add.at)", cups)
t("prepare_geometry total", lambda: sd.prepare_geometry(seq, nodes, 11, False, 60, 24))

# --- C scoring per bin -------------------------------------------------------
tinf = METAGENOMIC_BINS[0].training_info
def score_one():
    nd = nodes.copy()
    nd.reset_scores()
    nd.score_nodes(seq, tinf, closed=False, is_meta=True)
    nd.record_overlapping_starts(tinf, 1, 60)
t("C score_nodes 1 bin (incl copy)", score_one)

# --- C full meta sweep per contig ---------------------------------------------
from pyrodigal_tpu.gene_finder import GeneFinder
gf = GeneFinder(meta=True)
t("C full meta find_genes (1 contig)", lambda: gf.find_genes(contig), n=3)

# --- device side --------------------------------------------------------------
tables = sd.BinTables(METAGENOMIC_BINS)
g = sd.prepare_geometry(seq, nodes, 11, False, 60, 24)
G, n, S = 16, 3072, 49152
packed = sd.pack_geometries([g], G, n, S, 24)
geo = {k: jnp.asarray(v) for k, v in packed.items()}
for k, v in packed.items():
    print(f"  geo[{k}]: {v.nbytes/1e6:.2f} MB")
bin_idx = jnp.zeros(128, jnp.int32)
gidx = jnp.zeros(128, jnp.int32)
W = 1024
NP = W + int(np.ceil(n / 128) * 128) + 128

def h2d():
    o = {k: jax.device_put(v) for k, v in packed.items()}
    jax.block_until_ready(o)
t("H2D packed geometry (one launch)", h2d, n=3)

def sweep():
    r = sd.score_dp_launch(tables.as_tuple(), geo, bin_idx, gidx,
                           is_meta=True, closed=False, S3=S // 3,
                           has_nonsd=tables.any_nonsd, W=W, NP=NP,
                           BLK=8, MAX_CHUNKS=dp_pallas.FIXED_CHUNKS)
    jax.block_until_ready(r)
    return r
print("compiling sweep...", flush=True)
t0 = time.time(); r = sweep(); print(f"  compile+run: {time.time()-t0:.1f} s")
t("score_dp_launch (128 items, 16 blk)", sweep, n=3)

score, traceb, ov, best = r
t("D2H best (128 f32)", lambda: np.asarray(best))
idx = jnp.zeros(16, jnp.int32)
def pull_rows():
    a, b, c = dp_pallas._gather_rows(score, traceb, ov, idx)
    return np.asarray(a), np.asarray(b), np.asarray(c)
t("D2H 16 winner rows (3x16xNP)", pull_rows, n=3)

# scoring only (no DP) to split the launch cost
def score_only():
    r2 = sd.score_only(tables.as_tuple(), geo, bin_idx, gidx,
                       is_meta=True, closed=False, S3=S // 3,
                       has_nonsd=tables.any_nonsd)
    jax.block_until_ready(r2)
print("compiling score_only...", flush=True)
t0 = time.time(); score_only(); print(f"  compile+run: {time.time()-t0:.1f} s")
t("score_only (128 items)", score_only, n=3)
