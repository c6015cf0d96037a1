"""Prodigal-compatible command line (reference: cli.py:64-323).

Supports the original Prodigal flags plus `-j/--jobs`, `--pool`,
`--min-gene`, `--min-edge-gene`, `--max-overlap`, `--no-stop-codon`,
and the TPU batch runner via `--backend {refcore,jax}`.
"""

import argparse
import contextlib
import functools
import os
import sys
import typing
import warnings

try:
    import multiprocessing.pool
except ImportError:
    multiprocessing = None

from .__about__ import __version__
from ._constants import TRANSLATION_TABLES
from .gene_finder import GeneFinder
from .training import TrainingInfo
from .fasta import parse, zopen


def argument_parser(
    prog: str = "pyrodigal_tpu",
    version: str = __version__,
    input_required: bool = True,
) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog=prog, add_help=False,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("-a", required=False, metavar="trans_file",
                        help="Write protein translations to the selected file.")
    parser.add_argument("-c", required=False, action="store_true", default=False,
                        help="Closed ends. Do not allow genes to run off edges.")
    parser.add_argument("-d", required=False, metavar="nuc_file",
                        help="Write nucleotide sequences of genes to the selected file.")
    parser.add_argument("-f", required=False, metavar="output_type",
                        choices={"gff", "gbk"}, default="gff",
                        help="Select output format.")
    parser.add_argument("-g", required=False, metavar="tr_table", type=int,
                        choices=TRANSLATION_TABLES, default=11,
                        help="Specify a translation table to use.")
    parser.add_argument("-i", metavar="input_file", required=input_required,
                        help="Specify FASTA input file.")
    parser.add_argument("-m", action="store_true", default=False,
                        help="Treat runs of N as masked sequence; don't build genes across them.")
    parser.add_argument("-n", action="store_true", default=False,
                        help="Bypass Shine-Dalgarno trainer and force a full motif scan.")
    parser.add_argument("-o", metavar="output_file", required=False,
                        help="Specify output file.")
    parser.add_argument("-p", required=False, metavar="mode",
                        choices={"single", "meta"}, default="single",
                        help="Select procedure.")
    parser.add_argument("-s", required=False, metavar="start_file",
                        help="Write all potential genes (with scores) to the selected file.")
    parser.add_argument("-t", required=False, metavar="training_file",
                        help="Write a training file (if none exists); otherwise, read and use the specified training file.")
    parser.add_argument("-j", "--jobs", type=int, required=False, default=1,
                        metavar="jobs",
                        help="The number of threads to use if input contains multiple sequences.")
    parser.add_argument("-h", "--help", action="help",
                        help="Show this help message and exit.")
    parser.add_argument("-V", "--version", action="version",
                        version="{} v{}".format(prog, version),
                        help="Show version number and exit.")
    parser.add_argument("--min-gene", required=False, type=int, default=90,
                        help="The minimum gene length.")
    parser.add_argument("--min-edge-gene", required=False, type=int, default=60,
                        help="The minimum edge gene length.")
    parser.add_argument("--max-overlap", required=False, type=int, default=60,
                        help="The maximum number of nucleotides that can overlap between two genes on the same strand. Must be lower or equal to the minimum gene length.")
    parser.add_argument("--no-stop-codon", required=False, action="store_true",
                        default=False,
                        help="Disable translation of stop codons into star characters (*) for complete genes.")
    parser.add_argument("--pool", action="store", choices=("thread", "process"),
                        default="thread",
                        help="The kind of pool used to process sequences in parallel.")
    parser.add_argument("--backend", action="store",
                        choices=("detect", "refcore", "jax"), default="detect",
                        help="Compute backend: the exact C engine or the batched JAX/TPU pipeline.")
    return parser


def _process(gene_finder, sequence):
    if not sequence.id:
        warnings.warn("Input file contains a sequence without identifier",
                      stacklevel=2)
    return sequence.id, gene_finder.find_genes(sequence.seq)


def main(
    argv: typing.Optional[typing.List[str]] = None,
    stdout: typing.TextIO = sys.stdout,
    stderr: typing.TextIO = sys.stderr,
    stdin: typing.TextIO = sys.stdin,
    *,
    gene_finder_factory: typing.Callable[..., GeneFinder] = GeneFinder,
) -> int:
    parser = argument_parser(input_required=stdin.isatty())
    args = parser.parse_args(argv)

    with contextlib.ExitStack() as ctx:
        try:
            nuc_file = None if args.d is None else ctx.enter_context(open(args.d, "w"))
            prot_file = None if args.a is None else ctx.enter_context(open(args.a, "w"))
            scores_file = None if args.s is None else ctx.enter_context(open(args.s, "w"))
            out_file = stdout if args.o is None else ctx.enter_context(open(args.o, "w"))

            # load training info
            training_info = None
            if args.t is not None:
                if args.p == "meta":
                    print("Error: cannot specify metagenomic sequence with "
                          "a training file.", file=stderr)
                    return 1
                elif os.path.exists(args.t):
                    with open(args.t, "rb") as f:
                        training_info = TrainingInfo.load(f)

            input_file = stdin if args.i is None else ctx.enter_context(zopen(args.i))

            gene_finder = gene_finder_factory(
                meta=args.p == "meta",
                closed=args.c,
                mask=args.m,
                training_info=training_info,
                min_gene=args.min_gene,
                min_edge_gene=args.min_edge_gene,
                max_overlap=args.max_overlap,
                backend=args.backend,
            )

            # train first in single mode (all contigs joined, like Prodigal)
            if args.p == "single" and training_info is None:
                sequences = list(parse(input_file))
                training_info = gene_finder.train(
                    *(seq.seq for seq in sequences),
                    force_nonsd=args.n,
                    translation_table=args.g,
                )
                if args.t is not None and not os.path.exists(args.t):
                    with open(args.t, "wb") as f:
                        training_info.dump(f)
            else:
                sequences = parse(input_file)

            if args.jobs == 0:
                args.jobs = os.cpu_count() or 1
            if args.jobs > 1 and multiprocessing is not None:
                if args.pool == "thread":
                    pool = ctx.enter_context(multiprocessing.pool.ThreadPool(args.jobs))
                else:
                    pool = ctx.enter_context(multiprocessing.pool.Pool(args.jobs))
                parallel_map = pool.map
            else:
                parallel_map = map

            process = functools.partial(_process, gene_finder)
            for seq_id, preds in parallel_map(process, sequences):
                if args.f == "gff":
                    preds.write_gff(out_file, seq_id)
                elif args.f == "gbk":
                    preds.write_genbank(out_file, seq_id)
                if nuc_file is not None:
                    preds.write_genes(nuc_file, seq_id)
                if prot_file is not None:
                    preds.write_translations(
                        prot_file, seq_id, include_stop=not args.no_stop_codon
                    )
                if scores_file is not None:
                    preds.write_scores(scores_file, seq_id)

        except Exception as err:
            print("Error: {}".format(err), file=stderr)
            return getattr(err, "errno", 1)
        else:
            return 0
