"""Minimal FASTA parsing with transparent decompression.

Same responsibilities as the reference helper (reference: tests/fasta.py,
cli.py:26-61): magic-byte sniffing for gzip/bzip2/xz/lz4/zstd streams and a
simple FASTA record iterator.
"""

import collections
import contextlib
import io
import os

_MAGIC = {
    b"\x1f\x8b": "gzip",
    b"BZh": "bz2",
    b"\xfd7zXZ": "lzma",
    b"\x04\x22\x4d\x18": "lz4",
    b"\x28\xb5\x2f\xfd": "zstd",
}


@contextlib.contextmanager
def zopen(path, mode="r", encoding=None, errors=None, newline=None):
    """Open a possibly-compressed file by sniffing its magic bytes."""
    with contextlib.ExitStack() as ctx:
        file = ctx.enter_context(open(os.fsencode(path), "rb"))
        peek = file.peek()
        codec = None
        for magic, name in _MAGIC.items():
            if peek.startswith(magic):
                codec = name
                break
        if codec == "gzip":
            import gzip
            file = ctx.enter_context(gzip.open(file, mode="rb"))
        elif codec == "bz2":
            import bz2
            file = ctx.enter_context(bz2.open(file, mode="rb"))
        elif codec == "lzma":
            import lzma
            file = ctx.enter_context(lzma.open(file, mode="rb"))
        elif codec == "lz4":
            try:
                import lz4.frame
            except ImportError as err:
                raise RuntimeError(
                    "File compression is LZ4 but lz4 is not installed"
                ) from err
            file = ctx.enter_context(lz4.frame.open(file))
        elif codec == "zstd":
            try:
                import zstandard
            except ImportError as err:
                raise RuntimeError(
                    "File compression is ZSTD but zstandard is not installed"
                ) from err
            file = zstandard.ZstdDecompressor().stream_reader(file)
        if mode == "r":
            file = io.TextIOWrapper(
                file, encoding=encoding, errors=errors, newline=newline
            )
        yield file


class Record(collections.namedtuple("Record", ["id", "seq", "description"])):
    """A FASTA record."""


def parse(path):
    """Iterate over the records of a FASTA file (path or open handle)."""
    with contextlib.ExitStack() as ctx:
        try:
            file = ctx.enter_context(zopen(os.fsencode(path), "r"))
        except TypeError:
            file = path
        id_ = None
        desc = ""
        chunks = []
        for line in file:
            stripped = line.strip()
            if line.startswith(">"):
                if id_ is not None:
                    yield Record(id_, "".join(chunks), desc)
                fields = line[1:].split(maxsplit=1)
                id_ = fields[0] if fields else ""
                desc = fields[1].rstrip() if len(fields) > 1 else ""
                chunks = []
            elif stripped:
                chunks.append(stripped)
        if id_ is not None:
            yield Record(id_, "".join(chunks), desc)
        elif chunks:
            raise ValueError("not in FASTA format")
