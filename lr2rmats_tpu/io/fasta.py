"""FASTA/FASTQ ingestion → packed numeric sequence buffers.

Replaces the role of vendored kseq.h + kseq_load_genome (reference
parse_bam.c:382-400) with a vectorized reader: sequences are stored as a
single concatenated uint8 code array (A=0,C=1,G=2,T=3, other=4) plus offset
tables, ready to feed the minimizer/alignment kernels.  Gzip input is
supported transparently (reference README.md:161-163).
"""

from __future__ import annotations

import gzip
import io
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np

from ..utils import log

# byte → 2-bit code lookup (A=0 C=1 G=2 T=3, anything else 4)
_CODE = np.full(256, 4, np.uint8)
for _i, _b in enumerate(b"ACGT"):
    _CODE[_b] = _i
for _i, _b in enumerate(b"acgt"):
    _CODE[_b] = _i

_COMP = np.array([3, 2, 1, 0, 4], np.uint8)  # A<->T, C<->G, N->N

CODE_TO_BASE = np.frombuffer(b"ACGTN", np.uint8)


def encode_seq(seq: bytes) -> np.ndarray:
    return _CODE[np.frombuffer(seq, np.uint8)]


def decode_seq(codes: np.ndarray) -> str:
    return CODE_TO_BASE[codes].tobytes().decode()


def revcomp(codes: np.ndarray) -> np.ndarray:
    return _COMP[codes[::-1]]


def _open(path: str):
    with open(path, "rb") as f:
        magic = f.read(2)
    if magic == b"\x1f\x8b":
        return gzip.open(path, "rb")
    return open(path, "rb")


def iter_fastx(path: str) -> Iterator[Tuple[str, bytes]]:
    """Yield (name, seq-bytes) for FASTA or FASTQ, plain or gzipped."""
    with _open(path) as fp:
        first = fp.read(1)
        if not first:
            return
        if first == b">":  # FASTA
            # the '>' is consumed; the rest of the line is the header
            name = fp.readline().split()[0].decode()
            chunks: List[bytes] = []
            for raw in fp:
                if raw.startswith(b">"):
                    yield name, b"".join(chunks)
                    name = raw[1:].split()[0].decode()
                    chunks = []
                else:
                    chunks.append(raw.strip())
            yield name, b"".join(chunks)
        elif first == b"@":  # FASTQ
            while True:
                name_line = fp.readline()
                if not name_line:
                    break
                name = name_line.split()[0].decode()
                seq = fp.readline().strip()
                fp.readline()  # '+'
                fp.readline()  # qual
                yield name, seq
                nxt = fp.read(1)
                if nxt != b"@":
                    break
        else:
            raise ValueError(f"{path}: not FASTA/FASTQ (starts with {first!r})")


@dataclass
class SeqSet:
    """A set of named sequences in one flat code buffer."""

    names: List[str]
    codes: np.ndarray      # uint8 [total]
    offsets: np.ndarray    # int64 [n+1]

    @property
    def n(self) -> int:
        return len(self.names)

    def lengths(self) -> np.ndarray:
        return (self.offsets[1:] - self.offsets[:-1]).astype(np.int64)

    def get(self, i: int) -> np.ndarray:
        return self.codes[self.offsets[i]: self.offsets[i + 1]]

    def __len__(self) -> int:
        return len(self.names)


class Genome(SeqSet):
    """Reference genome with O(1) slice access by (tid, 1-based start/end)."""

    @classmethod
    def load(cls, path: str) -> "Genome":
        log("load_genome", "loading genome fasta file ...")
        names, bufs = [], []
        for name, seq in iter_fastx(path):
            names.append(name)
            bufs.append(encode_seq(seq))
        offs = np.zeros(len(bufs) + 1, np.int64)
        np.cumsum([len(b) for b in bufs], out=offs[1:])
        g = cls(names, np.concatenate(bufs) if bufs else np.zeros(0, np.uint8), offs)
        log("load_genome", "loading genome fasta file done!")
        return g

    def slice(self, tid: int, start: int, end: int) -> np.ndarray:
        """1-based inclusive [start, end] on chrom `tid` (clamped)."""
        o = self.offsets[tid]
        L = self.offsets[tid + 1] - o
        s = max(0, start - 1)
        e = min(int(L), end)
        return self.codes[o + s: o + e]


def read_fasta(path: str) -> SeqSet:
    names, bufs = [], []
    for name, seq in iter_fastx(path):
        names.append(name)
        bufs.append(encode_seq(seq))
    offs = np.zeros(len(bufs) + 1, np.int64)
    if bufs:
        np.cumsum([len(b) for b in bufs], out=offs[1:])
    return SeqSet(names, np.concatenate(bufs) if bufs else np.zeros(0, np.uint8), offs)


read_fastq_or_fasta = read_fasta
