"""CIGAR -> exon-chain conversion (bam2gtf semantics).

gen_exon (reference bam2gtf.c:31-78): N ops >= min_intron and D ops >
max_delet open new exons; internal exons shorter than min_exon are dropped;
strand comes from the XS aux tag when present, else the FLAG; the final exon
is always emitted.
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np

from ..io.sam import AlnRec, OP_D, OP_EQ, OP_M, OP_N, OP_X
from .model import Transcripts


def gen_exons(rec: AlnRec, min_exon: int, min_intron: int, max_delet: int):
    """Returns (starts, ends, is_rev) — 1-based inclusive exon intervals."""
    start = rec.pos + 1
    end = start - 1
    xs = rec.tags.get("XS")
    if xs is None:
        is_rev = rec.is_rev
    else:
        is_rev = xs != "+"
    starts, ends = [], []
    for c in rec.cigar:
        op = int(c) & 0xF
        l = int(c) >> 4
        if op == OP_N:
            if l >= min_intron:
                if not starts or (end - start + 1) >= min_exon:
                    starts.append(start)
                    ends.append(end)
                start = end + l + 1
            end += l
        elif op == OP_D:
            if l > max_delet:
                if not starts or (end - start + 1) >= min_exon:
                    starts.append(start)
                    ends.append(end)
                start = end + l + 1
            end += l
        elif op in (OP_M, OP_EQ, OP_X):
            end += l
        # I/S/H/P/B consume no reference
    starts.append(start)
    ends.append(end)
    return np.asarray(starts, np.int32), np.asarray(ends, np.int32), is_rev


def read_bam_trans(records: Iterable[AlnRec], min_exon: int, min_intron: int,
                   max_delet: int, T: Optional[Transcripts] = None) -> Transcripts:
    """Alignment stream -> all-novel-flagged transcripts (reference
    read_bam_trans, bam2gtf.c:89-110).  Unmapped records are skipped (the
    reference would NULL-deref on them; its pipeline inputs never contain
    any)."""
    if T is None:
        T = Transcripts()
    for rec in records:
        if rec.is_unmapped:
            continue
        starts, ends, is_rev = gen_exons(rec, min_exon, min_intron, max_delet)
        T.append(rec.tid, is_rev, starts, ends,
                 gene_id=rec.qname, gene_name=rec.qname,
                 trans_id=rec.qname, trans_name=rec.qname,
                 init_novel=True)
    return T
