"""Native detail formatter (csrc format_detail_c) must be byte-identical
to the python write_bam_detail path."""

import io

import numpy as np
import pytest

from lr2rmats_tpu.io.gtf import ChrNames
from lr2rmats_tpu.native import get_lib
from lr2rmats_tpu.report.summary import (_write_bam_detail_native,
                                         write_bam_detail)
from lr2rmats_tpu.transcript.model import Transcripts


def random_T(n=200, seed=5):
    rng = np.random.default_rng(seed)
    T = Transcripts()
    for i in range(n):
        en = int(rng.integers(1, 7))
        starts = np.sort(rng.integers(1, 10 ** 6, en)).astype(np.int64)
        ends = starts + rng.integers(50, 500, en)
        T.append(int(rng.integers(0, 3)), bool(rng.integers(0, 2)),
                 starts, ends,
                 gene_id=f"G{i}", gene_name=f"GN{i}",
                 trans_id=f"T{i}", trans_name=f"read/{i}/x",
                 init_novel=bool(rng.integers(0, 2)))
        T.flags["known"][T.n - 1] = bool(rng.integers(0, 2))
        T.flags["has_known_site"][T.n - 1] = bool(rng.integers(0, 2))
        T.novel_exon_flag[T.n - 1, :en] = rng.integers(0, 2, en)
        if en > 1:
            T.novel_site_flag[T.n - 1, : 2 * (en - 1)] = \
                rng.integers(0, 2, 2 * (en - 1))
            T.novel_junction_flag[T.n - 1, : en - 1] = \
                rng.integers(0, 2, en - 1)
            T.unreliable_junction_flag[T.n - 1, : en - 1] = \
                rng.integers(0, 2, en - 1)
    return T


def test_native_detail_byte_identical():
    if get_lib() is None:
        pytest.skip("native lib unavailable")
    T = random_T()
    cname = ChrNames(["chr1", "chr2", "chrX"])
    py = io.StringIO()
    write_bam_detail(T, cname, py)        # n <= 2000 -> python path
    nat = io.StringIO()
    nat.write(py.getvalue().split("\n", 1)[0] + "\n")  # same header
    assert _write_bam_detail_native(T, cname, nat)
    assert nat.getvalue() == py.getvalue()


def test_native_detail_nonascii_falls_back():
    if get_lib() is None:
        pytest.skip("native lib unavailable")
    T = random_T(5)
    T.gene_name[0] = "gène"
    cname = ChrNames(["chr1", "chr2", "chrX"])
    assert not _write_bam_detail_native(T, cname, io.StringIO())


def test_bed12_batch_matches_sam_path(tmp_path):
    """write_bed12_batch (RecordBatch-direct, native formatter) must be
    byte-identical to the SAM-reparse path."""
    if get_lib() is None:
        pytest.skip("native lib unavailable")
    from lr2rmats_tpu.align.batch import BatchAligner
    from lr2rmats_tpu.io.fasta import Genome
    from lr2rmats_tpu.io.sam import sam_header
    from lr2rmats_tpu.pipeline.stages import write_bed12, write_bed12_batch
    rng = np.random.default_rng(21)
    codes = rng.integers(0, 4, 400_000).astype(np.uint8)
    # plant a couple of spliced genes
    reads = []
    for g in range(12):
        p = 10_000 + g * 30_000
        e1 = codes[p: p + 300]
        codes[p + 300], codes[p + 301] = 2, 3
        q = p + 300 + int(rng.integers(200, 3000))
        codes[q - 2], codes[q - 1] = 0, 2
        e2 = codes[q: q + 300]
        r = np.concatenate([e1, e2]).copy()
        m = rng.random(len(r)) < 0.02
        r[m] = (r[m] + 1) % 4
        reads.append(r)
    for i in range(12):   # plain contiguous reads too
        p = int(rng.integers(0, 390_000))
        reads.append(codes[p: p + 500].copy())
    g = Genome(["chrZ"], codes, np.array([0, len(codes)], np.int64))
    al = BatchAligner(g)
    names = [f"r{i}" for i in range(len(reads))]
    from lr2rmats_tpu.io.fasta import SeqSet
    offs = np.zeros(len(reads) + 1, np.int64)
    np.cumsum([len(r) for r in reads], out=offs[1:])
    rb = al.align_seqset_packed(SeqSet(names, np.concatenate(reads), offs))
    sam = tmp_path / "a.sam"
    with open(sam, "wb") as f:
        f.write(sam_header(al.refs).encode())
        f.write(rb.emit_sam(al.refs))
    bed_sam = tmp_path / "sam.bed"
    bed_rb = tmp_path / "rb.bed"
    write_bed12(str(sam), str(bed_sam))
    assert write_bed12_batch(rb, al.refs, str(bed_rb))
    assert bed_rb.read_bytes() == bed_sam.read_bytes()
