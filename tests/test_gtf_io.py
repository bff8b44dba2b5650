"""GTF reader/writer + sorter tests against the reference test_data fixtures."""

import io

import numpy as np

from lr2rmats_tpu.io.gtf import ChrNames, read_anno_trans, read_gtf_trans, write_read_trans
from lr2rmats_tpu.report.sortgtf import sort_gtf_lines


def test_read_anno_trans_testdata(ref_data):
    cname = ChrNames(["chr1"])
    T = read_anno_trans(str(ref_data / "gtf" / "original.gtf"), cname)
    # original.gtf: one gene (TNFRSF18), 4 transcripts (reference SURVEY §4)
    assert T.gene_n == 1
    assert T.n == 4
    assert all(g == "ENSG00000186891" for g in T.gene_id[: T.n])
    assert all(T.is_rev[: T.n] == 1)
    # every transcript's start/end spans its exons
    for i in range(T.n):
        es, ee = T.exons(i)
        assert T.start[i] == es[0]
        assert T.end[i] == ee[-1]
        assert np.all(es[1:] > es[:-1])  # sorted ascending


def test_rrna_gtf(ref_data):
    cname = ChrNames(["chr1"])
    T = read_anno_trans(str(ref_data / "gtf" / "rRNA.gtf"), cname)
    assert T.n >= 1


def test_writer_roundtrip(ref_data):
    cname = ChrNames(["chr1"])
    T = read_gtf_trans(str(ref_data / "gtf" / "original.gtf"), cname)
    buf = io.StringIO()
    write_read_trans(T, cname, "lr2rmats_tpu", buf)
    text = buf.getvalue()
    T2 = read_gtf_trans_from_text(text, cname)
    assert T2.n == T.n
    for i in range(T.n):
        np.testing.assert_array_equal(T.exons(i)[0], T2.exons(i)[0])
        np.testing.assert_array_equal(T.exons(i)[1], T2.exons(i)[1])
    # '-'-strand exons must be written in descending coordinate order
    # (reference gtf.c:622-624)
    exon_starts = [int(l.split("\t")[3]) for l in text.splitlines() if l.split("\t")[2] == "exon"][:4]
    assert exon_starts == sorted(exon_starts, reverse=True) or len(exon_starts) < 2


def read_gtf_trans_from_text(text, cname):
    import tempfile, os
    from lr2rmats_tpu.io.gtf import read_gtf_trans
    with tempfile.NamedTemporaryFile("w", suffix=".gtf", delete=False) as f:
        f.write(text)
        path = f.name
    try:
        return read_gtf_trans(path, cname)
    finally:
        os.unlink(path)


def test_writer_attr_format():
    from lr2rmats_tpu.transcript.model import Transcripts
    cname = ChrNames(["chr1"])
    T = Transcripts()
    T.append(0, False, [100, 300], [200, 400], gene_id="G1", gene_name="GN",
             trans_id="T1", trans_name="TN", cov=3)
    buf = io.StringIO()
    write_read_trans(T, cname, "src", buf)
    lines = buf.getvalue().splitlines()
    assert lines[0] == ('chr1\tsrc\ttranscript\t100\t400\t.\t+\t.\t'
                       'gene_id "G1"; transcript_id "T1"; gene_name "GN"; '
                       'transcript_name "TN"; transcript_cov "3";')
    assert lines[1] == ('chr1\tsrc\texon\t100\t200\t.\t+\t.\t'
                       'gene_id "G1"; transcript_id "T1"; gene_name "GN"; '
                       'transcript_name "TN";')


def test_sort_gtf():
    lines = [
        'chr2\tx\ttranscript\t50\t90\t.\t+\t.\tgene_id "b";\n',
        'chr2\tx\texon\t50\t90\t.\t+\t.\tgene_id "b";\n',
        'chr1\tx\ttranscript\t100\t200\t.\t+\t.\tgene_id "a";\n',
        'chr1\tx\texon\t100\t200\t.\t+\t.\tgene_id "a";\n',
        'chr1\tx\ttranscript\t10\t20\t.\t+\t.\tgene_id "c";\n',
        'chr1\tx\texon\t10\t20\t.\t+\t.\tgene_id "c";\n',
        '# comment dropped\n',
        'chr1\tx\tgene\t1\t500\t.\t+\t.\tgene_id "dropped";\n',
    ]
    out = sort_gtf_lines(lines)
    feats = [(l.split("\t")[0], l.split("\t")[2], int(l.split("\t")[3])) for l in out]
    assert feats == [
        ("chr1", "transcript", 10), ("chr1", "exon", 10),
        ("chr1", "transcript", 100), ("chr1", "exon", 100),
        ("chr2", "transcript", 50), ("chr2", "exon", 50),
    ]


def test_fasta_load(ref_data):
    from lr2rmats_tpu.io.fasta import Genome, read_fasta
    g = Genome.load(str(ref_data / "genome" / "genome.fa"))
    assert g.names == ["chr1"]
    assert g.lengths()[0] > 1_000_000
    # leading run of N
    assert np.all(g.get(0)[:100] == 4)
    reads = read_fasta(str(ref_data / "read" / "samp1_short_1.fa"))
    assert len(reads) == 428
    long_reads = read_fasta(str(ref_data / "read" / "samp1_long.fa"))
    assert len(long_reads) == 1
    assert long_reads.lengths()[0] > 500
