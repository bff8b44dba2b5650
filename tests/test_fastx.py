"""Fast ingestion paths (io/fasta.py): FASTA/FASTQ x plain/gzip all take
a vectorized or native parse (the reference accepts the same four input
shapes via kseq.h, README.md:161-163); odd layouts fall back to the
legacy line loop with identical results."""

import gzip

import numpy as np
import pytest

from lr2rmats_tpu.io.fasta import (SeqSet, _parse_fastq_vec, decode_seq,
                                   read_fasta)


FA = ">r1 desc words\nACGT\nAC\n>r2\nGGTT\n"
FQ = "@q1 d\nACGTN\n+\nIIIII\n@q2\nTT\n+x\nII\n"


def _write(tmp_path, name, text, gz=False):
    p = tmp_path / name
    if gz:
        with gzip.open(str(p), "wb") as f:
            f.write(text.encode())
    else:
        p.write_text(text)
    return str(p)


@pytest.mark.parametrize("gz", [False, True])
def test_fasta_plain_and_gz(tmp_path, gz):
    s = read_fasta(_write(tmp_path, "t.fa.gz" if gz else "t.fa", FA, gz))
    assert s.names == ["r1", "r2"]
    assert decode_seq(s.get(0)) == "ACGTAC"
    assert decode_seq(s.get(1)) == "GGTT"


@pytest.mark.parametrize("gz", [False, True])
def test_fastq_plain_and_gz(tmp_path, gz):
    s = read_fasta(_write(tmp_path, "t.fq.gz" if gz else "t.fq", FQ, gz))
    assert s.names == ["q1", "q2"]
    assert decode_seq(s.get(0)) == "ACGTN"
    assert decode_seq(s.get(1)) == "TT"


def test_fastq_no_trailing_newline(tmp_path):
    s = read_fasta(_write(tmp_path, "nt.fq", "@n1\nACG\n+\nIII"))
    assert s.names == ["n1"] and decode_seq(s.get(0)) == "ACG"


def test_fastq_vec_declines_odd_layouts():
    """Multiline / mis-framed records return None (legacy loop takes
    over) rather than mis-parsing."""
    for text in ("@m1\nACGT\nACGT\n+\nIIIIIIII\n",        # 5 lines
                 "@a\nAC\n+\nII\nxx\nAC\n+\nII\n",        # non-@ record
                 "@a\nACGT\n+\nII\n"):                    # qual != seq len
        buf = np.frombuffer(text.encode(), np.uint8)
        assert _parse_fastq_vec(buf) is None


def test_fastq_gz_at_500_records(tmp_path):
    """Round-trip a bigger synthetic FASTQ through the gz fast path."""
    rng = np.random.default_rng(0)
    recs = []
    seqs = []
    for i in range(500):
        sq = "".join("ACGT"[c] for c in rng.integers(0, 4, 80))
        seqs.append(sq)
        recs.append(f"@read{i} extra\n{sq}\n+\n{'I' * 80}\n")
    p = _write(tmp_path, "big.fq.gz", "".join(recs), gz=True)
    s = read_fasta(p)
    assert s.n == 500
    assert s.names[17] == "read17"
    assert decode_seq(s.get(499)) == seqs[499]


def test_empty_gz(tmp_path):
    p = _write(tmp_path, "e.fa.gz", "", gz=True)
    s = read_fasta(p)
    assert s.n == 0


def test_truncated_gz_raises(tmp_path):
    """A gzip member cut mid-stream must fail loudly: any prefix of a
    FASTA is valid FASTA, so silent partial decompression would parse as
    a silently shortened dataset."""
    whole = _write(tmp_path, "t.fa.gz", FA * 200, gz=True)
    data = open(whole, "rb").read()
    cut = tmp_path / "cut.fa.gz"
    cut.write_bytes(data[: len(data) // 2])
    with pytest.raises(EOFError):
        read_fasta(str(cut))


@pytest.mark.parametrize("gz", [False, True])
def test_crlf_input_matches_unix(tmp_path, gz):
    """CRLF files route to the '\\r'-stripping line loop, not the
    vectorized parsers (which would encode '\\r' as an N base)."""
    for name, text in (("c.fa", FA), ("c.fq", FQ)):
        crlf = text.replace("\n", "\r\n")
        a = read_fasta(_write(tmp_path, name + (".gz" if gz else ""),
                              text, gz))
        b = read_fasta(_write(tmp_path, "crlf_" + name +
                              (".gz" if gz else ""), crlf, gz))
        assert a.names == b.names
        np.testing.assert_array_equal(a.codes, b.codes)
        np.testing.assert_array_equal(a.offsets, b.offsets)


def test_multiline_fastq_parses_correctly(tmp_path):
    """Legacy wrapped FASTQ (seq/qual split over lines) parses fully —
    the old line loop silently truncated it (review finding)."""
    text = ("@m1 desc\nACGTACGT\nACGT\n+\nIIIIIIII\nIIII\n"
            "@m2\nGG\nTT\n+m2\nII\nII\n")
    s = read_fasta(_write(tmp_path, "ml.fq", text))
    assert s.names == ["m1", "m2"]
    assert decode_seq(s.get(0)) == "ACGTACGTACGT"
    assert decode_seq(s.get(1)) == "GGTT"
    # wrapped qual line starting with '@' must not be taken as a header
    text2 = "@q\nACGTACGT\nACGT\n+\nIIIIIIII\n@III\n@q2\nAC\n+\nII\n"
    s2 = read_fasta(_write(tmp_path, "ml2.fq", text2))
    assert s2.names == ["q", "q2"]
    assert decode_seq(s2.get(0)) == "ACGTACGTACGT"


def test_genome_load_crlf_no_native(tmp_path, monkeypatch):
    """Genome.load delegates to read_fasta: CRLF genomes decode
    identically with and without the native parser (review finding: the
    old hand-rolled copy encoded '\\r' as N on the numpy path)."""
    from lr2rmats_tpu.io.fasta import Genome
    text = ">chr1 d\nACGTACGT\nACGT\n>chr2\nGGTT\n"
    unix = _write(tmp_path, "g.fa", text)
    crlf = _write(tmp_path, "gc.fa", text.replace("\n", "\r\n"))
    monkeypatch.setenv("LR2RMATS_NO_NATIVE", "1")
    import lr2rmats_tpu.native.lib as nl
    monkeypatch.setattr(nl, "_LIB", None, raising=False)
    a = Genome.load(unix)
    b = Genome.load(crlf)
    assert a.names == b.names == ["chr1", "chr2"]
    np.testing.assert_array_equal(a.codes, b.codes)
    np.testing.assert_array_equal(a.offsets, b.offsets)
    assert decode_seq(a.get(0)) == "ACGTACGTACGT"


def test_fastq_blank_separator_lines(tmp_path):
    """Stray blank lines between FASTQ records must not silently truncate
    the stream (ADVICE r4): records after the blank still parse, and
    non-FASTQ garbage after a blank raises instead of vanishing."""
    s = read_fasta(_write(tmp_path, "bl.fq",
                          "@q1\nACGT\n+\nIIII\n\n@q2\nTT\n+\nII\n"))
    assert s.names == ["q1", "q2"]
    assert decode_seq(s.get(1)) == "TT"
    with pytest.raises(ValueError, match="malformed FASTQ"):
        read_fasta(_write(tmp_path, "bad.fq",
                          "@q1\nACGT\n+\nIIII\n\ngarbage\n"))
