"""SAM/BAM interop, exon-chain conversion, filter, bam2sj, fusion tests."""

import io
import os

import numpy as np
import pytest

from lr2rmats_tpu.io.sam import (
    AlnRec, SamReader, SamWriter, cigar_qlen, cigar_rlen, cigar_str,
    open_alignments, parse_cigar, read_bam, write_bam,
)
from lr2rmats_tpu.transcript.exon_chain import gen_exons, read_bam_trans
from lr2rmats_tpu.transcript.filter import FilterParams, filter_alignments
from lr2rmats_tpu.transcript.fusion import FusionParams, Seg, check_fusion
from lr2rmats_tpu.junctions.bam2sj import bam2sj_records, rec_junctions


def test_cigar_parse_roundtrip():
    c = parse_cigar("10M2I5D100N3S")
    assert cigar_str(c) == "10M2I5D100N3S"
    assert cigar_qlen(c) == 15
    assert cigar_rlen(c) == 115
    assert len(parse_cigar("*")) == 0


def mk_rec(qname="r1", flag=0, tid=0, pos1=100, cigar="50M", tags=None, seq=None):
    c = parse_cigar(cigar)
    if seq is None:
        seq = "A" * cigar_qlen(c)
    return AlnRec(qname=qname, flag=flag, tid=tid, pos=pos1 - 1, mapq=60,
                  cigar=c, seq=seq, qual="*", tags=tags or {})


def test_sam_text_roundtrip(tmp_path):
    refs = [("chr1", 1000000)]
    recs = [
        mk_rec("r1", 0, 0, 100, "20M5N30M", {"NM": 2, "XS": "+"}),
        mk_rec("r2", 16, 0, 500, "10S40M", {"NM": 0}),
    ]
    p = tmp_path / "t.sam"
    with open(p, "w") as f:
        w = SamWriter(f, refs)
        for r in recs:
            w.write(r)
    with open(p) as f:
        rd = SamReader(f)
        assert rd.refs == refs
        got = list(rd)
    assert len(got) == 2
    assert got[0].qname == "r1"
    assert got[0].pos == 99
    assert cigar_str(got[0].cigar) == "20M5N30M"
    assert got[0].tags["NM"] == 2
    assert got[0].tags["XS"] == "+"
    assert got[1].is_rev


def test_bam_roundtrip(tmp_path):
    refs = [("chr1", 1000000), ("chr2", 5000)]
    recs = [
        mk_rec("read/1", 0, 0, 100, "20M5N30M", {"NM": 2, "XS": "+", "NH": 1}),
        mk_rec("read/2", 16, 1, 500, "10S40M", {"NM": 0, "AS": 80}),
    ]
    p = str(tmp_path / "t.bam")
    n = write_bam(p, refs, ["@HD\tVN:1.6"], recs)
    assert n == 2
    refs2, hdr, it = read_bam(p)
    got = list(it)
    assert refs2 == refs
    assert got[0].qname == "read/1"
    assert got[0].tags == {"NM": 2, "XS": "+", "NH": 1}
    assert cigar_str(got[0].cigar) == "20M5N30M"
    assert got[1].tid == 1
    assert got[1].seq == "A" * 50
    # sniffing works for both
    refs3, _, it3 = open_alignments(p)
    assert refs3 == refs
    assert len(list(it3)) == 2


class TestGenExons:
    def test_simple_splice(self):
        r = mk_rec(cigar="20M100N30M", pos1=1000)
        s, e, rev = gen_exons(r, 3, 3, 50)
        np.testing.assert_array_equal(s, [1000, 1120])
        np.testing.assert_array_equal(e, [1019, 1149])
        assert not rev

    def test_short_intron_merges(self):
        r = mk_rec(cigar="20M2N30M", pos1=1000)
        s, e, _ = gen_exons(r, 3, 3, 50)
        np.testing.assert_array_equal(s, [1000])
        np.testing.assert_array_equal(e, [1051])

    def test_long_deletion_is_intron(self):
        r = mk_rec(cigar="20M60D30M", pos1=1000)
        s, e, _ = gen_exons(r, 3, 3, 50)
        np.testing.assert_array_equal(s, [1000, 1080])
        np.testing.assert_array_equal(e, [1019, 1109])

    def test_short_deletion_kept_in_exon(self):
        r = mk_rec(cigar="20M10D30M", pos1=1000)
        s, e, _ = gen_exons(r, 3, 3, 50)
        np.testing.assert_array_equal(s, [1000])
        np.testing.assert_array_equal(e, [1059])

    def test_small_internal_exon_dropped(self):
        r = mk_rec(cigar="20M100N2M100N30M", pos1=1000)
        s, e, _ = gen_exons(r, 3, 3, 50)
        # middle 2bp exon dropped
        assert len(s) == 2

    def test_xs_tag_overrides_strand(self):
        r = mk_rec(cigar="20M100N30M", flag=0, tags={"XS": "-"})
        _, _, rev = gen_exons(r, 3, 3, 50)
        assert rev


class TestFilter:
    def test_coverage_gate(self):
        # 100bp read, 40M aligned -> cov 0.4 < 0.67 -> dropped
        r = mk_rec(cigar="60S40M", seq="A" * 100, tags={"NM": 0})
        out = list(filter_alignments([r], FilterParams()))
        assert out == []

    def test_identity_gate(self):
        r = mk_rec(cigar="100M", seq="A" * 100, tags={"NM": 30})
        out = list(filter_alignments([r], FilterParams()))
        assert out == []

    def test_best_selection(self):
        r1 = mk_rec("q", cigar="100M", seq="A" * 100, tags={"NM": 10}, pos1=100)
        r2 = mk_rec("q", cigar="100M", seq="A" * 100, tags={"NM": 0}, pos1=999)
        out = list(filter_alignments([r1, r2], FilterParams()))
        assert len(out) == 1
        assert out[0].pos == 998  # the NM=0 one

    def test_sec_ratio_drop(self):
        # two near-equal alignments: second/best = 99/100 > 0.98 -> drop read
        r1 = mk_rec("q", cigar="100M", seq="A" * 100, tags={"NM": 0}, pos1=100)
        r2 = mk_rec("q", cigar="100M", seq="A" * 100, tags={"NM": 1}, pos1=999)
        out = list(filter_alignments([r1, r2], FilterParams()))
        assert out == []

    def test_min_intron_gate(self):
        r = mk_rec("q", cigar="100M", seq="A" * 100, tags={"NM": 0})
        out = list(filter_alignments([r], FilterParams(min_intron_n=1)))
        assert out == []
        r2 = mk_rec("q", cigar="50M100N50M", seq="A" * 100, tags={"NM": 0})
        out = list(filter_alignments([r2], FilterParams(min_intron_n=1)))
        assert len(out) == 1


class TestBam2SJ:
    def test_junction_counting(self):
        recs = [
            mk_rec("a", flag=0x2, cigar="20M100N30M", pos1=1000, tags={"NH": 1}),
            mk_rec("b", flag=0x2, cigar="20M100N30M", pos1=995, tags={"NH": 2}),
            mk_rec("c", flag=0x2, cigar="50M", pos1=2000, tags={"NH": 1}),
        ]
        # rec a: intron at 1020..1119 ; rec b: at 1015..1114
        sj = bam2sj_records(recs, None)
        assert sj.n == 2
        assert list(sj.don) == [1015, 1020]
        assert list(sj.uniq_c) == [0, 1]
        assert list(sj.multi_c) == [1, 0]

    def test_proper_pair_filter(self):
        recs = [mk_rec("a", flag=0, cigar="20M100N30M", tags={"NH": 1})]
        assert bam2sj_records(recs, None).n == 0
        assert bam2sj_records(recs, None, require_proper_pair=False).n == 1


class TestFusion:
    def seg(self, tid, rs, re_, fs, fe, score, ed=0):
        return Seg(tid, False, score, ed, rs, re_, fs, fe, None)

    def test_two_chrom_fusion(self):
        segs = [
            self.seg(0, 1, 500, 10000, 10500, 100),
            self.seg(1, 480, 1000, 99000, 99520, 90),
        ]
        out = check_fusion(segs, 1000, FusionParams())
        assert out is not None and len(out) == 2

    def test_same_chrom_too_close(self):
        segs = [
            self.seg(0, 1, 500, 10000, 10500, 100),
            self.seg(0, 480, 1000, 11000, 11520, 90),
        ]
        assert check_fusion(segs, 1000, FusionParams()) is None

    def test_read_overlap_rejected(self):
        segs = [
            self.seg(0, 1, 600, 10000, 10600, 100),
            self.seg(1, 200, 1000, 99000, 99800, 90),
        ]
        assert check_fusion(segs, 1000, FusionParams()) is None


def test_tag_types_roundtrip(tmp_path):
    """B-array and H-hex tags survive SAM text and BAM binary round
    trips with their declared types (review finding: B dropped from BAM,
    B/H re-emitted as Z in SAM)."""
    from lr2rmats_tpu.io.sam import (HexStr, SamReader, SamWriter, TagArray,
                                     sam_header)
    tags = {"NM": 3, "ZF": 1.5, "XA": "q", "XZ": "hello world",
            "XH": HexStr("1AE301"), "XB": TagArray([1, -2, 300], "s"),
            "XF": TagArray([0.5, 1.25], "f"),
            "XL": [7, 8, 9]}                      # plain list -> B:i
    r = mk_rec(tags=tags)
    refs = [("chr1", 10_000)]
    # SAM text round trip
    import io as _io
    buf = _io.StringIO()
    w = SamWriter(buf, refs)
    w.write(r)
    text = sam_header(refs) + buf.getvalue()
    assert "XB:B:s,1,-2,300" in text and "XH:H:1AE301" in text \
        and "XF:B:f,0.5,1.25" in text and "XL:B:i,7,8,9" in text
    rd = SamReader(_io.StringIO(text))
    r2 = next(iter(rd))
    assert list(r2.tags["XB"]) == [1, -2, 300]
    assert r2.tags["XB"].sub == "s"
    assert isinstance(r2.tags["XH"], HexStr) and r2.tags["XH"] == "1AE301"
    assert list(r2.tags["XF"]) == [0.5, 1.25]
    # BAM binary round trip
    p = str(tmp_path / "t.bam")
    write_bam(p, refs, ["@HD\tVN:1.6"], [r])
    _, _, it = read_bam(p)
    r3 = next(iter(it))
    assert list(r3.tags["XB"]) == [1, -2, 300] and r3.tags["XB"].sub == "s"
    assert isinstance(r3.tags["XH"], HexStr) and r3.tags["XH"] == "1AE301"
    assert list(r3.tags["XL"]) == [7, 8, 9]
    assert r3.tags["NM"] == 3 and r3.tags["XA"] == "q"


def test_bam_long_cigar_cg_tag(tmp_path):
    """>65535 CIGAR ops ride the spec's CG:B,I workaround (kSmN
    placeholder) and decode back to the original CIGAR."""
    import numpy as np
    from lr2rmats_tpu.io.sam import OP_D, OP_M, cigar_qlen, cigar_rlen
    n_ops = 70_001                         # odd -> ends on M
    ops = np.empty(n_ops, np.uint32)
    ops[0::2] = (2 << 4) | OP_M
    ops[1::2] = (1 << 4) | OP_D
    qlen = cigar_qlen(ops)
    r = AlnRec(qname="long1", flag=0, tid=0, pos=10, mapq=60, cigar=ops,
               seq="A" * qlen, qual="*", tags={"NM": 5})
    refs = [("chr1", 10_000_000)]
    p = str(tmp_path / "long.bam")
    write_bam(p, refs, ["@HD\tVN:1.6"], [r])
    _, _, it = read_bam(p)
    r2 = next(iter(it))
    np.testing.assert_array_equal(r2.cigar, ops)
    assert "CG" not in r2.tags and r2.tags["NM"] == 5
    assert cigar_rlen(r2.cigar) == cigar_rlen(ops)


def test_bam_truncated_gzip_raises(tmp_path):
    """A BAM cut mid-stream fails loudly instead of yielding a silently
    shortened record set."""
    import pytest
    from lr2rmats_tpu.io.sam import bgzf_decompress
    import gzip
    p = tmp_path / "t.sam.gz"
    with gzip.open(str(p), "wb") as f:
        f.write(b"@HD\tVN:1.6\n" + b"x" * 100_000)
    data = p.read_bytes()
    cut = tmp_path / "cut.gz"
    cut.write_bytes(data[: len(data) // 2])
    with pytest.raises(EOFError):
        bgzf_decompress(str(cut))
