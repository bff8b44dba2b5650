"""Cross-tool BAM interop (VERDICT r3 item 5).

tests/golden/foreign/foreign.bam is produced by an INDEPENDENT writer
(tests/make_foreign_bam.c — its own BGZF framing + BAM record encoding on
zlib, zero code shared with io/sam.py), standing in for the external
samtools/minimap2 BAMs the reference pipeline consumes
(reference Snakefile:62,90-92).  Regenerate with:

    gcc -O2 -o /tmp/mfb tests/make_foreign_bam.c -lz
    /tmp/mfb tests/golden/foreign/foreign.bam
"""

from pathlib import Path

import numpy as np

from lr2rmats_tpu.io.sam import read_bam
from lr2rmats_tpu.junctions.bam2sj import bam2sj_records
from lr2rmats_tpu.transcript.exon_chain import gen_exons

FIXTURE = str(Path(__file__).parent / "golden" / "foreign" / "foreign.bam")


def _load():
    refs, hdr_lines, it = read_bam(FIXTURE)
    return refs, hdr_lines, list(it)


def test_foreign_bam_header():
    refs, hdr_lines, recs = _load()
    assert refs == [("chrF1", 100000), ("chrF2", 50000)]
    assert "@PG\tID:foreignwriter\tPN:foreignwriter" in hdr_lines
    assert len(recs) == 5


def test_foreign_bam_records():
    _, _, recs = _load()
    r1 = recs[0]
    assert (r1.qname, r1.flag, r1.tid, r1.pos, r1.mapq) == \
        ("longread1", 0, 0, 99, 60)
    assert [(int(c) & 0xF, int(c) >> 4) for c in r1.cigar] == \
        [(0, 20), (3, 100), (0, 20)]
    assert r1.seq == "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"
    assert r1.tags == {"NM": 1, "AS": 70, "NH": 1, "XS": "+"}

    r2 = recs[1]
    assert r2.is_rev and r2.tid == 1
    assert [(int(c) & 0xF, int(c) >> 4) for c in r2.cigar] == \
        [(4, 5), (0, 30), (4, 5)]

    assert recs[2].is_unmapped

    r4, r5 = recs[3], recs[4]
    assert r4.qname == r5.qname == "pair4"
    assert r4.is_proper_pair and r5.is_proper_pair
    assert (r4.mtid, r4.mpos, r4.isize) == (0, 1199, 270)


def test_foreign_bam_exon_chain():
    """The spliced long read flows through the bam2gtf path."""
    _, _, recs = _load()
    starts, ends, is_rev = gen_exons(recs[0], 3, 3, 50)
    np.testing.assert_array_equal(starts, [100, 220])
    np.testing.assert_array_equal(ends, [119, 239])
    assert not is_rev  # XS:A:+


def test_foreign_bam_bam2sj():
    """The proper-paired spliced mate flows through the bam2sj path."""
    _, _, recs = _load()
    t = bam2sj_records(iter(recs), genome=None, min_intron=3,
                       require_proper_pair=True, use_multi=True)
    # only pair4's first mate is proper-paired AND spliced; longread1 is
    # unpaired (skipped by the proper-pair gate, reference parse_bam.c:914)
    assert t.n == 1
    assert (int(t.tid[0]), int(t.don[0]), int(t.acc[0])) == (0, 1010, 1059)
    assert int(t.uniq_c[0]) == 1 and int(t.multi_c[0]) == 0
