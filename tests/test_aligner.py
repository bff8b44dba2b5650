"""Long-read spliced aligner tests: simulated reads + the reference toy read."""

import numpy as np
import pytest

from lr2rmats_tpu.align.aligner import AlignParams, SpliceAligner
from lr2rmats_tpu.align.banded import banded_edit_path
from lr2rmats_tpu.align.chain import ChainParams, backtrack, chain_anchors
from lr2rmats_tpu.align.splice import refine_splice_indel
from lr2rmats_tpu.io.fasta import Genome, SeqSet, decode_seq, encode_seq, revcomp
from lr2rmats_tpu.io.sam import cigar_str
from lr2rmats_tpu.transcript.exon_chain import gen_exons

RNG = np.random.default_rng(42)


def random_genome(n=100_000, seed=0):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, n).astype(np.uint8)
    offs = np.array([0, n], np.int64)
    return Genome(["chrT"], codes, offs)


def splice_read(genome, exons, strand="+", err=0.0, seed=1):
    """Extract a spliced read from genome exons [(start0, end0_excl)...]."""
    rng = np.random.default_rng(seed)
    parts = [genome.codes[s:e].copy() for s, e in exons]
    read = np.concatenate(parts)
    if err > 0:
        mask = rng.random(len(read)) < err
        read[mask] = (read[mask] + rng.integers(1, 4, mask.sum())) % 4
    if strand == "-":
        read = revcomp(read)
    return read


def plant_motifs(genome, exons):
    """Write GT..AG donors/acceptors at the intron edges."""
    for (s1, e1), (s2, e2) in zip(exons[:-1], exons[1:]):
        genome.codes[e1] = 2      # G
        genome.codes[e1 + 1] = 3  # T
        genome.codes[s2 - 2] = 0  # A
        genome.codes[s2 - 1] = 2  # G


class TestBanded:
    def test_equal(self):
        q = encode_seq(b"ACGTACGT")
        ops, ed = banded_edit_path(q, q.copy())
        assert ops == [(0, 8)] and ed == 0

    def test_mismatch(self):
        q = encode_seq(b"ACGTACGT")
        r = encode_seq(b"ACGAACGT")
        ops, ed = banded_edit_path(q, r)
        assert ops == [(0, 8)] and ed == 1

    def test_indel(self):
        q = encode_seq(b"ACGTACGT")
        r = encode_seq(b"ACGTTACGT")
        ops, ed = banded_edit_path(q, r)
        assert ed == 1
        assert sum(l for op, l in ops if op == 2) == 1  # one D base


class TestChain:
    def test_colinear(self):
        q = np.array([0, 10, 20, 30])
        r = np.array([100, 110, 120, 130])
        f, par = chain_anchors(q, r, ChainParams())
        pri, ps, sec, ss = backtrack(f, par, 0.0)
        assert list(pri) == [0, 1, 2, 3]

    def test_intron_gap_chains_through(self):
        q = np.array([0, 10, 20, 30])
        r = np.array([100, 110, 5120, 5130])  # 5000bp intron after 2nd anchor
        f, par = chain_anchors(q, r, ChainParams())
        pri, _, _, _ = backtrack(f, par, 0.0)
        assert list(pri) == [0, 1, 2, 3]

    def test_outlier_excluded(self):
        q = np.array([0, 10, 15, 20])
        r = np.array([100, 110, 90000, 120])
        f, par = chain_anchors(np.sort(r) * 0 + q, r, ChainParams())
        # sort anchors by r as required
        order = np.lexsort((q, r))
        f, par = chain_anchors(q[order], r[order], ChainParams())
        pri, _, _, _ = backtrack(f, par, 0.0)
        assert len(pri) == 3


class TestAlignSimulated:
    def setup_method(self):
        self.g = random_genome(120_000, seed=7)
        self.exons = [(20_000, 20_400), (24_000, 24_250), (31_000, 31_350)]
        plant_motifs(self.g, self.exons)
        self.al = SpliceAligner(self.g)

    def _check(self, rec, exp_exons, strand_rev):
        s, e, rev = gen_exons(rec, 3, 3, 50)
        got = list(zip((s - 1).tolist(), e.tolist()))  # back to 0-based/excl
        assert got == [(a, b) for a, b in exp_exons]

    def test_forward_clean(self):
        read = splice_read(self.g, self.exons, "+")
        recs = self.al.align_read("r", read)
        assert len(recs) >= 1
        r = recs[0]
        assert not r.is_rev
        assert r.tags["NM"] == 0
        assert r.tags["XS"] == "+"
        self._check(r, self.exons, False)

    def test_reverse_clean(self):
        read = splice_read(self.g, self.exons, "-")
        recs = self.al.align_read("r", read)
        r = recs[0]
        assert r.is_rev
        self._check(r, self.exons, True)
        # '-' read over '+'-motif introns: XS must still be '+'
        assert r.tags["XS"] == "+"

    def test_with_errors(self):
        read = splice_read(self.g, self.exons, "+", err=0.02, seed=3)
        recs = self.al.align_read("r", read)
        r = recs[0]
        s, e, _ = gen_exons(r, 3, 3, 50)
        got = list(zip((s - 1).tolist(), e.tolist()))
        # splice sites must survive 2% error
        assert got == [(a, b) for a, b in self.exons]
        assert 0 < r.tags["NM"] < 40

    def test_unalignable(self):
        rng = np.random.default_rng(99)
        junk = rng.integers(0, 4, 500).astype(np.uint8)
        # random 500-mer is (with high probability) absent from the genome
        recs = self.al.align_read("junk", junk)
        # either no alignment or a weak one; no crash
        assert isinstance(recs, list)


class TestJunctionDP:
    def test_deletion_at_junction(self):
        g = random_genome(10_000, seed=11)
        exons = [(1000, 1300), (5000, 5300)]
        plant_motifs(g, exons)
        # read: exon1 minus its LAST base (deletion at boundary) + exon2
        read = np.concatenate([g.codes[1000:1299], g.codes[5000:5300]])
        al = SpliceAligner(g)
        recs = al.align_read("r", read)
        assert recs
        s, e, _ = gen_exons(recs[0], 3, 3, 50)
        # intron must still be placed on the GT..AG motif
        assert e[0] == 1300  # 1-based end of exon1
        assert s[1] == 5001  # 1-based start of exon2


def test_toy_read_full_pipeline(ref_data):
    """The shipped CCS read must produce the annotated splice chain."""
    g = Genome.load(str(ref_data / "genome" / "genome.fa"))
    from lr2rmats_tpu.io.fasta import read_fasta
    reads = read_fasta(str(ref_data / "read" / "samp1_long.fa"))
    al = SpliceAligner(g)
    recs = al.align_read(reads.names[0], reads.get(0))
    assert len(recs) == 1
    r = recs[0]
    assert r.is_rev
    assert r.tags["XS"] == "-"
    s, e, _ = gen_exons(r, 3, 3, 50)
    sites = []
    for i in range(len(s) - 1):
        sites += [int(e[i]), int(s[i + 1])]
    # all internal splice sites must be annotated ones (original.gtf)
    annotated = {1139348, 1139435, 1139616, 1139779, 1139866, 1141765,
                 1139414, 1139224, 1140750, 1140872, 1141951}
    assert all(x in annotated for x in sites), sites


class TestTerminalExonRescue:
    def test_small_leading_exon_recovered(self):
        g = random_genome(200_000, seed=55)
        # 40bp first exon (too short for chain anchors to always win),
        # then two normal exons
        exons = [(50_000, 50_040), (60_000, 60_400), (66_000, 66_350)]
        plant_motifs(g, exons)
        al = SpliceAligner(g)
        read = splice_read(g, exons, "+")
        recs = al.align_read("r", read)
        assert recs
        s, e, _ = gen_exons(recs[0], 3, 3, 50)
        got = list(zip((s - 1).tolist(), e.tolist()))
        assert got == [(a, b) for a, b in exons], got

    def test_small_trailing_exon_recovered(self):
        g = random_genome(200_000, seed=56)
        exons = [(50_000, 50_400), (60_000, 60_300), (66_000, 66_040)]
        plant_motifs(g, exons)
        al = SpliceAligner(g)
        read = splice_read(g, exons, "+")
        recs = al.align_read("r", read)
        assert recs
        s, e, _ = gen_exons(recs[0], 3, 3, 50)
        got = list(zip((s - 1).tolist(), e.tolist()))
        assert got == [(a, b) for a, b in exons], got

    def test_junk_clip_not_rescued(self):
        rng = np.random.default_rng(57)
        g = random_genome(200_000, seed=58)
        exons = [(60_000, 60_400), (66_000, 66_350)]
        plant_motifs(g, exons)
        al = SpliceAligner(g)
        body = splice_read(g, exons, "+")
        junk = rng.integers(0, 4, 60).astype(np.uint8)
        read = np.concatenate([junk, body])
        recs = al.align_read("r", read)
        assert recs
        s, e, _ = gen_exons(recs[0], 3, 3, 50)
        # junk must not become an extra exon; splice sites unchanged
        # (the terminal START may absorb 1-2 coincidentally matching junk
        # bases via drop-off extension — same as minimap2)
        assert len(s) == 2
        assert int(e[0]) == exons[0][1]       # donor
        assert int(s[1]) == exons[1][0] + 1   # acceptor
        assert int(e[1]) == exons[1][1]


class TestMultiChrom:
    """The genome buffer is concatenated; alignments must never cross
    chromosome boundaries."""

    def setup_method(self):
        rng = np.random.default_rng(71)
        c1 = rng.integers(0, 4, 60_000).astype(np.uint8)
        c2 = rng.integers(0, 4, 60_000).astype(np.uint8)
        codes = np.concatenate([c1, c2])
        self.g = Genome(["chrA", "chrB"], codes,
                        np.array([0, 60_000, 120_000], np.int64))
        # exons near the end of chrA and near the start of chrB
        self.exA = [(58_000, 58_400), (59_200, 59_600)]
        self.exB = [(60_200, 60_600), (61_500, 61_900)]  # global coords
        plant_motifs(self.g, self.exA)
        plant_motifs(self.g, self.exB)
        self.al = SpliceAligner(self.g)

    def test_reads_map_to_correct_chrom(self):
        from lr2rmats_tpu.align.batch import BatchAligner
        ba = BatchAligner(self.g, index=self.al.index)
        rA = splice_read(self.g, self.exA, "+")
        rB = splice_read(self.g, self.exB, "+")
        recs = {r.qname: r for r in ba.align_batch(["a", "b"], [rA, rB])
                if not (r.flag & 0x100)}
        assert recs["a"].tid == 0
        assert recs["b"].tid == 1
        sa, ea, _ = gen_exons(recs["a"], 3, 3, 50)
        assert list(sa) == [58_001, 59_201]          # chrA-local 1-based
        sb, eb, _ = gen_exons(recs["b"], 3, 3, 50)
        assert list(sb) == [201, 1_501]              # chrB-local 1-based

    def test_no_cross_chrom_splice(self):
        """A chimeric A+B read must not produce one spliced alignment whose
        intron spans the chromosome boundary."""
        half1 = self.g.codes[59_000: 59_600]
        half2 = self.g.codes[60_200: 60_800]
        read = np.concatenate([half1, half2])
        recs = self.al.align_read("chimera", read)
        for r in recs:
            s, e, _ = gen_exons(r, 3, 3, 50)
            chrom_len = 60_000
            assert e[-1] <= chrom_len, (r.tid, list(s), list(e))

    def test_extension_stops_at_boundary(self):
        # read = last 500bp of chrA + first 40bp of chrB (joined junk-ish):
        # the alignment of the chrA part must clamp at the boundary
        read = np.concatenate([self.g.codes[59_500: 60_000],
                               self.g.codes[60_000: 60_040]])
        recs = self.al.align_read("edge", read)
        assert recs
        r = recs[0]
        s, e, _ = gen_exons(r, 3, 3, 50)
        assert r.tid == 0
        assert e[-1] <= 60_000
