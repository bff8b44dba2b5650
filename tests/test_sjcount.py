"""Junction-support counter tests (STAR SJ.out.tab role)."""

import numpy as np
import pytest

from lr2rmats_tpu.io.fasta import Genome, SeqSet, revcomp
from lr2rmats_tpu.junctions.sjcount import (JunctionCounter, SJCountParams,
                                            gather_junctions,
                                            count_junction_support)
from lr2rmats_tpu.transcript.model import Transcripts


def mk_genome(n=50_000, seed=5):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, n).astype(np.uint8)
    return Genome(["chrT"], codes, np.array([0, n], np.int64))


def mk_reads(arrs):
    offs = np.zeros(len(arrs) + 1, np.int64)
    np.cumsum([len(a) for a in arrs], out=offs[1:])
    return SeqSet([f"r{i}" for i in range(len(arrs))],
                  np.concatenate(arrs), offs)


def test_gather_junctions():
    T = Transcripts()
    T.append(0, False, [100, 300, 500], [200, 400, 600], init_novel=False)
    T2 = Transcripts()
    T2.append(0, False, [100, 500], [200, 600], init_novel=False)
    tid, don, acc, anno = gather_junctions([T, T2])
    assert list(don) == [201, 201, 401]
    assert list(acc) == [299, 499, 499]
    assert list(anno) == [1, 0, 1]  # the shared (201,299) keeps is_anno=1


class TestCounting:
    def setup_method(self):
        self.g = mk_genome()
        # junction: exon ends at 1-based 1000, next begins 3001
        # intron = 1001..3000
        self.tid = np.array([0], np.int32)
        self.don = np.array([1001], np.int32)
        self.acc = np.array([3000], np.int32)
        self.anno = np.array([1], np.int32)

    def spliced_read(self, left, right):
        """left bases before the junction + right bases after."""
        a = self.g.codes[1000 - left:1000]
        b = self.g.codes[3000:3000 + right]
        return np.concatenate([a, b])

    def test_crossing_read_counts(self):
        jc = JunctionCounter(self.g, self.tid, self.don, self.acc, self.anno)
        jc.add_read(self.spliced_read(50, 51))
        sj = jc.result()
        assert sj.uniq_c[0] == 1
        assert sj.multi_c[0] == 0
        assert sj.max_over[0] == 50

    def test_rc_crossing_read_counts(self):
        jc = JunctionCounter(self.g, self.tid, self.don, self.acc, self.anno)
        jc.add_read(revcomp(self.spliced_read(50, 51)))
        assert jc.result().uniq_c[0] == 1

    def test_small_overhang_ignored(self):
        jc = JunctionCounter(self.g, self.tid, self.don, self.acc, self.anno)
        jc.add_read(self.spliced_read(5, 96))  # 5 < min_overhang 8
        assert jc.result().uniq_c[0] == 0

    def test_contiguous_read_not_counted(self):
        jc = JunctionCounter(self.g, self.tid, self.don, self.acc, self.anno)
        jc.add_read(self.g.codes[5000:5101].copy())
        sj = jc.result()
        assert sj.uniq_c[0] == 0 and sj.multi_c[0] == 0

    def test_read_with_mismatches_counts(self):
        jc = JunctionCounter(self.g, self.tid, self.don, self.acc, self.anno)
        r = self.spliced_read(50, 51)
        r[10] = (r[10] + 1) % 4
        r[70] = (r[70] + 1) % 4
        jc.add_read(r)
        assert jc.result().uniq_c[0] == 1


def test_toy_data_junction_support(ref_data):
    from lr2rmats_tpu.io.fasta import read_fasta
    from lr2rmats_tpu.io.gtf import ChrNames, read_anno_trans
    g = Genome.load(str(ref_data / "genome" / "genome.fa"))
    cname = ChrNames(g.names)
    anno = read_anno_trans(str(ref_data / "gtf" / "original.gtf"), cname)
    novel = Transcripts()
    novel.append(0, True, [1138891, 1139435, 1139779, 1141765],
                 [1139348, 1139616, 1139866, 1141947], init_novel=False)
    r1 = read_fasta(str(ref_data / "read" / "samp1_short_1.fa"))
    r2 = read_fasta(str(ref_data / "read" / "samp1_short_2.fa"))
    sj = count_junction_support(g, [anno, novel], [r1, r2])
    by_j = {(int(sj.don[i]), int(sj.acc[i])): int(sj.uniq_c[i])
            for i in range(sj.n)}
    # annotated junctions get strong support
    assert by_j[(1139617, 1139778)] > 50
    assert by_j[(1139867, 1140749)] > 20
    # the long-read's novel exon-skip junction is supported
    assert by_j[(1139867, 1141764)] >= 1


def test_batched_matches_per_read(ref_data):
    """Batched counting must reproduce the per-read reference path."""
    from lr2rmats_tpu.io.fasta import read_fasta
    from lr2rmats_tpu.io.gtf import ChrNames, read_anno_trans
    g = Genome.load(str(ref_data / "genome" / "genome.fa"))
    cname = ChrNames(g.names)
    anno = read_anno_trans(str(ref_data / "gtf" / "original.gtf"), cname)
    novel = Transcripts()
    novel.append(0, True, [1138891, 1139435, 1139779, 1141765],
                 [1139348, 1139616, 1139866, 1141947], init_novel=False)
    from lr2rmats_tpu.junctions.sjcount import JunctionCounter, gather_junctions
    tid, don, acc, is_anno = gather_junctions([anno, novel])
    r1 = read_fasta(str(ref_data / "read" / "samp1_short_1.fa"))
    r2 = read_fasta(str(ref_data / "read" / "samp1_short_2.fa"))

    jc_a = JunctionCounter(g, tid, don, acc, is_anno)
    for rs in (r1, r2):
        jc_a.count_seqset(rs)
    jc_b = JunctionCounter(g, tid, don, acc, is_anno)
    for rs in (r1, r2):
        jc_b.count_seqset_batched(rs)
    a, b = jc_a.result(), jc_b.result()
    np.testing.assert_array_equal(a.uniq_c, b.uniq_c)
    np.testing.assert_array_equal(a.multi_c, b.multi_c)
    np.testing.assert_array_equal(a.max_over, b.max_over)


def test_batched_synthetic_matches():
    rng = np.random.default_rng(3)
    g = mk_genome(80_000, seed=8)
    tid = np.array([0, 0], np.int32)
    don = np.array([2001, 30001], np.int32)
    acc = np.array([5000, 44000], np.int32)
    anno = np.array([1, 0], np.int32)
    reads = []
    for i in range(200):
        j = int(rng.integers(0, 2))
        d, a = int(don[j]), int(acc[j])
        left = int(rng.integers(4, 90))
        seg = np.concatenate([g.codes[d - 1 - left: d - 1],
                              g.codes[a: a + (101 - left)]])
        if rng.random() < 0.3:
            seg = revcomp(seg)
        if rng.random() < 0.2:  # plain genomic read
            off = int(rng.integers(0, 70_000))
            seg = g.codes[off: off + 101].copy()
        reads.append(seg)
    rs = mk_reads(reads)
    a = JunctionCounter(g, tid, don, acc, anno)
    a.count_seqset(rs)
    b = JunctionCounter(g, tid, don, acc, anno)
    b.count_seqset_batched(rs)
    ra, rb = a.result(), b.result()
    np.testing.assert_array_equal(ra.uniq_c, rb.uniq_c)
    np.testing.assert_array_equal(ra.multi_c, rb.multi_c)
    np.testing.assert_array_equal(ra.max_over, rb.max_over)
    assert ra.uniq_c.sum() + ra.multi_c.sum() > 50


def _mk_seqset(reads):
    import numpy as np
    from lr2rmats_tpu.io.fasta import SeqSet
    offs = np.zeros(len(reads) + 1, np.int64)
    np.cumsum([len(r) for r in reads], out=offs[1:])
    return SeqSet([f"p{i}" for i in range(len(reads))],
                  np.concatenate(reads) if reads else np.zeros(0, np.uint8),
                  offs)


def test_paired_mate_consistency_gating():
    """A junction-crossing mate counts when its mate lands concordantly
    nearby on the opposite strand, and is REJECTED when the mate is
    discordant (other chromosome) — the STAR proper-pair analog."""
    import numpy as np
    from lr2rmats_tpu.io.fasta import Genome, revcomp
    from lr2rmats_tpu.junctions.sjcount import JunctionCounter, SJCountParams
    rng = np.random.default_rng(13)
    codes = rng.integers(0, 4, 40_000).astype(np.uint8)
    two = np.concatenate([codes, rng.integers(0, 4, 40_000).astype(np.uint8)])
    genome = Genome(["c1", "c2"], two.copy(),
                    np.array([0, 40_000, 80_000], np.int64))
    # one junction on c1: exon [1000,1200], intron, exon [2000,2200] (0-based)
    don, acc = 1200, 1999          # first/last intron base, 0-based
    genome.codes[1200:1202] = (2, 3)
    genome.codes[1998:2000] = (0, 2)
    jc = JunctionCounter(genome, np.array([0], np.int32),
                         np.array([don + 1], np.int32),   # 1-based
                         np.array([acc + 1], np.int32),
                         np.array([0], np.int32), SJCountParams())
    # crossing read: 40bp ending at donor + 40bp from acceptor side
    crossing = np.concatenate([genome.codes[1160:1200],
                               genome.codes[2000:2040]]).copy()
    mate_near = revcomp(genome.codes[2100:2180].copy())   # concordant mate
    mate_far = revcomp(genome.codes[50_000:50_080].copy())  # other chrom
    jc.count_pairs_batched(_mk_seqset([crossing]), _mk_seqset([mate_near]))
    assert jc.uniq_c[0] == 1
    jc2 = JunctionCounter(genome, np.array([0], np.int32),
                          np.array([don + 1], np.int32),
                          np.array([acc + 1], np.int32),
                          np.array([0], np.int32), SJCountParams())
    jc2.count_pairs_batched(_mk_seqset([crossing]), _mk_seqset([mate_far]))
    assert jc2.uniq_c[0] == 0 and jc2.multi_c[0] == 0


def test_paired_chunked_crossproduct_identical(monkeypatch):
    """The bounded-memory chunked mate cross-product (sjcount.py
    _PAIR_COMBO_CHUNK) produces counts identical to one dense pass,
    including empty placement groups interleaved between pairs."""
    import numpy as np
    import lr2rmats_tpu.junctions.sjcount as sj
    from lr2rmats_tpu.io.fasta import Genome, revcomp
    from lr2rmats_tpu.junctions.sjcount import JunctionCounter, SJCountParams
    rng = np.random.default_rng(31)
    codes = rng.integers(0, 4, 40_000).astype(np.uint8)
    genome = Genome(["c1"], codes, np.array([0, 40_000], np.int64))
    don, acc = 1200, 1999
    genome.codes[1200:1202] = (2, 3)
    genome.codes[1998:2000] = (0, 2)
    args = (genome, np.array([0], np.int32), np.array([don + 1], np.int32),
            np.array([acc + 1], np.int32), np.array([0], np.int32),
            SJCountParams())
    m1, m2 = [], []
    for i in range(12):
        o = 4 * i
        m1.append(np.concatenate([genome.codes[1160 - o:1200],
                                  genome.codes[2000:2040 + o]]).copy())
        if i % 3 == 2:  # unplaceable mate -> empty group
            m2.append(rng.integers(0, 4, 80).astype(np.uint8))
        else:
            m2.append(revcomp(genome.codes[2100 + o:2180 + o].copy()))
    results = []
    for chunk in (None, 1, 7):
        if chunk is not None:
            monkeypatch.setattr(sj, "_PAIR_COMBO_CHUNK", chunk)
        jc = JunctionCounter(*args)
        jc.count_pairs_batched(_mk_seqset(m1), _mk_seqset(m2))
        r = jc.result()
        results.append((r.uniq_c.copy(), r.multi_c.copy(),
                        r.max_over.copy()))
    assert results[0][0].sum() + results[0][1].sum() > 0  # not vacuous
    for got in results[1:]:
        for a, b in zip(results[0], got):
            np.testing.assert_array_equal(a, b)
