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
