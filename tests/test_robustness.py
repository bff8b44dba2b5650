"""Edge-case robustness: empty inputs, unalignable reads, missing files."""

import numpy as np
import pytest

from lr2rmats_tpu.io.fasta import Genome, SeqSet, read_fasta
from lr2rmats_tpu.io.gtf import ChrNames
from lr2rmats_tpu.io.sj import SJTable, read_sj_group
from lr2rmats_tpu.transcript.classify import check_trans
from lr2rmats_tpu.transcript.model import Transcripts, UpdateGtfParams


def test_empty_transcript_sets():
    ugp = UpdateGtfParams()
    outs = [Transcripts() for _ in range(4)]
    check_trans(Transcripts(), Transcripts(), SJTable(), ugp, *outs)
    assert all(o.n == 0 for o in outs)


def test_empty_fasta(tmp_path):
    p = tmp_path / "empty.fa"
    p.write_text("")
    s = read_fasta(str(p))
    assert s.n == 0


def test_fasta_names_and_parsers_agree(tmp_path):
    """Native parse (vectorized _gather_names) == numpy parse on header
    edge cases: description after space/tab (cut), empty name, multiline
    records, no trailing newline."""
    from lr2rmats_tpu.io.fasta import (_parse_fasta_native, _parse_fasta_vec,
                                       decode_seq)
    from lr2rmats_tpu.utils.fileio import read_into_array
    text = (">r1 description words\nACGT\nACG\n"
            ">\nTTTT\n"
            ">r3\ttab-desc\nGG\n"
            ">r4\nACGTACGT")
    p = tmp_path / "edge.fa"
    p.write_text(text)
    buf = read_into_array(str(p))
    nat = _parse_fasta_native(buf)
    vec = _parse_fasta_vec(buf.tobytes())
    if nat is not None:
        assert nat.names == vec.names
        np.testing.assert_array_equal(nat.codes, vec.codes)
        np.testing.assert_array_equal(nat.offsets, vec.offsets)
    assert vec.names == ["r1", "", "r3", "r4"]
    assert decode_seq(vec.get(0)) == "ACGTACG"
    assert decode_seq(vec.get(3)) == "ACGTACGT"


def test_missing_sj_is_empty():
    assert read_sj_group(None, ChrNames()).n == 0


def test_aligner_empty_batch():
    from lr2rmats_tpu.align.batch import BatchAligner
    rng = np.random.default_rng(0)
    g = Genome(["c"], rng.integers(0, 4, 50_000).astype(np.uint8),
               np.array([0, 50_000], np.int64))
    al = BatchAligner(g)
    assert al.align_batch([], []) == []
    # all-N read: no minimizers
    assert al.align_batch(["n"], [np.full(500, 4, np.uint8)]) == []
    # tiny read shorter than k
    assert al.align_batch(["t"], [np.zeros(5, np.uint8)]) == []


def test_single_exon_read_aligns():
    from lr2rmats_tpu.align.batch import BatchAligner
    from lr2rmats_tpu.transcript.exon_chain import gen_exons
    rng = np.random.default_rng(1)
    g = Genome(["c"], rng.integers(0, 4, 100_000).astype(np.uint8),
               np.array([0, 100_000], np.int64))
    al = BatchAligner(g)
    read = g.codes[40_000:40_800].copy()
    recs = al.align_batch(["r"], [read])
    assert recs
    s, e, _ = gen_exons(recs[0], 3, 3, 50)
    assert len(s) == 1
    assert s[0] == 40_001 and e[0] == 40_800
    assert "XS" not in recs[0].tags  # no intron => no XS


def test_filter_empty_stream():
    from lr2rmats_tpu.transcript.filter import FilterParams, filter_alignments
    assert list(filter_alignments([], FilterParams())) == []


def test_junction_counter_no_junctions():
    from lr2rmats_tpu.junctions.sjcount import JunctionCounter
    rng = np.random.default_rng(2)
    g = Genome(["c"], rng.integers(0, 4, 10_000).astype(np.uint8),
               np.array([0, 10_000], np.int64))
    z = np.zeros(0, np.int32)
    jc = JunctionCounter(g, z, z, z, z)
    jc.add_read(g.codes[100:201].copy())
    offs = np.array([0, 101], np.int64)
    jc.count_seqset_batched(SeqSet(["r"], g.codes[100:201].copy(), offs))
    assert jc.result().n == 0
