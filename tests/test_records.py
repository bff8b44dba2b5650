"""Packed RecordBatch path must byte-match the AlnRec reference path."""

import io

import numpy as np
import pytest

from lr2rmats_tpu.native import have_native


def _sim(n_reads=400, seed=7):
    rng = np.random.default_rng(seed)
    import importlib.util
    spec = importlib.util.spec_from_file_location("bench_sim", "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    genome = bench.build_genome(2_000_000, rng)
    reads, _ = bench.simulate_reads(genome, n_reads, rng, profile="ont")
    return genome, reads


@pytest.fixture(scope="module")
def aligned():
    from lr2rmats_tpu.align.batch import BatchAligner
    from lr2rmats_tpu.index.minimizer import MinimizerIndex
    genome, reads = _sim()
    idx = MinimizerIndex.build(genome)
    al = BatchAligner(genome, index=idx, backend="jax")
    names = [f"r{i}" for i in range(len(reads))]
    return al, names, reads


@pytest.mark.skipif(not have_native(), reason="native lib unavailable")
def test_packed_equals_alnrec_path(aligned):
    """_packed_from_extension == _records_from_extension record-for-record
    (same extension results, same order, same fields)."""
    al, names, reads = aligned
    rows = al._batch_anchors(reads)
    chained = al._chain_rows(rows)
    per_read = {}
    for r, ch in zip(rows, chained):
        pri, ps, sec, ss = ch
        if len(pri):
            per_read.setdefault(r.read_i, []).append(
                (ps, r.strand, r.qpos[pri], r.gpos[pri]))
        if len(sec):
            per_read.setdefault(r.read_i, []).append(
                (ss, r.strand, r.qpos[sec], r.gpos[sec]))
    order = sorted(per_read)
    from lr2rmats_tpu.native import get_lib
    lib = get_lib()
    packed, ext = al._extend_candidates_native(lib, reads, per_read, order)
    (cands_by_read, flat, reads_concat, read_offs, cand_read,
     cand_strand, aq, ag, a_offs, max_len) = packed
    ref = al._records_from_extension(names, reads, flat, cands_by_read, ext)
    rb = al._packed_from_extension(names, reads, flat, cands_by_read,
                                   reads_concat, read_offs, cand_read,
                                   cand_strand, ext)
    got = rb.to_alnrecs()
    assert len(got) == len(ref) > 0
    n_special = 0
    for a, b in zip(got, ref):
        assert (a.qname, a.flag, a.tid, a.pos, a.mapq) == \
            (b.qname, b.flag, b.tid, b.pos, b.mapq)
        np.testing.assert_array_equal(a.cigar, b.cigar)
        assert a.seq == b.seq
        assert a.tags == b.tags


@pytest.mark.skipif(not have_native(), reason="native lib unavailable")
def test_emit_sam_matches_samwriter(aligned):
    """Native format_sam_batch_c == SamWriter text, byte for byte."""
    from lr2rmats_tpu.io.sam import SamWriter
    al, names, reads = aligned

    class SS:
        n = len(reads)

        def __init__(self):
            self.names = names

        def get(self, i):
            return reads[i]

    rb = al.align_seqset_packed(SS())
    body = rb.emit_sam(al.refs)
    assert body == rb._emit_sam_py(al.refs)
    fp = io.StringIO()
    w = SamWriter(fp, al.refs)
    header_len = len(fp.getvalue())
    for rec in rb.to_alnrecs():
        w.write(rec)
    assert fp.getvalue()[header_len:].encode() == body


def test_recordbatch_roundtrip():
    """from_alnrecs -> to_alnrecs is the identity on every field."""
    from lr2rmats_tpu.align.records import RecordBatch
    from lr2rmats_tpu.io.sam import AlnRec
    recs = [
        AlnRec(qname="a", flag=16, tid=0, pos=100, mapq=60,
               cigar=np.array([(50 << 4) | 0, (200 << 4) | 3,
                               (30 << 4) | 0], np.uint32),
               seq="ACGTN" * 16, qual="*",
               tags={"NM": 2, "AS": 152, "NH": 1, "XS": "+"}),
        AlnRec(qname="b", flag=256, tid=1, pos=5, mapq=0,
               cigar=np.array([(10 << 4) | 4, (70 << 4) | 0], np.uint32),
               seq="ACGT" * 20, qual="*", tags={"NM": 0, "AS": 160,
                                                "NH": 2}),
    ]
    rb = RecordBatch.from_alnrecs(recs)
    back = rb.to_alnrecs()
    for a, b in zip(back, recs):
        assert (a.qname, a.flag, a.tid, a.pos, a.mapq, a.seq) == \
            (b.qname, b.flag, b.tid, b.pos, b.mapq, b.seq)
        np.testing.assert_array_equal(a.cigar, b.cigar)
        assert a.tags == b.tags
