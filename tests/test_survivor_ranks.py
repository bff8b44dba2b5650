"""Primary/secondary + NH are decided among SURVIVORS of the extension
gate (review finding, 2026-08-19): when the top-scoring chain fails
`nmatch >= min_score` but a lower-ranked candidate survives, the read's
emitted record must be a real primary (no FSECONDARY, calibrated MAPQ)
with NH counting emitted records — across BOTH build paths (packed
RecordBatch and AlnRec), which must stay bit-identical."""

import numpy as np
import pytest

from lr2rmats_tpu.align.batch import BatchAligner, _survivor_ranks
from lr2rmats_tpu.index.minimizer import MinimizerIndex
from lr2rmats_tpu.io.fasta import Genome, SeqSet
from lr2rmats_tpu.io.sam import FSECONDARY


def test_survivor_ranks_unit():
    eff, nh = _survivor_ranks(np.array([0, 0, 2, 5, 5, 5], np.int64))
    np.testing.assert_array_equal(eff, [0, 1, 0, 0, 1, 2])
    np.testing.assert_array_equal(nh, [2, 2, 1, 3, 3, 3])
    eff, nh = _survivor_ranks(np.zeros(0, np.int64))
    assert len(eff) == 0 and len(nh) == 0


def _workload(seed=21, mb=2.0, n_reads=60):
    import bench
    rng = np.random.default_rng(seed)
    n = int(mb * 1e6)
    codes = rng.integers(0, 4, n).astype(np.uint8)
    genome = Genome(["c1"], codes, np.array([0, n], np.int64))
    reads, _ = bench.simulate_reads(genome, n_reads, rng)
    names = [f"r{i}" for i in range(len(reads))]
    return genome, names, reads


def _inject_bogus_top(monkeypatch):
    """Every read gains a fake top-scoring candidate pointing at an
    unrelated locus — its extension fails the nmatch gate, so the REAL
    candidate must become the primary."""
    real = BatchAligner._collect_candidates

    @staticmethod
    def patched(rows, chained):
        per_read = real(rows, chained)
        for ri, cands in per_read.items():
            cq = np.array([10, 40], np.int64)
            cg = np.array([1000, 1030], np.int64)
            cands.append((1e9, 0, cq, cg))
        return per_read

    monkeypatch.setattr(BatchAligner, "_collect_candidates", patched)


def _check_invariants(rb):
    """Exactly one non-secondary record per qname; NH == group size;
    the primary's MAPQ is calibrated (margin vs the bogus 1e9 score is
    tiny, so small — but whatever it is, not forced to 0)."""
    groups = {}
    for i in range(rb.n):
        groups.setdefault(rb.qname[i], []).append(i)
    assert groups, "no records emitted"
    for qn, idxs in groups.items():
        sec = [bool(rb.flag[i] & FSECONDARY) for i in idxs]
        assert sec.count(False) == 1, (qn, sec)
        for i in idxs:
            assert rb.nh[i] == len(idxs), (qn, rb.nh[i], len(idxs))
            if rb.flag[i] & FSECONDARY:
                assert rb.mapq[i] == 0
    return groups


@pytest.mark.parametrize("native", [True, False])
def test_failed_top_candidate_promotes_survivor(monkeypatch, native):
    from lr2rmats_tpu.align.records import RecordBatch
    if not native:
        monkeypatch.setenv("LR2RMATS_NO_NATIVE", "1")
        import lr2rmats_tpu.native.lib as nl
        monkeypatch.setattr(nl, "_LIB", None, raising=False)
    genome, names, reads = _workload()
    idx = MinimizerIndex.build(genome)
    al = BatchAligner(genome, index=idx, backend="host")
    try:
        _inject_bogus_top(monkeypatch)
        offs = np.zeros(len(reads) + 1, np.int64)
        np.cumsum([len(r) for r in reads], out=offs[1:])
        ss = SeqSet(names, np.concatenate(reads), offs)
        rb = al.align_seqset_packed(ss, batch_size=32, polish=False)
        _check_invariants(rb)
        # vacuousness guard: every read must have emitted exactly ONE
        # record (the bogus top candidate died at the extension gate) and
        # its primary's MAPQ must be margin-based (< MAPQ_UNIQUE=60),
        # proving the bogus candidate entered the candidate list — i.e.
        # the promotion path genuinely ran for every read
        assert rb.n == len(names)
        assert np.all(rb.nh == 1)
        assert np.all(rb.mapq < 60)
        # AlnRec twin path must agree byte-for-byte
        recs = al.align_batch(names, [np.asarray(r) for r in reads])
        rb2 = RecordBatch.from_alnrecs(recs)
        _check_invariants(rb2)
        assert rb.emit_sam(al.refs) == rb2.emit_sam(al.refs)
    finally:
        al.close()


def test_all_candidates_survive_unchanged(monkeypatch):
    """No injection: survivor ranks equal candidate ranks — behavior
    identical to the pre-fix code on the common path."""
    genome, names, reads = _workload(seed=22)
    idx = MinimizerIndex.build(genome)
    al = BatchAligner(genome, index=idx, backend="host")
    try:
        offs = np.zeros(len(reads) + 1, np.int64)
        np.cumsum([len(r) for r in reads], out=offs[1:])
        ss = SeqSet(names, np.concatenate(reads), offs)
        rb = al.align_seqset_packed(ss, batch_size=32, polish=False)
        _check_invariants(rb)
    finally:
        al.close()
