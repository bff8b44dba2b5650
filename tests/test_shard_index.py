"""Hash-range-sharded minimizer index (parallel/shard_index.py):
bit-identity with the unsharded table, routed lookups, end-to-end
alignment equality, and pipeline byte-identity (VERDICT r2 #5)."""

import numpy as np
import pytest

from lr2rmats_tpu.index.minimizer import MinimizerIndex
from lr2rmats_tpu.io.fasta import Genome
from lr2rmats_tpu.parallel.shard_index import ShardedMinimizerIndex


def _genome(seed=3, mb=2.0, repeats=80):
    rng = np.random.default_rng(seed)
    n = int(mb * 1e6)
    codes = rng.integers(0, 4, n).astype(np.uint8)
    # paste repeats so the occurrence cap actually fires
    for _ in range(repeats):
        sl = int(rng.integers(2000, 6000))
        src = int(rng.integers(0, n - sl))
        dst = int(rng.integers(0, n - sl))
        codes[dst: dst + sl] = codes[src: src + sl]
    half = n // 2
    return Genome(["c1", "c2"], codes,
                  np.array([0, half, n], np.int64)), rng


@pytest.mark.parametrize("n_shards", [2, 4, 7])
def test_shard_merge_bit_identical(n_shards):
    """Stable hash-sort of concat(shards) == unsharded table: every hash
    lives in exactly one shard (mod-sharding) and both sorts are stable,
    so the merged table, the reduced occurrence cap, and every per-hash
    hit run match bit-for-bit.  Shards must also balance (window-minimum
    hashes skew low; h %% n fixes what contiguous ranges can't)."""
    genome, _ = _genome()
    full = MinimizerIndex.build(genome)
    sh = ShardedMinimizerIndex.build(genome, n_shards)
    assert sh.max_occ == full.max_occ
    cat_h = np.concatenate([s.hashes for s in sh.shards])
    order = np.argsort(cat_h, kind="stable")
    assert np.array_equal(cat_h[order], full.hashes)
    assert np.array_equal(sh.pos[order], full.pos)
    assert np.array_equal(sh.strand[order], full.strand)
    sizes = np.array([len(s.hashes) for s in sh.shards])
    assert sizes.min() > 0.5 * sizes.max()      # balanced


def test_routed_lookup_matches_full():
    genome, rng = _genome(seed=5)
    full = MinimizerIndex.build(genome)
    sh = ShardedMinimizerIndex.build(genome, 3)
    # query mix: real table hashes + randoms (misses)
    take = rng.integers(0, len(full.hashes), 5000)
    q = np.concatenate([full.hashes[take],
                        rng.integers(0, 2**63, 2000).astype(np.uint64)])
    rng.shuffle(q)
    lo_f, hi_f = full.lookup(q)
    lo_s, hi_s = sh.lookup(q)
    # per-query HIT LISTS must match exactly (offsets differ: the sharded
    # table is shard-concatenated, not globally hash-sorted)
    assert np.array_equal(hi_f - lo_f, hi_s - lo_s)
    for t in range(len(q)):
        assert np.array_equal(full.pos[lo_f[t]: hi_f[t]],
                              sh.pos[lo_s[t]: hi_s[t]])
        assert np.array_equal(full.strand[lo_f[t]: hi_f[t]],
                              sh.strand[lo_s[t]: hi_s[t]])


def test_numpy_fallback_shards_match(monkeypatch):
    """The pure-numpy build path shards identically (same histogram-based
    cap)."""
    import lr2rmats_tpu.native as native
    monkeypatch.setattr(native, "get_lib", lambda: None)
    genome, _ = _genome(seed=9, mb=0.5, repeats=40)
    full = MinimizerIndex.build(genome)
    sh = ShardedMinimizerIndex.build(genome, 2)
    assert sh.max_occ == full.max_occ
    cat_h = np.concatenate([s.hashes for s in sh.shards])
    order = np.argsort(cat_h, kind="stable")
    assert np.array_equal(cat_h[order], full.hashes)
    assert np.array_equal(sh.pos[order], full.pos)


def test_aligner_identical_records():
    """BatchAligner over the sharded index emits byte-identical SAM."""
    import bench
    from lr2rmats_tpu.align.batch import BatchAligner
    from lr2rmats_tpu.io.fasta import SeqSet
    genome, rng = _genome(seed=7, mb=3.0, repeats=10)
    reads, _ = bench.simulate_reads(genome, 150, rng)
    # drop reads crossing the chromosome boundary (flat-buffer simulator)
    names = [f"r{i}" for i in range(len(reads))]
    offs = np.zeros(len(reads) + 1, np.int64)
    np.cumsum([len(r) for r in reads], out=offs[1:])
    ss = SeqSet(names, np.concatenate(reads), offs)

    def run(index):
        al = BatchAligner(genome, index=index, backend="host")
        rb = al.align_seqset_packed(ss, batch_size=64)
        return rb.emit_sam(al.refs)

    full = MinimizerIndex.build(genome)
    sam_full = run(full)
    sam_shard = run(ShardedMinimizerIndex.build(genome, 4))
    assert sam_full == sam_shard


def test_pipeline_byte_identical_with_shards(tmp_path):
    """`run --index-shards 2` on the 8-virtual-device mesh produces a
    byte-identical updated.gtf to the unsharded single-path run (the
    production wiring, pipeline/stages.py)."""
    import subprocess
    import sys
    import os
    sim = tmp_path / "sim"
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": "",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    subprocess.run([sys.executable, "scripts/simulate.py", "--out", str(sim),
                    "--genome-mb", "2", "--genes", "60", "--long-reads",
                    "300", "--short-pairs", "150", "--seed", "11"],
                   check=True, env=env, capture_output=True, timeout=300)
    outs = {}
    for tag, extra in (("plain", []),
                       ("shard", ["--index-shards", "2"])):
        od = tmp_path / tag
        subprocess.run(
            [sys.executable, "-m", "lr2rmats_tpu", "run",
             "--genome", str(sim / "genome.fa"), "--gtf", str(sim / "anno.gtf"),
             "--long-read", str(sim / "long.fa"),
             "--short-read-1", str(sim / "short_1.fa"),
             "--short-read-2", str(sim / "short_2.fa"),
             "--out-dir", str(od), "--cpu"] + extra,
            check=True, env=env, capture_output=True, timeout=600,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        outs[tag] = (od / "output" / "updated.gtf").read_bytes()
    assert outs["plain"] == outs["shard"]


# ------------------------------------------------ multi-process (Gloo) arm
_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["LR2_REPO"])
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from lr2rmats_tpu.parallel.distributed import init_multihost, barrier
pid = int(sys.argv[1]); nproc = int(sys.argv[2])
init_multihost(os.environ["LR2_COORD"], nproc, pid)
import bench
from lr2rmats_tpu.align.batch import BatchAligner
from lr2rmats_tpu.io.fasta import Genome
from lr2rmats_tpu.parallel.shard_index import ShardedMinimizerIndex
rng = np.random.default_rng(31)
n = 2_000_000
codes = rng.integers(0, 4, n).astype(np.uint8)
genome = Genome(["c1"], codes, np.array([0, n], np.int64))
reads, _ = bench.simulate_reads(genome, 64, rng, err=0.01)
names = [f"r{i}" for i in range(len(reads))]
idx = ShardedMinimizerIndex.build(genome, nproc, local_shard=pid)
al = BatchAligner(genome, index=idx, backend="host")
# dp split: even halves, equal batch counts (collective lockstep), driven
# sequentially (no seed-ahead thread; see shard_index docstring)
my_names = names[pid::nproc]
my_reads = reads[pid::nproc]
B = 16
recs = []
for off in range(0, len(my_reads), B):
    h = al.dispatch_batch(my_names[off: off + B], my_reads[off: off + B])
    recs.extend(al.finish_batch(h))
out = sorted(r.qname + " " + str(r.pos) + " " +
             " ".join(str(c) for c in r.cigar) for r in recs
             if not (r.flag & 0x100))
open(os.environ["LR2_OUT"] + f".{pid}", "w").write("\n".join(out) + "\n")
barrier("done")
"""


def test_two_process_sharded_lookup(tmp_path):
    """Real 2-process Gloo cluster, one hash-range shard per process:
    primary alignments equal the single-process full-index run, and each
    process's resident table is ~half the full one."""
    import subprocess
    import sys
    import os
    import bench
    from lr2rmats_tpu.align.batch import BatchAligner

    # single-process reference with the full index
    rng = np.random.default_rng(31)
    n = 2_000_000
    codes = rng.integers(0, 4, n).astype(np.uint8)
    genome = Genome(["c1"], codes, np.array([0, n], np.int64))
    reads, _ = bench.simulate_reads(genome, 64, rng, err=0.01)
    names = [f"r{i}" for i in range(len(reads))]
    full = MinimizerIndex.build(genome)
    al = BatchAligner(genome, index=full, backend="host")
    want = {0: [], 1: []}
    for pid in range(2):
        my_names = names[pid::2]
        my_reads = reads[pid::2]
        recs = []
        for off in range(0, len(my_reads), 16):
            recs.extend(al.align_batch(my_names[off: off + 16],
                                       my_reads[off: off + 16]))
        want[pid] = sorted(
            r.qname + " " + str(r.pos) + " " +
            " ".join(str(c) for c in r.cigar)
            for r in recs if not (r.flag & 0x100))

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    out = str(tmp_path / "out")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "XLA_FLAGS": "",
           "PYTHONPATH": repo, "LR2_REPO": repo, "LR2_OUT": out,
           "LR2_COORD": "127.0.0.1:29881"}
    procs = [subprocess.Popen([sys.executable, str(script), str(pid), "2"],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True)
             for pid in range(2)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se[-3000:]
    for pid in range(2):
        got = open(out + f".{pid}").read().splitlines()
        assert got == want[pid]


def test_stale_index_cache_invalidated(tmp_path):
    """A cached .tmmi.npz built for an OLD genome with the same file name
    and chromosome names must be rebuilt (content signature) — a stale
    cache silently mis-places every seed (caught live at 500k scale)."""
    g1, _ = _genome(seed=1, mb=0.3, repeats=0)
    g2, _ = _genome(seed=2, mb=0.3, repeats=0)
    cache = str(tmp_path / "g.tmmi.npz")
    i1 = MinimizerIndex.build_or_load(g1, cache)
    # same names/length, different content -> must NOT reuse
    i2 = MinimizerIndex.build_or_load(g2, cache)
    assert not np.array_equal(i1.hashes, i2.hashes)
    full2 = MinimizerIndex.build(g2)
    assert np.array_equal(i2.hashes, full2.hashes)
    # unchanged genome -> reused
    i2b = MinimizerIndex.build_or_load(g2, cache)
    assert np.array_equal(i2b.hashes, full2.hashes)
