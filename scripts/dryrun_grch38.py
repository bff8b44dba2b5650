"""GRCh38-scale dry run (BASELINE config 4; VERDICT r1 #6).

Builds the native minimizer index over a synthetic 3.1 Gbp / 24-chromosome
genome, aligns 50k simulated multi-exon long reads through the batched
engine (int64 global coordinates, cluster-relative int32 device tensors),
and records wall times + peak RSS.  CPU-only by design — the goal is the
memory/scale envelope, not chip throughput.

    env JAX_PLATFORMS=cpu PYTHONPATH= python scripts/dryrun_grch38.py
"""

import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def _random_codes(rng, total: int) -> np.ndarray:
    """Uniform base codes in 64 MB chunks: rng.integers(..., np.int64)
    over the whole genome materializes an 8x int64 intermediate (25 GB at
    GRCh38 scale) that used to dominate peak RSS."""
    out = np.empty(total, np.uint8)
    CH = 64 << 20
    for off in range(0, total, CH):
        n = min(CH, total - off)
        out[off: off + n] = rng.integers(0, 4, n, dtype=np.int64
                                         ).astype(np.uint8)
    return out


def main():
    n_chrom = int(os.environ.get("DRYRUN_CHROMS", "24"))
    chrom_mb = float(os.environ.get("DRYRUN_CHROM_MB", "129"))
    n_reads = int(os.environ.get("DRYRUN_READS", "50000"))
    from lr2rmats_tpu.io.fasta import Genome
    from lr2rmats_tpu.index.minimizer import MinimizerIndex
    from lr2rmats_tpu.align.batch import BatchAligner
    import bench

    rng = np.random.default_rng(7)
    t0 = time.perf_counter()
    per = int(chrom_mb * 1e6)
    total = n_chrom * per
    codes = _random_codes(rng, total)
    offsets = np.arange(n_chrom + 1, dtype=np.int64) * per
    genome = Genome([f"chr{i+1}" for i in range(n_chrom)], codes, offsets)
    t_genome = time.perf_counter() - t0
    print(f"# genome {total/1e9:.2f} Gbp built {t_genome:.0f}s "
          f"rss={rss_gb():.1f}G", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    reads, truths = bench.simulate_reads(genome, n_reads, rng)
    # drop reads whose gene crosses a chromosome boundary (the simulator
    # plants on the flat buffer)
    keep = []
    for i, parts in enumerate(truths):
        lo, hi = parts[0][0], parts[-1][1]
        t0i = np.searchsorted(offsets, lo, side="right") - 1
        if hi <= offsets[t0i + 1]:
            keep.append(i)
    reads = [reads[i] for i in keep]
    truths = [truths[i] for i in keep]
    names = [f"read{i}" for i in range(len(reads))]
    t_sim = time.perf_counter() - t0
    print(f"# {len(reads)} reads simulated {t_sim:.0f}s", file=sys.stderr,
          flush=True)

    t0 = time.perf_counter()
    idx = MinimizerIndex.build(genome)
    t_index = time.perf_counter() - t0
    idx_gb = (idx.hashes.nbytes + idx.pos.nbytes + idx.strand.nbytes) / 1e9
    print(f"# index built {t_index:.0f}s, {len(idx.hashes)/1e6:.0f}M "
          f"minimizers ({idx_gb:.1f} GB), rss={rss_gb():.1f}G",
          file=sys.stderr, flush=True)

    aligner = BatchAligner(genome, index=idx)
    t0 = time.perf_counter()
    from lr2rmats_tpu.io.fasta import SeqSet
    offs = np.zeros(len(reads) + 1, np.int64)
    np.cumsum([len(r) for r in reads], out=offs[1:])
    seqset = SeqSet(names, np.concatenate(reads), offs)
    n_aligned = 0
    primary = {}
    for r in aligner.align_seqset(seqset, batch_size=1536):
        if not (r.flag & 0x100):
            n_aligned += 1
            primary[r.qname] = r
    t_align = time.perf_counter() - t0
    print(f"# aligned {n_aligned}/{len(reads)} in {t_align:.0f}s "
          f"rss={rss_gb():.1f}G", file=sys.stderr, flush=True)

    from lr2rmats_tpu.transcript.exon_chain import gen_exons
    exact = 0
    for i, parts in enumerate(truths):
        ts = []
        for (a1, b1), (a2, b2) in zip(parts[:-1], parts[1:]):
            ts += [b1, a2 + 1]
        # truth sites are flat-buffer coords; records are per-chrom —
        # convert via the read's chromosome
        r = primary.get(names[i])
        if r is None:
            continue
        base = int(offsets[r.tid])
        es, ee, _ = gen_exons(r, 3, 3, 50)
        got = []
        for j in range(len(es) - 1):
            got += [base + int(ee[j]), base + int(es[j + 1])]
        if got == ts:
            exact += 1

    out = {
        "metric": "grch38_dryrun",
        "genome_gbp": round(total / 1e9, 2),
        "n_chrom": n_chrom,
        "minimizers_m": round(len(idx.hashes) / 1e6, 1),
        "index_gb": round(idx_gb, 2),
        "index_build_s": round(t_index, 1),
        "n_reads": len(reads),
        "align_wall_s": round(t_align, 1),
        "reads_per_s": round(len(reads) / t_align, 1),
        "aligned_frac": round(n_aligned / len(reads), 4),
        "exact_exon_chain_frac": round(exact / len(reads), 4),
        "peak_rss_gb": round(rss_gb(), 1),
        "platform": os.environ.get("JAX_PLATFORMS", "default"),
    }
    print(json.dumps(out))


# --------------------------------------------------- sharded-index arm
def _gen_workload(n_chrom, chrom_mb, n_reads):
    """Same genome + reads as main() (same seed on every process)."""
    from lr2rmats_tpu.io.fasta import Genome
    import bench
    rng = np.random.default_rng(7)
    per = int(chrom_mb * 1e6)
    total = n_chrom * per
    codes = _random_codes(rng, total)
    offsets = np.arange(n_chrom + 1, dtype=np.int64) * per
    genome = Genome([f"chr{i+1}" for i in range(n_chrom)], codes, offsets)
    reads, truths = bench.simulate_reads(genome, n_reads, rng)
    keep = []
    for i, parts in enumerate(truths):
        lo, hi = parts[0][0], parts[-1][1]
        t0i = np.searchsorted(offsets, lo, side="right") - 1
        if hi <= offsets[t0i + 1]:
            keep.append(i)
    reads = [reads[i] for i in keep]
    truths = [truths[i] for i in keep]
    names = [f"read{i}" for i in range(len(reads))]
    return genome, offsets, reads, truths, names


def _workload_path(cache_dir, n_chrom, chrom_mb, n_reads):
    return os.path.join(
        cache_dir, f"workload_c{n_chrom}_m{chrom_mb:g}_r{n_reads}.d")


def _workload_shared(pid, n_chrom, chrom_mb, n_reads, cache_dir):
    """Multi-process workload: process 0 (or the precursor) simulates
    once and saves the mutated genome + concatenated reads + truth
    arrays as a DIRECTORY of plain .npy files; peers memory-map them.
    npz members cannot be mmapped (numpy silently ignores mmap_mode
    inside a zip — the first version of this cache materialized a full
    private ~10 GB copy per worker), so each array is its own .npy.
    At 5M reads the simulation costs tens of minutes; sharing pages via
    mmap keeps per-process RSS honest to the FRAMEWORK footprint, not
    the harness's."""
    from lr2rmats_tpu.io.fasta import Genome
    from lr2rmats_tpu.parallel.distributed import barrier
    d = _workload_path(cache_dir, n_chrom, chrom_mb, n_reads)
    done = os.path.join(d, "DONE")
    if pid == 0 and not os.path.exists(done):
        genome, offsets, reads, truths, names = _gen_workload(
            n_chrom, chrom_mb, n_reads)
        ro = np.zeros(len(reads) + 1, np.int64)
        np.cumsum([len(r) for r in reads], out=ro[1:])
        rc = np.concatenate(reads) if reads else np.zeros(0, np.uint8)
        parts_n = np.array([len(t) for t in truths], np.int32)
        parts = np.array([p for t in truths for p in t], np.int64)
        os.makedirs(d, exist_ok=True)
        np.save(os.path.join(d, "codes.npy"), genome.codes)
        np.save(os.path.join(d, "offsets.npy"), offsets)
        np.save(os.path.join(d, "read_codes.npy"), rc)
        np.save(os.path.join(d, "read_offs.npy"), ro)
        np.save(os.path.join(d, "parts_n.npy"), parts_n)
        np.save(os.path.join(d, "parts.npy"), parts)
        with open(done, "w") as f:
            f.write("ok\n")
        del reads, rc
    barrier("workload-ready")
    codes = np.load(os.path.join(d, "codes.npy"), mmap_mode="r")
    offsets = np.load(os.path.join(d, "offsets.npy"))
    genome = Genome([f"chr{i+1}" for i in range(n_chrom)], codes, offsets)
    rc = np.load(os.path.join(d, "read_codes.npy"), mmap_mode="r")
    ro = np.load(os.path.join(d, "read_offs.npy"))
    reads = [rc[ro[i]: ro[i + 1]] for i in range(len(ro) - 1)]
    pn = np.load(os.path.join(d, "parts_n.npy"))
    pflat = np.load(os.path.join(d, "parts.npy"), mmap_mode="r")
    po = np.zeros(len(pn) + 1, np.int64)
    np.cumsum(pn, out=po[1:])
    # lazy truth view: materializing 5M lists-of-tuples costs ~3 GB of
    # python objects; the accuracy loop only indexes truths[i] once
    truths = _LazyTruths(pflat, po)
    names = [f"read{i}" for i in range(len(reads))]
    return genome, offsets, reads, truths, names


class _LazyTruths:
    def __init__(self, pflat, po):
        self._pflat = pflat
        self._po = po

    def __len__(self):
        return len(self._po) - 1

    def __getitem__(self, i):
        return [tuple(int(x) for x in p)
                for p in self._pflat[self._po[i]: self._po[i + 1]]]


def shard_worker(pid: int, nproc: int):
    """One host of the sharded-index arm (VERDICT r2 #5): builds ONLY its
    hash-range shard (~1/n of the table resident), aligns its round-robin
    read slice with collective batch lookups, reports per-process stats."""
    from lr2rmats_tpu.align.batch import BatchAligner
    from lr2rmats_tpu.parallel.distributed import barrier, init_multihost
    from lr2rmats_tpu.parallel.shard_index import ShardedMinimizerIndex
    # DRYRUN_COORD is set per-invocation by shard_parent: a FIXED default
    # port let a second concurrent dryrun connect to the first job's
    # coordination service as a "restarted" task and abort both (observed
    # 2026-08-20: a micro test killed a 5M run 35 min in)
    init_multihost(os.environ["DRYRUN_COORD"], nproc, pid)
    n_chrom = int(os.environ.get("DRYRUN_CHROMS", "24"))
    chrom_mb = float(os.environ.get("DRYRUN_CHROM_MB", "129"))
    n_reads = int(os.environ.get("DRYRUN_READS", "50000"))
    wl_cache = os.environ.get("DRYRUN_WORKLOAD_CACHE", "")
    if wl_cache:
        genome, offsets, reads, truths, names = _workload_shared(
            pid, n_chrom, chrom_mb, n_reads, wl_cache)
    else:
        genome, offsets, reads, truths, names = _gen_workload(
            n_chrom, chrom_mb, n_reads)
    print(f"# [{pid}] workload ready rss={rss_gb():.1f}G", file=sys.stderr,
          flush=True)
    t0 = time.perf_counter()
    # DRYRUN_SHARD_CACHE=<dir>: reuse a previously built local shard so
    # collective-lookup experiments do not pay the ~420 s extraction
    cache_dir = os.environ.get("DRYRUN_SHARD_CACHE", "")
    cpath = (os.path.join(cache_dir, f"shard{pid}of{nproc}.npz")
             if cache_dir else "")
    from lr2rmats_tpu.index.minimizer import MinimizerIndex
    from lr2rmats_tpu.parallel.distributed import gather_blobs
    idx = None
    sig = MinimizerIndex.genome_signature(genome) if cpath else ""
    rawdir = cpath + ".raw" if cpath else ""
    local = None
    if rawdir and os.path.exists(os.path.join(rawdir, "meta.json")):
        cand = MinimizerIndex.load_raw(rawdir, mmap=True)
        if getattr(cand, "genome_sig", "") == sig:
            local = cand
        else:
            print(f"# [{pid}] shard cache genome signature mismatch; "
                  "rebuilding", file=sys.stderr, flush=True)
    # the cache-valid decision must be COLLECTIVE: a worker that rebuilds
    # enters the histogram all-reduce inside build() while cache-hit
    # workers would skip it — mismatched gathers then pair query payloads
    # with histogram bytes (or hang).  All workers agree first; any miss
    # means everyone rebuilds.
    votes = gather_blobs(b"\x01" if local is not None else b"\x00")
    if all(v == b"\x01" for v in votes):
        from lr2rmats_tpu.parallel.shard_index import ShardedMinimizerIndex as S
        shards = [None] * nproc
        shards[pid] = local
        idx = S(shards, local_only=True)
        idx.local_shard = pid
    else:
        if local is not None:
            print(f"# [{pid}] a peer's shard cache is invalid; rebuilding "
                  "collectively", file=sys.stderr, flush=True)
        idx = ShardedMinimizerIndex.build(genome, nproc, local_shard=pid)
        if cpath:
            idx.shards[pid].save_raw(rawdir, genome_sig=sig)
    t_index = time.perf_counter() - t0
    idx_gb = idx.resident_bytes() / 1e9
    print(f"# [{pid}] shard built {t_index:.0f}s ({idx_gb:.1f} GB resident) "
          f"rss={rss_gb():.1f}G", file=sys.stderr, flush=True)
    aligner = BatchAligner(genome, index=idx, backend="host")
    my = list(range(pid, len(reads), nproc))
    B = 1536
    import math
    max_slice = math.ceil(len(reads) / nproc)
    n_batches = math.ceil(max_slice / B)
    t0 = time.perf_counter()
    # primary holds compact (tid, pos, flag, cigar) tuples, not AlnRec:
    # the accuracy check below needs only coordinates + CIGAR, and a dict
    # of millions of record objects (seq/qual strings) is a harness
    # artifact, not framework footprint — the production pipeline streams
    # records to SAM instead of retaining them
    primary = {}
    for b in range(n_batches):
        part = my[b * B: (b + 1) * B]
        if part:
            h = aligner.dispatch_batch([names[i] for i in part],
                                       [reads[i] for i in part])
            for r in aligner.finish_batch(h):
                if not (r.flag & 0x100):
                    primary[r.qname] = (r.tid, r.pos, r.flag, r.cigar)
        else:
            # lockstep pad: peers may still have batches in flight
            idx.lookup_collective(np.zeros(0, np.uint64))
        if b and b % 32 == 0:
            # return freed arena pages to the OS: the collective path's
            # churn (per-batch multi-MB frames) can strand gigabytes of
            # free-but-held memory in the glibc brk heap, inflating the
            # recorded ru_maxrss peak (observed: 7 GB on worker 0)
            import ctypes as _ct
            import gc as _gc
            _gc.collect()
            try:
                _ct.CDLL("libc.so.6").malloc_trim(0)
            except OSError:
                pass
        if pid == 0 and b and b % 64 == 0:
            done_r = min(b * B, len(my))
            el = time.perf_counter() - t0
            print(f"# [0] align {b}/{n_batches} batches "
                  f"({done_r / el:.0f} r/s/proc, {el:.0f}s, "
                  f"rss={rss_gb():.1f}G)", file=sys.stderr, flush=True)
    t_align = time.perf_counter() - t0
    from lr2rmats_tpu.transcript.exon_chain import gen_exons
    exact = 0
    for i in my:
        parts = truths[i]
        ts = []
        for (a1, b1), (a2, b2) in zip(parts[:-1], parts[1:]):
            ts += [b1, a2 + 1]
        hit = primary.get(names[i])
        if hit is None:
            continue
        tid, pos, flag, cigar = hit
        from lr2rmats_tpu.io.sam import AlnRec
        r = AlnRec(qname=names[i], flag=flag, tid=tid, pos=pos, cigar=cigar)
        base = int(offsets[tid])
        es, ee, _ = gen_exons(r, 3, 3, 50)
        got = []
        for j in range(len(es) - 1):
            got += [base + int(ee[j]), base + int(es[j + 1])]
        if got == ts:
            exact += 1
    out = {
        "process": pid,
        "n_shards": nproc,
        "shard_minimizers_m": round(idx.resident_bytes() / 17 / 1e6, 1),
        "shard_index_gb": round(idx_gb, 2),
        "index_build_s": round(t_index, 1),
        "n_reads": len(my),
        "aligned": len(primary),
        "exact": exact,
        "align_wall_s": round(t_align, 1),
        "peak_rss_gb": round(rss_gb(), 1),
        "phase_s": {k: round(v, 1) for k, v in aligner.stats.items()
                    if k.endswith("_s")},
        "collective": {k: round(v, 1) for k, v in idx.coll_stats.items()},
    }
    print(json.dumps(out))
    barrier("dryrun-done")


def shard_parent(n_shards: int):
    """Spawn the worker processes, merge their stats into
    GRCH38_DRYRUN.json under a 'shards' key."""
    import subprocess
    me = os.path.abspath(__file__)
    # Pre-build the shared workload in a precursor process so the
    # workers' reported peak RSS is the FRAMEWORK footprint, not the
    # simulator's
    wl_cache = os.environ.get("DRYRUN_WORKLOAD_CACHE", "")
    if wl_cache:
        wpath = _workload_path(
            wl_cache, int(os.environ.get("DRYRUN_CHROMS", "24")),
            float(os.environ.get("DRYRUN_CHROM_MB", "129")),
            int(os.environ.get("DRYRUN_READS", "50000")))
        if not os.path.exists(os.path.join(wpath, "DONE")):
            print("# generating shared workload (precursor process)...",
                  file=sys.stderr, flush=True)
            subprocess.run(
                [sys.executable, me, "--gen-workload"],
                env={**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH":
                     os.path.dirname(os.path.dirname(me))}, check=True)
    # DRYRUN_PIN=1: give every worker a disjoint taskset slice (the
    # pinned-core discipline that measured 126% 1->2 efficiency,
    # SCALING.json pinned_equal_resources) instead of 2N processes
    # thrashing the same cores.
    ncpu = os.cpu_count() or 4
    per = max(1, ncpu // n_shards)
    pin = os.environ.get("DRYRUN_PIN", "") not in ("", "0")

    def argv(pid):
        base = [sys.executable, me, "--shard-worker", str(pid),
                "--shards", str(n_shards)]
        if pin:
            lo = pid * per
            return ["taskset", "-c", f"{lo}-{lo + per - 1}"] + base
        return base

    coord = os.environ.get(
        "DRYRUN_COORD", f"127.0.0.1:{20000 + os.getpid() % 20000}")
    procs = [subprocess.Popen(
        argv(pid),
        stdout=subprocess.PIPE, stderr=sys.stderr, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH":
             os.path.dirname(os.path.dirname(me)), "DRYRUN_COORD": coord})
        for pid in range(n_shards)]
    stats = []
    for p in procs:
        so, _ = p.communicate()
        assert p.returncode == 0, f"worker rc={p.returncode}"
        stats.append(json.loads(
            [l for l in so.splitlines() if l.startswith("{")][-1]))
    n_reads = sum(s["n_reads"] for s in stats)
    merged = {
        "n_shards": n_shards,
        "per_process": stats,
        "peak_rss_gb_max": max(s["peak_rss_gb"] for s in stats),
        "aligned_frac": round(sum(s["aligned"] for s in stats) / n_reads, 4),
        "exact_exon_chain_frac": round(
            sum(s["exact"] for s in stats) / n_reads, 4),
        "n_reads_total": n_reads,
        "reads_per_s_aggregate": round(
            n_reads / max(max(s["align_wall_s"] for s in stats), 1e-9), 1),
    }
    path = os.environ.get("DRYRUN_JSON") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "GRCH38_DRYRUN.json")
    doc = {}
    if os.path.exists(path):
        with open(path) as f:
            doc = json.load(f)
    doc[os.environ.get("DRYRUN_KEY", "shards")] = merged
    with open(path, "w") as f:
        json.dump(doc, f)
        f.write("\n")
    print(json.dumps(merged))


if __name__ == "__main__":
    if "--gen-workload" in sys.argv:
        _workload_shared(
            0, int(os.environ.get("DRYRUN_CHROMS", "24")),
            float(os.environ.get("DRYRUN_CHROM_MB", "129")),
            int(os.environ.get("DRYRUN_READS", "50000")),
            os.environ["DRYRUN_WORKLOAD_CACHE"])
    elif "--shard-worker" in sys.argv:
        i = sys.argv.index("--shard-worker")
        n = int(sys.argv[sys.argv.index("--shards") + 1])
        shard_worker(int(sys.argv[i + 1]), n)
    elif "--shards" in sys.argv:
        shard_parent(int(sys.argv[sys.argv.index("--shards") + 1]))
    else:
        main()
