"""Multi-process scaling THROUGHPUT measurement (VERDICT r3 item 6;
north-star metric BASELINE.json: scaling efficiency 1 -> 2 hosts).

Splits the 500k-read simulation into 4 equal samples, then runs the full
pipeline at --num-processes 1, 2, 4 (jax.distributed Gloo process group on
ONE host — the only rig available; every process also fights for the same
4 cores, so the efficiencies below are a LOWER bound on multi-host
scaling, where each process owns its own cores).  Records reads/s and
efficiency into SCALING.json and asserts updated.gtf is byte-identical
across arms.

    python scripts/bench_scaling_throughput.py [--sim /tmp/sim500k]
        [--procs 1,2,4] [--out SCALING.json]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_SAMPLES = 4


def split_samples(sim: str, work: str):
    """Contiguous 4-way split of long.fa; same short pair per sample."""
    os.makedirs(work, exist_ok=True)
    marker = os.path.join(work, ".split_done")
    paths = [os.path.join(work, f"long_s{i}.fa") for i in range(N_SAMPLES)]
    if not os.path.exists(marker):
        # count records, then stream-split
        n = 0
        with open(os.path.join(sim, "long.fa")) as f:
            for line in f:
                n += line.startswith(">")
        per = -(-n // N_SAMPLES)
        outs = [open(p, "w") for p in paths]
        k = -1
        with open(os.path.join(sim, "long.fa")) as f:
            for line in f:
                if line.startswith(">"):
                    k += 1
                outs[min(k // per, N_SAMPLES - 1)].write(line)
        for o in outs:
            o.close()
        with open(marker, "w") as f:
            f.write(f"{n}\n")
    with open(marker) as f:
        n_reads = int(f.read().split()[0])
    long_list = os.path.join(work, "long.list")
    short_list = os.path.join(work, "short.list")
    with open(long_list, "w") as f:
        f.write(f"{N_SAMPLES}\n")
        for p in paths:
            f.write(f"1\n{p}\n")
    with open(short_list, "w") as f:
        f.write(f"{N_SAMPLES}\n")
        for _ in paths:
            f.write(f"1\n{sim}/short_1.fa {sim}/short_2.fa\n")
    return long_list, short_list, n_reads


def run_arm(sim, long_list, short_list, out_dir, nproc, port, pin=0):
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO,
           "XLA_FLAGS": ""}
    if pin:
        # equal-resources-per-"host" mode: every process owns a disjoint
        # pin-core slice, and the aligner thread pool matches it
        env["LR2RMATS_THREADS"] = str(pin)

    def wrap(cmd, pid):
        if not pin:
            return cmd
        cores = ",".join(str(c) for c in range(pid * pin, (pid + 1) * pin))
        return ["taskset", "-c", cores] + cmd

    base = [sys.executable, "-m", "lr2rmats_tpu", "run",
            "--genome", f"{sim}/genome.fa", "--gtf", f"{sim}/anno.gtf",
            "--long-read-list", long_list, "--short-read-list", short_list,
            "--out-dir", out_dir, "--cpu"]
    t0 = time.perf_counter()
    if nproc == 1:
        r = subprocess.run(wrap(base, 0), env=env, capture_output=True,
                           text=True, timeout=3600)
        assert r.returncode == 0, r.stderr[-3000:]
    else:
        procs = [subprocess.Popen(
            wrap(base + ["--coordinator", f"127.0.0.1:{port}",
                         "--num-processes", str(nproc),
                         "--process-id", str(pid)], pid),
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=REPO) for pid in range(nproc)]
        for p in procs:
            _, se = p.communicate(timeout=3600)
            assert p.returncode == 0, se[-3000:]
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sim", default="/tmp/sim500k")
    ap.add_argument("--procs", default="1,2,4")
    ap.add_argument("--out", default=os.path.join(REPO, "SCALING.json"))
    ap.add_argument("--work", default="/tmp/sim500k_scaling")
    ap.add_argument("--pin-cores", type=int, default=0, metavar="N",
                    help="give every process its own disjoint N-core slice "
                         "(taskset) + an N-thread aligner pool — the "
                         "equal-resources-per-host analog of multi-host "
                         "scaling (north-star metric).  procs*N must not "
                         "exceed the machine's cores.")
    args = ap.parse_args()

    long_list, short_list, n_reads = split_samples(args.sim, args.work)
    print(f"[scaling] {n_reads} long reads over {N_SAMPLES} samples",
          file=sys.stderr)

    arms = {}
    ref_gtf = None
    for i, nproc in enumerate(int(x) for x in args.procs.split(",")):
        out_dir = os.path.join(args.work, f"out_p{nproc}")
        subprocess.run(["rm", "-rf", out_dir], check=True)
        wall = run_arm(args.sim, long_list, short_list, out_dir, nproc,
                       29650 + i, pin=args.pin_cores)
        with open(os.path.join(out_dir, "output", "updated.gtf"), "rb") as f:
            gtf = f.read()
        if ref_gtf is None:
            ref_gtf = gtf
        ident = gtf == ref_gtf
        arms[nproc] = dict(wall_s=round(wall, 1),
                           reads_per_s=round(n_reads / wall, 1),
                           updated_gtf_identical=ident)
        print(f"[scaling] nproc={nproc} wall={wall:.1f}s "
              f"rps={n_reads / wall:.0f} identical={ident}", file=sys.stderr)

    base_rps = arms[min(arms)]["reads_per_s"]
    for nproc, a in arms.items():
        a["efficiency_vs_1proc"] = round(
            a["reads_per_s"] / (base_rps * nproc / min(arms)), 3)
    if args.pin_cores:
        backend = (f"jax.distributed (Gloo), CPU, {args.pin_cores} pinned "
                   "cores + matching thread pool per process (taskset)")
        caveat = ("equal-resources-per-host analog: every process owns a "
                  "disjoint core slice, so efficiency measures the "
                  "coordination + merge cost itself (the multi-host "
                  "north-star), not core contention")
    else:
        backend = "jax.distributed (Gloo), CPU, single 4-core host"
        caveat = ("all processes share one 4-core host: per-process host "
                  "phases contend, so efficiency here is a lower bound on "
                  "multi-host scaling where each process owns its cores")
    doc = dict(
        metric=("multiprocess_scaling_500k_pinned" if args.pin_cores
                else "multiprocess_scaling_500k"),
        n_reads=n_reads, n_samples=N_SAMPLES,
        backend=backend, caveat=caveat,
        arms={str(k): v for k, v in sorted(arms.items())})
    # the committed artifact holds BOTH framings: shared-host arms at the
    # top level, pinned arms nested under "pinned_equal_resources" — a
    # re-run of either mode merges into the other rather than clobbering
    merged = {}
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                merged = json.load(f)
        except Exception:
            merged = {}
    if args.pin_cores:
        merged["pinned_equal_resources"] = doc
    else:
        pinned = merged.get("pinned_equal_resources")
        merged = doc
        if pinned is not None:
            merged["pinned_equal_resources"] = pinned
    with open(args.out, "w") as f:
        f.write(json.dumps(merged) + "\n")
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
