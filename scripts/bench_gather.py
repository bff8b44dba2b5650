"""Microbench of parallel.distributed.gather_blobs: Gloo all-gather cost
vs payload width variability (compile-per-shape suspicion).

    env JAX_PLATFORMS=cpu PYTHONPATH= python scripts/bench_gather.py
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker(pid, nproc):
    from lr2rmats_tpu.parallel.distributed import gather_blobs, init_multihost
    init_multihost("127.0.0.1:29917", nproc, pid)
    rng = np.random.default_rng(pid)
    out = {}

    # warm tiny
    gather_blobs(b"x")

    # fixed width, 40 MB
    blob = rng.integers(0, 255, 40 << 20, dtype=np.uint8).tobytes()
    t0 = time.perf_counter()
    gather_blobs(blob)
    out["fixed_first_s"] = round(time.perf_counter() - t0, 3)
    walls = []
    for _ in range(5):
        t0 = time.perf_counter()
        gather_blobs(blob)
        walls.append(time.perf_counter() - t0)
    out["fixed_repeat_s"] = [round(w, 3) for w in walls]
    out["fixed_mb_s"] = round(40 * 2 / min(walls), 1)   # both directions

    # varying width (fresh shape every call), ~40 MB
    walls = []
    for i in range(5):
        vb = blob[: len(blob) - 8191 * (i + 1)]
        t0 = time.perf_counter()
        gather_blobs(vb)
        walls.append(time.perf_counter() - t0)
    out["vary_s"] = [round(w, 3) for w in walls]

    # small fixed (1 MB)
    small = blob[: 1 << 20]
    walls = []
    for _ in range(5):
        t0 = time.perf_counter()
        gather_blobs(small)
        walls.append(time.perf_counter() - t0)
    out["small_1mb_s"] = [round(w, 4) for w in walls]
    if pid == 0:
        print(json.dumps(out))


if __name__ == "__main__":
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        worker(int(sys.argv[i + 1]), int(sys.argv[i + 2]))
    else:
        me = os.path.abspath(__file__)
        n = 2
        procs = [subprocess.Popen(
            [sys.executable, me, "--worker", str(p), str(n)],
            env={**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH":
                 os.path.dirname(os.path.dirname(me))})
            for p in range(n)]
        for p in procs:
            p.wait()
