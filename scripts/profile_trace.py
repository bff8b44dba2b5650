"""Capture a jax.profiler trace of the two production device calls on the
real chip: the fused chain+backtrack dispatch and the polish best-pair DP.

Closes SURVEY §5's tracing row ("jax.profiler traces + per-kernel roofline
counters"): CHAIN_PROBE.json infers the kernel cost by subtraction
(resident-call minus empty-call floor); this script measures the on-device
step breakdown directly from the trace events and writes PROFILER_TRACE.json
next to the raw trace artifact.

Run ONE at a time (exclusive chip), under timeout.
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "jax_trace")


def main():
    import jax
    import jax.numpy as jnp
    from lr2rmats_tpu.align.chain import ChainParams
    from lr2rmats_tpu.ops import chain_jax as cj
    from lr2rmats_tpu.align import polish

    plat = jax.devices()[0].platform
    out = {"platform": plat, "trace_dir": TRACE_DIR}

    # --- production-shaped inputs -------------------------------------
    # chain: the 128-anchor bucket at its production chunk width
    A, B = 128, 1664
    p = ChainParams()
    rng = np.random.default_rng(3)
    n_anchor = rng.integers(65, A + 1, B).astype(np.int32)
    qpos = np.sort(rng.integers(0, 30000, (B, A)), axis=1).astype(np.int32)
    rpos = np.sort(rng.integers(0, 200000, (B, A)), axis=1).astype(np.int32)
    buf = cj.pack_chain_buf(qpos, rpos, n_anchor)
    out["chain_buf_mb"] = round(buf.nbytes / 1e6, 3)

    # polish: forced-placement best-pair DP at representative shape
    M, Bw, G = 192, 8, 256
    q = rng.integers(0, 4, (M, G)).astype(np.int8)
    qr = q[::-1].copy()
    lwin = rng.integers(0, 4, (M + Bw, G)).astype(np.int8)
    rwin = rng.integers(0, 4, (M + Bw, G)).astype(np.int8)
    m_arr = rng.integers(M // 2, M + 1, G).astype(np.int32)
    dl = rng.integers(-Bw, Bw + 1, G).astype(np.int32)
    dr = rng.integers(-Bw, Bw + 1, G).astype(np.int32)

    def chain_call():
        jax.device_get(cj.dispatch_single_packed(buf, p, 40.0))

    def polish_call():
        np.asarray(jax.device_get(polish._polish_best_pair(
            q, qr, lwin, rwin, m_arr, dl, dr)))

    # warm (compile) OUTSIDE the trace
    t0 = time.perf_counter()
    chain_call()
    out["chain_compile_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    polish_call()
    out["polish_compile_s"] = round(time.perf_counter() - t0, 2)

    # timed reference walls (same numbers CHAIN_PROBE reports)
    def ms(fn, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append((time.perf_counter() - t0) * 1e3)
        return round(min(ts), 2), round(float(np.median(ts)), 2)

    out["chain_call_ms_min_med"] = ms(chain_call)
    out["polish_call_ms_min_med"] = ms(polish_call)

    # --- the trace ----------------------------------------------------
    os.makedirs(TRACE_DIR, exist_ok=True)
    N = 5
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(N):
            chain_call()
        for _ in range(N):
            polish_call()
    out["n_calls_each"] = N

    # --- parse the chrome trace --------------------------------------
    paths = sorted(glob.glob(os.path.join(
        TRACE_DIR, "**", "*.trace.json.gz"), recursive=True))
    out["trace_files"] = [os.path.relpath(x, TRACE_DIR) for x in paths]
    if paths:
        with gzip.open(paths[-1], "rt") as f:
            tr = json.load(f)
        events = tr.get("traceEvents", [])
        # pid -> process name from metadata
        pname = {}
        for e in events:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pname[e["pid"]] = e.get("args", {}).get("name", "")
        bykey = defaultdict(lambda: [0, 0.0])
        for e in events:
            if e.get("ph") != "X":
                continue
            proc = pname.get(e.get("pid"), str(e.get("pid")))
            name = e.get("name", "")
            dur_ms = e.get("dur", 0) / 1e3
            k = (proc, name)
            bykey[k][0] += 1
            bykey[k][1] += dur_ms
        # keep the heaviest 60 rows, and everything on a device lane
        rows = sorted(
            ({"process": k[0], "name": k[1][:120], "count": v[0],
              "total_ms": round(v[1], 3)} for k, v in bykey.items()),
            key=lambda r: -r["total_ms"])
        devrows = [r for r in rows if "TPU" in r["process"]
                   or "device" in r["process"].lower()
                   or "/device" in r["process"]]
        out["device_event_rows"] = devrows[:40]
        out["top_rows"] = rows[:40]
        out["n_trace_events"] = len(events)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
