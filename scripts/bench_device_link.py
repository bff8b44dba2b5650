"""Device-link microbench: per-call overhead vs transfer volume vs compute.

Times (a) a null roundtrip (8-byte in/out kernel), (b) pure H2D+D2H echo
at several sizes, (c) the fused chain+backtrack kernel at each production
(bucket, chunk) shape — separating dispatch from the blocking device_get.
This is the measurement behind the transfer-shaping decisions in
ops/chain_jax.py / align/batch.py (CHAIN_CHUNK).

    python scripts/bench_device_link.py [reps]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, reps):
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best.append(time.perf_counter() - t0)
    return min(best), sum(best) / len(best)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    import jax
    import jax.numpy as jnp
    dev = jax.devices()[0]
    out = {"platform": dev.platform, "device": str(dev)}

    # (a) null roundtrip
    @jax.jit
    def null(x):
        return x + 1

    x = jnp.zeros(2, jnp.int32)
    jax.device_get(null(x))
    mn, av = timed(lambda: jax.device_get(null(x)), reps * 2)
    out["null_roundtrip_ms"] = {"min": round(mn * 1e3, 2),
                                "avg": round(av * 1e3, 2)}

    # (b) echo at sizes: H2D + D2H of N int32
    @jax.jit
    def echo(x):
        return x * 1

    for mb in (0.25, 1.0, 4.0):
        n = int(mb * 1e6 / 4)
        h = np.zeros(n, np.int32)
        jax.device_get(echo(jnp.asarray(h)))

        def run():
            jax.device_get(echo(jnp.asarray(h)))

        mn, av = timed(run, reps)
        out[f"echo_{mb}MB_ms"] = {"min": round(mn * 1e3, 1),
                                  "avg": round(av * 1e3, 1),
                                  "min_MBps": round(2 * mb / mn, 1)}

    # (c) production chain shapes: dispatch vs blocking get
    from lr2rmats_tpu.align.batch import CHAIN_CHUNK
    from lr2rmats_tpu.align.chain import ChainParams
    from lr2rmats_tpu.ops.chain_jax import chain_backtrack_batch_async
    p = ChainParams()
    rng = np.random.default_rng(0)
    for A, B in sorted(CHAIN_CHUNK.items()):
        qp = np.sort(rng.integers(0, 3000, (B, A)).astype(np.int32), axis=1)
        gp = np.sort(rng.integers(0, 100_000, (B, A)).astype(np.int32),
                     axis=1)
        nn = np.full(B, A, np.int32)
        jax.device_get(chain_backtrack_batch_async(qp, gp, nn, p, 20.0))

        def run():
            t0 = time.perf_counter()
            d = chain_backtrack_batch_async(qp, gp, nn, p, 20.0)
            t1 = time.perf_counter()
            jax.device_get(d)
            return t1 - t0

        mn, av = timed(run, reps)
        disp = run()
        h2d_mb = (2 * A + 1) * B * 4 / 1e6
        d2h_mb = ((A + 15) // 16 * B + 2 * B) * 4 / 1e6
        out[f"chain_A{A}_B{B}"] = {
            "min_ms": round(mn * 1e3, 1), "avg_ms": round(av * 1e3, 1),
            "dispatch_ms": round(disp * 1e3, 1),
            "h2d_MB": round(h2d_mb, 2), "d2h_MB": round(d2h_mb, 3),
            "anchors_per_s_M": round(A * B / mn / 1e6, 1)}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
