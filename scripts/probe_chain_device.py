"""On-chip breakdown of one production chain call + Pallas lane-block sweep.

Decomposes the fused chain call's ~130 ms/batch wall into:
  floor    — empty roundtrip (tiny jit + device_get)
  h2d      — device_put of the packed production buffer
  d2h      — device_get of a result-sized array
  chain    — the production fused DP+backtrack on a resident buffer
  pallas   — chain DP via the Pallas kernel at several lane blocks
             (DP-only; the scan twin 'scan_dp' is measured for like-for-like)

Feeds docs/PALLAS_CHAIN.md and the VERDICT r3 item-4 adjudication.
Run ONE at a time (exclusive chip), under timeout.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ms(fn, n=5):
    fn()  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return round(min(ts), 2), round(float(np.median(ts)), 2)


def main():
    import jax
    import jax.numpy as jnp
    from lr2rmats_tpu.align.chain import ChainParams
    from lr2rmats_tpu.ops import chain_jax as cj
    from lr2rmats_tpu.ops.chain_pallas import chain_anchors_batch_pallas

    plat = jax.devices()[0].platform
    out = {"platform": plat}

    # production 128-bucket chunk shape
    A, B = 128, 1664
    W = 64
    p = ChainParams()
    rng = np.random.default_rng(3)
    n_anchor = rng.integers(65, A + 1, B).astype(np.int32)
    qpos = np.sort(rng.integers(0, 30000, (B, A)), axis=1).astype(np.int32)
    rpos = np.sort(rng.integers(0, 200000, (B, A)), axis=1).astype(np.int32)
    buf = cj.pack_chain_buf(qpos, rpos, n_anchor)
    out["buf_mb"] = round(buf.nbytes / 1e6, 3)

    tiny = jax.jit(lambda x: x + 1)
    one = np.zeros(8, np.int32)
    out["floor_ms"] = ms(lambda: jax.device_get(tiny(one)))

    out["h2d_ms"] = ms(lambda: jax.device_put(buf).block_until_ready())
    res_size = (-(-A // 16)) * B + 2 * B
    dres = jax.device_put(np.zeros(res_size, np.uint32))
    big = jax.jit(lambda x: x + np.uint32(1))
    _ = big(dres)
    out["d2h_ms"] = ms(lambda: jax.device_get(big(dres)))
    out["result_mb"] = round(res_size * 4 / 1e6, 3)

    # full production call (H2D + compute + D2H)
    def full_call():
        jax.device_get(cj.dispatch_single_packed(buf, p, 40.0))
    out["chain_call_ms"] = ms(full_call)

    # compute-only: resident input, fetch 8 bytes
    dbuf = jax.device_put(buf)

    def compute_only():
        r = cj.dispatch_single_packed(dbuf, p, 40.0)
        jax.device_get(r[:2])
    out["chain_resident_ms"] = ms(compute_only)

    # scan DP-only twin (like-for-like with the pallas kernel)
    t_scan = None
    if hasattr(cj, "chain_anchors_batch"):
        def scan_dp():
            f, par = cj.chain_anchors_batch(qpos, rpos, n_anchor, p)
            np.asarray(f)
        out["scan_dp_ms"] = ms(scan_dp, n=3)

    for lb in (128, 256, 416, 832, 1664):
        if B % lb:
            continue
        try:
            def pall():
                f, par = chain_anchors_batch_pallas(qpos, rpos, n_anchor, p,
                                                    lane_block=lb)
            out[f"pallas_lb{lb}_ms"] = ms(pall, n=3)
        except Exception as e:  # compile failure: record, keep sweeping
            out[f"pallas_lb{lb}_ms"] = f"error: {str(e)[:120]}"

    print(json.dumps(out))


if __name__ == "__main__":
    main()
