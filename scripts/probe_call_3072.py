"""Per-call cost of the production fused chain call at the auto-batch-3072
chunk shapes ({64: 640, 128: 3328}), on whatever platform jax gives.

Also measures how much host CPU the call steals: a numpy busy-thread runs
during the timed loop and reports its achieved op rate vs an uncontended
baseline — on the relay, a low steal fraction means the device wait
overlaps host work (GIL released); a high one means the call burns host
CPU (serialization) that the CPU arm would not pay.

Run under timeout; exclusive chip when platform=axon.
"""

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    from lr2rmats_tpu.align.chain import ChainParams
    from lr2rmats_tpu.ops import chain_jax as cj
    from lr2rmats_tpu.utils.devcache import enable_compile_cache

    enable_compile_cache()
    plat = jax.devices()[0].platform
    out = {"platform": plat}
    p = ChainParams()
    rng = np.random.default_rng(3)

    bufs = []
    datasets = []
    total_mb = 0.0
    for A, B in ((64, 640), (128, 3328)):
        n_anchor = rng.integers(A // 2, A + 1, B).astype(np.int32)
        qpos = np.sort(rng.integers(0, 30000, (B, A)), axis=1).astype(np.int32)
        rpos = np.sort(rng.integers(0, 200000, (B, A)), axis=1).astype(np.int32)
        datasets.append((qpos, rpos, n_anchor, A, B))
        buf = cj.pack_chain_buf(qpos, rpos, n_anchor)
        total_mb += buf.nbytes / 1e6
        bufs.append(buf)
    out["h2d_mb"] = round(total_mb, 3)

    def call():
        jax.device_get(cj.dispatch_multi_packed(bufs, p, 40.0))

    t0 = time.perf_counter()
    call()
    out["first_call_s"] = round(time.perf_counter() - t0, 2)

    # uncontended busy-thread baseline
    def busy(stop, counter):
        a = np.zeros(200000, np.int64)
        while not stop.is_set():
            a += 1
            counter[0] += 1

    stop = threading.Event()
    cnt = [0]
    th = threading.Thread(target=busy, args=(stop, cnt))
    th.start()
    time.sleep(2.0)
    stop.set()
    th.join()
    base_rate = cnt[0] / 2.0
    out["busy_rate_uncontended"] = round(base_rate)

    # timed calls with busy thread running
    stop = threading.Event()
    cnt = [0]
    th = threading.Thread(target=busy, args=(stop, cnt))
    th.start()
    walls = []
    t_all0 = time.perf_counter()
    for _ in range(10):
        t0 = time.perf_counter()
        call()
        walls.append((time.perf_counter() - t0) * 1e3)
    t_all = time.perf_counter() - t_all0
    stop.set()
    th.join()
    rate = cnt[0] / t_all
    out["call_ms"] = {"min": round(min(walls), 1),
                      "med": round(float(np.median(walls)), 1),
                      "max": round(max(walls), 1)}
    out["busy_rate_during_calls"] = round(rate)
    out["host_cpu_steal_frac"] = round(1.0 - rate / base_rate, 3)

    # the bit-equal host twin on the SAME anchor matrices: the marginal
    # value of the device call is call_ms + steal vs this wall
    from lr2rmats_tpu.native import get_lib
    lib = get_lib()
    if lib is not None:
        pc = p
        hw = []
        for _ in range(5):
            t0 = time.perf_counter()
            for qp, gp, nn, A, B in datasets:
                mask = np.zeros((B, A), np.uint8)
                ps = np.zeros(B, np.float32)
                ss = np.zeros(B, np.float32)
                lib.chain_small_batch_c(
                    qp, gp, nn, B, A, pc.k, pc.window, pc.max_intron,
                    pc.max_qgap, pc.gap_open, pc.gap_scale, pc.intron_scale,
                    pc.min_intron_gap, 40.0, mask.reshape(-1), ps, ss)
            hw.append((time.perf_counter() - t0) * 1e3)
        out["host_twin_ms"] = {"min": round(min(hw), 1),
                               "med": round(float(np.median(hw)), 1)}
        # net device win per batch (negative = device loses), counting the
        # CPU the call steals from other lanes as a cost
        dev_cost = (float(np.median(walls)) *
                    (1.0 + out["host_cpu_steal_frac"]))
        out["device_net_win_ms_per_batch"] = round(
            float(np.median(hw)) - dev_cost, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
