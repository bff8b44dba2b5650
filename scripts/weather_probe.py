"""One-shot relay weather probe: prints a single JSON line.

Uses the persistent compile cache so repeat probes pay only the link,
not the remote compile.  Exclusive-chip etiquette: run under timeout,
never concurrently with another TPU job.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    out = {"ts": time.strftime("%H:%M:%S")}
    t0 = time.perf_counter()
    import jax
    import jax.numpy as jnp
    from lr2rmats_tpu.utils.devcache import enable_compile_cache
    enable_compile_cache()
    out["platform"] = jax.devices()[0].platform
    out["init_s"] = round(time.perf_counter() - t0, 1)
    x = jnp.ones((512, 512))
    f = jax.jit(lambda a: a @ a)
    t0 = time.perf_counter()
    jax.device_get(f(x))
    out["first_s"] = round(time.perf_counter() - t0, 1)
    walls = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.device_get(f(x))
        walls.append((time.perf_counter() - t0) * 1e3)
    import numpy as np
    out["call_ms"] = round(float(np.median(walls)), 1)
    big = jnp.asarray(np.zeros((2 << 20,), np.uint8))
    t0 = time.perf_counter()
    jax.device_get(big)
    out["d2h_mb_s"] = round(2.0 / max(time.perf_counter() - t0, 1e-9), 1)
    out["good"] = bool(out["call_ms"] < 120 and out["d2h_mb_s"] > 15)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
