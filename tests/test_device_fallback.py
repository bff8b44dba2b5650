"""Mid-run device/relay failure recovery (align/batch.py _device_fallback,
polish.py _constrained_place_many): a device call dying mid-run must NOT
kill the pipeline — the remainder rides the bit-equal host paths and the
output stays byte-identical.  (Motivated by a real capture: a 500k TPU
run died mid-align with a relay FailedPrecondition, 2026-08-19.)"""

import numpy as np

from lr2rmats_tpu.align.batch import BatchAligner
from lr2rmats_tpu.index.minimizer import MinimizerIndex
from lr2rmats_tpu.io.fasta import Genome, SeqSet


def _workload(seed=3, mb=2.0, n_reads=150, profile=None):
    import bench
    rng = np.random.default_rng(seed)
    n = int(mb * 1e6)
    codes = rng.integers(0, 4, n).astype(np.uint8)
    genome = Genome(["c1"], codes, np.array([0, n], np.int64))
    reads, _ = bench.simulate_reads(genome, n_reads, rng, profile=profile)
    offs = np.zeros(len(reads) + 1, np.int64)
    np.cumsum([len(r) for r in reads], out=offs[1:])
    ss = SeqSet([f"r{i}" for i in range(len(reads))],
                np.concatenate(reads), offs)
    return genome, ss


def _run(genome, ss, backend):
    idx = MinimizerIndex.build(genome)
    al = BatchAligner(genome, index=idx, backend=backend)
    try:
        rb = al.align_seqset_packed(ss, batch_size=32)
        return rb.emit_sam(al.refs), al
    finally:
        al.close()


def test_chain_dispatch_failure_recovers(monkeypatch):
    """dispatch_multi_packed dying on the 3rd batch: run completes on the
    host path, SAM byte-identical, device_failed set."""
    genome, ss = _workload()
    sam_host, _ = _run(genome, ss, "host")

    import lr2rmats_tpu.ops.chain_jax as cj
    real = cj.dispatch_multi_packed
    calls = {"n": 0}

    def dying(*a, **kw):
        calls["n"] += 1
        if calls["n"] >= 3:
            raise RuntimeError("FAILED_PRECONDITION: TPU backend error")
        return real(*a, **kw)

    monkeypatch.setattr(cj, "dispatch_multi_packed", dying)
    sam_dev, al = _run(genome, ss, "jax")
    assert al.device_failed
    assert calls["n"] >= 3          # device really was in use first
    assert sam_dev == sam_host


def test_chain_fetch_failure_recovers(monkeypatch):
    """A pending device result that explodes at materialize time falls
    back to host chaining for that batch and the rest of the run."""
    genome, ss = _workload(seed=5)
    sam_host, _ = _run(genome, ss, "host")

    import lr2rmats_tpu.ops.chain_jax as cj
    real = cj.dispatch_multi_packed

    class Grenade:
        """Detonates when the fetch side first touches it."""
        def __getattr__(self, name):
            raise RuntimeError("relay died mid-fetch")
        def __iter__(self):
            raise RuntimeError("relay died mid-fetch")
        def __getitem__(self, i):
            raise RuntimeError("relay died mid-fetch")

    calls = {"n": 0}

    def arming(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            return Grenade()
        return real(*a, **kw)

    monkeypatch.setattr(cj, "dispatch_multi_packed", arming)
    sam_dev, al = _run(genome, ss, "jax")
    assert al.device_failed
    assert sam_dev == sam_host


def test_polish_dp_failure_recovers(monkeypatch):
    """_polish_best_pair dying routes that polish batch through the
    scalar host DP — results identical (it is bit-equal by design).
    The ONT error profile guarantees near-miss junctions so the batched
    device DP actually runs (vacuous otherwise)."""
    genome, ss = _workload(seed=7, n_reads=400, profile="ont")
    sam_host, _ = _run(genome, ss, "host")
    # this test targets the POLISH failure path: keep the weather router
    # out (under suite load a CPU-jit compile stall can trip it, and a
    # flipped run legitimately rides the host DP without ever reaching
    # _polish_best_pair)
    monkeypatch.setenv("LR2RMATS_NO_WEATHER_ROUTE", "1")

    import lr2rmats_tpu.align.polish as pol

    def dying(*a, **kw):
        raise RuntimeError("FAILED_PRECONDITION")

    monkeypatch.setattr(pol, "_polish_best_pair", dying)
    try:
        sam_dev, al = _run(genome, ss, "jax")
        # the module-level flag pins later polish batches to the host DP
        # (no fresh relay timeout per sample once the link is known-dead)
        assert pol.device_stats.get("failed") is True
    finally:
        pol.device_stats["failed"] = False   # don't poison other tests
    assert sam_dev == sam_host


def test_pallas_chain_failure_recovers(monkeypatch):
    """The pallas backend gets the same recovery — its host chain twin is
    bit-equal too."""
    genome, ss = _workload(seed=11)
    sam_host, _ = _run(genome, ss, "host")

    import lr2rmats_tpu.ops.chain_pallas as cp

    def dying(*a, **kw):
        raise RuntimeError("MosaicError: HTTP 500")

    monkeypatch.setattr(cp, "chain_anchors_batch_pallas", dying)
    sam_pal, al = _run(genome, ss, "pallas")
    assert al.device_failed
    assert sam_pal == sam_host


def test_seed_twin_failure_recovers(monkeypatch):
    """A dying device seed twin drops back to the host lookup."""
    genome, ss = _workload(seed=9)
    monkeypatch.setenv("LR2RMATS_DEVICE_SEED", "1")
    sam_ok, _ = _run(genome, ss, "host")

    from lr2rmats_tpu.index.seed_device import DeviceSeedLookup

    def dying(self, q, n_threads=0):
        raise RuntimeError("relay down")

    monkeypatch.setattr(DeviceSeedLookup, "lookup", dying)
    sam_rec, al = _run(genome, ss, "host")
    assert al.device_failed and al._seed_lookup is None
    monkeypatch.delenv("LR2RMATS_DEVICE_SEED")
    sam_plain, _ = _run(genome, ss, "host")
    assert sam_rec == sam_plain == sam_ok


# ---------------------------------------------------------------- weather
# Slowness-adaptive routing (_WeatherRouter): a degraded-but-alive relay
# raises nothing, so the failure fallback can't catch it (measured
# collapse: ~3.6 s/call vs the 36 ms floor, TPU_500K.json
# second_pair_weather_collapse).  The router must flip the run to the
# bit-equal host path on measured slowness and recover via probes.

def _tame_router(monkeypatch, probe_every=16):
    from lr2rmats_tpu.align.batch import _WeatherRouter
    monkeypatch.setattr(_WeatherRouter, "GRACE", 0)
    # recovery bar 0.25 s: healthy CPU-jit probe calls run ~5-20 ms but a
    # loaded test host (suite + background jobs) can stall any small call
    monkeypatch.setattr(_WeatherRouter, "MIN_WALL_S", 0.25)
    monkeypatch.setattr(_WeatherRouter, "ABS_SLOW_S", 0.3)
    monkeypatch.setattr(_WeatherRouter, "PROBE_EVERY", probe_every)


def test_weather_slowness_routes_to_host(monkeypatch):
    """A throttled (but never failing) device: the router flips the rest
    of the run to the host chain path, output stays byte-identical, and
    the device stops being called (modulo in-flight batches)."""
    import time as _t
    genome, ss = _workload(seed=13)
    sam_host, _ = _run(genome, ss, "host")

    _tame_router(monkeypatch)
    import lr2rmats_tpu.ops.chain_jax as cj
    real = cj.dispatch_multi_packed
    calls = {"n": 0}

    def throttled(*a, **kw):
        calls["n"] += 1
        _t.sleep(0.6)            # degraded relay: slow, never raises
        return real(*a, **kw)

    monkeypatch.setattr(cj, "dispatch_multi_packed", throttled)
    sam_dev, al = _run(genome, ss, "jax")
    assert al.weather.slow                  # router flipped
    assert not al.device_failed             # ...without a failure event
    assert al.weather.flips == 1
    # 5 batches total; flip lands after CONSEC=2 measured batches with
    # pipeline_depth=2 in flight, so at most 4 dispatches reached the
    # throttled device
    assert 2 <= calls["n"] <= 4
    assert sam_dev == sam_host


def test_weather_recovery_probe(monkeypatch):
    """Transient slowdown: the router flips to host, then a probe batch
    finds the device healthy again and flips back.  Output identical."""
    import time as _t
    genome, ss = _workload(seed=17, n_reads=400)
    sam_host, _ = _run(genome, ss, "host")

    _tame_router(monkeypatch, probe_every=2)
    import lr2rmats_tpu.ops.chain_jax as cj
    real = cj.dispatch_multi_packed
    calls = {"n": 0}

    def transient(*a, **kw):
        calls["n"] += 1
        if calls["n"] <= 2:                 # only the first two batches
            _t.sleep(0.6)
        return real(*a, **kw)

    monkeypatch.setattr(cj, "dispatch_multi_packed", transient)
    sam_dev, al = _run(genome, ss, "jax")
    assert al.weather.flips >= 2            # slow, then recovered
    assert not al.weather.slow              # ended healthy
    assert not al.device_failed
    assert calls["n"] > 4                   # device traffic resumed
    assert sam_dev == sam_host


def test_weather_router_disabled_by_env(monkeypatch):
    """LR2RMATS_NO_WEATHER_ROUTE=1 keeps every batch on the device no
    matter how slow it is."""
    import time as _t
    genome, ss = _workload(seed=13)
    monkeypatch.setenv("LR2RMATS_NO_WEATHER_ROUTE", "1")
    _tame_router(monkeypatch)
    import lr2rmats_tpu.ops.chain_jax as cj
    real = cj.dispatch_multi_packed
    calls = {"n": 0}

    def throttled(*a, **kw):
        calls["n"] += 1
        _t.sleep(0.6)
        return real(*a, **kw)

    monkeypatch.setattr(cj, "dispatch_multi_packed", throttled)
    _, al = _run(genome, ss, "jax")
    assert not al.weather.enabled
    assert not al.weather.slow
    assert calls["n"] == 5                  # every batch went to device


def test_weather_default_constants_catch_measured_collapse(monkeypatch):
    """Regression for pair r5p1 (TPU_500K.json pairs_r5[0]): the relay
    degraded to ~1.66 s/batch — under the old 2.0 s absolute threshold —
    and the router never flipped, bleeding 272 s.  With the DEFAULT
    constants (ABS_SLOW_S 0.6, slack-aware flip) a 0.8 s/batch device
    against millisecond seed slack must flip, and output must stay
    byte-identical."""
    import time as _t
    genome, ss = _workload(seed=13)
    sam_host, _ = _run(genome, ss, "host")

    import lr2rmats_tpu.ops.chain_jax as cj
    real = cj.dispatch_multi_packed
    calls = {"n": 0}

    def degraded(*a, **kw):
        calls["n"] += 1
        _t.sleep(0.8)            # r5p1-style: slow, alive, < old 2 s bar
        return real(*a, **kw)

    monkeypatch.setattr(cj, "dispatch_multi_packed", degraded)
    sam_dev, al = _run(genome, ss, "jax")
    assert al.weather.slow
    assert not al.device_failed
    # GRACE=2 + CONSEC=2 with depth-2 pipelining: flip by the 5th dispatch
    assert calls["n"] <= 5
    assert sam_dev == sam_host


def test_init_probe_detects_hang_and_failure(monkeypatch):
    """_device_init_ok: a hung or dying backend-init subprocess demotes
    the run to the host backend (observed: jax.devices() blocking 20+
    minutes during a relay outage, 2026-08-20)."""
    from lr2rmats_tpu.pipeline.stages import _device_init_ok
    monkeypatch.delenv("LR2RMATS_NO_INIT_PROBE", raising=False)
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    # generous success-path budgets: under full-host load (e.g. the 5M
    # dryrun aligning on every core) interpreter start alone can take
    # seconds
    assert _device_init_ok(timeout_s=60.0, probe_code="pass")
    assert not _device_init_ok(timeout_s=1.0,
                               probe_code="import time; time.sleep(90)")
    assert not _device_init_ok(timeout_s=60.0,
                               probe_code="raise SystemExit(3)")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert _device_init_ok(timeout_s=0.001,
                           probe_code="import time; time.sleep(30)")


def test_async_init_probe_overlap(monkeypatch):
    """start_init_probe launches without blocking; _device_init_ok joins
    the SAME subprocess (no second spawn) and clears the handle."""
    import time
    from lr2rmats_tpu.pipeline import stages

    monkeypatch.delenv("LR2RMATS_NO_INIT_PROBE", raising=False)
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    stages._INIT_PROBE.clear()

    # fake a pre-started probe that succeeds instantly
    import subprocess
    import sys
    stages._INIT_PROBE["t0"] = time.monotonic()
    stages._INIT_PROBE["p"] = subprocess.Popen([sys.executable, "-c", "pass"])
    assert stages._device_init_ok(timeout_s=60.0)
    assert "p" not in stages._INIT_PROBE

    # a pre-started probe that hangs: joined under the remaining budget
    stages._INIT_PROBE["t0"] = time.monotonic() - 100.0   # budget consumed
    stages._INIT_PROBE["p"] = subprocess.Popen(
        [sys.executable, "-c", "import time; time.sleep(60)"])
    t0 = time.monotonic()
    assert not stages._device_init_ok(timeout_s=5.0)
    assert time.monotonic() - t0 < 30.0     # floor wait, not a full spawn
    assert "p" not in stages._INIT_PROBE

    # cpu short-circuit never touches a pre-started handle
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert stages._device_init_ok(timeout_s=0.001)


def test_weather_spiky_stalls_flip_via_leaky_bucket(monkeypatch):
    """SPIKY degradation — huge single stalls with healthy batches
    between (pair w1518: 122 s over 164 calls, zero CONSEC flips) —
    must flip via the cumulative-excess bucket."""
    import time as _t
    genome, ss = _workload(seed=13, n_reads=300)
    sam_host, _ = _run(genome, ss, "host")

    from lr2rmats_tpu.align.batch import _WeatherRouter
    monkeypatch.setattr(_WeatherRouter, "GRACE", 0)
    monkeypatch.setattr(_WeatherRouter, "EXCESS_FLIP_S", 0.6)
    import lr2rmats_tpu.ops.chain_jax as cj
    real = cj.dispatch_multi_packed
    calls = {"n": 0}

    def spiky(*a, **kw):
        calls["n"] += 1
        if calls["n"] % 3 == 0:      # every 3rd batch stalls hard
            _t.sleep(0.8)
        return real(*a, **kw)

    monkeypatch.setattr(cj, "dispatch_multi_packed", spiky)
    sam_dev, al = _run(genome, ss, "jax")
    w = al.weather
    assert al.weather.slow or al.weather.flips >= 1, (
        f"calls={calls['n']} wall_n={w.wall_n} over={w.wall_over_n} "
        f"max={w.wall_max:.2f} excess={w._excess:.2f}")
    assert not al.device_failed
    assert sam_dev == sam_host


def test_preflipped_router_starts_host_and_recovers(monkeypatch):
    """A pre-flight link probe measuring a degraded relay pre-flips the
    router (pair r5s_1837: d2h 9.1 MB/s at probe time, TPU arm lost by
    115 s): the run starts on the bit-equal host chain path, the
    periodic probe finds the device healthy and flips back, and the
    output stays byte-identical."""
    genome, ss = _workload(seed=19, n_reads=300)
    sam_host, _ = _run(genome, ss, "host")

    _tame_router(monkeypatch, probe_every=2)
    import lr2rmats_tpu.ops.chain_jax as cj
    real = cj.dispatch_multi_packed
    calls = {"n": 0}

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(cj, "dispatch_multi_packed", counting)

    idx = MinimizerIndex.build(genome)
    al = BatchAligner(genome, index=idx, backend="jax")
    try:
        al.weather.preflip()
        assert al.weather.slow and al.weather.preflipped
        rb = al.align_seqset_packed(ss, batch_size=32)
        sam_dev = rb.emit_sam(al.refs)
    finally:
        al.close()
    assert not al.weather.slow          # healthy probe flipped it back
    assert al.weather.flips >= 1
    assert calls["n"] >= 1              # device traffic resumed
    assert sam_dev == sam_host


def test_preflip_noop_when_router_disabled():
    from lr2rmats_tpu.align.batch import _WeatherRouter
    w = _WeatherRouter(enabled=False)
    w.preflip()
    assert not w.slow and not w.preflipped
    assert w.route_device()


def test_init_probe_returns_link_measurements(monkeypatch):
    """_device_init_ok parses the probe's JSON line into the returned
    dict; a probe that prints nothing still counts as alive."""
    from lr2rmats_tpu.pipeline import stages
    monkeypatch.delenv("LR2RMATS_NO_INIT_PROBE", raising=False)
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    link = stages._device_init_ok(
        timeout_s=60.0,
        probe_code="print('noise'); "
                   "print('{\"call_ms\": 321.0, \"d2h_mb_s\": 7.5}')")
    assert link and link["call_ms"] == 321.0 and link["d2h_mb_s"] == 7.5
    link = stages._device_init_ok(timeout_s=60.0, probe_code="pass")
    assert link == {"ok": True}


def test_link_degraded_bars(monkeypatch):
    """Preflip decision: default bars (call 250 ms, d2h 12 MB/s), env
    overrides, and the no-measurement cases."""
    from lr2rmats_tpu.pipeline.stages import _link_degraded
    monkeypatch.delenv("LR2RMATS_PREFLIP_CALL_MS", raising=False)
    monkeypatch.delenv("LR2RMATS_PREFLIP_D2H_MB_S", raising=False)
    assert _link_degraded(None) is None
    assert _link_degraded({"ok": True}) is None           # init-only probe
    assert _link_degraded({"call_ms": 80.0, "d2h_mb_s": 35.0}) is None
    # the measured r5s_1837 window: call fine, d2h collapsed
    r = _link_degraded({"call_ms": 71.7, "d2h_mb_s": 9.1})
    assert r and "d2h" in r
    r = _link_degraded({"call_ms": 900.0, "d2h_mb_s": 40.0})
    assert r and "call" in r
    monkeypatch.setenv("LR2RMATS_PREFLIP_D2H_MB_S", "5")
    assert _link_degraded({"call_ms": 71.7, "d2h_mb_s": 9.1}) is None
