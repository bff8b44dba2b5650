"""Weather-proofing of the official bench (VERDICT r2 #1): the
supervisor must kill a hung child on heartbeat stall, and a CPU fallback
must never masquerade as a per-chip number."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_stall_watchdog_kills_hung_child():
    """A child that heartbeats once and then hangs (a dead relay call)
    must be killed after ~stall_s, not after the hard cap."""
    t0 = time.monotonic()
    line = bench._run_attempt(
        {"BENCH_SELFTEST_HANG": "1", "JAX_PLATFORMS": "cpu",
         "PYTHONPATH": ""},
        stall_s=3.0, cap_s=120.0)
    dt = time.monotonic() - t0
    assert line is None
    assert dt < 30.0          # killed on stall, nowhere near the cap


def test_fallback_json_demotes_headline():
    line = json.dumps({
        "metric": "long_reads_aligned_per_sec_per_chip",
        "value": 1234.5, "unit": "reads/s", "vs_baseline": 6.5,
        "detail": {"platform": "cpu", "n_reads": 6144}})
    obj = bench._fallback_json(line)
    assert obj["value"] == 0.0 and obj["vs_baseline"] == 0.0
    assert obj["detail"]["cpu_fallback_value"] == 1234.5
    assert obj["detail"]["platform"] == "cpu"
    assert "not a per-chip number" in obj["detail"]["note"]
