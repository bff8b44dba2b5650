"""One-command TPU good-weather capture (run the moment the relay is up).

The axon relay has multi-hour outages (VERDICT r2 #1); when it recovers,
the window may be short.  This runbook captures every TPU-dependent
artifact back-to-back, most valuable first, each step in its own
subprocess under a hard timeout (the chip is exclusive — steps run
sequentially, never in parallel):

  1. probe          — jax.devices() on the axon platform (90 s budget)
  2. device parity  — scripts/device_parity.py -> DEVICE_PARITY.json
  3. official bench — bench.py (own supervisor/fallback) -> TPU_BENCH.json
  4. 500k pipeline  — `run` CLI on /tmp/sim500k (if present) with the
                      device chain backend -> TPU_500K.json (stage walls)

A failed/timed-out step is logged and the next one still runs; the exit
code is 0 iff probe+parity+bench all succeeded.

    python scripts/tpu_capture.py            # full capture
    TPU_CAPTURE_SKIP_500K=1 python scripts/tpu_capture.py
"""

import json
import os
import re
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def say(msg):
    print(f"[tpu-capture {time.strftime('%H:%M:%S')}] {msg}",
          file=sys.stderr, flush=True)


def _axon_env():
    """Child env with the axon sitecustomize active and no CPU pin."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = "/root/.axon_site"
    return env


def run_step(name, cmd, timeout_s, env=None):
    """Returns (stdout, stderr) on success, None on failure/timeout."""
    say(f"{name}: {' '.join(cmd)} (budget {timeout_s}s)")
    t0 = time.perf_counter()
    try:
        p = subprocess.run(cmd, cwd=_REPO, env=env or _axon_env(),
                           capture_output=True, text=True,
                           timeout=timeout_s)
    except subprocess.TimeoutExpired:
        say(f"{name}: TIMEOUT after {timeout_s}s")
        return None
    dt = time.perf_counter() - t0
    if p.returncode != 0:
        say(f"{name}: rc={p.returncode} in {dt:.0f}s; stderr tail:")
        for line in p.stderr.splitlines()[-8:]:
            say(f"  {line}")
        return None
    say(f"{name}: ok in {dt:.0f}s")
    return p.stdout, p.stderr


def main():
    results = {"probe": False, "parity": False, "bench": False,
               "pipeline_500k": None}

    res = run_step("probe", [sys.executable, "-u", "-c",
                             "import jax; d=jax.devices(); "
                             "print(d[0].platform, len(d))"], 90)
    if res is None or not res[0].strip():
        say("relay still down — nothing captured")
        print(json.dumps(results))
        return 1
    say(f"probe: platform={res[0].strip()}")
    results["probe"] = True

    res = run_step("parity", [sys.executable, "scripts/device_parity.py"],
                   580)
    if res:
        try:
            doc = json.loads(res[0].splitlines()[-1])
            results["parity"] = bool(doc.get("all_parity"))
            say(f"parity: all_parity={results['parity']} "
                f"platform={doc.get('platform')}")
        except Exception as e:
            say(f"parity: unparseable stdout ({e})")

    if os.environ.get("TPU_CAPTURE_PARITY_ONLY"):
        # quick-window mode (e.g. another CPU-heavy job owns the host and
        # would depress the bench's host-bound phases): parity is device-
        # bound and still worth grabbing; bench + 500k run in a later
        # full capture
        print(json.dumps(results))
        return 0 if (results["probe"] and results["parity"]) else 1

    res = run_step("bench", [sys.executable, "bench.py"], 1500)
    if res:
        try:
            doc = json.loads(res[0].splitlines()[-1])
            plat = doc.get("detail", {}).get("platform")
            results["bench"] = plat not in (None, "cpu")
            with open(os.path.join(_REPO, "TPU_BENCH.json"), "w") as f:
                f.write(res[0].splitlines()[-1] + "\n")
            say(f"bench: value={doc.get('value')} platform={plat} "
                f"-> TPU_BENCH.json")
        except Exception as e:
            say(f"bench: unparseable stdout ({e})")

    sim = "/tmp/sim500k"
    if not os.environ.get("TPU_CAPTURE_SKIP_500K") and \
            os.path.isdir(sim) and results["probe"]:
        outdir = f"/tmp/run500k_tpu_capture_{int(time.time())}"
        cmd = [sys.executable, "-m", "lr2rmats_tpu", "run",
               "--genome", f"{sim}/genome.fa",
               "--gtf", f"{sim}/anno.gtf",
               "--long-read", f"{sim}/long.fa",
               "--short-read-1", f"{sim}/short_1.fa",
               "--short-read-2", f"{sim}/short_2.fa",
               "--out-dir", outdir]
        t0 = time.perf_counter()
        res = run_step("500k", cmd, 2400)
        if res is not None:
            wall = time.perf_counter() - t0
            text = res[1]
            stages = {}
            for m in re.finditer(
                    r"\[stage/([\w\[\]]+)\] done in ([0-9.]+)s wall",
                    text):
                stages[m.group(1)] = float(m.group(2))
            phases = None
            m = re.search(r"\[align\] \w+: phases (.+)", text)
            if m:
                phases = m.group(1).strip()
            results["pipeline_500k"] = {
                "wall_s": round(wall, 1), "stages": stages,
                "align_phases": phases, "out_dir": outdir}
            with open(os.path.join(_REPO, "TPU_500K.json"), "w") as f:
                json.dump({"metric": "pipeline_500k_tpu",
                           "platform": "axon",
                           **results["pipeline_500k"]}, f, indent=2)
                f.write("\n")
            say(f"500k: wall={wall:.0f}s -> TPU_500K.json")

    print(json.dumps(results))
    ok = results["probe"] and results["parity"] and results["bench"]
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
