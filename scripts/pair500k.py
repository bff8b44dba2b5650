"""Back-to-back 500k pipeline pair: TPU arm vs CPU arm on /tmp/sim500k.

The only measurement discipline that means anything on this rig
(CLAUDE.md: same-code walls swing +-50% run-to-run): both arms run
back-to-back on a quiet host, outputs are byte-compared, and the pair is
appended to TPU_500K.json under "pairs_r5".

    python scripts/pair500k.py --order tpu-first [--tag NAME]
    python scripts/pair500k.py --order cpu-first
"""

import argparse
import hashlib
import json
import os
import re
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SIM = "/tmp/sim500k"
CMP_EXT = (".sam", ".bed", ".gtf", ".tab", ".txt")


def say(msg):
    print(f"[pair500k {time.strftime('%H:%M:%S')}] {msg}",
          file=sys.stderr, flush=True)


def run_arm(arm: str, outdir: str, budget_s: int):
    env = dict(os.environ)
    if arm == "tpu":
        env.pop("JAX_PLATFORMS", None)
        env["PYTHONPATH"] = "/root/.axon_site"
    else:
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = ""
    cmd = [sys.executable, "-m", "lr2rmats_tpu", "run",
           "--genome", f"{SIM}/genome.fa", "--gtf", f"{SIM}/anno.gtf",
           "--long-read", f"{SIM}/long.fa",
           "--short-read-1", f"{SIM}/short_1.fa",
           "--short-read-2", f"{SIM}/short_2.fa",
           "--out-dir", outdir]
    say(f"{arm} arm -> {outdir}")
    t0 = time.perf_counter()
    try:
        p = subprocess.run(cmd, cwd=_REPO, env=env, capture_output=True,
                           text=True, timeout=budget_s)
    except subprocess.TimeoutExpired:
        say(f"{arm} arm HUNG past the {budget_s}s budget (the observed "
            "relay-outage init-hang mode) — aborting this arm")
        return None
    wall = time.perf_counter() - t0
    if p.returncode != 0:
        say(f"{arm} arm FAILED rc={p.returncode}; stderr tail:")
        for line in p.stderr.splitlines()[-10:]:
            say("  " + line)
        return None
    stages = {m.group(1): float(m.group(2)) for m in re.finditer(
        r"\[stage/([\w\[\]]+)\] done in ([0-9.]+)s wall", p.stderr)}
    phases = None
    m = None
    for m in re.finditer(r"\[align\] \w+: phases (.+)", p.stderr):
        pass
    if m:
        phases = m.group(1).strip()
    weather = len(re.findall(r"weather router: device SLOW", p.stderr))
    say(f"{arm} arm done: {wall:.1f}s")
    return {"wall_s": round(wall, 1), "stages": stages,
            "align_phases": phases, "weather_slow_flips": weather}


def output_digests(outdir: str):
    out = {}
    for root, _dirs, files in os.walk(outdir):
        rel_root = os.path.relpath(root, outdir)
        if rel_root.startswith(("benchmark", "logs")):
            continue
        for f in files:
            if not f.endswith(CMP_EXT):
                continue
            pth = os.path.join(root, f)
            h = hashlib.sha256()
            with open(pth, "rb") as fp:
                for chunk in iter(lambda: fp.read(1 << 22), b""):
                    h.update(chunk)
            out[os.path.join(rel_root, f)] = h.hexdigest()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--order", choices=["tpu-first", "cpu-first"],
                    default="tpu-first")
    ap.add_argument("--tag", default=time.strftime("%m%d_%H%M"))
    ap.add_argument("--budget", type=int, default=2400)
    args = ap.parse_args()

    arms = (["tpu", "cpu"] if args.order == "tpu-first" else ["cpu", "tpu"])
    res = {}
    digs = {}
    dirs = []
    for arm in arms:
        outdir = f"/tmp/pair500k_{args.tag}_{arm}"
        dirs.append(outdir)
        r = run_arm(arm, outdir, args.budget)
        if r is None:
            say("pair aborted")
            sys.exit(1)
        res[arm] = r
        digs[arm] = output_digests(outdir)
    # disk hygiene: each arm's outputs are ~1.5 GB and the digests above
    # are the recorded evidence — a day of pairs filled /tmp once
    import shutil
    for dd in dirs:
        shutil.rmtree(dd, ignore_errors=True)

    same = digs["tpu"] == digs["cpu"]
    if not same:
        diff = sorted(set(digs["tpu"].items()) ^ set(digs["cpu"].items()))
        say(f"OUTPUT MISMATCH: {[d[0] for d in diff][:8]}")
    entry = {
        "tag": args.tag, "order": args.order,
        "tpu_wall_s": res["tpu"]["wall_s"], "cpu_wall_s": res["cpu"]["wall_s"],
        "tpu_wins": res["tpu"]["wall_s"] <= res["cpu"]["wall_s"],
        "outputs_byte_identical": same,
        "n_compared_files": len(digs["tpu"]),
        "tpu": res["tpu"], "cpu": res["cpu"],
    }
    path = os.path.join(_REPO, "TPU_500K.json")
    doc = {}
    if os.path.exists(path):
        with open(path) as f:
            doc = json.load(f)
    doc.setdefault("pairs_r5", []).append(entry)
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps(entry))


if __name__ == "__main__":
    main()
