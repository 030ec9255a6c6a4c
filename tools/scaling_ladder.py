"""Confined N->4N scaling ladder with self-describing host-health probes.

Round-2 verdict item #2: the standing 0.991 efficiency citation was
recorded mid-round and every later window was fault-throttled. This tool
makes the re-run one command: it probes host bandwidth, runs the
confined local[4] -> local[16] (-> local[32] whole-box) encode ladder
from bench.py in fresh subprocesses, brackets every leg with probes, and
appends one JSON line per leg to the output JSONL. Exit 3 (without
--force) when the starting probe says the host is throttled, so a cron
watcher can retry cheaply until a healthy window appears.

Usage: python tools/scaling_ladder.py [--rows 2000000] [--force]
                                      [--out BENCH/scaling_1b_r3.jsonl]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import shutil
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)  # ~1B tokens
    ap.add_argument("--levels", default="4,8,16,32")
    ap.add_argument("--out", default=os.path.join(ROOT, "BENCH", "scaling_1b_r3.jsonl"))
    ap.add_argument("--force", action="store_true",
                    help="run even when the starting probe reads throttled")
    args = ap.parse_args()

    probe0 = bench.host_probe()
    print(json.dumps({"probe_start": probe0}), flush=True)
    if probe0["throttled"] and not args.force:
        return 3

    levels = [int(x) for x in args.levels.split(",")]
    input_dir = os.path.join(tempfile.gettempdir(), f"bench_tokens_{args.rows}")
    if not os.path.isdir(input_dir):
        # prepare on the whole box; not part of any timed leg
        bench.prepare_input(args.rows, input_dir, cores=os.cpu_count() or 8)

    confine = shutil.which("taskset") is not None
    results: dict[int, dict] = {}
    with open(args.out, "a") as fh:
        for cores in levels:
            leg_probe = bench.host_probe()
            cmd = [sys.executable, os.path.join(ROOT, "bench.py"),
                   "--encode-only", "--cores", str(cores),
                   "--rows", str(args.rows), "--input", input_dir]
            if confine and cores < (os.cpu_count() or cores):
                cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=4000, cwd=ROOT)
            line = (proc.stdout.strip().splitlines() or ["{}"])[-1]
            try:
                res = json.loads(line)
            except json.JSONDecodeError:
                res = {"error": proc.stderr[-500:]}
            res["cores"] = cores
            res["confined"] = confine and cores < (os.cpu_count() or cores)
            res["probe_before_leg"] = leg_probe
            res["recorded_at"] = datetime.datetime.now().isoformat(
                timespec="seconds")
            results[cores] = res
            fh.write(json.dumps(res) + "\n")
            fh.flush()
            print(json.dumps(res), flush=True)

    probe1 = bench.host_probe()
    summary = {"probe_start": probe0, "probe_end": probe1}
    for a, b in ((4, 16), (8, 32), (2, 8)):
        ta = results.get(a, {}).get("tokens_per_sec")
        tb = results.get(b, {}).get("tokens_per_sec")
        if ta and tb:
            summary[f"efficiency_{a}_to_{b}"] = round(tb / ta / (b / a), 3)
    with open(args.out, "a") as fh:
        fh.write(json.dumps(summary) + "\n")
    print(json.dumps(summary), flush=True)
    clean = not probe0["throttled"] and not probe1["throttled"]
    return 0 if clean else 4


if __name__ == "__main__":
    sys.exit(main())
