"""Engine-free 4->16 core scaling probe: pure numpy memory writes.

The round-5 session pairs read 0.51-0.72 with every probe throttled
(warm single-thread bandwidth ~6 GB/s vs ~68 healthy). This tool
measures what the HOST ITSELF scales at, with zero Spark and zero
engine code: N worker processes, each taskset-confined with the whole
group to cores 0..N-1, each repeatedly memset-ing a warmed 512 MB
buffer for a fixed window; aggregate bytes/sec at N=4 vs N=16 gives a
pure memory-bandwidth scaling efficiency. If THIS number sits at ~0.6
under throttle, a ~0.6 engine pair in the same window measures the
box, not the encode plan.

Usage: python tools/membw_probe.py [--secs 8] [--levels 4,16]
Appends one JSON line per run to BENCH/membw_probe.jsonl (cwd-relative
repo root) and prints the summary.
"""

from __future__ import annotations

import argparse
import datetime
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _worker(out_q, secs: float, mode: str) -> None:
    import numpy as np

    nbytes = 1 << 28 if mode == "fault" else 1 << 29
    n = nbytes // 8
    a = np.empty(n, dtype=np.float64)
    a[:] = 1.0                                   # warm (fault once)
    passes = 0
    t0 = time.time()
    while time.time() - t0 < secs:
        if mode == "fault":
            # fresh allocation each pass: every write is a first-touch
            # page fault — the path this host throttles (cold_gbps)
            b = np.empty(n, dtype=np.float64)
            b[:] = float(passes)
            del b
        else:
            a[:] = float(passes)
        passes += 1
    elapsed = time.time() - t0
    out_q.put(passes * nbytes / elapsed)


def measure(nprocs: int, secs: float, mode: str = "warm") -> float:
    """Aggregate write bandwidth (bytes/sec) of nprocs workers."""
    q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=_worker, args=(q, secs, mode))
             for _ in range(nprocs)]
    for p in procs:
        p.start()
    vals = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return float(sum(vals))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=8.0)
    ap.add_argument("--levels", default="4,16")
    ap.add_argument("--mode", default="warm", choices=["warm", "fault"])
    ap.add_argument("--child", type=int, default=0,
                    help="internal: run one confined measurement")
    args = ap.parse_args()

    if args.child:
        print(json.dumps({"n": args.child, "gbps": measure(
            args.child, args.secs, args.mode) / 1e9}))
        return 0

    levels = [int(x) for x in args.levels.split(",")]
    res = {}
    for n in levels:
        cmd = ["taskset", "-c", f"0-{n - 1}", sys.executable,
               os.path.abspath(__file__), "--child", str(n),
               "--secs", str(args.secs), "--mode", args.mode]
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=600)
        res[n] = json.loads(out.stdout.strip().splitlines()[-1])["gbps"]
    summary = {
        "at": datetime.datetime.now().isoformat(timespec="seconds"),
        "mode": args.mode,
        "secs_per_level": args.secs,
        "gbps": {str(n): round(res[n], 2) for n in levels},
    }
    for a, b in zip(levels, levels[1:]):
        summary[f"efficiency_{a}_to_{b}"] = round(
            res[b] / res[a] / (b / a), 3)
    with open(os.path.join(ROOT, "BENCH", "membw_probe.jsonl"), "a") as fh:
        fh.write(json.dumps(summary) + "\n")
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    main()
