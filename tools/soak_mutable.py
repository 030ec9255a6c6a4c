"""Soak the mutable-table surface: long randomized op sequences.

Reuses the model-check from tests/test_mutable_model.py (append /
delete / upsert / add / rename / drop / compact against a driver-side
mirror, exact-equality check plus a random pushed-filter read after
every step) but runs far longer sequences than the suite's 10-op
smoke: the cross-operation interaction space grows with sequence
length (tombstones through rename chains through compaction through
more tombstones), so depth is what finds the residual bugs.

  python tools/soak_mutable.py [--seeds 0:40] [--n-ops 30] [--page-rows 16]

Every failure prints the seed + step description, which replays
deterministically. Exit code = number of failed seeds.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time
import traceback
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="0:20",
                    help="lo:hi (half-open) or comma list")
    ap.add_argument("--n-ops", type=int, default=30)
    ap.add_argument("--page-rows", type=int, default=None,
                    help="page frames every N rows (alternates with "
                         "unpaged per seed when omitted)")
    ap.add_argument("--cores", default=os.environ.get(
        "SPARK_GRAFT_TEST_CPUS", "4"))
    args = ap.parse_args()

    if ":" in args.seeds:
        lo, hi = args.seeds.split(":")
        seeds = list(range(int(lo), int(hi)))
    else:
        seeds = [int(s) for s in args.seeds.split(",")]

    from parquet_go_spark.session import get_spark
    from test_mutable_model import test_mutable_surface_model

    spark = get_spark(cores=args.cores, app_name="pgs-soak",
                      driver_memory="6g")
    failures = []
    for seed in seeds:
        page_rows = (
            args.page_rows if args.page_rows is not None
            else (16 if seed % 2 else None)
        )
        t0 = time.time()
        d = Path(tempfile.mkdtemp(prefix=f"pgs-soak-{seed}-"))
        try:
            test_mutable_surface_model(
                spark, d, seed, page_rows, n_ops=args.n_ops)
            print(f"seed {seed} page_rows={page_rows}: OK "
                  f"({time.time() - t0:.1f}s)", flush=True)
        except Exception:
            failures.append(seed)
            print(f"seed {seed} page_rows={page_rows}: FAIL", flush=True)
            traceback.print_exc()
        finally:
            shutil.rmtree(d, ignore_errors=True)
    print(f"soak done: {len(seeds) - len(failures)}/{len(seeds)} seeds green"
          + (f"; FAILED: {failures}" if failures else ""), flush=True)
    return len(failures)


if __name__ == "__main__":
    raise SystemExit(main())
