"""Run bench.py N times (fresh process each — sessions vary on the
shared chip) and write the median-by-headline run to a BENCH file.

Each run is a separate interpreter so compile caches are exercised the
way the driver's end-of-round run sees them; the published object is the
MEDIAN run's full JSON (not a field-wise mix), with all runs recorded
under "runs_qps" for variance visibility (VERDICT r2 weak #8).

Usage: python tools/bench3.py [--runs 3] [--out BENCH_r03.json] [--env K=V ...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", type=str, default="BENCH_r03.json")
    ap.add_argument("--env", nargs="*", default=[])
    args = ap.parse_args()

    env = dict(os.environ)
    for kv in args.env:
        k, _, v = kv.partition("=")
        env[k] = v

    results = []
    for i in range(args.runs):
        print(f"# run {i + 1}/{args.runs}", file=sys.stderr, flush=True)
        proc = subprocess.run(
            [sys.executable, str(REPO / "bench.py")],
            capture_output=True, text=True, env=env, cwd=REPO,
            timeout=3600,
        )
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        if proc.returncode != 0 or not line.startswith("{"):
            print(proc.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"run {i + 1} failed (rc={proc.returncode})")
        results.append(json.loads(line))
        print(f"#   -> {results[-1]['value']} qps", file=sys.stderr, flush=True)

    order = sorted(range(len(results)), key=lambda i: results[i]["value"])
    median = dict(results[order[len(results) // 2]])
    median["runs_qps"] = [r["value"] for r in results]
    median["runs_e2e_qps"] = [r.get("e2e_encode_search_qps") for r in results]
    median["runs_recall"] = [r.get("recall_at_10_vs_f32_exact") for r in results]
    out = REPO / args.out
    out.write_text(json.dumps(median) + "\n")
    print(json.dumps(median))


if __name__ == "__main__":
    main()
