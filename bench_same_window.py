#!/usr/bin/env python
"""Same-window bench protocol (VERDICT r10 #2).

Cross-round bench absolutes drifted 15-30% with ambient machine state
(r10 adjudication), so round-over-round comparisons are only valid
within one machine window.  This driver runs ``bench.py`` and
``baseline_duckdb.py`` back-to-back (interleaved, min of N) in ONE
session and emits a single JSON line with both aggregates and the
ratio — the number BASELINE.md quotes as operative.

Usage:
  python bench_same_window.py [--rounds 2] [--out BENCH_PAIR_r11.json]

Interleaving order is spark,duck,spark,duck — each engine's minimum is
taken across rounds, so a transient background load hits both engines
rather than biasing one.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time


def _run(cmd: list[str]) -> dict:
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=3600
    )
    if out.returncode != 0:
        sys.stderr.write(out.stdout[-2000:] + out.stderr[-2000:])
        raise SystemExit(f"{cmd} failed rc={out.returncode}")
    # last JSON-looking line wins (Spark logs precede it)
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise SystemExit(f"{cmd}: no JSON line in output")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    spark_runs, duck_runs = [], []
    for i in range(args.rounds):
        t0 = time.time()
        spark_runs.append(_run([sys.executable, "bench.py"]))
        duck_runs.append(_run([sys.executable, "baseline_duckdb.py"]))
        print(
            f"round {i + 1}/{args.rounds}: spark "
            f"{spark_runs[-1]['value']}s duckdb {duck_runs[-1]['value']}s "
            f"({time.time() - t0:.0f}s wall)",
            file=sys.stderr,
        )
    best_spark = min(spark_runs, key=lambda r: r["value"])
    best_duck = min(duck_runs, key=lambda r: r["value"])
    rec = {
        "metric": "same_window_pair",
        "spark_sec": best_spark["value"],
        "duckdb_sec": best_duck["value"],
        "ratio": round(best_spark["value"] / best_duck["value"], 4),
        "rounds": args.rounds,
        "spark_queries": best_spark.get("queries", {}),
        "duckdb_queries": best_duck.get("queries", {}),
        "sf": best_spark.get("sf"),
    }
    line = json.dumps(rec)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
