#!/usr/bin/env python
"""Growth-exponent regression harness.

Runs named catalog operators at {1×, 8×, 64×} sf0.1 (the 8×/64× copies
come from ``scale_data.py``), fits the log-log slope of runtime vs data
factor, and appends one JSON line per operator to ``growth_log.jsonl``.
Slope ~0 = constant (floor-bound), ~0.33 = strongly sublinear, 1.0 =
linear in data, >1 = superlinear (investigate, or adjudicate as
output-bound — the scaled copies are genuine duplicates, so dedup-family
outputs legitimately explode by construction).

This mechanizes the by-hand 8× sweep protocol used since round 3:
    python growth_check.py q1_pricing_summary text_stats ...
    python growth_check.py --tier bench          # every bench-tagged op
    python growth_check.py --factors 1,8 ...     # quick sweep

Timing protocol matches BASELINE.md: one warm pass, then min of N=2
measured runs, all on an otherwise-idle local[32].  Do NOT run while
pytest/bench/plan_audit are active — contended numbers are worthless.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FACTOR_DIRS = {
    1: os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    8: "/tmp/scale_x8",
    64: "/tmp/scale_x64",
}


def fit_slope(points: list[tuple[float, float]]) -> float:
    """Least-squares slope of log(sec) vs log(factor)."""
    xs = [math.log(f) for f, _ in points]
    ys = [math.log(s) for _, s in points]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs)
    if denom == 0:
        return 0.0
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom


def adjudicate(slope: float) -> str:
    if slope < 0.15:
        return "constant"
    if slope < 0.67:
        return "sublinear"
    if slope <= 1.1:
        return "linear"
    return "superlinear"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ops", nargs="*", help="catalog operator names")
    ap.add_argument("--tier", help="run every op carrying this tag")
    ap.add_argument("--factors", default="1,8,64")
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--no-warm", action="store_true",
                    help="skip the warm pass; min over --repeat runs")
    ap.add_argument(
        "--force", choices=["collect", "noop"], default="collect",
        help="how to force computation: collect() (default; driver "
        "materializes every row — at 10M+ output rows driver GC "
        "dominates and hides the engine time) or a noop-format write "
        "(full computation, rows consumed executor-side — what a real "
        "cluster job does with large outputs)",
    )
    ap.add_argument(
        "--heavy", action="store_true",
        help="preset for the heavy dedup tier (VERDICT r7 #4): the three "
        "5-10 min queries at 64x only, no warm pass, min of 2 runs",
    )
    ap.add_argument("--out", default="growth_log.jsonl")
    ap.add_argument(
        "--dirs",
        help="override factor dirs, e.g. 8=/tmp/bounded_x8,64=/tmp/bounded_x64",
    )
    ap.add_argument(
        "--tag",
        help="corpus tag recorded on every log row (e.g. bounded-dup)",
    )
    args = ap.parse_args()
    if args.dirs:
        for pair in args.dirs.split(","):
            f, d = pair.split("=", 1)
            FACTOR_DIRS[int(f)] = d
    if args.heavy:
        args.ops = args.ops or [
            "dedup_simhash_buckets",
            "dedup_minhash_candidate_pairs",
            "dedup_cluster_pipeline",
        ]
        args.factors = "64"
        args.no_warm = True
        args.repeat = 2

    from parquet_query_spark.operators.catalog import load_all
    from parquet_query_spark.session import get_spark

    catalog = load_all()
    names = list(args.ops)
    if args.tier:
        names += [
            n for n, s in catalog.items() if args.tier in getattr(s, "tags", ())
        ]
    if not names:
        ap.error("no operators selected (pass names or --tier)")
    factors = sorted(int(f) for f in args.factors.split(","))
    for f in factors:
        if not os.path.isdir(FACTOR_DIRS[f]):
            ap.error(
                f"{FACTOR_DIRS[f]} missing — generate with "
                f"`python scale_data.py --dst {FACTOR_DIRS[f]} --factor {f}`"
            )

    spark = get_spark("growth-check", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    with open(args.out, "a") as log:
        for name in names:
            spec = catalog[name]
            points, rows = [], {}
            for f in factors:
                sf = FACTOR_DIRS[f]
                # collect(), not count(): count() lets Spark prune the
                # projections, skipping the computation scan-shaped ops
                # exist to measure.  Rebuild the DataFrame fresh per run:
                # re-collecting one DF reuses restage-shuffle outputs
                # (skipped stages) and hides most of the cost.
                def timed_force(df):
                    if args.force == "noop":
                        df.write.format("noop").mode("overwrite").save()
                        return None
                    return len(df.collect())

                if not args.no_warm:
                    timed_force(spec.fn(spark, sf))  # warm (plan+JIT+cache)
                best = math.inf
                for _ in range(args.repeat):
                    t0 = time.time()
                    n = timed_force(spec.fn(spark, sf))
                    best = min(best, time.time() - t0)
                    if n is not None:
                        rows[f] = n
                if f not in rows:  # noop mode: count outside the timing
                    rows[f] = spec.fn(spark, sf).count()
                points.append((f, best))
            slope = fit_slope(points)
            rec = {
                "op": name,
                "sec": {str(f): round(s, 2) for f, s in points},
                "rows": {str(f): rows[f] for f in factors},
                "slope": round(slope, 2) if len(points) > 1 else None,
                "class": adjudicate(slope) if len(points) > 1 else "single-point",
            }
            if args.tag:
                rec["corpus"] = args.tag
            log.write(json.dumps(rec) + "\n")
            log.flush()
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
