#!/usr/bin/env python3
"""Driver re-confirmation staleness report (VERDICT r7 Next-round #8).

For every catalog operator, prints rounds-since-last-driver-green computed
from the committed CORRECTNESS_r*.json files — the same computation
`__spark_entry__._latest_green_rounds` uses to order the driver sample
window (oldest green row first, never-sampled first of all).  Run after
each round lands its CORRECTNESS file:

    python staleness_check.py            # summary + the next sample window
    python staleness_check.py --full     # every op with its latest round

Exit code is non-zero if any op's latest green row is older than
--max-age rounds (default 6) behind the newest CORRECTNESS file, so the
check can gate like plan_audit.py does for plan coverage.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
from collections import Counter

BASE = os.path.dirname(os.path.abspath(__file__))


def correctness_rounds() -> list[int]:
    out = []
    for path in glob.glob(os.path.join(BASE, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r0*(\d+)\.json$", path)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="print every op")
    ap.add_argument("--max-age", type=int, default=6,
                    help="fail if any op's green row is older than this many rounds")
    ap.add_argument("--window", type=int, default=50,
                    help="driver sample window size to preview")
    args = ap.parse_args()

    sys.path.insert(0, BASE)
    import __spark_entry__ as entry

    latest = entry._latest_green_rounds()
    catalog = entry._catalog()
    current = max(correctness_rounds() or [0])

    order = list(entry._ordered(catalog))
    ages = {n: (current - latest[n]) if n in latest else None for n in catalog}

    hist = Counter(
        "never" if a is None else str(a) for a in ages.values()
    )
    print(f"catalog ops: {len(catalog)}; newest CORRECTNESS round: r{current}")
    print("age histogram (rounds since last driver-green):")
    for k in sorted(hist, key=lambda x: (x != "never", int(x) if x != "never" else -1)):
        print(f"  {k:>5}: {hist[k]}")

    print(f"\nnext driver sample window (first {args.window} of presentation order):")
    for n in order[: args.window]:
        tag = "NEVER" if ages[n] is None else f"age {ages[n]} (r{latest[n]})"
        print(f"  {n:<45} {tag}")

    if args.full:
        print("\nfull table:")
        for n in order:
            tag = "NEVER" if ages[n] is None else f"r{latest[n]}"
            print(f"  {n:<45} {tag}")

    stale = [n for n, a in ages.items() if a is not None and a > args.max_age]
    never = [n for n, a in ages.items() if a is None]
    if stale:
        print(f"\nSTALE (> {args.max_age} rounds): {len(stale)}")
        for n in sorted(stale):
            print(f"  {n} (r{latest[n]})")
    if never:
        print(f"\nnever driver-green: {len(never)} (front of next sample window)")
    return 1 if stale else 0


if __name__ == "__main__":
    sys.exit(main())
