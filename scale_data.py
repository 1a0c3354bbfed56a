#!/usr/bin/env python
"""Generate an N× scaled copy of a testdata directory for scale-headroom
checks (the BASELINE.md "8×" experiment).

Big tables are unioned N times with key offsets (so keys stay unique);
dimension tables are copied as-is.  DuckDB does the heavy lifting — no
Spark session needed.

``--hot-cluster N`` additionally injects N near-identical documents (one
giant near-dup cluster): every injected doc shares its MinHash bands, so
the LSH candidate join gets ONE hot (band_id, band_val) bucket with ~N²/2
pair expansion — the skew topology that breaks naive LSH joins at corpus
scale.  Used for the BASELINE.md band-skew/AQE measurement.

Usage:
  python scale_data.py [--src /root/testdata/sf0.1] [--dst /tmp/scale_x8] [--factor 8] [--hot-cluster 0]
  SPARK_GRAFT_SF_DIR=/tmp/scale_x8 python bench.py
  SPARK_GRAFT_SF_DIR=/tmp/scale_x8 python baseline_duckdb.py
"""

from __future__ import annotations

import argparse
import os

DIMS = ["region", "nation", "customer", "supplier", "part"]
FACTS = {
    "lineitem": ("l_orderkey", 10_000_000),
    "orders": ("o_orderkey", 10_000_000),
    "documents": ("doc_id", 1_000_000),
    "embeddings": ("vec_id", 1_000_000),
    "events": ("event_id", 10_000_000),
}


def main() -> None:
    import duckdb

    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/scale_x8")
    ap.add_argument("--factor", type=int, default=8)
    ap.add_argument(
        "--hot-cluster",
        type=int,
        default=0,
        help="inject N near-identical documents (one hot LSH band bucket)",
    )
    ap.add_argument(
        "--bounded-dup",
        action="store_true",
        help="documents copies carry FRESH content (every word prefixed "
        "with a per-copy salt token, so no 3-gram shingle survives across "
        "copies): the corpus grows N x while the near-duplicate RATE stays "
        "the base corpus's — the realistic regime, vs the default N-sized "
        "duplicate cliques whose edges grow N^2 by construction (r9 "
        "VERDICT #5: separates plan cost from corpus artifact for the "
        "edge-bound dedup/graph family)",
    )
    ap.add_argument(
        "--jitter-embeddings",
        action="store_true",
        help="embeddings copies carry PERTURBED vectors (deterministic "
        "per-(vec,copy,dim) uniform jitter in ±0.1 ≈ 0.8 sigma of the "
        "component distribution): copies of one vector stay a near-dup "
        "FAMILY (cos ≈ 0.9 between siblings) without being exact "
        "duplicates, and the corpus keeps the base distribution's bucket "
        "/cluster geometry — the embeddings analog of --bounded-dup "
        "(exact copies would hash to one LSH bucket per family and "
        "collapse semdedup's prune set by construction)",
    )
    ap.add_argument(
        "--shift-events-users",
        action="store_true",
        help="events copies also offset user_id (copy i gets user_id + "
        "i*10000): key CARDINALITY scales with the factor instead of "
        "rows-per-key — the corpus for the stateful-streaming state-store "
        "rehearsal (at 100 TB the pressure on applyInPandasWithState is "
        "millions of keys, not millions of rows under 1500 keys)",
    )
    ap.add_argument(
        "--tables",
        help="comma-separated fact tables to scale (default: all); dims "
        "always copy.  The 4096x stretch tier only needs documents — "
        "scaling lineitem/events 4096x would be ~50 GB of dead weight",
    )
    args = ap.parse_args()

    os.makedirs(args.dst, exist_ok=True)
    con = duckdb.connect()
    # a 4096-branch UNION ALL trips the default 1000 parser depth
    con.execute("SET max_expression_depth TO 100000")
    facts = dict(FACTS)
    if args.tables:
        keep = {t.strip() for t in args.tables.split(",")}
        facts = {t: v for t, v in facts.items() if t in keep}
    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM '{args.src}/{t}.parquet') "
            f"TO '{args.dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied")
    for t, (key, off) in facts.items():
        if t == "documents" and args.bounded_dup:
            # copy 0 is the base corpus verbatim; copy i>0 prefixes every
            # word with a per-copy salt, preserving each copy's INTERNAL
            # duplicate structure (the same transform applies to both
            # members of a near-dup pair) while guaranteeing zero shared
            # shingles across copies — duplicate rate constant in N.
            parts = [f"SELECT * FROM '{args.src}/{t}.parquet'"]
            for i in range(1, args.factor):
                parts.append(
                    f"SELECT doc_id + {i * off} AS doc_id, "
                    f"regexp_replace(text, '(\\S+)', 'c{i}q\\1', 'g') AS text, "
                    f"lang, source, "
                    f"strlen(regexp_replace(text, '(\\S+)', 'c{i}q\\1', 'g')) "
                    f"AS n_chars "
                    f"FROM '{args.src}/{t}.parquet'"
                )
            union = " UNION ALL ".join(parts)
        elif t == "embeddings" and args.jitter_embeddings:
            # copy 0 is the base corpus verbatim; copy i>0 adds a
            # deterministic per-(vec,copy,dim) jitter so sibling copies
            # form near-dup families (cos ~0.9) instead of exact clones.
            parts = [f"SELECT * FROM '{args.src}/{t}.parquet'"]
            for i in range(1, args.factor):
                parts.append(
                    f"SELECT vec_id + {i * off} AS vec_id, "
                    f"list_transform(embedding, (x, d) -> CAST(x + "
                    f"(CAST(hash(CAST(vec_id AS VARCHAR) || '_{i}_' || "
                    f"CAST(d AS VARCHAR)) % 2001 AS BIGINT) - 1000) / 10000.0 "
                    f"AS FLOAT)) AS embedding, "
                    f"label "
                    f"FROM '{args.src}/{t}.parquet'"
                )
            union = " UNION ALL ".join(parts)
        elif t == "events" and args.shift_events_users:
            union = " UNION ALL ".join(
                f"SELECT * REPLACE ({key} + {i * off} AS {key}, "
                f"user_id + {i * 10_000} AS user_id) "
                f"FROM '{args.src}/{t}.parquet'"
                for i in range(args.factor)
            )
        else:
            union = " UNION ALL ".join(
                f"SELECT * REPLACE ({key} + {i * off} AS {key}) "
                f"FROM '{args.src}/{t}.parquet'"
                for i in range(args.factor)
            )
        if t == "documents" and args.hot_cluster:
            # N copies of one document, each with a distinct trailing token:
            # shingle sets still overlap ~fully, so all N land in the same
            # LSH band buckets AND pass exact-Jaccard verification — the
            # worst-case hot-band topology.
            base_off = args.factor * off
            union += f"""
 UNION ALL
 SELECT {base_off} + r.range AS doc_id,
        b.text || ' hotdup tail token v' || CAST(r.range % 7 AS VARCHAR) AS text,
        b.lang, 'hot_cluster' AS source, strlen(b.text) + 22 AS n_chars
 FROM range({args.hot_cluster}) r
 CROSS JOIN (SELECT text, lang FROM '{args.src}/{t}.parquet'
             ORDER BY doc_id LIMIT 1) b
"""
        con.execute(f"COPY ({union}) TO '{args.dst}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM '{args.dst}/{t}.parquet'").fetchone()[0]
        print(t, n, "rows")


if __name__ == "__main__":
    main()
