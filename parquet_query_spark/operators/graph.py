"""Iterative graph analytics over the verified near-duplicate graph.

The near-dup edge list (LSH candidates that pass exact Jaccard — the same
`_lsh_verified_pairs` kernel the dedup tier uses) doubles as a small graph
workload, and these operators add the iterative-algorithm family the rest
of the catalog doesn't exercise:

* **PageRank** — 5 power iterations.  All arithmetic is INTEGER (ranks in
  nano-units, per-edge contributions via integer division, damping as
  ``(85 * sum) DIV 100``), so the fixed point of each iteration is exactly
  reproducible across engines and run-to-run — no float summation-order
  flake, the same trick as the catalog's integer-cents revenue sums.
* **Triangle census** — oriented wedge join (a<b<c) + closing-edge
  semi-join, the standard distributed triangle plan that never
  materializes unordered duplicates.

Scale shape: each PageRank iteration is one (edge ⋈ rank) shuffle + one
dst-keyed aggregation — the degree table is computed once.  On a real
1000-executor run you'd checkpoint ranks every few iterations to truncate
lineage; at the catalog's fixed 5 iterations the plan stays comfortably
below that threshold.  Triangle counting joins oriented edges (each edge
stored once, smaller-endpoint-first), so wedge expansion is bounded by
sum(deg²) of the FILTERED graph, not the corpus.

Reference parity: the reference app delegates all SQL to DuckDB
(src/duckdb.ts:46-49) where iterative algorithms are expressible only as
unrolled/recursive CTEs — exactly how the oracles here are written.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_query_spark.operators.catalog import query
from parquet_query_spark.operators.dedup import (
    _DUCKDB_LSH_PAIR_CTES,
    _lsh_verified_pairs,
)

_SCALE = 1_000_000_000  # rank nano-units
_N_ITER = 5

_GRAPH_CTES = f"""{_DUCKDB_LSH_PAIR_CTES},
verified AS (
  SELECT doc_a, doc_b FROM pairs
  WHERE CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
        / (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b))) >= 0.2
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM verified
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM verified
),
deg AS (
  SELECT src AS doc_id, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY 1
)"""


def _pagerank_oracle() -> str:
    iters = [f"r0 AS (SELECT doc_id, CAST({_SCALE} AS BIGINT) AS rank FROM deg)"]
    for i in range(1, _N_ITER + 1):
        iters.append(
            f"r{i} AS (SELECT e.dst AS doc_id, "
            f"{15 * _SCALE // 100} + (85 * SUM(r.rank // d.deg)) // 100 AS rank "
            f"FROM edges e JOIN r{i - 1} r ON r.doc_id = e.src "
            f"JOIN deg d ON d.doc_id = e.src GROUP BY e.dst)"
        )
    return f"""
WITH {_GRAPH_CTES},
{','.join(iters)}
SELECT doc_id, CAST(rank AS BIGINT) AS rank_nano
FROM r{_N_ITER}
ORDER BY rank_nano DESC, doc_id
LIMIT 100
"""


@query("neardup_pagerank", oracle=_pagerank_oracle(), tags=("graph", "dedup"))
def neardup_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the verified near-dup graph: which documents sit at
    the center of duplication clusters (template hubs rank far above
    pairwise duplicates — the prioritization signal for which boilerplate
    to hunt first).

    5 power iterations, damping 0.85, ALL-INTEGER arithmetic: rank is
    nano-units, a node's per-edge contribution is ``rank DIV degree``, and
    damping applies as ``(85 * sum) DIV 100`` — every engine and every
    run computes bit-identical ranks (float PageRank differs in the last
    ulp per summation order).  Each iteration = one edge⋈rank shuffle +
    one dst aggregation over the edge list (corpus-independent size);
    degrees computed once.  The oracle unrolls the same five iterations
    as SQL CTEs."""
    verified = _lsh_verified_pairs(spark, sf_dir, threshold=0.2)
    edges = (
        verified.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionAll(verified.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    )
    deg = edges.groupBy(F.col("src").alias("doc_id")).agg(F.count("*").alias("deg"))
    # Materialize the (small, edge-bound) graph once: five iterations
    # re-derive edges/degrees otherwise, recomputing the LSH join per
    # iteration.  localCheckpoint also truncates lineage the way a real
    # iterative job would.
    edges = edges.localCheckpoint(eager=False)
    deg = deg.localCheckpoint(eager=False)

    ranks = deg.select("doc_id", F.lit(_SCALE).cast("bigint").alias("rank"))
    for _ in range(_N_ITER):
        contrib = (
            edges.join(ranks, edges.src == ranks.doc_id)
            .join(deg.select(F.col("doc_id").alias("dg_id"), "deg"), F.col("src") == F.col("dg_id"))
            .select("dst", F.expr("rank DIV deg").alias("c"))
        )
        ranks = contrib.groupBy(F.col("dst").alias("doc_id")).agg(
            F.expr(f"CAST({15 * _SCALE // 100} AS BIGINT) + (85 * SUM(c)) DIV 100").alias("rank")
        )
    return (
        ranks.select("doc_id", F.col("rank").alias("rank_nano"))
        .orderBy(F.desc("rank_nano"), "doc_id")
        .limit(100)
    )


@query(
    "neardup_triangles",
    oracle=f"""
WITH {_GRAPH_CTES},
oriented AS (SELECT doc_a AS a, doc_b AS b FROM verified),
wedges AS (
  SELECT o1.a AS a, o1.b AS b, o2.b AS c
  FROM oriented o1 JOIN oriented o2 ON o1.b = o2.a
),
tri AS (
  SELECT w.a, w.b, w.c FROM wedges w
  WHERE EXISTS (SELECT 1 FROM oriented o WHERE o.a = w.a AND o.b = w.c)
)
SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT)                    AS n_nodes,
       CAST((SELECT COUNT(*) FROM oriented) AS BIGINT)               AS n_edges,
       CAST((SELECT COUNT(*) FROM tri) AS BIGINT)                    AS n_triangles,
       CAST((SELECT COALESCE(SUM(deg * (deg - 1) // 2), 0) FROM deg) AS BIGINT)
         AS n_wedges,
       round(3.0 * (SELECT COUNT(*) FROM tri)
             / greatest((SELECT SUM(deg * (deg - 1) // 2) FROM deg), 1), 6)
         AS clustering_coeff
""",
    tags=("graph", "dedup"),
)
def neardup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the verified near-dup graph + global clustering
    coefficient — distinguishes chain-shaped duplication (scraper mirrors,
    clustering ≈ 0) from clique-shaped template families (clustering → 1),
    which predicts how aggressively transitive cluster-collapse will merge.

    The standard distributed triangle plan: each undirected edge is stored
    ONCE oriented smaller-id-first, wedges come from one oriented
    self-join (so each triangle is generated exactly once, as a<b<c), and
    the closing edge check is a LEFT SEMI join — never an unordered
    all-pairs expansion.  Wedge count is the exact ``sum(deg·(deg−1)/2)``
    integer identity; the one ratio divides two exact integers."""
    verified = _lsh_verified_pairs(spark, sf_dir, threshold=0.2)
    oriented = verified.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    oriented = oriented.localCheckpoint(eager=False)
    edges_sym = oriented.unionAll(oriented.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = edges_sym.groupBy(F.col("a").alias("doc_id")).agg(F.count("*").alias("deg"))

    o1 = oriented.alias("o1")
    o2 = oriented.alias("o2")
    wedges = o1.join(o2, F.col("o1.b") == F.col("o2.a")).select(
        F.col("o1.a").alias("a"), F.col("o1.b").alias("b"), F.col("o2.b").alias("c")
    )
    tri = wedges.join(
        oriented.select(F.col("a").alias("ca"), F.col("b").alias("cb")),
        (F.col("a") == F.col("ca")) & (F.col("c") == F.col("cb")),
        "left_semi",
    )
    n_tri = tri.agg(F.count("*").alias("n_triangles"))
    n_edges = oriented.agg(F.count("*").alias("n_edges"))
    deg_stats = deg.agg(
        F.count("*").alias("n_nodes"),
        F.sum(F.expr("deg * (deg - 1) DIV 2")).alias("n_wedges"),
    )
    return (
        deg_stats.crossJoin(n_edges)
        .crossJoin(n_tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            F.coalesce(F.col("n_wedges"), F.lit(0)).cast("bigint").alias("n_wedges"),
            F.round(
                3.0 * F.col("n_triangles") / F.greatest(F.col("n_wedges"), F.lit(1)), 6
            ).alias("clustering_coeff"),
        )
    )


_KCORE_K = 2
_KCORE_ROUNDS = 5


def _kcore_oracle() -> str:
    # AS MATERIALIZED is load-bearing: each e{r} references e{r-1} three
    # times (FROM + two IN subqueries) and the stats union re-references
    # every round — DuckDB's default CTE inlining re-expands the whole
    # LSH-pair pipeline multiplicatively (~3^rounds), turning a sub-second
    # oracle into minutes.  Materializing makes each round compute once.
    parts = [f"e0 AS MATERIALIZED (SELECT src, dst FROM edges)"]
    for r in range(1, _KCORE_ROUNDS + 1):
        parts.append(
            f"k{r} AS MATERIALIZED "
            f"(SELECT src FROM e{r - 1} GROUP BY src HAVING COUNT(*) >= {_KCORE_K})"
        )
        parts.append(
            f"e{r} AS MATERIALIZED (SELECT e.src, e.dst FROM e{r - 1} e "
            f"WHERE e.src IN (SELECT src FROM k{r}) AND e.dst IN (SELECT src FROM k{r}))"
        )
    stats = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS round, "
        f"CAST(COUNT(DISTINCT src) AS BIGINT) AS n_nodes, "
        f"CAST(COUNT(*) // 2 AS BIGINT) AS n_edges FROM e{r}"
        for r in range(_KCORE_ROUNDS + 1)
    )
    return f"""
WITH {_GRAPH_CTES},
{','.join(parts)}
SELECT round, n_nodes, n_edges FROM ({stats})
ORDER BY round
"""


@query("neardup_kcore", oracle=_kcore_oracle(), tags=("graph", "dedup"))
def neardup_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core decomposition of the verified near-dup graph by iterative
    peeling, with the per-round convergence trace as output: round 0 is
    the raw graph, each subsequent round drops nodes whose degree fell
    below k and the edges touching them.  The surviving core separates
    genuine duplicate CLIQUES (templates, mirrored sites) from incidental
    pairwise matches — pairs and pendant chains peel away, cores persist.

    Scale shape: each round is one degree aggregation plus two semi-joins
    on the shrinking edge list (never the corpus), and the edge list only
    ever shrinks — the classic distributed k-core schedule.  Lineage is
    truncated per round with localCheckpoint exactly like the PageRank
    loop.  The round count is fixed (5 — convergence is visible in the
    trace when consecutive rows equalize), so the oracle unrolls the same
    peels as SQL CTEs."""
    verified = _lsh_verified_pairs(spark, sf_dir, threshold=0.2)
    edges = (
        verified.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionAll(verified.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .localCheckpoint(eager=False)
    )
    rounds = []
    e = edges
    for r in range(_KCORE_ROUNDS + 1):
        rounds.append(
            e.agg(
                F.lit(r).cast("bigint").alias("round"),
                F.countDistinct("src").cast("bigint").alias("n_nodes"),
                F.expr("COUNT(*) DIV 2").cast("bigint").alias("n_edges"),
            )
        )
        if r == _KCORE_ROUNDS:
            break
        keep = (
            e.groupBy("src")
            .agg(F.count("*").alias("d"))
            .where(F.col("d") >= _KCORE_K)
            .select("src")
        )
        e = (
            e.join(keep, "src", "left_semi")
            .join(keep.select(F.col("src").alias("dst")), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
    out = rounds[0]
    for df in rounds[1:]:
        out = out.unionByName(df)
    return out.orderBy("round")
