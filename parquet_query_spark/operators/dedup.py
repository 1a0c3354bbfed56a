"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design for 100 TB:

* **Exact** — hash-groupBy on a 128-bit fingerprint: the shuffle carries
  (16-byte key, doc_id), never the text.
* **MinHash LSH** — per-doc signature computed scan-side with *builtin*
  expressions (token shingles → md5 per seed → array_min); candidate
  generation is an equi-join on band keys (shuffle on band hash — no O(n²)
  pair expansion), then exact Jaccard verification on candidates only.
* **SimHash** — 64-bit signature via a vectorized Pandas UDF (bit-twiddling
  has no builtin form); Arrow-batched, one pass.

MinHash here is md5-keyed so the DuckDB oracle can reproduce it exactly —
at production scale you'd swap in xxhash64 (`F.xxhash64`) for ~4× cheaper
signatures; the plan shape is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_query_spark.operators.catalog import query, views

N_HASHES = 16
N_BANDS = 4  # 4 rows per band


@query(
    "dedup_exact_groups",
    oracle="""
SELECT md5(text) AS text_hash,
       COUNT(*)  AS n_copies,
       MIN(doc_id) AS keeper_id
FROM documents
GROUP BY md5(text)
ORDER BY text_hash
""",
    tags=("dedup", "bench"),
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content hash, keep the smallest doc_id."""
    v = views(spark, sf_dir)
    return (
        v["documents"]
        .groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keeper_id"))
        .orderBy("text_hash")
    )


@query(
    "dedup_exact_survivors",
    oracle="""
SELECT doc_id, lang, source
FROM (
  SELECT doc_id, lang, source,
         ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents
) t
WHERE rn = 1
ORDER BY doc_id
""",
    tags=("dedup",),
)
def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The surviving rows after exact dedup (row_number form — generalizes
    to arbitrary keep-policies: shortest URL, earliest crawl, ...)."""
    from pyspark.sql import Window as W

    v = views(spark, sf_dir)
    w = W.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    return (
        v["documents"]
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


def _with_shingles(df: DataFrame) -> DataFrame:
    """doc_id + 3-token shingles, builtin expressions only.

    Tokenization happens ONCE in its own projection — inlining ``split()``
    into the per-element lambda would re-split the document for every
    shingle (O(words²) work; measured 8× slower at sf0.1)."""
    return df.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks")
    ).select(
        "doc_id",
        F.expr(
            """
            array_distinct(
              transform(
                sequence(1, greatest(size(toks) - 2, 1)),
                i -> concat_ws(' ', element_at(toks, i),
                               element_at(toks, i + 1),
                               element_at(toks, i + 2))
              )
            )
            """
        ).alias("shingles"),
    )


_DUCKDB_SHINGLES = """
list_distinct(
  list_transform(
    range(1, greatest(len(string_split_regex(trim(text), '\\s+')) - 2, 1) + 1),
    i -> concat_ws(' ',
           list_extract(string_split_regex(trim(text), '\\s+'), i),
           list_extract(string_split_regex(trim(text), '\\s+'), i + 1),
           list_extract(string_split_regex(trim(text), '\\s+'), i + 2))
  )
)
"""


# MinHash hash family: ONE md5 per shingle, split into two 56-bit halves
# (h1, h2); the k-th hash is h1 + k·(2·h2+1) — a Carter-Wegman-style pairwise
# combination.  16× cheaper than one md5 per (shingle, seed): measured 7.1s →
# ~1.5s at sf0.1.  56-bit halves keep k·h2 (k ≤ 15) inside int64.

_SPARK_H12 = """
transform(shingles, x -> named_struct(
  'h1', CAST(conv(substr(md5(x), 1, 14), 16, 10) AS BIGINT),
  'h2', CAST(conv(substr(md5(x), 17, 14), 16, 10) AS BIGINT) * 2 + 1))
"""

_DUCKDB_H12 = """
list_transform(shingles, x -> {
  'h1': CAST('0x' || substr(md5(x), 1, 14) AS BIGINT),
  'h2': CAST('0x' || substr(md5(x), 17, 14) AS BIGINT) * 2 + 1})
"""


def _minhash_cols_spark() -> list[F.Column]:
    return [
        F.expr(f"array_min(transform(h12, s -> s.h1 + {seed} * s.h2))").alias(f"mh_{seed}")
        for seed in range(N_HASHES)
    ]


def _minhash_cols_duckdb() -> str:
    return ",\n       ".join(
        f"list_min(list_transform(h12, s -> s.h1 + {seed} * s.h2)) AS mh_{seed}"
        for seed in range(N_HASHES)
    )


def _band_cols_spark() -> list[F.Column]:
    per_band = N_HASHES // N_BANDS
    return [
        F.md5(
            F.concat_ws("|", *[F.col(f"mh_{b * per_band + i}") for i in range(per_band)])
        ).alias(f"band_{b}")
        for b in range(N_BANDS)
    ]


def _band_cols_duckdb() -> str:
    per_band = N_HASHES // N_BANDS
    return ",\n       ".join(
        "md5("
        + " || '|' || ".join(
            f"CAST(mh_{b * per_band + i} AS VARCHAR)" for i in range(per_band)
        )
        + f") AS band_{b}"
        for b in range(N_BANDS)
    )


@query(
    "dedup_minhash_signatures",
    oracle=f"""
WITH sh AS (
  SELECT doc_id, {_DUCKDB_SHINGLES} AS shingles FROM documents
),
h AS (
  SELECT doc_id, {_DUCKDB_H12} AS h12 FROM sh
),
mh AS (
  SELECT doc_id,
       {_minhash_cols_duckdb()}
  FROM h
)
SELECT doc_id,
       {_band_cols_duckdb()}
FROM mh
ORDER BY doc_id
""",
    tags=("dedup", "minhash", "bench"),
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document MinHash LSH band keys (16 hashes → 4 bands of 4).

    Entirely scan-side builtin expressions: shingle → md5-per-seed →
    array_min → band md5.  At 100 TB this is the map phase; only the
    (doc_id, 4×16-byte bands) tuples shuffle."""
    v = views(spark, sf_dir)
    sh = _with_shingles(v["documents"])
    h = sh.select("doc_id", F.expr(_SPARK_H12).alias("h12"))
    mh = h.select("doc_id", *_minhash_cols_spark())
    return mh.select("doc_id", *_band_cols_spark()).orderBy("doc_id")


# Shared oracle CTE chain: documents → shingles → minhash → bands → LSH
# band-join candidate pairs (with both shingle sets attached for Jaccard
# verification).  Reused by the candidate-pair query and the full cluster
# pipeline below.
_DUCKDB_LSH_PAIR_CTES = f"""sh AS (
  SELECT doc_id, {_DUCKDB_SHINGLES} AS shingles FROM documents
),
h AS (
  SELECT doc_id, shingles, {_DUCKDB_H12} AS h12 FROM sh
),
mh AS (
  SELECT doc_id, shingles,
       {_minhash_cols_duckdb()}
  FROM h
),
banded AS (
  SELECT doc_id, shingles,
       {_band_cols_duckdb()}
  FROM mh
),
expl AS (
  SELECT doc_id, shingles, band_id, band_val
  FROM banded
  UNPIVOT (band_val FOR band_id IN (band_0, band_1, band_2, band_3))
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.shingles AS sh_a, b.shingles AS sh_b
  FROM expl a JOIN expl b
    ON a.band_id = b.band_id AND a.band_val = b.band_val AND a.doc_id < b.doc_id
)"""


@query(
    "dedup_minhash_candidate_pairs",
    oracle=f"""
WITH {_DUCKDB_LSH_PAIR_CTES}
SELECT doc_a, doc_b,
       round(CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
             / (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b))), 4) AS jaccard
FROM pairs
WHERE CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
      / (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b))) >= 0.2
ORDER BY doc_a, doc_b
""",
    tags=("dedup", "minhash", "bench"),
)
def dedup_minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs + exact-Jaccard verification.

    Candidates come from an equi-join on (band_id, band_val) — the scalable
    formulation (shuffle partitions by band hash; no cross join).  The band
    join carries only slim (doc_id, band_id, band_val) rows: document
    shingle sets do NOT transit the band-explode/shuffle (which quadruples
    row count and concentrates in hot-band partitions).  After candidate
    pairs are deduplicated, shingles are re-attached by two doc_id-keyed
    joins against the original one-row-per-doc relation — at 100 TB that
    shuffles each document's shingles at most once per side instead of
    4×-replicated through skewed band buckets (plan-asserted in
    tests/test_plans.py: no operator carries shingles alongside band keys).
    Exact n-gram Jaccard then filters false positives.  Pair order
    doc_a<doc_b."""
    jac = F.col("jaccard")
    return (
        _lsh_verified_pairs(spark, sf_dir, threshold=0.2)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


def _lsh_verified_pairs(
    spark: SparkSession, sf_dir: str, threshold: float
) -> DataFrame:
    """(doc_a, doc_b, jaccard) — LSH band-join candidates that pass exact
    n-gram Jaccard >= threshold.  Slim band shuffle; see
    dedup_minhash_candidates for the 100 TB plan-shape rationale."""
    v = views(spark, sf_dir)
    sh = _with_shingles(v["documents"]).select("doc_id", "shingles")
    h = sh.select("doc_id", F.expr(_SPARK_H12).alias("h12"))
    mh = h.select("doc_id", *_minhash_cols_spark())
    banded = mh.select("doc_id", *_band_cols_spark())
    expl = banded.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f"band_{b}").alias("band_id"),
                        F.col(f"band_{b}").alias("band_val"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_val")
    a = expl.alias("a")
    b = expl.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    pairs = cand.join(
        sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")),
        "doc_a",
    ).join(
        sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")),
        "doc_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size("sh_a") + F.size("sh_b") - F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / union
    return pairs.where(jac >= threshold).select(
        "doc_a", "doc_b", jac.alias("jaccard")
    )


@query(
    "dedup_ngram_jaccard_sample",
    oracle=f"""
WITH sh AS (
  SELECT doc_id, {_DUCKDB_SHINGLES} AS shingles FROM documents WHERE doc_id < 20
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             / (len(a.shingles) + len(b.shingles)
                - len(list_intersect(a.shingles, b.shingles))), 4) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
ORDER BY doc_a, doc_b
""",
    tags=("dedup",),
)
def dedup_ngram_jaccard_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs exact n-gram Jaccard over a bounded sample — the ground
    truth the LSH path approximates (bounded input ⇒ the O(n²) join is
    explicitly safe here; never run this shape unbounded)."""
    v = views(spark, sf_dir)
    sh = _with_shingles(v["documents"].where(F.col("doc_id") < 20))
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect("a.shingles", "b.shingles")).cast("double")
    union = (
        F.size("a.shingles") + F.size("b.shingles")
        - F.size(F.array_intersect("a.shingles", "b.shingles"))
    )
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(inter / union, 4).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


@query("dedup_simhash", oracle=None, tags=("dedup", "simhash", "pandas-udf"))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document via a vectorized Pandas UDF.

    No SQL-expressible oracle (bit-twiddling); correctness is covered by
    property tests (identical docs → identical hash; perturbed docs → small
    Hamming distance) in tests/test_dedup_ops.py."""
    from pyspark.sql import types as T

    def simhash_batches(batches):
        import hashlib

        import pandas as pd

        def one(text: str) -> int:
            acc = [0] * 64
            for tok in text.split():
                h = int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")
                for bit in range(64):
                    acc[bit] += 1 if (h >> bit) & 1 else -1
            out = 0
            for bit in range(64):
                if acc[bit] > 0:
                    out |= 1 << bit
            # wrap to signed 64-bit for Spark LongType
            return out - (1 << 64) if out >= (1 << 63) else out

        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "simhash": pdf["text"].map(one)}
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("simhash", T.LongType()),
        ]
    )
    v = views(spark, sf_dir)
    return (
        v["documents"]
        .select("doc_id", "text")
        .mapInPandas(simhash_batches, schema)
        .orderBy("doc_id")
    )


@query(
    "dedup_connected_components",
    oracle=f"""
WITH RECURSIVE sh AS (
  SELECT doc_id, {_DUCKDB_SHINGLES} AS shingles FROM documents WHERE doc_id < 1000
),
pairs AS (
  SELECT a.doc_id AS pa, b.doc_id AS pb
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        / (len(a.shingles) + len(b.shingles)
           - len(list_intersect(a.shingles, b.shingles))) >= 0.15
),
edges AS (
  SELECT pa AS src, pb AS dst FROM pairs
  UNION ALL
  SELECT pb AS src, pa AS dst FROM pairs
),
reach(root, node) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT r.root, e.dst FROM reach r JOIN edges e ON r.node = e.src
)
SELECT doc_id, component_id,
       COUNT(*) OVER (PARTITION BY component_id) AS component_size
FROM (SELECT root AS doc_id, MIN(node) AS component_id FROM reach GROUP BY root)
ORDER BY doc_id
""",
    tags=("dedup", "iterative"),
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate *clusters*: connected components over the pair graph,
    by iterative min-label propagation to a fixpoint.

    Pairs only say "a matches b"; dedup needs the transitive closure (keep
    one doc per CLUSTER).  Each iteration joins current labels across edges
    and takes the per-node min; convergence in O(diameter) rounds.  This is
    the DataFrame formulation of large-scale connected components (cf.
    alternating large-star/small-star) — every step is a shuffle-join, no
    driver-side graph.  The DuckDB oracle computes the same closure with a
    recursive CTE.  Edge source here is bounded exact-Jaccard; at scale the
    LSH candidate join (dedup_minhash_candidate_pairs) produces the edges —
    the component loop is unchanged."""
    v = views(spark, sf_dir)
    sh = _with_shingles(v["documents"].where(F.col("doc_id") < 1000))
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect("a.shingles", "b.shingles")).cast("double")
    union = (
        F.size("a.shingles") + F.size("b.shingles")
        - F.size(F.array_intersect("a.shingles", "b.shingles"))
    )
    pairs = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .where(inter / union >= 0.15)
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    return _components_output(pairs)


@query(
    "dedup_cluster_pipeline",
    oracle=f"""
WITH RECURSIVE {_DUCKDB_LSH_PAIR_CTES},
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
reach(root, node) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT r.root, e.dst FROM reach r JOIN edges e ON r.node = e.src
)
SELECT doc_id, component_id,
       COUNT(*) OVER (PARTITION BY component_id) AS component_size
FROM (SELECT root AS doc_id, MIN(node) AS component_id FROM reach GROUP BY root)
ORDER BY doc_id
""",
    tags=("dedup", "minhash", "iterative", "bench"),
)
def dedup_cluster_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION near-dup clustering path, end to end: MinHash LSH
    band-join candidates → exact-Jaccard verification (>= 0.2) → connected
    components by min-label propagation → (doc_id, component_id,
    component_size).

    This is the composition a 100 TB dedup actually runs: the edge list
    comes from the bucketed LSH join (never an all-pairs join — contrast
    dedup_connected_components, the bounded ground-truth variant), and the
    CC loop's per-iteration shuffles operate on the pair graph, which is
    orders of magnitude smaller than the corpus.  Benchmarked so both the
    LSH join and the iterative loop have wall-clock numbers."""
    pairs = _lsh_verified_pairs(spark, sf_dir, threshold=0.2).select(
        "doc_a", "doc_b"
    )
    return _components_output(pairs)


def _min_label_components(edges: DataFrame) -> DataFrame:
    """(node, lbl) — connected-component labels over a directed edge list by
    iterative min-label propagation to a fixpoint (DataFrame formulation of
    large-scale CC, cf. alternating large-star/small-star: every step is a
    shuffle-join, no driver-side graph; one count() action per iteration is
    the fixpoint check)."""
    edges = edges.cache()

    # min-label propagation: label(v) <- min(label(v), min over neighbors)
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    ).cache()
    cached = labels
    while True:
        nbr_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        # Carry the pre-step label through the projection so the fixpoint
        # check is a filter over the already-materialized step, not a second
        # node-keyed join per iteration.
        stepped = (
            labels.join(nbr_min, labels["node"] == nbr_min["src"], "left")
            .select(
                "node",
                F.col("lbl").alias("old_lbl"),
                F.least(F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))).alias("lbl"),
            )
            .cache()
        )
        changed = stepped.where(F.col("lbl") != F.col("old_lbl")).count()
        cached.unpersist()
        cached = stepped
        labels = stepped.select("node", "lbl")
        if changed == 0:
            break
    edges.unpersist()
    return labels


def _components_output(pairs: DataFrame) -> DataFrame:
    """(doc_a, doc_b) undirected pair list → (doc_id, component_id,
    component_size), the dedup-cluster output shape."""
    from pyspark.sql import Window as W

    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(pairs.select(F.col("doc_b"), F.col("doc_a"))).toDF("src", "dst")
    labels = _min_label_components(edges)
    return (
        labels.select(F.col("node").alias("doc_id"), F.col("lbl").alias("component_id"))
        .withColumn(
            "component_size", F.count("*").over(W.partitionBy("component_id"))
        )
        .orderBy("doc_id")
    )


@query("dedup_minhash_signatures_fast", tags=("dedup", "minhash"))
def dedup_minhash_signatures_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-speed MinHash: xxhash64 instead of md5 for the
    Carter-Wegman family — same plan shape as dedup_minhash_signatures,
    measured ~1.3x faster end-to-end at 8x sf0.1 (hashing is cheaper;
    shingle construction now dominates).

    No SQL oracle: DuckDB's hash() is a different function family, so
    signatures are engine-specific by construction (rows-only check).  Use
    THIS variant at 100 TB; the md5 variant exists to let the oracle verify
    the algorithm end-to-end."""
    v = views(spark, sf_dir)
    sh = _with_shingles(v["documents"])
    h = sh.select(
        "doc_id",
        F.expr(
            # mask to 56 bits so h1 + k*(2*h2+1) stays inside int64 under
            # ANSI arithmetic (same range as the md5 variant's hex halves)
            "transform(shingles, x -> named_struct("
            "'h1', xxhash64(x) & 72057594037927935L, "
            "'h2', (xxhash64(x, 1) & 72057594037927935L) * 2 + 1))"
        ).alias("h12"),
    )
    mh = h.select("doc_id", *_minhash_cols_spark())
    return mh.select("doc_id", *_band_cols_spark()).orderBy("doc_id")
