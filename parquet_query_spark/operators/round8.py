"""Round-8 operators: embedding-geometry diagnostics (TwoNN intrinsic
dimension, hubness), corpus drift/quality profiling (daily KL drift,
length bands, term burstiness), and training-data scheduling (two-phase
annealing mix, deterministic epoch shuffle).

Parity model: the reference (dotted-ai/parquet-query) delegates all SQL
to DuckDB-WASM (src/duckdb.ts:46-49), so every operator here carries a
DuckDB oracle and is verified by the differential harness.

Determinism contract (same as round7): exact BIGINT counts feed
identical doubles into both engines; every float output takes one final
round; every ranking has a unique tie-break key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from parquet_query_spark.operators.catalog import query, views

# Shared vector math (same promotion contract as similarity.py: all
# arithmetic on DOUBLE after an explicit cast from float, so Spark and
# DuckDB hash-match).  Distances are ROUNDED to 6dp before any ranking
# or ratio so both engines rank identical values.

_SPARK_SQDIST = (
    "round(aggregate(zip_with(qv, ev, (x, y) -> "
    "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v), 6)"
)

_DUCKDB_SQDIST = """
round(list_sum(list_transform(list_zip(qv, ev), p ->
  (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
  * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), 6)
"""

_SPARK_COSINE = (
    "round(aggregate(zip_with(qv, ev, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) "
    "/ (sqrt(aggregate(qv, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) "
    "* sqrt(aggregate(ev, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))), 6)"
)

_DUCKDB_COSINE = """
round(
  list_sum(list_transform(list_zip(qv, ev), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
  / (sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
     * sqrt(list_sum(list_transform(ev, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
"""

# Word tokenizer shared with text.py's distribution operators.
_TOKEN_RE = "[^a-z0-9]+"


def _fan_out(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Small files arrive row-group-bounded; spread the compute-bound
    pair-scoring stage over all cores (same guard as similarity.py:95)."""
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# ── embedding_intrinsic_dim_twonn ────────────────────────────────────────


@query(
    "embedding_intrinsic_dim_twonn",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qv, label
  FROM embeddings WHERE vec_id % 10 = 0 AND vec_id < 5000
),
pairs AS (
  SELECT q.qid, q.label, e.vec_id AS nid, {_DUCKDB_SQDIST} AS d
  FROM q CROSS JOIN (SELECT vec_id, embedding AS ev FROM embeddings) e
  WHERE e.vec_id <> q.qid
),
ranked AS (
  SELECT qid, label, d,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d, nid) AS rnk
  FROM pairs WHERE d > 0
),
two AS (
  SELECT qid, label,
         MIN(CASE WHEN rnk = 1 THEN d END) AS d1,
         MIN(CASE WHEN rnk = 2 THEN d END) AS d2
  FROM ranked WHERE rnk <= 2 GROUP BY qid, label
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       round(SUM(0.5 * ln(d2 / d1)), 4) AS sum_log_ratio,
       round(COUNT(*) / nullif(SUM(0.5 * ln(d2 / d1)), 0), 2) AS intrinsic_dim
FROM two WHERE d2 IS NOT NULL
GROUP BY label ORDER BY label
""",
    tags=("embedding", "similarity", "profile"),
)
def embedding_intrinsic_dim_twonn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TwoNN intrinsic-dimension estimate per label (Facco et al. 2017):
    for each sampled point the ratio of its 2nd to 1st nearest-neighbor
    distance mu = d2/d1 follows a Pareto with shape = the data's
    intrinsic dimension, so id = n / sum(ln mu).  Squared distances are
    used (ln ratio halved) to skip the sqrt.  Low-ID labels are
    structured (near-duplicates, templated text); embedding curation
    uses this to pick compression/index parameters.

    Determinism: distances round to 6dp before ranking and the ratio;
    zero-distance duplicates are discarded (standard TwoNN), points
    without two distinct-distance neighbors drop out.

    Scale shape: deterministic BOUNDED query sample (`vec_id % 10` capped
    at 500 points — the estimator converges on a fixed-size sample, so
    cost stays O(sample x corpus), one corpus scan, never quadratic)
    against a full corpus scan — same guarded fan-out + two-phase bounded
    top-k as knn_bruteforce (similarity.py:95); production would swap the
    exact scan for IVF candidates (ann_ivf_cosine) without touching the
    estimator."""
    v = views(spark, sf_dir)
    emb = v["embeddings"]
    q = emb.where((F.col("vec_id") % 10 == 0) & (F.col("vec_id") < 5000)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"), "label"
    )
    e = _fan_out(
        spark, emb.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("ev"))
    )
    pairs = (
        e.crossJoin(F.broadcast(q))
        .where(F.col("nid") != F.col("qid"))
        .select("qid", "label", "nid", F.expr(_SPARK_SQDIST).alias("d"))
        .where(F.col("d") > 0)
    )
    # two-phase bounded top-k: per-partition top-2 first, then global
    pid = F.spark_partition_id().alias("pid")
    w_part = Window.partitionBy("qid", "pid").orderBy("d", "nid")
    partial = (
        pairs.select("qid", "label", "nid", "d", pid)
        .withColumn("prnk", F.row_number().over(w_part))
        .where(F.col("prnk") <= 2)
    )
    w = Window.partitionBy("qid").orderBy("d", "nid")
    two = (
        partial.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 2)
        .groupBy("qid", "label")
        .agg(
            F.min(F.when(F.col("rnk") == 1, F.col("d"))).alias("d1"),
            F.min(F.when(F.col("rnk") == 2, F.col("d"))).alias("d2"),
        )
        .where(F.col("d2").isNotNull())
    )
    log_ratio = 0.5 * F.log(F.col("d2") / F.col("d1"))
    return (
        two.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_points"),
            F.round(F.sum(log_ratio), 4).alias("sum_log_ratio"),
            F.round(
                F.count("*") / F.nullif(F.sum(log_ratio), F.lit(0.0)), 2
            ).alias("intrinsic_dim"),
        )
        .orderBy("label")
    )


# ── embedding_hubness_kocc ───────────────────────────────────────────────


@query(
    "embedding_hubness_kocc",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qv
  FROM embeddings WHERE vec_id % 10 = 0 AND vec_id < 5000
),
scored AS (
  SELECT q.qid, e.vec_id AS nid, {_DUCKDB_COSINE} AS cosine
  FROM q CROSS JOIN (SELECT vec_id, embedding AS ev FROM embeddings) e
  WHERE e.vec_id <> q.qid
),
top5 AS (
  SELECT qid, nid FROM (
    SELECT qid, nid,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rnk
    FROM scored
  ) WHERE rnk <= 5
),
kocc AS (
  SELECT nid, CAST(COUNT(*) AS BIGINT) AS k_occurrences
  FROM top5 GROUP BY nid
),
by_vec AS (
  SELECT e.label, coalesce(k.k_occurrences, 0) AS kocc
  FROM embeddings e LEFT JOIN kocc k ON e.vec_id = k.nid
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(SUM(CASE WHEN kocc = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_antihubs,
       CAST(MAX(kocc) AS BIGINT) AS max_kocc,
       round(AVG(CAST(kocc AS DOUBLE)), 4) AS avg_kocc
FROM by_vec GROUP BY label ORDER BY label
""",
    tags=("embedding", "similarity", "profile"),
)
def embedding_hubness_kocc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-occurrence hubness profile per label: how often each vector
    appears in the top-5 neighbor lists of the sampled query set.  High
    max_kocc = hub vectors that dominate retrieval (a known
    high-dimensional pathology that biases near-dup mining and RAG
    retrieval); n_antihubs = vectors never retrieved.

    Scale shape: identical pair-scoring skeleton to the TwoNN operator
    (guarded fan-out, bounded two-phase top-k); the k-occurrence count is
    a hash aggregation on vec_id, and the final join back to labels is
    corpus-scan-shaped."""
    v = views(spark, sf_dir)
    emb = v["embeddings"]
    q = emb.where((F.col("vec_id") % 10 == 0) & (F.col("vec_id") < 5000)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    e = _fan_out(
        spark, emb.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("ev"))
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .where(F.col("nid") != F.col("qid"))
        .select("qid", "nid", F.expr(_SPARK_COSINE).alias("cosine"))
    )
    pid = F.spark_partition_id().alias("pid")
    w_part = Window.partitionBy("qid", "pid").orderBy(F.desc("cosine"), F.asc("nid"))
    partial = (
        scored.select("qid", "nid", "cosine", pid)
        .withColumn("prnk", F.row_number().over(w_part))
        .where(F.col("prnk") <= 5)
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    top5 = (
        partial.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select("qid", "nid")
    )
    kocc = top5.groupBy("nid").agg(F.count("*").cast("bigint").alias("k_occurrences"))
    by_vec = emb.join(kocc, emb["vec_id"] == kocc["nid"], "left").select(
        "label", F.coalesce(F.col("k_occurrences"), F.lit(0)).alias("kocc")
    )
    return (
        by_vec.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_vectors"),
            F.sum(F.when(F.col("kocc") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_antihubs"),
            F.max("kocc").cast("bigint").alias("max_kocc"),
            F.round(F.avg(F.col("kocc").cast("double")), 4).alias("avg_kocc"),
        )
        .orderBy("label")
    )


# ── events_kl_drift_daily ────────────────────────────────────────────────


@query(
    "events_kl_drift_daily",
    oracle="""
WITH c AS (
  SELECT CAST(ts AS DATE) AS day, event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
grid AS (
  SELECT d.day, t.event_type, coalesce(c.c, 0) AS c
  FROM (SELECT DISTINCT day FROM c) d
  CROSS JOIN (SELECT DISTINCT event_type FROM c) t
  LEFT JOIN c ON c.day = d.day AND c.event_type = t.event_type
),
probs AS (
  SELECT day, event_type,
         CAST(c + 1 AS DOUBLE)
           / (SUM(c) OVER (PARTITION BY day) + COUNT(*) OVER (PARTITION BY day))
           AS p
  FROM grid
)
SELECT a.day,
       round(SUM(a.p * ln(a.p / b.p)), 4) AS kl_nats
FROM probs a
JOIN probs b ON b.day = a.day - INTERVAL 1 DAY AND b.event_type = a.event_type
GROUP BY a.day
ORDER BY a.day
""",
    tags=("events", "drift", "aggregate"),
)
def events_kl_drift_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day KL divergence of the event-type mix — the
    distribution-drift alarm a streaming ingest pipeline runs on every
    slice key.  Add-one smoothing over the full day x type grid keeps
    both distributions strictly positive, so the divergence is finite
    even when a type disappears for a day.

    Determinism: exact BIGINT counts feed identical doubles into the
    same ln terms; one round at 4dp absorbs summation-order ulps (same
    contract as text_js_divergence_by_source).

    Scale shape: the (day, type) count is one map-side-combined
    aggregation; the grid is |days| x |types| (tiny — both dimensions
    are bounded); the prev-day self-join runs on the grid, not the
    events."""
    v = views(spark, sf_dir)
    c = (
        v["events"]
        .select(F.col("ts").cast("date").alias("day"), "event_type")
        .groupBy("day", "event_type")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    days = c.select("day").distinct()
    types = c.select("event_type").distinct()
    grid = (
        days.crossJoin(F.broadcast(types))
        .join(c, ["day", "event_type"], "left")
        .select("day", "event_type", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )
    wd = Window.partitionBy("day")
    probs = grid.select(
        "day",
        "event_type",
        (
            (F.col("c") + 1).cast("double")
            / (F.sum("c").over(wd) + F.count("*").over(wd))
        ).alias("p"),
    )
    a = probs.alias("a")
    # the grid is |days| x |types| — broadcast the prev-day side so the
    # self-join never sort-merges (both sides are bounded, not data-sized)
    b = F.broadcast(probs.alias("b"))
    return (
        a.join(
            b,
            (F.col("b.day") == F.date_sub(F.col("a.day"), 1))
            & (F.col("b.event_type") == F.col("a.event_type")),
        )
        .groupBy(F.col("a.day").alias("day"))
        .agg(
            F.round(F.sum(F.col("a.p") * F.log(F.col("a.p") / F.col("b.p"))), 4).alias(
                "kl_nats"
            )
        )
        .orderBy("day")
    )


# ── docs_length_band_profile ─────────────────────────────────────────────


@query(
    "docs_length_band_profile",
    oracle="""
WITH banded AS (
  SELECT source, n_chars,
         length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 AS toks,
         NTILE(10) OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS band
  FROM documents
)
SELECT source, CAST(band AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars,
       round(AVG(CAST(toks AS DOUBLE)), 2) AS avg_tokens
FROM banded GROUP BY source, band ORDER BY source, band
""",
    tags=("text", "profile"),
)
def docs_length_band_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source decile bands over document length (NTILE on n_chars
    with doc_id tie-break) with per-band size and token stats — the
    length histogram a packing/curriculum stage consumes to pick
    sequence-length buckets.

    Scale shape: the only window partitions by source (bounded
    cardinality, each partition sorts its own slice); token counts are a
    scan-side expression (space count over the single-space synthetic
    text), never a Python row path."""
    v = views(spark, sf_dir)
    toks = (
        F.length(F.trim(F.col("text")))
        - F.length(F.replace(F.trim(F.col("text")), F.lit(" "), F.lit("")))
        + 1
    )
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    banded = v["documents"].select(
        "source",
        "n_chars",
        toks.alias("toks"),
        F.ntile(10).over(w).alias("band"),
    )
    return (
        banded.groupBy("source", F.col("band").cast("bigint").alias("band"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
            F.round(F.avg(F.col("toks").cast("double")), 2).alias("avg_tokens"),
        )
        .orderBy("source", "band")
    )


# ── pipeline_annealing_mix ───────────────────────────────────────────────

_ANNEAL_BUDGET = 1_000_000  # tokens; 90% phase-1 uniform, 10% anneal


@query(
    "pipeline_annealing_mix",
    oracle=f"""
WITH per_source AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(length(trim(text)) - length(replace(trim(text), ' ', '')) + 1)
              AS BIGINT) AS tokens,
         CAST(SUM(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) AS BIGINT) AS n_long
  FROM documents GROUP BY source
),
weighted AS (
  SELECT *,
         0.5 + CAST(n_long AS DOUBLE) / n_docs AS quality_w
  FROM per_source
),
tot AS (
  SELECT CAST(SUM(tokens) AS BIGINT) AS t_all,
         SUM(tokens * quality_w) AS t_weighted
  FROM weighted
)
SELECT source, tokens,
       round(CAST(n_long AS DOUBLE) / n_docs, 4) AS frac_long,
       CAST(round({_ANNEAL_BUDGET} * 0.9 * tokens / t_all) AS BIGINT)
         AS phase1_tokens,
       CAST(round({_ANNEAL_BUDGET} * 0.1 * tokens * quality_w / t_weighted) AS BIGINT)
         AS phase2_tokens,
       round({_ANNEAL_BUDGET} * 0.1 * quality_w / t_weighted, 6) AS phase2_epochs
FROM weighted CROSS JOIN tot
ORDER BY source
""",
    tags=("pipeline", "mixing"),
)
def pipeline_annealing_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase training-mix schedule (pretrain + anneal): phase 1
    allocates 90% of the token budget proportional to each source's raw
    token share; phase 2 (the anneal) re-weights by a quality factor
    (0.5 + fraction of long documents), upsampling high-quality sources
    — the schedule shape used by data-mixture annealing recipes.
    phase2_epochs = passes over the source the anneal allocation
    implies (sampling rate sanity check: >1 means repetition).

    Scale shape: one map-side-combined per-source aggregation; the
    budget math runs on |sources| rows against a broadcast 1-row total."""
    v = views(spark, sf_dir)
    toks = (
        F.length(F.trim(F.col("text")))
        - F.length(F.replace(F.trim(F.col("text")), F.lit(" "), F.lit("")))
        + 1
    )
    per_source = v["documents"].groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(toks).cast("bigint").alias("tokens"),
        F.sum(F.when(F.col("n_chars") >= 300, 1).otherwise(0))
        .cast("bigint")
        .alias("n_long"),
    )
    weighted = per_source.withColumn(
        "quality_w", F.lit(0.5) + F.col("n_long").cast("double") / F.col("n_docs")
    )
    tot = weighted.agg(
        F.sum("tokens").cast("bigint").alias("t_all"),
        F.sum(F.col("tokens") * F.col("quality_w")).alias("t_weighted"),
    )
    b = float(_ANNEAL_BUDGET)
    return (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "tokens",
            F.round(F.col("n_long").cast("double") / F.col("n_docs"), 4).alias(
                "frac_long"
            ),
            F.round(b * 0.9 * F.col("tokens") / F.col("t_all"))
            .cast("bigint")
            .alias("phase1_tokens"),
            F.round(b * 0.1 * F.col("tokens") * F.col("quality_w") / F.col("t_weighted"))
            .cast("bigint")
            .alias("phase2_tokens"),
            F.round(b * 0.1 * F.col("quality_w") / F.col("t_weighted"), 6).alias(
                "phase2_epochs"
            ),
        )
        .orderBy("source")
    )


# ── pipeline_epoch_shuffle_blocks ────────────────────────────────────────

_SHUF_MOD = 2147483647  # 2^31 - 1 (Park-Miller modulus)
_SHUF_MULT = 48271
_SHUF_EPOCH = 8191
_N_SHARDS = 16


@query(
    "pipeline_epoch_shuffle_blocks",
    oracle=f"""
WITH keyed AS (
  SELECT e.epoch, d.doc_id,
         (d.doc_id * {_SHUF_MULT} + e.epoch * {_SHUF_EPOCH}) % {_SHUF_MOD} AS k
  FROM documents d
  CROSS JOIN (SELECT unnest([0, 1, 2]) AS epoch) e
),
placed AS (
  SELECT epoch, doc_id, k % {_N_SHARDS} AS shard,
         ROW_NUMBER() OVER (PARTITION BY epoch, k % {_N_SHARDS}
                            ORDER BY k, doc_id) AS pos
  FROM keyed
)
SELECT CAST(epoch AS BIGINT) AS epoch, CAST(shard AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(pos * doc_id) AS BIGINT) AS order_checksum
FROM placed GROUP BY epoch, shard ORDER BY epoch, shard
""",
    tags=("pipeline", "shuffle"),
)
def pipeline_epoch_shuffle_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch corpus shuffle: every (doc, epoch) gets a
    Park-Miller-style key (doc_id * 48271 + epoch * 8191 mod 2^31-1),
    docs land in key-mod-16 shards and are ordered by key within the
    shard — the reshuffle-per-epoch a dataloader needs, reproducible
    from (doc_id, epoch) alone with no stored permutation.  The
    order_checksum (sum of position x doc_id) pins the exact within-
    shard order cross-engine, and differs across epochs (the point).

    Scale shape: keys are scan-side integer arithmetic (no overflow:
    doc_id * 48271 fits BIGINT to ~1.9e14 docs); the only window
    partitions by (epoch, shard) — at production scale shard count
    scales with the corpus, keeping partitions executor-sized."""
    v = views(spark, sf_dir)
    epochs = spark.range(3).select(F.col("id").alias("epoch"))
    keyed = (
        v["documents"]
        .select("doc_id")
        .crossJoin(F.broadcast(epochs))
        .select(
            "epoch",
            "doc_id",
            (
                (F.col("doc_id") * _SHUF_MULT + F.col("epoch") * _SHUF_EPOCH)
                % _SHUF_MOD
            ).alias("k"),
        )
    )
    placed = keyed.select(
        "epoch", "doc_id", "k", (F.col("k") % _N_SHARDS).alias("shard")
    ).withColumn(
        "pos",
        F.row_number().over(
            Window.partitionBy("epoch", "shard").orderBy("k", "doc_id")
        ),
    )
    return (
        placed.groupBy(
            F.col("epoch").cast("bigint").alias("epoch"),
            F.col("shard").cast("bigint").alias("shard"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.col("pos") * F.col("doc_id")).cast("bigint").alias(
                "order_checksum"
            ),
        )
        .orderBy("epoch", "shard")
    )


# ── text_term_burstiness ─────────────────────────────────────────────────


@query(
    "text_term_burstiness",
    oracle=f"""
WITH w AS (
  SELECT doc_id, unnest(list_filter(
           string_split_regex(lower(text), '{_TOKEN_RE}'), x -> x <> '')) AS word
  FROM documents
),
stats AS (
  SELECT word,
         CAST(COUNT(*) AS BIGINT) AS cf,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM w GROUP BY word
),
d AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
SELECT word, cf, df,
       round(n_docs * (1 - exp(-CAST(cf AS DOUBLE) / n_docs)), 2)
         AS poisson_df,
       round(CAST(cf AS DOUBLE) / df, 4) AS burstiness
FROM stats CROSS JOIN d
ORDER BY cf DESC, word LIMIT 20
""",
    tags=("text", "profile"),
)
def text_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church-Gale term burstiness for the top-20 terms: observed doc
    frequency vs the Poisson expectation D*(1-exp(-cf/D)) given the
    collection frequency.  Bursty terms (df far below poisson_df,
    burstiness = cf/df high) concentrate in few documents — topical
    words; non-bursty terms spread evenly — function words.  Quality
    filters use this to separate boilerplate vocab from content vocab.

    Determinism: cf/df are exact BIGINT counts; exp/div run on identical
    doubles in both engines with one final round; top-20 orders by
    (cf DESC, word) — a total order.

    Scale shape: the word stats are one map-side-combined aggregation
    over the exploded token stream (COUNT DISTINCT doc_id is a two-level
    hash agg on (word, doc_id) first); the top-20 is a
    TakeOrderedAndProject, never a global sort."""
    v = views(spark, sf_dir)
    w = v["documents"].select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), _TOKEN_RE), lambda x: x != ""
            )
        ).alias("word"),
    )
    stats = w.groupBy("word").agg(
        F.count("*").cast("bigint").alias("cf"),
        F.countDistinct("doc_id").cast("bigint").alias("df"),
    )
    d = v["documents"].agg(F.count("*").cast("bigint").alias("n_docs"))
    return (
        stats.crossJoin(F.broadcast(d))
        .select(
            "word",
            "cf",
            "df",
            F.round(
                F.col("n_docs")
                * (1 - F.exp(-F.col("cf").cast("double") / F.col("n_docs"))),
                2,
            ).alias("poisson_df"),
            F.round(F.col("cf").cast("double") / F.col("df"), 4).alias("burstiness"),
        )
        .orderBy(F.desc("cf"), F.asc("word"))
        .limit(20)
    )


# ── customers_repeat_survival_km ─────────────────────────────────────────

_KM_GRID_WEEKS = list(range(4, 53, 4))  # 4, 8, ..., 52


@query(
    "customers_repeat_survival_km",
    oracle=f"""
WITH ranked AS (
  SELECT o_custkey,
         o_orderdate,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
),
mx AS (SELECT max(o_orderdate) AS max_d FROM orders),
dur AS (
  SELECT c.c_mktsegment AS segment,
         CAST(floor(datediff('day', f.o_orderdate,
                             coalesce(s.o_orderdate, mx.max_d)) / 7)
              AS BIGINT) AS w,
         CASE WHEN s.o_custkey IS NULL THEN 0 ELSE 1 END AS event
  FROM (SELECT * FROM ranked WHERE rn = 1) f
  LEFT JOIN (SELECT * FROM ranked WHERE rn = 2) s
         ON s.o_custkey = f.o_custkey
  JOIN customer c ON c.c_custkey = f.o_custkey
  CROSS JOIN mx
),
wk AS (
  SELECT segment, w,
         CAST(SUM(event) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS c_all
  FROM dur GROUP BY segment, w
),
tot AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n FROM dur GROUP BY segment),
curve0 AS (
  SELECT wk.segment, wk.w, wk.d,
         tot.n - SUM(wk.c_all) OVER (PARTITION BY wk.segment ORDER BY wk.w)
           + wk.c_all AS at_risk
  FROM wk JOIN tot ON tot.segment = wk.segment
),
curve AS (
  SELECT segment, w,
         SUM(CASE WHEN d > 0 THEN
               ln(greatest(1.0 - CAST(d AS DOUBLE) / at_risk, 1e-12))
             ELSE 0.0 END)
           OVER (PARTITION BY segment ORDER BY w) AS cum_ln,
         SUM(d) OVER (PARTITION BY segment ORDER BY w) AS cum_events
  FROM curve0
),
grid AS (SELECT unnest([{', '.join(str(t) for t in _KM_GRID_WEEKS)}]) AS t_weeks),
best AS (
  SELECT g.t_weeks, c.segment, c.cum_ln, c.cum_events,
         ROW_NUMBER() OVER (PARTITION BY c.segment, g.t_weeks
                            ORDER BY c.w DESC) AS rn
  FROM grid g JOIN curve c ON c.w <= g.t_weeks
)
SELECT segment, CAST(t_weeks AS BIGINT) AS t_weeks,
       CAST(cum_events AS BIGINT) AS cum_events,
       round(exp(cum_ln), 4) AS survival
FROM best WHERE rn = 1
ORDER BY segment, t_weeks
""",
    tags=("orders", "stats"),
)
def customers_repeat_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier curve of time-to-repeat-purchase per market segment:
    customers enter at their first order, the event is the second order,
    one-order customers are right-censored at the dataset end — the
    churn-analysis staple done properly (naive repeat-rate ignores
    censoring and biases every recent cohort down).  Survival at week t
    is the product over event weeks u <= t of (1 - d_u / n_u), computed
    as exp of a running ln-sum.

    Determinism: d/n are ratios of exact BIGINT counts; the running sum
    accumulates in week order on both engines (window ORDER BY w); one
    round at 4dp absorbs ulps.  The 1e-12 clamp keeps ln finite when a
    risk set collapses (Spark ln(0) is NULL, DuckDB -inf — the clamp
    makes both produce survival 0.0).

    Scale shape: the per-customer first/second order is one window over
    the custkey shuffle; everything after runs on the (segment, week)
    rollup — bounded by segments x horizon weeks, never order-sized.
    The grid join broadcasts 13 rows."""
    v = views(spark, sf_dir)
    w_rank = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = v["orders"].select(
        "o_custkey", "o_orderdate", F.row_number().over(w_rank).alias("rn")
    )
    first = ranked.where("rn = 1").select(
        F.col("o_custkey").alias("ck"), F.col("o_orderdate").alias("d1")
    )
    second = ranked.where("rn = 2").select(
        F.col("o_custkey").alias("ck2"), F.col("o_orderdate").alias("d2")
    )
    mx = v["orders"].agg(F.max("o_orderdate").alias("max_d"))
    seg = v["customer"].select(
        F.col("c_custkey").alias("ck"), F.col("c_mktsegment").alias("segment")
    )
    dur = (
        first.join(second, first["ck"] == second["ck2"], "left")
        .crossJoin(F.broadcast(mx))
        .join(F.broadcast(seg), "ck")
        .select(
            "segment",
            F.floor(
                F.datediff(F.coalesce(F.col("d2"), F.col("max_d")), F.col("d1")) / 7
            )
            .cast("bigint")
            .alias("w"),
            F.when(F.col("d2").isNotNull(), 1).otherwise(0).alias("event"),
        )
    )
    wk = dur.groupBy("segment", "w").agg(
        F.sum("event").cast("bigint").alias("d"),
        F.count("*").cast("bigint").alias("c_all"),
    )
    tot = dur.groupBy("segment").agg(F.count("*").cast("bigint").alias("n"))
    w_cum = Window.partitionBy("segment").orderBy("w")
    curve0 = wk.join(F.broadcast(tot), "segment").select(
        "segment",
        "w",
        "d",
        (F.col("n") - F.sum("c_all").over(w_cum) + F.col("c_all")).alias("at_risk"),
    )
    ln_term = F.when(
        F.col("d") > 0,
        F.log(
            F.greatest(
                1.0 - F.col("d").cast("double") / F.col("at_risk"), F.lit(1e-12)
            )
        ),
    ).otherwise(0.0)
    curve = curve0.select(
        "segment",
        "w",
        F.sum(ln_term).over(w_cum).alias("cum_ln"),
        F.sum("d").over(w_cum).alias("cum_events"),
    )
    grid = spark.range(1).select(
        F.explode(F.array(*[F.lit(t) for t in _KM_GRID_WEEKS])).alias("t_weeks")
    )
    best = (
        curve.join(F.broadcast(grid), F.col("w") <= F.col("t_weeks"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("segment", "t_weeks").orderBy(F.desc("w"))
            ),
        )
        .where("rn = 1")
    )
    return best.select(
        "segment",
        F.col("t_weeks").cast("bigint").alias("t_weeks"),
        F.col("cum_events").cast("bigint").alias("cum_events"),
        F.round(F.exp("cum_ln"), 4).alias("survival"),
    ).orderBy("segment", "t_weeks")


# ── neardup_label_propagation ────────────────────────────────────────────

_LPA_ROUNDS = 3


def _lpa_oracle() -> str:
    from parquet_query_spark.operators.dedup import _DUCKDB_LSH_PAIR_CTES

    graph_ctes = f"""{_DUCKDB_LSH_PAIR_CTES},
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
nodes AS (SELECT DISTINCT src AS doc_id FROM edges)"""
    rounds = ["l0 AS (SELECT doc_id, doc_id AS label FROM nodes)"]
    for i in range(1, _LPA_ROUNDS + 1):
        rounds.append(
            f"v{i} AS (SELECT e.dst AS doc_id, l.label, "
            f"CAST(COUNT(*) AS BIGINT) AS c "
            f"FROM edges e JOIN l{i - 1} l ON l.doc_id = e.src "
            f"GROUP BY e.dst, l.label), "
            f"l{i} AS (SELECT doc_id, label FROM ("
            f"SELECT doc_id, label, ROW_NUMBER() OVER (PARTITION BY doc_id "
            f"ORDER BY c DESC, label) AS rn FROM v{i}) WHERE rn = 1)"
        )
    return f"""
WITH {graph_ctes},
{','.join(rounds)}
SELECT label AS community, CAST(COUNT(*) AS BIGINT) AS size
FROM l{_LPA_ROUNDS}
GROUP BY label ORDER BY size DESC, community LIMIT 20
"""


@query("neardup_label_propagation", oracle=_lpa_oracle(), tags=("graph", "dedup"))
def neardup_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (3 rounds) over the verified near-dup
    graph: every node starts as its own label; each round it adopts its
    neighbors' most frequent label with a (count DESC, label ASC)
    tie-break — fully deterministic, unlike classic randomized LPA.
    Communities after 3 rounds are denser than connected components
    (which merge through single weak links); sizes ranked top-20.

    Scale shape: each round is one (edge join labels) shuffle + a
    (node, label) count + a per-node arg-max window — the same
    edge-bound per-iteration cost envelope as neardup_pagerank; the
    oracle unrolls the rounds as CTEs exactly like the reference's
    DuckDB delegation would.  Growth note: the 64x sweep measures 330 s
    (slope 1.25) — superlinear in the INPUT because the 64-copy test
    corpus squares every duplicate clique, so the verified-pair EDGE set
    itself explodes by construction (same adjudication as the heavy
    dedup tier in BASELINE.md; dedup_cluster_pipeline runs 148-230 s on
    the same kernel at 64x).  Cost per edge-round is flat; real corpora
    have bounded duplicate rates."""
    from parquet_query_spark.operators.dedup import _lsh_verified_pairs

    verified = _lsh_verified_pairs(spark, sf_dir, 0.2).select("doc_a", "doc_b")
    edges = (
        verified.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionAll(
            verified.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .localCheckpoint()
    )
    labels = edges.select(F.col("src").alias("doc_id")).distinct().select(
        "doc_id", F.col("doc_id").alias("label")
    )
    for _ in range(_LPA_ROUNDS):
        votes = (
            edges.join(labels, edges["src"] == labels["doc_id"])
            .groupBy(edges["dst"].alias("node"), "label")
            .agg(F.count("*").alias("c"))
        )
        w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
        labels = (
            votes.withColumn("rn", F.row_number().over(w))
            .where("rn = 1")
            .select(F.col("node").alias("doc_id"), "label")
            .localCheckpoint()
        )
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(F.count("*").cast("bigint").alias("size"))
        .orderBy(F.desc("size"), F.asc("community"))
        .limit(20)
    )


# ── events_markov_entropy_rate ───────────────────────────────────────────


@query(
    "events_markov_entropy_rate",
    oracle="""
WITH seq AS (
  SELECT event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
c AS (
  SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
),
rowtot AS (
  SELECT prev_type, CAST(SUM(n) AS BIGINT) AS nt FROM c GROUP BY prev_type
),
alltot AS (SELECT CAST(SUM(n) AS BIGINT) AS g FROM c),
h AS (
  SELECT c.prev_type, rowtot.nt,
         SUM(- (CAST(c.n AS DOUBLE) / rowtot.nt)
             * log2(CAST(c.n AS DOUBLE) / rowtot.nt)) AS hbits
  FROM c JOIN rowtot ON rowtot.prev_type = c.prev_type
  GROUP BY c.prev_type, rowtot.nt
)
SELECT h.prev_type,
       h.nt AS n_from,
       round(CAST(h.nt AS DOUBLE) / alltot.g, 4) AS stationary_share,
       round(h.hbits, 4) AS cond_entropy_bits,
       round((CAST(h.nt AS DOUBLE) / alltot.g) * h.hbits, 4)
         AS rate_contrib_bits
FROM h CROSS JOIN alltot
ORDER BY h.prev_type
""",
    tags=("events", "stats"),
)
def events_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the per-user event stream under its own first-order
    Markov model: conditional next-event entropy per source state plus
    its stationary-weighted contribution (summing the last column gives
    the chain's entropy rate in bits/event).  Low-entropy states =
    predictable flows (funnels, bots); the per-state decomposition says
    WHERE the predictability lives — the sequence-compressibility signal
    behind behavioral anomaly scoring.

    Determinism: every probability is a ratio of exact BIGINT transition
    counts — identical doubles into log2 on both engines, one final
    round per column (same contract as events_hourly_entropy).

    Scale shape: one user_id window shuffle orders the streams; all the
    entropy math runs on the |types|^2 transition matrix."""
    v = views(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = v["events"].select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    c = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    rowtot = c.groupBy("prev_type").agg(F.sum("n").cast("bigint").alias("nt"))
    alltot = c.agg(F.sum("n").cast("bigint").alias("g"))
    p = F.col("n").cast("double") / F.col("nt")
    h = (
        c.join(F.broadcast(rowtot), "prev_type")
        .groupBy("prev_type", "nt")
        .agg(F.sum(-p * F.log2(p)).alias("hbits"))
    )
    share = F.col("nt").cast("double") / F.col("g")
    return (
        h.crossJoin(F.broadcast(alltot))
        .select(
            "prev_type",
            F.col("nt").alias("n_from"),
            F.round(share, 4).alias("stationary_share"),
            F.round(F.col("hbits"), 4).alias("cond_entropy_bits"),
            F.round(share * F.col("hbits"), 4).alias("rate_contrib_bits"),
        )
        .orderBy("prev_type")
    )


# ── embedding_kmeans_silhouette ──────────────────────────────────────────


def _silhouette_oracle() -> str:
    from parquet_query_spark.operators.similarity import (
        _KM_UPDATES,
        _km_oracle_ctes,
    )

    u = _KM_UPDATES
    return f"""
WITH {_km_oracle_ctes()},
two AS (
  SELECT vec_id, cid, dist2, rnk FROM (
    SELECT vec_id, cid, dist2,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rnk
    FROM s{u}
  ) WHERE rnk <= 2
),
pt AS (
  SELECT t1.vec_id, t1.cid AS cluster,
         round((sqrt(t2.dist2) - sqrt(t1.dist2))
               / greatest(greatest(sqrt(t1.dist2), sqrt(t2.dist2)), 1e-12),
               4) AS sil
  FROM (SELECT * FROM two WHERE rnk = 1) t1
  JOIN (SELECT * FROM two WHERE rnk = 2) t2 USING (vec_id)
)
SELECT CAST(cluster AS BIGINT) AS cluster,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       round(AVG(sil), 4) AS mean_silhouette,
       round(MIN(sil), 4) AS worst_silhouette
FROM pt GROUP BY cluster ORDER BY cluster
"""


@query(
    "embedding_kmeans_silhouette",
    oracle=_silhouette_oracle(),
    tags=("similarity", "clustering", "profile"),
)
def embedding_kmeans_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid-based (simplified/medoid-free) silhouette per k-means
    cluster: for each point a = distance to its own centroid, b =
    distance to the nearest OTHER centroid, s = (b - a) / max(a, b) —
    the clustering-QA score that says which IVF cells are well-separated
    and which should be split/merged, without the O(n^2) pairwise
    silhouette.

    Reuses the exact deterministic Lloyd state of kmeans_embeddings
    (similarity.py: same init, same update count), so the clusters
    scored here are literally the catalog's clusters.

    Scale shape: centroids are K x dim literals folded scan-side (no
    join, no shuffle — same trick as _km_assign); the only aggregation
    is the K-row rollup.  The one driver transfer is the K x dim
    centroid collect per Lloyd round, identical to kmeans_embeddings."""
    from parquet_query_spark.operators.similarity import (
        _KM_K,
        _KM_UPDATES,
        _as_double,
        _km_assign,
        _km_cent_lit,
        _km_update_rows,
    )

    v = views(spark, sf_dir)
    emb = v["embeddings"].select("vec_id", _as_double("embedding").alias("ev"))
    cents = sorted(
        (r.cid, list(r.c))
        for r in emb.where(F.col("vec_id") < _KM_K)
        .select(F.col("vec_id").alias("cid"), F.col("ev").alias("c"))
        .collect()
    )
    assign = _km_assign(emb, cents)
    for _ in range(_KM_UPDATES):
        cents = _km_update_rows(assign)
        assign = _km_assign(emb, cents)
    # per-point distances to the two nearest FINAL centroids, scan-side
    best2 = F.expr(
        """
        slice(array_sort(transform(_cents, ct -> named_struct(
          'dist2', round(aggregate(zip_with(ev, ct.c, (x, y) -> (x - y) * (x - y)),
                                   CAST(0.0 AS DOUBLE), (a, v) -> a + v), 6),
          'cid', ct.cid))), 1, 2)
        """
    )
    pt = (
        emb.withColumn("_cents", _km_cent_lit(cents))
        .withColumn("_b2", best2)
        .select(
            F.col("_b2")[0]["cid"].alias("cluster"),
            F.sqrt(F.col("_b2")[0]["dist2"]).alias("a"),
            F.sqrt(F.col("_b2")[1]["dist2"]).alias("b"),
        )
        .select(
            "cluster",
            F.round(
                (F.col("b") - F.col("a"))
                / F.greatest(F.greatest(F.col("a"), F.col("b")), F.lit(1e-12)),
                4,
            ).alias("sil"),
        )
    )
    return (
        pt.groupBy(F.col("cluster").cast("bigint").alias("cluster"))
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.round(F.avg("sil"), 4).alias("mean_silhouette"),
            F.round(F.min("sil"), 4).alias("worst_silhouette"),
        )
        .orderBy("cluster")
    )


# ── orders_rfm_migration ─────────────────────────────────────────────────


@query(
    "orders_rfm_migration",
    oracle="""
WITH h1 AS (
  SELECT o_custkey,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders WHERE o_orderdate < DATE '1996-01-01' GROUP BY o_custkey
),
h2 AS (
  SELECT o_custkey,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders WHERE o_orderdate >= DATE '1996-01-01' GROUP BY o_custkey
),
s1 AS (
  SELECT o_custkey,
         CAST(NTILE(5) OVER (ORDER BY cents DESC, o_custkey) AS INTEGER) AS m1
  FROM h1
),
s2 AS (
  SELECT o_custkey,
         CAST(NTILE(5) OVER (ORDER BY cents DESC, o_custkey) AS INTEGER) AS m2
  FROM h2
)
SELECT coalesce(s1.m1, 0) AS m_score_h1,
       coalesce(s2.m2, 0) AS m_score_h2,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM s1 FULL OUTER JOIN s2 ON s1.o_custkey = s2.o_custkey
GROUP BY 1, 2
ORDER BY m_score_h1, m_score_h2
""",
    tags=("analytics", "segmentation", "drift"),
)
def orders_rfm_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monetary-quintile migration matrix between the two halves of the
    order timeline (split at 1996-01-01): how customers move between
    spend quintiles, with score 0 = absent from that half (churned /
    newly acquired) — the segment-drift readout behind retention and
    win-back targeting, complementing the static customers_rfm_segmentation.

    Scale shape: each half reduces to one row per active customer before
    its NTILE window (same discipline and tie-break as the RFM operator);
    the migration matrix itself is at most 6 x 6 rows from one
    customer-keyed full-outer join."""
    from pyspark.sql import Window as W

    v = views(spark, sf_dir)
    o = v["orders"]
    cents = F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents")

    def half(pred):
        return o.where(pred).groupBy("o_custkey").agg(cents)

    cut = F.lit("1996-01-01").cast("date")
    s1 = half(F.col("o_orderdate") < cut).select(
        F.col("o_custkey").alias("ck1"),
        F.ntile(5)
        .over(W.orderBy(F.desc("cents"), F.asc("o_custkey")))
        .cast("int")
        .alias("m1"),
    )
    s2 = half(F.col("o_orderdate") >= cut).select(
        F.col("o_custkey").alias("ck2"),
        F.ntile(5)
        .over(W.orderBy(F.desc("cents"), F.asc("o_custkey")))
        .cast("int")
        .alias("m2"),
    )
    return (
        s1.join(s2, s1["ck1"] == s2["ck2"], "full_outer")
        .select(
            F.coalesce(F.col("m1"), F.lit(0)).alias("m_score_h1"),
            F.coalesce(F.col("m2"), F.lit(0)).alias("m_score_h2"),
        )
        .groupBy("m_score_h1", "m_score_h2")
        .agg(F.count("*").cast("bigint").alias("n_customers"))
        .orderBy("m_score_h1", "m_score_h2")
    )
