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
