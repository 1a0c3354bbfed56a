"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The Spark-side pattern for image/audio/video at 100 TB: the payload is an
opaque ``binary`` column; decode / feature-extract / resize run as
Arrow-batched Pandas UDFs over ``mapInPandas`` so each task touches one
partition's batches and nothing ever lands on the driver.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked deterministic stub (`_fake_decode_meta`) — the Spark plumbing
(binary schema, batch iteration, UDF signature, partition behavior) is real
and tested.  Swapping the stub for PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquet_query_spark.operators.catalog import query, views

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("aspect", T.DoubleType()),
    ]
)


def _fake_decode_meta(payload: bytes) -> tuple[int, int]:
    """STUB decode: deterministic pseudo-dimensions from the payload bytes.

    Stands in for an image decoder (PIL ``Image.open(io.BytesIO(b)).size``).
    Deterministic on content so the DuckDB oracle can reproduce it from the
    source text column.
    """
    first = payload[0] if payload else 0
    width = 64 + (first * 7 + len(payload)) % 1856
    height = 64 + (first * 13 + len(payload) * 3) % 1016
    return width, height


def decode_meta_batches(batches) -> Iterator:
    """mapInPandas worker: binary payloads → metadata rows, batch-at-a-time."""
    import math

    import pandas as pd

    def round_half_up(x: float, nd: int) -> float:
        # SQL ROUND semantics (half away from zero) — Python's round() is
        # banker's rounding and diverges on exact .5 boundaries
        scale = 10**nd
        return math.floor(x * scale + 0.5) / scale

    for pdf in batches:
        dims = pdf["payload"].map(lambda b: _fake_decode_meta(bytes(b)))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "width": dims.map(lambda d: d[0]).astype("int32"),
                "height": dims.map(lambda d: d[1]).astype("int32"),
                "aspect": dims.map(lambda d: round_half_up(d[0] / d[1], 4)),
            }
        )


@query(
    "multimodal_decode_meta",
    oracle="""
SELECT doc_id,
       strlen(text)::INTEGER AS n_bytes,
       (64 + (ascii(substr(text, 1, 1)) * 7 + strlen(text)) % 1856)::INTEGER  AS width,
       (64 + (ascii(substr(text, 1, 1)) * 13 + strlen(text) * 3) % 1016)::INTEGER AS height,
       round(CAST(64 + (ascii(substr(text, 1, 1)) * 7 + strlen(text)) % 1856 AS DOUBLE)
             / (64 + (ascii(substr(text, 1, 1)) * 13 + strlen(text) * 3) % 1016), 4) AS aspect
FROM documents
ORDER BY doc_id
""",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary→metadata extraction over mapInPandas.

    ``documents.text`` is encoded to a binary payload column (standing in
    for image bytes), then decoded batch-wise.  The oracle recomputes the
    stub's arithmetic from the text — proving the binary round-trip and the
    batch plumbing preserve content exactly."""
    v = views(spark, sf_dir)
    media = v["documents"].select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return media.mapInPandas(decode_meta_batches, META_SCHEMA).orderBy("doc_id")


@query("multimodal_frame_sample", oracle=None, tags=("multimodal", "pandas-udf"))
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads.

    Splits each payload into fixed-size "frames" (stub for keyframe
    extraction) and emits one row per sampled frame — demonstrating the
    1→N explode shape of frame sampling with bounded memory per batch.
    Rows-only check (sampling layout is not SQL-expressible)."""
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("frame_bytes", T.IntegerType()),
            T.StructField("frame_digest", T.StringType()),
        ]
    )

    def sample_frames(batches) -> Iterator:
        import hashlib

        FRAME, STRIDE = 64, 3  # 64-byte frames, every 3rd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                frames = [data[i : i + FRAME] for i in range(0, len(data), FRAME)]
                for n, fr in enumerate(frames[::STRIDE]):
                    rows.append(
                        (doc_id, n, len(fr), hashlib.md5(fr).hexdigest())
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_no", "frame_bytes", "frame_digest"]
            ).astype({"frame_no": "int32", "frame_bytes": "int32"})

    v = views(spark, sf_dir)
    media = v["documents"].select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return media.mapInPandas(sample_frames, schema).orderBy("doc_id", "frame_no")


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("src_w", T.IntegerType()),
        T.StructField("src_h", T.IntegerType()),
        T.StructField("dst_w", T.IntegerType()),
        T.StructField("dst_h", T.IntegerType()),
        T.StructField("dst_bytes", T.LongType()),
    ]
)


@query(
    "multimodal_resize_plan",
    oracle="""
WITH meta AS (
  SELECT doc_id,
         64 + (ascii(substr(text, 1, 1)) * 7 + strlen(text)) % 1856  AS w,
         64 + (ascii(substr(text, 1, 1)) * 13 + strlen(text) * 3) % 1016 AS h
  FROM documents
),
scaled AS (
  SELECT doc_id, w, h,
         least(256.0 / w, 256.0 / h, 1.0) AS s
  FROM meta
)
SELECT doc_id, w::INTEGER AS src_w, h::INTEGER AS src_h,
       greatest(1, floor(w * s))::INTEGER AS dst_w,
       greatest(1, floor(h * s))::INTEGER AS dst_h,
       (greatest(1, floor(w * s)) * greatest(1, floor(h * s)) * 3)::BIGINT AS dst_bytes
FROM scaled
ORDER BY doc_id
""",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: decode dims, fit into a 256x256 box (never upscale),
    emit target geometry + RGB byte budget.

    Runs as the same mapInPandas pipeline a real resizer would (PIL
    ``img.resize((dst_w, dst_h))`` slots in where the arithmetic is); the
    oracle recomputes the geometry from the stub decode, pinning the
    batch plumbing end-to-end."""
    import math

    import pandas as pd

    def resize_batches(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h = _fake_decode_meta(bytes(payload))
                s = min(256.0 / w, 256.0 / h, 1.0)
                dw, dh = max(1, math.floor(w * s)), max(1, math.floor(h * s))
                rows.append((doc_id, w, h, dw, dh, dw * dh * 3))
            yield pd.DataFrame(
                rows, columns=["doc_id", "src_w", "src_h", "dst_w", "dst_h", "dst_bytes"]
            )

    v = views(spark, sf_dir)
    media = v["documents"].select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return media.mapInPandas(resize_batches, RESIZE_SCHEMA).orderBy("doc_id")
