"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for 100 TB multimodal corpora (images/audio/video as columns):

- payloads are ``binary`` columns; metadata is a typed struct alongside
  (media_type, width/height/duration, codec). Parquet stores binary
  chunks column-oriented, so metadata-only scans never touch the bytes
  (column pruning) and predicate pushdown works on the typed fields.
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` operators — per-partition, zero shuffle; at scale the
  decode stage is compute-bound and scales linearly with executors.
- the actual codec work (PIL/ffmpeg/torchaudio) is NOT in this
  container, so ``decode_image``/``sample_frames`` raise
  NotImplementedError behind a clearly marked seam, while
  ``media_features`` computes real deterministic features (byte length,
  content hash) so the Spark-side contract — schemas, batching, UDF
  signatures — is fully exercised and oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("content_hash", T.StringType(), True),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: the documents table as a media table (text bytes as the
    opaque payload) — lets the multimodal plumbing run on driver
    testdata."""
    # deterministic stand-in duration (from the n_chars column, NOT the
    # text) so metadata-only ops have data to plan over without forcing
    # the payload into their scan; docs without n_chars get NULL
    dur = (
        F.col("n_chars").cast("int")
        if "n_chars" in docs.columns
        else F.lit(None).cast("int")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            dur.alias("duration_ms"),
            F.lit("utf-8").alias("codec"),
        ).alias("meta"),
    )


def media_features(media: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over payload bytes (mapInPandas).

    Features here are deterministic (length + md5) so the distributed
    plumbing is testable without codec libraries; a real pipeline swaps
    the inner function for image embeddings etc. without touching the
    plan shape.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payload = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payload.map(lambda b: len(b) if b is not None else 0),
                    "content_hash": payload.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        extract, schema=FEATURES_SCHEMA
    )


def media_features_builtin(media: DataFrame) -> DataFrame:
    """JVM-side equivalent of :func:`media_features` for features that
    built-in functions can express (byte length, md5). Stays inside
    whole-stage codegen — no Python evaluator in the plan — so this is
    the path for anything expressible without a codec; ``media_features``
    (mapInPandas) remains the seam for real decode work only.
    """
    return media.select(
        "media_id",
        F.coalesce(F.length("payload"), F.lit(0)).cast("int").alias("n_bytes"),
        F.md5("payload").alias("content_hash"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Metadata-only frame-sampling PLAN: for each video/media row, the
    (frame_ix, ts_ms) grid a decoder should extract — one frame per
    ``every_ms``, always including t=0. Pure arithmetic over
    ``meta.duration_ms`` + explode: planning NEVER touches the payload
    bytes, so with columnar storage the binary column stays out of the
    scan entirely (plan-guarded) and the expensive ffmpeg seam
    (sample_frames) receives an exact work list instead of probing
    containers."""
    dur = F.col("meta").getField("duration_ms")
    n = F.greatest(F.lit(1), F.ceil(dur / F.lit(every_ms))).cast("int")
    grid = F.transform(
        F.sequence(F.lit(0), n - 1), lambda i: i * every_ms
    )
    return media.filter(dur.isNotNull()).select(
        "media_id", F.posexplode(grid).alias("frame_ix", "ts_ms")
    )


def decode_image(media: DataFrame) -> DataFrame:
    """Image decode seam: payload -> pixel tensor columns.

    NOT IMPLEMENTED in this environment (no PIL/opencv in the image).
    The production implementation decodes inside mapInPandas batches —
    same signature as media_features.
    """
    raise NotImplementedError(
        "image decode requires a codec library (PIL/opencv) not present "
        "in this environment; plumbing is exercised via media_features"
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling seam (ffmpeg) — same contract as decode_image."""
    raise NotImplementedError(
        "frame sampling requires ffmpeg, not present in this environment"
    )


def with_fake_dims(media: DataFrame) -> DataFrame:
    """Deterministic stand-in pixel dimensions derived from payload
    length (the text-as-media adapter has no real images to measure) —
    lets the resize planner run and be oracle-checked on driver
    testdata without a codec; a real pipeline reads meta.width/height
    written at ingest."""
    n = F.coalesce(F.length("payload"), F.lit(0)).cast("bigint")
    return media.withColumn(
        "meta",
        F.struct(
            (F.lit(64) + F.pmod(n, F.lit(1857))).cast("int").alias("width"),
            (F.lit(64) + F.pmod(n * 7, F.lit(1017))).cast("int").alias("height"),
            F.col("meta").getField("duration_ms").alias("duration_ms"),
            F.col("meta").getField("codec").alias("codec"),
        ),
    )


def resize_dims(width, height, box: int = 224):
    """Aspect-preserving fit-into-box output dimensions as pure integer
    arithmetic (floor(d * box / long_side), floored at 1) — the planning
    half of image resize, fused into the scan; the pixel work itself
    happens at the decode seam (decode_image) with these dims as its
    work order.  Returns a struct column (out_w, out_h)."""
    long_side = F.greatest(width, height)
    out_w = F.greatest(
        F.lit(1), ((width.cast("bigint") * box) / long_side).cast("bigint")
    ).cast("int")
    out_h = F.greatest(
        F.lit(1), ((height.cast("bigint") * box) / long_side).cast("bigint")
    ).cast("int")
    return F.struct(out_w.alias("out_w"), out_h.alias("out_h"))
