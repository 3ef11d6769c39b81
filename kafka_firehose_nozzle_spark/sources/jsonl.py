"""JSON-lines ingestion with corrupt-record quarantine.

The reference consumes a websocket of protobuf envelopes; real lake
ingestion at 100 TB overwhelmingly arrives as newline-delimited JSON
dumps with a long tail of malformed lines (truncated writes, mixed
schemas, encoding garbage). Dropping them silently corrupts counts;
failing the job on one bad line is worse. This source mirrors the
reference's counted-drop stance (slowConsumerAlert / dropped-message
counters, kafka.go:269-271): every line lands either in the typed
stream or in a quarantine with the raw line preserved.

Scale design:
- The file is scanned as TEXT once and parsed with ``from_json``
  (JVM-side Jackson, whole-stage codegen downstream, no Python in the
  loop). Reading text-then-parse rather than ``spark.read.json`` keeps
  the byte-exact raw line available for EVERY quarantined row —
  including structurally-valid-but-foreign JSON, which the json reader
  nulls out irrecoverably.
- The parsed frame is persisted before the good/quarantine split, so
  consuming both halves costs one scan + one Jackson pass, not two.
  The third returned element is an ``unpersist()`` callback — call it
  once both halves are consumed, or repeated ingests leak cached
  blocks on the executors.
- The schema is supplied explicitly: schema inference is a full extra
  pass over 100 TB and non-deterministic under sampling. Don't.
- Quarantined rows keep the raw line so a later repair job can
  re-parse; the quarantine write is append-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

EVENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.StringType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_jsonl_split(
    spark: SparkSession,
    path: str,
    schema: T.StructType = EVENTS_JSONL_SCHEMA,
) -> tuple[DataFrame, DataFrame, "Callable[[], None]"]:
    """Read newline-delimited JSON at ``path``; return
    ``(good, quarantine, unpersist)``.

    ``good`` has the typed columns; ``quarantine`` is ``(raw, reason)``
    where raw is the byte-exact original line in BOTH failure modes;
    ``unpersist`` releases the shared parsed-frame cache once both
    halves have been consumed.

    A line is quarantined when Jackson could not parse it at all
    (``unparseable``) OR it parsed but every schema field was null — a
    JSON object from a different stream: structurally valid,
    semantically foreign (``foreign_schema``).

    .. note:: the return grew from 2-tuple to 3-tuple when the cache
       lifetime moved to the caller (round 4); pre-1.0 the tuple is the
       API, and any FURTHER additions will come as attributes on a
       small result object rather than a fourth positional element, so
       3-tuple unpacking is stable from here on.
    """
    data_fields = [f.name for f in schema.fields if f.name != CORRUPT_COL]
    parse_schema = T.StructType(
        [f for f in schema.fields if f.name != CORRUPT_COL]
        + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = (
        spark.read.text(path)
        .select(
            F.col("value").alias("raw"),
            F.from_json(
                "value",
                parse_schema,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
            ).alias("p"),
        )
        .persist()
    )
    all_null = None
    for c in data_fields:
        e = F.col(f"p.{c}").isNull()
        all_null = e if all_null is None else (all_null & e)
    bad = F.col(f"p.{CORRUPT_COL}").isNotNull() | all_null
    good = parsed.filter(~bad).select(
        *[F.col(f"p.{c}").alias(c) for c in data_fields]
    )
    quarantine = parsed.filter(bad).select(
        "raw",
        F.when(
            F.col(f"p.{CORRUPT_COL}").isNotNull(), F.lit("unparseable")
        )
        .otherwise(F.lit("foreign_schema"))
        .alias("reason"),
    )
    def unpersist() -> None:
        parsed.unpersist()

    return good, quarantine, unpersist
