"""Streaming incremental substring-level dedup: a span-hash store
updated per micro-batch.

The batch ``substring_dup_spans`` query answers "which spans recur
inside THIS corpus".  The ingest-time variant asks, per arriving
document: what fraction of its sampled windows already exist in the
accepted history?  Documents past a threshold are boilerplate-dominated
(mirror pages, templated chaff) and are rejected BEFORE they pollute
the corpus; the rest admit their span hashes into the store.

Same foreachBatch discipline as streaming/incremental_lsh.py:

- spans are the SAME per-row expression the batch operator uses
  (operators/dedup.windowed_span_hashes — md5 over stride-sampled
  8-token windows, no UDF);
- the history probe is an equi-join on the 128-bit hash against the
  store, which is laid out partitioned by a hash prefix; the read
  prunes to the partitions the batch's own hashes touch (a real cut
  for small micro-batches; a batch spanning all 256 prefixes probes
  the full history once — the floor for an exact containment check);
- the admit decision is PURE INTEGER (2 * dup_windows <= n_windows at
  the default 0.5 threshold) — no float, so replays and engine moves
  can't flip a borderline doc;
- batch-id-keyed overwrite of the decision log + the strictly-earlier
  batch filter on the store make crash replays idempotent (the
  replayed batch's own first-run store rows are invisible to its
  second run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_firehose_nozzle_spark.operators import dedup as D
from kafka_firehose_nozzle_spark.streaming.store import read_store

_STORE_SCHEMA = "wh string, wh_pfx string, batch_id bigint"


class IncrementalSpanDedup:
    """foreachBatch handler owning an on-disk span-hash store.

    ``store_dir`` holds the accepted documents' window hashes (parquet,
    partitioned by the first 2 hex chars — 256 buckets the probe's
    shuffle reuses); ``out_dir`` receives one sub-directory per batch
    id with (doc_id, n_windows, dup_windows, admitted)."""

    def __init__(
        self,
        spark: SparkSession,
        store_dir: str,
        out_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        reject_num: int = 1,
        reject_den: int = 2,
    ) -> None:
        self.spark = spark
        self.store_dir = store_dir
        self.out_dir = out_dir
        self.id_col = id_col
        self.text_col = text_col
        # reject when dup_windows * reject_den > n_windows * reject_num
        # (strictly-greater integer compare; default threshold 1/2)
        self.reject_num = reject_num
        self.reject_den = reject_den

    def _store(self) -> DataFrame:
        return read_store(self.spark, self.store_dir, _STORE_SCHEMA)

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        spans = D.span_rows(
            batch, self.id_col, self.text_col
        ).localCheckpoint()

        # distinct history hashes from STRICTLY EARLIER batches; a
        # window matching many store rows still counts once. The store
        # read prunes to the batch's hash-prefix partitions — a real
        # cut only when the micro-batch touches few of the 256 buckets
        # (small batches); a large batch probes most of the history,
        # which is the honest floor for an exact containment check.
        pfxs = [
            r["p"]
            for r in spans.select(
                F.substring("wh", 1, 2).alias("p")
            ).distinct().collect()
        ]
        seen = (
            self._store()
            .filter(F.col("wh_pfx").isin(pfxs))
            .filter(F.col("batch_id") < batch_id)
            .select("wh")
            .distinct()
        )
        per_doc = (
            spans.join(seen.withColumn("_hit", F.lit(1)), "wh", "left")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_windows"),
                F.sum(
                    F.when(F.col("_hit").isNotNull(), 1).otherwise(0)
                )
                .cast("bigint")
                .alias("dup_windows"),
            )
        )
        decisions = per_doc.select(
            "doc_id",
            "n_windows",
            "dup_windows",
            (
                F.col("dup_windows") * F.lit(self.reject_den)
                <= F.col("n_windows") * F.lit(self.reject_num)
            ).alias("admitted"),
            F.lit(batch_id).alias("batch_id"),
        ).localCheckpoint()

        decisions.write.mode("overwrite").parquet(
            f"{self.out_dir}/batch_id={batch_id}"
        )
        admitted = decisions.filter("admitted").select("doc_id")
        (
            spans.join(admitted, "doc_id", "left_semi")
            .select("wh")
            .distinct()
            .withColumn("wh_pfx", F.substring("wh", 1, 2))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .partitionBy("wh_pfx")
            .parquet(self.store_dir)
        )
