"""Streaming incremental near-dup detection: an LSH signature store
updated per micro-batch.

The batch LSH pipeline (operators/dedup.py) answers "which documents in
THIS corpus are near-dups of each other".  A training-data INGEST
pipeline needs the online variant: as new documents stream in, flag the
ones that collide with anything already accepted, and admit the rest
into the store — so the store only ever contains mutually-novel
documents and the flag decision is O(bucket occupancy), not O(history).

Spark-first decomposition (foreachBatch — the idempotent-sink pattern
sinks/batchwise.py established):

- per batch, signatures are the SAME per-row expressions the batch
  operators use (one md5 per token, integer lane hashes — no UDF);
- the collision check is an equi-join of the batch's (band_ix,
  band_hash) rows against the store partition-pruned ON band_ix —
  at 100 TB the store is laid out exactly like the batch LSH shuffle
  (bucketed by band hash), so the probe touches one bucket per band;
- accepted rows append their band rows to the store; duplicate rows are
  recorded with the id they collided with.  Batch-id-keyed overwrite
  makes replays idempotent (crash between store write and output write
  replays the batch into the same directory).

Within-batch duplicates are resolved inside the handler, deterministically:
exact copies collapse to the lowest-id canon (the dropped rows still get
decision rows, ``dup_of`` = their canon — the decision log covers EVERY
input row); near-dups are flagged against any SMALLER-id batch document
sharing a band, the same collides-with-anything rule the store probe
applies. The smaller-id rule is deliberately conservative along chains
(if 11~10 and 12~11, doc 12 is flagged even though 11 was itself
flagged): over-flagging keeps the store invariant — only documents that
collide with NOTHING are admitted, so the store stays mutually novel —
and full transitive resolution remains the batch components operator's
job offline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_firehose_nozzle_spark.operators import dedup as D
from kafka_firehose_nozzle_spark.streaming.store import read_store

_STORE_SCHEMA = "doc_id bigint, band_ix int, band_hash string, batch_id bigint"


def _band_rows(batch: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, band_ix, band_hash) rows for every document — the store
    row shape AND the probe row shape (they must agree bit-for-bit,
    which they do by construction: same expression)."""
    staged = D.with_minhash(batch.select(id_col, text_col), text_col)
    return staged.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.col("lsh_bands")).alias("band_ix", "band_hash"),
    )


class IncrementalLshDedup:
    """foreachBatch handler owning an on-disk LSH signature store.

    ``store_dir`` holds the accepted documents' band rows (parquet,
    partitioned by band_ix — the probe prunes to one directory per
    band); ``out_dir`` receives one sub-directory per batch id with the
    admit/duplicate decision for every input row (idempotent overwrite
    on replay)."""

    def __init__(self, spark: SparkSession, store_dir: str, out_dir: str,
                 id_col: str = "doc_id", text_col: str = "text") -> None:
        self.spark = spark
        self.store_dir = store_dir
        self.out_dir = out_dir
        self.id_col = id_col
        self.text_col = text_col

    def _store(self) -> DataFrame:
        return read_store(self.spark, self.store_dir, _STORE_SCHEMA)

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        from kafka_firehose_nozzle_spark.operators.text import fingerprint

        # 1. within-batch EXACT dups: lowest id per fingerprint is the
        #    canon; the non-canon rows are REMOVED from the probe but
        #    still receive decision rows (dup_of = canon) — the decision
        #    log covers every input row, which downstream ingest joins
        #    rely on.
        fps = batch.select(
            F.col(self.id_col).alias("doc_id"),
            fingerprint(F.col(self.text_col)).alias("fp"),
        )
        canon = fps.groupBy("fp").agg(F.min("doc_id").alias("canon_id"))
        exact_dup_decisions = (
            fps.join(canon, "fp")
            .filter(F.col("doc_id") != F.col("canon_id"))
            .select(
                "doc_id",
                F.col("canon_id").alias("dup_of"),
                F.lit(False).alias("admitted"),
                F.lit(batch_id).alias("batch_id"),
            )
        )
        local = D.dedup_exact_keep_first(batch, self.id_col, self.text_col)
        probe = _band_rows(local, self.id_col, self.text_col).localCheckpoint()

        # 2. probe the store: any shared (band_ix, band_hash) bucket is
        #    a candidate collision; keep the smallest colliding store id.
        #    Only rows from STRICTLY EARLIER batches count — this is
        #    what makes a crash replay idempotent: the replayed batch's
        #    own first-run store rows are invisible to its second run.
        store = self._store().filter(F.col("batch_id") < batch_id)
        store_hits = (
            probe.alias("P")
            .join(
                store.alias("S"),
                (F.col("P.band_ix") == F.col("S.band_ix"))
                & (F.col("P.band_hash") == F.col("S.band_hash")),
                "inner",
            )
            .select(
                F.col("P.doc_id").alias("doc_id"),
                F.col("S.doc_id").alias("dup_of"),
            )
        )
        # 2b. within-batch NEAR dups: the same collides-with-anything
        #     rule against SMALLER-id batch documents (deterministic,
        #     chunking-independent — without this, near-dups landing in
        #     one micro-batch were all admitted and the store lost its
        #     mutual-novelty invariant). Conservative along chains by
        #     design (module docstring).
        batch_hits = (
            probe.alias("P")
            .join(
                probe.alias("Q"),
                (F.col("P.band_ix") == F.col("Q.band_ix"))
                & (F.col("P.band_hash") == F.col("Q.band_hash"))
                & (F.col("P.doc_id") > F.col("Q.doc_id")),
                "inner",
            )
            .select(
                F.col("P.doc_id").alias("doc_id"),
                F.col("Q.doc_id").alias("dup_of"),
            )
        )
        hits = (
            store_hits.unionByName(batch_hits)
            .groupBy("doc_id")
            .agg(F.min("dup_of").alias("dup_of"))
        )

        decisions = (
            local.select(F.col(self.id_col).alias("doc_id"))
            .join(hits, "doc_id", "left")
            .select(
                "doc_id",
                F.col("dup_of"),
                F.col("dup_of").isNull().alias("admitted"),
                F.lit(batch_id).alias("batch_id"),
            )
            .unionByName(exact_dup_decisions)
            .localCheckpoint()
        )

        # 3. idempotent outputs: batch-keyed overwrite for the decision
        #    log; admitted band rows append to the store (a replayed
        #    batch re-admits the same rows — duplicate store rows only
        #    widen buckets, never change decisions, and compaction can
        #    dedup them offline)
        decisions.write.mode("overwrite").parquet(
            f"{self.out_dir}/batch_id={batch_id}"
        )
        admitted = decisions.filter("admitted").select("doc_id")
        (
            probe.join(admitted, "doc_id", "left_semi")
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .partitionBy("band_ix")
            .parquet(self.store_dir)
        )
