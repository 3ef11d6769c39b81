"""Batch decode of dropsonde protobuf wire frames from a binary column.

The streaming source decodes frames one-at-a-time inside the custom
DataSource reader (firehose.py::_decode_dropsonde); lakes additionally
accumulate RAW capture files — parquet with a ``binary`` payload column
of undecoded wire frames (the Kafka-archive / pcap-dump shape).  This
module turns such a column into typed ENVELOPE_SCHEMA rows at corpus
scale:

- ``mapInPandas`` over Arrow batches: the pure-python proto2 parser
  (sources/dropsonde_wire.py — no protobuf runtime needed on
  executors) runs per frame inside a batch loop, so the plan stays one
  embarrassingly-parallel map stage — no shuffle, no driver
  involvement, partition-count parallelism.
- Undecodable frames follow the reference's counted-drop stance
  (kafka.go:269-271): they land in a ``_decode_error`` column instead
  of killing the job, and the caller splits good/bad exactly like the
  JSONL quarantine source.

Reference parity: S1 (protobuf decode), the batch/lake edge of it.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_firehose_nozzle_spark import schemas

# every field forced nullable: a quarantined frame carries NULL
# envelope fields, which the envelope schema's required (non-null)
# proto2 fields would reject at the Unsafe row writer (JVM NPE)
DECODED_SCHEMA = T.StructType(
    [
        T.StructField(f.name, f.dataType, True)
        for f in schemas.ENVELOPE_SCHEMA.fields
    ]
    + [
        T.StructField("_decode_error", T.StringType()),
        # raw frame bytes, populated ONLY for quarantined rows (same
        # contract as the JSONL source: the byte-exact original is
        # preserved for repair/replay, good rows don't double-store it)
        T.StructField("_raw", T.BinaryType()),
    ]
)


def decode_wire_frames(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Binary wire-frame column -> typed envelope rows + _decode_error.

    Rows whose frame fails to parse carry NULL envelope fields and the
    error text in ``_decode_error``; good rows carry NULL there.  Split
    with ``.filter("_decode_error IS NULL")`` / ``IS NOT NULL`` — both
    halves share the single decode pass.
    """
    import pandas as pd

    from kafka_firehose_nozzle_spark.sources.dropsonde_wire import (
        decode_envelope,
    )

    field_names = [f.name for f in DECODED_SCHEMA.fields]
    env_names = [f.name for f in schemas.ENVELOPE_SCHEMA.fields]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for buf in pdf[payload_col]:
                try:
                    d = decode_envelope(bytes(buf))
                    # nested messages stay DICTS — Arrow maps dict cells
                    # to struct fields by NAME (tuples would bind
                    # positionally and corrupt the row)
                    row = {name: d.get(name) for name in env_names}
                    row["_decode_error"] = None
                    row["_raw"] = None
                except Exception as e:  # counted-drop, never job-fail
                    row = {name: None for name in env_names}
                    row["_decode_error"] = f"{type(e).__name__}: {e}"[:200]
                    row["_raw"] = bytes(buf)
                rows.append(row)
            # dtype=object: one quarantined row's None in an int64
            # column would otherwise flip the whole batch to float64 —
            # silently rounding ns timestamps (> 2^53) to 256-ns
            # multiples; Arrow converts object ints to int64 exactly
            yield pd.DataFrame(rows, columns=field_names, dtype=object)

    return df.select(payload_col).mapInPandas(decode, DECODED_SCHEMA)


# arrow-to-pandas cell shapes normalized back to the plain dict format
# dropsonde_wire's encoder consumes, DRIVEN BY THE SPARK TYPE: a batch
# that mixes null and non-null rows has its nullable int64 struct
# children converted to float64 by pyarrow (observed under streaming),
# so the target type — not the arrived dtype — decides the cast.
# Also: numpy scalars -> python, MapType list[(k, v)] -> dict,
# arrays -> list, bytearray -> bytes.
def _plain(v, dtype):
    import numpy as np

    if v is None or (isinstance(v, float) and v != v):
        return None
    if isinstance(v, np.generic):
        v = v.item()
    t = dtype.typeName()
    if t in ("long", "integer", "short", "byte"):
        return int(v)
    if t in ("double", "float"):
        return float(v)
    if t == "binary":
        return bytes(v)
    if t == "string":
        return str(v)
    if t == "struct":
        return {
            f.name: _plain(v.get(f.name), f.dataType) for f in dtype.fields
        }
    if t == "map":
        items = v.items() if isinstance(v, dict) else v
        return {k: _plain(x, dtype.valueType) for k, x in items}
    if t == "array":
        return [_plain(x, dtype.elementType) for x in v]
    return v


def encode_wire_frames(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Typed ENVELOPE_SCHEMA rows -> binary dropsonde wire frames: the
    inverse of :func:`decode_wire_frames` (what a raw-capture archiver
    or a protobuf-topic producer runs). Same plan shape — one
    shuffle-free Arrow-batched map stage.

    Round-trip contract: ``encode(decode(frames)) == frames`` byte-exact
    for canonically-ordered frames, INCLUDING unknown fields — the
    ``_unrecognized`` envelope column re-emits raw unknown tag+value
    bytes after the known fields, exactly like gogo proto's
    XXX_unrecognized on Marshal (envelope.pb.go:116) — pinned by
    tests/test_dropsonde_wire.py and the streaming round-trip test.

    ``mapInArrow``, NOT ``mapInPandas``: the pandas conversion turns a
    nullable int64 struct child into float64 whenever a batch mixes
    null and non-null parents, silently rounding ns timestamps
    (> 2^53) to 256-ns multiples — the same hazard the decode path
    dodges with dtype=object, here on the INPUT side where dtype is
    not ours to pick. Arrow ``to_pylist`` keeps exact ints."""
    from kafka_firehose_nozzle_spark.sources.dropsonde_wire import (
        encode_envelope,
    )

    env_fields = list(schemas.ENVELOPE_SCHEMA.fields)
    env_names = [f.name for f in env_fields]
    out_schema = T.StructType([T.StructField(payload_col, T.BinaryType())])

    def encode(batches):
        import pyarrow as pa

        for batch in batches:
            payloads = [
                encode_envelope(
                    {
                        f.name: _plain(row.get(f.name), f.dataType)
                        for f in env_fields
                    }
                )
                for row in batch.to_pylist()
            ]
            yield pa.RecordBatch.from_arrays(
                [pa.array(payloads, type=pa.binary())], [payload_col]
            )

    return df.select(*env_names).mapInArrow(encode, out_schema)
