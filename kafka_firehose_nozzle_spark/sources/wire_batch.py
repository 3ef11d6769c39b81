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


def _with_residue(dt):
    """Nested payload structs (recursively — the UUIDs inside
    httpStartStop included) gain their own `_unrecognized` binary
    subfield on the DECODE side: gogo proto keeps XXX_unrecognized on
    EVERY generated struct (metric.pb.go included), and the wire codec
    already captures residue per message level — without a schema slot
    the Arrow conversion would silently drop nested unknowns at the
    DataFrame boundary, breaking the byte-exact re-encode contract."""
    if not isinstance(dt, T.StructType):
        return dt
    return T.StructType(
        [
            T.StructField(f.name, _with_residue(f.dataType), True)
            for f in dt.fields
        ]
        + [T.StructField("_unrecognized", T.BinaryType(), True)]
    )


DECODED_SCHEMA = T.StructType(
    [
        T.StructField(f.name, _with_residue(f.dataType), True)
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

    ``mapInArrow`` (was mapInPandas): building the output through a
    pandas frame — even at dtype=object — lets the object->Arrow
    conversion treat a NaN double as NULL, silently nulling legitimate
    NaN metric values; ``RecordBatch.from_pylist`` against the explicit
    Arrow schema keeps NaN a value, ints exact at any magnitude, and
    maps nested dicts (including the `_unrecognized` residue subfields)
    to struct fields by NAME.
    """
    from kafka_firehose_nozzle_spark.sources.dropsonde_wire import (
        decode_envelope,
    )

    env_names = [f.name for f in schemas.ENVELOPE_SCHEMA.fields]

    def decode(batches):
        import pyarrow as pa

        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(DECODED_SCHEMA)
        for batch in batches:
            rows = []
            for buf in batch.column(0).to_pylist():
                try:
                    if buf is None:
                        raise ValueError("null payload")
                    d = decode_envelope(bytes(buf))
                    row = {name: d.get(name) for name in env_names}
                    row["_decode_error"] = None
                    row["_raw"] = None
                except Exception as e:  # counted-drop, never job-fail
                    row = {name: None for name in env_names}
                    row["_decode_error"] = f"{type(e).__name__}: {e}"[:200]
                    # buf can itself be None — the quarantine handler
                    # must not raise (bytes(None) TypeError would fail
                    # the job from inside the never-job-fail path)
                    row["_raw"] = None if buf is None else bytes(buf)
                rows.append(row)
            yield pa.RecordBatch.from_pylist(rows, schema=arrow_schema)

    return df.select(payload_col).mapInArrow(decode, DECODED_SCHEMA)


# arrow-to-pandas cell shapes normalized back to the plain dict format
# dropsonde_wire's encoder consumes, DRIVEN BY THE SPARK TYPE: a batch
# that mixes null and non-null rows has its nullable int64 struct
# children converted to float64 by pyarrow (observed under streaming),
# so the target type — not the arrived dtype — decides the cast.
# Also: numpy scalars -> python, MapType list[(k, v)] -> dict,
# arrays -> list, bytearray -> bytes.
def _plain(v, dtype):
    import numpy as np

    # None is the ONLY null here (Arrow to_pylist, not pandas): a float
    # NaN is a legitimate double VALUE (e.g. a NaN ValueMetric) and must
    # encode, not vanish — struct.pack round-trips its exact bits
    if v is None:
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
        out = {
            f.name: _plain(v.get(f.name), f.dataType) for f in dtype.fields
        }
        # nested unknown-field residue rides outside the declared
        # ENVELOPE_SCHEMA payload types (decode emits it per message
        # level, DECODED_SCHEMA slots it) — carry it so encode_envelope
        # re-emits it after that level's known fields
        if "_unrecognized" not in out and v.get("_unrecognized") is not None:
            out["_unrecognized"] = bytes(v["_unrecognized"])
        return out
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
    for canonically-ordered frames, INCLUDING unknown fields AT EVERY
    message level — the ``_unrecognized`` envelope column and the
    nested residue subfields DECODED_SCHEMA adds re-emit raw unknown
    tag+value bytes after each level's known fields, exactly like gogo
    proto's XXX_unrecognized on Marshal (envelope.pb.go:116) — pinned
    by tests/test_dropsonde_wire.py and the round-trip tests in
    tests/test_io.py. One deliberate exclusion, matching gogo exactly:
    unknown fields inside a synthetic MAP-ENTRY message (``tags``) are
    dropped — gogo decodes map fields straight into map[string]string
    and retains no entry-level unknowns either, so the parity claim is
    the reference's own behavior, not a gap.

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
