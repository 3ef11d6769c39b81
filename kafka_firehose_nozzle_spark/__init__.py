"""kafka_firehose_nozzle_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of rakutentech/kafka-firehose-nozzle.

The reference (Go, /root/reference) is a continuous streaming ETL pipeline:
CloudFoundry firehose envelopes -> per-event-type Kafka topic routing ->
sonde-JSON encoding -> Kafka, plus a monitoring counter aggregation
(SURVEY.md). This package re-expresses that Spark-first:

- ``schemas``      static StructType contract for Envelope (envelope.pb.go:98)
- ``config``       TOML config dataclasses (config.go:10-95)
- ``functions``    UUID codec (kafka.go:214), topic routing (kafka.go:305-340),
                   byte-exact sonde JSON encoder (encoder.go:15-27)
- ``pipeline``     the routing transform as a pure DataFrame->DataFrame fn
- ``stats``        observe()-based counters + listener (stats.go)
- ``sources``      replayable envelope sources + firehose DataSource stub
- ``sinks``        kafka/console/memory writers (kafka.go:28-139)
- ``streaming``    Structured Streaming assembly (cli.go:73-376)
- ``operators``    batch analytics beyond the reference: dedup, similarity
                   search, text analysis, multimodal plumbing — designed for
                   100 TB scale (partition-aware, shuffle-minimal).
"""

__version__ = "0.1.0"
