"""Sinks: Kafka writer (per-row topic routing), console debug, memory."""
