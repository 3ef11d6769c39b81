"""Structured Streaming assembly: the reference's continuous pipeline."""
