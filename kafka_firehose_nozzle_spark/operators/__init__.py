"""Batch analytics operators beyond the reference surface.

The reference is a pure streaming router (SURVEY.md §2.6: no joins, no
windows, no SQL). These modules add the large-scale training-data-pipeline
operators the north star asks for — dedup (exact, MinHash-LSH, SimHash,
n-gram Jaccard, embedding cosine), similarity search, text analysis, and
multimodal column plumbing — each designed shuffle-minimal for 100 TB:
per-row signatures are computed with higher-order array functions (no
explode/shuffle), candidate generation uses banded LSH buckets (equi-join,
AQE-skew-safe) rather than quadratic self-joins.
"""
