"""User extension surface demos: the three Python extension points an
engine user reaches for when built-ins run out, each in its fastest
available form and each documented with its cost model.

- scalar: ``@pandas_udf`` (Arrow-batched, vectorized — 10-100x over
  row-at-a-time) — ``cosine_sim_pandas_udf``;
- table function: ``@udtf`` (one input row -> many output rows;
  row-at-a-time Python, so strictly a LAST resort after built-in
  generators like explode/posexplode/inline) — ``ExtractSpans``;
- grouped/cogrouped map: see operators/asof.py (applyInPandas) and
  operators/multimodal.py (mapInPandas) for the production examples.

None of these appear in any benched query's hot path — the engine's own
operators stay JVM-side (plan-guarded) — they exist so a user extending
the engine has a vetted template with the right batching semantics.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def cosine_sim_pandas_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized cosine similarity between two array<double> columns.

    Template for numeric kernels that outgrow higher-order functions:
    whole Arrow batches cross the JVM/Python boundary once and numpy
    does the math. (The engine's own similarity ops use JVM-side folds
    instead — this exists as the documented escape hatch.)"""
    import numpy as np

    va = np.stack(a.to_numpy())
    vb = np.stack(b.to_numpy())
    num = (va * vb).sum(axis=1)
    den = np.linalg.norm(va, axis=1) * np.linalg.norm(vb, axis=1)
    out = np.where(den == 0, 0.0, num / np.where(den == 0, 1.0, den))
    return pd.Series(out)


@udtf(returnType="span_ix int, start int, length int, span string")
class ExtractSpans:
    """UDTF: one document in, one row per sentence-ish span out
    (split on '.', offsets included). Register with
    ``spark.udtf.register("extract_spans", ExtractSpans)`` and use in
    SQL as ``SELECT s.* FROM docs, LATERAL extract_spans(text) s``.

    Row-at-a-time Python — the slowest extension point; prefer explode
    over a built-in split unless per-span logic genuinely needs Python.
    """

    def eval(self, text: str):
        if text is None:
            return
        pos = 0
        ix = 0
        for part in text.split("."):
            if part.strip():
                yield ix, pos, len(part), part.strip()
                ix += 1
            pos += len(part) + 1
