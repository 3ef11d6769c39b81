"""Entity resolution / record linkage: rarest-token blocking + edit
distance verification.

Scale design (100 TB):
- Candidate pairs are generated over DISTINCT entity strings, never over
  raw rows. A 100 TB catalog has billions of rows but a vocabulary-bound
  set of canonical names; the pairwise stage runs on that small set, and
  per-row facts only rejoin at the end as an aggregate.
- Blocking is rarest-token: each entity is keyed by its least frequent
  token (ties broken lexicographically), so candidate pairs only form
  inside small blocks. Block size is bounded by the rarest token's
  document frequency — heavy common-word blocks never materialize.
- Verification (Levenshtein) runs only inside blocks, JVM built-in.

All ordering/tie-breaks are deterministic (freq asc, token asc) so the
DuckDB oracle reproduces the exact pair set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_name_pairs(
    df: DataFrame,
    name_col: str,
    count_col: str = "n_rows",
    max_distance: int = 4,
) -> DataFrame:
    """Near-duplicate entity pairs among the distinct values of
    ``name_col``.

    Pipeline: distinct names (+ row counts) -> explode tokens ->
    token document frequency -> per-name blocking keys = the TWO rarest
    tokens (by (freq, token), an aggregation not a window) -> self-join
    per key -> candidate-pair dedup -> Levenshtein verify
    ``0 < lev <= max_distance``.

    Two keys, not one: a pair of variant names typically differs in a
    hapax token ("zorblax inc" / "zorblax incorporated"), so the single
    rarest token of each variant IS the differing token and one-key
    blocking would never co-block them.  With the two rarest, the shared
    rare token survives as a key on both sides.  Block size stays
    bounded by the 2nd-rarest token's document frequency.

    Returns (name_1, name_2, lev, n_rows_1, n_rows_2) with
    name_1 < name_2 lexicographically.
    """
    names = df.groupBy(F.col(name_col).alias("name")).agg(
        F.count(F.lit(1)).alias(count_col)
    )
    toks = names.select(
        "name", F.explode(F.array_distinct(F.split("name", " "))).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df_tok"))
    # two rarest tokens per name: sort the (freq, token) structs and
    # slice — collect_list order is non-deterministic but array_sort
    # canonicalizes it; per-name token counts are small by construction.
    keyed = (
        toks.join(F.broadcast(freq), "tok")
        .groupBy("name")
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct("df_tok", "tok"))),
                1,
                2,
            ).alias("ks")
        )
        .select("name", F.explode("ks.tok").alias("block_key"))
        .join(names, "name")
    )
    a = keyed.select(
        F.col("block_key"),
        F.col("name").alias("name_1"),
        F.col(count_col).alias(f"{count_col}_1"),
    )
    b = keyed.select(
        F.col("block_key"),
        F.col("name").alias("name_2"),
        F.col(count_col).alias(f"{count_col}_2"),
    )
    pairs = (
        a.join(b, "block_key")
        .filter(F.col("name_1") < F.col("name_2"))
        .drop("block_key")
        .dropDuplicates(["name_1", "name_2"])
        .withColumn("lev", F.levenshtein("name_1", "name_2"))
        .filter((F.col("lev") > 0) & (F.col("lev") <= F.lit(max_distance)))
    )
    return pairs.select(
        "name_1", "name_2", "lev", f"{count_col}_1", f"{count_col}_2"
    )
