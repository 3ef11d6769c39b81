"""Bucketed co-located join: the no-shuffle join pattern SCALE.md
prescribes for repeated big-big joins at 100 TB (bucket both fact tables
by the join key at write time; every later join on that key skips both
shuffles)."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_bucketed_tables_join_without_exchange(spark):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    # disable broadcast so the join exercises the co-located bucket path
    # (at real scale both sides are too big to broadcast — that is the
    # scenario bucketing exists for)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    try:
        orders = spark.read.parquet(f"{SF}/orders.parquet")
        lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
        (
            orders.write.mode("overwrite")
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable("bktest.orders_b")
        )
        (
            lineitem.write.mode("overwrite")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable("bktest.lineitem_b")
        )
        joined = (
            spark.table("bktest.lineitem_b")
            .join(
                spark.table("bktest.orders_b"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself reads co-located buckets: no Exchange on either
        # join key (the only exchange left belongs to the aggregation)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "SelectedBucketsCount" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert joined.count() > 0
        # cross-check against the plain (shuffling) join
        plain = (
            lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bktest.orders_b")
        spark.sql("DROP TABLE IF EXISTS bktest.lineitem_b")
        spark.sql("DROP DATABASE IF EXISTS bktest")
