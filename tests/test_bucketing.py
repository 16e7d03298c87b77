"""Bucketed co-located joins: the shuffle-elision evidence for the 100 TB
story — a fact table bucketed on its join key joins a same-bucketed
dimension WITHOUT any Exchange in the physical plan (each bucket pair is
joined in place).  This is the disk-layout twin of the staged
ExtractionJob: pay the layout once, never shuffle that key again."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    for name, df, key in (
        ("orders_b", orders, "o_orderkey"),
        ("lineitem_b", lineitem, "l_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .option("path", str(root / name))
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    yield "orders_b", "lineitem_b"
    for name in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    orders_b, lineitem_b = bucketed_tables
    # merge hint: at sf0.001 Spark would broadcast the tiny dimension
    # (also shuffle-free, but that proves nothing about bucketing); at
    # real scale both sides exceed the broadcast threshold and SMJ is
    # what the optimizer picks anyway
    joined = (
        spark.table(lineitem_b)
        .join(
            spark.table(orders_b).hint("merge"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_quantity", "o_orderdate")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange" not in plan, plan  # co-located: zero shuffle

    # and it computes the right thing: row count == plain join row count
    plain = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{SF}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert joined.count() == plain


def test_aqe_splits_skewed_join_partition(spark):
    """Skew story, runtime half: AQE detects the hot join key and splits
    its partition (SortMergeJoin(skew=true) in the FINAL adaptive plan) —
    complementing the explicit two-phase salting queries.  Thresholds are
    lowered to make the tiny test corpus register as skewed, and restored
    afterwards."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        left = spark.range(0, 200000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        j = left.join(right, "k").groupBy().count()
        assert j.collect()[0][0] == 180100
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
