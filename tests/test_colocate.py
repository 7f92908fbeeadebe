"""Co-location strategy tests: bucketed joins elide exchanges; salted joins
are result-identical to plain joins while spreading hot keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osmesa_spark.operators import colocate as C


@pytest.fixture(scope="module")
def bucket_db(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("bucketdb")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdb LOCATION '{loc}'")
    yield "bdb"
    spark.sql("DROP DATABASE IF EXISTS bdb CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucket_db):
    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 5_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    bl = C.write_bucketed(left, f"{bucket_db}.left_b", "k", buckets=4)
    br = C.write_bucketed(right, f"{bucket_db}.right_b", "k", buckets=4)

    # force the shuffle-join path so the assertion is about bucketing, not
    # the broadcast threshold
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bl.join(br, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 5_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_salted_join_matches_plain_join(spark):
    # 90% of rows share one hot key
    skewed = spark.range(0, 20_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("dimval")
    )
    plain = skewed.join(dim, "k").select("k", "payload", "dimval")
    salted = C.salted_join(skewed, dim, "k", salts=8).select(
        "k", "payload", "dimval"
    )
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_rejects_outer_hows(spark):
    """Right/full outer would emit one null-extended duplicate per salt
    replica of each unmatched `other` row — salted_join must refuse."""
    a = spark.range(0, 10).select(F.col("id").alias("k"))
    b = spark.range(0, 10).select(F.col("id").alias("k"))
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="unsupported"):
            C.salted_join(a, b, "k", salts=4, how=how)
    # left outer stays correct: skewed side is not replicated
    left = C.salted_join(a, b.where("k < 5"), "k", salts=4, how="left")
    assert left.count() == 10


def test_hot_keys_detects_skew(spark):
    df = spark.range(0, 10_000).select(
        F.when(F.col("id") < 9_000, F.lit(42)).otherwise(F.col("id")).alias("k")
    )
    hot = C.hot_keys(df, "k", threshold_fraction=0.5)
    assert hot == [42]
