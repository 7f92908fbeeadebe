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


def test_zorder_cluster_write_enables_row_group_skipping(spark, tmp_path):
    """Z-order clustering must make parquet row-group min/max stats
    spatially TIGHT: a small bbox predicate prunes most row groups of the
    clustered layout while the same predicate prunes (nearly) nothing of a
    hash-distributed layout — and both layouts return identical rows."""
    import glob

    import pyarrow.parquet as pq

    # deterministic synthetic points spread over the globe
    pts = spark.range(100_000).select(
        F.col("id"),
        (F.pmod(F.xxhash64(F.col("id")), F.lit(36000)) / 100.0 - 180.0)
        .alias("lon"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(18000)) / 100.0
         - 90.0).alias("lat"),
    )
    clustered = str(tmp_path / "clustered")
    plain = str(tmp_path / "plain")
    C.zorder_cluster_write(pts, clustered, "lon", "lat", bits=8, n_files=16)
    pts.repartition(16).write.parquet(plain)

    bbox = (10.0, 20.0, 30.0, 40.0)  # lon_min, lat_min, lon_max, lat_max

    def surviving_row_groups(root: str) -> tuple[int, int]:
        total = kept = 0
        for f in glob.glob(f"{root}/*.parquet"):
            meta = pq.ParquetFile(f).metadata
            cols = {
                meta.row_group(0).column(i).path_in_schema: i
                for i in range(meta.num_columns)
            }
            for g in range(meta.num_row_groups):
                rg = meta.row_group(g)
                lo = rg.column(cols["lon"]).statistics
                la = rg.column(cols["lat"]).statistics
                total += 1
                if (lo.max >= bbox[0] and lo.min <= bbox[2]
                        and la.max >= bbox[1] and la.min <= bbox[3]):
                    kept += 1
        return kept, total

    kept_c, total_c = surviving_row_groups(clustered)
    kept_p, total_p = surviving_row_groups(plain)
    assert total_c >= 8 and total_p >= 8
    # hash layout: every row group spans the globe -> nothing prunes
    assert kept_p == total_p
    # z-clustered: the bbox covers ~0.6% of the area; at 16 z-runs the
    # overwhelming majority of row groups must fall outside it
    assert kept_c <= total_c // 4, (kept_c, total_c)

    cond = (
        (F.col("lon") >= bbox[0]) & (F.col("lon") <= bbox[2])
        & (F.col("lat") >= bbox[1]) & (F.col("lat") <= bbox[3])
    )
    got_c = sorted(r["id"] for r in
                   spark.read.parquet(clustered).where(cond).collect())
    got_p = sorted(r["id"] for r in
                   spark.read.parquet(plain).where(cond).collect())
    assert got_c == got_p and len(got_c) > 0


def test_ivf_index_bucketed_layout_serves_without_corpus_exchange(
    spark, bucket_db
):
    """The offline-serving claim from ivf_probe_frozen's docstring: for a
    query batch too big to broadcast, persist the IVF inverted lists
    bucketed BY CLUSTER and the sort-merge probe join reads the index
    buckets in place — the corpus-side Exchange disappears (only the
    probe side and the per-query rank window shuffle). Results equal the
    in-memory broadcast probe exactly."""
    from osmesa_spark.operators.similarity import (
        ivf_probe_frozen,
        kmeans_lloyd,
    )
    from osmesa_spark.queries import _t
    from tests.conftest import SF_CORRECT

    e = _t(spark, SF_CORRECT, "embeddings")
    corpus = e.where(F.col("vec_id") >= 8)
    queries = e.where(F.col("vec_id") < 8)
    assigned, cents = kmeans_lloyd(
        corpus, k=4, iters=2, seed=29, emit_vector=True,
        return_centroids=True,
    )
    mem = sorted(map(tuple, ivf_probe_frozen(
        assigned, queries, cents, k=5, nprobe=2
    ).collect()))

    bucketed = C.write_bucketed(
        assigned, f"{bucket_db}.ivf_lists", "cluster", buckets=4
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # the huge-offline-batch regime: no broadcast hint on the probe
        probed = ivf_probe_frozen(
            bucketed, queries, cents, k=5, nprobe=2,
            broadcast_queries=False,
        )
        unbucketed = ivf_probe_frozen(
            assigned, queries, cents, k=5, nprobe=2,
            broadcast_queries=False,
        )
        plan_b = probed._jdf.queryExecution().executedPlan().toString()
        plan_u = unbucketed._jdf.queryExecution().executedPlan().toString()
        n_b, n_u = plan_b.count("Exchange"), plan_u.count("Exchange")
        assert n_b < n_u, (
            f"bucketed probe should drop the corpus-side exchange: "
            f"{n_b} vs {n_u}\n{plan_b}"
        )
        assert "SortMergeJoin" in plan_b
        got = sorted(map(tuple, probed.collect()))
        assert got == mem
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
