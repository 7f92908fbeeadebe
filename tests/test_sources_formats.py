"""Source/sink format parity (SURVEY §2.1): ORC read/write with snappy +
single-file output (S1/S3: ChangesetStatsCreator.scala:157-163,
MergeChangesets.scala:116-118) and CSV with the reference's option set
(S2: header/inferSchema/multiLine/escape,
ChangesetMetadataCreator.scala:107-119)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F


def test_orc_roundtrip_snappy_single_file(spark, tmp_path):
    src = spark.createDataFrame(
        [(i, f"u{i}", float(i) * 1.5, {"k": str(i)}) for i in range(100)],
        "id long, name string, score double, tags map<string,string>",
    )
    out = str(tmp_path / "orc_out")
    (
        src.coalesce(1)
        .write.mode("overwrite")
        .option("compression", "snappy")
        .orc(out)
    )
    files = glob.glob(f"{out}/*.orc")
    assert len(files) == 1  # repartition(1) parity
    back = spark.read.orc(out)
    assert back.count() == 100
    assert dict(back.dtypes)["tags"] == "map<string,string>"
    a = sorted(r.id for r in back.collect())
    assert a == list(range(100))
    got = back.where(F.col("id") == 7).first()
    assert got.tags == {"k": "7"} and got.score == 10.5


def test_csv_reference_option_set(spark, tmp_path):
    p = tmp_path / "changesets.csv"
    p.write_text(
        'id,created_at,comment,num_changes\n'
        '1,2023-01-01 00:00:00,"simple",5\n'
        '2,2023-01-02 10:30:00,"multi\nline ""quoted"" comment",7\n'
    )
    df = (
        spark.read.format("csv")
        .option("header", "true")
        .option("inferSchema", "true")
        .option("multiLine", "true")
        .option("quote", '"')
        .option("escape", '"')
        .load(str(p))
    )
    assert df.count() == 2
    dt = dict(df.dtypes)
    assert dt["id"] == "int" and dt["num_changes"] == "int"
    r2 = df.where(F.col("id") == 2).first()
    assert r2.comment == 'multi\nline "quoted" comment'
    assert r2.num_changes == 7
