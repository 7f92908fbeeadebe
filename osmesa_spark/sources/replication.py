"""Replication source emulation — the engine's equivalents of vectorpipe's
custom `Source.AugmentedDiffs` / `Source.Changes` / `Source.Changesets`
streaming sources (reference call sites
`src/apps/.../StreamingChangesetStatsUpdater.scala:92-108`,
`ChangeStreamProcessor.scala:92-96`, `StreamingChangesetMetadataUpdater.scala:81-100`).

The reference polls a replication HTTP endpoint on the driver and emits one
micro-batch per minutely sequence. We emulate the same contract with a
**file drop-dir**: one `<sequence>.jsonl` (or `.osc` XML) file per sequence.
Spark's file streaming source gives us exactly the reference's semantics:
  * bounded (`spark.read`) and unbounded (`spark.readStream`) over the SAME
    path and schema — the T8 dual-mode requirement;
  * `maxFilesPerTrigger` ≈ `Source.BatchSize` (T9);
  * sequence number recovered from the file name (or embedded column);
  * ordered arrival per the drop order, which is what makes the reference's
    0-second watermark sound (T2).

XML osmChange parsing (S5) runs distributed via mapInPandas — one Python
parse per file, Arrow-batched, never on the driver.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from osmesa_spark import schemas

# augdiff drop-dir rows are flat JSON of schemas.AUGMENTED_DIFFS

def read_augmented_diffs(
    spark: SparkSession,
    drop_dir: str,
    streaming: bool = False,
    max_files_per_trigger: int | None = 1,
    start_sequence: int | None = None,
    end_sequence: int | None = None,
) -> DataFrame:
    """Bounded or unbounded read of the augmented-diff drop dir.
    Corrupt lines land in `_corrupt` for the dead-letter sink (S6 ErrorHandler
    semantics: StreamingChangesetStatsUpdater.scala:149-216)."""
    schema = T.StructType(
        schemas.AUGMENTED_DIFFS.fields + [T.StructField("_corrupt", T.StringType())]
    )
    # text scan + from_json instead of the raw json reader: identical for
    # batch and streaming, and exempt from Spark's corrupt-column-only query
    # restriction (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    pattern = os.path.join(drop_dir, "*.jsonl")
    if streaming:
        reader = spark.readStream.format("text")
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        raw = reader.load(pattern)
    else:
        raw = spark.read.format("text").load(pattern)
    df = raw.select(
        F.from_json(
            F.col("value"),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("r")
    ).select("r.*")
    if start_sequence is not None:
        df = df.where(F.col("sequence") >= start_sequence)
    if end_sequence is not None:
        df = df.where(F.col("sequence") <= end_sequence)
    return df


def split_errors(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, errors) — the dead-letter split; errors mirror the reference's
    PG `errors` table shape (deployment/sql/05-errors.sql)."""
    good = df.where(F.col("_corrupt").isNull()).drop("_corrupt")
    errors = df.where(F.col("_corrupt").isNotNull()).select(
        F.current_timestamp().alias("ts"),
        F.col("sequence"),
        F.col("_corrupt").alias("payload"),
    )
    return good, errors


# ---------------------------------------------------------------------------
# osmChange XML (S5): distributed SAX-free parse via mapInPandas
# ---------------------------------------------------------------------------

def _parse_osc_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import xml.etree.ElementTree as ET

    for pdf in batches:
        out: list[dict] = []
        for _, row in pdf.iterrows():
            seq = int(
                os.path.basename(row["path"]).split(".")[0]
            )
            try:
                root = ET.fromstring(row["content"])
            except ET.ParseError:
                continue
            for action in root:  # create | modify | delete
                visible = action.tag != "delete"
                for el in action:
                    tags = {
                        t.get("k"): t.get("v") for t in el.findall("tag")
                    }
                    nds = [int(nd.get("ref")) for nd in el.findall("nd")] or None
                    out.append(
                        {
                            "sequence": seq,
                            "type": el.tag,
                            "id": int(el.get("id")),
                            "version": int(el.get("version", "0")),
                            "lat": float(el.get("lat")) if el.get("lat") else None,
                            "lon": float(el.get("lon")) if el.get("lon") else None,
                            "nds": nds,
                            "tags": tags,
                            "timestamp": pd.Timestamp(el.get("timestamp"))
                            if el.get("timestamp")
                            else None,
                            "changeset": int(el.get("changeset", "0")),
                            "uid": int(el.get("uid", "0")),
                            "user": el.get("user", ""),
                            "visible": visible,
                        }
                    )
        yield pd.DataFrame(
            out,
            columns=[f.name for f in schemas.CHANGES.fields],
        )


def read_changes_xml(
    spark: SparkSession, drop_dir: str, streaming: bool = False
) -> DataFrame:
    """osmChange XML drop-dir (<sequence>.osc) → CHANGES rows. Whole-file
    text read (distributed), XML parse in Arrow-batched Python per executor —
    the SAXBench-equivalent path (src/bench/.../SAXBench.scala)."""
    pattern = os.path.join(drop_dir, "*.osc")
    if streaming:
        raw = (
            spark.readStream.format("text")
            .option("wholetext", "true")
            .option("maxFilesPerTrigger", 1)
            .load(pattern)
        )
    else:
        raw = spark.read.format("text").option("wholetext", "true").load(pattern)
    raw = raw.select(
        F.input_file_name().alias("path"), F.col("value").alias("content")
    )
    from osmesa_spark.session import ship_package

    ship_package(spark)
    return raw.mapInPandas(_parse_osc_batch, schema=schemas.CHANGES)


def read_changeset_metadata(
    spark: SparkSession, drop_dir: str, streaming: bool = False
) -> DataFrame:
    """Changeset-metadata drop-dir (<sequence>.jsonl of CHANGESETS rows) —
    the Source.Changesets equivalent (S4)."""
    schema = schemas.CHANGESETS
    if streaming:
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(os.path.join(drop_dir, "*.jsonl"))
        )
    return spark.read.schema(schema).json(os.path.join(drop_dir, "*.jsonl"))
