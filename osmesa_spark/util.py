"""Small engine utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, *cols: str) -> DataFrame:
    """Spread a DataFrame to at least the cluster's default parallelism
    before a CPU-heavy narrow stage (per-row hashing, regex shingling,
    Python kernels).

    A small input (one parquet file / one row-group) scans as a single
    task, serializing all downstream per-row compute no matter how many
    cores exist. When the scan already produced enough splits — the normal
    case at real scale, where maxPartitionBytes bounds split size — this is
    a no-op, so the extra shuffle is only paid when it buys parallelism.
    Hash-partitioning on `cols` (e.g. the id) keeps placement deterministic.
    """
    if df.isStreaming:
        # df.rdd is illegal on a streaming DataFrame, and a micro-batch
        # already arrives with its source's split count — no-op so every
        # operator that guards its kernel stage stays stream-composable
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *cols) if cols else df.repartition(target)
