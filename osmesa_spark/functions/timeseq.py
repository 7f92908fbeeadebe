"""Replication-sequence ↔ event-time arithmetic and day keys.

Reference semantics:
  * augmented-diff sequence epoch: ``epoch = sequence * 60 + 1347432900``
    (`deployment/monitor-checkpoints.sh:19-20`; used as event time via
    `AugmentedDiffSource.sequenceToTimestamp`, call site
    `StreamingChangesetStatsUpdater.scala:114`).
  * day key for edit histograms: ``year * 1000 + dayofyear``
    (`src/apps/.../EditHistogramTileCreator.scala:59`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SEQUENCE_EPOCH_BASE = 1347432900  # 2012-09-12T06:55:00Z, minutely replication 0
SEQUENCE_INTERVAL_S = 60


def sequence_to_timestamp(seq: Column | str) -> Column:
    seq = F.col(seq) if isinstance(seq, str) else seq
    return F.timestamp_seconds(
        seq.cast("bigint") * SEQUENCE_INTERVAL_S + SEQUENCE_EPOCH_BASE
    )


def timestamp_to_sequence(ts: Column | str) -> Column:
    ts = F.col(ts) if isinstance(ts, str) else ts
    return (
        (F.unix_timestamp(ts) - SEQUENCE_EPOCH_BASE) / SEQUENCE_INTERVAL_S
    ).cast("int")


def day_key(ts: Column | str) -> Column:
    ts = F.col(ts) if isinstance(ts, str) else ts
    return (F.year(ts) * 1000 + F.dayofyear(ts)).cast("int")
