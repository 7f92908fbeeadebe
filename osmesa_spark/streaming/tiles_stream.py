"""Streaming edit-histogram tile updater — parity with
`osmesa.apps.streaming.StreamingEditHistogramTileUpdater`
(`src/apps/src/main/scala/osmesa/apps/streaming/StreamingEditHistogramTileUpdater.scala:114-138`)
and the incremental tile upsert it drives (`EditHistogram.scala:219-305`).

T8 twin design: the SAME vectorgrid chain (tile → rasterize → pyramid →
vectorize, operators/vectorgrid.py) runs per micro-batch inside
`foreachBatch`; the MVT sink's committed-sequence layer (sinks/mvt.py)
makes re-delivery of a sequence a no-op, so restart-from-checkpoint or
at-least-once replay cannot double-count — the reference gets the same
property from `getCommittedSequences` (`VectorGrid.scala:35-43`).

The per-batch write groups by replication sequence (one drop-dir file per
sequence + maxFilesPerTrigger=1 means a batch is normally exactly one
sequence), so tile merge and idempotence are both sequence-grained (T2's
"sequences arrive atomically" assumption, documented in
`StreamingChangesetStatsUpdater.scala:110-117`)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmesa_spark.operators import vectorgrid as vg
from osmesa_spark.sinks import mvt


def edit_tiles_for_batch(
    batch: DataFrame, zoom: int, cells: int
) -> DataFrame:
    """Bounded vectorgrid chain for one micro-batch of the changes stream:
    visible nodes with coords → base raster → pyramid → vectorized cells."""
    pts = batch.where(
        (F.col("type") == "node")
        & F.col("visible")
        & F.col("lat").isNotNull()
        & F.col("lon").isNotNull()
    ).select("lon", "lat")
    base = vg.tile_points(pts, zoom=zoom, cells=cells)
    return vg.vectorize(vg.pyramid(base, base_zoom=zoom), cells=cells)


def run_streaming_tile_updater(
    changes: DataFrame,
    tile_root: str,
    checkpoint_dir: str,
    zoom: int = 6,
    cells: int = 16,
    layer_name: str = "density",
):
    """Attach the tile-upsert foreachBatch sink to a streaming CHANGES
    DataFrame and return the StreamingQuery (caller awaits/stops)."""

    def sink(batch: DataFrame, epoch_id: int) -> None:
        seqs = [r[0] for r in batch.select("sequence").distinct().collect()]
        for seq in sorted(seqs):
            vec = edit_tiles_for_batch(
                batch.where(F.col("sequence") == seq), zoom, cells
            )
            mvt.write_tile_pyramid(
                vec,
                tile_root,
                layer_name=layer_name,
                cells=cells,
                sequence=int(seq),
            )

    return (
        changes.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
