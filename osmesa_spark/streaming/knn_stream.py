"""Streaming kNN serving: online vector retrieval against a FROZEN IVF
index — the query-side mirror of the streaming corpus intake (which
gates arriving DOCUMENTS against frozen DSIR/LR artifacts; this serves
arriving QUERIES against a frozen retrieval index).

Shape:

  * offline: `build_ivf_index` trains the coarse quantizer once
    (`kmeans_lloyd`) and pins the assigned inverted lists — index build
    is a training-time cost, never paid per query batch;
  * online: each micro-batch of query vectors is answered by
    `similarity.ivf_probe_frozen` — queries rank the ≤coarse_k literal
    centroid distances ROW-LOCALLY, explode to nprobe probe rows, and
    equi-join the static inverted lists (a stream-static join per batch,
    probe surface O(nprobe·N/coarse_k) per query);
  * answers land in per-batch OVERWRITE dirs (`answers/batch=<id>/`), so
    a crash-replayed micro-batch rewrites the same directory instead of
    double-appending — the intake sink's idempotence discipline.

The per-query top-k needs a rank window, which Structured Streaming
forbids on an unbounded stream — and is exactly right per micro-batch:
`foreachBatch` hands us a bounded DataFrame, the batch probe runs
unchanged, and stream answers are therefore EQUAL BY CONSTRUCTION to the
batch twin over the same queries (asserted in
tests/test_streaming.py::test_streaming_knn_serves_frozen_index).

At 100 TB corpus scale the index side is the scan: the inverted lists
are cluster-keyed (bucket the parquet by cluster to make the per-batch
join exchange-free on the corpus side), and coarse_k scales with corpus
size exactly as in the batch `knn_ivfpq` path. Daily corpus appends go
through `similarity.kmeans_assign` onto the same frozen centroids —
index maintenance without retraining.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from osmesa_spark.operators.similarity import (
    ivf_probe_frozen,
    kmeans_lloyd,
)


def build_ivf_index(
    corpus: DataFrame,
    coarse_k: int = 4,
    iters: int = 2,
    seed: int = 29,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Train the coarse quantizer and materialize the inverted lists
    (id, cluster, v) once. The eager localCheckpoint pins the assign
    kernel's output so every served batch re-scans stored blocks instead
    of re-running the kernel."""
    assigned, cents = kmeans_lloyd(
        corpus, k=coarse_k, iters=iters, id_col=id_col, vec_col=vec_col,
        seed=seed, emit_vector=True, return_centroids=True,
    )
    return assigned.localCheckpoint(), cents


def run_streaming_knn(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    index: tuple[DataFrame, list[tuple[int, list[float]]]],
    k: int = 5,
    nprobe: int = 2,
    schema: str = "vec_id long, embedding array<double>, "
    "event_time timestamp",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint_dir: str | None = None,
):
    """File-drop query-vector stream → per-batch top-k answers under
    `out_dir`/answers/batch=<id>/ (overwrite = replay-idempotent).
    `index` comes from `build_ivf_index` (train once, serve forever)."""
    assigned, cents = index
    answers_dir = os.path.join(out_dir, "answers")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        res = ivf_probe_frozen(
            assigned, batch, cents, k=k, nprobe=nprobe,
            id_col=id_col, vec_col=vec_col,
        )
        res.write.mode("overwrite").parquet(
            os.path.join(answers_dir, f"batch={batch_id}")
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .option(
            "checkpointLocation",
            checkpoint_dir or os.path.join(out_dir, "_checkpoint"),
        )
        .start()
    )
