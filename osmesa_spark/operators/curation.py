"""Dataset-curation operators for the training-data pipeline: deterministic
train/val/test split assignment, per-stratum hash sampling, and keep-best
dedup representatives.

These are the operations that turn a deduplicated document corpus into
training inputs. All three are designed for 100 TB from the start:

* `dataset_split` and `stratified_sample` are PURE PROJECTIONS — the split /
  keep decision is a function of a portable content-stable hash of the row's
  id, so no shuffle, no state, no sampling seed to coordinate across
  executors, and re-running on a grown corpus never reassigns an existing id
  (the property that keeps eval sets uncontaminated as data accretes).
* `keep_best_dedup` is one hash-aggregate on the content fingerprint with
  map-side combine: `max(struct(score, -id))` picks the highest-scoring
  (then lowest-id) member per duplicate group without a window function —
  a window would sort whole partitions; the agg carries one struct per group.

Hashing is the md5-based portable hash shared with the dedup operators so
the DuckDB oracle replays assignments bit-for-bit (swap for `F.xxhash64`
when oracle parity is not required — same design, cheaper hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osmesa_spark.functions.text import doc_fingerprint, quality_score
from osmesa_spark.operators.dedup import _portable_hash

# buckets-per-unit for split/sample thresholds: fractions are expressed in
# 1/10000ths so threshold comparison is exact integer math in both engines
_BUCKETS = 10_000


def split_bucket(id_col: Column | str, seed: int = 7) -> Column:
    """Deterministic bucket in [0, 10000) from a row id — the basis of
    split assignment and stratified sampling."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return _portable_hash(c.cast("string"), seed) % _BUCKETS


def _split_label(bucket: Column, weights: tuple[tuple[str, float], ...]) -> Column:
    """Bucket -> split-name CASE expression (weights cumulative left to
    right; the last split absorbs rounding)."""
    cum = 0.0
    expr = None
    for name, w in weights[:-1]:
        cum += w
        cond = bucket < int(round(cum * _BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = weights[-1][0]
    return F.lit(last) if expr is None else expr.otherwise(last)


def dataset_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[tuple[str, float], ...] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
    seed: int = 7,
) -> DataFrame:
    """Assign each row a split label by hashed-id bucket thresholds.

    Weights are cumulative left-to-right; they should sum to 1.0 (the last
    split absorbs rounding). Stateless and stable under corpus growth."""
    return df.withColumn(
        "split", _split_label(split_bucket(id_col, seed), weights)
    )


def leakage_safe_split(
    df: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[tuple[str, float], ...] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
    seed: int = 7,
) -> DataFrame:
    """Split assignment that can never separate near-duplicates across
    splits: the hash input is the duplicate-CLUSTER label, not the doc id.

    `components` is the (node, component_id) output of
    `dedup.connected_components` over the LSH dup graph; docs in no dup
    cluster fall back to their own id (coalesce), so the assignment is
    identical to `dataset_split` outside clusters and constant within
    them. This closes the classic eval-contamination hole where a
    per-document split puts one near-identical mirror in train and the
    other in test — with a per-cluster hash the whole mirror family lands
    on one side by construction.

    Scale shape: `components` only contains docs that appear in some dup
    pair (≪ corpus), so the left equi-join on id is AQE-broadcastable in
    the common case and a plain key-shuffle otherwise; the split itself
    stays a pure projection. Adding new corpus data never reassigns an
    existing cluster unless the new data merges two clusters (the correct
    behavior — the merged family must re-land on ONE side).

    Output: df columns + (group_key, split)."""
    comp = components.select(
        F.col("node").alias("__lss_node"),
        F.col("component_id").alias("__lss_comp"),
    )
    joined = df.join(comp, F.col(id_col) == F.col("__lss_node"), "left")
    # Coalesce on the STRING forms: casting a non-numeric string id to
    # bigint would null the hash input and silently dump every unclustered
    # doc into the last split instead of matching dataset_split's
    # string-hash assignment. String coalesce is identical for numeric ids
    # (bigint→string round-trips) and correct for opaque ones.
    group = F.coalesce(
        F.col("__lss_comp").cast("string"), F.col(id_col).cast("string")
    )
    bucket = split_bucket(group, seed)
    return joined.select(
        *[F.col(c) for c in df.columns],
        group.alias("group_key"),
        _split_label(bucket, weights).alias("split"),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 11,
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows (strata not listed
    in `fractions` are dropped). Hash-threshold, not `sample()`: exact
    reproducibility, no RNG state, filter pushes into the scan."""
    frac_map = F.create_map(
        *[
            c
            for k, v in sorted(fractions.items())
            for c in (F.lit(k), F.lit(int(round(v * _BUCKETS))))
        ]
    )
    threshold = F.element_at(frac_map, F.col(strata_col))
    return df.where(
        threshold.isNotNull() & (split_bucket(id_col, seed) < threshold)
    )


def keep_best_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    score: Column | None = None,
) -> DataFrame:
    """One representative per exact-duplicate group: highest `score`
    (default: quality_score of the text), ties to the lowest id.

    Returns (fingerprint, keep_id, best_score, dup_count). Single shuffle:
    groupBy(fingerprint) with an argmax encoded as max(struct(score, -id))
    so partial aggregation applies — no window, no second pass."""
    s = quality_score(text_col) if score is None else score
    per_row = df.select(
        doc_fingerprint(text_col).alias("fingerprint"),
        F.col(id_col).alias("id"),
        s.alias("score"),
    )
    return (
        per_row.groupBy("fingerprint")
        .agg(
            F.max(
                F.struct(
                    F.col("score").alias("score"),
                    (-F.col("id")).alias("neg_id"),
                )
            ).alias("best"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select(
            "fingerprint",
            (-F.col("best.neg_id")).cast("bigint").alias("keep_id"),
            F.col("best.score").alias("best_score"),
            "dup_count",
        )
    )


def curation_pipeline(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    payload_cols: tuple[str, ...] = ("lang",),
    min_quality: float = 0.5,
    seed: int = 7,
) -> DataFrame:
    """End-to-end corpus curation — dedup → quality gate → split — in ONE
    shuffle total.

    The keep-best representative carries its payload columns (lang, source,
    …) through the argmax struct, so there is no join back to the corpus
    after the groupBy(fingerprint); the quality gate and split assignment
    are pure projections on the aggregate's output. Plan: project →
    hash-aggregate (map-side combine) → filter → project. At 100 TB that is
    one exchange of (fingerprint, small-struct) rows — the minimum any
    content-keyed dedup can do.

    Output: (id, *payload_cols, quality, dup_count, split)."""
    s = F.struct(
        quality_score(text_col).alias("quality"),
        (-F.col(id_col)).alias("neg_id"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    agg = (
        df.select(doc_fingerprint(text_col).alias("fingerprint"), s.alias("s"))
        .groupBy("fingerprint")
        .agg(F.max("s").alias("best"), F.count(F.lit(1)).alias("dup_count"))
    )
    rep = agg.select(
        (-F.col("best.neg_id")).alias(id_col),
        *[F.col(f"best.{c}").alias(c) for c in payload_cols],
        F.col("best.quality").alias("quality"),
        "dup_count",
    )
    gated = rep.where(F.col("quality") >= min_quality)
    return dataset_split(gated, id_col=id_col, seed=seed)


def pack_assignment(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    token_col: Column | None = None,
    partition_col: Column | None = None,
) -> DataFrame:
    """Assign each document to a fixed-token-budget training pack:
    contiguous greedy fill in deterministic (hashed) order — the standard
    streaming sequence-packing rule (documents concatenated until the
    budget would overflow, then a new pack starts... approximated here as
    `pack = floor(cumulative_tokens_before / budget)`, the offset-bucket
    variant that never needs per-pack state).

    Output: (id, n_tokens, pack_id). One window pass: partitioned by a
    hash-derived shard (so pack numbering is deterministic AND no single
    ordering bottleneck exists — each shard packs independently, exactly
    how a distributed packer works), cumulative-summed in hashed-id order.
    At 100 TB each shard's window sorts only its own partition; pack ids
    are (shard, local_pack) pairs encoded as shard * 2^32 + local."""
    from pyspark.sql import Window

    from osmesa_spark.functions.text import token_count

    toks = token_count("text") if token_col is None else token_col
    shard = split_bucket(id_col, seed=13) % 64
    base = df.select(
        F.col(id_col).alias("id"),
        toks.cast("bigint").alias("n_tokens"),
        shard.alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.select(
        "id",
        "n_tokens",
        (
            F.col("shard").cast("bigint") * F.lit(2**32)
            + F.floor(before / F.lit(budget))
        ).alias("pack_id"),
    )


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 11,
) -> DataFrame:
    """Sample the LARGEST corpus achievable at a TARGET mixture: given
    domain weights w_s (the DoReMi / Pile-style mixture spec), find the
    binding stratum T = min_s n_s / w_s and keep each stratum at rate
    r_s = w_s·T / n_s — the stratum that runs out first is kept whole and
    every other stratum downsamples to match the target proportions.
    (`stratified_sample` takes per-stratum rates as given; this DERIVES
    them from the composition goal.)

    Scale shape: one #strata-row count aggregate, a 1-row global min that
    broadcasts back (the bounded crossJoin pattern), then the keep decision
    is the same pure-projection hash-threshold as `stratified_sample` — no
    per-stratum sort or window, so no single-reducer stratum at 100 TB.
    Achieved counts are binomial around r_s·n_s (±√n noise, the standard
    threshold-sampling tradeoff — documented, not hidden); the KEPT SET is
    fully deterministic in (id, seed). Strata not in `weights` drop.

    Thresholds quantize to 1/10000ths with a 9dp rounding guard before
    floor so the integer compare can't flip on cross-engine ULP noise."""
    w_map = F.create_map(
        *[
            c
            for k, v in sorted(weights.items())
            for c in (F.lit(k), F.lit(float(v)))
        ]
    )
    counts = (
        df.groupBy(F.col(strata_col).alias("__mx_s"))
        .agg(F.count(F.lit(1)).cast("double").alias("__mx_n"))
        .withColumn("__mx_w", F.element_at(w_map, F.col("__mx_s")))
        .where(F.col("__mx_w").isNotNull())
    )
    tmin = counts.agg(
        F.min(F.col("__mx_n") / F.col("__mx_w")).alias("__mx_tmin")
    )
    # internal columns carry a __mx_ prefix so the rates join can never
    # collide with (or silently drop) same-named caller columns
    rates = counts.crossJoin(F.broadcast(tmin)).select(
        "__mx_s",
        F.floor(
            F.round(
                F.col("__mx_w") * F.col("__mx_tmin") / F.col("__mx_n")
                * _BUCKETS,
                9,
            )
        ).cast("int").alias("__mx_thr"),
    )
    return (
        df.join(F.broadcast(rates), df[strata_col] == rates["__mx_s"])
        .where(split_bucket(id_col, seed) < F.col("__mx_thr"))
        .drop("__mx_s", "__mx_thr")
    )


def weighted_sample(
    df: DataFrame,
    weight: Column,
    n: int,
    id_col: str = "doc_id",
    seed: int = 17,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006): each row draws u ∈ (0,1) from the portable hash of its
    id and keys itself with u^(1/w); the n largest keys are the sample —
    inclusion probability ∝ weight, no RNG state, reproducible across
    engines and reruns. The quality-weighted subset selection a curation
    pipeline uses when "keep the best n" should still give lower-quality
    strata SOME probability mass (pure top-n-by-score would not).

    Scale shape: key assignment is a pure projection; the global top-n is
    TakeOrderedAndProject (per-partition partial top-n, then one merge of
    n-row heads — never a full sort). Keys round to 6dp with id
    tie-breaks, so cross-engine libm ULP noise in pow() cannot reorder
    except exactly at a rounding boundary (the knn cos-rounding
    contract)."""
    h = _portable_hash(F.col(id_col).cast("string"), seed)
    # uniform in (0, 1): never exactly 0 or 1, so pow is well-defined
    u = (h % F.lit(1_000_000_007) + 1) / F.lit(1_000_000_009.0)
    key = F.round(
        F.pow(u, 1.0 / F.greatest(weight.cast("double"), F.lit(1e-9))), 6
    )
    return (
        df.withColumn("sample_key", key)
        .orderBy(F.col("sample_key").desc(), F.col(id_col))
        .limit(n)
    )


def shard_assignment(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 17,
) -> DataFrame:
    """Deterministic output-shard assignment: shard = hash(id) % n_shards.

    The training-data writer's first half. Hash-based (not round-robin or
    monotonic id ranges) so shard membership is stable under corpus
    re-ordering and re-runs, size-balanced in expectation, and needs no
    coordination — a pure projection at 100 TB. Pair with
    `shard_manifest` for the loader-facing audit record."""
    if n_shards < 1:
        raise ValueError(f"shard_assignment: n_shards must be >= 1, got {n_shards}")
    return df.withColumn(
        "shard",
        (_portable_hash(F.col(id_col).cast("string"), seed) % n_shards).cast("int"),
    )


# order-independent manifest checksum: per-doc 60-bit portable hashes are
# folded mod this prime (residues < 1e9). The fold happens in TWO levels —
# per-(shard, salt) partial sums are reduced mod p before the final
# per-shard sum — so no intermediate ever exceeds ~1e9 × _MANIFEST_SALTS
# ≈ 1e12 and the digest stays overflow-free past 10^12 docs/shard (a
# single-level sum would wrap silently at ~9.2e9 docs/shard). Modular
# reduction is associative over grouping, so the two-level digest is
# bit-identical to the single-level one.
_MANIFEST_PRIME = 1_000_000_007
_MANIFEST_SALTS = 1024


def shard_manifest(
    sharded: DataFrame,
    id_col: str = "doc_id",
    token_col: Column | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Per-shard manifest for a sharded corpus: (shard, n_docs, n_tokens,
    id_lo, id_hi, checksum).

    The checksum is an ORDER-INDEPENDENT content digest — sum of per-doc
    hashes mod a prime — so two writers that produce the same shard
    membership produce the same manifest regardless of partition order /
    parallelism, and a loader can verify a shard it re-read without
    sorting it. One hash-aggregate with map-side combine; no window, no
    sort. This is the reproducibility contract training loaders need
    (epoch seeding, resharding audits, corrupt-shard detection)."""
    from osmesa_spark.functions.text import token_count

    toks = token_count(text_col) if token_col is None else token_col
    doc_h = _portable_hash(F.col(id_col).cast("string"), 23) % _MANIFEST_PRIME
    # two-level fold: the salt spreads each shard over _MANIFEST_SALTS
    # partial groups (also de-skewing a hot shard's reduce), the inner
    # `% p` bounds every partial, and the outer sum of < p partials can't
    # wrap — same digest value, no silent BIGINT overflow at extreme scale
    partial = (
        sharded.groupBy("shard", (doc_h % _MANIFEST_SALTS).alias("__salt"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(toks.cast("bigint")).alias("n_tokens"),
            F.min(id_col).alias("id_lo"),
            F.max(id_col).alias("id_hi"),
            (F.sum(doc_h) % _MANIFEST_PRIME).alias("cs"),
        )
    )
    return partial.groupBy("shard").agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.min("id_lo").alias("id_lo"),
        F.max("id_hi").alias("id_hi"),
        (F.sum("cs") % _MANIFEST_PRIME).alias("checksum"),
    )


def merge_manifests(a: DataFrame, b: DataFrame) -> DataFrame:
    """Combine two shard manifests over DISJOINT row sets into the manifest
    of their union — without touching the data.

    This is the incremental-ingest contract: append a new batch's manifest
    to yesterday's instead of rescanning the corpus. Counts and token sums
    add, id ranges widen, and the mod-prime checksum adds (sum-fold is a
    homomorphism: checksum(A ∪ B) = (checksum(A) + checksum(B)) mod p for
    disjoint A, B) — property-tested against a from-scratch recompute.
    One union + one #shards-row agg."""
    cols = ["shard", "n_docs", "n_tokens", "id_lo", "id_hi", "checksum"]
    return (
        a.select(cols)
        .unionAll(b.select(cols))
        .groupBy("shard")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("id_lo").alias("id_lo"),
            F.max("id_hi").alias("id_hi"),
            (F.sum("checksum") % _MANIFEST_PRIME).alias("checksum"),
        )
    )


def quality_source_norm(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    gk_grid: int = 256,
    gk_accuracy: int = 10_000_000,
) -> DataFrame:
    """Per-source quality-score normalization: each doc's quality
    percentile WITHIN its source next to its global percentile — the
    comparability fix before one corpus-wide quality threshold (a raw
    cutoff silently biases the mix toward whichever source's scorer runs
    hot; FineWeb-style pipelines gate on within-source rank instead).

    percentile = percent_rank ∈ [0,1] with a deterministic (quality,
    id) ordering; both engines rank identical 4dp-rounded scores, so the
    output is exactly replayable.

    Scale shape — NO corpus-wide window. The exact global percent_rank
    decomposes into two bounded pieces:
      rank(doc) = (# docs with strictly smaller quality)
                  + row_number within its quality tie-group (ordered by id)
    so the plan is (a) a `groupBy(quality)` value histogram — the 4dp
    quantization bounds it at ≤ a few thousand rows, and because a value
    histogram merges map-side it IS the zero-error mergeable sketch for a
    quantized score — (b) a cumulative sum over that DIMENSION table
    (single-partition window over ≤10⁴ rows, the hashtag-dictionary
    class, nowhere near corpus-sized), broadcast back, and (c) a
    `row_number` window partitioned BY quality, bounded by the largest
    tie-group. The residual exact-path risk is a degenerate tie-group
    (e.g. billions of identical empty-doc scores); `pct_global_gk` is the
    unconditionally-safe companion: a Greenwald-Khanna sketch
    (`percentile_approx`, mergeable, O(accuracy·log n) memory) queried at
    a `gk_grid`-point probability grid, each doc's percentile read off by
    counting grid breakpoints ≤ its quality — rank error ≤ 1/gk_grid + ε.
    gk_grid defaults to a POWER OF TWO so every grid probability i/256 and
    every rank product p·n is an exact dyadic double: both engines then
    compute the identical ceil(p·n) rank (a 200-point grid hit a real
    boundary at sf0.1 — 0.035·5000 = 175.000…003 — ceiling to 176 in
    Spark but 175 in DuckDB).
    At `gk_accuracy` ≥ corpus rows GK degenerates to exact order
    statistics (same contract `price_quantiles_sketch` pins), which is
    what makes the column hash-oracle-able; production drops accuracy.

    Output: (id_col, source, quality, pct_in_source, pct_global,
    pct_global_gk, keep_src_q50)."""
    from pyspark.sql import Window

    from osmesa_spark.functions.text import quality_score

    # null text scores as empty (repo-wide null-survival convention) —
    # without the coalesce, quality would be NULL and the two engines'
    # percent_rank null orderings diverge (Spark NULLS FIRST asc, DuckDB
    # NULLS LAST)
    base = df.select(
        F.col(id_col),
        F.col(source_col).alias("source"),
        F.round(
            quality_score(F.coalesce(F.col(text_col), F.lit(""))), 4
        ).alias("quality"),
    )
    w_src = Window.partitionBy("source").orderBy("quality", id_col)
    # (a)+(b): quality-value histogram → dimension-sized cumulative
    w_dim_before = Window.orderBy("quality").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_dim_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    qdim = (
        base.groupBy("quality")
        .agg(F.count(F.lit(1)).alias("n_q"))
        .select(
            "quality",
            F.coalesce(F.sum("n_q").over(w_dim_before), F.lit(0)).alias(
                "cum_before"
            ),
            F.sum("n_q").over(w_dim_all).alias("n_total"),
        )
    )
    # GK sketch: one mergeable agg over the corpus, gk_grid breakpoints
    probs = F.array(
        *[F.lit(i / gk_grid) for i in range(1, gk_grid + 1)]
    )
    breaks = base.agg(
        F.percentile_approx("quality", probs, F.lit(gk_accuracy)).alias(
            "gk_breaks"
        )
    )
    # (c): per-tie-group row_number, then exact rank by addition
    w_q = Window.partitionBy("quality").orderBy(id_col)
    return (
        base.join(F.broadcast(qdim), "quality")
        .crossJoin(F.broadcast(breaks))
        .select(
            id_col,
            "source",
            "quality",
            F.round(F.percent_rank().over(w_src), 6).alias("pct_in_source"),
            F.when(
                F.col("n_total") > 1,
                F.round(
                    (
                        F.col("cum_before")
                        + F.row_number().over(w_q)
                        - F.lit(1)
                    )
                    / (F.col("n_total") - F.lit(1)),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("pct_global"),
            F.round(
                F.size(
                    F.filter(
                        "gk_breaks", lambda b: b <= F.col("quality")
                    )
                )
                / F.lit(float(gk_grid)),
                6,
            ).alias("pct_global_gk"),
        )
        .withColumn("keep_src_q50", F.col("pct_in_source") >= F.lit(0.5))
    )


def dsir_weights(
    df: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    seed: int = 29,
    add_k: float = 0.5,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw document
    by how much more likely its hashed-n-gram bag is under the TARGET
    distribution than under the RAW distribution —
    log w(d) = Σ_b n_db · (ln p_tgt(b) − ln p_raw(b)) — then resample the
    corpus proportionally to w. This is the standard recipe for tilting a
    web-scale crawl toward a small high-quality target (e.g. a curated
    reference corpus) without training a classifier.

    `target` is a boolean Column over df's rows marking the target sample
    (a held-out quality subset, a reference domain, …). Both multinomials
    are add-k smoothed over the fixed bucket vocabulary, so zero-count
    buckets are well-defined and the weight of an empty doc is exactly 0.

    Plan shape (100 TB): tokenize + bucket-hash are row-local; ONE
    (doc, bucket) partial-count shuffle feeds both distribution fits (the
    instance table is localCheckpointed — the raw fit, the target fit and
    the scoring join all read it once); the fitted log-ratio table is
    exactly `n_buckets` rows (a few thousand) and BROADCASTS into the
    scoring join, so the per-doc score is one broadcast equi-join plus a
    doc-keyed partial agg. Nothing scales with vocabulary or corpus size
    except the two bounded aggs. Weights are deterministic (portable
    hashing, fixed smoothing) — rerunning on a grown corpus re-fits both
    distributions, which is the paper's semantics (the raw distribution IS
    the corpus being selected from).

    Output: (id, n_tokens, logw) — logw rounded to 6dp so float sums are
    engine-portable; selection = any top-k / threshold over logw."""
    from osmesa_spark.functions.text import word_tokens
    from osmesa_spark.operators.dedup import _portable_hash
    from osmesa_spark.util import ensure_parallelism

    base = ensure_parallelism(
        df.select(F.col(id_col).alias("id"), text_col, target.alias("is_tgt")),
        "id",
    )
    bucket = lambda t: _portable_hash(t, seed) % n_buckets  # noqa: E731
    inst = (
        base.select(
            "id",
            "is_tgt",
            F.explode(
                F.transform(word_tokens(text_col), bucket)
            ).alias("b"),
        )
        .groupBy("id", "is_tgt", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    fits = (
        inst.groupBy("b")
        .agg(
            F.sum("n").alias("c_raw"),
            F.sum(F.when(F.col("is_tgt"), F.col("n")).otherwise(0)).alias(
                "c_tgt"
            ),
        )
    )
    totals = fits.agg(
        F.sum("c_raw").alias("t_raw"), F.sum("c_tgt").alias("t_tgt")
    )
    # log-ratio per OBSERVED bucket; unobserved buckets never join a doc
    # instance, so only the smoothing denominators need the full vocabulary
    ratio = fits.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            F.log(
                (F.col("c_tgt") + add_k)
                / (F.col("t_tgt") + add_k * n_buckets)
            )
            - F.log(
                (F.col("c_raw") + add_k)
                / (F.col("t_raw") + add_k * n_buckets)
            )
        ).alias("lr"),
    )
    scored = (
        inst.join(F.broadcast(ratio), "b")
        .groupBy("id")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.round(F.sum(F.col("n") * F.col("lr")), 6).alias("logw"),
        )
    )
    # docs with zero tokens never produce instances — restore them at 0
    return (
        base.select("id").join(scored, "id", "left").select(
            "id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("logw", F.lit(0.0)).alias("logw"),
        )
    )


def dsir_score(
    df: DataFrame,
    ratio: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    seed: int = 29,
) -> DataFrame:
    """Score documents against a FROZEN DSIR log-ratio table — the serving
    half of `dsir_weights`. Train the ratio once on a reference corpus
    (`dsir_weights`' `ratio` subtree, or any (b, lr) table), then score
    arriving data against it without refitting — the shape an ingest
    pipeline needs, where the target distribution is a fixed curation
    contract rather than a function of each batch.

    `ratio` is a (b, lr) DataFrame with `b` in [0, n_buckets) hashed with
    the SAME (n_buckets, seed); buckets absent from the table contribute 0
    (unseen-in-training vocabulary is uninformative by construction).

    Plan shape: one (doc, bucket) partial-count shuffle + a broadcast
    equi-join against the ≤ n_buckets-row ratio + one doc-keyed agg —
    per BATCH cost at ingest time, independent of the history.

    Output: (id, n_tokens, logw) — empty docs restored at exactly 0."""
    from osmesa_spark.functions.text import word_tokens
    from osmesa_spark.operators.dedup import _portable_hash
    from osmesa_spark.util import ensure_parallelism

    base = ensure_parallelism(
        df.select(F.col(id_col).alias("id"), text_col), "id"
    )
    inst = (
        base.select(
            "id",
            F.explode(
                F.transform(
                    word_tokens(text_col),
                    lambda t: _portable_hash(t, seed) % n_buckets,
                )
            ).alias("b"),
        )
        .groupBy("id", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    scored = (
        inst.join(F.broadcast(ratio.select("b", "lr")), "b", "left")
        .groupBy("id")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.round(
                F.sum(F.col("n") * F.coalesce(F.col("lr"), F.lit(0.0))), 6
            ).alias("logw"),
        )
    )
    return base.select("id").join(scored, "id", "left").select(
        "id",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("logw", F.lit(0.0)).alias("logw"),
    )


def dsir_ratio(
    df: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    seed: int = 29,
    add_k: float = 0.5,
) -> DataFrame:
    """The trained DSIR log-ratio table alone — (b, lr) over the observed
    buckets, fit exactly as `dsir_weights` fits it. Persist this once from
    the reference corpus and hand it to `dsir_score` at ingest time."""
    from osmesa_spark.functions.text import word_tokens
    from osmesa_spark.operators.dedup import _portable_hash
    from osmesa_spark.util import ensure_parallelism

    base = ensure_parallelism(
        df.select(text_col, target.alias("is_tgt")), text_col
    )
    fits = (
        base.select(
            "is_tgt",
            F.explode(
                F.transform(
                    word_tokens(text_col),
                    lambda t: _portable_hash(t, seed) % n_buckets,
                )
            ).alias("b"),
        )
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("c_raw"),
            F.sum(F.when(F.col("is_tgt"), 1).otherwise(0)).alias("c_tgt"),
        )
    )
    totals = fits.agg(
        F.sum("c_raw").alias("t_raw"), F.sum("c_tgt").alias("t_tgt")
    )
    return fits.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            F.log(
                (F.col("c_tgt") + add_k)
                / (F.col("t_tgt") + add_k * n_buckets)
            )
            - F.log(
                (F.col("c_raw") + add_k)
                / (F.col("t_raw") + add_k * n_buckets)
            )
        ).alias("lr"),
    )


def group_topk_salted(
    df: DataFrame,
    k: int,
    group_col: str,
    order_by: "list[Column]",
    id_col: str = "doc_id",
    n_salt: int = 8,
) -> DataFrame:
    """Top-K rows per group under a TOTAL order, with NO unbounded window
    partition — the skew-safe shape of the per-domain document cap at
    100 TB (a single dominant domain otherwise lands its entire row set
    in ONE window partition: O(1) rank state, but the sort of that
    partition is a straggler task as long as the domain is large).

    Two phases, both with bounded partitions:

      1. LOCAL top-K per (group, salt) — salt is a deterministic hash of
         the row key (replayable, no RNG), so every salt bucket holds
         ~1/n_salt of even the hottest group. Any row in the group's
         global top-K is necessarily in its bucket's local top-K, so
         phase 1 never discards a winner.
      2. EXACT top-K per group over the survivors — at most k·n_salt rows
         per group reach this window, so the final sort is O(k·n_salt)
         per group regardless of the group's true size.

    `order_by` must be a TOTAL order (include the id as tiebreaker) or
    ranks are nondeterministic. Returns the input columns + `rank`
    (1..K within group). For ALL-rows ranking (every doc gets a rank,
    like the `source_doc_cap` diagnostic) the full per-group sort is
    inherent to the output — use the plain window and accept the
    straggler; cap queries only need the kept rows, which is what this
    shape computes.

    Cited shape: the Gopher/FineWeb 'domain cap' anti-spam rule; same
    two-phase trick as Spark's TakeOrderedAndProject, applied per group.

    Measured (local[32], 32M-row hot domain + 20 cold domains, medians of
    3): plain window 3.9 s vs salted 4.0 s — NEUTRAL locally, because both
    pay the same 32M-row exchange and an in-memory single-task sort is
    fast. The shape exists for the cluster regime the local bench cannot
    reach: a domain holding billions of rows makes the plain window's one
    partition exceed executor memory (disk-spill sort, hours-long
    straggler), while every salted partition stays ~1/n_salt of the
    domain and phase 2 is O(k·n_salt). Equality with the plain window is
    pinned by tests/test_properties.py::test_group_topk_salted_matches_window."""
    from pyspark.sql import Window

    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salt))
    w1 = Window.partitionBy(group_col, "__salt").orderBy(*order_by)
    local = (
        df.withColumn("__salt", salt)
        .withColumn("__r", F.row_number().over(w1))
        .where(F.col("__r") <= k)
        .drop("__salt", "__r")
    )
    w2 = Window.partitionBy(group_col).orderBy(*order_by)
    return (
        local.withColumn("rank", F.row_number().over(w2).cast("int"))
        .where(F.col("rank") <= k)
    )
