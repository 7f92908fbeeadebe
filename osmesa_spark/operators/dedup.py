"""Deduplication operators for the training-data pipeline.

Four tiers, cheapest-first (each one a candidate-pruning stage for the next):

1. exact        — hash-groupBy on normalized content (one shuffle, partial agg)
2. minhash+LSH  — shingle → K minhashes → B bands → band-bucket join;
                  only same-bucket pairs are compared (Broder '97 / LSH).
3. simhash      — 64-bit weighted-projection fingerprint; near-dups differ in
                  few bits (Charikar '02, used at web scale in Manku '07).
4. n-gram Jaccard — exact verification on the LSH candidate pairs.

Scale notes: nothing here collects to the driver; every stage is an
explode/groupBy/join of narrow rows, so it partitions by content hash and
scales linearly. The only O(n²) surface is *within an LSH bucket*, bounded by
band width. Portable hashing: md5-hex→int (same bits in any engine) so the
DuckDB oracle can replay signatures exactly — xxhash64 would be faster but is
Spark-private; swap `_portable_hash` for `F.xxhash64` when oracle parity is
not required.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osmesa_spark.functions.text import doc_fingerprint, shingles, word_tokens
from osmesa_spark.util import ensure_parallelism


def _portable_hash(col: Column, seed: int) -> Column:
    """Deterministic 60-bit integer hash reproducible in DuckDB:
    bigint(first 15 hex chars of md5(seed || value))."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(str(seed) + ":"), col)), 1, 15), 16, 10
    ).cast("bigint")


# Universal-hash MinHash: ONE md5 per shingle, then K cheap affine rehashes
# h_i(x) = (a_i * x + b_i) mod p with p = 2^31 - 1. Keeping x < 2^31 bounds
# a_i * x < 2^62 so 64-bit arithmetic never overflows (ANSI mode safe).
MINHASH_PRIME = 2_147_483_647


def _minhash_coeffs(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, MINHASH_PRIME), rng.randrange(0, MINHASH_PRIME))
        for _ in range(num_hashes)
    ]


def base_shingle_hash(col: Column) -> Column:
    """Portable base hash of a shingle, reduced below 2^31."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")
        % MINHASH_PRIME
    )


def _base_shingle_hash_sql(col_sql: str) -> str:
    """SQL-string twin of `base_shingle_hash`."""
    return (
        f"(CAST(conv(substring(md5({col_sql}), 1, 15), 16, 10) AS BIGINT)"
        f" % {MINHASH_PRIME})"
    )


def gram_hash60(col: Column) -> Column:
    """Full-width (60-bit) portable gram hash for identity joins/counts.
    Unlike `base_shingle_hash`, NOT reduced below 2^31 — that reduction is
    a MinHash overflow guard and birthday-collides around ~46k distinct
    grams, which corrupts exact gram-identity semantics. DuckDB mirror:
    ('0x' || substr(md5(g), 1, 15))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup on normalized-content fingerprint. Returns one row per
    distinct content: (fingerprint, keep_id = min id, dup_count).

    Plan shape: project → hash-aggregate (map-side combine) → single shuffle
    on fingerprint. At 100 TB this is the cheapest possible full-data dedup."""
    return (
        df.select(
            doc_fingerprint(text_col).alias("fingerprint"), F.col(id_col)
        )
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig: array<bigint>[num_hashes]) — min over shingles of K affine
    rehashes of ONE portable base hash per shingle; explode-free via
    transform+array_min, all in whole-stage codegen."""
    from osmesa_spark.functions.litexpr import q as _qn
    from osmesa_spark.functions.text import shingles_sql, word_tokens_sql

    coeffs = _minhash_coeffs(num_hashes)
    text_sql = _qn(text_col)
    # Row-pruning filter uses a CHEAP expression: any filter here is pushed
    # below the repartition exchange by Catalyst, so an expensive one would
    # serialize the whole hash pipeline into the (possibly single-split)
    # scan stage. size(tokens) >= n  ⟺  size(shingles) > 0.
    kept = df.select(id_col, text_col).where(
        F.expr(f"size({word_tokens_sql(text_sql)}) >= {shingle_n}")
    )
    # per-shingle md5 is the CPU hot spot: spread small scans across cores
    kept = ensure_parallelism(kept, id_col)
    base = (
        f"transform({shingles_sql(text_sql, shingle_n)}, "
        f"s -> {_base_shingle_hash_sql('s')})"
    )
    # The base hash array is materialized into its OWN projection column,
    # then each of the K affine minima is one array_min(transform(...))
    # pass over that column. Referencing a multi-used non-cheap alias
    # blocks CollapseProject (Spark 3.3+), so the md5 base hash still runs
    # exactly once per shingle — verified: ONE md5 in the plan, values
    # bit-identical. vs the former K-slot fold (one aggregate allocating a
    # K-array PER SHINGLE): ~20% faster on the sf0.1 signature pass (r11
    # noop A/B: 0.46 -> 0.38 s median) — K length-S passes allocate K
    # arrays per doc instead of S arrays of K. Rendered as ONE SQL-string
    # F.expr parse: the DSL form cost ~0.9 s of py4j driver chatter per
    # construction (see functions/litexpr.py).
    hv = kept.select(F.col(id_col).alias("id"), F.expr(base).alias("__hv"))
    mins = ",".join(
        f"array_min(transform(`__hv`, h -> (h * {a} + {b})"
        f" % {MINHASH_PRIME}))"
        for a, b in coeffs
    )
    return hv.select("id", F.expr(f"array({mins})").alias("sig"))


def _pair_combinations(ids: Column) -> Column:
    """All (id_a < id_b) pairs from a SORTED id array, in-column:
    array<struct<id_a, id_b>> of size n·(n−1)/2."""
    return F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.greatest(F.size(ids) - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    bands: int = 4,
    rows_per_band: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """Band the signature and emit candidate pairs per (band, band-hash)
    bucket. Returns (id_a, id_b) pairs with id_a < id_b, distinct.

    Shape: groupBy(band, bucket) → collect member ids → in-column pair
    combinations — NOT a bucket self-join. A self-join executes the whole
    minhash lineage twice (Catalyst does not dedupe a plan referenced on
    both sides); the groupBy computes signatures once and shuffles one
    narrow (band, bucket, id) row per membership. Cross-bucket pairs are
    never materialized — the LSH guarantee that keeps near-dup detection
    subquadratic. Bucket membership lists are small by design (near-dup
    buckets); a pathological hot bucket is O(n²) in EITHER shape, and
    the pair explosion happens after the exchange at full parallelism.

    `max_bucket` caps degenerate buckets at 100 TB scale: a bucket holding
    millions of ids (boilerplate/empty-text collisions) would materialize
    one reducer-side array AND emit useless O(n²) candidates — standard
    LSH practice (datasketch, Spark MinHashLSH) bounds such buckets, since
    exact grouping of their members is cheaper than pairing them. Members
    of an over-cap bucket are NOT silently dropped: they are routed
    through exact FULL-SIGNATURE dedup — grouped by the whole minhash
    signature and connected to the group's min-id representative by
    linear star edges — so certainly-duplicate docs (the usual cause of a
    degenerate bucket) still reach the verify/CC stages, while
    distinct-signature hash collisions (the useless O(n²) part) are the
    only thing skipped; those may still pair via their other bands. The
    cap branch never collects an over-cap member list: it is a count
    aggregate + two broadcast joins + a min-by-key join, all linear.
    None (default) keeps exact all-pairs semantics for the fixture-scale
    oracle. Measured cost of the cap (sf0.1, local[32], A/B same session):
    ~0.3-0.5 s per call (~25-40%) — the census pass + signature
    materialization that bound reducer memory; worth it everywhere a real
    corpus can contain boilerplate floods."""
    if max_bucket is not None:
        # the cap branch fans into three consumers (size census, anti-join,
        # semi-join): pin the SIGNATURES once — one narrow row per doc —
        # so the minhash md5 hot path never re-executes per branch; the
        # banding below is cheap integer/concat work each consumer
        # re-derives from the materialized rows
        sigs = sigs.localCheckpoint(eager=False)
    band_structs = ",".join(
        "named_struct('band', {b}, 'bucket', concat_ws(',', {elems}))".format(
            b=b,
            elems=",".join(
                f"CAST(element_at(`sig`, {b * rows_per_band + r + 1}) "
                f"AS STRING)"
                for r in range(rows_per_band)
            ),
        )
        for b in range(bands)
    )
    banded = sigs.select(
        "id",
        # full-signature fingerprint for the over-cap exact-dedup route;
        # one narrow bigint per membership, never the sig array itself
        F.xxhash64("sig").alias("sig_key"),
        F.expr(f"explode(array({band_structs}))").alias("bb"),
    ).select("id", "sig_key", "bb.band", "bb.bucket")
    if max_bucket is not None:
        over = (
            banded.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > max_bucket)
            .select("band", "bucket")
        )
        # over-cap (band,bucket) keys are pathologies, few by definition —
        # broadcast them as an exclusion list rather than shuffling the
        # corpus-sized membership table against itself
        small = banded.join(F.broadcast(over), ["band", "bucket"], "left_anti")
        members = (
            banded.join(F.broadcast(over), ["band", "bucket"], "left_semi")
            .select("id", "sig_key")
            .distinct()
        )
        reps = members.groupBy("sig_key").agg(F.min("id").alias("__rep"))
        star = (
            members.join(reps, "sig_key")
            .where(F.col("id") != F.col("__rep"))
            .select(F.col("__rep").alias("id_a"), F.col("id").alias("id_b"))
        )
    else:
        small, star = banded, None
    buckets = (
        small.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("id")).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    pairs = buckets.select(
        F.explode(_pair_combinations(F.col("ids"))).alias("p")
    ).select("p.id_a", "p.id_b")
    if star is not None:
        pairs = pairs.unionByName(star)
    return pairs.distinct()


def sparse_cosine_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int = 100,
    threshold: float = 0.6,
) -> DataFrame:
    """Sparse TF-IDF cosine near-dup pairs via INVERTED-INDEX join — the
    token-space counterpart of MinHash (exact weights, no signature
    approximation). Per-(doc, term) tf·idf weights; a term-keyed self-join
    accumulates partial dot products; full doc norms normalize.

    Scale bound: terms with document frequency > `max_df` are pruned from
    the INDEX (not the norms — pruning can only LOWER similarity, never
    inflate it). This is the standard sparse-all-pairs trick: a stop-word
    shared by every doc otherwise contributes O(N²) join rows through one
    posting list. At 100 TB keep max_df ≪ corpus size (e.g. 1e5).
    Measured flood evidence: tests/test_properties.py::
    test_sparse_cosine_survives_stopword_flood.

    Output: (id_a, id_b, cos) — id_a < id_b, cos 6dp, cos >= threshold."""
    from osmesa_spark.functions.text import word_tokens

    words = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_tokens(text_col)).alias("w"),
    )
    # tf feeds THREE consumers (the n_docs scalar, the df_ marginal and
    # the wts projection) — without a pin the tokenize+count subtree runs
    # once under the n_docs job and TWICE more inside the final action
    # (Catalyst plans the subtree per reference). Lazy checkpoint: the
    # n_docs count below materializes it; everything downstream reads the
    # (doc_id, w, tf) counter blocks.
    tf = words.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    ).localCheckpoint(eager=False)
    df_ = tf.groupBy("w").agg(F.count(F.lit(1)).cast("double").alias("df"))
    n_docs = tf.select("doc_id").distinct().count()
    wts = tf.join(df_, "w").select(
        "doc_id",
        "w",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("wt"),
        "df",
    )
    norms = wts.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("wt") * F.col("wt"))).alias("nrm")
    )
    idx = wts.where(F.col("df") <= max_df).select("doc_id", "w", "wt")
    a = idx.select(
        F.col("doc_id").alias("id_a"), "w", F.col("wt").alias("wa")
    )
    b = idx.select(
        F.col("doc_id").alias("id_b"), "w", F.col("wt").alias("wb")
    )
    dots = (
        a.join(b, "w")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("id_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("id_b"), F.col("nrm").alias("nb"))
    cos = F.round(
        F.col("dot") / F.greatest(F.col("na") * F.col("nb"), F.lit(1e-12)), 6
    )
    # no broadcast HINT on the norm joins: norms is PER-DOC (corpus-sized
    # at 100 TB) — forcing it into executor memory is the one shape that
    # cannot scale. Catalyst still broadcasts when the side fits the
    # threshold; above it the join degrades to SMJ on id (regime-tested).
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select("id_a", "id_b", cos.alias("cos"))
        .where(F.col("cos") >= F.lit(threshold))
    )


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs: (id_a, id_b, jaccard) with
    jaccard ≥ threshold. Shingle sets are joined in (two broadcast-or-shuffle
    hash joins keyed on id), then compared with array set ops in-column."""
    from osmesa_spark.functions.litexpr import q as _qn
    from osmesa_spark.functions.text import shingles_sql

    sh = ensure_parallelism(df.select(id_col, text_col), id_col).select(
        F.col(id_col).alias("id"),
        F.expr(
            f"array_distinct({shingles_sql(_qn(text_col), shingle_n)})"
        ).alias("sh"),
    )
    # One join, not two: explode each pair into (id_a, id_b, id) rows, join
    # the shingle sets once, re-pair with a groupBy on the pair key. Joining
    # sh per side would execute the shingle-hash projection (the CPU hot
    # spot) twice — Catalyst does not dedupe a subplan referenced twice.
    sides = pairs.select(
        "id_a", "id_b", F.explode(F.array("id_a", "id_b")).alias("id")
    )
    joined = (
        sides.join(sh, "id")
        .groupBy("id_a", "id_b")
        .agg(
            F.first(
                F.when(F.col("id") == F.col("id_a"), F.col("sh")),
                ignorenulls=True,
            ).alias("sh_a"),
            F.first(
                F.when(F.col("id") == F.col("id_b"), F.col("sh")),
                ignorenulls=True,
            ).alias("sh_b"),
        )
        .where(F.col("sh_a").isNotNull() & F.col("sh_b").isNotNull())
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        joined.select(
            "id_a",
            "id_b",
            F.round(inter / F.greatest(union, F.lit(1.0)), 4).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def containment_verify(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """DIRECTIONAL n-gram containment on candidate pairs:
    cont_a = |A∩B|/|A| (fraction of A's shingles inside B), cont_b
    symmetric; keep pairs with max(cont_a, cont_b) ≥ threshold. Catches
    sub-document duplication — a short doc quoted inside a long one scores
    near-1 containment while its Jaccard stays low (the CCNet/RefinedWeb
    sub-dup signal the symmetric metric misses). Same single-join shape as
    jaccard_verify."""
    from osmesa_spark.functions.litexpr import q as _qn
    from osmesa_spark.functions.text import shingles_sql

    sh = ensure_parallelism(df.select(id_col, text_col), id_col).select(
        F.col(id_col).alias("id"),
        F.expr(
            f"array_distinct({shingles_sql(_qn(text_col), shingle_n)})"
        ).alias("sh"),
    )
    sides = pairs.select(
        "id_a", "id_b", F.explode(F.array("id_a", "id_b")).alias("id")
    )
    joined = (
        sides.join(sh, "id")
        .groupBy("id_a", "id_b")
        .agg(
            F.first(
                F.when(F.col("id") == F.col("id_a"), F.col("sh")),
                ignorenulls=True,
            ).alias("sh_a"),
            F.first(
                F.when(F.col("id") == F.col("id_b"), F.col("sh")),
                ignorenulls=True,
            ).alias("sh_b"),
        )
        .where(F.col("sh_a").isNotNull() & F.col("sh_b").isNotNull())
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    cont_a = inter / F.greatest(F.size("sh_a").cast("double"), F.lit(1.0))
    cont_b = inter / F.greatest(F.size("sh_b").cast("double"), F.lit(1.0))
    return (
        joined.select(
            "id_a",
            "id_b",
            F.round(cont_a, 4).alias("cont_a"),
            F.round(cont_b, 4).alias("cont_b"),
        )
        .where(F.greatest("cont_a", "cont_b") >= threshold)
    )


def simhash64(text: Column | str, token_hash_bits: int = 60) -> Column:
    """64-bit (well, `token_hash_bits`-bit) SimHash of word tokens, pure
    Column HOFs: per-bit vote = sum over tokens of (+1 if bit set else -1);
    fingerprint bit b = vote > 0. Implemented as a fold over bit positions."""
    toks = word_tokens(text)
    hashed = F.transform(toks, lambda t: _portable_hash(t, 0))
    pow2 = F.array(
        *[F.lit(1 << b).cast("bigint") for b in range(token_hash_bits)]
    )
    # One fold with a bits-wide vote accumulator — per-bit aggregates would
    # re-inline the token-hash transform `token_hash_bits` times (Catalyst
    # subexpression elimination skips lambda-bearing exprs). Bit b of h is
    # tested as h & 2^b != 0 against the literal powers array.
    votes = F.aggregate(
        hashed,
        F.array_repeat(F.lit(0), token_hash_bits),
        lambda acc, h: F.zip_with(
            acc,
            pow2,
            lambda a, p: a + F.when(h.bitwiseAND(p) != 0, 1).otherwise(-1),
        ),
    )
    # set bits have disjoint power-of-two values, so sum == bitwise-or
    return F.aggregate(
        F.zip_with(
            votes,
            pow2,
            lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def simhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_bits: int = 16,
    max_hamming: int = 8,
    bits: int = 60,
) -> DataFrame:
    """Near-dup pairs by SimHash: block on the top `prefix_bits` of the
    fingerprint (Manku-style single-table probe), then exact Hamming ≤
    max_hamming within a block via bit_count(xor)."""
    sh = ensure_parallelism(df.select(id_col, text_col), id_col).select(
        F.col(id_col).alias("id"), simhash64(text_col, bits).alias("sh")
    )
    blocked = sh.withColumn(
        "block", F.shiftrightunsigned("sh", bits - prefix_bits)
    )
    # groupBy(block) + in-column pairing instead of a block self-join: the
    # self-join would run the simhash fold (the CPU hot spot) on both sides;
    # this computes each fingerprint once and shuffles one narrow row per
    # doc. Members sort by (id, sh) struct so pairs come out id_a < id_b.
    members = blocked.groupBy("block").agg(
        F.array_sort(F.collect_list(F.struct("id", "sh"))).alias("ms")
    ).where(F.size("ms") >= 2)
    pair = F.explode(
        F.flatten(
            F.transform(
                F.col("ms"),
                lambda x, i: F.transform(
                    F.slice(
                        F.col("ms"),
                        i + 2,
                        F.greatest(F.size("ms") - i - 1, F.lit(0)),
                    ),
                    lambda y: F.struct(
                        x["id"].alias("id_a"),
                        y["id"].alias("id_b"),
                        F.bit_count(x["sh"].bitwiseXOR(y["sh"])).alias(
                            "hamming"
                        ),
                    ),
                ),
            )
        )
    )
    return (
        members.select(pair.alias("p"))
        .select("p.id_a", "p.id_b", "p.hamming")
        .where(F.col("hamming") <= max_hamming)
    )


def _cc_raw(pairs: DataFrame, id_a: str, id_b: str) -> DataFrame:
    """Normalize a pair frame to bigint (a, b) and materialize it ONCE —
    the pair subtree upstream (typically the whole LSH pipeline) must not
    re-execute for every downstream consumer (node set, edge set, star
    fallback)."""
    # eager=False: the first consumer's job (the propagation init agg)
    # materializes the blocks — one job instead of a separate checkpoint
    # job followed by the agg (guide §1.2: fewer passes/barriers); every
    # later consumer (star fallback, self-roots union) reads the blocks.
    return pairs.select(
        F.col(id_a).cast("bigint").alias("a"),
        F.col(id_b).cast("bigint").alias("b"),
    ).localCheckpoint(eager=False)


def _with_self_roots(raw: DataFrame, labels: DataFrame) -> DataFrame:
    """Union in (node, node) for every node of `raw` absent from `labels`
    — component roots the star kernel leaves implicit, and nodes that
    appear only in self-loop pairs (a == b)."""
    all_nodes = (
        raw.select(F.col("a").alias("node"))
        .union(raw.select(F.col("b").alias("node")))
        .distinct()
    )
    roots = all_nodes.join(labels.select("node"), "node", "left_anti").select(
        "node", F.col("node").alias("component_id")
    )
    return labels.union(roots)


def _cc_propagation_labels(raw: DataFrame, max_rounds: int):
    """Min-label propagation over normalized (a, b) pairs. Returns the
    label frame (covering every node with at least one non-self edge) if
    the fixpoint was reached within `max_rounds`, else None — the caller
    decides whether that means "fall back to the star kernel" (hybrid
    dispatch) or "raise". Convergence check: sum(label) is monotone
    non-increasing and stalls exactly at the fixpoint (labels only ever
    decrease), so one cheap agg per round replaces a self-join diff."""
    e = raw.where(F.col("a") != F.col("b")).distinct()
    edges = e.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).union(e.select(F.col("b").alias("src"), F.col("a").alias("dst"))).persist()
    # init: label(v) = min(v, min neighbor) — one propagation round for free
    # lazy: the convergence agg right below materializes the checkpoint —
    # one job per round instead of two (checkpoint job + agg job)
    labels = edges.groupBy("src").agg(F.min("dst").alias("m")).select(
        F.col("src").alias("node"),
        F.least(F.col("src"), F.col("m")).alias("component_id"),
    ).localCheckpoint(eager=False)
    # decimal(38,0): immune to ANSI bigint-sum overflow at any node count
    lab_sum = F.sum(F.col("component_id").cast("decimal(38,0)"))
    prev_sum = labels.agg(lab_sum).first()[0]
    converged = False
    for _ in range(max_rounds):
        neigh = (
            edges.join(
                labels.select(
                    F.col("node").alias("dst"),
                    F.col("component_id").alias("dlab"),
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dlab").alias("nmin"))
        )
        labels = (
            labels.join(
                neigh.select(F.col("src").alias("node"), "nmin"), "node", "left"
            )
            .select(
                "node",
                F.least(
                    F.col("component_id"),
                    F.coalesce(F.col("nmin"), F.col("component_id")),
                ).alias("component_id"),
            )
            .localCheckpoint(eager=False)
        )
        cur_sum = labels.agg(lab_sum).first()[0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    edges.unpersist()
    return labels if converged else None


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 40,
    propagation_rounds: int = 4,
) -> DataFrame:
    """Group duplicate pairs into components: (node, component_id) where
    component_id = min node id reachable through the pair graph;
    self-loop-only nodes label themselves.

    The missing last stage of the web-scale dedup pipeline (exact / LSH /
    simhash stages above emit *pairs*; curation needs *clusters* so one
    representative per cluster can be kept — see `curation.keep_best_dedup`).

    Hybrid dispatch: near-dup graphs are dense small clusters (diameter
    2-3 in practice, Manku '07), so `propagation_rounds` of cheap min-label
    propagation (one join + groupBy(min) each) settle the common case. If
    the graph hides long chains (adversarial shingled spam mirrors) and
    propagation has NOT reached its fixpoint by then, the whole graph is
    re-run through the alternating large-star/small-star kernel
    (`connected_components_star`, Kiveris '14), which converges in O(log n)
    rounds regardless of component diameter — a 10k-link path costs ~30
    star rounds instead of 10k propagation rounds. The pair subtree is
    localCheckpointed once up front, so the fallback re-reads materialized
    blocks, not the LSH pipeline."""
    raw = _cc_raw(pairs, id_a, id_b)
    labels = _cc_propagation_labels(raw, propagation_rounds)
    if labels is None:
        labels = _cc_star_labels(raw, max_iterations)
    return _with_self_roots(raw, labels)


def connected_components_propagation(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Pure min-label propagation connected components — O(diameter)
    rounds, raising if the fixpoint is not reached in `max_iterations`.
    Prefer `connected_components` (hybrid with the O(log n) star-kernel
    fallback) unless the graph is known to be dense small clusters."""
    raw = _cc_raw(pairs, id_a, id_b)
    labels = _cc_propagation_labels(raw, max_iterations)
    if labels is None:
        raise RuntimeError(
            "connected_components_propagation did not converge in "
            f"{max_iterations} rounds — the graph has components of "
            "diameter > rounds; use connected_components (star fallback)"
        )
    return _with_self_roots(raw, labels)


def remove_duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Exact-substring span excision (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"), at word-n-gram
    granularity: any n-word span occurring ≥2 times ANYWHERE in the corpus
    (other docs or repeated within one doc) is duplicated, and every word
    covered by a duplicated span is removed. The cleaned doc is the
    canonical-token residue (single-space joined) — byte-faithful
    reconstruction is out of scope by design, matching how cleaned corpora
    are re-tokenized downstream anyway.

    Plan shape (100 TB): gram hashes are built ROW-LOCALLY (one md5 +
    array HOFs per doc, no explode for construction); the occurrence count
    shuffles gram instances ONCE keyed by the 60-bit hash (map-side
    combine); only instances of DUPLICATED grams flow into the per-doc
    index collection (bounded by dup positions, not corpus size); coverage
    and residue assembly are array HOFs on the doc row. No driver
    materialization, no all-pairs surface. The dup-gram join is an equi
    sort-merge at scale — both sides keyed by gh.

    Output: (id, n_words, n_removed, cleaned) — one row per input doc,
    including docs shorter than n words (nothing removable)."""
    # spread before the tokenize+hash stage: the checkpoint below
    # materializes with its input's partitioning, so a one-split scan would
    # otherwise pin the whole gram build (and every downstream consumer)
    # to a single core
    words = ensure_parallelism(df.select(id_col, text_col), id_col).select(
        F.col(id_col).alias("id"), word_tokens(text_col).alias("w")
    )
    # gram-start hash array gh[i], i = 0-based word index (row-local)
    gh = F.when(
        F.size("w") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("w") - n),
            lambda i: F.conv(
                F.substring(
                    F.md5(F.concat_ws(" ", F.slice("w", i + 1, n))), 1, 15
                ),
                16,
                10,
            ).cast("bigint"),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    # checkpoint the tokenized+hashed frame: it feeds the occurrence
    # count, the dup-index collection AND the final residue join — unchecked,
    # Catalyst plans three copies of the scan+tokenize+md5 subtree, and
    # InferFiltersFromGenerate additionally re-inlines the gram transform
    # into each scan's filter (the hash work runs ~4× per doc). One
    # materialization, three block-reads — the semdedup()/with_support()
    # pattern.
    docs = words.withColumn("gh", gh).localCheckpoint(eager=False)
    inst = docs.select("id", F.posexplode("gh").alias("i", "g"))
    cnt = inst.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    dup_idx = (
        inst.join(cnt.where(F.col("df") >= 2), "g", "left_semi")
        .groupBy("id")
        .agg(F.sort_array(F.collect_set("i")).alias("dup_i"))
    )
    out = docs.join(dup_idx, "id", "left").withColumn(
        "dup_i", F.coalesce("dup_i", F.array().cast("array<int>"))
    )
    # word p is covered iff some duplicated gram starts in [p-n+1, p]
    covered = lambda p: F.exists(
        "dup_i", lambda j: (j >= p - (n - 1)) & (j <= p)
    )
    kept = F.filter("w", lambda x, p: ~covered(p))
    return out.select(
        "id",
        F.size("w").cast("bigint").alias("n_words"),
        (F.size("w") - F.size(kept)).cast("bigint").alias("n_removed"),
        F.concat_ws(" ", kept).alias("cleaned"),
    )


# ---------------------------------------------------------------------------
# Bloom-prefilter incremental dedup (snapshot-over-snapshot ingestion)
# ---------------------------------------------------------------------------

def _bloom_params(expected_items: int, fpp: float) -> tuple[int, int]:
    """Standard Bloom sizing: m = -n ln p / (ln 2)^2 bits (rounded up to a
    whole 64-bit word), k = (m/n) ln 2 hash functions."""
    import math

    n = max(1, expected_items)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, ((m + 63) // 64) * 64)
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _bloom_positions(col: Column, m: int, k: int) -> Column:
    """Row-local array of k bit positions for `col` — xxhash64 with k
    distinct tags, JVM-side (identical code path on build and probe sides,
    so the probe never re-implements the hash in Python)."""
    return F.array(
        *[
            F.pmod(F.xxhash64(F.lit(f"b{i}:"), col), F.lit(m)).cast("bigint")
            for i in range(k)
        ]
    )


def bloom_bitmap(
    df: DataFrame, col: str, m: int, k: int
):
    """Distributed Bloom build: k positions per row (row-local) → explode →
    bit_or-aggregate per 64-bit word index (ONE shuffle, map-side combined,
    ≤ m/64 rows regardless of input size) → driver assembles a packed
    numpy uint64 array. Driver materialization is bounded by the CHOSEN m
    (m/8 bytes — 2^30 bits = 128 MB), never by the data; that is the same
    boundedness contract as broadcasting k-means centroids."""
    import numpy as np

    words = (
        df.select(
            F.explode(_bloom_positions(F.col(col), m, k)).alias("pos")
        )
        .groupBy((F.col("pos") / 64).cast("bigint").alias("widx"))
        .agg(
            # shiftleft's Python binding needs a literal bit count; the SQL
            # form takes a column expression
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))")
            ).alias("bits")
        )
        .collect()
    )
    arr = np.zeros(m // 64, dtype=np.int64)
    for r in words:
        arr[int(r["widx"])] = r["bits"]
    return arr.view(np.uint64)


def bloom_new_rows(
    incoming: DataFrame,
    prior: DataFrame,
    key_col: str,
    expected_items: int | None = None,
    fpp: float = 0.01,
) -> DataFrame:
    """EXACT incremental dedup of `incoming` against the already-ingested
    `prior` snapshot, with a Bloom prefilter doing the heavy lifting:

      1. build a Bloom bitmap over prior[key_col] (one bounded-output
         shuffle over prior, never re-run per batch in a real deployment);
      2. probe incoming row-locally — positions computed JVM-side, the bit
         test a vectorized numpy kernel over the broadcast bitmap. A
         bloom-NEGATIVE row is definitely new and flows through with ZERO
         join work;
      3. only bloom-POSITIVE rows (true dups + ~fpp false positives) pay
         the exact anti-join against prior.

    At 100 TB this turns an |incoming| ⋈ |prior| shuffle into a shuffle of
    |dups| + fpp·|incoming| rows; output is exactly `incoming` anti-join
    `prior` (the Bloom can only ADD candidates, and every candidate is
    verified), so the operator is oracle-checkable by a plain anti-join.

    Returns incoming rows whose key_col does not occur in prior."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    if expected_items is None:
        expected_items = prior.count()
    m, k = _bloom_params(expected_items, fpp)
    bitmap = bloom_bitmap(prior, key_col, m, k)
    spark = incoming.sparkSession
    bc = spark.sparkContext.broadcast(bitmap)

    # no parameter annotations: module-level `from __future__ import
    # annotations` turns them into strings pyspark's hint inference can't
    # resolve here — unannotated defaults to the scalar pandas UDF type
    @pandas_udf("boolean")
    def might_contain(positions):
        import numpy as np

        words = bc.value
        pos = np.asarray(positions.tolist(), dtype=np.uint64)
        if pos.size == 0:
            return pd.Series(np.zeros(0, dtype=bool))
        hit = (words[pos >> np.uint64(6)] >> (pos & np.uint64(63))) \
            & np.uint64(1)
        return pd.Series(hit.all(axis=1).astype(bool))

    # checkpoint the probed frame: it feeds BOTH the negative passthrough
    # and the candidate anti-join — without it each branch re-executes the
    # probe UDF subtree (a second full pass over incoming at corpus scale),
    # the same double-compute semdedup()/with_support() eliminate
    probed = incoming.withColumn(
        "__bloom_hit", might_contain(_bloom_positions(F.col(key_col), m, k))
    ).localCheckpoint(eager=False)
    negatives = probed.where(~F.col("__bloom_hit")).drop("__bloom_hit")
    candidates = probed.where(F.col("__bloom_hit")).drop("__bloom_hit")
    verified_new = candidates.join(
        prior.select(F.col(key_col).alias(key_col)).distinct(),
        key_col,
        "left_anti",
    )
    return negatives.unionByName(verified_new)


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 40,
) -> DataFrame:
    """Alternating large-star / small-star connected components (Kiveris
    et al. 2014, "Connected Components in MapReduce and Beyond") — the
    adversarial-graph companion to `connected_components`: O(log n) rounds
    regardless of component diameter, where min-label propagation needs
    O(diameter) rounds (a 10k-link chain would take 10k propagation
    rounds but ~30 star rounds).

      large-star(u): hook every neighbor v > u onto m = min(Γ(u) ∪ {u})
      small-star(u): hook every neighbor v ≤ u, and u itself, onto m

    Each phase is one groupBy(min) + join over the bidirectional edge
    frame; the edge set is re-normalized to undirected (lo, hi) pairs and
    localCheckpointed per round (lineage truncation). Fixpoint when the
    (count, sum(xxhash64(lo, hi))) signature of the edge set stops
    changing — the 64-bit per-edge hash makes a signature collision
    between distinct consecutive edge sets astronomically unlikely
    (a plain sum(lo*31+hi) collides on e.g. {(1,100),(2,69)} vs
    {(1,69),(2,100)}); exhausting `max_iterations` without convergence
    raises instead of silently returning non-star edges.

    Output: (node, component_id = min reachable id) for every node that
    appears in `pairs` (self-loop-only nodes label themselves) — same
    contract as `connected_components`."""
    raw = _cc_raw(pairs, id_a, id_b)
    return _with_self_roots(raw, _cc_star_labels(raw, max_iterations))


def _cc_star_labels(raw: DataFrame, max_iterations: int) -> DataFrame:
    """Alternating-star rounds over normalized (a, b) pairs; returns
    (node, component_id) for every NON-ROOT node — callers union in roots
    and self-loop-only nodes via `_with_self_roots`."""
    e = (
        raw.where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("lo"), F.greatest("a", "b").alias("hi")
        )
        .distinct()
        # lazy: each round's signature agg materializes that round's
        # small-star checkpoint, whose computation folds in the pending
        # large-star checkpoint — 1 job per star round instead of 3
        .localCheckpoint(eager=False)
    )

    def bidir(und: DataFrame) -> DataFrame:
        return und.select(
            F.col("lo").alias("src"), F.col("hi").alias("dst")
        ).union(
            und.select(F.col("hi").alias("src"), F.col("lo").alias("dst"))
        )

    def normalize(edges_ab: DataFrame) -> DataFrame:
        return (
            edges_ab.where(F.col("a") != F.col("b"))
            .select(
                F.least("a", "b").alias("lo"),
                F.greatest("a", "b").alias("hi"),
            )
            .distinct()
        )

    def signature(und: DataFrame) -> tuple:
        row = und.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(
                    F.xxhash64(F.col("lo"), F.col("hi")).cast(
                        "decimal(38,0)"
                    )
                ),
                F.lit(0),
            ).alias("s"),
        ).first()
        return (row["n"], row["s"])

    sig = signature(e)
    converged = False
    for _ in range(max_iterations):
        bi = bidir(e)
        mins = bi.groupBy("src").agg(
            F.least(F.col("src"), F.min("dst")).alias("m")
        )
        # large-star: (v, m_u) for v in Γ(u), v > u
        large = (
            bi.join(mins, "src")
            .where(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("a"), F.col("m").alias("b"))
        )
        e = normalize(large).localCheckpoint(eager=False)
        bi = bidir(e)
        mins = bi.groupBy("src").agg(
            F.least(F.col("src"), F.min("dst")).alias("m")
        )
        # small-star: (v, m_u) for v in Γ(u), v <= u, plus (u, m_u)
        small = (
            bi.join(mins, "src")
            .where(F.col("dst") <= F.col("src"))
            .select(F.col("dst").alias("a"), F.col("m").alias("b"))
            .union(mins.select(F.col("src").alias("a"), F.col("m").alias("b")))
        )
        e = normalize(small).localCheckpoint(eager=False)
        new_sig = signature(e)
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        raise RuntimeError(
            "connected_components_star did not reach the star fixpoint in "
            f"{max_iterations} alternating rounds; O(log n) convergence "
            "means this graph is far larger than max_iterations allows — "
            "raise max_iterations"
        )
    # fixpoint edges are stars (lo = component root): label every non-root
    # by its star edge; roots label themselves via _with_self_roots
    return e.select(
        F.col("hi").alias("node"), F.col("lo").alias("component_id")
    )


def winnow_overlap_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    window: int = 4,
    min_shared: int = 2,
    max_df: int = 50,
) -> DataFrame:
    """Position-aware near-duplicate pairs by WINNOWING fingerprint overlap
    (Schleimer et al. 2003 — the MOSS matcher): documents sharing ≥
    `min_shared` winnowed fingerprints pair up, scored by containment
    shared / min(|fp_a|, |fp_b|). Complements the MinHash path: winnowing
    guarantees any shared run longer than window+shingle tokens yields a
    shared fingerprint (positional guarantee MinHash lacks), so it catches
    block-level copying that whole-document signatures dilute.

    Scale shape: the fingerprint equi-join is the LSH-bucket pattern with
    the same skew discipline — fingerprints occurring in more than
    `max_df` docs are pruned FIRST (a ubiquitous shingle-min carries no
    match signal, and unpruned it would fan out quadratically, the hot-
    bucket failure). Per-doc fingerprint counts are taken AFTER pruning so
    the containment denominator matches the join surface. One shuffle per
    stage, all shuffles keyed on the 60-bit fingerprint or the id pair.

    Output: (id_a, id_b, shared, overlap) — id_a < id_b, overlap 6dp."""
    from osmesa_spark.functions.text import shingles, winnow_fingerprints
    from osmesa_spark.util import ensure_parallelism

    d = ensure_parallelism(df.select(id_col, text_col), id_col)
    hashes = F.transform(shingles(text_col, shingle_n), base_shingle_hash)
    fps = d.select(
        F.col(id_col).alias("id"),
        F.explode(winnow_fingerprints(hashes, window=window)).alias("fp"),
    ).localCheckpoint(eager=False)
    keep = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df_")).where(
        F.col("df_") <= max_df
    )
    # lazy: counts/a/b all sit under the caller's single action — the first
    # stage to touch `pruned` materializes it (partition-level cache locks
    # keep it computed once); saves the separate construction-time job
    pruned = fps.join(keep.select("fp"), "fp", "left_semi").localCheckpoint(
        eager=False
    )
    counts = pruned.groupBy("id").agg(F.count(F.lit(1)).alias("n_fp"))
    a = pruned.select(F.col("id").alias("id_a"), "fp")
    b = pruned.select(F.col("id").alias("id_b"), "fp")
    shared = (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
    na = counts.select(F.col("id").alias("id_a"), F.col("n_fp").alias("n_a"))
    nb = counts.select(F.col("id").alias("id_b"), F.col("n_fp").alias("n_b"))
    return (
        shared.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            "shared",
            F.round(
                F.col("shared") / F.least("n_a", "n_b"), 6
            ).alias("overlap"),
        )
    )


def dedup_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 11,
) -> DataFrame:
    """Paragraph-level exact dedup (CCNet, Wenzek et al. 2020 §3: drop
    duplicated paragraphs before language/quality scoring — boilerplate
    like headers, cookie banners and navigation repeats verbatim across
    pages, and removing it per-PARAGRAPH salvages the unique remainder of
    a page that doc-level dedup would either keep whole or drop whole).

    Semantics: paragraphs are newline-delimited spans; two paragraphs are
    duplicates when their normalized forms (lower + trim) are byte-equal.
    Deterministic first-seen-wins — the corpus-wide occurrence with the
    smallest (doc, para_idx) survives, every other copy is excised (CCNet's
    own hash-set walk is order-dependent; min-occurrence is the
    reproducible version of the same policy). Blank-normalized paragraphs
    are structural, not content — never hashed, always kept.

    Plan shape (100 TB): split + posexplode are row-local; duplicate
    discovery is ONE shuffle keyed by the 60-bit paragraph hash with a
    count/min partial agg (map-side combine; hot boilerplate paragraphs
    are single counter rows, never holder lists). Only hashes with
    count ≥ 2 flow into the verdict join (≪ paragraph instances), so the
    join-back is an equi join against a small build side (AQE-broadcastable
    in the common case). Reassembly is one doc-keyed agg with an in-group
    array_sort — O(paragraphs-per-doc) state. No driver materialization.

    Output: one row per input doc — (id, n_paras, n_kept, cleaned), where
    `cleaned` is the surviving paragraphs re-joined with newlines in
    original order. A null text counts as empty ('' — one blank
    paragraph), so no input row is ever silently dropped."""
    base = ensure_parallelism(
        df.select(
            id_col, F.coalesce(F.col(text_col), F.lit("")).alias(text_col)
        ),
        id_col,
    )
    paras = base.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias(
            "idx", "para"
        ),
    )
    norm = F.lower(F.trim(F.col("para")))
    hashed = paras.withColumn(
        "ph",
        F.when(norm != "", _portable_hash(norm, seed)),
    ).localCheckpoint(eager=False)
    dups = (
        hashed.where(F.col("ph").isNotNull())
        .groupBy("ph")
        .agg(
            F.count(F.lit(1)).alias("occ"),
            F.min(F.struct("id", "idx")).alias("first"),
        )
        .where(F.col("occ") >= 2)
        .select("ph", "first")
    )
    verdict = hashed.join(dups, "ph", "left").withColumn(
        "kept",
        F.col("first").isNull()
        | ((F.col("first.id") == F.col("id")) & (F.col("first.idx") == F.col("idx"))),
    )
    return (
        verdict.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.sum(F.col("kept").cast("bigint")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("kept"), F.struct("idx", "para")
                            )
                        )
                    ),
                    lambda s: s["para"],
                ),
                "\n",
            ).alias("cleaned"),
        )
    )


def _merge_window_starts(ss: Column, L: int) -> Column:
    """Merge a SORTED array of fixed-length-L window start offsets into
    disjoint covered intervals array<struct<lo,hi>>. Starts are ascending
    and all windows have length L, so a new window's hi always extends
    (or abuts) the running interval — one row-local array fold."""
    empty_iv = F.expr("CAST(array() AS array<struct<lo:int,hi:int>>)")
    last = lambda acc: F.element_at(acc, -1)  # noqa: E731
    mk = lambda lo, hi: F.named_struct(  # noqa: E731
        F.lit("lo"), lo.cast("int"), F.lit("hi"), hi.cast("int")
    )
    return F.aggregate(
        F.coalesce(ss, F.expr("CAST(array() AS array<int>)")),
        empty_iv,
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (s <= last(acc)["hi"] + 1),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(mk(last(acc)["lo"], s + L - 1)),
            ),
        ).otherwise(F.concat(acc, F.array(mk(s, s + L - 1)))),
    )


def decontaminate_spans_char(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 50,
    seed: int = 13,
) -> DataFrame:
    """CHARACTER-level eval-set decontamination — the exact-substring
    criterion of Lee et al. 2022 §6.2 / the GPT-3 overlap audit, at the
    granularity `decontaminate_overlap`'s word-5-grams approximate: a
    train doc is contaminated wherever it shares an exact >= `min_len`-
    char substring with ANY eval doc (every such span contains a shared
    L-char window at each offset, so the window cover reconstructs the
    overlap union exactly — same criterion `remove_duplicated_spans_char`
    applies within the corpus).

    Scale shape: window hashes are built ROW-LOCALLY on both sides (only
    (id, start, hash60) rows flow); the DISTINCT eval-window hash set is
    bounded by the eval suite — small at any corpus scale by construction
    — so it BROADCASTS and train windows semi-join it (the
    `decontaminate_overlap` shape); hit starts come back per doc and the
    covered-character count is a row-local interval-merge fold. No
    corpus-sized shuffle beyond the per-doc hit agg.

    Output: (id, n_chars, n_covered, contaminated) — one row per train
    doc, zero-filled via the left join-back; null text counts as empty."""
    L = min_len
    txt = F.col(text_col)
    n = F.length(txt)
    hashes = F.transform(
        F.sequence(F.lit(0), n - L),
        lambda i: _portable_hash(txt.substr(i + 1, F.lit(L)), seed),
    )
    base = ensure_parallelism(
        train.select(
            F.col(id_col).alias("id"),
            F.coalesce(txt, F.lit("")).alias(text_col),
        ),
        "id",
    )
    ev = ensure_parallelism(
        eval_df.select(
            F.col(id_col).alias("id"),
            F.coalesce(txt, F.lit("")).alias(text_col),
        ),
        "id",
    )
    ev_h = (
        ev.where(n >= L)
        .select(F.explode(hashes).alias("h"))
        .distinct()
    )
    wins = base.where(n >= L).select(
        "id", F.posexplode(hashes).alias("s", "h")
    )
    hit_starts = (
        wins.join(F.broadcast(ev_h), "h", "left_semi")
        .groupBy("id")
        .agg(F.array_sort(F.collect_list("s")).alias("ss"))
    )
    res = base.join(hit_starts, "id", "left").withColumn(
        "iv", _merge_window_starts(F.col("ss"), L)
    )
    n_covered = F.aggregate(
        F.col("iv"),
        F.lit(0).cast("bigint"),
        lambda acc, i: acc + (i["hi"] - i["lo"] + 1),
    )
    return res.select(
        "id",
        n.cast("bigint").alias("n_chars"),
        n_covered.alias("n_covered"),
        (n_covered > 0).alias("contaminated"),
    )


def remove_duplicated_spans_char(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 50,
    seed: int = 13,
    materialize: bool = True,
) -> DataFrame:
    """CHARACTER-level exact-substring span excision — the paper-exact
    granularity of Lee et al. 2022 (§4.1 ExactSubstr: duplicated spans of
    ≥ 50 characters), complementing `remove_duplicated_spans`' word-n-gram
    variant. Any `min_len`-char window occurring ≥ 2 times anywhere in the
    corpus is duplicated; every character covered by a duplicated window
    is excised from every occurrence (the suffix-array criterion is
    equivalent: a duplicated span of length ≥ L contains a duplicated
    L-window at each offset, so the window cover reconstructs exactly the
    union of duplicated spans). The paper builds a suffix array because it
    runs shared-memory; the distributed shape of the same criterion is a
    rolling-window hash count — one shuffle, no global index.

    Plan shape (100 TB): window hashes are built ROW-LOCALLY (one
    transform over char offsets — only (id, start, hash60) rows flow, the
    text never rides through the explode); occurrence counting is ONE
    hash-keyed partial agg; only starts of DUPLICATED windows come back
    (semi-join, bounded by dup density); per-doc interval merge, gap
    extraction and residue concatenation are array HOFs on the doc row —
    O(dup starts) state, a handful of substr calls, not per-char work.

    Output: (id, n_chars, n_removed, cleaned) — one row per input doc;
    docs shorter than min_len are untouched and a null text counts as
    empty (no row is dropped or nulled)."""
    L = min_len
    base = ensure_parallelism(
        df.select(
            F.col(id_col).alias("id"),
            F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
        ),
        "id",
    )
    txt = F.col(text_col)
    n = F.length(txt)
    hashes = F.transform(
        F.sequence(F.lit(0), n - L),
        lambda i: _portable_hash(txt.substr(i + 1, F.lit(L)), seed),
    )
    # `materialize` picks storage vs recompute for the per-doc window-hash
    # arrays, which BOTH downstream consumers (occurrence count, semi-join
    # probe) need:
    #   True  — localCheckpoint the per-DOC hash ARRAYS (not the exploded
    #           instances, which would store the same data with per-row
    #           overhead). The md5-per-offset kernel runs ONCE; cost is
    #           ~8 B of executor storage per input character — at 100 TB
    #           of text that is ~800 TB of block-manager space, which only
    #           works if the job runs over a bounded corpus slice at a
    #           time.
    #   False — keep the lineage: the hash kernel recomputes for the
    #           second consumer (2x CPU on the md5 pass, zero storage).
    #           This is the right call when executor storage, not CPU, is
    #           the 100 TB bottleneck.
    # Measured at sf0.1 (documents table, local[32], interleaved medians):
    # True 0.58 s / False 0.61 s — WITHIN each other's rep spread (~0.25 s)
    # because at this corpus size the hash kernel doesn't dominate. The
    # knob is a 100 TB control, not a local-bench one: pick by whether
    # executor storage (~8 B/char) or kernel CPU (2x md5 pass) is the
    # binding resource. Both modes are value-identical
    # (tests/test_properties.py parametrizes the brute-force cross-check
    # over the knob).
    win_arrays = base.where(n >= L).select("id", hashes.alias("hs"))
    if materialize:
        win_arrays = win_arrays.localCheckpoint(eager=False)
    wins = win_arrays.select("id", F.posexplode("hs").alias("s", "h"))
    dup = (
        wins.groupBy("h")
        .agg(F.count(F.lit(1)).alias("occ"))
        .where(F.col("occ") >= 2)
        .select("h")
    )
    dup_starts = (
        wins.join(dup, "h", "left_semi")
        .groupBy("id")
        .agg(F.array_sort(F.collect_list("s")).alias("ss"))
    )
    res = base.join(dup_starts, "id", "left")
    res = res.withColumn("iv", _merge_window_starts(F.col("ss"), L))
    ivc = F.col("iv")
    gap_starts = F.concat(
        F.array(F.lit(0)), F.transform(ivc, lambda i: i["hi"] + 1)
    )
    gap_ends = F.concat(
        F.transform(ivc, lambda i: i["lo"]), F.array(n.cast("int"))
    )
    cleaned = F.array_join(
        F.zip_with(gap_starts, gap_ends, lambda a, b: txt.substr(a + 1, b - a)),
        "",
    )
    n_removed = F.aggregate(
        ivc,
        F.lit(0).cast("bigint"),
        lambda acc, i: acc + (i["hi"] - i["lo"] + 1),
    )
    return res.select(
        "id",
        n.cast("bigint").alias("n_chars"),
        n_removed.alias("n_removed"),
        cleaned.alias("cleaned"),
    )
