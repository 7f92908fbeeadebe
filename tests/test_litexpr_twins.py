"""Equivalence coverage for functions/litexpr.py and the hand-mirrored
DSL→SQL twins (r10 ADVICE, medium): the litexpr mechanism's whole safety
argument is that a rendered SQL string evaluates to EXACTLY the value the
DSL form produces — so drift between a twin and its sibling must fail a
test, not wait for an oracle-hash miss.

Covers:
  * dlit: bit-exact double literal round-trip through Spark SQL for the
    adversarial set (−0.0, denormals incl. the smallest subnormal, double
    extremes, inf/−inf, NaN) plus seeded random bit patterns;
  * darr / larr round-trips;
  * the similarity SQL twins (_dot_sql, _norm_sql, _cosine_sql,
    _lsh_bucket_sql, _sq_l2_sql, _pq_dists_sql) against their DSL/numpy
    siblings on seeded random vectors;
  * kmeans_assign (pure-SQL literal-fold argmin) against the numpy
    replay of the Arrow kernel's rounded-distance argmin;
  * minhash_signatures against a hashlib/md5 Python replay.
"""

from __future__ import annotations

import hashlib
import math
import random
import struct

import pytest
from pyspark.sql import functions as F

from osmesa_spark.functions.litexpr import darr, dlit, larr

TRICKY_DOUBLES = [
    0.0,
    -0.0,
    1.0,
    -1.0,
    1 / 3,
    0.1,
    -2.5,
    math.pi,
    5e-324,                      # smallest subnormal
    2.2250738585072014e-308,     # smallest normal
    -2.2250738585072014e-308,
    1.7976931348623157e308,      # largest finite
    -1.7976931348623157e308,
    float("inf"),
    float("-inf"),
    float("nan"),
]


def _bits(x: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", x))[0]


def test_dlit_roundtrips_bit_exactly(spark):
    rng = random.Random(1311)
    xs = list(TRICKY_DOUBLES)
    # seeded random BIT PATTERNS (re-drawn until finite-or-special is
    # irrelevant: any pattern is a valid double; NaN payloads normalize)
    for _ in range(48):
        x = struct.unpack("<d", struct.pack("<Q", rng.getrandbits(64)))[0]
        xs.append(x)
    exprs = [F.expr(dlit(x)).alias(f"c{i}") for i, x in enumerate(xs)]
    row = spark.range(1).select(*exprs).first()
    for i, x in enumerate(xs):
        got = row[f"c{i}"]
        if math.isnan(x):
            assert math.isnan(got), f"x={x!r} -> {got!r}"
        else:
            assert _bits(got) == _bits(x), (
                f"dlit bit drift: {x!r} ({_bits(x):#x}) -> "
                f"{got!r} ({_bits(got):#x})"
            )


def test_darr_and_larr_roundtrip(spark):
    rng = random.Random(7)
    dv = [rng.uniform(-1e6, 1e6) for _ in range(17)] + [-0.0, 5e-324]
    lv = [rng.randrange(-(2**62), 2**62) for _ in range(9)] + [0, -1]
    row = spark.range(1).select(
        F.expr(darr(dv)).alias("d"), F.expr(larr(lv)).alias("l")
    ).first()
    assert [_bits(a) for a in row["d"]] == [_bits(a) for a in dv]
    assert list(row["l"]) == lv


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = random.Random(1307)
    rows = [
        (i, [rng.uniform(-2, 2) for _ in range(16)],
         [rng.uniform(-2, 2) for _ in range(16)])
        for i in range(64)
    ]
    return spark.createDataFrame(
        rows, "id long, a array<double>, b array<double>"
    ).localCheckpoint()


def test_dot_norm_cosine_sql_twins_match_dsl(vec_df):
    from osmesa_spark.operators.similarity import (
        _cosine_sql,
        _dot,
        _dot_sql,
        _norm,
        _norm_sql,
        cosine,
    )

    got = vec_df.select(
        (_dot(F.col("a"), F.col("b")) == F.expr(_dot_sql("`a`", "`b`")))
        .alias("dot_ok"),
        (_norm(F.col("a")) == F.expr(_norm_sql("`a`"))).alias("norm_ok"),
        (cosine(F.col("a"), F.col("b"))
         == F.expr(_cosine_sql("`a`", "`b`"))).alias("cos_ok"),
    )
    bad = got.where("NOT (dot_ok AND norm_ok AND cos_ok)").count()
    assert bad == 0


def test_lsh_bucket_and_sq_l2_sql_match_python_replay(vec_df):
    from osmesa_spark.operators.similarity import (
        _lsh_bucket_sql,
        _sq_l2_sql,
        lsh_planes,
    )

    planes = lsh_planes(16, n_planes=6, seed=97)
    cent = [0.25 * ((i % 5) - 2) for i in range(16)]
    rows = vec_df.select(
        "id", "a",
        F.expr(_lsh_bucket_sql("`a`", planes)).alias("bucket"),
        F.expr(_sq_l2_sql("`a`", cent)).alias("d2"),
    ).collect()
    for r in rows:
        want_bucket = 0
        for i, p in enumerate(planes):
            dot = 0.0
            for x, y in zip(r["a"], p):
                dot += x * y
            if dot > 0:
                want_bucket += 1 << i
        assert r["bucket"] == want_bucket, f"id={r['id']}"
        d2 = 0.0
        for x, c in zip(r["a"], cent):
            d2 += (x - c) * (x - c)
        # Spark round(double, 6) == BigDecimal(repr).setScale(6, HALF_UP)
        from decimal import ROUND_HALF_UP, Decimal

        want = float(
            Decimal(repr(d2)).quantize(Decimal("1e-6"), ROUND_HALF_UP)
        )
        assert r["d2"] == want, f"id={r['id']}: {r['d2']!r} != {want!r}"


def test_pq_dists_and_kmeans_assign_match_numpy_replay(vec_df):
    import numpy as np

    from osmesa_spark.operators.similarity import (
        _pq_dists_sql,
        kmeans_assign,
    )

    rng = random.Random(29)
    book = [
        (cid, [rng.uniform(-1, 1) for _ in range(16)]) for cid in range(4)
    ]
    rows = vec_df.select(
        "id", "a", F.expr(_pq_dists_sql("`a`", book)).alias("dists")
    ).collect()
    C = np.array([c for _, c in book])
    for r in rows:
        want = np.round(
            ((np.array(r["a"])[None, :] - C) ** 2).sum(-1), 6
        )
        got = np.array(r["dists"])
        assert (got == want).all(), f"id={r['id']}"

    assigned = {
        r["id"]: r["cluster"]
        for r in kmeans_assign(
            vec_df, book, id_col="id", vec_col="a"
        ).collect()
    }
    X = np.array(
        [r["a"] for r in vec_df.select("id", "a").orderBy("id").collect()]
    )
    D = np.round(((X[:, None, :] - C[None, :, :]) ** 2).sum(-1), 6)
    want_assign = D.argmin(1)
    for i in range(len(X)):
        assert assigned[i] == want_assign[i], f"id={i}"


def test_minhash_signatures_match_hashlib_replay(spark):
    from osmesa_spark.operators.dedup import (
        MINHASH_PRIME,
        _minhash_coeffs,
        minhash_signatures,
    )

    docs = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "pack my box with five dozen liquor jugs"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "a b c a b c a b c"),
        (4, "one two three"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["id"]: list(r["sig"])
        for r in minhash_signatures(df, num_hashes=16).collect()
    }
    coeffs = _minhash_coeffs(16)
    import re

    for doc_id, text in docs:
        toks = re.findall(r"[a-z0-9]+", text.lower())
        shingles = [
            " ".join(toks[i:i + 3]) for i in range(len(toks) - 2)
        ]
        if not shingles:
            assert doc_id not in got
            continue
        base = [
            int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
            % MINHASH_PRIME
            for s in shingles
        ]
        want = [
            min((a * h + b) % MINHASH_PRIME for h in base)
            for a, b in coeffs
        ]
        assert got[doc_id] == want, f"doc {doc_id}"
