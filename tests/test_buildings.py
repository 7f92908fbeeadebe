"""Building-matching kernels + end-to-end matcher (§2.12)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmesa_spark.operators import buildings as bm


def rect(x0, y0, w, h):
    return np.array([[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]])


def test_clip_identical():
    r = rect(0, 0, 2, 1)
    ra, rb = bm.volume_ratios(r, r)
    assert ra == pytest.approx(1.0) and rb == pytest.approx(1.0)


def test_clip_partial_overlap():
    a = rect(0, 0, 2, 2)  # area 4
    b = rect(1, 1, 2, 2)  # area 4, overlap 1x1
    ra, rb = bm.volume_ratios(a, b)
    assert ra == pytest.approx(0.25)
    assert rb == pytest.approx(0.25)


def test_clip_containment_and_disjoint():
    outer = rect(0, 0, 4, 4)
    inner = rect(1, 1, 2, 2)
    ra, rb = bm.volume_ratios(outer, inner)
    assert ra == pytest.approx(4 / 16)
    assert rb == pytest.approx(1.0)
    far = rect(10, 10, 1, 1)
    assert bm.volume_ratios(outer, far) == (0.0, 0.0)


def test_clip_winding_insensitive():
    a = rect(0, 0, 2, 2)
    b_cw = rect(1, 1, 2, 2)[::-1]  # clockwise ring
    ra, _ = bm.volume_ratios(a, b_cw)
    assert ra == pytest.approx(0.25)


def test_homography_identity_vs_distortion():
    r = rect(0, 0, 1, 1)
    assert bm.homography_deviation(r, r) == pytest.approx(0.0, abs=1e-8)
    assert bm.vertex_score(r, r, scale=1.0) == pytest.approx(1.0, abs=1e-6)
    # a strong distortion scores clearly lower
    skew = np.array([[0, 0], [1, 0.5], [1.5, 1.5], [0, 1]])
    assert bm.vertex_score(r, skew, scale=1.0) < 0.8
    # translation is a non-identity homography -> deviation grows with shift
    assert bm.homography_deviation(r, r + 0.3) > bm.homography_deviation(
        r, r + 0.05
    )


def test_matcher_recovers_perturbed_rects(spark):
    import pandas as pd

    rng = np.random.RandomState(42)
    rows_a, rows_b = [], []
    for i in range(60):
        x0 = (i % 10) * 0.01
        y0 = (i // 10) * 0.01
        w, h = 0.004, 0.003
        rows_a.append((i, [{"x": float(x), "y": float(y)} for x, y in rect(x0, y0, w, h)]))
        if i % 2 == 0:  # match with small jitter
            dx, dy = rng.uniform(-3e-4, 3e-4, 2)
            rows_b.append(
                (1000 + i, [{"x": float(x), "y": float(y)} for x, y in rect(x0 + dx, y0 + dy, w, h)])
            )
        else:  # distractor far away
            rows_b.append(
                (1000 + i, [{"x": float(x), "y": float(y)} for x, y in rect(x0 + 5, y0, w, h)])
            )
    schema = "id long, vertices array<struct<x:double,y:double>>"
    a = spark.createDataFrame(rows_a, schema)
    b = spark.createDataFrame(rows_b, schema)
    out = bm.building_match(a, b, threshold=0.5).toPandas()
    matched = set(zip(out.id_a, out.id_b))
    for i in range(0, 60, 2):
        assert (i, 1000 + i) in matched, f"lost true match {i}"
    # distractors never match
    assert all(idb - 1000 != ida or ida % 2 == 0 for ida, idb in matched)
    # true matches carry high volume AND vertex scores
    true_rows = out[out.id_b - 1000 == out.id_a]
    assert (true_rows.p_vol_a > 0.7).all()
    assert (true_rows.p_vertex > 0.5).all()


def test_batch_volume_matches_scalar():
    """The vectorized padded-clip kernel must reproduce the scalar
    Sutherland-Hodgman result on random convex quads (incl. disjoint and
    contained cases, variable vertex counts)."""
    import numpy as np

    rng = np.random.default_rng(7)
    ax, ay, bx, by, expected = [], [], [], [], []
    for i in range(300):
        x0, y0 = rng.uniform(-5, 5, 2)
        w1, h1, w2, h2 = rng.uniform(0.1, 2.0, 4)
        dx, dy = rng.uniform(-1.5, 1.5, 2)
        a = np.array([[x0, y0], [x0 + w1, y0], [x0 + w1, y0 + h1], [x0, y0 + h1]])
        if i % 5 == 0:  # triangle vs quad: ragged vertex counts
            b = np.array([[x0 + dx, y0 + dy], [x0 + dx + w2, y0 + dy],
                          [x0 + dx + w2 / 2, y0 + dy + h2]])
        else:
            b = np.array([[x0 + dx, y0 + dy], [x0 + dx + w2, y0 + dy],
                          [x0 + dx + w2, y0 + dy + h2], [x0 + dx, y0 + dy + h2]])
        if i % 7 == 0:
            b = b[::-1]  # CW winding
        ax.append(a[:, 0]); ay.append(a[:, 1])
        bx.append(b[:, 0]); by.append(b[:, 1])
        expected.append(bm.volume_areas(a.copy(), b.copy()))
    ia, aa, ab = bm.volume_areas_batch(ax, ay, bx, by)
    exp = np.array(expected)
    np.testing.assert_allclose(ia, exp[:, 0], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(aa, exp[:, 1], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(ab, exp[:, 2], rtol=1e-9, atol=1e-12)


def _rect_df(spark, rows):
    """rows: (id, x0, y0, w, h) → (id, vertices) frame."""
    data = [
        (
            rid,
            [
                {"x": x0, "y": y0},
                {"x": x0 + w, "y": y0},
                {"x": x0 + w, "y": y0 + h},
                {"x": x0, "y": y0 + h},
            ],
        )
        for rid, x0, y0, w, h in rows
    ]
    return spark.createDataFrame(
        data, "id long, vertices array<struct<x:double,y:double>>"
    )


def test_support_matrix_semantics(spark):
    """An anchor (perfectly-matched pair) boosts the candidate pair that
    sits in the same direction/distance from it (dot·dist ≈ 1) over one
    whose B-side lies in the opposite direction (dot ≈ 0); p_sup blends
    (p + q_norm)/2 — BuildingMatching.scala:200-260 semantics."""
    s = 0.001
    # anchor: identical rects at origin-ish (same cell as the candidates)
    a_rows = [
        (1, 0.0, 0.0, s, s),        # anchor A-side
        (2, 3 * s, 0.0, s, s),      # consistent candidate A-side
        (3, 6 * s, 0.0, s, s),      # inconsistent candidate A-side
    ]
    b_rows = [
        (11, 0.0, 0.0, s, s),               # anchor B-side (identical)
        (12, 3 * s + s / 4, 0.0, s, s),     # shifted same direction
        (13, 6 * s - 3 * s, 2 * s, s, s),   # displaced opposite/offset
    ]
    scored = bm.score_pairs(
        bm.candidate_pairs(_rect_df(spark, a_rows), _rect_df(spark, b_rows)),
        with_vertex=False,
    )
    sup = bm.with_support(scored, anchor_threshold=0.99)
    rows = {
        (r["id_a"], r["id_b"]): r for r in sup.collect() if r["id_a"] != r["id_b"]
    }
    consistent = rows[(2, 12)]
    inconsistent = rows[(3, 13)]
    assert consistent["support"] > inconsistent["support"]
    assert consistent["support"] == pytest.approx(1.0)  # cell max
    # blend: p_sup = (p + q_norm)/2
    assert consistent["p_sup"] == pytest.approx(
        (consistent["p"] + consistent["support"]) / 2, abs=1e-6
    )
    # the anchor pair itself: support counted against itself → dot·dist with
    # v=u → 1.0 → also normalized ≤ 1
    assert rows[(1, 11)]["p_sup"] >= 0.5


def test_scores_batch_matches_scalar():
    """The batched DLT/projection kernel must reproduce the scalar
    per-pair functions on ragged random polygons (incl. degenerate <4 and
    <2 vertex shapes) to float precision — same greedy pairing order, same
    Hartley conditioning, same SVD nullspace."""
    import random

    import numpy as np

    from osmesa_spark.operators import buildings as bm

    rng = random.Random(11)
    polys_a, polys_b = [], []
    for i in range(120):
        na = rng.choice([1, 2, 3, 4, 4, 4, 5, 6, 8])
        nb = rng.choice([1, 2, 3, 4, 4, 4, 5, 6, 8])
        cx, cy = rng.uniform(-50, 50), rng.uniform(-30, 30)
        polys_a.append(
            np.array(
                [
                    [
                        cx + rng.uniform(0.5, 2.0) * np.cos(2 * np.pi * k / na),
                        cy + rng.uniform(0.5, 2.0) * np.sin(2 * np.pi * k / na),
                    ]
                    for k in range(na)
                ]
            )
        )
        dx, dy = rng.uniform(-0.3, 0.3), rng.uniform(-0.3, 0.3)
        polys_b.append(
            np.array(
                [
                    [
                        cx + dx + rng.uniform(0.5, 2.0) * np.cos(2 * np.pi * k / nb),
                        cy + dy + rng.uniform(0.5, 2.0) * np.sin(2 * np.pi * k / nb),
                    ]
                    for k in range(nb)
                ]
            )
        )
    pv_b, pj_b = bm.scores_batch(polys_a, polys_b, scale=1.0)
    for i, (a, b) in enumerate(zip(polys_a, polys_b)):
        pv_s = bm.vertex_score(a, b, scale=1.0)
        pj_s = bm.projection_score(a, b, scale=1.0)
        assert abs(pv_b[i] - pv_s) < 1e-9, (i, pv_b[i], pv_s, len(a), len(b))
        assert abs(pj_b[i] - pj_s) < 1e-9, (i, pj_b[i], pj_s, len(a), len(b))


def test_quadtree_address_matches_reference_recurrence(spark):
    """with_quadtree_address must replay QuadTreePartitioner.getAddress
    exactly (strict >0.5 quadrant test, recentering recurrence, stop at
    corner disagreement or maxDivisions, divisionSet subsets) — checked
    against a literal python transcription of the Scala loop over seeded
    random bboxes spanning tiny buildings to continent-scale extents."""
    import random

    from pyspark.sql import functions as F

    from osmesa_spark.operators import buildings as bm

    def py_address(xmin, ymin, xmax, ymax, max_div=8, divset=None):
        divset = set(range(max_div + 1)) if divset is None else divset
        box = [(xmin + 180) / 360, (ymin + 90) / 180,
               (xmax + 180) / 360, (ymax + 90) / 180]
        addr, div = 0, 0

        def bits(b):
            mn = (1 if b[0] > 0.5 else 0) + (2 if b[1] > 0.5 else 0)
            mx = (1 if b[2] > 0.5 else 0) + (2 if b[3] > 0.5 else 0)
            return mn if mn == mx else None

        b = bits(box)
        while b is not None and div <= max_div:
            if div in divset:
                addr = (addr << 2) | b
            sx = 0.5 if (b % 2 == 1) else 0.0
            sy = 0.5 if b >= 2 else 0.0
            box = [2 * (box[0] - sx), 2 * (box[1] - sy),
                   2 * (box[2] - sx), 2 * (box[3] - sy)]
            b = bits(box)
            div += 1
        return addr, addr % 4099

    rng = random.Random(5)
    rows = []
    for i in range(250):
        x0 = rng.uniform(-179, 178)
        y0 = rng.uniform(-89, 88)
        w = rng.uniform(1e-5, 2.0 if i % 3 else 40.0)
        h = rng.uniform(1e-5, 2.0 if i % 3 else 40.0)
        rows.append((i, x0, y0, min(x0 + w, 180.0), min(y0 + h, 90.0)))
    df = spark.createDataFrame(
        rows, "id long, xmin double, ymin double, xmax double, ymax double"
    )
    for divset in (None, {0, 2, 4, 6, 8}):
        out = bm.with_quadtree_address(
            df, F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"),
            division_set=divset,
        )
        got = {r["id"]: (r["qt_address"], r["qt_partition"])
               for r in out.collect()}
        for (i, x0, y0, x1, y1) in rows:
            assert got[i] == py_address(x0, y0, x1, y1, divset=divset), (
                i, divset
            )
