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
