"""Multimodal column pipeline: synthetic codec round-trip, full 16-bin
feature parity vs a local numpy reference, frame-sampling shape.

The registry queries (multimodal_features / multimodal_frames) check the
metadata + one bin against DuckDB; this file checks the full feature vector
and batch plumbing the SQL oracle can't express.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmesa_spark.operators import multimodal as mm

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    return mm.synthesize_media(docs).cache()


def test_codec_round_trip(media):
    rows = media.collect()
    assert len(rows) == 50
    for r in rows:
        blob = bytes(r.payload)
        assert blob[:4] == b"OSMM"
        kind, w, h, body = mm._decode_payload(blob)
        assert (w, h) == (r.meta.width, r.meta.height)
        assert r.meta.n_bytes == len(blob) == 9 + len(body)
        assert mm._KINDS[kind] == r.kind


def test_feature_vectors_match_numpy(spark, media):
    feats = {r.media_id: r for r in mm.extract_features(media).collect()}
    for r in media.collect():
        _, _, _, body = mm._decode_payload(bytes(r.payload))
        hist, _ = np.histogram(body, bins=16, range=(0, 256))
        expected = (hist / max(hist.sum(), 1)).astype(np.float32)
        got = np.array(feats[r.media_id].features, dtype=np.float32)
        assert got.shape == (16,)
        np.testing.assert_allclose(got, expected, rtol=1e-6)
        assert abs(got.sum() - 1.0) < 1e-5


def test_frame_sample_shape(spark, media):
    frames = mm.frame_sample(media, every_n_bytes=64, max_frames=8)
    pdf = frames.toPandas()
    videos = media.where(F.col("kind") == "video").collect()
    assert set(pdf["media_id"]) == {r.media_id for r in videos}
    for r in videos:
        _, _, _, body = mm._decode_payload(bytes(r.payload))
        n_expected = min((len(body) + 63) // 64, 8) if len(body) else 0
        sub = pdf[pdf.media_id == r.media_id]
        assert len(sub) == n_expected
        # checksum of frame 0 = sum of first 64 body bytes
        if n_expected:
            first = int(sub[sub.frame_no == 0].checksum.iloc[0])
            assert first == int(body[:64].sum())


def test_phash_pairs_finds_perturbed_twin(spark):
    """dHash near-dup: an image whose body differs by one character from
    another lands within the Hamming band; a structurally different body
    does not pair with either. Exact twins come out at hamming 0, and the
    banded LSH result equals the brute-force all-pairs answer within the
    threshold (pigeonhole recall guarantee)."""
    base = "the quick brown fox jumps over the lazy dog " * 8
    rows = [
        (0, base),                      # doc 0: original
        (3, base),                      # doc 3: exact twin
        (6, base[:-10] + "lazy cat xx"),  # doc 6: small perturbation
        (9, "completely different content here " * 12),  # doc 9: unrelated
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in mm.phash_pairs(docs, max_hamming=11).collect()
    }
    assert got[(0, 3)] == 0
    assert (0, 6) in got and 0 < got[(0, 6)] <= 11
    assert got[(0, 6)] == got[(3, 6)]
    assert not any(9 in p for p in got)

    # pigeonhole recall: banded candidates reproduce brute-force all-pairs
    ph = {
        r["media_id"]: r
        for r in mm.synthesize_and_resize(
            docs, tw=mm.PHASH_CELLS, th=1
        ).select(
            "media_id",
            mm.phash60(F.col("thumb")).alias("h"),
        ).collect()
    }
    ids = sorted(ph)
    brute = {
        (a, b): bin(ph[a]["h"] ^ ph[b]["h"]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(ph[a]["h"] ^ ph[b]["h"]).count("1") <= 11
    }
    assert got == brute


def test_phash_banding_equals_bruteforce_on_random_corpus(spark):
    """Pigeonhole-recall guarantee under randomized input: over a seeded
    corpus of random docs plus mutated near-twins, the banded LSH result
    must EQUAL brute-force all-pairs Hamming ≤ threshold — no pair lost to
    banding, none invented."""
    import random as _r

    rng = _r.Random(99)
    words = [f"tok{i}" for i in range(50)]
    rows = []
    for i in range(40):
        text = " ".join(rng.choice(words) for _ in range(rng.randint(20, 120)))
        rows.append((i * 3, text))  # image-kind ids
        if i % 4 == 0:  # mutated twin: flip a few characters
            chars = list(text)
            for _ in range(rng.randint(0, 3)):
                p = rng.randrange(len(chars))
                chars[p] = rng.choice("abcxyz")
            rows.append((i * 3 + 300, "".join(chars)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for max_h in (3, 5):
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in mm.phash_pairs(docs, max_hamming=max_h).collect()
        }
        ph = {
            r["media_id"]: r["h"]
            for r in mm.synthesize_and_resize(docs, tw=mm.PHASH_CELLS, th=1)
            .select("media_id", mm.phash60(F.col("thumb")).alias("h"))
            .collect()
        }
        ids = sorted(ph)
        brute = {
            (a, b, bin(ph[a] ^ ph[b]).count("1"))
            for i, a in enumerate(ids)
            for b in ids[i + 1:]
            if bin(ph[a] ^ ph[b]).count("1") <= max_h
        }
        assert got == brute, f"max_h={max_h}"
        assert brute, "fixture produced no near pairs — test is vacuous"
