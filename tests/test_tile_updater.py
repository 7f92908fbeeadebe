"""Per-element MVT tile updater (G11): snapshot / history / urchn schema
strategies + end-to-end grouped upsert with sequence idempotence."""

from __future__ import annotations

import glob
import gzip

import pytest

from osmesa_spark.sinks import mvt
from osmesa_spark.sinks import updater as U


def feat(eid, version, visible=True, updated=100, author="a", extra=None):
    tags = {
        "__id": eid,
        "__version": version,
        "__updated": updated,
        "__visible": visible,
    }
    if extra:
        tags.update(extra)
    return mvt.MvtFeature(fid=eid, geom_type=1, points=[(10, 10)], tags=tags)


def test_snapshot_schema():
    existing = [feat(1, 1), feat(2, 1)]
    out = U._apply_snapshot(existing, [feat(1, 2), feat(3, 1)])
    ids = {int(f.tags["__id"]): int(f.tags["__version"]) for f in out}
    assert ids == {1: 2, 2: 1, 3: 1}
    # stale version ignored; delete removes
    out = U._apply_snapshot(out, [feat(1, 1), feat(2, 2, visible=False)])
    ids = {int(f.tags["__id"]): int(f.tags["__version"]) for f in out}
    assert ids == {1: 2, 3: 1}


def test_history_schema_valid_until():
    out = U._apply_history([], [feat(1, 1, updated=100)])
    out = U._apply_history(out, [feat(1, 2, updated=200)])
    assert len(out) == 2
    v1 = next(f for f in out if int(f.tags["__version"]) == 1)
    v2 = next(f for f in out if int(f.tags["__version"]) == 2)
    assert int(v1.tags["__validUntil"]) == 200
    assert "__validUntil" not in v2.tags
    # duplicate redelivery of v2 adds nothing
    out = U._apply_history(out, [feat(1, 2, updated=200)])
    assert len(out) == 2


def test_urchn_schema_lineage():
    out = U._apply_urchn([], [feat(1, 1, extra={"__author": "alice"})])
    out = U._apply_urchn(out, [feat(1, 3, extra={"__author": "bob"})])
    f = out[0]
    assert f.tags["__creation_author"] == "alice"
    assert f.tags["__author"] == "bob"
    assert int(f.tags["__versions"]) == 2


@pytest.fixture()
def diffs(spark, tmp_path):
    from osmesa_spark.datagen import write_augdiff_dropdir
    from osmesa_spark.sources import replication as R

    write_augdiff_dropdir(str(tmp_path / "ad"), n_sequences=3, per_seq=40)
    return R.read_augmented_diffs(spark, str(tmp_path / "ad"))


def test_update_tiles_snapshot_end_to_end(spark, diffs, tmp_path):
    root = str(tmp_path / "tiles")
    n = U.update_tiles(diffs, root, schema="snapshot", zoom=6)
    assert n > 0

    def read_all():
        out = {}
        for p in glob.glob(f"{root}/**/*.mvt.gz", recursive=True):
            layers = mvt.decode_tile(gzip.decompress(open(p, "rb").read()))
            out[p] = layers.get("elements", [])
        return out

    tiles = read_all()
    assert any(tiles.values())
    # snapshot invariant: one feature per element id PER TILE, all visible
    # (the fixture reuses element ids at unrelated coords, so the same id
    # may appear in different tiles — that is expected)
    for p, feats in tiles.items():
        seen = set()
        for f in feats:
            eid = int(f.tags["__id"])
            assert eid not in seen, f"duplicate element in snapshot tile {p}"
            seen.add(eid)
            assert f.tags["__visible"] is True
    flat = {
        (p, int(f.tags["__id"]), int(f.tags["__version"]))
        for p, fs in tiles.items()
        for f in fs
    }
    # re-apply the same diffs -> sequences committed -> unchanged
    U.update_tiles(diffs, root, schema="snapshot", zoom=6)
    flat2 = {
        (p, int(f.tags["__id"]), int(f.tags["__version"]))
        for p, fs in read_all().items()
        for f in fs
    }
    assert flat2 == flat


def test_update_tiles_history_accumulates(spark, diffs, tmp_path):
    root = str(tmp_path / "tiles")
    U.update_tiles(diffs, root, schema="history", zoom=6)
    total = 0
    closed = 0
    for p in glob.glob(f"{root}/**/*.mvt.gz", recursive=True):
        layers = mvt.decode_tile(gzip.decompress(open(p, "rb").read()))
        for f in layers.get("elements", []):
            total += 1
            if "__validUntil" in f.tags:
                closed += 1
    assert total > 0
    # any element with >1 version in one tile produced a closed feature
    assert closed >= 0  # structural smoke; closure logic unit-tested above


def test_update_tiles_rejects_unknown_schema(spark, diffs, tmp_path):
    with pytest.raises(ValueError):
        U.update_tiles(diffs, str(tmp_path / "t"), schema="nope")
