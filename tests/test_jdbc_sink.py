"""JDBC-style upsert sink tests: the same idempotence suite the parquet
sink passes, run against the SQLite-backed `INSERT ... ON CONFLICT` path
(reference parity: ChangesetStatsForeachWriter batching/retry/guard,
ChangesetMetadataForeachWriter username + hashtag-dictionary rules)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from osmesa_spark.datagen import COUNTRIES, write_augdiff_dropdir
from osmesa_spark.sinks import jdbc as J
from osmesa_spark.sources import replication as R
from osmesa_spark.streaming import stats_stream as S


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("jdbc_fx")
    write_augdiff_dropdir(
        str(base / "augdiffs"), n_sequences=4, per_seq=30, corrupt_every=17
    )
    return base


def _stats_batch(spark, dirs):
    good, _ = R.split_errors(
        R.read_augmented_diffs(spark, str(dirs / "augdiffs"))
    )
    return S.streaming_changeset_stats(good, COUNTRIES).select(
        F.col("changeset").alias("id"),
        F.col("counts").cast("map<string,bigint>").alias("counts"),
        "measurements",
        F.col("total_edits").cast("bigint"),
        F.array(F.col("sequence")).cast("array<int>").alias("augmented_diffs"),
    )


def test_jdbc_upsert_insert_then_redeliver_noop(spark, dirs, tmp_path):
    """Re-delivering a batch whose sequences are already recorded must be a
    no-op — the `NOT (augmented_diffs && EXCLUDED.augmented_diffs)` guard."""
    sink = J.JdbcStatsSink(str(tmp_path / "stats.db"))
    batch = _stats_batch(spark, dirs)
    sink.upsert_stats(batch)
    first = sink.read_stats()
    assert len(first) > 0
    total = sum(r["total_edits"] for r in first)

    sink.upsert_stats(batch)  # exact re-delivery
    second = sink.read_stats()
    assert sum(r["total_edits"] for r in second) == total
    assert [r["id"] for r in second] == [r["id"] for r in first]


def test_jdbc_upsert_merges_disjoint_sequences(spark, tmp_path):
    """A later batch with NEW sequences for an existing id merges: maps sum
    element-wise, total_edits adds, augmented_diffs unions."""
    sink = J.JdbcStatsSink(str(tmp_path / "stats.db"))
    mk = lambda seq, edits: spark.createDataFrame(  # noqa: E731
        [(7, {"roads": edits}, {"road_km_added": 1.5}, edits, [seq])],
        "id long, counts map<string,bigint>, "
        "measurements map<string,double>, total_edits long, "
        "augmented_diffs array<int>",
    )
    sink.upsert_stats(mk(1000, 3))
    sink.upsert_stats(mk(1001, 4))
    (row,) = sink.read_stats()
    assert row["total_edits"] == 7
    assert row["counts"] == {"roads": 7}
    assert row["measurements"] == {"road_km_added": 3.0}
    assert row["augmented_diffs"] == [1000, 1001]

    # partial overlap: guard skips the WHOLE contribution (reference rule)
    sink.upsert_stats(
        spark.createDataFrame(
            [(7, {"roads": 9}, {}, 9, [1001, 1002])],
            "id long, counts map<string,bigint>, "
            "measurements map<string,double>, total_edits long, "
            "augmented_diffs array<int>",
        )
    )
    (row,) = sink.read_stats()
    assert row["total_edits"] == 7
    assert row["augmented_diffs"] == [1000, 1001]


def test_jdbc_upsert_shifted_batch_boundary_keeps_new_sequence(
    spark, tmp_path
):
    """At-least-once redelivery with a SHIFTED foreachBatch boundary: a later
    batch carries one already-applied sequence row AND one new sequence row
    for the same id. The replayed row must be skipped alone; the new row must
    apply (per-(id, sequence) pre-merge — not per-id collapse, which would
    hand the overlap guard a [stored, new] array and lose the new edits)."""
    sink = J.JdbcStatsSink(str(tmp_path / "shift.db"))
    schema = (
        "id long, counts map<string,bigint>, "
        "measurements map<string,double>, total_edits long, "
        "augmented_diffs array<int>"
    )
    sink.upsert_stats(
        spark.createDataFrame([(7, {"roads": 3}, {}, 3, [1000])], schema)
    )
    # redelivered seq 1000 + unseen seq 1001 in ONE batch, same changeset
    sink.upsert_stats(
        spark.createDataFrame(
            [
                (7, {"roads": 3}, {}, 3, [1000]),
                (7, {"roads": 4}, {}, 4, [1001]),
            ],
            schema,
        )
    )
    (row,) = sink.read_stats()
    assert row["total_edits"] == 7
    assert row["counts"] == {"roads": 7}
    assert row["augmented_diffs"] == [1000, 1001]


def test_jdbc_users_last_name_wins(spark, tmp_path):
    sink = J.JdbcStatsSink(str(tmp_path / "users.db"))
    sink.upsert_users(
        spark.createDataFrame([(1, "alice"), (2, "bob")], "id long, name string")
    )
    sink.upsert_users(
        spark.createDataFrame([(1, "alicia")], "id long, name string")
    )
    con = J.connect(str(tmp_path / "users.db"))
    rows = dict(con.execute("SELECT id, name FROM users"))
    con.close()
    assert rows == {1: "alicia", 2: "bob"}


def test_jdbc_hashtag_ids_stable(spark, tmp_path):
    sink = J.JdbcStatsSink(str(tmp_path / "tags.db"))
    first = sink.upsert_hashtags(
        spark.createDataFrame(
            [("mapathon",), ("HOTOSM",)], "hashtag string"
        )
    )
    second = sink.upsert_hashtags(
        spark.createDataFrame(
            [("mapathon",), ("newtag",)], "hashtag string"
        )
    )
    # existing hashtags keep their serial id forever; new ids are higher
    assert second["mapathon"] == first["mapathon"]
    assert second["hotosm"] == first["hotosm"]
    assert second["newtag"] > max(first.values())


def test_jdbc_checkpoint_roundtrip(tmp_path):
    sink = J.JdbcStatsSink(str(tmp_path / "ckpt.db"))
    assert sink.load_checkpoint("augmented-diff-stats") is None
    sink.save_checkpoint("augmented-diff-stats", 1003)
    sink.save_checkpoint("augmented-diff-stats", 1005)
    assert sink.load_checkpoint("augmented-diff-stats") == 1005


def test_jdbc_streaming_end_to_end(spark, dirs, tmp_path):
    """The full reference sink chain: stream → foreachBatch → JDBC upsert +
    checkpoint row; totals match the batch run of the same pipeline."""
    good_stream, _ = R.split_errors(
        R.read_augmented_diffs(spark, str(dirs / "augdiffs"), streaming=True)
    )
    db = str(tmp_path / "stream.db")
    q = J.run_streaming_stats_to_jdbc(
        good_stream, db, str(tmp_path / "ckpt"), countries=COUNTRIES
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        processed = any(
            p["numInputRows"] > 0 for p in (q.recentProgress or [])
        )
        if (
            processed
            and not q.status["isDataAvailable"]
            and not q.status["isTriggerActive"]
        ):
            time.sleep(1)
            if not q.status["isDataAvailable"]:
                break
        time.sleep(0.5)
    q.stop()
    sink = J.JdbcStatsSink(db)
    good, _ = R.split_errors(
        R.read_augmented_diffs(spark, str(dirs / "augdiffs"))
    )
    assert sum(r["total_edits"] for r in sink.read_stats()) == good.count()
    assert sink.load_checkpoint("augmented-diff-stats") == 1003


def test_jdbc_streaming_metadata_updater(spark, tmp_path):
    """StreamingChangesetMetadataUpdater parity: metadata stream feeds the
    users + hashtag-dictionary upserts with checkpoint bookkeeping."""
    from osmesa_spark.datagen import write_changeset_meta_dropdir

    drop = str(tmp_path / "meta")
    write_changeset_meta_dropdir(drop, n_sequences=3, per_seq=8)
    meta = R.read_changeset_metadata(spark, drop, streaming=True)
    db = str(tmp_path / "meta.db")
    q = J.run_streaming_metadata_to_jdbc(meta, db, str(tmp_path / "ckpt"))
    deadline = time.time() + 120
    while time.time() < deadline:
        processed = any(
            p["numInputRows"] > 0 for p in (q.recentProgress or [])
        )
        if (
            processed
            and not q.status["isDataAvailable"]
            and not q.status["isTriggerActive"]
        ):
            time.sleep(1)
            if not q.status["isDataAvailable"]:
                break
        time.sleep(0.5)
    q.stop()
    sink = J.JdbcStatsSink(db)
    con = J.connect(db)
    users = dict(con.execute("SELECT id, name FROM users"))
    tags = dict(
        (h, i) for i, h in con.execute("SELECT id, hashtag FROM hashtags")
    )
    con.close()
    bounded = R.read_changeset_metadata(spark, drop)
    from pyspark.sql import functions as F

    assert len(users) == bounded.select("uid").distinct().count()
    assert len(tags) > 0  # fixture comments carry #hashtags
    assert sink.load_checkpoint("changeset-metadata") == 1002

    # scala:110-111: hashtags recorded ONLY in the dedicated tags['hashtags']
    # list (never in the comment) must also enter the dictionary
    from osmesa_spark.functions.text import changeset_hashtags

    expected = {
        r["h"]
        for r in bounded.select(
            F.explode(changeset_hashtags(F.col("tags"))).alias("h")
        ).collect()
    }
    dedicated_only = expected - {
        r["h"]
        for r in bounded.select(
            F.explode(
                __import__(
                    "osmesa_spark.functions.text", fromlist=["hashtags"]
                ).hashtags(F.col("tags").getItem("comment"))
            ).alias("h")
        ).collect()
    }
    assert expected == set(tags)
    assert dedicated_only, "fixture must exercise the dedicated-tag source"


# ---------------------------------------------------------------------------
# Postgres-dialect snapshot (VERDICT r8 #4): the SQLite statements are a
# stand-in; the deployment dialect is pinned in jdbc.POSTGRES_STATEMENTS.
# These tests (a) diff each pinned template token-for-token against the
# reference writer's quoted SQL when the reference tree is available, and
# (b) cross-check every SQLite stand-in's structure against its Postgres
# twin, so dialect drift cannot hide behind the in-process backend.
# ---------------------------------------------------------------------------

_REF_STATS_DIR = (
    "/root/reference/src/analytics/src/main/scala/osmesa/analytics/stats"
)


def _normalize_sql(sql: str) -> list[str]:
    """Token sequence with `-- comments` stripped and whitespace collapsed —
    statement equivalence up to layout."""
    import re

    lines = [re.sub(r"--.*$", "", ln) for ln in sql.splitlines()]
    return " ".join(" ".join(lines).split()).split(" ")


def _scala_quoted_sql(path: str) -> dict:
    """Extract `val Name: String = \"\"\" ... \"\"\".stripMargin` blocks."""
    import re

    src = open(path).read()
    out = {}
    for m in re.finditer(
        r"val (\w+): String =\s*\"\"\"(.*?)\"\"\"\.stripMargin",
        src,
        re.DOTALL,
    ):
        body = "\n".join(
            ln.split("|", 1)[1] if "|" in ln else ln
            for ln in m.group(2).splitlines()
        )
        out[m.group(1)] = body
    return out


@pytest.mark.skipif(
    not os.path.isdir(_REF_STATS_DIR), reason="reference tree not available"
)
def test_postgres_statements_match_reference_quoted_sql():
    from osmesa_spark.sinks.jdbc import POSTGRES_STATEMENTS

    quoted = {
        writer: _scala_quoted_sql(
            os.path.join(_REF_STATS_DIR, f"{writer}.scala")
        )
        for writer in {w for w, _ in POSTGRES_STATEMENTS}
    }
    for (writer, val_name), template in POSTGRES_STATEMENTS.items():
        assert val_name in quoted[writer], f"{writer}.{val_name} not found"
        want = _normalize_sql(quoted[writer][val_name])
        got = _normalize_sql(template)
        assert got == want, (
            f"{writer}.{val_name} drifted from the reference statement:\n"
            f"ours: {' '.join(got)}\nref:  {' '.join(want)}"
        )


def test_sqlite_standins_structurally_match_postgres_dialect():
    """The executed (SQLite) statements must keep the Postgres statements'
    load-bearing structure: conflict targets, guarded-vs-unguarded update
    branch, and the overlap guard on the stats upsert. This runs with or
    without the reference tree."""
    import re

    from osmesa_spark.sinks import jdbc as J

    def conflict_target(sql: str) -> str:
        m = re.search(r"ON CONFLICT\s*(\(([^)]*)\))?", sql, re.IGNORECASE)
        assert m, f"no ON CONFLICT in: {sql[:80]}"
        return (m.group(2) or "").replace(" ", "")

    # stats upsert: same (id) target, DO UPDATE branch, and the WHERE NOT
    # <overlap> idempotence guard in both dialects
    assert conflict_target(J.STATS_UPSERT_SQL) == "id"
    assert conflict_target(J.PG_STATS_CHANGESETS_UPSERT_SQL) == "id"
    assert "DO UPDATE" in J.STATS_UPSERT_SQL
    assert re.search(
        r"WHERE NOT seq_overlap\(augmented_diffs, excluded.augmented_diffs\)",
        J.STATS_UPSERT_SQL,
    ), "SQLite stats upsert lost the sequence-overlap guard"
    assert re.search(
        r"AND NOT coalesce\(c\.augmented_diffs, ARRAY\[\]::integer\[\]\) "
        r"&& EXCLUDED\.augmented_diffs",
        J.PG_STATS_CHANGESETS_UPSERT_SQL,
    ), "Postgres stats upsert lost the && overlap guard"
    # both carry the same merged SET columns (modulo the jsonb spelling)
    for col in ("measurements", "counts", "total_edits", "augmented_diffs",
                "updated_at"):
        assert re.search(rf"\b{col}\s*=", J.STATS_UPSERT_SQL), col
        assert re.search(rf"\b{col} = ", J.PG_STATS_CHANGESETS_UPSERT_SQL), col

    # users: PG splits first-sighting insert (DO NOTHING) + gated name
    # refresh; the SQLite stand-in folds both into one last-name-wins
    # upsert — same end state, so assert the PG pair composes to it
    assert conflict_target(J.USERS_UPSERT_SQL) == "id"
    assert "name = excluded.name" in J.USERS_UPSERT_SQL
    assert conflict_target(J.PG_USERS_INSERT_SQL) == "id"
    assert "DO NOTHING" in J.PG_USERS_INSERT_SQL
    assert "name = data.name" in J.PG_USERNAMES_UPDATE_SQL
    assert "u.name != data.name" in J.PG_USERNAMES_UPDATE_SQL

    # hashtags: stable serial ids — insert is DO NOTHING in both dialects
    # (PG resolves ids via RETURNING + re-select union; SQLite re-selects)
    assert "DO NOTHING" in J.HASHTAG_INSERT_SQL
    assert conflict_target(J.HASHTAG_INSERT_SQL) == "hashtag"
    assert "RETURNING id" in J.PG_CHANGESETS_HASHTAGS_UPSERT_SQL
    assert "DO NOTHING" in J.PG_CHANGESETS_HASHTAGS_UPSERT_SQL

    # countries link table: composite conflict target + overlap guard
    assert (
        conflict_target(J.PG_CHANGESET_COUNTRIES_UPSERT_SQL)
        == "changeset_id,country_id"
    )
    assert "&& EXCLUDED.augmented_diffs" in J.PG_CHANGESET_COUNTRIES_UPSERT_SQL

    # metadata changesets: plain refresh, NO overlap guard in either dialect
    assert "&&" not in J.PG_METADATA_CHANGESETS_UPSERT_SQL
