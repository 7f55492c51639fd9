"""upsert_dbapi / dbapi_upsert_sink / upsert_kpi_tables_dbapi against a
real SQLite database (the Postgres/Supabase stand-in: same ON CONFLICT
dialect, real connections opened on the executors)."""

from __future__ import annotations

import sqlite3

import pytest

from ai_powered_e_commerce_analytics_spark.sinks import (
    dbapi_upsert_sink,
    upsert_dbapi,
    upsert_kpi_tables_dbapi,
)


def _factory(path: str):
    # timeout: parallel partition writers serialize on SQLite's file
    # lock; a Postgres target takes concurrent writers natively.
    return lambda: sqlite3.connect(path, timeout=60)


def _all(path, table, cols):
    with sqlite3.connect(path) as c:
        return set(c.execute(f"SELECT {cols} FROM {table}").fetchall())


def test_upsert_dbapi_insert_then_update(spark, tmp_path):
    db = str(tmp_path / "t.db")
    with sqlite3.connect(db) as c:
        c.execute("CREATE TABLE kpi (id TEXT PRIMARY KEY, v REAL, n INTEGER)")
    seed = spark.createDataFrame(
        [("a", 1.5, 10), ("b", 2.5, 20)], "id string, v double, n long"
    )
    upsert_dbapi(spark, seed, "kpi", "id", _factory(db))
    assert _all(db, "kpi", "id, v, n") == {("a", 1.5, 10), ("b", 2.5, 20)}

    # second batch: update a, insert c, leave b untouched (MERGE)
    upd = spark.createDataFrame(
        [("a", 9.0, 11), ("c", 3.5, 30)], "id string, v double, n long"
    )
    upsert_dbapi(spark, upd, "kpi", "id", _factory(db))
    assert _all(db, "kpi", "id, v, n") == {
        ("a", 9.0, 11), ("b", 2.5, 20), ("c", 3.5, 30)
    }


def test_upsert_dbapi_collapses_batch_duplicates(spark, tmp_path):
    # Postgres rejects a multi-hit ON CONFLICT batch; the sink collapses
    # duplicate keys before writing, so exactly one row per key lands.
    db = str(tmp_path / "t.db")
    with sqlite3.connect(db) as c:
        c.execute("CREATE TABLE kpi (id TEXT PRIMARY KEY, v REAL)")
    dup = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 3.0)], "id string, v double"
    )
    upsert_dbapi(spark, dup, "kpi", "id", _factory(db))
    rows = _all(db, "kpi", "id, v")
    assert {r[0] for r in rows} == {"a", "b"} and len(rows) == 2


def test_upsert_dbapi_key_validation_and_small_batches(spark, tmp_path):
    db = str(tmp_path / "t.db")
    with sqlite3.connect(db) as c:
        c.execute("CREATE TABLE kpi (id INTEGER PRIMARY KEY, v REAL)")
    df = spark.createDataFrame([(i, float(i)) for i in range(37)], "id long, v double")
    with pytest.raises(ValueError, match="key column"):
        upsert_dbapi(spark, df, "kpi", "nope", _factory(db))
    # batch_size smaller than the partition: several executemany flushes
    upsert_dbapi(spark, df, "kpi", "id", _factory(db), batch_size=5)
    assert len(_all(db, "kpi", "id, v")) == 37


def test_foreach_batch_adapter_is_idempotent(spark, tmp_path):
    # foreachBatch replays a micro-batch after a crash; the keyed MERGE
    # makes the replay rewrite the same rows (effective exactly-once).
    db = str(tmp_path / "t.db")
    with sqlite3.connect(db) as c:
        c.execute("CREATE TABLE agg (k TEXT PRIMARY KEY, total REAL)")
    sink = dbapi_upsert_sink("agg", "k", _factory(db))
    batch = spark.createDataFrame([("x", 5.0), ("y", 7.0)], "k string, total double")
    sink(batch, 0)
    sink(batch, 0)  # replay
    assert _all(db, "agg", "k, total") == {("x", 5.0), ("y", 7.0)}


def test_upsert_kpi_tables_dbapi_reference_fanout(spark, tmp_path):
    db = str(tmp_path / "kpis.db")
    with sqlite3.connect(db) as c:
        c.execute("CREATE TABLE user_kpis (id TEXT PRIMARY KEY, average_spent REAL)")
        c.execute("CREATE TABLE shop_kpis (shop_id TEXT PRIMARY KEY, average_spent REAL)")
        c.execute("CREATE TABLE date_kpis (date TEXT PRIMARY KEY, average_spent REAL)")
    kpis = {
        "user_kpis": spark.createDataFrame(
            [("u1", 10.0)], "id string, average_spent double"
        ),
        "shop_kpis": spark.createDataFrame(
            [("s1", 20.0)], "shop_id string, average_spent double"
        ),
        "date_kpis": spark.createDataFrame(
            [("2026-08-01", 30.0)], "date string, average_spent double"
        ),
    }
    upsert_kpi_tables_dbapi(spark, kpis, _factory(db))
    # re-upsert with changed values: MERGE updates in place
    kpis["user_kpis"] = spark.createDataFrame(
        [("u1", 99.0)], "id string, average_spent double"
    )
    upsert_kpi_tables_dbapi(spark, kpis, _factory(db))
    assert _all(db, "user_kpis", "id, average_spent") == {("u1", 99.0)}
    assert _all(db, "shop_kpis", "shop_id, average_spent") == {("s1", 20.0)}
    assert _all(db, "date_kpis", "date, average_spent") == {("2026-08-01", 30.0)}


def test_dbapi_sink_through_real_stream_with_replay(spark, tmp_path):
    # The literal "MERGE in foreachBatch" path: a checkpointed file
    # stream keyed-upserts each micro-batch into SQLite. Two drops, then
    # a full checkpoint wipe + re-run (worst-case replay of EVERYTHING):
    # the DB state must be identical — idempotent exactly-once effect.
    from pyspark.sql import types as T

    from ai_powered_e_commerce_analytics_spark.streaming.jobs import (
        _file_stream,
    )

    db = str(tmp_path / "s.db")
    with sqlite3.connect(db) as c:
        c.execute("CREATE TABLE agg (k INTEGER PRIMARY KEY, v REAL)")
    src, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    sink = dbapi_upsert_sink("agg", "k", _factory(db))

    def run_stream():
        stream = _file_stream(spark, src, schema, archive_dir=None)
        q = (
            stream.writeStream.option("checkpointLocation", ckpt)
            .foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drops = [
        [(1, 1.0), (2, 2.0)],
        [(2, 20.0), (3, 3.0)],  # update k=2, insert k=3
    ]
    for i, rows in enumerate(drops):
        spark.createDataFrame(rows, "k long, v double").coalesce(1).write.mode(
            "overwrite"
        ).json(f"{src}/drop{i}")
        run_stream()
    want = {(1, 1.0), (2, 20.0), (3, 3.0)}
    assert _all(db, "agg", "k, v") == want

    # wipe the checkpoint -> the stream replays BOTH drops from scratch.
    # Caveat: both drops now land in ONE availableNow batch, and the
    # sink's within-batch dropDuplicates keeps an arbitrary row for
    # k=2 — so assert only the unambiguous keys here, then land k=2's
    # final value with a follow-up drop (its own batch) and assert full
    # convergence to the pre-replay state.
    import shutil

    shutil.rmtree(ckpt)
    run_stream()
    state = dict(_all(db, "agg", "k, v"))
    assert set(state) == {1, 2, 3} and state[1] == 1.0 and state[3] == 3.0
    spark.createDataFrame([(2, 20.0)], "k long, v double").coalesce(1).write.mode(
        "overwrite"
    ).json(f"{src}/drop2")
    run_stream()
    assert _all(db, "agg", "k, v") == want
