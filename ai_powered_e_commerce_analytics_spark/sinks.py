"""Sinks (SURVEY.md §2.1 S6-S10).

The reference's sinks are HTTP uploads to Supabase storage (JSON files)
and PostgREST keyed upserts. Spark-first equivalents:

- S6 gold snapshot  -> timestamped JSON dir write
- S7 silver chunks  -> ``maxRecordsPerFile`` (replaces the hand-rolled
  50,000-row chunker + upload waves, loader.go:65-113)
- S8 KPI upsert     -> keyed MERGE. Delta Lake isn't available in this
  container, so the upsert is a parquet-backed read-union-dedupe-rewrite
  with last-writer-wins per key — the same observable semantics as the
  reference's ``on_conflict`` upsert (data_loader.py:54-60). The module
  is structured so a Delta ``MERGE INTO`` drops in behind the same
  function signature when delta-spark is on the classpath.
- S10 bronze append -> plain JSON append with timestamped subdirs.

Scale notes: the upsert rewrite is partitioned by key-hash bucket so a
100 TB table only rewrites buckets that received updates; Delta/Iceberg
MERGE is the production path and noted inline.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def write_gold_snapshot(df: DataFrame, gold_dir: str, *, fmt: str = "json") -> str:
    """S6: gold snapshot as ``gold/final_data_{ts}`` (data_loader.py:22-35).

    The reference serializes the whole frame to ONE json file; we keep a
    timestamped directory and let Spark write one file per partition —
    coalesce(1) would funnel 100 TB through one task. Parity on naming,
    not on single-file-ness (recorded deviation).
    """
    # uuid suffix: second-resolution timestamps collide when two runs
    # (or two foreachBatch invocations) land in the same wall-clock
    # second — mode("error") would fail the later one mid-pipeline.
    ts = time.strftime("%Y%m%d_%H%M%S")
    path = f"{gold_dir}/final_data_{ts}_{uuid.uuid4().hex[:8]}"
    df.write.mode("error").format(fmt).save(path)
    return path


def write_silver_chunks(
    df: DataFrame,
    silver_dir: str,
    *,
    max_records_per_file: int = 50_000,
    batch_id: int | None = None,
) -> str:
    """S7: chunked silver write — ``maxRecordsPerFile`` is the declarative
    twin of the Go 50k-row chunker (loader.go:111) with upload waves
    (loader.go:92-106); Spark writes files concurrently per task.

    ``batch_id`` (streaming callers): names the output dir by micro-batch
    id so a crash-replay of the same batch (foreachBatch is at-least-once)
    OVERWRITES its own earlier attempt instead of appending a duplicate
    silver directory — same idempotent-replay pattern as the gold sink in
    streaming/jobs.py.
    """
    if batch_id is not None:
        path = f"{silver_dir}/processed_data_batch_{batch_id}"
    else:
        # uuid suffix: 1-second epoch names collide across batch writes
        # landing in the same second, and mode("overwrite") would then
        # silently replace the earlier batch's rows.
        path = f"{silver_dir}/processed_data_{int(time.time())}_{uuid.uuid4().hex[:8]}"
    (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .json(path)
    )
    return path


def write_bronze_batch(df: DataFrame, bronze_new_dir: str) -> str:
    """S10: collector upload ``bronze/new/{iso-ts}_{uuid}.json``
    (collector.py:89-99) — one timestamped subdir per batch."""
    ts = time.strftime("%Y-%m-%dT%H-%M-%S")
    path = f"{bronze_new_dir}/{ts}_{uuid.uuid4()}"
    df.write.mode("error").json(path)
    return path


# ---------------------------------------------------------------------------
# S8: keyed upsert (MERGE)
# ---------------------------------------------------------------------------


def upsert_parquet(
    spark: SparkSession,
    updates: DataFrame,
    table_path: str,
    key: str,
    *,
    num_buckets: int = 64,
) -> None:
    """Keyed upsert into a parquet table: last-writer-wins per ``key``
    (reference PostgREST ``upsert(records, on_conflict=key)``,
    data_loader.py:54-60).

    Implementation: hash-bucket the table by key so only buckets touched
    by this batch are rewritten; within a touched bucket, new rows win
    over existing rows on the same key.

    100 TB note: this is the no-dependency fallback. With delta-spark on
    the classpath the body becomes::

        DeltaTable.forPath(spark, table_path).alias("t")
          .merge(updates.alias("u"), f"t.{key} = u.{key}")
          .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()

    which gets file-level skipping + ACID for free. The bucket layout
    below bounds the rewrite to (touched buckets / num_buckets) of the
    table, which is the same asymptotic behavior.
    """
    bucket = F.pmod(F.xxhash64(F.col(key)), F.lit(num_buckets)).cast("int")
    updates = updates.withColumn("__bucket", bucket)

    # Existence check via the FS, NOT a read wrapped in a bare except: a
    # transiently unreadable EXISTING table must raise, never silently
    # route to the initial-write branch (which would overwrite the whole
    # table with just this batch). "Existing" means HAS DATA — a bucket
    # partition dir must be present. A bare fs.exists() would treat the
    # debris of a crashed first write (_temporary/ only) as a table and
    # wedge every subsequent upsert on UNABLE_TO_INFER_SCHEMA; such
    # debris takes the initial-write branch, whose overwrite clears it.
    from .hadoop import hadoop_fs, hadoop_path

    fs = hadoop_fs(spark, table_path)
    have_existing = fs.exists(hadoop_path(spark, table_path)) and bool(
        fs.globStatus(hadoop_path(spark, f"{table_path}/__bucket=*"))
    )

    if not have_existing:
        (
            updates.repartition("__bucket")
            .write.mode("overwrite")
            .partitionBy("__bucket")
            .parquet(table_path)
        )
        return

    touched = [r[0] for r in updates.select("__bucket").distinct().collect()]
    old = spark.read.parquet(table_path).where(F.col("__bucket").isin(touched))
    # Last-writer-wins: updates rank before existing rows per key.
    merged = (
        updates.withColumn("__rank", F.lit(0))
        .unionByName(old.withColumn("__rank", F.lit(1)))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(key).orderBy("__rank")
            ),
        )
        .where(F.col("__rn") == 1)
        .drop("__rank", "__rn")
    )
    # Commit protocol: stage the merged buckets to a SIBLING dir (inside
    # table_path the reader would discover them as data), then swap each
    # touched bucket dir into place with two FS renames. The long window —
    # a Spark job reading old data while overwriting the same path — is
    # gone; what remains is per-bucket: a crash between rename(old->trash)
    # and rename(staged->live) leaves that one bucket absent from the live
    # table with its old data preserved in the staging dir for recovery.
    # That residual window is two metadata ops wide and is the best a
    # plain filesystem offers; the real fix is a transactional format
    # (Delta MERGE INTO, see docstring).
    # Clear debris from previously crashed upserts before staging anew.
    for status in fs.globStatus(hadoop_path(spark, f"{table_path}__staging_*")) or []:
        fs.delete(status.getPath(), True)
    staging = f"{table_path}__staging_{uuid.uuid4().hex[:8]}"
    (
        merged.repartition("__bucket")
        .write.mode("overwrite")
        .partitionBy("__bucket")
        .parquet(staging)
    )
    for b in touched:
        live = hadoop_path(spark, f"{table_path}/__bucket={b}")
        staged = hadoop_path(spark, f"{staging}/__bucket={b}")
        retired = hadoop_path(spark, f"{staging}/__retired_bucket={b}")
        if fs.exists(live):
            fs.rename(live, retired)
        fs.rename(staged, live)
    fs.delete(hadoop_path(spark, staging), True)


def read_upsert_table(spark: SparkSession, table_path: str) -> DataFrame:
    """Read back an upsert table, dropping the bucket bookkeeping column."""
    return spark.read.parquet(table_path).drop("__bucket")


def upsert_kpi_tables(
    spark: SparkSession,
    kpis: dict[str, DataFrame],
    base_dir: str,
    keys: dict[str, str] | None = None,
) -> None:
    """M2: the reference upserts the three KPI tables concurrently
    (data_loader.py:63-65); Spark jobs already parallelize internally, so
    these run sequentially driver-side — table/key triples from
    main.py:53-55."""
    keys = keys or {"user_kpis": "id", "shop_kpis": "shop_id", "date_kpis": "date"}
    for name, df in kpis.items():
        upsert_parquet(spark, df, f"{base_dir}/{name}", keys[name])
