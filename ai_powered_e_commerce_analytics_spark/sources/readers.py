"""Batch sources (SURVEY.md §2.1 S1-S5, S10).

The reference's sources are HTTP polls and bucket-folder JSON listings with
hand-rolled concurrency (goroutine waves, extractor.go:63-101). On Spark all
of that is one declarative reader: ``spark.read`` parallelizes per-file and
per-split natively, pushes filters/projections into the scan, and prunes
partitions — nothing to hand-schedule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TESTDATA_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan (S5). Column pruning + predicate pushdown are free."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every driver testdata table from an sf dir."""
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the testdata tables as temp views for spark.sql queries."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_json_dir(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    path_glob_filter: str | None = "*.json",
) -> DataFrame:
    """JSON folder scan with declared schema (S2+S3+S4).

    Replaces the reference's listed-then-downloaded-one-by-one loop
    (data_extractor.py:26-60) and the goroutine-per-file Go variant
    (extractor.go:63-101). ``pathGlobFilter`` drops the
    ``.emptyFolderPlaceholder`` artifact by *filtering*, not list.remove
    (deviation #10 in SURVEY.md §7 — the reference throws if absent).

    ``recursiveFileLookup`` descends into the timestamped per-batch
    subdirs the sinks produce (``bronze/new/{ts}_{uuid}/part-*.json``,
    sinks.py write_bronze_batch / write_silver_chunks) — the flat-bucket
    twin of the reference's folder listing.
    """
    reader = spark.read.schema(schema).option("recursiveFileLookup", "true")
    if path_glob_filter:
        reader = reader.option("pathGlobFilter", path_glob_filter)
    return reader.json(path)


def per_file_counts(df: DataFrame) -> DataFrame:
    """Per-file row counts (A6) — the reference records ``shape[0]`` per
    downloaded file to drive its consumption watermark
    (data_extractor.py:59). Distributed form: group on the input file.
    """
    return (
        df.groupBy(F.input_file_name().alias("file"))
        .count()
        .withColumnRenamed("count", "rows")
    )
