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


def read_csv_dir(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    header: bool = True,
    delimiter: str = ",",
    mode: str = "FAILFAST",
    path_glob_filter: str | None = "*.csv",
) -> DataFrame:
    """CSV folder scan with DECLARED schema — the tabular-dump twin of
    :func:`read_json_dir` (same recursive per-batch layout contract,
    same placeholder-filtering glob). Beyond the reference's formats:
    a 100 TB ingest pipeline receives CSV drops as often as JSON.

    Schema inference is deliberately not offered: on a large directory
    it costs an extra full scan AND can silently flip a column's type
    between loads (an all-null day infers string where yesterday was
    long) — declared schemas fail loudly instead. Default
    ``mode=FAILFAST`` extends that stance to row parsing; pass
    ``PERMISSIVE`` to land malformed rows as nulls for quarantine
    flows.
    """
    reader = (
        spark.read.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", mode)
    )
    if path_glob_filter:
        reader = reader.option("pathGlobFilter", path_glob_filter)
    return reader.csv(path)


def read_orc_dir(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """ORC folder scan — columnar like parquet (S5) with the same free
    column pruning and predicate pushdown, for corpora already stored
    in Hive/ORC estates. ``schema`` (optional) asserts the expected
    shape instead of trusting the files: a declared schema makes a
    drifted producer fail at read time, not at the first downstream
    join.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.option("recursiveFileLookup", "true").orc(path)
